"""Per-query isolation bench (guide §1.1/§1.4): times individual
queries() entries with the noop sink so the computation is measured
without the collect/driver-transfer path, and optionally dumps
``.explain("formatted")`` to a plans directory.

This is NOT the driver-timed bench (bench.py is frozen); it exists for
optimization-round evidence (OPTIMIZATION_r06.md cites its numbers).

Usage:
  python bench_extra.py [--reps N] [--plans DIR] [--sink noop|collect] \
      [query ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plans", default=None,
                    help="directory to write <query>.txt explain output")
    ap.add_argument("--sink", choices=["noop", "collect"], default="noop")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from infinitycrawler_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark("bench-extra", cpus=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    all_queries = entry_mod.queries()
    names = args.queries or list(all_queries)

    # JVM warmup (untimed)
    all_queries["pricing_summary"](spark, sf_dir).collect()

    out = {}
    for name in names:
        fn = all_queries[name]
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(args.plans, f"{name}.txt"), "w") as f:
                f.write(plan)
        ts = []
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            df = fn(spark, sf_dir)
            if args.sink == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.collect()
            ts.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        med = sorted(ts)[len(ts) // 2] if len(ts) % 2 else sorted(ts)[len(ts) // 2 - 1]
        out[name] = {"median": med, "reps": ts}
        print(f"{name:28s} median={med:8.3f}  reps={ts}", file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "cpus": cpus, "sink": args.sink,
                      "queries": out}))


if __name__ == "__main__":
    main()
