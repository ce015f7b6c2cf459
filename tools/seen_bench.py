"""A/B the two seen-check physical strategies in the regime the
broadcast path is built for: a large seen set (millions of URLs) vs a
round's candidate batch that is mostly NEW urls (real frontier
expansion — the 10^10-URL steady state), bloom active so only a small
suspect set needs an exact check.

Measures admission end-to-end (bloom UDF + seen gate + state join +
enqueue window) with `seen_broadcast_suspects` off vs on, same inputs.

Usage: python tools/seen_bench.py [cpus] [seen_millions] [n_cands] [reps]
Output: one JSON line per rep per mode.
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    seen_m = float(sys.argv[2]) if len(sys.argv) > 2 else 4.0
    n_cands = int(sys.argv[3]) if len(sys.argv) > 3 else 200_000
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 3

    from pyspark.sql import functions as F

    from infinitycrawler_spark import schemas
    from infinitycrawler_spark.operators.admission import admit
    from infinitycrawler_spark.session import get_spark
    from infinitycrawler_spark.settings import CrawlSettings
    from infinitycrawler_spark.state.bloom_store import BloomShardStore

    spark = get_spark(f"seen-bench-{cpus}", cpus=cpus,
                      shuffle_partitions=max(cpus, 16))
    spark.sparkContext.setLogLevel("ERROR")

    n_seen = int(seen_m * 1_000_000)
    seen = (spark.range(n_seen)
            .select(F.concat(F.lit("http://h"), (F.col("id") % 500),
                             F.lit(".shop/p"), F.col("id")).alias("url"))
            .withColumn("url_key", F.xxhash64("url"))
            .repartition(max(cpus, 16))
            .persist())
    seen.count()

    # candidates: 95% new urls (ids beyond the seen range), 5% reseen —
    # the frontier-expansion shape. Everything else (state join, window)
    # identical between modes.
    cands = (spark.range(n_cands)
             .select((F.col("id") + n_seen - int(n_cands * 0.05)).alias("i"))
             .select(F.concat(F.lit("http://h"), (F.col("i") % 500),
                              F.lit(".shop/p"), F.col("i")).alias("url"),
                     F.concat(F.lit("h"), (F.col("i") % 500),
                              F.lit(".shop")).alias("host"))
             .select("url", "host", F.lit("link").alias("kind"),
                     (F.monotonically_increasing_id()).alias("parent_seq"),
                     F.lit(0).alias("child_pos"), F.lit(1).alias("depth"),
                     F.lit(False).alias("skip_budget"),
                     F.lit(None).cast("array<string>").alias("moved_chain"))
             .persist())
    cands.count()
    states = spark.createDataFrame([], schema=schemas.STATES)
    hosts = [f"h{i}.shop" for i in range(500)]

    store = BloomShardStore(tempfile.mkdtemp(prefix="seen_bench_"),
                            n_buckets=32, capacity_per_bucket=max(
                                200_000, n_seen // 32 * 2))
    t0 = time.time()
    store.rebuild(seen)
    print(json.dumps({"setup": "bloom_rebuild",
                      "s": round(time.time() - t0, 2)}))

    def run(broadcast):
        s = CrawlSettings(host_aliases=hosts,
                          seen_broadcast_suspects=broadcast)
        out = admit(cands, seen, states, {}, s, "h0.shop", budget_base=0,
                    seq_base=0, round_no=0, exact_order=False,
                    lazy_counts=True, bloom_store=store)
        t0 = time.time()
        n = out.frontier_add.count()
        return time.time() - t0, n

    run(False), run(True)  # discarded warmup (codegen, blob page cache)
    for rep in range(reps):
        # alternate order per rep so neither arm always inherits a
        # warmer page cache
        for mode in ((False, True) if rep % 2 == 0 else (True, False)):
            wall, n = run(mode)
            print(json.dumps({
                "rep": rep, "broadcast_suspects": mode, "cpus": cpus,
                "seen_rows": n_seen, "cands": n_cands,
                "admitted": n, "wall_s": round(wall, 2),
            }), flush=True)


if __name__ == "__main__":
    main()
