"""Byte-level evidence for the broadcast-suspect seen check (VERDICT r4
missing #4 / next #3): per-round executor SHUFFLE READ/WRITE BYTES in
both seen-check modes, measured on a REAL multi-JVM standalone cluster
(tools/cluster.sh) via the Spark status REST API.

The broadcast path's whole case is topological — "KBs of suspects+hits
move instead of the full seen table" — and the local wall-clock A/B
(tools/seen_bench.py) cannot separate the modes because this box's
tmpfs shuffle makes a 40M-row local shuffle ≈ free. This tool records
the number the claim actually rests on: bytes crossing the shuffle
boundary per admission round, default anti-join vs broadcast-suspect
scan, same inputs, same bloom state.

Usage:
    tools/cluster.sh start 4 2
    SPARK_MASTER=spark://127.0.0.1:7077 python tools/seen_shuffle_ab.py \
        [seen_millions] [n_cands] [reps]
Output: one JSON line per rep per mode with wall_s + shuffle MB.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _stage_totals(sc) -> tuple[int, int]:
    """Sum (shuffle_read_bytes, shuffle_write_bytes) over all completed
    stages of this application via the status REST API."""
    base = sc.uiWebUrl
    app = sc.applicationId
    with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app}/stages?status=complete",
            timeout=30) as resp:
        stages = json.loads(resp.read())
    rd = sum(s.get("shuffleReadBytes", 0) for s in stages)
    wr = sum(s.get("shuffleWriteBytes", 0) for s in stages)
    return rd, wr


def main():
    seen_m = float(sys.argv[1]) if len(sys.argv) > 1 else 4.0
    n_cands = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    master = os.environ.get("SPARK_MASTER", "spark://127.0.0.1:7077")

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from infinitycrawler_spark import schemas
    from infinitycrawler_spark.operators.admission import admit
    from infinitycrawler_spark.session import ship_package
    from infinitycrawler_spark.settings import CrawlSettings
    from infinitycrawler_spark.state.bloom_store import BloomShardStore

    spark = (SparkSession.builder.appName("seen-shuffle-ab")
             .master(master)
             .config("spark.sql.shuffle.partitions", "16")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.ui.enabled", "true")  # REST metrics source
             .config("spark.executor.memory",
                     os.environ.get("SPARK_EXEC_MEM", "10g"))
             .config("spark.sql.session.timeZone", "UTC")
             .getOrCreate())
    ship_package(spark)
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")

    n_seen = int(seen_m * 1_000_000)
    seen = (spark.range(n_seen)
            .select(F.concat(F.lit("http://h"), (F.col("id") % 500),
                             F.lit(".shop/p"), F.col("id")).alias("url"))
            .withColumn("url_key", F.xxhash64("url"))
            .repartition(16)
            .persist())
    seen.count()
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
    store = BloomShardStore(tempfile.mkdtemp(prefix="seen_sh_ab_"),
                            n_buckets=32, capacity_per_bucket=max(
                                200_000, n_seen // 32 * 2))
    store.rebuild(seen)

    def run(broadcast: bool):
        s = CrawlSettings(host_aliases=hosts,
                          seen_broadcast_suspects=broadcast)
        out = admit(cands, seen, states, {}, s, "h0.shop", budget_base=0,
                    seq_base=0, round_no=0, exact_order=False,
                    lazy_counts=True, bloom_store=store)
        rd0, wr0 = _stage_totals(sc)
        t0 = time.time()
        n = out.frontier_add.count()
        wall = time.time() - t0
        rd1, wr1 = _stage_totals(sc)
        out.cached.unpersist()
        for df in out.extra_cached:
            df.unpersist()
        return wall, n, rd1 - rd0, wr1 - wr0

    run(False), run(True)  # discarded warmup
    for rep in range(reps):
        for mode in ((False, True) if rep % 2 == 0 else (True, False)):
            wall, n, rd, wr = run(mode)
            print(json.dumps({
                "rep": rep, "broadcast_suspects": mode,
                "master": master, "seen_rows": n_seen, "cands": n_cands,
                "admitted": n, "wall_s": round(wall, 2),
                "shuffle_read_mb": round(rd / 1e6, 2),
                "shuffle_write_mb": round(wr / 1e6, 2),
            }), flush=True)


if __name__ == "__main__":
    main()


