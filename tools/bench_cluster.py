"""Multi-JVM scaling bench — the m60 crawl workload of
tools/bench_scaling.py run against a LOCAL STANDALONE cluster
(tools/cluster.sh): master JVM + worker JVMs, each executor in its own
JVM with dedicated cores, driver separate. This removes the
driver/executor single-JVM lock+GC contention that pollutes local[N]
measurements (BENCH/BASELINE.md §5) and makes the "N vs 4N executors"
criterion literal: the app caps total cores via spark.cores.max, so
cores.max=2 → 1 executor JVM, cores.max=8 → 4 executor JVMs.

Usage: tools/cluster.sh start 4 2   # 4 workers x 2 cores, once
       python tools/bench_cluster.py <cores_max> [sf_dir] [mirrors]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def cluster_spark(app: str, cores_max: int, executor_cores: int | None = None,
                  n_parts: int | None = None):
    executor_cores = executor_cores or int(
        os.environ.get("BENCH_EXEC_CORES", "2"))
    from pyspark.sql import SparkSession

    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS",
                "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    n_parts = n_parts or max(cores_max, 16)
    os.makedirs("/dev/shm/spark-local", exist_ok=True)
    spark = (
        SparkSession.builder.appName(app)
        .master(os.environ.get("SPARK_MASTER", "spark://127.0.0.1:7077"))
        .config("spark.cores.max", str(cores_max))
        .config("spark.executor.cores", str(executor_cores))
        .config("spark.executor.memory",
                os.environ.get("BENCH_EXEC_MEM", "10g"))
        .config("spark.driver.memory", "12g")
        .config("spark.sql.shuffle.partitions", str(n_parts))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.executorEnv.OMP_NUM_THREADS", "1")
        .config("spark.executorEnv.OPENBLAS_NUM_THREADS", "1")
        .config("spark.executorEnv.MKL_NUM_THREADS", "1")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # all executors share this host, so the default 3s locality.wait
        # stalls every taskset that prefers another executor's cached
        # block and then fetches it over loopback anyway (measured 2x
        # end-to-end slowdown at m60). A short wait beats both 0s
        # (pure slot-stealing → all reads remote) and 2s (stalls
        # without locality wins — each 2-core executor can't drain its
        # own 8 cached partitions fast enough): A/B in
        # BENCH/campaign_r4.jsonl / BASELINE.md round-4 §3.
        .config("spark.locality.wait",
                os.environ.get("BENCH_LOCALITY_WAIT", "500ms"))
        # keep the process-level wait pinned to the same value: every
        # executor on this host is NODE_LOCAL for every cached block,
        # so only PROCESS_LOCAL placement avoids the netty transfer
        # from the neighbouring executor JVM.
        .config("spark.locality.wait.process",
                os.environ.get("BENCH_LOCALITY_WAIT_PROCESS", "500ms"))
        .config("spark.local.dir", "/dev/shm/spark-local")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate())
    from infinitycrawler_spark.session import ship_package

    ship_package(spark)
    return spark


def main():
    cores_max = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    mirrors = int(sys.argv[3]) if len(sys.argv) > 3 else 60
    validate = os.environ.get("BENCH_VALIDATE_PAYLOAD", "1") == "1"
    n_parts = int(os.environ.get("BENCH_PARTS", "32"))

    from pyspark.sql import functions as F

    from infinitycrawler_spark.functions.robots import parse_robots_txt
    from infinitycrawler_spark.plans.crawl_job import CrawlJob
    from infinitycrawler_spark.settings import CrawlSettings, RequestProcessorOptions
    from tools.bench_scaling import mirrored_web

    spark = cluster_spark(f"bench-cluster-{cores_max}", cores_max,
                          n_parts=n_parts)
    spark.sparkContext.setLogLevel("ERROR")
    # Input comes from tmpfs parquet, not an executor-cached DataFrame:
    # a persist()ed web gives the 1-executor arm every block in-heap
    # while the 4-executor arm remote-fetches 3/4 of them — an
    # asymmetry a real cluster doesn't have (input lives on shared
    # storage there, and a 10^10-URL web doesn't fit in cache anyway).
    # Both arms scanning the same tmpfs files keeps the N-vs-4N ratio
    # honest. Built once per (sf, mirrors); reused across arms/reps.
    web_path = f"/dev/shm/bench_cluster_web_m{mirrors}.parquet"
    if not os.path.exists(web_path):
        pages_build = mirrored_web(spark, sf_dir, mirrors)
        if validate:
            from infinitycrawler_spark.synth.payload import with_real_payload
            pages_build = with_real_payload(pages_build, w=32, h=24,
                                            fmt="rgb8-q")
        pages_build.repartition(16).write.mode("overwrite").parquet(web_path)
    pages = spark.read.parquet(web_path)
    seeds_df = pages.filter(F.col("url").like("%/order/%")).select("url")
    n_seeds = seeds_df.count()
    # probe AFTER the first action so executors have registered
    n_exec = spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size() - 1

    hosts = [r.host for r in pages.select("host").distinct().collect()]
    settings = CrawlSettings(
        host_aliases=hosts, number_of_retries=2, validate_payload=validate,
        request_processor_options=RequestProcessorOptions().no_delay())
    robots_map = {"nation00-m0.shop": parse_robots_txt(
        "User-agent: *\nDisallow: /order/9\n")}
    job = CrawlJob(
        spark=spark, pages=pages, robots_map=robots_map,
        sitemap_urls=seeds_df, seed_uri="http://nation00-m0.shop/",
        settings=settings, collect_enqueue_log=False, exact_order=False,
        snapshot_every=100, eager_checkpoint=False,
        pages_storage_level=os.environ.get(
            "BENCH_PAGES_STORAGE", "DISK_ONLY") or None,
        store_root=tempfile.mkdtemp(prefix=f"bench_cluster_{cores_max}_",
                                    dir="/dev/shm"))
    t0 = time.time()
    out = job.run()
    wall = time.time() - t0
    fetched = sum(mt["fetched"] for mt in out.metrics)
    import shutil
    shutil.rmtree(job.store_root, ignore_errors=True)
    print(json.dumps({
        "mode": "cluster", "cores_max": cores_max, "executors": n_exec,
        "sf_dir": sf_dir, "mirrors": mirrors,
        "validate_payload": validate,
        "wall_s": round(wall, 2), "rounds": out.rounds,
        "urls_fetched": int(fetched),
        "urls_per_s": round(fetched / wall, 1),
        "round_walls": [round(m["wall_s"], 2) for m in out.metrics],
        "round_fetched": [int(m["fetched"]) for m in out.metrics],
        "round_phases": [[m.get("t_dag_s"), m.get("t_a_s"), m.get("t_b_s")]
                         for m in out.metrics],
        "n_hosts": len(hosts), "seeds": n_seeds,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
