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


def cluster_spark(app: str, cores_max: int, executor_cores: int = 2,
                  n_parts: int | None = None):
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
    n_parts = int(os.environ.get("BENCH_PARTS", max(cores_max, 16)))

    from pyspark.sql import functions as F

    from infinitycrawler_spark.functions.robots import parse_robots_txt
    from infinitycrawler_spark.plans.crawl_job import CrawlJob
    from infinitycrawler_spark.settings import CrawlSettings, RequestProcessorOptions
    from tools.bench_scaling import mirrored_web

    spark = cluster_spark(f"bench-cluster-{cores_max}", cores_max,
                          n_parts=n_parts)
    spark.sparkContext.setLogLevel("ERROR")
    n_exec = spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size() - 1

    pages = mirrored_web(spark, sf_dir, mirrors)
    if validate:
        from infinitycrawler_spark.synth.payload import with_real_payload
        pages = with_real_payload(pages, w=32, h=24, fmt="rgb8-q")
    pages = pages.persist()
    seeds_df = pages.filter(F.col("url").like("%/order/%")).select("url")
    n_seeds = seeds_df.count()

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
