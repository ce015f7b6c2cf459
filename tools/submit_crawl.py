"""spark-submit entry point for the crawl engine — the north rule's
"ships as spark-submit --py-files" packaging, run literally:

    tools/submit_crawl.sh <cores_max> [sf_dir] [mirrors]

builds /tmp/infinitycrawler_pyfiles.zip (the package + the entry/fixture
modules) and submits THIS script to the standalone cluster
(tools/cluster.sh). All engine imports resolve from the --py-files zip
on both driver and executors — no repo checkout needed on workers.
Prints one JSON line with wall/throughput like tools/bench_cluster.py.
"""

from __future__ import annotations

import json
import sys
import time


def main():
    cores_max = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    mirrors = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    # master/cores/memory come from the spark-submit command line
    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    try:
        from tools.bench_scaling import mirrored_web  # repo checkout
    except ImportError:
        from bench_scaling import mirrored_web  # --py-files zip root

    from infinitycrawler_spark.functions.robots import parse_robots_txt
    from infinitycrawler_spark.plans.crawl_job import CrawlJob
    from infinitycrawler_spark.settings import (
        CrawlSettings,
        RequestProcessorOptions,
    )

    import tempfile

    pages = mirrored_web(spark, sf_dir, mirrors).persist()
    seeds_df = pages.filter(F.col("url").like("%/order/%")).select("url")
    n_seeds = seeds_df.count()
    hosts = [r.host for r in pages.select("host").distinct().collect()]
    settings = CrawlSettings(
        host_aliases=hosts,
        number_of_retries=2,
        validate_payload=False,
        request_processor_options=RequestProcessorOptions().no_delay(),
    )
    robots_map = {"nation00-m0.shop": parse_robots_txt(
        "User-agent: *\nDisallow: /order/9\n")}
    t0 = time.perf_counter()
    job = CrawlJob(
        spark=spark, pages=pages, robots_map=robots_map,
        sitemap_urls=seeds_df, seed_uri="http://nation00-m0.shop/",
        settings=settings, collect_enqueue_log=False, exact_order=False,
        snapshot_every=100, eager_checkpoint=False,
        store_root=tempfile.mkdtemp(prefix="submit_crawl_", dir="/dev/shm"))
    out = job.run()
    n = sum(mt["fetched"] for mt in out.metrics)
    wall = time.perf_counter() - t0
    import shutil
    shutil.rmtree(job.store_root, ignore_errors=True)
    n_exec = (spark.sparkContext._jsc.sc()
              .getExecutorMemoryStatus().size() - 1)
    print(json.dumps({
        "mode": "spark-submit", "cores_max": cores_max,
        "executors": n_exec, "sf_dir": sf_dir, "mirrors": mirrors,
        "seeds": n_seeds, "urls_fetched": n, "wall_s": round(wall, 2),
        "urls_per_s": round(n / wall, 1),
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
