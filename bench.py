"""Benchmark runner — prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...},
 "sf": ..., "crawl": {...}}

Headline set: the heaviest oracle-checked operators (agg, broadcast
join, MinHash-LSH dedup, SimHash, ANN top-k, sessionization) plus the
flagship crawl-engine fixpoint over the TPC-H-derived web with ALL
order pages seeded (frontier ≈ |orders|), reporting URLs fetched/sec.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32),
     BENCH_SKIP_CRAWL=1 to run only the query set.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def run_crawl_bench(spark, sf_dir: str, max_seed_orderkey: int = 50_000):
    """Full-frontier crawl over the derived web (scale mode: per-host
    ordering, no enqueue log, sparse snapshots)."""
    import tempfile

    from pyspark.sql import functions as F

    from __spark_entry__ import build_web_from_tpch
    from infinitycrawler_spark.functions.robots import parse_robots_txt
    from infinitycrawler_spark.plans.crawl_job import CrawlJob
    from infinitycrawler_spark.settings import CrawlSettings, RequestProcessorOptions

    pages, _, hosts = build_web_from_tpch(spark, sf_dir)
    pages = pages.persist()
    # seeds stay a DataFrame end-to-end (never collected to the driver —
    # at 10^7+ seeds a Python list would serialize through the driver)
    seeds = (pages.filter(F.col("url").like("%/order/%"))
             .filter(F.split(F.col("url"), "/order/").getItem(1).cast("long")
                     <= max_seed_orderkey)
             .select("url"))
    n_seeds = seeds.count()
    settings = CrawlSettings(
        host_aliases=hosts, number_of_retries=2, validate_payload=False,
        request_processor_options=RequestProcessorOptions().no_delay())
    robots_map = {"nation00.shop": parse_robots_txt(
        "User-agent: *\nDisallow: /order/9\n")}
    job = CrawlJob(
        spark=spark, pages=pages, robots_map=robots_map,
        sitemap_urls=seeds, seed_uri="http://nation00.shop/",
        settings=settings, collect_enqueue_log=False, exact_order=False,
        snapshot_every=100,
        store_root=tempfile.mkdtemp(prefix="bench_crawl_"))
    t0 = time.time()
    out = job.run()
    wall = time.time() - t0
    fetched = sum(m["fetched"] for m in out.metrics)
    pages.unpersist()
    return {
        "wall_s": round(wall, 2),
        "rounds": out.rounds,
        "urls_fetched": int(fetched),
        "urls_per_s": round(fetched / wall, 1),
        "results": out.results.count(),
        "seeds": n_seeds,
    }


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from infinitycrawler_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark("bench", cpus=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    all_queries = entry_mod.queries()

    headline = [
        "pricing_summary", "broadcast_join", "topk_budget_window",
        "multi_join", "window_last_attempt", "explode_wordcount",
        "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
        "dedup_ngram_jaccard", "ann_bruteforce_topk", "ann_lsh_topk",
        "text_quality", "text_tokens", "text_fingerprint",
        "events_sessionize", "events_tumbling",
    ]

    # JVM/codegen warmup (untimed)
    all_queries["pricing_summary"](spark, sf_dir).collect()

    timings = {}
    total = 0.0
    for name in headline:
        t0 = time.time()
        all_queries[name](spark, sf_dir).collect()
        dt = time.time() - t0
        timings[name] = round(dt, 3)
        total += dt

    crawl = None
    if os.environ.get("BENCH_SKIP_CRAWL") != "1":
        crawl = run_crawl_bench(spark, sf_dir)
        timings["crawl_fixpoint"] = crawl["wall_s"]
        total += crawl["wall_s"]

    out = {
        "metric": "headline-suite wall time (queries + full-frontier crawl)",
        "value": round(total, 2),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": cpus,
    }
    if crawl:
        out["crawl"] = crawl
    print(json.dumps(out))


if __name__ == "__main__":
    main()
