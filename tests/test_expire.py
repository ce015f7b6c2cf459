"""Snapshot expiration (state/store.py::expire_snapshots — Iceberg
`expire_snapshots` semantics): old versions' full-state tables go away,
append-only deltas and manifests stay, the newest versions remain exact
resume points. Bounds the store at O(keep · state + total deltas) on a
long crawl."""

import json
import os

import pytest

from infinitycrawler_spark import golden
from infinitycrawler_spark.functions.robots import parse_robots_txt
from infinitycrawler_spark.plans.crawl_job import CrawlJob
from infinitycrawler_spark.settings import CrawlSettings, RequestProcessorOptions
from infinitycrawler_spark.sources.web import pages_df
from infinitycrawler_spark.state.store import SnapshotStore
from infinitycrawler_spark.synth.fixtures import basic_site


def _commit_n(spark, store, n):
    for v in range(n):
        df = spark.range(v * 10, v * 10 + 3).toDF("id")
        store.commit(v, tables={"frontier": df},
                     deltas={"results": df.withColumnRenamed("id", "r")},
                     meta={"round": v})


def test_expire_keeps_deltas_and_newest_tables(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "s"))
    _commit_n(spark, store, 4)
    assert store.expire_snapshots(keep_last=2) == [0, 1]
    # all four versions still listed; deltas union to the full history
    assert store.versions() == [0, 1, 2, 3]
    deltas = store.read_deltas(spark, 3, "results")
    assert deltas.count() == 12
    # newest two keep their tables; expired ones dropped + flagged
    assert store.read_table(spark, 3, "frontier").count() == 3
    assert not os.path.exists(str(tmp_path / "s/v00000/frontier.parquet"))
    with open(str(tmp_path / "s/v00000/manifest.json")) as f:
        m = json.load(f)
    assert m["expired"] and m["tables"] == {}
    # idempotent: a second call expires nothing new
    assert store.expire_snapshots(keep_last=2) == []


def test_expire_rejects_zero_keep(tmp_path):
    with pytest.raises(ValueError):
        SnapshotStore(str(tmp_path / "s")).expire_snapshots(keep_last=0)


def _job(spark, store_root, **kw) -> CrawlJob:
    fx = basic_site()
    return CrawlJob(
        spark=spark, pages=pages_df(spark, fx),
        robots_map={h: parse_robots_txt(t) for h, t in fx.robots_txt.items()},
        sitemap_urls=fx.sitemap_urls, seed_uri=fx.seed_uri,
        settings=CrawlSettings(
            request_processor_options=RequestProcessorOptions().no_delay()),
        store_root=store_root, snapshot_every=1, **kw)


def test_crawl_with_keep_snapshots_is_exact_and_bounded(spark, tmp_path):
    root = str(tmp_path / "state")
    out = _job(spark, root, keep_snapshots=1).run()
    g = golden.crawl(basic_site(), CrawlSettings(
        request_processor_options=RequestProcessorOptions().no_delay()))
    assert {(r.url, r.status, r.n_attempts) for r in out.results.collect()} \
        == {(r.url, r.status, r.n_attempts) for r in g.results}
    store = SnapshotStore(root)
    versions = store.versions()
    assert len(versions) >= 2  # multi-round crawl actually committed
    # exactly one version still carries full-state tables
    with_tables = [v for v in versions
                   if os.path.exists(os.path.join(
                       root, f"v{v:05d}", "frontier.parquet"))]
    assert with_tables == [versions[-1]]
    # results survive expiry: the final read unions every delta
    assert store.read_deltas(spark, versions[-1], "results").count() \
        == len(g.results)
    # and the store is still an exact resume point (no-op resume: the
    # frontier is empty, the results are the full crawl)
    resumed = _job(spark, root).run(resume=True)
    assert {(r.url, r.status, r.n_attempts) for r in resumed.results.collect()} \
        == {(r.url, r.status, r.n_attempts) for r in g.results}


def test_scale_mode_async_commit_with_expiry(spark, tmp_path):
    """keep_snapshots under the pipelined scale loop: expiry runs on
    the commit thread, snapshots land in order, results stay exact."""
    root = str(tmp_path / "scale")
    out = _job(spark, root, keep_snapshots=1, exact_order=False,
               collect_enqueue_log=False, eager_checkpoint=False).run()
    g = golden.crawl(basic_site(), CrawlSettings(
        request_processor_options=RequestProcessorOptions().no_delay()))
    assert {(r.url, r.status, r.n_attempts) for r in out.results.collect()} \
        == {(r.url, r.status, r.n_attempts) for r in g.results}
    store = SnapshotStore(root)
    versions = store.versions()
    with_tables = [v for v in versions
                   if os.path.exists(os.path.join(
                       root, f"v{v:05d}", "frontier.parquet"))]
    assert with_tables == [versions[-1]]
    assert store.read_deltas(spark, versions[-1], "results").count() \
        == len(g.results)
