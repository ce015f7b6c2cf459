"""Scale-mode parity: the bench configuration (exact_order=False,
lazy counts, deferred snapshots, fused per-round stats action with
state-table materialization) must produce the same crawl as the
precise/golden path — only ordering metadata may differ."""

from infinitycrawler_spark import golden
from infinitycrawler_spark.functions.robots import parse_robots_txt
from infinitycrawler_spark.plans.crawl_job import CrawlJob
from infinitycrawler_spark.settings import CrawlSettings, RequestProcessorOptions
from infinitycrawler_spark.sources.web import pages_df
from infinitycrawler_spark.synth.fixtures import basic_site


def test_scale_mode_matches_golden(spark, tmp_path):
    fx = basic_site()
    settings = CrawlSettings(
        request_processor_options=RequestProcessorOptions().no_delay())
    job = CrawlJob(
        spark=spark, pages=pages_df(spark, fx),
        robots_map={h: parse_robots_txt(t) for h, t in fx.robots_txt.items()},
        sitemap_urls=fx.sitemap_urls, seed_uri=fx.seed_uri,
        settings=settings, store_root=str(tmp_path / "state"),
        collect_enqueue_log=False, exact_order=False,
        snapshot_every=100, eager_checkpoint=False)
    out = job.run()
    g = golden.crawl(basic_site(), settings)
    assert {(r.url, r.status, r.n_attempts) for r in out.results.collect()} \
        == {(r.url, r.status, r.n_attempts) for r in g.results}
    assert {r.url for r in out.seen.collect()} == g.seen
    # fused stats action must still report sane per-round metrics
    assert sum(m["fetched"] for m in out.metrics) >= len(g.results)


def test_scale_mode_resume_is_exact(spark, tmp_path):
    """Resume after a scale-mode run stopped mid-crawl: the pipelined
    loop commits asynchronously and never reloads mid-run, so this
    pins that its snapshots still resume exactly (run 1 does one
    round, run 2 resumes from the committed snapshot and must finish
    with the same final state as an uninterrupted crawl)."""
    fx = basic_site()
    settings = CrawlSettings(
        request_processor_options=RequestProcessorOptions().no_delay())

    def make_job():
        return CrawlJob(
            spark=spark, pages=pages_df(spark, fx),
            robots_map={h: parse_robots_txt(t)
                        for h, t in fx.robots_txt.items()},
            sitemap_urls=fx.sitemap_urls, seed_uri=fx.seed_uri,
            settings=settings, store_root=str(tmp_path / "state"),
            collect_enqueue_log=False, exact_order=False,
            snapshot_every=1, eager_checkpoint=False)

    make_job().run(max_rounds=1)
    out = make_job().run(resume=True)
    g = golden.crawl(basic_site(), settings)
    assert {(r.url, r.status, r.n_attempts) for r in out.results.collect()} \
        == {(r.url, r.status, r.n_attempts) for r in g.results}
    assert {r.url for r in out.seen.collect()} == g.seen


def test_snapshot_migration_adds_new_columns(spark):
    """Snapshots written before FRONTIER.priority / STATES.att_log
    existed must still resume: _migrate patches defaulted columns."""
    old_frontier = spark.createDataFrame(
        [("http://h/", "h", 1, 1, 0, 0)],
        "url string, host string, url_key long, enqueue_seq long,"
        " depth int, round_enqueued int")
    out = CrawlJob._migrate(old_frontier, {"priority": "cast(0 as int)"})
    assert "priority" in out.columns and out.collect()[0].priority == 0
    # already-migrated frames pass through untouched
    again = CrawlJob._migrate(out, {"priority": "cast(0 as int)"})
    assert again.columns == out.columns


def test_serialized_replay_requires_exact_order(spark, tmp_path):
    """Per-host sequence windows make enqueue_seq non-unique, so the
    serialized dequeue would silently drop rows — refuse the combo."""
    import pytest

    fx = basic_site()
    job = CrawlJob(
        spark=spark, pages=pages_df(spark, fx),
        robots_map={h: parse_robots_txt(t) for h, t in fx.robots_txt.items()},
        sitemap_urls=fx.sitemap_urls, seed_uri=fx.seed_uri,
        settings=CrawlSettings(
            replay_mode="serialized",
            request_processor_options=RequestProcessorOptions().no_delay()),
        store_root=str(tmp_path / "state"), exact_order=False)
    with pytest.raises(ValueError, match="serialized"):
        job.run()


def test_scale_mode_extras_crawled_when_seed_blocked(spark, tmp_path):
    """Scale mode precomputes round-0 frontier stats BEFORE
    extra_queue_urls join the frontier; with an all-blocking robots the
    admitted frontier is empty and a stale count of 0 would end the
    crawl with the extras committed but never fetched (ADVICE r2)."""
    fx = basic_site()
    settings = CrawlSettings(
        request_processor_options=RequestProcessorOptions().no_delay())
    job = CrawlJob(
        spark=spark, pages=pages_df(spark, fx),
        robots_map={"localhost": parse_robots_txt("User-agent: *\nDisallow: /\n")},
        sitemap_urls=[], seed_uri=fx.seed_uri,
        settings=settings, store_root=str(tmp_path / "state"),
        collect_enqueue_log=False, exact_order=False,
        snapshot_every=100, eager_checkpoint=False)
    out = job.run(extra_queue_urls=["http://localhost/index.html"])
    by = {r.url: r.status for r in out.results.collect()}
    # the extra URL bypassed admission and MUST have been fetched
    assert by["http://localhost/index.html"] == "Crawled"


def test_seen_segments_match_golden_and_resume(spark, tmp_path):
    """seen_segment_rounds=2: the seen set lives as a union of
    per-round delta segments (full rewrite only every 2nd round). Must
    be invisible semantically — same results/seen as golden — and the
    committed snapshots must still resume exactly."""
    fx = basic_site()
    settings = CrawlSettings(
        seen_segment_rounds=2,
        request_processor_options=RequestProcessorOptions().no_delay())

    def make_job(root):
        return CrawlJob(
            spark=spark, pages=pages_df(spark, fx),
            robots_map={h: parse_robots_txt(t)
                        for h, t in fx.robots_txt.items()},
            sitemap_urls=fx.sitemap_urls, seed_uri=fx.seed_uri,
            settings=settings, store_root=str(tmp_path / root),
            collect_enqueue_log=False, exact_order=False,
            snapshot_every=1, eager_checkpoint=False)

    out = make_job("a").run()
    g = golden.crawl(basic_site(), settings)
    assert {(r.url, r.status, r.n_attempts) for r in out.results.collect()} \
        == {(r.url, r.status, r.n_attempts) for r in g.results}
    assert {r.url for r in out.seen.collect()} == g.seen

    make_job("b").run(max_rounds=1)
    resumed = make_job("b").run(resume=True)
    assert {(r.url, r.status, r.n_attempts)
            for r in resumed.results.collect()} \
        == {(r.url, r.status, r.n_attempts) for r in g.results}
    assert {r.url for r in resumed.seen.collect()} == g.seen
