"""End-to-end: the Spark engine must reproduce the golden interpreter's
results set, seen set, and enqueue order on the reference's fixtures —
i.e. every BasicSiteTests.cs assertion plus exact-order/seen-set match
(the BASELINE.json north-rule criterion)."""

import pytest

from infinitycrawler_spark import golden
from infinitycrawler_spark.plans.crawl_job import crawl_fixture
from infinitycrawler_spark.settings import CrawlSettings, RequestProcessorOptions
from infinitycrawler_spark.synth.fixtures import basic_site, empty_site


def _settings(**kw) -> CrawlSettings:
    kw.setdefault("request_processor_options",
                  RequestProcessorOptions().no_delay())
    return CrawlSettings(**kw)


@pytest.fixture(scope="module")
def basic_crawl(spark):
    out = crawl_fixture(spark, basic_site(), _settings())
    rows = out.results.collect()
    return out, rows


def _result_set(rows):
    return {(r.url, r.status, r.n_attempts, len(r.redirect_chain)) for r in rows}


def test_results_match_golden_exactly(basic_crawl):
    out, rows = basic_crawl
    g = golden.crawl(basic_site(), _settings())
    assert _result_set(rows) == g.result_set()


def test_seen_set_matches_golden(basic_crawl, spark):
    out, _ = basic_crawl
    engine_seen = {r.url for r in out.seen.collect()}
    g = golden.crawl(basic_site(), _settings())
    assert engine_seen == g.seen


def test_enqueue_order_matches_golden_fifo(basic_crawl):
    out, _ = basic_crawl
    g = golden.crawl(basic_site(), _settings())
    assert out.enqueue_log == g.enqueue_order


def test_uris_only_once_and_statuses(basic_crawl):
    _, rows = basic_crawl
    urls = [r.url for r in rows]
    assert len(urls) == len(set(urls))
    by = {r.url: r for r in rows}
    assert by["http://localhost/robots-blocked.html"].status == "RobotsBlocked"
    assert by["http://localhost/status/500"].status == "MaxRetries"
    assert by["http://localhost/status/500"].n_attempts == 3
    assert by["http://localhost/status/404"].n_attempts == 1
    r5 = by["http://localhost/redirect/2/five-redirects"]
    assert r5.status == "MaxRedirects" and len(r5.redirect_chain) == 3
    r2 = by["http://localhost/redirect/0/two-redirects"]
    assert r2.status == "Crawled" and len(r2.redirect_chain) == 2
    assert "http://not-allowed-domain.com/" in by["http://localhost/index.html"].links


def test_payload_validated_on_every_crawled_page(basic_crawl):
    _, rows = basic_crawl
    crawled = [r for r in rows if r.status == "Crawled" and r.last_status_code
               and 200 <= r.last_status_code <= 299]
    assert crawled
    for r in crawled:
        assert r.image_ok, f"payload failed for {r.url}"
        assert r.phash_match and r.caption_ok
        assert r.psnr_db >= 40.0


def test_host_aliases(spark):
    out = crawl_fixture(spark, basic_site(),
                        _settings(host_aliases=["test-domain.com"]))
    g = golden.crawl(basic_site(), _settings(host_aliases=["test-domain.com"]))
    rows = out.results.collect()
    assert _result_set(rows) == g.result_set()
    by = {r.url: r for r in rows}
    assert by["http://test-domain.com/"].status == "Crawled"


@pytest.mark.parametrize("max_pages", [2, 4])
def test_max_pages_budget(spark, max_pages):
    out = crawl_fixture(spark, basic_site(),
                        _settings(max_number_of_pages_to_crawl=max_pages))
    g = golden.crawl(basic_site(),
                     _settings(max_number_of_pages_to_crawl=max_pages))
    rows = out.results.collect()
    assert len(rows) == max_pages
    assert _result_set(rows) == g.result_set()


def test_empty_site_max_retries(spark):
    extra = [f"http://localhost/delay/500/500ms-delay-{i}" for i in range(1, 5)]
    out = crawl_fixture(spark, empty_site(), _settings(number_of_retries=3),
                        extra_queue_urls=extra)
    g = golden.crawl(empty_site(), _settings(number_of_retries=3),
                     extra_queue_urls=extra)
    rows = out.results.collect()
    assert _result_set(rows) == g.result_set()
    delayed = [r for r in rows if "delay" in r.url]
    assert len(delayed) == 4
    assert all(r.status == "MaxRetries" and r.n_attempts == 3 for r in delayed)


def test_resume_from_snapshot_is_exact(spark, tmp_path):
    """Interrupt after 2 rounds, resume, and match the golden oracle —
    the north rule's exact-resume criterion."""
    from infinitycrawler_spark.functions.robots import parse_robots_txt
    from infinitycrawler_spark.plans.crawl_job import CrawlJob
    from infinitycrawler_spark.sources.web import pages_df

    fx = basic_site()
    job = CrawlJob(
        spark=spark, pages=pages_df(spark, fx),
        robots_map={h: parse_robots_txt(t) for h, t in fx.robots_txt.items()},
        sitemap_urls=fx.sitemap_urls, seed_uri=fx.seed_uri,
        settings=_settings(), store_root=str(tmp_path / "state"))
    job.run(max_rounds=2)
    out = job.run(resume=True)
    g = golden.crawl(basic_site(), _settings())
    assert _result_set(out.results.collect()) == g.result_set()
    assert {r.url for r in out.seen.collect()} == g.seen


def test_metrics_emitted(basic_crawl):
    out, _ = basic_crawl
    assert out.rounds >= 3
    assert len(out.metrics) == out.rounds
    m0 = out.metrics[0]
    for key in ("frontier_size", "fetched", "results_emitted", "new_urls",
                "pages_per_s", "politeness_wait_ms"):
        assert key in m0


def test_wildcard_robots_gates_admission(spark):
    """RFC 9309 wildcard Disallow (`/*.php$`) blocks matching links at
    admission, end-to-end through the engine AND the golden oracle."""
    from infinitycrawler_spark.synth.fixtures import WebFixture, _link, _page

    fx = WebFixture(
        name="wildcard-robots",
        pages=[
            _page("http://localhost/",
                  links=[_link("a.php"), _link("a.php?x=1"), _link("b.html"),
                         _link("dir/c.php")]),
            _page("http://localhost/a.php"),
            _page("http://localhost/a.php?x=1"),
            _page("http://localhost/b.html"),
            _page("http://localhost/dir/c.php"),
        ],
        robots_txt={"localhost": "User-agent: *\nDisallow: /*.php$\n"},
        sitemap_urls=[], seed_uri="http://localhost/")
    out = crawl_fixture(spark, fx, _settings())
    rows = out.results.collect()
    g = golden.crawl(fx, _settings())
    assert _result_set(rows) == g.result_set()
    by = {r.url: r.status for r in rows}
    # $-anchored: bare .php URLs blocked, the query-string one crawled
    assert by["http://localhost/a.php"] == "RobotsBlocked"
    assert by["http://localhost/dir/c.php"] == "RobotsBlocked"
    assert by["http://localhost/a.php?x=1"] == "Crawled"
    assert by["http://localhost/b.html"] == "Crawled"
