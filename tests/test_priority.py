"""Per-host priority queue (north-rule addition; the reference's queue
is FIFO-only, DefaultRequestProcessor.cs:19): ``priority_expr`` ranks
URLs within a host's politeness round, ties keep FIFO order, and the
default (no expr) stays exactly FIFO."""

from infinitycrawler_spark import golden
from infinitycrawler_spark.plans.crawl_job import crawl_fixture
from infinitycrawler_spark.settings import CrawlSettings, RequestProcessorOptions
from infinitycrawler_spark.synth.fixtures import WebFixture, _page, basic_site


def _site() -> WebFixture:
    pages = [
        _page("http://localhost/", links=[]),
        _page("http://localhost/a.html"),
        _page("http://localhost/vip-1.html"),
        _page("http://localhost/b.html"),
        _page("http://localhost/vip-2.html"),
    ]
    return WebFixture(
        name="priority_site", pages=pages, robots_txt={},
        sitemap_urls=["http://localhost/a.html",
                      "http://localhost/vip-1.html",
                      "http://localhost/b.html",
                      "http://localhost/vip-2.html"],
        seed_uri="http://localhost/")


def _starts(out):
    return {r.url: r.attempts[0].start_ms for r in out.results.collect()
            if r.attempts}


def test_priority_expr_orders_within_host(spark):
    # serialized per-host politeness so launch order is observable in
    # the request-start times
    opts = RequestProcessorOptions(
        max_number_of_simultaneous_requests=1,
        delay_between_request_start_ms=100, delay_jitter_ms=0,
        timeout_before_throttle_ms=0)
    settings = CrawlSettings(
        priority_expr="case when url like '%vip%' then 10 else 0 end",
        request_processor_options=opts)
    out = crawl_fixture(spark, _site(), settings)
    starts = _starts(out)
    vip = [starts["http://localhost/vip-1.html"],
           starts["http://localhost/vip-2.html"]]
    rest = [starts["http://localhost/"], starts["http://localhost/a.html"],
            starts["http://localhost/b.html"]]
    assert max(vip) < min(rest)
    # ties within a priority class keep FIFO (enqueue) order
    assert starts["http://localhost/vip-1.html"] < starts["http://localhost/vip-2.html"]
    assert starts["http://localhost/"] < starts["http://localhost/a.html"] \
        < starts["http://localhost/b.html"]


def test_default_priority_keeps_fifo_golden(spark):
    """With no priority_expr the engine must stay golden-exact FIFO —
    the reference-parity contract is untouched by the feature."""
    settings = CrawlSettings(
        request_processor_options=RequestProcessorOptions().no_delay())
    out = crawl_fixture(spark, basic_site(), settings)
    g = golden.crawl(basic_site(), settings)
    assert out.enqueue_log == g.enqueue_order
    assert {(r.url, r.status, r.n_attempts) for r in out.results.collect()} \
        == {(r.url, r.status, r.n_attempts) for r in g.results}
