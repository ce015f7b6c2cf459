"""CrawledContent + per-request parity on RESULTS (VERDICT r2 items
4/7): the fields a reference user reads off ``result.Content.*`` and
``result.Requests`` / ``result.RedirectChain[*].Requests``
(CrawledUri.cs:10-56, DefaultContentProcessor.cs:17-52) must survive
the trip through CrawlJob."""

from infinitycrawler_spark.plans.crawl_job import crawl_fixture
from infinitycrawler_spark.settings import CrawlSettings, RequestProcessorOptions
from infinitycrawler_spark.synth.fixtures import WebFixture, _page, basic_site


def _settings(**kw):
    return CrawlSettings(
        request_processor_options=RequestProcessorOptions().no_delay(), **kw)


HTML = (b"<html><head>"
        b"<base href='http://localhost/base/'>"
        b"<meta name='robots' content='noarchive'>"
        b"<link rel='canonical' href='canon.html'>"
        b"</head><body>"
        b"<a href='leaf.html' title='Leaf Title' rel='next'>Leaf Text</a>"
        b"<a href='leaf.html#frag'>Frag</a>"
        b"</body></html>")


def _content_fixture() -> WebFixture:
    pages = [
        _page("http://localhost/", content_type="text/html",
              charset="utf-8", content_encoding="identity",
              x_robots_tag=["header-rule"]),
        _page("http://localhost/base/leaf.html"),
        _page("http://localhost/base/canon.html"),
    ]
    bodies = {
        "http://localhost/": HTML,
        "http://localhost/base/leaf.html": b"<html><body>leaf</body></html>",
        "http://localhost/base/canon.html": b"<html></html>",
    }
    for p in pages:
        p["body"] = bodies[p["url"]]
        p["links"] = None
        p["base_href"] = None
        p["canonical_href"] = None
        p["robots_meta"] = None
    return WebFixture(name="content_parity_site", pages=pages,
                      robots_txt={}, sitemap_urls=[],
                      seed_uri="http://localhost/")


def test_crawled_content_fields_on_results(spark):
    """Field-for-field CrawledContent through the engine
    (DefaultContentProcessor.cs:17-52 + Crawler.cs:70-71 RawContent)."""
    out = crawl_fixture(spark, _content_fixture(), _settings())
    by = {r.url: r for r in out.results.collect()}
    root = by["http://localhost/"]
    assert root.status == "Crawled"
    assert root.content_type == "text/html"
    assert root.charset == "utf-8"
    assert root.content_encoding == "identity"
    # X-Robots-Tag header values first, then the meta robots value
    assert root.page_robot_rules == ["header-rule", "noarchive"]
    assert root.raw_content == HTML.decode("utf-8")
    assert root.canonical == "http://localhost/base/canon.html"
    # structured links: location resolved against <base href>, with
    # text/title/rel preserved (CrawlLink.cs:7-13); fragment kept in
    # link locations (the reference strips it at enqueue, not parse)
    links = [(l.location, l.text, l.title, l.rel) for l in root.links_detail]
    assert links == [
        ("http://localhost/base/leaf.html", "Leaf Text", "Leaf Title", "next"),
        ("http://localhost/base/leaf.html#frag", "Frag", None, None),
    ]
    # bare-string links column (oracle surface) unchanged: stripped
    assert root.links == ["http://localhost/base/leaf.html"] * 2
    # leaf carries its own raw content; no robots rules
    leaf = by["http://localhost/base/leaf.html"]
    assert leaf.raw_content == "<html><body>leaf</body></html>"
    assert leaf.page_robot_rules == []


def test_unknown_charset_token_falls_back(spark):
    """Real servers send garbled charset tokens ('utf8mb4', parameter
    tails); decode must fall back to utf-8 instead of failing the
    task with LookupError."""
    pages = [
        _page("http://localhost/", content_type="text/html",
              charset="utf8mb4-bogus"),
    ]
    pages[0]["body"] = b"<html><body>ok</body></html>"
    pages[0]["links"] = None
    fx = WebFixture(name="charset_site", pages=pages, robots_txt={},
                    sitemap_urls=[], seed_uri="http://localhost/")
    out = crawl_fixture(spark, fx, _settings())
    root = {r.url: r for r in out.results.collect()}["http://localhost/"]
    assert root.status == "Crawled"
    assert root.raw_content == "<html><body>ok</body></html>"


def test_attempt_log_matches_scheduler(spark):
    """CrawlRequest parity (CrawledUri.cs:36-42) across retry/terminal/
    success paths, with starts spaced by the politeness delay."""
    # serialized like the reference's ThrottlingTest: start spacing is
    # only globally observable at one in-flight request per host
    opts = RequestProcessorOptions(
        max_number_of_simultaneous_requests=1,
        delay_between_request_start_ms=100, delay_jitter_ms=0,
        timeout_before_throttle_ms=0)
    out = crawl_fixture(spark, basic_site(),
                        CrawlSettings(request_processor_options=opts))
    by = {r.url: r for r in out.results.collect()}

    # 5xx retried to MaxRetries: 3 attempts, all 500, none successful
    mr = by["http://localhost/status/500"]
    assert mr.status == "MaxRetries" and mr.n_attempts == 3
    assert [a.status_code for a in mr.attempts] == [500, 500, 500]
    assert all(not a.is_success for a in mr.attempts)
    starts = [a.start_ms for a in mr.attempts]
    assert starts == sorted(starts)
    assert all(b - a >= 100 for a, b in zip(starts, starts[1:]))

    # success: one attempt, 200, successful
    ok = by["http://localhost/basic-page.html"]
    assert [(a.status_code, a.is_success) for a in ok.attempts] == [(200, True)]
    # terminal 4xx: crawled-without-content still logs its one attempt
    nf = by["http://localhost/status/404"]
    assert [(a.status_code, a.is_success) for a in nf.attempts] == [(404, False)]
    assert nf.content_type is None and nf.raw_content is None
    # n_attempts stays consistent with the log everywhere
    for r in by.values():
        if r.status in ("Crawled", "MaxRetries"):
            assert r.n_attempts == len(r.attempts), r.url

    # per-host politeness: every request start on one host is spaced by
    # >= the delay (the virtual clock persists across rounds)
    per_host = {}
    for r in by.values():
        for a in r.attempts:
            per_host.setdefault(r.host, []).append(a.start_ms)
        for hop in r.redirect_hops:
            for a in hop.attempts:
                per_host.setdefault(r.host, []).append(a.start_ms)
    for host, ss in per_host.items():
        ss = sorted(ss)
        assert all(b - a >= 100 for a, b in zip(ss, ss[1:])), host


def test_redirect_hops_carry_request_lists(spark):
    """CrawledUriRedirect parity (CrawledUri.cs:30-34): each hop keeps
    the requests made against the pre-redirect location; a MaxRedirects
    result carries the chain but no Requests (CrawlRunner.cs:188-197)."""
    out = crawl_fixture(spark, basic_site(), _settings())
    by = {r.url: r for r in out.results.collect()}

    two = by["http://localhost/redirect/0/two-redirects"]
    assert two.status == "Crawled"
    assert [h.location for h in two.redirect_hops] == list(two.redirect_chain)
    for hop in two.redirect_hops:
        assert [(a.status_code, a.is_success) for a in hop.attempts] == [(302, False)]
    # final location's own attempt is the 200
    assert [a.status_code for a in two.attempts] == [200]

    cap = by["http://localhost/redirect/2/five-redirects"]
    assert cap.status == "MaxRedirects"
    assert list(cap.attempts) == []            # no Requests on MaxRedirects
    assert [h.location for h in cap.redirect_hops] == list(cap.redirect_chain)
    assert len(cap.redirect_hops) == 3

    # RobotsBlocked at admission: neither attempts nor hops
    rb = by["http://localhost/robots-blocked.html"]
    assert rb.status == "RobotsBlocked"
    assert list(rb.attempts) == [] and list(rb.redirect_hops) == []
