"""The golden interpreter must reproduce every assertion of the
reference's BasicSiteTests.cs on the basic_site fixture — this validates
the oracle before it is used to judge the Spark engine."""

from infinitycrawler_spark.golden import crawl
from infinitycrawler_spark.settings import CrawlSettings, RequestProcessorOptions
from infinitycrawler_spark.synth.fixtures import basic_site, empty_site


def _settings(**kw) -> CrawlSettings:
    kw.setdefault("request_processor_options",
                  RequestProcessorOptions().no_delay())
    return CrawlSettings(**kw)


def test_discovers_index_from_sitemap_and_links():
    g = crawl(basic_site(), _settings())
    by = g.by_url()
    assert "http://localhost/index.html" in by          # BasicSiteTests.cs:29
    assert "http://localhost/basic-page.html" in by     # :37


def test_obeys_robots_blocking():
    g = crawl(basic_site(), _settings())
    by = g.by_url()
    assert by["http://localhost/robots-blocked.html"].status == "RobotsBlocked"
    assert "http://localhost/robots-blocked-child.html" not in by  # :45-55


def test_uris_only_appear_once():
    g = crawl(basic_site(), _settings())
    urls = [r.url for r in g.results]
    assert len(urls) == len(set(urls))  # :58-63


def test_server_errors_retried_exactly_3_attempts():
    g = crawl(basic_site(), _settings())
    r = g.by_url()["http://localhost/status/500"]
    assert r.n_attempts == 3  # :66-72
    assert r.status == "MaxRetries"


def test_4xx_not_retried():
    g = crawl(basic_site(), _settings())
    by = g.by_url()
    for code in (404, 403, 401):
        r = by[f"http://localhost/status/{code}"]
        assert r.n_attempts == 1 and r.status == "Crawled"  # :75-85


def test_external_not_crawled_unless_aliased():
    g = crawl(basic_site(), _settings())
    by = g.by_url()
    assert "http://not-allowed-domain.com/" not in by
    assert "http://test-domain.com/" not in by
    # index content still *links* to the external site (:88-99)
    assert "http://not-allowed-domain.com/" in by["http://localhost/index.html"].links

    g2 = crawl(basic_site(), _settings(host_aliases=["test-domain.com"]))
    by2 = g2.by_url()
    assert by2["http://test-domain.com/"].status == "Crawled"  # :101-125
    assert "http://not-allowed-domain.com/" not in by2


def test_nofollow_ignored():
    g = crawl(basic_site(), _settings())
    assert "http://localhost/index.html?v=rel-no-follow" not in g.by_url()  # :127


def test_redirect_limit_with_chain_3():
    g = crawl(basic_site(), _settings())
    r = g.by_url()["http://localhost/redirect/2/five-redirects"]
    assert r.status == "MaxRedirects" and len(r.redirect_chain) == 3  # :135-143
    # the 2-hop chain completes
    ok = g.by_url()["http://localhost/redirect/0/two-redirects"]
    assert ok.status == "Crawled" and len(ok.redirect_chain) == 2


def test_max_pages_2_and_4():
    for max_pages in (2, 4):  # :145-163
        g = crawl(basic_site(), _settings(max_number_of_pages_to_crawl=max_pages))
        assert len(g.results) == max_pages


def test_305_terminal_not_redirected():
    g = crawl(basic_site(), _settings())
    r = g.by_url()["http://localhost/status/305"]
    assert r.status == "Crawled" and r.n_attempts == 1  # CrawlRunner.cs:278-290
    assert "http://localhost/use-proxy" not in g.seen


def test_empty_site_max_retries():
    # AutoRetryOnFailure (:166-199): unreachable URLs → MaxRetries
    g = crawl(empty_site(), _settings(number_of_retries=3),
              extra_queue_urls=[f"http://localhost/delay/500/500ms-delay-{i}"
                                for i in range(1, 5)])
    delayed = [r for r in g.results if "delay" in r.url]
    assert len(delayed) == 4
    assert all(r.status == "MaxRetries" and r.n_attempts == 3 for r in delayed)


def test_seen_includes_robots_blocked_but_not_external():
    # CrawlRunner.cs:140-164 ordering quirk
    g = crawl(basic_site(), _settings())
    assert "http://localhost/robots-blocked.html" in g.seen
    assert "http://not-allowed-domain.com/" not in g.seen


def test_query_string_is_separate_uri():
    g = crawl(basic_site(), _settings())
    assert "http://localhost/index.html?v=query-strings-are-separate-uris" in g.by_url()


def test_enqueue_order_deterministic():
    a = crawl(basic_site(), _settings()).enqueue_order
    b = crawl(basic_site(), _settings()).enqueue_order
    assert a == b
    assert a[0] == "http://localhost/"
    assert a[1] == "http://localhost/index.html"
