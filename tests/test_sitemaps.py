"""Sitemap parsing + discovery (Crawler.cs:56-62; SitemapTools
observable semantics) and the raw-HTML-bytes pages mode
(DefaultContentProcessor.cs:24-25), end-to-end through CrawlJob —
mirrors BasicSiteTests.cs:29 DiscoverIndexPageFromSitemap."""

from infinitycrawler_spark import golden
from infinitycrawler_spark.functions.sitemaps import (
    discover_sitemap_urls,
    parse_sitemap_xml,
    sitemaps_from_robots,
)
from infinitycrawler_spark.plans.crawl_job import crawl_fixture
from infinitycrawler_spark.settings import CrawlSettings, RequestProcessorOptions
from infinitycrawler_spark.synth.fixtures import WebFixture, _link, _page

URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>http://localhost/index.html</loc><lastmod>2024-01-01</lastmod></url>
  <url><loc>http://localhost/a.html</loc></url>
  <url><loc>http://localhost/a.html</loc></url>
  <url><loc>http://localhost/b.html</loc></url>
</urlset>"""

SITEMAPINDEX = """<?xml version="1.0" encoding="UTF-8"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>http://localhost/sitemap-a.xml</loc></sitemap>
  <sitemap><loc>http://localhost/sitemap-b.xml</loc></sitemap>
</sitemapindex>"""


def test_parse_urlset_dedup_preserves_order():
    s = parse_sitemap_xml(URLSET)
    assert s.urls == ["http://localhost/index.html", "http://localhost/a.html",
                      "http://localhost/b.html"]  # per-sitemap Distinct()
    assert s.sitemaps == []


def test_parse_sitemapindex():
    s = parse_sitemap_xml(SITEMAPINDEX)
    assert s.urls == []
    assert s.sitemaps == ["http://localhost/sitemap-a.xml",
                          "http://localhost/sitemap-b.xml"]


def test_parse_no_namespace_and_malformed():
    s = parse_sitemap_xml("<urlset><url><loc>http://h/x</loc></url></urlset>")
    assert s.urls == ["http://h/x"]
    assert parse_sitemap_xml("not xml <<<").urls == []
    assert parse_sitemap_xml(b"<urlset><url><loc>http://h/y</loc></url></urlset>"
                             ).urls == ["http://h/y"]


def test_parse_text_sitemap():
    # plain-text sitemaps (sitemaps.org txt format; SitemapTools parity)
    body = ("http://localhost/t1.html\n"
            "\n"
            "not-a-url line\n"
            "http://localhost/t2.html\r\n"
            "http://localhost/t1.html\n"       # dedup, order preserved
            "HTTPS://localhost/t3.html\n")
    s = parse_sitemap_xml(body)
    assert s.urls == ["http://localhost/t1.html", "http://localhost/t2.html",
                      "HTTPS://localhost/t3.html"]
    assert s.sitemaps == []


def test_sitemaps_from_robots():
    txt = ("User-agent: *\nDisallow: /x\n"
           "Sitemap: http://localhost/sm1.xml\n"
           "# comment\nSitemap: http://localhost/sm2.xml\n")
    assert sitemaps_from_robots(txt) == [
        "http://localhost/sm1.xml", "http://localhost/sm2.xml"]


def test_discover_bfs_visits_once():
    files = {
        "http://localhost/sitemap.xml": SITEMAPINDEX,
        "http://localhost/sitemap-a.xml":
            "<urlset><url><loc>http://localhost/a.html</loc></url>"
            "<sitemap><loc>http://localhost/sitemap.xml</loc></sitemap></urlset>",
        "http://localhost/sitemap-b.xml":
            "<urlset><url><loc>http://localhost/b.html</loc></url></urlset>",
    }
    urls = discover_sitemap_urls(files.get, "localhost")
    # cycle back to sitemap.xml is visited once; entries in BFS order
    assert urls == ["http://localhost/a.html", "http://localhost/b.html"]


def test_discover_robots_directives_first():
    files = {
        "http://localhost/from-robots.xml":
            "<urlset><url><loc>http://localhost/r.html</loc></url></urlset>",
        "http://localhost/sitemap.xml":
            "<urlset><url><loc>http://localhost/d.html</loc></url></urlset>",
    }
    urls = discover_sitemap_urls(
        files.get, "localhost",
        robots_text="Sitemap: http://localhost/from-robots.xml\n")
    assert urls == ["http://localhost/r.html", "http://localhost/d.html"]


# ---------------------------------------------------------------- e2e

ROBOTS_BODY = (b"User-agent: *\n"
               b"Disallow: /blocked\n"
               b"Sitemap: http://localhost/deep/sitemap-index.xml\n")

INDEX_HTML = (b"<html><head><base href='http://localhost/base/'>"
              b"<meta name='robots' content='all'></head><body>"
              b"<a href='page1.html'>One</a>"
              b"<a href='/blocked/secret.html'>Blocked</a>"
              b"<a href='nofollowed.html' rel='nofollow'>NF</a>"
              b"<a>NoHref</a>"
              b"<a href='mailto:x@y'>Mail</a>"
              b"</body></html>")


def _bytes_fixture() -> WebFixture:
    """The whole site as raw bytes: robots.txt + a sitemap index + a
    child sitemap + HTML pages. No structured link columns anywhere."""
    pages = [
        _page("http://localhost/robots.txt", content_type="text/plain"),
        _page("http://localhost/deep/sitemap-index.xml",
              content_type="application/xml"),
        _page("http://localhost/deep/sitemap-pages.xml",
              content_type="application/xml"),
        _page("http://localhost/", content_type="text/html"),
        _page("http://localhost/index.html", content_type="text/html"),
        _page("http://localhost/base/page1.html"),
        _page("http://localhost/blocked/secret.html"),
        _page("http://localhost/base/nofollowed.html"),
    ]
    bodies = {
        "http://localhost/robots.txt": ROBOTS_BODY,
        "http://localhost/deep/sitemap-index.xml":
            b"<sitemapindex><sitemap>"
            b"<loc>http://localhost/deep/sitemap-pages.xml</loc>"
            b"</sitemap></sitemapindex>",
        "http://localhost/deep/sitemap-pages.xml":
            b"<urlset><url><loc>http://localhost/index.html</loc></url>"
            b"</urlset>",
        "http://localhost/": INDEX_HTML,
        "http://localhost/index.html": INDEX_HTML,
        "http://localhost/base/page1.html": b"<html><body>leaf</body></html>",
        "http://localhost/base/nofollowed.html": b"<html></html>",
        "http://localhost/blocked/secret.html": b"<html></html>",
    }
    for p in pages:
        p["body"] = bodies[p["url"]]
        p["links"] = None
        p["base_href"] = None
        p["robots_meta"] = None
    return WebFixture(name="bytes_site", pages=pages,
                      robots_txt={}, sitemap_urls=[],
                      seed_uri="http://localhost/")


def _structured_fixture() -> WebFixture:
    """The SAME site pre-extracted by hand — the golden interpreter's
    input. Divergence between the two crawls would mean the bytes path
    (extract_html / sitemap discovery / robots fetch) broke."""
    index_links = [
        _link("page1.html", "One"),
        _link("/blocked/secret.html", "Blocked"),
        _link("nofollowed.html", "NF", rel="nofollow"),
        _link("mailto:x@y", "Mail"),
    ]
    pages = [
        _page("http://localhost/robots.txt", content_type="text/plain"),
        _page("http://localhost/deep/sitemap-index.xml",
              content_type="application/xml"),
        _page("http://localhost/deep/sitemap-pages.xml",
              content_type="application/xml"),
        _page("http://localhost/", links=index_links,
              base_href="http://localhost/base/"),
        _page("http://localhost/index.html", links=index_links,
              base_href="http://localhost/base/"),
        _page("http://localhost/base/page1.html"),
        _page("http://localhost/blocked/secret.html"),
        _page("http://localhost/base/nofollowed.html"),
    ]
    return WebFixture(
        name="struct_site", pages=pages,
        robots_txt={"localhost": ROBOTS_BODY.decode()},
        sitemap_urls=["http://localhost/index.html"],  # discovery outcome
        seed_uri="http://localhost/")


def _settings():
    return CrawlSettings(
        request_processor_options=RequestProcessorOptions().no_delay())


def test_text_sitemap_discovery_e2e(spark):
    """A robots ``Sitemap:`` directive pointing at a .txt sitemap seeds
    the crawl (SitemapTools text-sitemap parity, VERDICT r2 §missing 4)."""
    pages = [
        _page("http://localhost/robots.txt", content_type="text/plain"),
        _page("http://localhost/sitemap.txt", content_type="text/plain"),
        _page("http://localhost/", content_type="text/html"),
        _page("http://localhost/from-text-sitemap.html",
              content_type="text/html"),
    ]
    bodies = {
        "http://localhost/robots.txt":
            b"User-agent: *\nSitemap: http://localhost/sitemap.txt\n",
        "http://localhost/sitemap.txt":
            b"http://localhost/from-text-sitemap.html\n",
        "http://localhost/": b"<html><body>root</body></html>",
        "http://localhost/from-text-sitemap.html": b"<html></html>",
    }
    for p in pages:
        p["body"] = bodies[p["url"]]
        p["links"] = None
    fx = WebFixture(name="text_sitemap_site", pages=pages,
                    robots_txt={}, sitemap_urls=[],
                    seed_uri="http://localhost/")
    out = crawl_fixture(spark, fx, _settings(),
                        fetch_robots=True, discover_sitemaps=True)
    by = {r.url: r for r in out.results.collect()}
    assert by["http://localhost/from-text-sitemap.html"].status == "Crawled"


def test_parse_gzip_sitemap():
    """sitemap.xml.gz bodies (gzip magic bytes) are inflated before
    XML/text dispatch (SitemapTools parity, VERDICT r3 item 4)."""
    import gzip

    s = parse_sitemap_xml(gzip.compress(URLSET.encode()))
    assert s.urls == ["http://localhost/index.html", "http://localhost/a.html",
                      "http://localhost/b.html"]
    # gzipped text sitemaps too
    s = parse_sitemap_xml(gzip.compress(b"http://localhost/t1.html\n"))
    assert s.urls == ["http://localhost/t1.html"]
    # truncated gzip → empty, not an exception
    blob = gzip.compress(URLSET.encode())[:10]
    assert parse_sitemap_xml(blob).urls == []


def test_gzip_sitemap_discovery_e2e(spark):
    """robots points at a .xml.gz sitemap; discovery inflates it and the
    entry URL seeds the crawl (Crawler.cs:56 / SitemapTools parity)."""
    import gzip

    pages = [
        _page("http://localhost/robots.txt", content_type="text/plain"),
        _page("http://localhost/sitemap.xml.gz",
              content_type="application/gzip"),
        _page("http://localhost/", content_type="text/html"),
        _page("http://localhost/from-gz-sitemap.html",
              content_type="text/html"),
    ]
    bodies = {
        "http://localhost/robots.txt":
            b"User-agent: *\nSitemap: http://localhost/sitemap.xml.gz\n",
        "http://localhost/sitemap.xml.gz": gzip.compress(
            b"<urlset><url><loc>http://localhost/from-gz-sitemap.html"
            b"</loc></url></urlset>"),
        "http://localhost/": b"<html><body>root</body></html>",
        "http://localhost/from-gz-sitemap.html": b"<html></html>",
    }
    for p in pages:
        p["body"] = bodies[p["url"]]
        p["links"] = None
    fx = WebFixture(name="gz_sitemap_site", pages=pages,
                    robots_txt={}, sitemap_urls=[],
                    seed_uri="http://localhost/")
    out = crawl_fixture(spark, fx, _settings(),
                        fetch_robots=True, discover_sitemaps=True)
    by = {r.url: r for r in out.results.collect()}
    assert by["http://localhost/from-gz-sitemap.html"].status == "Crawled"


def test_bytes_mode_discovery_crawl_matches_structured_golden(spark):
    out = crawl_fixture(spark, _bytes_fixture(), _settings(),
                        fetch_robots=True, discover_sitemaps=True)
    g = golden.crawl(_structured_fixture(), _settings())
    got = {(r.url, r.status, r.n_attempts) for r in out.results.collect()}
    want = {(r.url, r.status, r.n_attempts) for r in g.results}
    assert got == want
    assert {r.url for r in out.seen.collect()} == g.seen
    assert out.enqueue_log == g.enqueue_order
    by = {r.url: r for r in out.results.collect()}
    # sitemap-discovered page was crawled (DiscoverIndexPageFromSitemap)
    assert by["http://localhost/index.html"].status == "Crawled"
    # robots.txt fetched from the table gated /blocked
    assert by["http://localhost/blocked/secret.html"].status == "RobotsBlocked"
    # <base href> + nofollow honored from raw HTML
    assert by["http://localhost/base/page1.html"].status == "Crawled"
    assert "http://localhost/base/nofollowed.html" not in by
