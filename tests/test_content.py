"""Content-processor parity — every golden assertion of
DefaultContentProcessorTests.cs, twice:
(a) through the Spark parse operator on the structured content_site
    fixture, and
(b) through the stdlib HTML extractor on equivalent raw markup (the
    reference parses HTML; our engine must too when pages carry bytes).
"""

import pytest
from pyspark.sql import functions as F

from infinitycrawler_spark import schemas
from infinitycrawler_spark.functions.html import extract_html
from infinitycrawler_spark.functions.urls import resolve_href
from infinitycrawler_spark.operators.parse import parse_round
from infinitycrawler_spark.settings import CrawlSettings
from infinitycrawler_spark.sources.web import pages_df
from infinitycrawler_spark.synth.fixtures import content_site


@pytest.fixture(scope="module")
def parsed(spark):
    fx = content_site()
    pages = pages_df(spark, fx)
    attempts = pages.select(
        "url", "host",
        F.monotonically_increasing_id().alias("enqueue_seq"),
        F.lit(0).alias("depth"),
        F.col("status_code"),
        F.lit(None).cast("string").alias("redirect_to"),
        F.lit(None).cast("string").alias("error"),
        F.lit(0.0).alias("start_delay_ms"),
        F.lit(0.0).alias("request_start_ms"),
        F.lit(0.0).alias("elapsed_ms"))
    out = parse_round(attempts, pages, CrawlSettings())
    return {r.url.rsplit("/", 1)[-1]: r for r in out.collect()}


def test_crawl_link_content_six_links(parsed):
    # MissingHrefLinksAreIgnored / InvalidHrefLinksAreIgnored (:36-49)
    links = parsed["CrawlLinkContent.html"].links
    assert len(links) == 6
    texts = [l.text for l in links]
    assert "No Href" not in texts
    assert "Invalid Href" not in texts


def test_title_and_rel_attributes(parsed):
    links = {l.text: l for l in parsed["CrawlLinkContent.html"].links}
    assert links["Title Attribute"].title == "Title Attribute"  # :52-58
    assert links["Relative File"].title is None
    assert links["Rel No Follow"].rel == "nofollow"             # :61-67
    assert links["Relative File"].rel is None


def test_meta_robots_parsed(parsed):
    # MetaRobotsParsed (:70-87) → can_index/can_follow evaluation
    assert parsed["MetaNoFollow.html"].can_follow is False
    assert parsed["MetaNoFollow.html"].can_index is True
    assert parsed["MetaNoIndex.html"].can_index is False
    assert parsed["MetaNoIndex.html"].can_follow is True
    assert parsed["MetaNoIndexNoFollow.html"].can_index is False
    assert parsed["MetaNoIndexNoFollow.html"].can_follow is False
    assert parsed["MetaNone.html"].can_index is False
    assert parsed["MetaNone.html"].can_follow is False
    assert parsed["CrawlLinkContent.html"].can_index is True    # NoMetaParsed


def test_header_robots_parsed(parsed):
    # HeaderRobotsParsed (:89-96): X-Robots-Tag header rules
    assert parsed["header-page-noindex"].can_index is False
    # bot-scoped rules don't apply to our UA
    assert parsed["header-bot-specific"].can_index is True
    assert parsed["header-bot-specific"].can_follow is True


def test_canonical_uri_parsing(parsed):
    # CanonicalUriParsing (:99-109)
    assert parsed["NoCanonicalUri.html"].canonical is None
    assert (parsed["RelativeCanonicalUri.html"].canonical
            == "http://localhost/RelativeCanonicalUri.html")
    assert (parsed["AbsoluteCanonicalUri.html"].canonical
            == "http://localhost/AbsoluteCanonicalUri.html")


def test_base_href_links_golden(parsed):
    # BaseHrefLinks (:111-122) — the six golden URIs verbatim
    locations = [l.location for l in parsed["BaseHrefCrawlLink.html"].links]
    assert locations == [
        "http://test-domain.com/",
        "http://localhost/base/#RelativeFragment",
        "http://localhost/base/relative/RelativeFile.html",
        "http://localhost/base/relative/RelativeFile.html#Fragment",
        "http://localhost/RelativeBaseFile.html",
        "http://localhost/absolute/AbsoluteBaseFile.html",
    ]


# ------------------------------------------------------------- raw HTML

CRAWL_LINK_HTML = """<!DOCTYPE html>
<html lang="en"><head><meta charset="utf-8"><title>Crawl Link Content</title></head>
<body>
  <a>No Href</a>
  <a href="http;\\\\localhost\\">Invalid Href</a>
  <a href="#RelativeFragment">Relative Fragment</a>
  <a href="RelativeFile.html">Relative File</a>
  <a href="RelativeFile.html#Fragment">Same Relative File with Fragment</a>
  <a href="DifferentRelativeFile.html#Fragment">Different Relative File with Fragment</a>
  <a href="TitleAttr.html" title="Title Attribute">Title Attribute</a>
  <a href="RelNoFollow.html" title="Rel No Follow" rel="nofollow">Rel No Follow</a>
</body></html>"""

BASE_HREF_HTML = """<!DOCTYPE html>
<html lang="en"><head><meta charset="utf-8"><title>Base Href Crawl Link</title>
<base href="http://localhost/base/">
</head><body>
  <a href="http://test-domain.com/">External Href</a>
  <a href="#RelativeFragment">Relative Fragment</a>
  <a href="relative/RelativeFile.html">Relative File</a>
  <a href="relative/RelativeFile.html#Fragment">Relative File with Fragment</a>
  <a href="/RelativeBaseFile.html">Relative Base File</a>
  <a href="http://localhost/absolute/AbsoluteBaseFile.html">Absolute File</a>
</body></html>"""


def test_html_extractor_crawl_link_content():
    page_url = "http://localhost/CrawlLinkContent.html"
    c = extract_html(CRAWL_LINK_HTML)
    assert c.robots_meta is None
    # no-href anchor dropped at extraction; invalid href dropped at resolve
    assert len(c.links) == 7
    resolved = [(l, resolve_href(page_url, l["href"])) for l in c.links]
    valid = [l for l, loc in resolved if loc is not None]
    assert len(valid) == 6
    by_text = {l["text"]: l for l in valid}
    assert by_text["Title Attribute"]["title"] == "Title Attribute"
    assert by_text["Rel No Follow"]["rel"] == "nofollow"


def test_html_extractor_base_href_golden():
    page_url = "http://localhost/BaseHrefCrawlLink.html"
    c = extract_html(BASE_HREF_HTML)
    assert c.base_href == "http://localhost/base/"
    locations = [resolve_href(page_url, l["href"], c.base_href) for l in c.links]
    assert locations == [
        "http://test-domain.com/",
        "http://localhost/base/#RelativeFragment",
        "http://localhost/base/relative/RelativeFile.html",
        "http://localhost/base/relative/RelativeFile.html#Fragment",
        "http://localhost/RelativeBaseFile.html",
        "http://localhost/absolute/AbsoluteBaseFile.html",
    ]


def test_html_extractor_meta_and_canonical():
    html = ('<html><head><meta name="robots" content="noindex, nofollow">'
            '<link rel="canonical" href="Canon.html"></head>'
            '<body><a href="x.html">X</a></body></html>')
    c = extract_html(html)
    assert c.robots_meta == "noindex, nofollow"
    assert c.canonical_href == "Canon.html"
    assert len(c.links) == 1


def test_html_extractor_handles_bytes_and_garbage():
    c = extract_html(b"<html><body><a href='/a'>A</a>")
    assert c.links[0]["href"] == "/a"
    c2 = extract_html("%%% not html at all <<<>")
    assert c2.links == []
