"""URL resolution parity with UriExtensions.cs:9-33 and the golden URIs
of DefaultContentProcessorTests.cs:111-122."""

from infinitycrawler_spark.functions.urls import (
    canonicalize,
    host_of,
    is_well_formed_href,
    resolve_href,
    scheme_of,
    strip_fragment,
)

PAGE = "http://localhost/BaseHrefCrawlLink.html"
BASE = "http://localhost/base/"


def test_base_href_golden_links():
    # DefaultContentProcessorTests.cs:111-122, verbatim expectations
    cases = [
        ("http://test-domain.com/", "http://test-domain.com/"),
        ("#RelativeFragment", "http://localhost/base/#RelativeFragment"),
        ("relative/RelativeFile.html", "http://localhost/base/relative/RelativeFile.html"),
        ("relative/RelativeFile.html#Fragment",
         "http://localhost/base/relative/RelativeFile.html#Fragment"),
        ("/RelativeBaseFile.html", "http://localhost/RelativeBaseFile.html"),
        ("http://localhost/absolute/AbsoluteBaseFile.html",
         "http://localhost/absolute/AbsoluteBaseFile.html"),
    ]
    for href, expected in cases:
        assert resolve_href(PAGE, href, BASE) == expected


def test_invalid_href_is_none():
    # CrawlLinkContent.html "Invalid Href" case
    assert resolve_href("http://localhost/x.html", "http;\\\\localhost\\") is None
    assert resolve_href("http://localhost/x.html", None) is None


def test_relative_without_base():
    assert (resolve_href("http://localhost/a/b.html", "c.html")
            == "http://localhost/a/c.html")
    assert (resolve_href("http://localhost/a/b.html", "RelativeFile.html#Fragment")
            == "http://localhost/a/RelativeFile.html#Fragment")


def test_fragment_only_resolves_to_page():
    assert (resolve_href("http://localhost/x.html", "#frag")
            == "http://localhost/x.html#frag")


def test_strip_fragment():
    assert strip_fragment("http://a/b#c") == "http://a/b"
    assert strip_fragment("http://a/b") == "http://a/b"


def test_canonicalize():
    assert canonicalize("HTTP://LocalHost:80/Index.html?A=b#frag") == \
        "http://localhost/Index.html?A=b"
    assert canonicalize("https://h:443/") == "https://h/"
    assert canonicalize("https://h:8443/") == "https://h:8443/"
    assert canonicalize("http://host") == "http://host/"
    assert canonicalize("not a url") is None
    assert canonicalize(None) is None


def test_scheme_and_host():
    assert scheme_of("mailto:test@localhost") == "mailto"
    assert scheme_of("http://x/") == "http"
    assert host_of("http://ExAmple.com:8080/p") == "example.com"
    assert not is_well_formed_href("a b.html")
