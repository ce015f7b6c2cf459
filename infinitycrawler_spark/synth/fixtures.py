"""Synthetic web fixtures — the reference's test sites as data.

The reference tests crawl an in-process fake web server
(/root/reference/tests/InfinityCrawler.Tests.TestSite/). Here the
"network" is a table: one row per fetchable URL, carrying response
metadata, authored (unresolved) anchors, and the image+caption payload
required by BASELINE.json input_hint. A fetch is a join against this
table; a URL absent from the table behaves like a transport error
(connection refused), matching the EmptySite tests.

Fixtures (FIXTURES.md §5):
- basic_site       ← Resources/BasicSite + HelperController endpoints
- content_site     ← Resources/DefaultContentProcessor single-feature pages
- request_site     ← ThrottlingTest delay endpoints
- empty_site       ← EmptySite (every fetch is a transport error)
- scale_site(...)  ← parameterized Zipf-skewed corpus for benchmarks
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from infinitycrawler_spark.functions.hashing import rng_for, stable_hash64
from infinitycrawler_spark.functions.images import make_payload
from infinitycrawler_spark.functions.urls import host_of


@dataclass
class WebFixture:
    name: str
    pages: list[dict]
    robots_txt: dict[str, str] = field(default_factory=dict)
    sitemap_urls: list[str] = field(default_factory=list)
    seed_uri: str = "http://localhost/"
    host_aliases: list[str] | None = None

    def page_map(self) -> dict[str, dict]:
        return {p["url"]: p for p in self.pages}


def _link(href: str, text: str | None = None, title: str | None = None,
          rel: str | None = None) -> dict:
    return {"href": href, "text": text, "title": title, "rel": rel}


def _page(url: str, status_code: int = 200, links: list[dict] | None = None,
          redirect_to: str | None = None, delay_ms: int = 0,
          content_type: str = "text/html", charset: str | None = "utf-8",
          content_encoding: str | None = None,
          x_robots_tag: list[str] | None = None, robots_meta: str | None = None,
          base_href: str | None = None, canonical_href: str | None = None,
          img_w: int = 16, img_h: int = 12, fmt: str | None = None) -> dict:
    host = host_of(url) or "localhost"
    path = url.split(host, 1)[1] if host in url else url
    if fmt is None:
        fmt = "rgb8-q" if stable_hash64("fmt", url) % 2 else "rgb8-raw"
    row = {
        "url": url,
        "host": host,
        "status_code": status_code,
        "redirect_to": redirect_to,
        "delay_ms": delay_ms,
        "content_type": content_type,
        "charset": charset,
        "content_encoding": content_encoding,
        "x_robots_tag": x_robots_tag or [],
        "robots_meta": robots_meta,
        "base_href": base_href,
        "canonical_href": canonical_href,
        "links": links or [],
    }
    row.update(make_payload(url, host, path, img_w, img_h, fmt))
    return row


def basic_site() -> WebFixture:
    """Mirrors Resources/BasicSite/index.html's 16 anchors + the dynamic
    /status, /redirect endpoints (HelperController.cs:22-53) and the
    robots.txt disallow of /robots-blocked.html."""
    index_links = [
        _link("basic-page.html", "Basic HTML Page"),
        _link("robots-blocked.html", "Robots Blocked Page"),
        _link("looping-links.html", "Looping Links Page"),
        _link("index.html?v=query-strings-are-separate-uris", "Index Page with Query String"),
        _link("status/500", "500 Error Page"),
        _link("status/404", "404 Error Page"),
        _link("status/403", "403 Error Page"),
        _link("status/401", "401 Error Page"),
        _link("status/305", "305 Error Page"),
        _link("index.html#fragment-in-uri", "Fragment Link"),
        _link("http://not-allowed-domain.com/", "Not-allowed External Site"),
        _link("http://test-domain.com/", "Allowed Domain"),
        _link("redirect/2/two-redirects", "Two Redirects"),
        _link("redirect/5/five-redirects", "Five Redirects"),
        _link("index.html?v=rel-no-follow", "Rel NoFollow Link", rel="nofollow"),
        _link("mailto:test@localhost", "Alternative URL scheme"),
    ]
    pages = [
        # the static server resolves both "/" and "/index.html" to index
        _page("http://localhost/", links=index_links),
        _page("http://localhost/index.html", links=index_links),
        _page("http://localhost/index.html?v=query-strings-are-separate-uris",
              links=index_links),
        _page("http://localhost/basic-page.html"),
        _page("http://localhost/robots-blocked.html",
              links=[_link("robots-blocked-child.html", "Child Page")]),
        _page("http://localhost/robots-blocked-child.html"),
        _page("http://localhost/looping-links.html",
              links=[_link("index.html", "Index Page"),
                     _link("malformed.html", "Malformed HTML Page")]),
        _page("http://localhost/malformed.html", status_code=404),
        _page("http://localhost/status/500", status_code=500),
        _page("http://localhost/status/404", status_code=404),
        _page("http://localhost/status/403", status_code=403),
        _page("http://localhost/status/401", status_code=401),
        _page("http://localhost/status/305", status_code=305,
              redirect_to="/use-proxy"),
        _page("http://localhost/redirect/2/two-redirects", status_code=302,
              redirect_to="/redirect/1/two-redirects"),
        _page("http://localhost/redirect/1/two-redirects", status_code=302,
              redirect_to="/redirect/0/two-redirects"),
        _page("http://localhost/redirect/0/two-redirects"),
        _page("http://localhost/redirect/5/five-redirects", status_code=302,
              redirect_to="/redirect/4/five-redirects"),
        _page("http://localhost/redirect/4/five-redirects", status_code=302,
              redirect_to="/redirect/3/five-redirects"),
        _page("http://localhost/redirect/3/five-redirects", status_code=302,
              redirect_to="/redirect/2/five-redirects"),
        _page("http://localhost/redirect/2/five-redirects", status_code=302,
              redirect_to="/redirect/1/five-redirects"),
        _page("http://localhost/redirect/1/five-redirects", status_code=302,
              redirect_to="/redirect/0/five-redirects"),
        _page("http://localhost/redirect/0/five-redirects"),
        # TestHttpMessageHandler.cs:23-47 fakes the allowed external host
        _page("http://test-domain.com/"),
        _page("http://not-allowed-domain.com/"),
    ]
    return WebFixture(
        name="basic_site",
        pages=pages,
        robots_txt={"localhost": "User-agent: *\nDisallow: /robots-blocked.html\n"},
        sitemap_urls=["http://localhost/index.html"],
        seed_uri="http://localhost/",
    )


def content_site() -> WebFixture:
    """Mirrors Resources/DefaultContentProcessor single-feature pages;
    golden URIs at DefaultContentProcessorTests.cs:99-122."""
    pages = [
        _page("http://localhost/CrawlLinkContent.html", links=[
            _link(None, "No Href"),
            _link("http;\\\\localhost\\", "Invalid Href"),
            _link("#RelativeFragment", "Relative Fragment"),
            _link("RelativeFile.html", "Relative File"),
            _link("RelativeFile.html#Fragment", "Same Relative File with Fragment"),
            _link("DifferentRelativeFile.html#Fragment", "Different Relative File with Fragment"),
            _link("TitleAttr.html", "Title Attribute", title="Title Attribute"),
            _link("RelNoFollow.html", "Rel No Follow", title="Rel No Follow", rel="nofollow"),
        ]),
        _page("http://localhost/BaseHrefCrawlLink.html",
              base_href="http://localhost/base/", links=[
                  _link("http://test-domain.com/", "External Href"),
                  _link("#RelativeFragment", "Relative Fragment"),
                  _link("relative/RelativeFile.html", "Relative File"),
                  _link("relative/RelativeFile.html#Fragment", "Relative File with Fragment"),
                  _link("/RelativeBaseFile.html", "Relative Base File"),
                  _link("http://localhost/absolute/AbsoluteBaseFile.html", "Absolute File"),
              ]),
        _page("http://localhost/NoCanonicalUri.html"),
        _page("http://localhost/RelativeCanonicalUri.html",
              canonical_href="RelativeCanonicalUri.html"),
        _page("http://localhost/AbsoluteCanonicalUri.html",
              canonical_href="http://localhost/AbsoluteCanonicalUri.html"),
        _page("http://localhost/MetaNoFollow.html", robots_meta="nofollow"),
        _page("http://localhost/MetaNoIndex.html", robots_meta="noindex"),
        _page("http://localhost/MetaNoIndexNoFollow.html", robots_meta="noindex, nofollow"),
        _page("http://localhost/MetaNone.html", robots_meta="none"),
        _page("http://localhost/robots/header-page-noindex",
              x_robots_tag=["noindex"]),
        _page("http://localhost/robots/header-bot-specific",
              x_robots_tag=["onebot: noindex", "twobot: nofollow"]),
    ]
    return WebFixture(name="content_site", pages=pages)


def request_site() -> WebFixture:
    """ThrottlingTest endpoints (DefaultRequestProcessorTests.cs:35-43)."""
    pages = [_page("http://localhost/delay/50/warmup", delay_ms=50,
                   content_type="text/plain")]
    for spec in ["50/50ms-delay-1", "50/50ms-delay-2", "300/300ms-delay-1",
                 "300/300ms-delay-2", "50/50ms-delay-3", "50/50ms-delay-4",
                 "50/50ms-delay-5", "50/50ms-delay-6", "50/50ms-delay-7",
                 "300/300ms-delay-3", "300/300ms-delay-4",
                 "500/500ms-delay-1", "500/500ms-delay-2",
                 "500/500ms-delay-3", "500/500ms-delay-4"]:
        delay = int(spec.split("/")[0])
        pages.append(_page(f"http://localhost/delay/{spec}", delay_ms=delay,
                           content_type="text/plain"))
    return WebFixture(name="request_site", pages=pages)


def empty_site() -> WebFixture:
    """No fetchable pages — every request is a transport error, driving
    the MaxRetries path (BasicSiteTests.cs:166-199)."""
    return WebFixture(name="empty_site", pages=[])


def scale_site(n_hosts: int = 100, pages_per_host: int = 100,
               skew: float = 1.2, links_per_page: int = 8,
               seed: int = 42, with_payload: bool = True,
               img_w: int = 8, img_h: int = 8) -> WebFixture:
    """Parameterized synthetic web for benchmarks: host sizes follow a
    Zipf(skew) distribution (exercises salting/AQE), links connect pages
    within a host plus occasional cross-host edges. Deterministic in
    ``seed``. With ``with_payload=False`` the image columns are tiny
    placeholders (for frontier-only scale tests that must never read
    ``bytes`` anyway)."""
    rng = rng_for("scale_site", seed, n_hosts, pages_per_host, skew)
    weights = (1.0 / np.arange(1, n_hosts + 1) ** skew)
    weights /= weights.sum()
    counts = np.maximum(1, (weights * n_hosts * pages_per_host).astype(int))
    pages: list[dict] = []
    for hi in range(n_hosts):
        host = f"site{hi:04d}.example"
        n = int(counts[hi])
        for pi in range(n):
            url = f"http://{host}/page/{pi}"
            out = []
            for _ in range(links_per_page):
                if rng.random() < 0.92 or n_hosts == 1:
                    target = int(rng.integers(0, n))
                    out.append(_link(f"/page/{target}"))
                else:
                    th = int(rng.integers(0, n_hosts))
                    tp = int(rng.integers(0, int(counts[th])))
                    out.append(_link(f"http://site{th:04d}.example/page/{tp}"))
            status = 200
            r = rng.random()
            redirect_to = None
            if r < 0.02:
                status, redirect_to = 302, f"/page/{int(rng.integers(0, n))}"
            elif r < 0.04:
                status = 500 if r < 0.03 else 404
            if with_payload:
                page = _page(url, status_code=status, redirect_to=redirect_to,
                             links=out, img_w=img_w, img_h=img_h)
            else:
                page = _page(url, status_code=status, redirect_to=redirect_to,
                             links=out, img_w=2, img_h=2)
            pages.append(page)
    hosts = sorted({p["host"] for p in pages})
    return WebFixture(
        name="scale_site",
        pages=pages,
        robots_txt={h: "User-agent: *\nDisallow: /private/\n" for h in hosts},
        sitemap_urls=[f"http://{hosts[0]}/page/0"],
        seed_uri=f"http://{hosts[0]}/",
        host_aliases=hosts,  # whole synthetic web is in scope
    )
