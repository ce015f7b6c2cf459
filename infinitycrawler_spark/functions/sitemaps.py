"""Sitemap parsing + discovery — observable semantics of
TurnerSoftware.SitemapTools as the reference uses it
(/root/reference/src/InfinityCrawler/Crawler.cs:56-62:
``SitemapQuery.GetAllSitemapsForDomainAsync(host)`` then
``SelectMany(s => s.Urls.Select(u => u.Location).Distinct())``):

- known locations for a host: every ``Sitemap:`` directive in its
  robots.txt (file order) plus the ``/sitemap.xml`` default;
- each sitemap file is XML: ``<urlset>`` (entry locations) or
  ``<sitemapindex>`` (child sitemap locations, followed breadth-first,
  each file visited once);
- entry URLs are de-duplicated within one sitemap, preserving document
  order (the reference's per-sitemap ``.Distinct()``).

Parsing is pure Python (stdlib ElementTree) — it runs on at most a
handful of rows per crawl (robots.txt + sitemap files), never per-URL,
so it stays driver-side by design; the discovered URLs feed the
distributed seed path.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable
from xml.etree import ElementTree


@dataclass
class SitemapFile:
    """One parsed sitemap document."""

    urls: list[str] = field(default_factory=list)        # <urlset> entries
    sitemaps: list[str] = field(default_factory=list)    # <sitemapindex> children


def _local(tag: str) -> str:
    """Element tag without its XML namespace."""
    return tag.rsplit("}", 1)[-1].lower()


def parse_sitemap_text(text: str) -> SitemapFile:
    """Plain-text sitemap (sitemaps.org txt format; SitemapTools parses
    these alongside XML): one URL per line, blank lines ignored, lines
    that are not absolute http(s) URLs skipped, de-duplicated in file
    order like the XML path."""
    out = SitemapFile()
    seen: set[str] = set()
    for raw in text.splitlines():
        line = raw.strip()
        if not line or not line.lower().startswith(("http://", "https://")):
            continue
        if line in seen:
            continue
        seen.add(line)
        out.urls.append(line)
    return out


def parse_sitemap_xml(text: str | bytes) -> SitemapFile:
    """Parse a sitemap or sitemap-index document. Tolerant of any (or
    no) namespace; gzip-compressed bodies (``sitemap.xml.gz`` — the
    sitemaps.org format SitemapTools transparently decompresses) are
    detected by magic bytes and inflated first; non-XML bodies fall
    back to the plain-text sitemap format (one URL per line — the
    reference's SitemapTools understands both), and anything else →
    empty result (SitemapTools swallows unparseable sitemaps)."""
    if isinstance(text, (bytes, bytearray)) and text[:2] == b"\x1f\x8b":
        import gzip

        try:
            text = gzip.decompress(bytes(text))
        except (OSError, EOFError):
            return SitemapFile()  # truncated/corrupt gzip → empty
    if isinstance(text, (bytes, bytearray)):
        text = text.decode("utf-8", errors="replace")
    out = SitemapFile()
    try:
        root = ElementTree.fromstring(text)
    except ElementTree.ParseError:
        return parse_sitemap_text(text)
    root_kind = _local(root.tag)
    seen: set[str] = set()
    for child in root:
        kind = _local(child.tag)  # <url> or <sitemap>
        loc = None
        for el in child:
            if _local(el.tag) == "loc":
                loc = (el.text or "").strip()
                break
        if not loc or loc in seen:
            continue  # per-sitemap Distinct(), document order preserved
        seen.add(loc)
        if root_kind == "sitemapindex" or kind == "sitemap":
            out.sitemaps.append(loc)
        else:
            out.urls.append(loc)
    return out


def sitemaps_from_robots(robots_text: str) -> list[str]:
    """``Sitemap:`` directives in file order (RFC 9309 §2.2.4 — the
    directive is file-scoped, not group-scoped)."""
    out = []
    for raw in robots_text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if ":" not in line:
            continue
        key, _, value = line.partition(":")
        if key.strip().lower() == "sitemap" and value.strip():
            out.append(value.strip())
    return out


def discover_sitemap_urls(
    lookup: Callable[[str], str | bytes | None],
    host: str,
    scheme: str = "http",
    robots_text: str | None = None,
    max_files: int = 1000,
) -> list[str]:
    """Breadth-first sitemap discovery for one host, mirroring
    ``GetAllSitemapsForDomainAsync``: start from the robots ``Sitemap:``
    directives plus ``{scheme}://{host}/sitemap.xml``, follow sitemap
    indexes, visit each file once, and return every entry location in
    (sitemap order, document order). ``lookup`` resolves a URL to the
    file body (None → not fetchable). ``max_files`` bounds runaway
    index graphs."""
    frontier: list[str] = []
    if robots_text:
        frontier.extend(sitemaps_from_robots(robots_text))
    frontier.append(f"{scheme}://{host}/sitemap.xml")
    visited: set[str] = set()
    urls: list[str] = []
    while frontier and len(visited) < max_files:
        loc = frontier.pop(0)
        if loc in visited:
            continue
        visited.add(loc)
        body = lookup(loc)
        if body is None:
            continue
        parsed = parse_sitemap_xml(body)
        urls.extend(parsed.urls)
        frontier.extend(parsed.sitemaps)
    return urls
