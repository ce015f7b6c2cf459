"""HTML content extraction — stdlib html.parser re-creation of the
reference's HtmlAgilityPack usage
(/root/reference/src/InfinityCrawler/Processing/Content/DefaultContentProcessor.cs:15-117):

- <base href> from html/head/base (:54-58)
- canonical from html/head/link[rel=canonical] (:60-77)
- meta robots from html/head/meta[name=robots]/@content (:34-45),
  first match only (.FirstOrDefault)
- anchors //a anywhere: (href, title, text, rel); missing href skipped
  (:89-92) — resolution/validity/scheme filtering happens downstream in
  the parse operator, exactly like the reference's pipeline.

Used when a page's content arrives as raw HTML bytes instead of the
structured fixture columns; exposed as a vectorized batch function for
the Arrow parse pass.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from html.parser import HTMLParser


@dataclass
class HtmlContent:
    base_href: str | None = None
    canonical_href: str | None = None
    robots_meta: str | None = None
    links: list[dict] = field(default_factory=list)
    title: str | None = None


class _Extractor(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.out = HtmlContent()
        self._in_head = False
        self._in_title = False
        self._anchor: dict | None = None
        self._anchor_text: list[str] = []

    def handle_starttag(self, tag, attrs):
        a = dict(attrs)
        if tag == "head":
            self._in_head = True
        elif tag == "title":
            self._in_title = True
        elif tag == "base" and self._in_head and self.out.base_href is None:
            self.out.base_href = a.get("href") or None
        elif tag == "link" and self._in_head:
            rel = (a.get("rel") or "").lower()
            if rel == "canonical" and self.out.canonical_href is None:
                self.out.canonical_href = a.get("href")
        elif tag == "meta" and self._in_head:
            if (a.get("name") or "").lower() == "robots" and self.out.robots_meta is None:
                if "content" in a:
                    self.out.robots_meta = a["content"]
        elif tag == "a":
            # flush an unclosed previous anchor, matching lenient parsers
            if self._anchor is not None:
                self._flush_anchor()
            self._anchor = {
                "href": a.get("href"),
                "title": a.get("title"),
                "rel": a.get("rel"),
            }
            self._anchor_text = []

    def handle_endtag(self, tag):
        if tag == "head":
            self._in_head = False
        elif tag == "title":
            self._in_title = False
        elif tag == "a" and self._anchor is not None:
            self._flush_anchor()

    def handle_data(self, data):
        if self._anchor is not None:
            self._anchor_text.append(data)
        elif self._in_title:
            self.out.title = (self.out.title or "") + data

    def _flush_anchor(self):
        anchor = self._anchor
        self._anchor = None
        if anchor is None or anchor["href"] is None:
            return  # DefaultContentProcessor.cs:89-92 — no href → skipped
        text = "".join(self._anchor_text)
        self.out.links.append({
            "href": anchor["href"],
            "text": text or None,
            "title": anchor["title"],
            "rel": anchor["rel"],
        })

    def close(self):
        if self._anchor is not None:
            self._flush_anchor()
        super().close()


def extract_html(html: str | bytes, charset: str = "utf-8") -> HtmlContent:
    if isinstance(html, (bytes, bytearray)):
        html = html.decode(charset or "utf-8", errors="replace")
    parser = _Extractor()
    parser.feed(html)
    parser.close()
    return parser.out
