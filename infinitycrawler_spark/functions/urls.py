"""URL canonicalization and href resolution.

Semantics follow the reference's .NET ``Uri`` behavior where tests pin it:

- fragment stripping before dedup/enqueue
  (/root/reference/src/InfinityCrawler/Internal/CrawlRunner.cs:45-51)
- href resolution with optional ``<base href>`` override and fragment
  re-attachment; malformed hrefs → null
  (/root/reference/src/InfinityCrawler/Internal/UriExtensions.cs:9-33)
- non-http(s) schemes dropped at link extraction
  (/root/reference/src/InfinityCrawler/Processing/Content/DefaultContentProcessor.cs:101-105)

Everything is exposed twice: a pure-Python scalar (for the golden
interpreter and unit tests) and a pandas-vectorized variant used inside
Arrow UDFs (never per-row Python on the Spark hot path).
"""

from __future__ import annotations

import re
from urllib.parse import urljoin, urlsplit, urlunsplit

import pandas as pd

_DEFAULT_PORTS = {"http": 80, "https": 443}
# .NET Uri.IsWellFormedUriString rejects these outright in hrefs.
_ILLFORMED = re.compile(r'[\\<>"\s{}|^`]')
_SCHEME_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*:")
# hrefs that are PROVABLY their own normalized form: lowercase scheme +
# lowercase host (no port/userinfo), absolute path, optional query, no
# fragment, none of the ill-formed characters. For these,
# resolve_href's parse+join+re-normalize is an identity — and crawl
# link batches are overwhelmingly this shape, so the fast path removes
# two urlsplits and a urljoin from the hottest per-link loop.
_CANONICAL_ABS = re.compile(
    r'^https?://[a-z0-9]([a-z0-9.-]*[a-z0-9])?'   # host: no port/userinfo
    r'/[^\\<>"\s{}|^`#?]*'                        # absolute path
    r'(\?[^\\<>"\s{}|^`#]+)?$')  # optional NON-EMPTY query (a bare
                                 # trailing '?' is dropped by urlunsplit)


def canonicalize(url: str | None) -> str | None:
    """RFC 3986-style canonical form: lowercase scheme/host, drop the
    fragment, drop default ports, empty path → '/'. Returns None for
    unusable input."""
    if not url:
        return None
    try:
        parts = urlsplit(url.strip())
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if not scheme or not parts.hostname:
        return None
    host = parts.hostname.lower()
    try:
        port = parts.port
    except ValueError:
        return None
    netloc = host
    if port is not None and port != _DEFAULT_PORTS.get(scheme):
        netloc = f"{host}:{port}"
    path = parts.path or "/"
    return urlunsplit((scheme, netloc, path, parts.query, ""))


def strip_fragment(url: str) -> str:
    """CrawlRunner.cs:45-51 — remove #fragment, keep everything else."""
    i = url.find("#")
    return url if i < 0 else url[:i]


def host_of(url: str | None) -> str | None:
    if not url:
        return None
    try:
        return (urlsplit(url).hostname or "").lower() or None
    except ValueError:
        return None


def authority_of(url: str | None) -> str | None:
    """.NET ``Uri.GetLeftPart(UriPartial.Authority)``'s host part:
    lowercase host WITH its non-default port (``host_of`` drops the
    port, which must not be used to rebuild the crawl root — e.g. a
    localhost test server on :8080)."""
    if not url:
        return None
    try:
        parts = urlsplit(url)
    except ValueError:
        return None
    host = (parts.hostname or "").lower()
    if not host:
        return None
    try:
        port = parts.port
    except ValueError:
        return None
    if port is not None and port != _DEFAULT_PORTS.get(parts.scheme.lower()):
        return f"{host}:{port}"
    return host


def is_well_formed_href(href: str) -> bool:
    """Approximation of .NET Uri.IsWellFormedUriString(RelativeOrAbsolute)
    for the href alphabet that appears in crawls: rejects whitespace,
    backslashes, and angle-bracket/quote characters."""
    if href is None:
        return False
    if _ILLFORMED.search(href):
        return False
    return True


def normalize_http_uri(url: str | None) -> str | None:
    """Mirror .NET ``Uri`` normalization on an absolute http(s) URI:
    lowercase scheme and host, drop the default port, empty path → '/',
    KEEP query and fragment (unlike ``canonicalize``). Non-http(s)
    schemes pass through unchanged (they are dropped later at the
    scheme filter, DefaultContentProcessor.cs:101-105)."""
    if not url:
        return None
    try:
        parts = urlsplit(url)
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if scheme not in ("http", "https"):
        return url
    host = (parts.hostname or "").lower()
    if not host:
        return None
    try:
        port = parts.port
    except ValueError:
        return None
    netloc = host
    if port is not None and port != _DEFAULT_PORTS.get(scheme):
        netloc = f"{host}:{port}"
    if parts.username:
        userinfo = parts.username
        if parts.password:
            userinfo += f":{parts.password}"
        netloc = f"{userinfo}@{netloc}"
    path = parts.path or "/"
    return urlunsplit((scheme, netloc, path, parts.query, parts.fragment))


def resolve_href(page_url: str, href: str | None, base_href: str | None = None) -> str | None:
    """UriExtensions.cs:9-33 — split fragment, validate, resolve against
    <base href> (itself resolved against the page) then the page URL,
    re-attach the fragment; the result is .NET-Uri-normalized (lowercase
    host, default port dropped) so it joins/dedups against canonical
    URLs. None for malformed input."""
    if href is None:
        return None
    if "#" not in href and _CANONICAL_ABS.match(href):
        return href  # provably equals its own normalized resolution
    pieces = href.split("#", 1)
    href_no_frag = pieces[0]
    fragment = pieces[1] if len(pieces) > 1 else None
    if not is_well_formed_href(href_no_frag):
        return None
    base = page_url
    if base_href and is_well_formed_href(base_href):
        try:
            base = urljoin(page_url, base_href)
        except ValueError:
            base = page_url
    try:
        resolved = urljoin(base, href_no_frag)
    except ValueError:
        return None
    if not _SCHEME_RE.match(resolved):
        return None
    if fragment is not None:
        resolved = strip_fragment(resolved) + "#" + fragment
    return normalize_http_uri(resolved)


def path_and_query(url: str | None) -> str:
    """.NET ``Uri.PathAndQuery`` — the robots rules match against this
    (never against a string-split of the URL, which breaks on ports and
    host-case mismatches)."""
    if not url:
        return "/"
    try:
        parts = urlsplit(url)
    except ValueError:
        return "/"
    path = parts.path or "/"
    if parts.query:
        path += "?" + parts.query
    return path


def scheme_of(url: str | None) -> str | None:
    if not url:
        return None
    m = _SCHEME_RE.match(url)
    return m.group(0)[:-1].lower() if m else None


# ---------------------------------------------------------------- vectorized

def canonicalize_series(urls: pd.Series) -> pd.Series:
    return urls.map(lambda u: canonicalize(u) if isinstance(u, str) else None)


def resolve_href_series(
    page_urls: pd.Series, hrefs: pd.Series, base_hrefs: pd.Series
) -> pd.Series:
    out = [
        resolve_href(p, h, b) if isinstance(h, str) and isinstance(p, str) else None
        for p, h, b in zip(page_urls, hrefs, base_hrefs)
    ]
    return pd.Series(out, index=hrefs.index, dtype="object")
