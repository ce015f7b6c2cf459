"""Property-based robustness for URL handling (hypothesis): the
canonicalizer and resolver must never crash on arbitrary input, must be
idempotent, and fragment stripping must commute with resolution."""

from hypothesis import given, settings as hsettings, strategies as st

from infinitycrawler_spark.functions.urls import (
    canonicalize,
    host_of,
    resolve_href,
    strip_fragment,
)

url_chars = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126), max_size=60)
hosts = st.from_regex(r"[a-z][a-z0-9]{0,10}(\.[a-z]{2,5}){1,2}", fullmatch=True)
paths = st.from_regex(r"(/[a-zA-Z0-9._~-]{0,8}){0,4}", fullmatch=True)


@hsettings(max_examples=200, deadline=None)
@given(url_chars)
def test_canonicalize_never_crashes(s):
    out = canonicalize(s)
    assert out is None or isinstance(out, str)


@hsettings(max_examples=200, deadline=None)
@given(hosts, paths, st.text(max_size=30))
def test_canonicalize_idempotent(host, path, query):
    url = f"http://{host}{path}"
    c = canonicalize(url)
    assert c is not None
    assert canonicalize(c) == c


@hsettings(max_examples=200, deadline=None)
@given(hosts, paths, url_chars)
def test_resolve_never_crashes(host, path, href):
    page = f"http://{host}{path or '/'}"
    out = resolve_href(page, href)
    assert out is None or out.split(":", 1)[0].isalpha() or ":" in out


@hsettings(max_examples=200, deadline=None)
@given(hosts, paths)
def test_strip_fragment_idempotent_and_fragmentless(host, path):
    url = f"http://{host}{path}#frag"
    stripped = strip_fragment(url)
    assert "#" not in stripped
    assert strip_fragment(stripped) == stripped


@hsettings(max_examples=100, deadline=None)
@given(hosts, paths, st.from_regex(r"[a-zA-Z0-9._/-]{1,20}", fullmatch=True))
def test_resolved_relative_href_lands_on_same_host(host, path, rel_href):
    page = canonicalize(f"http://{host}{path or '/'}")
    out = resolve_href(page, rel_href)
    assert out is not None
    assert host_of(out) == host


# ---- fast-path soundness: _CANONICAL_ABS hrefs must be fixpoints ----

from hypothesis import given, settings as hsettings
from hypothesis import strategies as st

from infinitycrawler_spark.functions.urls import (
    _CANONICAL_ABS,
    normalize_http_uri,
    resolve_href,
)

_host = st.from_regex(r"[a-z0-9]([a-z0-9.-]{0,20}[a-z0-9])?", fullmatch=True)
_path = st.from_regex(r"/[a-zA-Z0-9._~%!$&'()*+,;=:@/-]{0,30}", fullmatch=True)
_query = st.one_of(st.just(""), st.from_regex(r"\?[a-zA-Z0-9=&_-]{0,20}", fullmatch=True))


@hsettings(max_examples=300, deadline=None)
@given(scheme=st.sampled_from(["http", "https"]), host=_host,
       path=_path, query=_query)
def test_fast_path_is_normalize_fixpoint(scheme, host, path, query):
    """Any href the fast-path regex accepts must equal its own slow-path
    resolution (normalize_http_uri), from any base."""
    href = f"{scheme}://{host}{path}{query}"
    if _CANONICAL_ABS.match(href):
        assert normalize_http_uri(href) == href
        assert resolve_href("http://other.example/page", href) == href


def test_fast_path_rejects_non_canonical():
    # each of these must take the slow path and come out normalized
    assert resolve_href("http://b/", "HTTP://HOST/x") == "http://host/x"
    assert resolve_href("http://b/", "http://host:80/x") == "http://host/x"
    assert resolve_href("http://b/", "http://host:8080/x") == "http://host:8080/x"
    assert resolve_href("http://b/", "http://u:p@host/x") == "http://u:p@host/x"
    assert resolve_href("http://b/", "http://host/x#f") == "http://host/x#f"
    assert resolve_href("http://b/", "http://host") == "http://host/"
