"""Malformed-HTML robustness corpus for functions/html.py (VERDICT r3
item 3), modeled on the reference's golden style
(DefaultContentProcessorTests.cs:36-122): each adversarial document has
a hand-derived expectation — what a lenient browser-grade parser (and
the reference's HtmlAgilityPack pipeline, DefaultContentProcessor.cs:
15-117) should extract — asserted exactly.

Key semantics pinned here:
- anchors flush on a new ``<a>`` start (unclosed/nested anchors can't
  nest, like browsers), and ``close()`` flushes a trailing one;
- href-less anchors are skipped (DefaultContentProcessor.cs:89-92);
- ``<base>``/``<link rel=canonical>``/``<meta name=robots>`` only count
  inside ``<head>`` (the reference's ``html/head/...`` XPaths) and
  first-match wins (.FirstOrDefault);
- entities decode in both attribute values and text;
- ``<script>`` bodies are CDATA — markup inside them is NOT extracted;
- truncated/unterminated markup degrades silently, never raises.
"""

import pytest

from infinitycrawler_spark.functions.html import extract_html


def links(html, **kw):
    return [(l["href"], l["text"], l["rel"])
            for l in extract_html(html, **kw).links]


# ------------------------------------------------------------- anchors

def test_unclosed_anchors_flush_on_next_start():
    assert links("<a href='1.html'>one<a href='2.html'>two") == [
        ("1.html", "one", None), ("2.html", "two", None)]


def test_misnested_inline_tags_keep_anchor_text():
    assert links("<b><a href='x.html'>t</b></a> after") == [
        ("x.html", "t", None)]


def test_nested_anchor_splits_like_browsers():
    # <a> cannot nest: the inner start flushes the outer; trailing "c"
    # belongs to no anchor
    assert links("<a href='1'>a<a href='2'>b</a>c</a>") == [
        ("1", "a", None), ("2", "b", None)]


def test_unquoted_and_whitespace_attributes():
    assert links("<a href=foo.html>u</a>") == [("foo.html", "u", None)]
    assert links("<a\n\thref = 'w.html'\n>w</a>") == [("w.html", "w", None)]


def test_mixed_case_tags_and_attributes():
    # tag/attr names case-fold; attribute VALUES keep their case
    assert links("<A HREF='X.html' REL='NOFOLLOW'>U</A>") == [
        ("X.html", "U", "NOFOLLOW")]


def test_href_less_and_valueless_anchors_skipped():
    # DefaultContentProcessor.cs:89-92 — no href → skipped; a boolean
    # `href` attribute carries no target either
    assert links("<a name='x'>t</a>") == []
    assert links("<a href>v</a>") == []


def test_entities_decode_in_href_and_text():
    assert links("<a href='a.html?x=1&amp;y=2'>e</a>") == [
        ("a.html?x=1&y=2", "e", None)]
    assert links("<a href='t.html'>&lt;b&gt; &amp; x</a>") == [
        ("t.html", "<b> & x", None)]


def test_unterminated_quote_swallows_silently():
    # the open quote eats the rest of the document — lenient parsers
    # drop the fragment rather than raise; nothing phantom is emitted
    assert links('<a href="x.html>y</a><p>z</p>') == []


def test_truncated_document_flushes_open_anchor():
    # EOF mid-tag: the complete first anchor survives (close() flush),
    # the half-written second tag is dropped
    assert links('<a href="x.html">text<a href="y') == [
        ("x.html", "text", None)]


def test_script_body_is_cdata():
    html = ("<script>var s='<a href=\"s.html\">no</a>';</script>"
            "<a href='real.html'>r</a>")
    assert links(html) == [("real.html", "r", None)]


def test_anchor_inside_comment_ignored():
    assert links("<!-- <a href='c.html'>c</a> --><a href='r.html'>r</a>") \
        == [("r.html", "r", None)]


# ------------------------------------------------- head-scoped elements

def test_multiple_base_first_wins():
    c = extract_html("<head><base href='first/'><base href='second/'></head>")
    assert c.base_href == "first/"


def test_base_inside_comment_ignored():
    c = extract_html(
        "<head><!-- <base href='c/'> --><base href='real/'></head>")
    assert c.base_href == "real/"


def test_base_outside_head_ignored():
    # the reference XPath is html/head/base (DefaultContentProcessor.cs:
    # 54-58) — a body-level base does not rebase the document
    c = extract_html("<base href='nohead/'><a href='x'>t</a>")
    assert c.base_href is None


def test_empty_base_href_falls_through():
    c = extract_html("<head><base href=''><base href='ok/'></head>")
    assert c.base_href == "ok/"


def test_meta_robots_first_match_only_case_insensitive():
    c = extract_html("<head><meta name='robots' content='noindex'>"
                     "<meta name='ROBOTS' content='all'></head>")
    assert c.robots_meta == "noindex"
    c = extract_html("<head><meta NAME='Robots' CONTENT='none'></head>")
    assert c.robots_meta == "none"


def test_canonical_rel_case_insensitive_first_wins():
    c = extract_html("<head><link REL='Canonical' href='can.html'>"
                     "<link rel='canonical' href='other.html'></head>")
    assert c.canonical_href == "can.html"


def test_title_with_misnested_inline_markup():
    c = extract_html("<head><title>Ti<b>tle</title></head>")
    assert c.title == "Title"


# --------------------------------------------------------- byte inputs

def test_invalid_bytes_replace_never_raise():
    c = extract_html(b"<a href='ok.html'>\xff\xfe broken</a>",
                     charset="utf-8")
    assert c.links[0]["href"] == "ok.html"


def test_unknown_charset_token_is_callers_problem():
    # extract_html trusts its charset arg; the fetch path normalizes
    # unknown tokens before calling (test_result_parity pins that) —
    # utf-8 bytes decoded as latin-1 give mojibake text but structure
    # (hrefs, tags) survives intact
    assert links(b"<a href='l.html'>caf\xc3\xa9</a>", charset="latin-1") \
        == [("l.html", "cafÃ©", None)]
    assert links(b"<a href='l.html'>caf\xc3\xa9</a>", charset="utf-8") \
        == [("l.html", "café", None)]


@pytest.mark.parametrize("junk", [
    "", "<", "<<<>>>", "<a", "</a>", "<!doctype html>", "<?php echo ?>",
    "\x00\x01\x02", "<a href='x'>" + "y" * 100_000,
])
def test_garbage_never_raises(junk):
    extract_html(junk)  # must not throw; structure may be empty
