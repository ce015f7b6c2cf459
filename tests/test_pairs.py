"""Image+caption pair curation (operators/pairs.py): hand-derived
expectations per rule, plus plan assertions that the gate stays a
scan-only filter (no shuffle, bytes pruned) — the property that makes
it free at 100 TB."""

import pytest

from infinitycrawler_spark.operators.pairs import (
    caption_dedup,
    pair_quality_filter,
)

ROWS = [
    # image_id, w,   h,   caption
    ("ok",      640, 480, "a dog on a beach"),
    ("small",   32,  480, "a dog on a beach"),
    ("wide",    640, 100, "a dog on a beach"),          # 640 > 3*100
    ("short",   640, 480, "dog"),
    ("empty",   640, 480, ""),
    ("spaces",  640, 480, "a  b"),                      # 2 tokens, dbl space
    ("long",    640, 480, " ".join(["w"] * 78)),
    ("junk",    640, 480, "123 456 789"),
    # first failing rule wins: too_small beats caption_junk
    ("both",    10,  10,  "123 456"),
    # NULLs fail closed ('missing'), never keep=True via 3VL
    ("nullcap", 640, 480, None),
    ("nullw",   None, 480, "a dog on a beach"),
]


@pytest.fixture(scope="module")
def pairs(spark):
    return spark.createDataFrame(ROWS, "image_id string, w int, h int, caption string")


def test_quality_filter_rules(pairs):
    got = {r.image_id: (r.keep, r.reject_reason, r.n_tokens)
           for r in pair_quality_filter(pairs).collect()}
    assert got == {
        "ok":     (True,  None,             5),
        "small":  (False, "too_small",      5),
        "wide":   (False, "extreme_aspect", 5),
        "short":  (False, "caption_short",  1),
        "empty":  (False, "caption_short",  0),
        "spaces": (True,  None,             2),
        "long":   (False, "caption_long",   78),
        "junk":   (False, "caption_junk",   3),
        "both":   (False, "too_small",      2),
        "nullcap": (False, "missing",       None),
        "nullw":  (False, "missing",        5),
    }


def test_caption_dedup_keeps_best_resolution(spark):
    rows = [
        ("a", 100, 100, "cap one"),   # 10_000 px
        ("b", 200, 100, "cap one"),   # 20_000 px — tie with "c",
        ("c", 100, 200, "cap one"),   #   smallest image_id keeps → "b"
        ("d", 50,  50,  "cap two"),
    ]
    df = spark.createDataFrame(rows, "image_id string, w int, h int, caption string")
    got = {r.caption: (r.image_id, r.n_dups, r.best_pixels)
           for r in caption_dedup(df).collect()}
    assert got == {"cap one": ("b", 3, 20_000), "cap two": ("d", 1, 2_500)}


def test_quality_filter_plan_is_scan_only(pairs):
    """No Exchange (no shuffle) and no reference to a bytes column: the
    gate must stay map-side so Parquet prunes the payload column."""
    plan = pair_quality_filter(pairs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def _ref_verdict(w, h, caption, min_side=64, max_aspect=3,
                 min_tokens=2, max_tokens=77):
    """Plain-python restatement of the rule order for the property test."""
    if caption is None or w is None or h is None:
        return "missing"
    if min(w, h) < min_side:
        return "too_small"
    if max(w, h) > max_aspect * min(w, h):
        return "extreme_aspect"
    nt = len([t for t in caption.split(" ") if t != ""])
    if nt < min_tokens:
        return "caption_short"
    if nt > max_tokens:
        return "caption_long"
    import re
    if not re.search("[A-Za-z]", caption):
        return "caption_junk"
    return None


def test_quality_filter_property(spark):
    """Randomized agreement with the python reference across the rule
    lattice (dims spanning the thresholds, captions spanning token
    counts / junk / spaces / None)."""
    from hypothesis import given, settings as hs, strategies as st

    dim = st.one_of(st.none(), st.integers(min_value=1, max_value=400))
    word = st.sampled_from(["dog", "123", "x", "", " "])
    cap = st.one_of(st.none(),
                    st.lists(word, min_size=0, max_size=90)
                    .map(lambda ws: " ".join(ws)))
    rows_strategy = st.lists(st.tuples(dim, dim, cap), min_size=1,
                             max_size=30)

    @hs(max_examples=12, deadline=None)
    @given(rows_strategy)
    def check(rows):
        df = spark.createDataFrame(
            [(str(i), w, h, c) for i, (w, h, c) in enumerate(rows)],
            "image_id string, w int, h int, caption string")
        got = {r.image_id: r.reject_reason
               for r in pair_quality_filter(df).collect()}
        want = {str(i): _ref_verdict(w, h, c)
                for i, (w, h, c) in enumerate(rows)}
        assert got == want

    check()
