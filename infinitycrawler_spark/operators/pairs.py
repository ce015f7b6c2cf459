"""Image+caption pair curation over the input_hint table shape
``(image_id:string, bytes:binary, w:int, h:int, fmt:string,
caption:string, phash:long)`` — the LAION-style metadata gates a
training-data pipeline applies BEFORE the expensive decode path
(operators/multimodal.py), so at 100 TB the filter runs as a pure
whole-stage-codegen scan that prunes rows (and the heavy ``bytes``
column is never touched: Parquet column pruning keeps it on disk).

No reference analog (the reference crawls, it doesn't curate); these
are payload-axis additions per BASELINE.json ``input_hint``. Every
operator is JVM expressions only — integer arithmetic (no float
thresholds, so the DuckDB oracles match bit-exactly), one hash shuffle
total for the caption dedup, zero for the filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _n_tokens(col: str = "caption"):
    """Whitespace tokens, empty tokens dropped (double spaces don't
    count) — matches ``len(list_filter(string_split(c,' '), ...))``."""
    return F.size(F.filter(F.split(F.col(col), " "),
                           lambda x: x != F.lit("")))


def pair_quality_filter(pairs: DataFrame, min_side: int = 64,
                        max_aspect: int = 3, min_tokens: int = 2,
                        max_tokens: int = 77) -> DataFrame:
    """Per-pair quality verdict → (image_id, w, h, n_tokens, keep,
    reject_reason). Rules, checked in order (first failure reported):

    1. ``missing``        — caption, w, or h is NULL (real crawl data
       has them; NULL must fail closed, not sail through every
       three-valued-logic comparison below as keep=True)
    2. ``too_small``      — min(w, h) < min_side
    3. ``extreme_aspect`` — max(w, h) > max_aspect * min(w, h)
    4. ``caption_short``  — n_tokens < min_tokens
    5. ``caption_long``   — n_tokens > max_tokens
    6. ``caption_junk``   — caption has no ascii letter

    Aspect is integer arithmetic (max > ratio*min), never a float
    division, so the oracle comparison is exact. Narrow projection:
    ``bytes`` is never referenced, so Parquet scans prune it.
    """
    missing = (F.col("caption").isNull() | F.col("w").isNull()
               | F.col("h").isNull())
    small = F.least("w", "h") < min_side
    aspect = F.greatest("w", "h") > max_aspect * F.least("w", "h")
    nt = _n_tokens()
    junk = ~F.col("caption").rlike("[A-Za-z]")
    reason = (F.when(missing, "missing")
              .when(small, "too_small")
              .when(aspect, "extreme_aspect")
              .when(nt < min_tokens, "caption_short")
              .when(nt > max_tokens, "caption_long")
              .when(junk, "caption_junk"))
    return pairs.select(
        "image_id", "w", "h", nt.cast("int").alias("n_tokens"),
        reason.isNull().alias("keep"),
        reason.alias("reject_reason"))


def caption_dedup(pairs: DataFrame) -> DataFrame:
    """Same-caption keep-best-image dedup → one row per distinct
    caption: (image_id, caption, n_dups, best_pixels). The keeper is
    the highest-resolution image (w*h), ties broken by smallest
    image_id — the standard "many thumbnails share one alt-text, keep
    the original" curation step.

    One hash shuffle on caption; at scale the window is per-caption
    (bounded groups), never global.
    """
    px = (F.col("w").cast("long") * F.col("h").cast("long"))
    w = Window.partitionBy("caption")
    ranked = pairs.select(
        "image_id", "caption", px.alias("pixels"),
        F.row_number().over(
            w.orderBy(F.desc(px), F.asc("image_id"))).alias("rn"),
        F.count("*").over(w).cast("long").alias("n_dups"))
    return (ranked.filter(F.col("rn") == 1)
            .select("image_id", "caption", "n_dups",
                    F.col("pixels").alias("best_pixels")))
