"""Append-only crawl-history tables (attempt log / redirect hops).

The states table used to carry per-attempt and per-hop arrays on every
row, so the per-round localCheckpoint re-materialized the FULL history
every round — the measured state-proportional round residual
(BENCH/BASELINE.md §8). The history now lives in two append-only delta
tables (schemas.ATT_ROWS / HOP_ROWS): each round checkpoints only its
own delta segment once and never rewrites it, and the result-emission
paths gather the nested arrays back ON DEMAND for the per-round url
sets that need them.

Scale shape (10^10 URLs): every gather is driven by a SMALL per-round
url set (retried urls, redirect sources/targets, max-retries/redirects
candidates — all bounded by error/redirect rates, not corpus size)
broadcast against a columnar scan of the history union — the same
scan-not-shuffle topology as the broadcast-suspect seen check. The
history is never shuffled whole and never rewritten; per-round cost is
one pruned scan + a delta-sized groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gather_attempts(att_rows: DataFrame, urls: DataFrame | None,
                    out_col: str = "att",
                    broadcast_urls: bool = True) -> DataFrame:
    """(url, attempt_no, start_ms, …) rows → (url, ``out_col``) with the
    attempts nested as an ATT_LOG array in attempt order — the exact
    shape the RESULTS schema carries. ``urls`` (one ``url`` column) is
    broadcast so the history side is scanned, never shuffled; pass None
    when ``att_rows`` is already restricted to the wanted urls."""
    if urls is not None:
        key = F.broadcast(urls) if broadcast_urls else urls
        att_rows = att_rows.join(key, "url", "left_semi")
    rec = F.struct(
        F.col("start_ms").alias("start_ms"),
        F.col("elapsed_ms").alias("elapsed_ms"),
        F.col("status_code").alias("status_code"),
        F.col("is_success").alias("is_success"))
    # sort by (attempt_no, rec) then project the rec field out of the
    # array — GetArrayStructFields instead of a transform() lambda: the
    # higher-order function costs ~3× more DRIVER PLANNING time, and
    # these gather plans are rebuilt every crawl round
    return (att_rows
            .groupBy("url")
            .agg(F.array_sort(F.collect_list(
                F.struct(F.col("attempt_no").alias("n"), rec.alias("a"))))
                .alias("_s"))
            .select("url", F.col("_s.a").alias(out_col)))


def gather_hops(hop_rows: DataFrame, urls: DataFrame | None,
                out_col: str = "hops",
                broadcast_urls: bool = True) -> DataFrame:
    """(url, hop_seq, location, attempts) rows → (url, ``out_col``) with
    hops nested as a HOP_LOG array in chain order."""
    if urls is not None:
        key = F.broadcast(urls) if broadcast_urls else urls
        hop_rows = hop_rows.join(key, "url", "left_semi")
    hop = F.struct(F.col("location").alias("location"),
                   F.col("attempts").alias("attempts"))
    return (hop_rows
            .groupBy("url")
            .agg(F.array_sort(F.collect_list(
                F.struct(F.col("hop_seq").alias("n"), hop.alias("h"))))
                .alias("_s"))
            .select("url", F.col("_s.h").alias(out_col)))
