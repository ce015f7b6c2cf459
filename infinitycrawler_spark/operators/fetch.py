"""Fetch operator — per-host politeness rounds via ``applyInPandas``.

Spark-first shape of the reference's concurrency-bounded fetch loop
(DefaultRequestProcessor.cs:34-135, SURVEY.md §3.2): the frontier's due
rows are joined (column-pruned) against the synthetic web's metadata,
shuffled by host, and each host group runs the deterministic
discrete-event scheduler (scheduler/politeness.py) that computes start
delays, AIMD backoff, and timeouts. Per-host scheduler state rides in
and out as columns and is persisted in ``host_state`` between rounds.

At 100 TB scale this is the only shuffle that touches frontier rows,
and it never carries payload bytes — `PAGES_META_COLS` only.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from infinitycrawler_spark import schemas
from infinitycrawler_spark.scheduler.politeness import (
    FetchItem,
    HostSchedulerState,
    run_schedule,
)
from infinitycrawler_spark.settings import RequestProcessorOptions


def fetch_round(
    due: DataFrame,
    pages_meta: DataFrame,
    host_state: DataFrame,
    options: RequestProcessorOptions,
    skew_salt_threshold: int = 0,
    skew_salt_factor: int = 4,
    hot_hosts: set[str] | None = None,
) -> DataFrame:
    """due: frontier rows (url, host, enqueue_seq, depth). Returns the
    ATTEMPT table: one row per request plus one ``is_state`` trailer row
    per host carrying updated scheduler state.

    Skew salting (SURVEY.md §4.1): hosts with more due rows than
    ``skew_salt_threshold`` are split into ``skew_salt_factor`` salted
    shards processed in parallel; each shard fetches only on its slot of
    an interleaved time lattice (stride = factor), so the merged
    schedule still honors per-host politeness spacing globally.
    ``hot_hosts`` supplies the hot set precomputed from the previous
    round's frontier stats (avoids a per-round count+collect here);
    None → detect with a count (standalone use)."""
    if hot_hosts is None:
        hot_hosts = set()
        if skew_salt_threshold > 0 and skew_salt_factor > 1:
            hot = (due.groupBy("host").count()
                   .filter(F.col("count") > skew_salt_threshold).collect())
            hot_hosts = {r.host for r in hot}
    elif skew_salt_threshold <= 0 or skew_salt_factor <= 1:
        hot_hosts = set()

    due_sel = due.select("url", "host", "enqueue_seq", "depth")
    if hot_hosts:
        due_sel = due_sel.withColumn(
            "salt",
            F.when(F.col("host").isin(list(hot_hosts)),
                   F.pmod(F.xxhash64("url"), F.lit(skew_salt_factor)).cast("int"))
            .otherwise(F.lit(0)))
    else:
        due_sel = due_sel.withColumn("salt", F.lit(0))

    joined = (
        due_sel
        .join(pages_meta.select(*schemas.PAGES_META_COLS), "url", "left")
        .join(host_state, "host", "left")
    )

    opts = options  # closure-captured; plain dataclass → picklable
    factor = skew_salt_factor

    def fetch_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("enqueue_seq").reset_index(drop=True)
        host = pdf["host"].iloc[0]
        salt = int(pdf["salt"].iloc[0])
        stride = factor if host in hot_hosts else 1
        state = HostSchedulerState(
            current_backoff_ms=int(pdf["backoff_ms"].iloc[0]) if pd.notna(pdf["backoff_ms"].iloc[0]) else 0,
            successes_since_throttle=int(pdf["successes"].iloc[0]) if pd.notna(pdf["successes"].iloc[0]) else 0,
            request_count=int(pdf["request_count"].iloc[0]) if pd.notna(pdf["request_count"].iloc[0]) else 0,
            clock_ms=float(pdf["clock_ms"].iloc[0]) if pd.notna(pdf["clock_ms"].iloc[0]) else 0.0,
        )
        items = [
            FetchItem(
                url=row.url,
                response_time_ms=float(row.delay_ms) if pd.notna(row.delay_ms) else 0.0,
                available=pd.notna(row.status_code),
            )
            for row in pdf.itertuples()
        ]
        initial_count = state.request_count
        records, state = run_schedule(items, opts, state=state,
                                      time_slot_stride=stride,
                                      time_slot_offset=salt)
        rows = []
        for rec in records:
            # launch_seq is positional → robust to duplicate frontier urls
            meta = pdf.iloc[rec.launch_seq - initial_count]
            has_response = rec.error is None
            rows.append({
                "url": rec.url,
                "host": host,
                "enqueue_seq": int(meta.enqueue_seq),
                "depth": int(meta.depth),
                "status_code": int(meta.status_code) if has_response else None,
                "redirect_to": meta.redirect_to if has_response and isinstance(meta.redirect_to, str) else None,
                "error": rec.error,
                "start_delay_ms": rec.start_delay_ms,
                "request_start_ms": rec.request_start_ms,
                "elapsed_ms": rec.elapsed_ms,
                "is_state": False,
                "backoff_ms": None, "successes": None,
                "request_count": None, "clock_ms": None,
            })
        rows.append({
            "url": "", "host": host, "enqueue_seq": -1, "depth": 0,
            "status_code": None, "redirect_to": None, "error": None,
            "start_delay_ms": None, "request_start_ms": None, "elapsed_ms": None,
            "is_state": True,
            "backoff_ms": state.current_backoff_ms,
            "successes": state.successes_since_throttle,
            # DELTA, not absolute: each salted shard of one host starts
            # from the same persisted base; summing absolutes would count
            # the base once per shard. split_attempts re-adds the base.
            "request_count": state.request_count - initial_count,
            "clock_ms": state.clock_ms,
        })
        out = pd.DataFrame(rows)
        out["status_code"] = out["status_code"].astype("Int32")
        out["depth"] = out["depth"].astype("int32")
        out["backoff_ms"] = out["backoff_ms"].astype("Int64")
        out["successes"] = out["successes"].astype("Int64")
        out["request_count"] = out["request_count"].astype("Int64")
        return out

    return joined.groupBy("host", "salt").applyInPandas(
        fetch_group, schema=schemas.ATTEMPT)


def split_attempts(
    attempts: DataFrame,
    prev_host_state: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """→ (attempt_rows, new_host_state). Salted shards of one host each
    emit a state trailer carrying the per-shard request-count DELTA;
    merge conservatively (max backoff, min success streak, base + summed
    deltas, latest clock). ``prev_host_state`` supplies the persisted
    request-count base (absent/empty → base 0)."""
    attempts = attempts.cache()
    attempt_rows = attempts.filter(~F.col("is_state")).drop(
        "is_state", "backoff_ms", "successes", "request_count", "clock_ms")
    new_state = (attempts.filter(F.col("is_state"))
                 .groupBy("host")
                 .agg(F.max("backoff_ms").alias("backoff_ms"),
                      F.min("successes").alias("successes"),
                      F.sum("request_count").alias("request_count"),
                      F.max("clock_ms").alias("clock_ms")))
    if prev_host_state is not None:
        base = prev_host_state.select(
            "host", F.col("request_count").alias("_base"))
        new_state = (new_state.join(base, "host", "left")
                     .withColumn("request_count",
                                 F.coalesce("_base", F.lit(0))
                                 + F.col("request_count"))
                     .drop("_base"))
    return attempt_rows, new_state
