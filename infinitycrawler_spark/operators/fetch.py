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

    has_priority = "priority" in due.columns
    due_sel = due.select("url", "host", "enqueue_seq", "depth",
                         *(["priority"] if has_priority else []))
    if not has_priority:
        due_sel = due_sel.withColumn("priority", F.lit(0))
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
        # per-host priority queue (north rule; reference is FIFO-only):
        # higher priority launches earlier, ties in FIFO enqueue order
        pdf = pdf.sort_values(["priority", "enqueue_seq"],
                              ascending=[False, True]).reset_index(drop=True)
        host = pdf["host"].iloc[0]
        salt = int(pdf["salt"].iloc[0])
        stride = factor if host in hot_hosts else 1
        state = HostSchedulerState(
            current_backoff_ms=int(pdf["backoff_ms"].iloc[0]) if pd.notna(pdf["backoff_ms"].iloc[0]) else 0,
            successes_since_throttle=int(pdf["successes"].iloc[0]) if pd.notna(pdf["successes"].iloc[0]) else 0,
            request_count=int(pdf["request_count"].iloc[0]) if pd.notna(pdf["request_count"].iloc[0]) else 0,
            clock_ms=float(pdf["clock_ms"].iloc[0]) if pd.notna(pdf["clock_ms"].iloc[0]) else 0.0,
        )
        # pre-extract columns once: per-record pdf.iloc[] / per-row
        # pd.notna cost ~10 µs each — pure overhead at frontier scale
        urls_a = pdf["url"].to_numpy(dtype=object)
        delay_a = pdf["delay_ms"].to_numpy(dtype="float64", na_value=0.0)
        status_a = pdf["status_code"].to_numpy(dtype=object)
        avail_a = pdf["status_code"].notna().to_numpy()
        rto_a = pdf["redirect_to"].to_numpy(dtype=object)
        seq_a = pdf["enqueue_seq"].to_numpy()
        depth_a = pdf["depth"].to_numpy()
        items = [
            FetchItem(url=urls_a[i], response_time_ms=delay_a[i],
                      available=bool(avail_a[i]))
            for i in range(len(urls_a))
        ]
        initial_count = state.request_count
        records, state = run_schedule(items, opts, state=state,
                                      time_slot_stride=stride,
                                      time_slot_offset=salt)
        nr = len(records)
        c_url, c_seq, c_depth = [], [], []
        c_status, c_rto, c_err = [], [], []
        c_sdelay, c_rstart, c_elapsed = [], [], []
        for rec in records:
            # launch_seq is positional → robust to duplicate frontier urls
            i = rec.launch_seq - initial_count
            has_response = rec.error is None
            c_url.append(rec.url)
            c_seq.append(int(seq_a[i]))
            c_depth.append(int(depth_a[i]))
            c_status.append(int(status_a[i]) if has_response else None)
            c_rto.append(rto_a[i]
                         if has_response and isinstance(rto_a[i], str) else None)
            c_err.append(rec.error)
            c_sdelay.append(rec.start_delay_ms)
            c_rstart.append(rec.request_start_ms)
            c_elapsed.append(rec.elapsed_ms)
        # trailing row: per-host scheduler-state trailer. request_count is
        # a DELTA, not absolute: each salted shard of one host starts from
        # the same persisted base; summing absolutes would count the base
        # once per shard. split_attempts re-adds the base.
        c_url.append(""); c_seq.append(-1); c_depth.append(0)
        c_status.append(None); c_rto.append(None); c_err.append(None)
        c_sdelay.append(None); c_rstart.append(None); c_elapsed.append(None)
        none_tail = [None] * nr
        return pd.DataFrame({
            "url": c_url, "host": host,
            "enqueue_seq": pd.array(c_seq, dtype="int64"),
            "depth": pd.array(c_depth, dtype="int32"),
            "status_code": pd.array(c_status, dtype="Int32"),
            "redirect_to": c_rto, "error": c_err,
            "start_delay_ms": c_sdelay, "request_start_ms": c_rstart,
            "elapsed_ms": c_elapsed,
            "is_state": [False] * nr + [True],
            "backoff_ms": pd.array(
                none_tail + [state.current_backoff_ms], dtype="Int64"),
            "successes": pd.array(
                none_tail + [state.successes_since_throttle], dtype="Int64"),
            "request_count": pd.array(
                none_tail + [state.request_count - initial_count],
                dtype="Int64"),
            "clock_ms": none_tail + [state.clock_ms],
        })

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
    request-count base (absent/empty → base 0).

    ``attempts`` is lazily localCheckpoint'ed (not cached): the fetch
    chain is the deepest subtree of the crawl round and gets CLONED into
    ~10 downstream logical trees — a checkpoint collapses every clone to
    a scan (the analyzer walks trees, not DAGs, so with a cache the
    driver re-analyzes the whole chain per clone; measured seconds of
    planning per round at mirror scale). A cache here also leaked: no
    caller ever held a handle to unpersist it. Checkpoint blocks are
    freed by the ContextCleaner when the round's frames are dropped."""
    attempts = attempts.localCheckpoint(eager=False)
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
