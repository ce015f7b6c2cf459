"""Structured Streaming operators over the events table.

The crawl engine itself is an iterative batch loop by design (exact
order/resume semantics — SURVEY.md §1.3); streaming covers the
*analytics* side the reference's users would run next to a crawl:

- windowed ingestion counts with a watermark (late data bounded);
- custom stateful sessionization via ``applyInPandasWithState`` — the
  gap-based session logic identical to the batch oracle
  (``__spark_entry__.q_events_sessionize``), so the streaming result is
  testable against the SQL-checked batch result.

File-source streams; ``run_available_now`` drains what exists and stops
(the sandbox has no live feed — at scale the same code reads Kafka).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENTS_SCHEMA = StructType([
    StructField("event_id", LongType()),
    StructField("ts", TimestampType()),
    StructField("user_id", LongType()),
    StructField("event_type", StringType()),
    StructField("value", DoubleType()),
    StructField("props", StringType()),
])

#: bump whenever the MEANING of the state fields changes; the physical
#: schema below carries it as the first field so an upgraded operator
#: resuming over older-semantics state fails fast with
#: :class:`SessionStateVersionError` instead of silently misreading.
#: (A physical-shape change is caught earlier by Spark's own state
#: schema compatibility check; this covers same-shape semantic drift.)
SESSION_STATE_VERSION = 2
SESSION_STATE = ("state_ver LONG, n_sessions LONG, last_ts_epoch DOUBLE,"
                 " buf ARRAY<DOUBLE>, upd_seq LONG")


class SessionStateVersionError(RuntimeError):
    """Raised when a resumed checkpoint's session state was written by
    an operator version with different state semantics."""
SESSION_OUT = StructType([
    StructField("user_id", LongType()),
    StructField("n_sessions", LongType()),
    #: per-key update counter — consumers keep the row with the highest
    #: upd_seq (update-mode sinks may retain superseded rows, and a
    #: provisional count can legitimately DECREASE when a late event
    #: bridges two provisional sessions)
    StructField("upd_seq", LongType()),
])


def read_events_stream(spark: SparkSession, path: str,
                       max_files_per_trigger: int = 4) -> DataFrame:
    return (spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(path))


def windowed_counts(stream: DataFrame, window: str = "1 hour",
                    watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window event counts; the watermark bounds state for
    late data."""
    return (stream
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", window).alias("win"), "event_type")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 2).alias("sum_value"))
            .select(F.date_format("win.start", "yyyy-MM-dd HH:00").alias("hour"),
                    "event_type", "n_events", "sum_value"))


def sessionize_stream(stream: DataFrame, gap_s: int = 1800,
                      watermark: str = "2 hours",
                      state_version: int = SESSION_STATE_VERSION) -> DataFrame:
    """Custom stateful operator: per-user gap-based session counting,
    correct under CROSS-BATCH event-time disorder up to the watermark.

    Events are buffered in state and only *finalized* (folded into the
    committed session count, in event-time order) once the watermark
    passes them — so an event arriving in a later micro-batch than a
    newer event still lands in its correct position. Each update row
    also extends the count *provisionally* over the still-buffered
    tail, so a drained stream's final row equals the batch program on
    the same events. Stragglers beyond the watermark delay merge into
    the current session instead of rewinding it (the standard
    bounded-late-data contract; state stays O(events within the
    watermark window) per user).

    Compatibility contract (breaking changes vs the pre-buffering
    version of this operator):

    - **checkpoints are version-guarded** — SESSION_STATE leads with a
      ``state_ver`` field (current: ``SESSION_STATE_VERSION``). A
      physical schema change across upgrades is rejected by Spark's own
      state-schema compatibility check; a same-shape semantic change
      bumps the version and resuming over older state raises
      :class:`SessionStateVersionError` (fail fast, never misread).
      Either way the remedy is a new checkpoint directory + re-read.
      (``state_version`` is parameterized only so tests can author an
      old-version checkpoint.)
    - **consumers must dedupe by ``upd_seq``** — SESSION_OUT gained
      ``upd_seq`` and update-mode sinks may retain superseded rows;
      select the max-``upd_seq`` row per user_id (a provisional count
      can legitimately decrease when a late event bridges two
      provisional sessions)."""

    def count_sessions(key, pdfs: Iterator[pd.DataFrame],
                       state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            ver, n_sessions, last_epoch, buf, upd_seq = state.get
            if ver != state_version:
                raise SessionStateVersionError(
                    f"session state for user_id={user_id} was written by "
                    f"state version {ver}, this operator is version "
                    f"{state_version}; start the upgraded query with a new "
                    "checkpoint directory and re-read the source")
            buf = list(buf) if buf is not None else []
            last = last_epoch if last_epoch is not None and last_epoch >= 0 else None
        else:
            n_sessions, last, buf, upd_seq = 0, None, [], 0
        for pdf in pdfs:
            buf.extend(float(ts.timestamp()) for ts in pdf["ts"])
        buf.sort()
        wm_s = state.getCurrentWatermarkMs() / 1000.0
        finalized = [e for e in buf if e <= wm_s]
        buf = [e for e in buf if e > wm_s]
        for epoch in finalized:
            if last is None or epoch - last > gap_s:
                n_sessions += 1
            last = epoch if last is None else max(last, epoch)
        upd_seq += 1
        state.update((state_version, n_sessions,
                      float(last) if last is not None else -1.0,
                      buf, upd_seq))
        prov, plast = n_sessions, last
        for epoch in buf:
            if plast is None or epoch - plast > gap_s:
                prov += 1
            plast = epoch
        yield pd.DataFrame([{"user_id": user_id, "n_sessions": prov,
                             "upd_seq": upd_seq}])

    return (stream.withWatermark("ts", watermark)
            .groupBy("user_id").applyInPandasWithState(
                count_sessions, outputStructType=SESSION_OUT,
                stateStructType=SESSION_STATE, outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))


def run_available_now(df: DataFrame, query_name: str,
                      timeout_s: int = 120) -> DataFrame:
    """Drain everything currently available into a memory sink and
    return the result table."""
    mode = "update" if df.isStreaming else "complete"
    query = (df.writeStream.format("memory").queryName(query_name)
             .outputMode(mode)
             .trigger(availableNow=True)
             .start())
    query.awaitTermination(timeout_s)
    return df.sparkSession.table(query_name)
