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

SESSION_STATE = "n_sessions LONG, last_ts_epoch DOUBLE"
SESSION_OUT = StructType([
    StructField("user_id", LongType()),
    StructField("n_sessions", LongType()),
])


def read_events_stream(spark: SparkSession, path: str) -> DataFrame:
    return (spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", 4)
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


def sessionize_stream(stream: DataFrame, gap_s: int = 1800) -> DataFrame:
    """Custom stateful operator: per-user gap-based session counting.
    State = (session count, last event time); a new session starts when
    the gap to the previous event exceeds ``gap_s``. Semantics match the
    batch window program exactly (events arrive time-ordered per user in
    the sandbox feed)."""

    def count_sessions(key, pdfs: Iterator[pd.DataFrame],
                       state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            n_sessions, last_epoch = state.get
        else:
            n_sessions, last_epoch = 0, None
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for ts in pdf["ts"]:
                epoch = ts.timestamp()
                if last_epoch is None or epoch - last_epoch > gap_s:
                    n_sessions += 1
                last_epoch = epoch
        state.update((n_sessions, float(last_epoch if last_epoch else 0.0)))
        yield pd.DataFrame([{"user_id": user_id, "n_sessions": n_sessions}])

    return (stream.groupBy("user_id").applyInPandasWithState(
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
