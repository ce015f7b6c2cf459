"""Structured Streaming: windowed counts and stateful sessionization
must agree with their batch (SQL-oracle-checked) equivalents on the
same events."""

import shutil

import pytest

import __spark_entry__ as entry_mod
from infinitycrawler_spark.streaming.events import (
    read_events_stream,
    run_available_now,
    sessionize_stream,
    windowed_counts,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(f"{SF}/events.parquet", d / "part-000.parquet")
    return str(d)


def test_stream_windowed_counts_match_batch(spark, events_dir):
    stream = read_events_stream(spark, events_dir)
    got = run_available_now(windowed_counts(stream), "win_counts")
    batch = entry_mod.q_events_tumbling(spark, SF)
    g = {(r.hour, r.event_type): (r.n_events, r.sum_value) for r in got.collect()}
    b = {(r.hour, r.event_type): (r.n_events, r.sum_value) for r in batch.collect()}
    assert g == b


def _session_hist(rows):
    # keep the row with the highest upd_seq per user (update-mode sink;
    # provisional counts may go down when late data bridges sessions)
    per_user = {}
    for r in rows:
        seq, _ = per_user.get(r.user_id, (-1, 0))
        if r.upd_seq > seq:
            per_user[r.user_id] = (r.upd_seq, r.n_sessions)
    hist = {}
    for _, n in per_user.values():
        hist[n] = hist.get(n, 0) + 1
    return hist


def test_stream_sessionize_matches_batch(spark, events_dir):
    stream = read_events_stream(spark, events_dir)
    got = run_available_now(sessionize_stream(stream), "sessions")
    batch = entry_mod.q_events_sessionize(spark, SF)
    want = {r.n_sessions: r.n_users for r in batch.collect()}
    assert _session_hist(got.collect()) == want


def test_stream_sessionize_out_of_order_across_batches(
        spark, tmp_path_factory):
    """The same events split into two micro-batches with cross-batch
    event-time disorder (batch 2 carries events OLDER than batch 1's)
    must still equal the batch oracle — the watermark buffer reorders
    them (VERDICT r2 §wrong 2)."""
    import os
    import time as _time

    import duckdb

    d = tmp_path_factory.mktemp("events_ooo")
    con = duckdb.connect()
    # split at the median time C, but displace half the events from the
    # hour before C into batch 2 — cross-batch disorder bounded by 1h,
    # within the operator's 2h watermark (the correctness contract)
    c = con.execute(
        f"SELECT quantile_cont(epoch(ts), 0.5) FROM '{SF}/events.parquet'"
    ).fetchone()[0]
    displaced = f"(epoch(ts) >= {c} - 3600 AND epoch(ts) < {c}" \
                " AND event_id % 2 = 0)"
    con.execute(f"""
        COPY (SELECT * FROM '{SF}/events.parquet'
              WHERE epoch(ts) < {c} AND NOT {displaced})
        TO '{d}/part-000.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
        COPY (SELECT * FROM '{SF}/events.parquet'
              WHERE epoch(ts) >= {c} OR {displaced})
        TO '{d}/part-001.parquet' (FORMAT PARQUET)""")
    # the split must actually be disordered: batch 2 carries events
    # older than batch 1's newest
    n_displaced = con.execute(
        f"SELECT count(*) FROM '{SF}/events.parquet' WHERE {displaced}"
    ).fetchone()[0]
    assert n_displaced > 0
    now = _time.time()  # file source processes in mtime order
    os.utime(f"{d}/part-000.parquet", (now - 60, now - 60))
    os.utime(f"{d}/part-001.parquet", (now, now))

    stream = read_events_stream(spark, str(d), max_files_per_trigger=1)
    got = run_available_now(sessionize_stream(stream), "sessions_ooo")
    batch = entry_mod.q_events_sessionize(spark, SF)
    want = {r.n_sessions: r.n_users for r in batch.collect()}
    assert _session_hist(got.collect()) == want
