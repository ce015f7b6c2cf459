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


def test_stream_sessionize_matches_batch(spark, events_dir):
    stream = read_events_stream(spark, events_dir)
    got = run_available_now(sessionize_stream(stream), "sessions")
    # keep the last update per user (update-mode memory sink)
    per_user = {}
    for r in got.collect():
        per_user[r.user_id] = max(r.n_sessions, per_user.get(r.user_id, 0))
    hist = {}
    for n in per_user.values():
        hist[n] = hist.get(n, 0) + 1
    batch = entry_mod.q_events_sessionize(spark, SF)
    want = {r.n_sessions: r.n_users for r in batch.collect()}
    assert hist == want
