"""Skew salting: a hot host split into salted shards must (a) fetch
every URL exactly once and (b) keep per-host politeness spacing across
the merged schedule via the interleaved time-slot lattice."""

from pyspark.sql import functions as F

from infinitycrawler_spark import schemas
from infinitycrawler_spark.operators.fetch import fetch_round, split_attempts
from infinitycrawler_spark.settings import RequestProcessorOptions
from infinitycrawler_spark.sources.web import pages_df
from infinitycrawler_spark.synth.fixtures import WebFixture, _page


def _fixture(n: int) -> WebFixture:
    pages = [_page(f"http://hot.example/p/{i}", content_type="text/plain",
                   delay_ms=5) for i in range(n)]
    pages += [_page(f"http://cold.example/p/{i}", content_type="text/plain",
                    delay_ms=5) for i in range(3)]
    return WebFixture(name="salt", pages=pages)


def test_salted_hot_host_politeness(spark):
    fx = _fixture(40)
    pages_meta = pages_df(spark, fx).select(*schemas.PAGES_META_COLS)
    rows = [(p["url"], p["host"], i, i + 1, 0, 0)
            for i, p in enumerate(fx.pages)]
    frontier = spark.createDataFrame(
        rows, schema="url string, host string, url_key long, "
                     "enqueue_seq long, depth int, round_enqueued int")
    host_state = spark.createDataFrame([], schema=schemas.HOST_STATE)
    opts = RequestProcessorOptions(
        max_number_of_simultaneous_requests=1,
        delay_between_request_start_ms=100, delay_jitter_ms=0,
        timeout_before_throttle_ms=0)
    attempts = fetch_round(frontier, pages_meta, host_state, opts,
                           skew_salt_threshold=10, skew_salt_factor=4)
    rows_out, state = split_attempts(attempts)
    got = rows_out.collect()

    # every URL fetched exactly once
    urls = [r.url for r in got]
    assert len(urls) == 43 and len(set(urls)) == 43

    # per-host merged start times keep >= delay spacing
    hot_starts = sorted(r.request_start_ms for r in got
                        if r.host == "hot.example")
    gaps = [b - a for a, b in zip(hot_starts, hot_starts[1:])]
    assert all(g >= 100 for g in gaps), f"min gap {min(gaps)}"

    # cold host untouched by salting: plain serialized spacing
    cold_starts = sorted(r.request_start_ms for r in got
                         if r.host == "cold.example")
    cold_gaps = [b - a for a, b in zip(cold_starts, cold_starts[1:])]
    assert all(g >= 100 for g in cold_gaps)

    # one merged state row per host
    st = {r.host: r for r in state.collect()}
    assert set(st) == {"hot.example", "cold.example"}
    assert st["hot.example"].request_count == 40
