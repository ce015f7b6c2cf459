"""Fetch operator through Spark: the ThrottlingTest golden sequence via
applyInPandas (host_state riding in/out as columns), politeness spacing,
and the serialized replay mode's exact FIFO order."""

import pytest
from pyspark.sql import functions as F

from infinitycrawler_spark import golden, schemas
from infinitycrawler_spark.operators.fetch import fetch_round, split_attempts
from infinitycrawler_spark.plans.crawl_job import crawl_fixture
from infinitycrawler_spark.settings import CrawlSettings, RequestProcessorOptions
from infinitycrawler_spark.sources.web import pages_df
from infinitycrawler_spark.synth.fixtures import basic_site, request_site


def _frontier(spark, urls):
    rows = [(u, "localhost", i, i + 1, 0, 0) for i, u in enumerate(urls)]
    return spark.createDataFrame(
        rows, schema="url string, host string, url_key long, "
                     "enqueue_seq long, depth int, round_enqueued int")


def test_throttling_golden_through_spark(spark):
    """DefaultRequestProcessorTests.cs:18-69 via the distributed fetch."""
    fx = request_site()
    pages_meta = pages_df(spark, fx).select(*schemas.PAGES_META_COLS)
    urls = ["http://localhost/delay/50/50ms-delay-1",
            "http://localhost/delay/50/50ms-delay-2",
            "http://localhost/delay/300/300ms-delay-1",
            "http://localhost/delay/300/300ms-delay-2",
            "http://localhost/delay/50/50ms-delay-3",
            "http://localhost/delay/50/50ms-delay-4",
            "http://localhost/delay/50/50ms-delay-5",
            "http://localhost/delay/50/50ms-delay-6",
            "http://localhost/delay/50/50ms-delay-7"]
    opts = RequestProcessorOptions(
        max_number_of_simultaneous_requests=1,
        min_sequential_successes_to_minimise_throttling=2,
        delay_between_request_start_ms=0, delay_jitter_ms=0,
        timeout_before_throttle_ms=270, throttling_request_backoff_ms=100)
    host_state = spark.createDataFrame([], schema=schemas.HOST_STATE)
    attempts = fetch_round(_frontier(spark, urls), pages_meta, host_state, opts)
    rows, state = split_attempts(attempts)
    delays = [r.start_delay_ms for r in rows.orderBy("enqueue_seq").collect()]
    assert delays == [0, 0, 0, 100, 200, 200, 100, 100, 0]
    st = state.collect()[0]
    assert st.backoff_ms == 0  # fully recovered at the end


def test_host_state_carries_across_rounds_spark(spark):
    fx = request_site()
    pages_meta = pages_df(spark, fx).select(*schemas.PAGES_META_COLS)
    opts = RequestProcessorOptions(
        max_number_of_simultaneous_requests=1,
        min_sequential_successes_to_minimise_throttling=2,
        delay_between_request_start_ms=0, delay_jitter_ms=0,
        timeout_before_throttle_ms=270, throttling_request_backoff_ms=100)
    hs0 = spark.createDataFrame([], schema=schemas.HOST_STATE)
    a1 = fetch_round(_frontier(spark, ["http://localhost/delay/300/300ms-delay-1"]),
                     pages_meta, hs0, opts)
    _, hs1 = split_attempts(a1)
    assert hs1.collect()[0].backoff_ms == 100
    a2 = fetch_round(_frontier(spark, ["http://localhost/delay/50/50ms-delay-1"]),
                     pages_meta, hs1, opts)
    rows2, _ = split_attempts(a2)
    assert rows2.collect()[0].start_delay_ms == 100  # backoff applied


def test_politeness_wait_metrics_accumulate(spark):
    """A crawl with politeness delays reports nonzero waits in metrics."""
    s = CrawlSettings(request_processor_options=RequestProcessorOptions(
        max_number_of_simultaneous_requests=1,
        delay_between_request_start_ms=100, delay_jitter_ms=0,
        timeout_before_throttle_ms=0))
    out = crawl_fixture(spark, basic_site(), s,
                        collect_enqueue_log=False)
    assert sum(m["politeness_wait_ms"] for m in out.metrics) > 0
    g = golden.crawl(basic_site(), s)
    got = {(r.url, r.status, r.n_attempts) for r in out.results.collect()}
    want = {(r.url, r.status, r.n_attempts) for r in g.results}
    assert got == want  # politeness must not change crawl semantics


def test_serialized_replay_mode_exact_fifo(spark):
    """replay_mode='serialized' fetches one URL per round in exact
    reference FIFO order (the order-match criterion's replay mode)."""
    s = CrawlSettings(
        max_number_of_pages_to_crawl=4,
        replay_mode="serialized",
        request_processor_options=RequestProcessorOptions().no_delay())
    out = crawl_fixture(spark, basic_site(), s)
    g = golden.crawl(basic_site(), CrawlSettings(
        max_number_of_pages_to_crawl=4,
        request_processor_options=RequestProcessorOptions().no_delay()))
    assert out.enqueue_log == g.enqueue_order
    got = {(r.url, r.status, r.n_attempts) for r in out.results.collect()}
    want = {(r.url, r.status, r.n_attempts) for r in g.results}
    assert got == want
    # serialized mode = one fetch per round
    assert all(m["fetched"] <= 1 for m in out.metrics)
