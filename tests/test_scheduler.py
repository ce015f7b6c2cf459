"""Scheduler golden: the exact AIMD backoff sequence the reference pins
in DefaultRequestProcessorTests.cs:18-69, plus timeout and concurrency
semantics."""

from infinitycrawler_spark.scheduler.politeness import (
    FetchItem,
    HostSchedulerState,
    run_schedule,
)
from infinitycrawler_spark.settings import RequestProcessorOptions


def _opts(**kw) -> RequestProcessorOptions:
    base = dict(
        max_number_of_simultaneous_requests=1,
        min_sequential_successes_to_minimise_throttling=2,
        delay_between_request_start_ms=0,
        delay_jitter_ms=0,
        timeout_before_throttle_ms=270,
        throttling_request_backoff_ms=100,
    )
    base.update(kw)
    return RequestProcessorOptions(**base)


def test_throttling_golden_sequence():
    # DefaultRequestProcessorTests.cs:35-68
    delays = [50, 50, 300, 300, 50, 50, 50, 50, 50]
    items = [FetchItem(url=f"http://localhost/delay/{d}/{i}", response_time_ms=d)
             for i, d in enumerate(delays)]
    records, state = run_schedule(items, _opts())
    start_delays = [r.start_delay_ms for r in records]
    assert start_delays == [0, 0, 0, 100, 200, 200, 100, 100, 0]
    assert state.current_backoff_ms == 0


def test_timeout_marks_error_with_timeout_elapsed():
    # RequestTimeoutTest (DefaultRequestProcessorTests.cs:112-148)
    opts = _opts(max_number_of_simultaneous_requests=4,
                 timeout_before_throttle_ms=0, request_timeout_ms=150)
    items = [FetchItem(url=f"u{i}", response_time_ms=300) for i in range(4)]
    records, _ = run_schedule(items, opts)
    assert len(records) == 4
    assert all(r.timed_out and r.error == "Timeout" for r in records)
    assert all(r.elapsed_ms == 150 for r in records)


def test_unavailable_is_transport_error():
    records, _ = run_schedule([FetchItem(url="u", available=False)], _opts())
    assert records[0].error == "ConnectionError"


def test_politeness_spacing_serialized():
    opts = _opts(delay_between_request_start_ms=100, timeout_before_throttle_ms=0)
    items = [FetchItem(url=f"u{i}", response_time_ms=10) for i in range(3)]
    records, _ = run_schedule(items, opts)
    starts = [r.request_start_ms for r in records]
    # serialized: each request starts 100ms after the previous completion
    assert starts == [100, 210, 320]


def test_state_carries_across_rounds():
    # backoff accumulated in round 1 applies to round 2's first launch
    items1 = [FetchItem(url="slow", response_time_ms=300)]
    records1, state = run_schedule(items1, _opts())
    assert state.current_backoff_ms == 100
    records2, state = run_schedule(
        [FetchItem(url="fast", response_time_ms=10)], _opts(), state=state)
    assert records2[0].start_delay_ms == 100


def test_concurrent_launch_batches():
    opts = _opts(max_number_of_simultaneous_requests=2,
                 timeout_before_throttle_ms=0)
    items = [FetchItem(url=f"u{i}", response_time_ms=100) for i in range(4)]
    records, _ = run_schedule(items, opts)
    # two at t=0, then refill as each completes
    by_url = {r.url: r for r in records}
    assert by_url["u0"].request_start_ms == 0
    assert by_url["u1"].request_start_ms == 0
    assert by_url["u2"].request_start_ms == 100
    assert by_url["u3"].request_start_ms == 100


def test_salted_lattice_preserves_spacing():
    # two salted shards of one host, stride 2: shard 0 uses even slots,
    # shard 1 odd slots → merged starts are ≥ delay apart
    opts = RequestProcessorOptions(
        max_number_of_simultaneous_requests=1,
        delay_between_request_start_ms=100, delay_jitter_ms=0,
        timeout_before_throttle_ms=0)
    all_starts = []
    for offset in (0, 1):
        items = [FetchItem(url=f"s{offset}-u{i}", response_time_ms=5)
                 for i in range(3)]
        records, _ = run_schedule(items, opts, time_slot_stride=2,
                                  time_slot_offset=offset)
        all_starts.extend(r.request_start_ms for r in records)
    all_starts.sort()
    gaps = [b - a for a, b in zip(all_starts, all_starts[1:])]
    assert all(g >= 100 for g in gaps)
