"""Deterministic per-host politeness scheduler (AIMD throttling).

A discrete-event re-creation of the reference's request-processing loop
(/root/reference/src/InfinityCrawler/Processing/Requests/DefaultRequestProcessor.cs:34-135):

- FIFO dequeue, launching up to ``max_number_of_simultaneous_requests``
  in-flight requests (:48-90);
- per-request start delay = base delay (+ jitter when base > 0) +
  current backoff, read at launch time (:58-66);
- AIMD throttle after each completion (:112-130): slow response
  (elapsed > timeout_before_throttle) → backoff += step, success streak
  reset; otherwise, while backoff > 0, after
  ``min_sequential_successes_to_minimise_throttling`` consecutive fast
  responses → backoff -= step (floor 0), streak reset;
- request timeout → error result with elapsed == timeout (:149-197).

The golden contract: under the serialized configuration of the
reference's ThrottlingTest
(/root/reference/tests/InfinityCrawler.Tests/DefaultRequestProcessorTests.cs:18-69)
the start-delay sequence is exactly [0,0,0,100,200,200,100,100,0].

Time is *virtual* integer-ish milliseconds: in the sandbox the network
is a table, so response latency is data (``delay_ms``) and the schedule
is computed, not slept. The same schedule drives real fetchers by
sleeping until each computed start time.

This module is pure Python/numpy so the identical code runs in unit
tests, in the golden interpreter, and inside the per-host-shard
``applyInPandas`` fetch operator.
"""

from __future__ import annotations

import heapq
from collections import deque
from dataclasses import dataclass, field

from infinitycrawler_spark.functions.hashing import rng_for
from infinitycrawler_spark.settings import RequestProcessorOptions


@dataclass
class FetchItem:
    """One due frontier row: the simulated server behavior comes from the
    synthetic web table (missing page → transport error)."""

    url: str
    response_time_ms: float = 0.0
    available: bool = True  # False → transport error (connection refused)


@dataclass
class FetchRecord:
    url: str
    launch_seq: int
    start_delay_ms: float
    request_start_ms: float
    elapsed_ms: float
    completed_at_ms: float
    completion_seq: int = -1
    timed_out: bool = False
    error: str | None = None


@dataclass
class HostSchedulerState:
    """Per-host politeness state carried across rounds in ``host_state``."""

    current_backoff_ms: int = 0
    successes_since_throttle: int = 0
    request_count: int = 0
    clock_ms: float = 0.0


def run_schedule(
    items: list[FetchItem],
    options: RequestProcessorOptions,
    state: HostSchedulerState | None = None,
    time_slot_stride: int = 1,
    time_slot_offset: int = 0,
) -> tuple[list[FetchRecord], HostSchedulerState]:
    """Simulate one politeness round over ``items`` (already in enqueue
    order). Returns per-request records in completion order plus the
    carried-over scheduler state.

    ``time_slot_stride``/``offset`` implement the salted-skew lattice
    (SURVEY.md §4.1): a salted shard *i* of *k* only starts requests at
    times ≡ offset (mod stride·delay), preserving global per-host
    politeness spacing when one hot host is split across k shards.
    """
    state = state or HostSchedulerState()
    queue = deque(items)
    active: list[tuple[float, int, FetchItem, FetchRecord]] = []
    records: list[FetchRecord] = []
    t = state.clock_ms
    completion_seq = 0

    base_delay = options.delay_between_request_start_ms
    jitter = options.delay_jitter_ms
    throttle_at = options.timeout_before_throttle_ms
    step = options.throttling_request_backoff_ms
    min_successes = options.min_sequential_successes_to_minimise_throttling
    timeout = options.request_timeout_ms

    while queue or active:
        while queue and len(active) < options.max_number_of_simultaneous_requests:
            item = queue.popleft()
            start_delay = 0.0
            if base_delay > 0:
                start_delay = float(base_delay)
                if jitter > 0:
                    rng = rng_for(options.jitter_seed, item.url, state.request_count)
                    start_delay += float(rng.random()) * jitter
            start_delay += state.current_backoff_ms
            start = t + start_delay
            if time_slot_stride > 1 and base_delay > 0:
                # snap to this salted shard's lattice slot
                grid = base_delay * time_slot_stride
                slot = time_slot_offset * base_delay
                start = ((start - slot + grid - 1) // grid) * grid + slot
                start_delay = start - t
            if not item.available:
                elapsed = 0.0
                error = "ConnectionError"
                timed_out = False
            elif item.response_time_ms >= timeout:
                elapsed = float(timeout)
                error = "Timeout"
                timed_out = True
            else:
                elapsed = float(item.response_time_ms)
                error = None
                timed_out = False
            record = FetchRecord(
                url=item.url,
                launch_seq=state.request_count,
                start_delay_ms=start_delay,
                request_start_ms=start,
                elapsed_ms=elapsed,
                completed_at_ms=start + elapsed,
                timed_out=timed_out,
                error=error,
            )
            state.request_count += 1
            heapq.heappush(active, (record.completed_at_ms, record.launch_seq, item, record))

        # WhenAny: advance to the earliest completion, then drain every
        # request completed by that instant in completion order.
        earliest = active[0][0]
        t = max(t, earliest)
        while active and active[0][0] <= t:
            _, _, item, record = heapq.heappop(active)
            record.completion_seq = completion_seq
            completion_seq += 1
            records.append(record)
            # throttle bookkeeping (DefaultRequestProcessor.cs:112-130)
            if throttle_at > 0 and record.elapsed_ms > throttle_at:
                state.successes_since_throttle = 0
                state.current_backoff_ms += step
            elif state.current_backoff_ms > 0:
                state.successes_since_throttle += 1
                if state.successes_since_throttle == min_successes:
                    state.current_backoff_ms = max(0, state.current_backoff_ms - step)
                    state.successes_since_throttle = 0

    state.clock_ms = t
    return records, state
