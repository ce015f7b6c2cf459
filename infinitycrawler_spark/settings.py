"""Crawl settings — API-parity with the reference's configuration surface.

Reference: /root/reference/src/InfinityCrawler/CrawlSettings.cs:10-20 and
/root/reference/src/InfinityCrawler/Processing/Requests/RequestProcessorOptions.cs:9-37.

All durations are integer milliseconds (politeness arithmetic stays in
integer ms so runs are bit-reproducible; the reference uses TimeSpan).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace


@dataclass
class RequestProcessorOptions:
    """Mirrors RequestProcessorOptions.cs:9-37 (defaults identical)."""

    #: RequestProcessorOptions.cs:12 — parallel in-flight requests per host queue.
    max_number_of_simultaneous_requests: int = 10
    #: RequestProcessorOptions.cs:16 — base delay before each request start (ms).
    delay_between_request_start_ms: int = 1000
    #: RequestProcessorOptions.cs:20 — max random jitter added to the delay (ms).
    delay_jitter_ms: int = 1000
    #: RequestProcessorOptions.cs:24 — response time that triggers throttling (ms).
    timeout_before_throttle_ms: int = 2500
    #: RequestProcessorOptions.cs:28 — backoff added per throttle event (ms).
    throttling_request_backoff_ms: int = 5000
    #: RequestProcessorOptions.cs:32 — consecutive fast responses to step backoff down.
    min_sequential_successes_to_minimise_throttling: int = 5
    #: RequestProcessorOptions.cs:36 — per-request timeout (ms).
    request_timeout_ms: int = 30_000
    #: Deterministic jitter seed (reference uses an unseeded Random,
    #: DefaultRequestProcessor.cs:41; we seed per-URL for reproducibility).
    jitter_seed: int = 42

    def no_delay(self) -> "RequestProcessorOptions":
        """The tests' zero-delay profile (CrawlerTestBase.cs:19-28)."""
        return replace(
            self,
            delay_between_request_start_ms=0,
            delay_jitter_ms=0,
            timeout_before_throttle_ms=0,
        )


@dataclass
class CrawlSettings:
    """Mirrors CrawlSettings.cs:10-20 (defaults identical) plus the
    north-rule additions the reference lacks: max_depth and priority.
    """

    #: CrawlSettings.cs:12
    user_agent: str = "InfinityCrawler/spark (https://github.com/)"
    #: CrawlSettings.cs:13 — extra hosts allowed besides the seed host.
    #: None → only the base host (CrawlRunner.cs:140-152 semantics).
    host_aliases: list[str] | None = None
    #: CrawlSettings.cs:14 — NOTE reference semantics: this is the number of
    #: *total attempts*, not re-tries (CrawlRunner.cs:174 uses ==).
    number_of_retries: int = 3
    #: CrawlSettings.cs:15
    max_number_of_redirects: int = 3
    #: CrawlSettings.cs:16 — 0 disables the limit. The reference check is
    #: `expected == max` (CrawlRunner.cs:157), NOT >=; replicated.
    max_number_of_pages_to_crawl: int = 0
    #: North-rule addition: depth limit (0 disables). Reference tracks no depth.
    max_depth: int = 0
    #: North-rule addition: per-host priority (the reference's queue is
    #: FIFO only, DefaultRequestProcessor.cs:19). A SQL expression over
    #: the admitted-candidate columns (url, host, kind, depth, ...);
    #: higher values fetch earlier within a host's politeness round,
    #: ties keep FIFO (enqueue_seq) order. None → constant 0 (pure FIFO).
    priority_expr: str | None = None
    request_processor_options: RequestProcessorOptions = field(
        default_factory=RequestProcessorOptions
    )
    #: Replicate the reference crawl-delay units bug (Crawler.cs:88:
    #: `CrawlDelay ?? 0 * 1000` → robots *seconds* used as *milliseconds*).
    #: False → spec-correct seconds→ms conversion.
    bug_compatible_crawl_delay: bool = True
    #: Engine knobs (not in reference): partitioning / skew handling.
    n_host_shards: int = 32
    #: Hosts with more due URLs than this per round get salted into
    #: interleaved politeness lattices (SURVEY.md §4.1).
    skew_salt_threshold: int = 10_000
    skew_salt_factor: int = 4
    #: Replay mode: "round" = full BSP rounds (scale mode);
    #: "serialized" = one fetch per round, exact reference FIFO replay.
    replay_mode: str = "round"
    #: Guard rail for exact-order replay: exact_order sequences each
    #: round's admitted candidates through a SINGLE-partition global
    #: window (required for reference-identical enqueue numbering), which
    #: silently serializes at production scale. Admission refuses when
    #: one round admits more candidates than this; use exact_order=False
    #: (per-host FIFO, fully parallel) for large crawls, or raise the
    #: limit deliberately. 0 disables the guard.
    exact_order_max_candidates: int = 2_000_000
    #: With the Bloom pre-filter active, check the filter-positive
    #: "suspect" candidates against the seen set by BROADCASTING the
    #: suspects and scanning seen (two broadcast joins) instead of the
    #: default shuffled anti-join. Turns the per-round seen cost from
    #: shuffle O(|seen|) (sort + network for every seen row, every
    #: round) into a pure columnar scan — the right trade at 10^10-URL
    #: scale where seen dwarfs each round's suspects. Opt-in: the
    #: suspects (bloom true-hits + false positives) must fit in a
    #: broadcast (~executor memory); leave False when a round's
    #: candidate set can rival the seen set itself.
    seen_broadcast_suspects: bool = False
    #: Scale-mode incremental seen-set checkpointing: keep ``seen`` as a
    #: union of per-round checkpointed DELTA segments and only compact
    #: (full-table rewrite) every N rounds. Per-round state
    #: materialization drops from O(|seen|) to O(new urls this round) +
    #: amortized O(|seen|)/N; between compactions the seen side of
    #: admission scans ≤ N segments. 0 = off (full rewrite every round);
    #: ignored in precise/replay mode.
    seen_segment_rounds: int = 0
    #: Compact the append-only attempt/hop history unions (split-state
    #: tables — state/history.py) every N rounds: re-checkpoint the
    #: union so plan width and partition count stay bounded on long
    #: crawls. One linear pass, no shuffle; amortized O(|hist|/N) per
    #: round. 0 = never compact (fine for short crawls).
    history_compact_rounds: int = 64
    #: Validate image payloads (decode + PSNR + phash + caption) during parse.
    validate_payload: bool = True
