"""CrawlJob — the BSP round loop (generate → fetch → parse → expand →
update), the Spark-first shape of Crawler.Crawl + CrawlRunner.ProcessAsync
(/root/reference/src/InfinityCrawler/Crawler.cs:39-79,
Internal/CrawlRunner.cs:221-300; SURVEY.md §3.1).

Equivalence to the reference's FIFO loop: a FIFO queue processed
one-at-a-time yields exactly breadth-first rounds whose per-round
candidate order is (parent enqueue position, child position) — so the
full-round BSP enqueue sequence equals the reference's serialized
enqueue sequence, and the budget/seen folds replay identically (the
quantity ``results + pending`` is conserved across fetch completions).
Tests assert this against the golden interpreter per fixture.

Each round commits every state table to the SnapshotStore (atomic
manifest), which gives exact resume and truncates Spark lineage.
"""

from __future__ import annotations

import os
import tempfile
import time
from dataclasses import dataclass, field, replace

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from infinitycrawler_spark import schemas
from infinitycrawler_spark.functions.robots import RobotsFile, merged_crawl_delay_ms
from infinitycrawler_spark.functions.urls import (
    canonicalize,
    host_of,
    resolve_href,
    scheme_of,
    strip_fragment,
)
from infinitycrawler_spark.operators.admission import REDIRECT_CODES, admit
from infinitycrawler_spark.operators.fetch import fetch_round, split_attempts
from infinitycrawler_spark.operators.parse import parse_round
from infinitycrawler_spark.settings import CrawlSettings
from infinitycrawler_spark.state.history import gather_attempts, gather_hops
from infinitycrawler_spark.state.store import SnapshotStore

_FRAG = "#.*$"


class CrawlCancelled(RuntimeError):
    """Raised when cancel() interrupts an in-flight round's Spark job.
    The last committed snapshot is intact — run(resume=True) on a fresh
    CrawlJob over the same store_root continues exactly."""


@dataclass
class _LoopCtx:
    """Mutable bookkeeping shared between the loop drivers and the
    round builder (the precise path updates counts mid-build)."""

    round_no: int
    seq_base: int
    results_total: int
    enqueue_log: list[str]
    metrics: list[dict]


@dataclass
class CrawlOutput:
    results: DataFrame
    seen: DataFrame
    metrics: list[dict]
    enqueue_log: list[str]
    rounds: int
    elapsed_s: float
    store_root: str
    lineage: DataFrame | None = None


@dataclass
class CrawlJob:
    spark: SparkSession
    pages: DataFrame                      # CRAWL_PAGES
    robots_map: dict[str, RobotsFile]
    sitemap_urls: list[str] | DataFrame
    seed_uri: str
    settings: CrawlSettings = field(default_factory=CrawlSettings)
    store_root: str | None = None
    per_host_robots: bool = False
    exact_order: bool = True
    collect_enqueue_log: bool = True
    snapshot_every: int = 3               # parquet-commit cadence (rounds)
    #: keep only the newest N versions' full-state tables (0 = keep all).
    #: Expired versions keep their manifests + append-only results/lineage
    #: deltas (reads unchanged) but stop being resume points — Iceberg
    #: expire_snapshots semantics (state/store.py). On a long crawl this
    #: bounds store size at O(keep · state + total deltas).
    keep_snapshots: int = 0
    eager_checkpoint: bool = True         # materialize round state eagerly
    use_bloom: bool = True                # Bloom pre-filter for the seen set
    #: per-BUCKET capacity of the sharded seen-Bloom (state/bloom_store);
    #: total capacity = bloom_capacity × bloom_buckets. At a 10^10-URL
    #: frontier raise bloom_buckets (blobs stay broadcast-free — they
    #: live on the store filesystem and load per bucket on executors).
    bloom_capacity: int = 2_000_000
    bloom_buckets: int = 32
    #: the Bloom pre-filter only PRUNES work once the seen table is big
    #: enough that the exact anti-join shuffle dominates; below this
    #: count the check/update machinery is pure overhead (measured ~20%
    #: of crawl wall at 10^6 URLs), so it stays off — the anti-join is
    #: always exact either way. Crossing the threshold triggers a one-
    #: time distributed rebuild from the seen table, then per-round
    #: incremental folds. Set 0 to force the Bloom path (tests do).
    bloom_min_seen: int = 4_000_000
    #: hash-partition pages by url once so the per-round fetch/parse
    #: joins never re-shuffle the payload bytes (pages side satisfies
    #: the join's HashPartitioning requirement; only the small attempt
    #: side exchanges)
    copartition_pages: bool = True
    #: storage level for the co-partitioned pages cache. None = Spark's
    #: DataFrame default (MEMORY_AND_DESERIALIZED). "DISK_ONLY" keeps
    #: the cache as serialized columnar batches in spark.local.dir —
    #: on multi-executor clusters a remote executor then streams the
    #: bytes (zero-copy netty file region) instead of the block owner
    #: re-serializing an in-heap block per request, and with
    #: spark.local.dir on tmpfs the local-read penalty is small
    pages_storage_level: str | None = None
    #: per-host lineage deltas (round, host, fetched, links, enqueued)
    collect_lineage: bool = True
    #: fetch the base host's robots.txt from the crawl table at startup
    #: (Crawler.cs:49) instead of requiring a caller-supplied robots_map
    #: entry; needs a ``body`` column on pages
    fetch_robots: bool = False
    #: sitemap.xml discovery (Crawler.cs:56-62): robots ``Sitemap:``
    #: directives + the /sitemap.xml default, sitemap indexes followed,
    #: entry URLs appended to ``sitemap_urls`` as round-0 seeds
    discover_sitemaps: bool = False
    #: pluggable processor seam (CrawlSettings.cs:18-19 —
    #: IRequestProcessor / IContentProcessor). ``request_processor``
    #: takes (due, pages_meta, host_state, options, skew_salt_threshold=,
    #: skew_salt_factor=, hot_hosts=) and returns ATTEMPT-schema rows
    #: (+ optional payload columns, e.g. the real-HTTP variant's body);
    #: ``content_processor`` takes (success_attempts, pages_content,
    #: settings) and returns PARSED. None → the synthetic-table pair
    #: (operators.fetch.fetch_round / operators.parse.parse_round).
    request_processor: object | None = None
    content_processor: object | None = None
    #: robots-as-data: a ROBOTS_RULES DataFrame (host, user_agent,
    #: allow, disallow, crawl_delay_s). When set it replaces robots_map
    #: for admission gating — per-host rules broadcast-joined by host,
    #: so host count is unbounded (a driver dict is not). robots_map
    #: still supplies the base host's crawl-delay merge if present.
    robots_rules: DataFrame | None = None
    #: Topology-aware checkpoint-handle scheduling (scale mode only).
    #: Creating a localCheckpoint handle runs `toRdd`, and any
    #: BroadcastHashJoin in the plan executes its BUILD SIDE right
    #: there — the split-history plans carry broadcasts whose build
    #: sides chain through the round's own fetch. True = defer those
    #: handles (hop segment, results delta) to the action thread so the
    #: driver-serial build phase never runs executor work — measured
    #: +30-40% 4-executor cluster throughput (the driver would
    #: otherwise stall N executors per round). False = create them at
    #: build — the build-phase execution then prefetches the next
    #: round's chains inline. None = auto: defer everywhere. (Round 5
    #: measured inline ~20% better on local[16]; round 6 re-measured on
    #: local[32] at sf1.0 with 4 interleaved pairs and deferral now wins
    #: every pair — median 36.8 s vs 41.4 s — because the speculative
    #: next-round build is the round critical path and deferral cuts it
    #: from 8-12 s to ~2 s, including the always-discarded final-round
    #: build. The auto default therefore defers on local too.)
    defer_heavy_checkpoints: bool | None = None

    def __post_init__(self):
        import threading

        from infinitycrawler_spark.operators.parse import content_cols
        from infinitycrawler_spark.session import ship_package
        from infinitycrawler_spark.state.bloom_store import BloomShardStore

        #: O24 cancellation (DefaultRequestProcessor.cs:50,54,94 token):
        #: cancel() from any thread stops the loop at the next round
        #: boundary and cancels the in-flight Spark job group; the last
        #: committed snapshot stays valid, so run(resume=True) continues.
        self._cancel_evt = threading.Event()
        # scopes the executor-side compiled-robots-matcher cache to this
        # job (rules are immutable within a job; a later job reusing a
        # host name with different rules must not hit stale matchers)
        import uuid

        self._robots_epoch = uuid.uuid4().hex

        ship_package(self.spark)  # executors must import this package
        if self.store_root is None:
            self.store_root = tempfile.mkdtemp(prefix="crawl_state_")
        self.store = SnapshotStore(self.store_root)
        self.base_host = host_of(self.seed_uri)
        self._pending_deltas: list[DataFrame] = []
        self._pending_lineage: list[DataFrame] = []
        # append-only history segments awaiting their next parquet commit
        self._pending_att: list[DataFrame] = []
        self._pending_hops: list[DataFrame] = []
        self._deferred_unpersist: list[DataFrame] = []
        self._next_frontier_count: int | None = None
        self._next_hot_hosts: set[str] | None = None
        if self.defer_heavy_checkpoints is None:
            self._defer_ckpt = True
        else:
            self._defer_ckpt = bool(self.defer_heavy_checkpoints)
        self._n_seen = 0
        self._n_parts = int(self.spark.conf.get("spark.sql.shuffle.partitions", "32"))
        # scale ceiling for the adaptive per-round partitioning (guide
        # §2: derive parallelism from input size, conf as the cluster-
        # scale cap); _n_parts itself is adapted per round in scale mode
        self._n_parts_cap = self._n_parts
        self._n_pages: int | None = None
        self._bloom_store = (
            BloomShardStore(self.store_root, n_buckets=self.bloom_buckets,
                            capacity_per_bucket=self.bloom_capacity)
            if self.use_bloom else None)
        self._has_body = "body" in self.pages.columns
        # host-scope table, built once: big alias sets via broadcast
        # semi-join instead of a per-round |hosts|-literal isin()
        hosts = ({self.base_host, *self.settings.host_aliases}
                 if self.settings.host_aliases is not None else None)
        self._scope_hosts = (
            self.spark.createDataFrame([(h,) for h in sorted(hosts)],
                                       "host string")
            if hosts is not None and len(hosts) > 64 else None)
        if self.copartition_pages:
            # persist only the columns the engine reads: the payload
            # (~95% of table bytes) is dropped when validation is off
            needed = list(dict.fromkeys(
                [*schemas.PAGES_META_COLS,
                 *content_cols(self.settings.validate_payload,
                               has_body=self._has_body,
                               has_encoding="content_encoding"
                               in self.pages.columns)]))
            repart = self.pages.select(*needed).repartition(
                self._n_parts, "url")
            if self.pages_storage_level:
                from pyspark import StorageLevel
                self.pages = repart.persist(
                    getattr(StorageLevel, self.pages_storage_level))
            else:
                self.pages = repart.persist()
            # materialize the partitioned pages NOW: ingest partitioning
            # is a one-time cost (amortized over the whole crawl), and
            # leaving the persist lazy would otherwise charge the full
            # payload shuffle to round 0's first action
            self._n_pages = self.pages.count()
        if self.fetch_robots or self.discover_sitemaps:
            self._discover()

    def _round_stats(
        self, attempt_rows: DataFrame, frontier_next: DataFrame,
        seen_add: DataFrame | None, hot_threshold: int,
        materialize: tuple[DataFrame, ...] = (),
    ) -> tuple[int, float, int, int, int, int | None, set[str], int,
               dict[int, int]]:
        """ONE action for every remaining per-round statistic: attempt
        metrics (fetched/wait/errors/retries) + frontier stats (count,
        max enqueue_seq, next round's hot hosts) + new-seen count. Runs
        AFTER the delta action so every input is already cached — this
        is a cheap narrow aggregation that also materializes the
        frontier checkpoint. ``materialize`` takes further lazily
        checkpointed state tables (seen/states/host_state) to fold into
        the same pass as count-only rows: leaving them unmaterialized
        would carry each round's full lineage into the next round's
        plans, and Catalyst planning time — pure driver-serial — then
        compounds per round (measured as multi-second driver gaps before
        each round and a >10 s gap at the final commit).
        ``attempt_rows=None`` (pre-loop use) skips the attempt metrics.
        → (n_fetched, wait_ms, n_err, n_retry, n_next, max_seq, hot,
        n_seen_add, {materialize_index: row_count})."""
        def _tag(df: DataFrame, t: str) -> DataFrame:
            # count-only rows: one selectExpr call per table (py4j cost)
            return df.selectExpr(
                f"'{t}' as t", "cast(null as string) as h",
                "cast(null as double) as w", "cast(0 as long) as e",
                "cast(0 as long) as r", "cast(null as long) as q")

        fr = frontier_next.selectExpr(
            "'f' as t", "host as h", "cast(null as double) as w",
            "cast(0 as long) as e", "cast(0 as long) as r",
            "cast(enqueue_seq as long) as q")
        if attempt_rows is not None:
            att = attempt_rows.selectExpr(
                "'a' as t", "cast(null as string) as h",
                "cast(start_delay_ms as double) as w",
                "cast(error is not null as long) as e",
                "cast(error is not null"
                " or status_code between 500 and 599 as long) as r",
                "cast(null as long) as q")
            src = att.unionByName(fr)
        else:
            src = fr
        if seen_add is not None:
            src = src.unionByName(_tag(seen_add, "s"))
        for i, df in enumerate(materialize):
            src = src.unionByName(_tag(df, f"m{i}"))
        agg = (src.rollup("t", "h")
               .agg(F.count("*").alias("n"), F.sum("w").alias("sw"),
                    F.sum("e").alias("se"), F.sum("r").alias("sr"),
                    F.max("q").alias("mq")))
        hot_pred = (F.col("t") == "f") & (F.col("n") > F.lit(hot_threshold))
        agg = agg.filter(F.col("t").isNotNull()
                         & (F.col("h").isNull()
                            | (hot_pred if hot_threshold > 0 else F.lit(False))))
        n_fetched, wait_ms, n_err, n_retry = 0, 0.0, 0, 0
        n_next, max_seq, hot, n_seen_add = 0, None, set(), 0
        extra: dict[int, int] = {}
        for row in agg.collect():
            if row.h is not None:
                hot.add(row.h)
            elif row.t == "a":
                n_fetched, wait_ms = int(row.n), float(row.sw or 0.0)
                n_err, n_retry = int(row.se or 0), int(row.sr or 0)
            elif row.t == "f":
                n_next, max_seq = int(row.n), row.mq
            elif row.t == "s":
                n_seen_add = int(row.n)
            elif row.t.startswith("m"):
                extra[int(row.t[1:])] = int(row.n)
        return (n_fetched, wait_ms, n_err, n_retry, n_next, max_seq, hot,
                n_seen_add, extra)

    # ------------------------------------------------------------ setup
    def _empty(self, schema) -> DataFrame:
        return self.spark.createDataFrame([], schema=schema)

    def _page_body(self, url: str) -> bytes | None:
        """Driver-side single-row body lookup against the crawl table.
        Used ONLY for per-crawl-bounded discovery fetches (one robots.txt
        + a handful of sitemap files), never per-URL."""
        if not self._has_body:
            return None
        cu = canonicalize(url)
        rows = (self.pages.filter(F.col("url") == cu)
                .select("body", "status_code").take(1))
        if not rows or rows[0].status_code != 200 or rows[0].body is None:
            return None
        return bytes(rows[0].body)

    def _discover(self) -> None:
        """Startup discovery, mirroring Crawler.Crawl's sequence
        (Crawler.cs:49-62): fetch the base authority's robots.txt, then
        walk its ``Sitemap:`` directives + the /sitemap.xml default and
        append every entry location to the round-0 seed list."""
        from infinitycrawler_spark.functions.robots import parse_robots_txt
        from infinitycrawler_spark.functions.sitemaps import discover_sitemap_urls

        scheme = scheme_of(self.seed_uri) or "http"
        robots_text: str | None = None
        body = self._page_body(f"{scheme}://{self.base_host}/robots.txt")
        if body is not None:
            robots_text = body.decode("utf-8", errors="replace")
        if self.fetch_robots and robots_text is not None:
            # caller-supplied entries win (pre-parsed robots take priority)
            self.robots_map = dict(self.robots_map)
            self.robots_map.setdefault(
                self.base_host, parse_robots_txt(robots_text))
        if self.discover_sitemaps:
            found = discover_sitemap_urls(
                self._page_body, self.base_host, scheme=scheme,
                robots_text=robots_text)
            if found and isinstance(self.sitemap_urls, DataFrame):
                found_df = self.spark.createDataFrame(
                    [(u,) for u in found], schema="url string")
                self.sitemap_urls = self.sitemap_urls.select("url").unionByName(found_df)
            elif found:
                self.sitemap_urls = [*self.sitemap_urls, *found]

    def _seed_candidates(self) -> DataFrame:
        # authority (host:port), not bare hostname — GetLeftPart keeps
        # the port (Crawler.cs:48); scope/robots still match by hostname
        from infinitycrawler_spark.functions.urls import authority_of

        root = canonicalize(
            f"{scheme_of(self.seed_uri)}://{authority_of(self.seed_uri)}/")
        if isinstance(self.sitemap_urls, DataFrame):
            # scale path: seeds stay distributed (a driver-side list of
            # 10^7+ urls would serialize through createDataFrame)
            w = (Window.orderBy("url") if self.exact_order
                 else Window.partitionBy("host").orderBy("url"))
            seeds = (self.sitemap_urls
                     .select(F.regexp_replace("url", _FRAG, "").alias("url"))
                     .distinct()
                     .withColumn("host", F.lower(F.parse_url("url", F.lit("HOST"))))
                     .select(
                         "url", "host", F.lit("seed").alias("kind"),
                         F.lit(-1).cast("long").alias("parent_seq"),
                         F.row_number().over(w).alias("child_pos"),
                         F.lit(0).alias("depth"),
                         F.lit(False).alias("skip_budget"),
                         F.lit(None).cast("array<string>").alias("moved_chain")))
            root_row = self.spark.createDataFrame(
                [(strip_fragment(root), self.base_host, "seed", -1, 0, 0, False, None)],
                schema=schemas.CANDIDATES)
            return root_row.unionByName(seeds)
        urls = [strip_fragment(root)]
        # sitemap urls: Distinct() preserving order (Crawler.cs:58)
        for u in dict.fromkeys(self.sitemap_urls):
            cu = strip_fragment(canonicalize(u) or "")
            if cu:
                urls.append(cu)
        rows = [
            (u, host_of(u) or "", "seed", -1, i, 0, False, None)
            for i, u in enumerate(urls)
        ]
        return self.spark.createDataFrame(rows, schema=schemas.CANDIDATES)

    def _merged_options(self):
        opts = self.settings.request_processor_options
        robots = self.robots_map.get(self.base_host)
        delay_s = robots.crawl_delay_for(self.settings.user_agent) if robots else None
        if robots is None and self.robots_rules is not None:
            # robots-as-data: the base host's crawl-delay comes from its
            # selected group row (one driver-side take, once per crawl)
            from infinitycrawler_spark.operators.admission import select_robots_group

            row = (select_robots_group(self.robots_rules, self.settings.user_agent)
                   .filter(F.col("host") == self.base_host)
                   .select("crawl_delay_s").take(1))
            delay_s = row[0].crawl_delay_s if row else None
        merged = merged_crawl_delay_ms(
            delay_s, opts.delay_between_request_start_ms,
            bug_compatible=self.settings.bug_compatible_crawl_delay)
        return replace(opts, delay_between_request_start_ms=merged)

    # ------------------------------------------------------------- run
    def cancel(self) -> None:
        """O24: stop the crawl. Graceful at the next round boundary; if
        a round's job is in flight its job group is cancelled and run()
        raises CrawlCancelled (snapshot stays valid for exact resume)."""
        self._cancel_evt.set()
        try:
            self.spark.sparkContext.cancelJobGroup(self._job_group)
        except Exception:
            pass  # no job in flight / context gone — boundary check stops us

    def run(self, extra_queue_urls: list[str] | None = None,
            max_rounds: int | None = None, resume: bool = False) -> CrawlOutput:
        if self.settings.replay_mode == "serialized" and not self.exact_order:
            # per-host windows make enqueue_seq non-unique across hosts,
            # which would break the serialized dequeue's anti-join
            raise ValueError(
                "replay_mode='serialized' requires exact_order=True")
        spark = self.spark
        self._job_group = f"crawljob-{id(self)}"
        spark.sparkContext.setJobGroup(self._job_group,
                                       "crawl round loop",
                                       interruptOnCancel=True)
        # AQE off for the round loop (restored after): its per-query-stage
        # re-planning triples the driver job count (95 vs ~30 jobs per
        # 3-round crawl) — pure serial overhead here, where shuffle
        # partitions are already sized to the parallelism and skew is
        # handled by explicit salting in fetch_round. Measured medians
        # of 3 at local[16], 490k URLs: 72.3 s (off) vs 82.8 s (on).
        prev_aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        # Catalyst constraint propagation is quadratic in plan size and
        # re-runs per action; the round plans are join/filter-heavy, so
        # it dominates the per-round driver gap (planning is pure serial
        # time). Inference only adds redundant IsNotNull/filter hints
        # here — predicates are already explicit in the plans.
        prev_cp = spark.conf.get(
            "spark.sql.constraintPropagation.enabled", "true")
        spark.conf.set("spark.sql.constraintPropagation.enabled",
                       os.environ.get("SPARK_GRAFT_CONSTRAINT", "false"))
        # Whole-stage codegen OFF for the round loop (restored after):
        # every round produces fresh plans (round literals change the
        # generated source), so each action Janino-compiles ~20 stages
        # on the driver before any task launches — measured as ~5 s
        # driver-only gaps per round. Interpreted mode costs more per
        # JVM row, but the heavy row work here is in Arrow UDFs which
        # codegen can't help. Medians at local[16], 490k URLs: 56 s
        # (off) vs 82 s (on).
        prev_cg = spark.conf.get("spark.sql.codegen.wholeStage", "true")
        spark.conf.set("spark.sql.codegen.wholeStage",
                       os.environ.get("SPARK_GRAFT_CODEGEN", "false"))
        # the scale loop adapts spark.sql.shuffle.partitions per round
        # (_set_round_parts); remember the caller's value to restore
        prev_sp = spark.conf.get("spark.sql.shuffle.partitions", "32")
        try:
            return self._run(extra_queue_urls, max_rounds, resume)
        except CrawlCancelled:
            raise
        except Exception as exc:
            if self._cancel_evt.is_set():
                raise CrawlCancelled(
                    f"crawl cancelled mid-round; resume from {self.store_root}"
                ) from exc
            raise
        finally:
            # a cancelled/failed run must not leave the commit thread
            # writing a snapshot behind the caller's back
            try:
                self._join_commits()
            except Exception:
                pass  # the loop's own error (if any) is already in flight
            pool = getattr(self, "_commit_pool", None)
            if pool is not None:
                pool.shutdown(wait=True)
                del self._commit_pool
            spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
            spark.conf.set("spark.sql.constraintPropagation.enabled", prev_cp)
            spark.conf.set("spark.sql.codegen.wholeStage", prev_cg)
            spark.conf.set("spark.sql.shuffle.partitions", prev_sp)
            self._n_parts = self._n_parts_cap
            spark.sparkContext.setJobGroup("", "")

    def _run(self, extra_queue_urls: list[str] | None = None,
             max_rounds: int | None = None, resume: bool = False) -> CrawlOutput:
        spark = self.spark
        t0 = time.time()
        # persisted-RDD ids that predate this run (the caller's and the
        # job's own pages cache): everything registered AFTER this point
        # is run-scoped and released on the success path (see return)
        self._persists_at_entry = self._persistent_rdd_ids()
        self._next_frontier_count = None
        self._next_hot_hosts = None
        settings = self.settings
        opts = self._merged_options()
        pages_meta = self.pages.select(*schemas.PAGES_META_COLS)
        metrics: list[dict] = []
        enqueue_log: list[str] = []

        if resume and (manifest := self.store.latest_manifest()):
            v = manifest["version"]
            frontier = self._migrate(
                self.store.read_table(spark, v, "frontier"),
                {"priority": "cast(0 as int)"})
            seen = self.store.read_table(spark, v, "seen")
            stored_states = self.store.read_table(spark, v, "states")
            if "att_log" in stored_states.columns:
                # legacy snapshot (pre-split history): explode the
                # per-row log arrays into the append-only tables once,
                # and stage them as pending deltas so the next commit
                # persists the migrated history for future resumes
                att_hist = (stored_states
                            .select("url", F.posexplode_outer("att_log")
                                    .alias("pos", "a"))
                            .filter("a is not null")
                            .selectExpr("url",
                                        "cast(pos + 1 as int) as attempt_no",
                                        "a.start_ms as start_ms",
                                        "a.elapsed_ms as elapsed_ms",
                                        "a.status_code as status_code",
                                        "a.is_success as is_success"))
                hop_hist = (stored_states
                            .select("url", F.posexplode_outer("hop_logs")
                                    .alias("pos", "h"))
                            .filter("h is not null")
                            .selectExpr("url",
                                        "cast(pos + 1 as int) as hop_seq",
                                        "h.location as location",
                                        "h.attempts as attempts"))
                states = stored_states.drop("att_log", "hop_logs")
                self._pending_att.append(att_hist)
                self._pending_hops.append(hop_hist)
            else:
                states = stored_states
                att_hist = (self.store.read_deltas(spark, v, "attempts")
                            or self._empty(schemas.ATT_ROWS))
                hop_hist = (self.store.read_deltas(spark, v, "hops")
                            or self._empty(schemas.HOP_ROWS))
            host_state = self.store.read_table(spark, v, "host_state")
            if self.use_bloom:
                # blobs may lead the snapshot (safe: superset) but a
                # rebuild restores the exact superset-of-seen invariant
                self._n_seen = seen.count()
                if self._n_seen >= self.bloom_min_seen:
                    self._bloom_store.rebuild(seen)
            meta = manifest["meta"]
            round_no = meta["round"] + 1
            seq_base = meta["seq_base"]
            results_total = meta["results_total"]
            enqueue_log = list(meta.get("enqueue_log", []))
        else:
            seen = self._empty(schemas.SEEN)
            states = self._empty(schemas.STATES_LIVE)
            att_hist = self._empty(schemas.ATT_ROWS)
            hop_hist = self._empty(schemas.HOP_ROWS)
            host_state = self._empty(schemas.HOST_STATE)
            results_total = 0
            round_no = 0
            # must match the loop drivers' precise predicate below —
            # serialized replay takes the sequential round-0 path too
            precise = (settings.max_number_of_pages_to_crawl > 0
                       or self.exact_order
                       or settings.replay_mode == "serialized")
            if not precise:
                # scale-adaptive partitioning for the pre-loop admission
                # (guide §2: parallelism from input size; the conf stays
                # the cluster-scale CEILING). |pages| bounds the seed
                # set, so it sizes the round-0 exchanges; per-round
                # sizes take over inside the loop. Perf-only: partition
                # counts never change any output.
                self._set_round_parts(self._adaptive_parts(
                    self._n_pages, target=8000))
            # round-0 admission: seed + sitemap candidates
            adm = admit(self._seed_candidates(), seen, states, self.robots_map,
                        settings, self.base_host, budget_base=0, seq_base=0,
                        round_no=0, per_host_robots=self.per_host_robots,
                        exact_order=self.exact_order,
                        lazy_counts=not precise,
                        robots_rules=self.robots_rules,
                        scope_hosts=self._scope_hosts,
                        robots_epoch=self._robots_epoch,
                        att_hist=att_hist, hop_hist=hop_hist)
            frontier = adm.frontier_add
            seen = adm.seen_add
            results0 = adm.results.cache()
            if precise:
                if self.use_bloom:
                    self._n_seen = seen.count()
                seq_base = adm.n_enqueued
                n_res0 = results0.count()
            else:
                # scale mode: ONE fused action replaces the four separate
                # pre-loop counts (admit's two, the bloom seen count, the
                # results count) and also precomputes round 0's frontier
                # size + hot-host set, so the loop skips its initial
                # _frontier_stats action too. The frontier/seen
                # checkpoints materialize inside the same pass, so the
                # loop starts from in-memory state and the initial
                # snapshot write can happen off the critical path.
                np0 = self._n_parts
                frontier = frontier.coalesce(np0).localCheckpoint(eager=False)
                seen = seen.coalesce(np0).localCheckpoint(eager=False)
                hot_thr0 = settings.skew_salt_threshold
                (_, _, _, _, n_next0, max_seq0, hot0, n_seen0,
                 extra0) = self._round_stats(
                    None, frontier, seen, hot_thr0, materialize=(results0,))
                if self.use_bloom:
                    self._n_seen = n_seen0
                seq_base = int(max_seq0) if max_seq0 is not None else 0
                n_res0 = extra0.get(0, 0)
                self._next_frontier_count = n_next0
                self._next_hot_hosts = hot0
            if self.use_bloom and self._n_seen >= self.bloom_min_seen:
                self._bloom_store.update(seen)
            results_total += n_res0
            if self.collect_enqueue_log:
                enqueue_log.extend(
                    r.url for r in frontier.orderBy("enqueue_seq").collect())
            if extra_queue_urls:
                # processor.Add bypasses admission and the seen set
                # (BasicSiteTests.cs:185-188)
                rows = []
                for i, u in enumerate(extra_queue_urls):
                    cu = canonicalize(u) or u
                    rows.append((cu, host_of(cu) or "", 0,  # url_key filled below
                                 seq_base + 1 + i, 0, 0, 0))
                extra = (spark.createDataFrame(rows, schema=schemas.FRONTIER)
                         .withColumn("url_key", F.xxhash64("url")))
                frontier = frontier.unionByName(extra)
                seq_base += len(rows)
                if self.collect_enqueue_log:
                    enqueue_log.extend(r[0] for r in rows)
                # scale mode precomputed round 0's frontier stats BEFORE
                # the extras joined the frontier: patch the count (an
                # empty-seed crawl would otherwise break the loop with
                # the extras committed but never crawled) and drop the
                # precomputed hot set — round 0 recomputes it, so hosts
                # made hot by the extras still get salted
                if self._next_frontier_count is not None:
                    if settings.skew_salt_threshold > 0 and not self.exact_order:
                        # extras can push an existing host over the salt
                        # threshold — recompute the stats for round 0
                        self._next_hot_hosts = None
                        self._next_frontier_count = None
                    else:
                        self._next_frontier_count += len(rows)
            if precise:
                self._commit(0 - 1, frontier, seen, states, host_state,
                             results0, round_no - 1, seq_base, results_total,
                             enqueue_log, initial=True)
                frontier, seen, states, host_state = self._reload()
                if adm.cached is not None:
                    # seed-candidate cache: outputs are on parquet now
                    adm.cached.unpersist()
            else:
                # scale mode: the loop runs from the checkpointed
                # in-memory state (materialized by the fused stats pass
                # above) — the initial snapshot is pure durability and
                # its parquet write overlaps round 0's executor work
                # seed-candidate cache freed now: frontier/seen are
                # checkpoint-materialized and results0's own cache was
                # filled by the fused stats pass, so nothing re-reads it
                unp = ((results0, adm.cached) if adm.cached is not None
                       else (results0,))
                self._commit_async(
                    0 - 1, frontier, seen, states, host_state,
                    results0, round_no - 1, seq_base, results_total,
                    list(enqueue_log), initial=True,
                    unpersist_after=unp)

        # ---------------- fixpoint rounds ----------------
        hot_thr = (0 if self.exact_order else settings.skew_salt_threshold)
        # serialized replay needs the per-round carried-count bookkeeping
        # of the sequential driver regardless of ordering flags
        precise = (settings.max_number_of_pages_to_crawl > 0
                   or self.exact_order
                   or settings.replay_mode == "serialized")
        ctx = _LoopCtx(round_no=round_no, seq_base=seq_base,
                       results_total=results_total,
                       enqueue_log=enqueue_log, metrics=metrics)
        if precise:
            frontier, seen, states, att_hist, hop_hist, host_state = \
                self._precise_loop(
                    ctx, frontier, seen, states, att_hist, hop_hist,
                    host_state, opts, pages_meta, hot_thr, max_rounds)
        else:
            frontier, seen, states, att_hist, hop_hist, host_state = \
                self._scale_loop(
                    ctx, frontier, seen, states, att_hist, hop_hist,
                    host_state, opts, pages_meta, hot_thr, max_rounds)
        round_no = ctx.round_no
        seq_base = ctx.seq_base
        results_total = ctx.results_total

        self._join_commits()
        if self._pending_deltas or self._pending_att or self._pending_hops:
            # flush rounds executed since the last parquet snapshot
            if self._pending_deltas:
                delta = self._pending_deltas[0]
                for d in self._pending_deltas[1:]:
                    delta = delta.unionByName(d)
            else:
                delta = self._empty(schemas.RESULTS)
            self._pending_deltas = []
            self._commit(round_no - 1, frontier, seen, states, host_state,
                         delta, round_no - 1, seq_base, results_total,
                         enqueue_log, lineage_delta=self._flush_lineage(),
                         att_delta=self._flush_hist("_pending_att"),
                         hops_delta=self._flush_hist("_pending_hops"))
        last_v = self.store.versions()[-1]
        results = (self.store.read_deltas(spark, last_v, "results")
                   or self._empty(schemas.RESULTS))
        lineage = self.store.read_deltas(spark, last_v, "lineage")
        # Every returned table now reads from the final parquet snapshot
        # (results/lineage always did; seen re-points here), so none of
        # the run's in-memory checkpoints is reachable by the caller —
        # release them. Without this, each run() leaks its terminal
        # state/segment checkpoints (~44 persisted RDDs and ~70 MB of
        # block-store per 3-round sf0.1 crawl, measured), so repeated
        # runs in one session degrade the CacheManager and local store.
        seen = self.store.read_table(spark, last_v, "seen")
        self._release_run_persists()
        return CrawlOutput(
            results=results, seen=seen, metrics=metrics,
            enqueue_log=enqueue_log, rounds=round_no,
            elapsed_s=time.time() - t0, store_root=self.store_root,
            lineage=lineage)

    # -------------------------------------------------- round building
    def _build_round(self, round_no, seq_base, frontier, seen, states,
                     att_hist, hop_hist, host_state, opts, pages_meta,
                     hot_thr, hot_hosts, precise, ctx=None, n_frontier=0):
        """Construct one round's FULL lazy DAG (fetch → state update →
        routing → parse → results → candidates → admission → checkpoints
        → lineage) WITHOUT running any Spark action in scale mode — so
        the driver-serial DAG-construction time can overlap the previous
        round's executor work (_scale_loop). In precise mode the build
        interleaves the exact bookkeeping actions the reference replay
        needs (results/admission counts, enqueue log), mutating ``ctx``.
        Returns a plan namespace of every handle the drivers need."""
        from types import SimpleNamespace

        settings = self.settings
        build_t0 = time.time()

        if settings.replay_mode == "serialized":
            first = frontier.orderBy("enqueue_seq").limit(1)
            due = first
            # anti-join on enqueue_seq (unique), not url: the reference
            # can enqueue one target twice via two same-round redirects,
            # and only the dequeued copy must leave the frontier
            carried = frontier.join(
                due.select("enqueue_seq"), "enqueue_seq", "left_anti")
            carried_count = n_frontier - 1
        else:
            due, carried = frontier, self._empty(schemas.FRONTIER)
            carried_count = 0

        trace = os.environ.get("SPARK_GRAFT_TRACE")
        _tp = [("start", time.time())]

        def _t(tag):
            if trace:
                _tp.append((tag, time.time()))

        attempts = (self.request_processor or fetch_round)(
            due, pages_meta, host_state, opts,
            # salting reorders within a host → scale mode only
            skew_salt_threshold=hot_thr,
            skew_salt_factor=settings.skew_salt_factor,
            # hot set comes from an earlier round's frontier stats (one
            # round stale in the pipelined loop — salting is perf-only)
            hot_hosts=hot_hosts)
        attempt_rows, host_state_new = split_attempts(attempts, host_state)
        attempt_rows = attempt_rows.cache()
        _t("fetch")

        # host scheduler state: replace updated hosts
        host_state_next = (host_state.join(host_state_new.select("host"),
                                           "host", "left_anti")
                           .unionByName(host_state_new))

        # ---- crawl-state update (UriCrawlStates per-attempt append —
        # CrawlRunner.cs:238-255: transport-error attempts carry no
        # status code). SPLIT HISTORY (VERDICT r4 next #1): the upsert
        # path carries only the small live row (schemas.STATES_LIVE);
        # the attempt/hop logs land in append-only delta tables
        # (ATT_ROWS/HOP_ROWS) checkpointed once per round and never
        # rewritten — the per-round O(|state|·payload) materialization
        # residual measured in BENCH/BASELINE.md §8 drops to a small-
        # constant O(|state|) live-row pass. `touched` is the
        # delta-sized join of this round's attempts with their prior
        # live state; every history consumer derives from it.
        ATT = schemas.ATT_LOG_DDL
        HOP = schemas.HOP_LOG_DDL
        touched = (attempt_rows
                   .select("url", "request_start_ms", "elapsed_ms",
                           "status_code")
                   .join(states.selectExpr(
                       "url", "n_attempts as prior_n",
                       "redirect_chain as prior_chain"), "url", "left")
                   .cache())
        st_updates = touched.selectExpr(
            "url",
            "cast(coalesce(prior_n, 0) + 1 as int) as n_attempts",
            "coalesce(prior_chain, cast(array() as array<string>))"
            " as redirect_chain",
            "coalesce(status_code between 200 and 299, false)"
            " as last_success")
        # this round's append-only attempt rows (schemas.ATT_ROWS),
        # checkpointed IMMEDIATELY: every downstream consumer (redirect
        # moves, emission gathers, admission, the history union) embeds
        # the segment's tiny checkpoint plan instead of re-embedding —
        # and re-planning — the whole construction (measured: the round
        # DAG-build tripled without this)
        eager = self.eager_checkpoint and precise
        np_ = self._n_parts
        att_delta = touched.selectExpr(
            "url",
            "cast(coalesce(prior_n, 0) + 1 as int) as attempt_no",
            "request_start_ms as start_ms", "elapsed_ms", "status_code",
            "coalesce(status_code between 200 and 299, false)"
            " as is_success")
        att_seg = att_delta.coalesce(np_).localCheckpoint(eager=eager)
        _t("st_updates")
        # cached: consumers (states2, moved, redirect chains) would
        # otherwise re-run the anti-join per materialization
        states1 = (states.join(attempt_rows.select("url"), "url", "left_anti")
                   .unionByName(st_updates)).cache()

        # ---- routing (CrawlRunner.cs:235-291)
        # string predicates/projections throughout the round body:
        # each py4j Column construction costs ~1-3 ms of driver time
        # and this DAG is rebuilt every round — selectExpr/filter
        # strings cut measured per-round DAG-construction time ~3x
        # with identical plans
        codes = ", ".join(str(c) for c in REDIRECT_CODES)
        redirects = attempt_rows.filter(
            f"error is null and status_code in ({codes})").withColumn(
            "target", _resolve_redirect_udf(F.col("url"), F.col("redirect_to")))
        successes = attempt_rows.filter(
            "error is null and status_code between 200 and 299")
        retries = attempt_rows.filter(
            "error is not null or status_code between 500 and 599")
        terminals = attempt_rows.filter(
            f"error is null and not status_code in ({codes})"
            " and not status_code between 200 and 299"
            " and not status_code between 500 and 599")

        # redirect state moves: drop source states, insert first move
        # per target where the target has no state (TryAdd semantics)
        red = redirects.cache()
        w_target = Window.partitionBy("target").orderBy("enqueue_seq")
        # AddRedirect (CrawlRunner.cs:69-90): the target's fresh state
        # has an empty request list; the source's requests move into
        # the redirect chain as a CrawledUriRedirect hop. Live row
        # first; hop rows (with the source's attempt log nested) are
        # appended to the hop history for exactly the moves that land.
        # checkpointed (tiny: one row per landed redirect): moved_base
        # and kept below are each cloned into 4-6 downstream LOGICAL
        # trees (states2, km, hop copies/new hops, redirect cands), and
        # every clone re-embeds the whole fetch-chain subtree — the
        # analyzer walks trees, not DAGs, so without truncation the
        # round's driver-side planning time triples (measured)
        moved_base = (red.join(states1.selectExpr(
                          "url", "redirect_chain as src_chain"),
                          "url", "left")
                      .withColumn("_rn", F.row_number().over(w_target))
                      .filter("_rn = 1")
                      .selectExpr("url as src_url", "target",
                                  "coalesce(src_chain,"
                                  " cast(array() as array<string>))"
                                  " as src_chain")
                      .coalesce(np_).localCheckpoint(eager=eager))
        _t("moved_ckpt")
        moved = moved_base.selectExpr(
            "target as url",
            "0 as n_attempts",
            "concat(src_chain, array(src_url)) as redirect_chain",
            "false as last_success")
        states2 = states1.join(red.select(F.col("url")), "url", "left_anti")
        kept = (moved.join(states2.select("url"), "url", "left_anti")
                .coalesce(np_).localCheckpoint(eager=eager))
        _t("kept_ckpt")
        states2 = states2.unionByName(kept)
        # hop-history delta for landed moves: the source's existing hop
        # rows re-keyed to the target, plus one new hop carrying the
        # source's full attempt log (redirect sources were fetched this
        # round, so their log = prior history + this round's delta).
        # All gathers are driven by the tiny redirect-source url set
        # broadcast against the history scan — never a history shuffle.
        km = moved_base.join(kept.selectExpr("url as target"),
                             "target", "left_semi")
        src_urls = km.selectExpr("src_url as url").distinct()
        src_att = gather_attempts(att_hist.unionByName(att_seg), src_urls,
                                  out_col="src_att")
        src_hop_rows = hop_hist.join(F.broadcast(src_urls), "url",
                                     "left_semi")
        hop_copies = (src_hop_rows
                      .join(km.selectExpr("src_url as url", "target"), "url")
                      .selectExpr("target as url", "hop_seq", "location",
                                  "attempts"))
        new_hops = (km.join(src_att, km.src_url == src_att.url, "left")
                    .selectExpr("target as url",
                                "cast(size(src_chain) + 1 as int) as hop_seq",
                                "src_url as location",
                                f"coalesce(src_att, cast(array() as {ATT}))"
                                " as attempts"))
        hop_delta = hop_copies.unionByName(new_hops)
        _t("hop_plan")
        # CHECKPOINT-HANDLE DISCIPLINE (measured on the multi-JVM
        # cluster): creating a localCheckpoint handle runs
        # `queryExecution.toRdd`, and any BroadcastHashJoin in the plan
        # EXECUTES its build side right there — so a handle whose
        # broadcast build side chains through THIS round's fetch
        # (src_urls ← km ← … ← attempts) runs the whole fetch during
        # the driver-serial build phase, destroying the pipelined
        # overlap (round builds of 11-32 s on a 4-executor cluster).
        # Scale mode on a real cluster therefore defers hop_seg (and
        # delta below) to the action thread; precise mode is sequential
        # and local[N] shares driver/executor cores (build-phase
        # execution is free prefetch) — both keep them inline. See
        # CrawlJob.defer_heavy_checkpoints.
        defer = (not precise) and self._defer_ckpt
        if not defer:
            hop_seg = hop_delta.coalesce(np_).localCheckpoint(eager=eager)
        else:
            hop_seg = None
        _t("states2")

        # ---- parse + this round's direct results
        parsed = (self.content_processor or parse_round)(
            successes, self.pages, settings).cache()
        _t("parse")
        # result emission needs each FETCHED url's full attempt log and
        # hop list: prior attempts exist only for retried urls
        # (attempt_no > 1) and hops only for urls that are redirect
        # targets (prior chain non-empty) — both tiny per-round sets,
        # broadcast against pruned history scans. st_info itself is
        # delta-sized (st_updates covers every fetched url).
        need_hist = (att_seg.filter("attempt_no > 1")
                     .select("url").distinct())
        prior_rows = att_hist.join(F.broadcast(need_hist), "url",
                                   "left_semi")
        att_now = gather_attempts(prior_rows.unionByName(att_seg),
                                  None, out_col="r_att")
        chain_urls = (touched
                      .filter("size(coalesce(prior_chain,"
                              " cast(array() as array<string>))) > 0")
                      .select("url").distinct())
        hops_now = gather_hops(hop_hist, chain_urls, out_col="r_hops")
        # delta-sized. Deferred mode keeps it lazy (its gather
        # broadcasts chain through this round's fetch and must fire on
        # the action thread inside delta's checkpoint); inline mode
        # checkpoints it so both result paths share one shallow plan.
        st_info = (st_updates.selectExpr(
                       "url", "n_attempts as r_attempts",
                       "redirect_chain as r_chain")
                   .join(att_now, "url", "left")
                   .join(hops_now, "url", "left"))
        if not defer:
            st_info = st_info.coalesce(np_).localCheckpoint(eager=eager)

        # "crawled without content" (CrawlRunner.cs:283-290): the
        # result carries Requests + RedirectChain but no Content
        res_terminal = (terminals.join(st_info, "url", "left").selectExpr(
            "url", "host", "'Crawled' as status",
            "coalesce(r_attempts, 1) as n_attempts",
            "coalesce(r_chain, cast(array() as array<string>))"
            " as redirect_chain",
            "status_code as last_status_code",
            "cast(array() as array<string>) as links",
            "cast(null as string) as canonical",
            f"{int(round_no)} as round",
            "cast(null as boolean) as image_ok",
            "cast(null as double) as psnr_db",
            "cast(null as boolean) as phash_match",
            "cast(null as boolean) as caption_ok",
            "cast(null as string) as content_type",
            "cast(null as string) as charset",
            "cast(null as string) as content_encoding",
            "cast(null as array<string>) as page_robot_rules",
            "cast(null as string) as raw_content",
            "cast(null as array<struct<location:string,text:string,"
            "title:string,rel:string>>) as links_detail",
            f"coalesce(r_att, cast(array() as {ATT})) as attempts",
            f"coalesce(r_hops, cast(array() as {HOP})) as redirect_hops"))

        # CrawledContent parity (CrawledUri.cs:44-56): noindex
        # (RobotsBlocked) results carry Requests + chain but no
        # Content (CrawlRunner.cs:97-107)
        parsed_st = parsed.join(st_info, "url", "left")
        res_parsed = parsed_st.selectExpr(
            "url", "host",
            "case when can_index then 'Crawled'"
            " else 'RobotsBlocked' end as status",
            "coalesce(r_attempts, 1) as n_attempts",
            "coalesce(r_chain, cast(array() as array<string>))"
            " as redirect_chain",
            "last_status_code",
            "case when can_index then transform(links,"
            f" l -> regexp_replace(l.location, '{_FRAG}', ''))"
            " else cast(array() as array<string>) end as links",
            "canonical",
            f"{int(round_no)} as round",
            "image_ok", "psnr_db", "phash_match", "caption_ok",
            "case when can_index then content_type end as content_type",
            "case when can_index then charset end as charset",
            "case when can_index then content_encoding end"
            " as content_encoding",
            "case when can_index then robots_rules end"
            " as page_robot_rules",
            "case when can_index then raw_content end as raw_content",
            "case when can_index then links end as links_detail",
            f"coalesce(r_att, cast(array() as {ATT})) as attempts",
            f"coalesce(r_hops, cast(array() as {HOP})) as redirect_hops")
        _t("results")

        # precise mode (budget active or exact ordering): maintain the
        # running totals the budget fold needs, at the cost of extra
        # actions. Scale mode defers all counting to one pass.
        round_results = res_terminal.unionByName(res_parsed)
        if precise:
            round_results = round_results.cache()
            ctx.results_total += round_results.count()

        # ---- candidates for the next round
        link_cands = (parsed.filter("can_index and can_follow")
                      .select("enqueue_seq", "depth",
                              F.posexplode("links").alias("pos", "link"))
                      .filter("link.rel is null"
                              " or lower(link.rel) != 'nofollow'")
                      .selectExpr(
                          f"regexp_replace(link.location, '{_FRAG}', '')"
                          " as url",
                          "lower(parse_url(link.location, 'HOST'))"
                          " as host",
                          "'link' as kind",
                          "enqueue_seq as parent_seq",
                          "pos as child_pos",
                          "depth + 1 as depth",
                          "false as skip_budget",
                          "cast(null as array<string>) as moved_chain"))

        retry_cands = retries.selectExpr(
            "url", "host", "'retry' as kind",
            "enqueue_seq as parent_seq", "0 as child_pos", "depth",
            "false as skip_budget",
            "cast(null as array<string>) as moved_chain")

        redirect_cands = (red.join(states1.selectExpr(
                              "url", "redirect_chain as src_chain"),
                              "url", "left")
                          .selectExpr(
                              "target as url",
                              "lower(parse_url(target, 'HOST')) as host",
                              "'redirect' as kind",
                              "enqueue_seq as parent_seq",
                              "0 as child_pos", "depth",
                              "true as skip_budget",
                              "concat(coalesce(src_chain,"
                              " cast(array() as array<string>)),"
                              " array(url)) as moved_chain"))

        candidates = link_cands.unionByName(retry_cands).unionByName(redirect_cands)
        _t("cands")

        adm = admit(candidates, seen, states2, self.robots_map, settings,
                    self.base_host,
                    budget_base=(ctx.results_total if ctx else 0) + carried_count,
                    seq_base=seq_base, round_no=round_no,
                    per_host_robots=self.per_host_robots,
                    exact_order=self.exact_order,
                    lazy_counts=not precise,
                    bloom_store=(self._bloom_store
                                 if self.use_bloom
                                 and self._n_seen >= self.bloom_min_seen
                                 else None),
                    robots_rules=self.robots_rules,
                    scope_hosts=self._scope_hosts,
                    robots_epoch=self._robots_epoch,
                    # states2 includes this round's updates/moves, so
                    # the history handed to admission must too (raw hop
                    # delta in scale mode — hop_seg is action-deferred)
                    att_hist=att_hist.unionByName(att_seg),
                    hop_hist=hop_hist.unionByName(
                        hop_seg if hop_seg is not None else hop_delta))
        seen_add = adm.seen_add.cache()
        _t("admit")

        adm_results = adm.results
        if precise:
            adm_results = adm_results.cache()
            ctx.results_total += adm_results.count()
            ctx.seq_base += adm.n_enqueued
            if self.collect_enqueue_log and adm.n_enqueued:
                ctx.enqueue_log.extend(
                    r.url for r in adm.frontier_add.orderBy("enqueue_seq").collect())

        # localCheckpoint truncates the logical plan NOW (the round
        # loop would otherwise grow it exponentially — even planning/
        # explain blows up). The coalesce is load-bearing too: unions
        # concatenate partition lists, so without it partition counts
        # (and task counts, and task-closure sizes) grow every round
        # — measured 1056 tasks on the final delta write.
        # scale mode keeps every checkpoint lazy; the fused stats
        # actions materialize them (eager would cost one job per
        # table — 5 extra driver round-trips per crawl round).
        # (eager/np_ are defined up at the att_seg checkpoint)
        frontier_next = (carried.unionByName(adm.frontier_add)
                         .coalesce(np_).localCheckpoint(eager=eager))
        _t("ck_frontier")
        # seen-set checkpoint strategy: by default the whole (old ∪ new)
        # table re-materializes every round — O(|seen|)/round, the
        # state-proportional residual measured in BENCH/BASELINE.md §8.
        # With seen_segment_rounds=K (scale mode), only the per-round
        # DELTA is checkpointed and `seen` stays a lazy union of ≤ K
        # immutable segments; every K-th round compacts to one segment.
        seg_k = 0 if precise else settings.seen_segment_rounds
        if seg_k > 0 and (round_no + 1) % seg_k != 0:
            mat_seen = seen_add.coalesce(np_).localCheckpoint(eager=eager)
            seen_next = seen.unionByName(mat_seen)
        else:
            seen_next = (seen.unionByName(seen_add)
                         .coalesce(np_).localCheckpoint(eager=eager))
            mat_seen = seen_next
        _t("ck_seen")
        states2 = states2.coalesce(np_).localCheckpoint(eager=eager)
        _t("ck_states")
        host_state_next = host_state_next.coalesce(np_).localCheckpoint(eager=eager)
        _t("ck_host")
        # history segments (att_seg/hop_seg, checkpointed above at
        # construction): appended to the lazy hist union, never
        # rewritten. Periodic compaction re-checkpoints the union so
        # plan width / partition count stay bounded on long crawls (one
        # linear pass, no shuffle — amortized O(|hist|/K) per round vs
        # the old O(|state|·payload) rewrite).
        att_hist_next = att_hist.unionByName(att_seg)
        hist_mat = [att_seg]
        hk = settings.history_compact_rounds
        if hk > 0 and (round_no + 1) % hk == 0:
            # prefix-only compaction: every chain in att_hist_next is
            # already checkpoint-backed, so this handle is cheap
            att_hist_next = (att_hist_next.coalesce(np_)
                             .localCheckpoint(eager=eager))
            hist_mat = [att_hist_next]
        if not defer:
            delta = (round_results.unionByName(adm_results)
                     .coalesce(np_).localCheckpoint(eager=eager))
        else:
            delta = None
        if precise:
            hop_hist_next = hop_hist.unionByName(hop_seg)
            if hk > 0 and (round_no + 1) % hk == 0:
                hop_hist_next = (hop_hist_next.coalesce(np_)
                                 .localCheckpoint(eager=eager))
        else:
            # the scale loop composes the next build's hop history
            # itself (checkpointed prefix + exactly one raw layer, see
            # _scale_loop's rotation) — a plan-to-plan chain here would
            # accumulate raw layers unboundedly
            hop_hist_next = None
        _t("ck_delta")
        lin = None
        if self.collect_lineage:
            lin = (attempt_rows.groupBy("host")
                   .agg(F.count("*").alias("fetched"))
                   .join(parsed.groupBy("host")
                         .agg(F.sum(F.size("links")).alias("links_emitted")),
                         "host", "full")
                   .join(adm.frontier_add.groupBy("host")
                         .agg(F.count("*").alias("enqueued")),
                         "host", "full")
                   .select(F.lit(round_no).alias("round"), "host",
                           F.coalesce("fetched", F.lit(0)).alias("fetched"),
                           F.coalesce("links_emitted", F.lit(0)).alias("links_emitted"),
                           F.coalesce("enqueued", F.lit(0)).alias("enqueued"))
                   .coalesce(1).localCheckpoint(eager=False))

        if trace:
            import sys
            spans = [(tag, round(tm - _tp[i][1], 2))
                     for i, (tag, tm) in enumerate(_tp[1:])]
            print(f"TRACE round={round_no} build {spans}", file=sys.stderr)
        return SimpleNamespace(
            round_no=round_no,
            attempt_rows=attempt_rows, parsed=parsed, red=red,
            states1=states1, round_results=round_results,
            adm=adm, adm_results=adm_results, delta=delta,
            delta_raw=round_results.unionByName(adm_results),
            hop_delta_raw=hop_delta,
            frontier_next=frontier_next, seen_next=seen_next,
            mat_seen=mat_seen,
            states2=states2, host_state_next=host_state_next,
            att_seg=att_seg, hop_seg=hop_seg,
            att_hist_next=att_hist_next, hop_hist_next=hop_hist_next,
            hist_mat=hist_mat,
            seen_add=seen_add, lin=lin,
            carried_count=carried_count,
            build_s=time.time() - build_t0,
            caches=[attempt_rows, touched, parsed, red, states1, seen_add,
                    *( [adm.cached] if adm.cached is not None else [] ),
                    *adm.extra_cached])

    # ------------------------------------------------------ loop drivers
    def _precise_loop(self, ctx, frontier, seen, states, att_hist,
                      hop_hist, host_state, opts, pages_meta, hot_thr,
                      max_rounds):
        """Sequential driver (budget / exact-order replay): per-round
        exact counting, eager checkpoints, synchronous commits — the
        reference-replay semantics the golden tests pin."""
        settings = self.settings
        while True:
            if self._next_frontier_count is not None:
                n_frontier = self._next_frontier_count
            else:
                n_frontier, _, self._next_hot_hosts = self._frontier_stats(
                    frontier, hot_thr)
            if n_frontier == 0:
                break
            if max_rounds is not None and ctx.round_no >= max_rounds:
                break
            if self._cancel_evt.is_set():
                break
            rt0 = time.time()
            plan = self._build_round(
                ctx.round_no, ctx.seq_base, frontier, seen, states,
                att_hist, hop_hist, host_state, opts, pages_meta, hot_thr,
                self._next_hot_hosts, precise=True, ctx=ctx,
                n_frontier=n_frontier)

            # exact per-attempt metrics (replay/tests): one agg pass
            err = F.col("error").isNotNull()
            retrying_5xx = (~err) & F.col("status_code").between(500, 599)
            n_fetched, wait_ms, n_err, n_retry = plan.attempt_rows.agg(
                F.count("*"), F.sum("start_delay_ms"),
                F.sum(err.cast("long")),
                F.sum((err | retrying_5xx).cast("long"))).first()
            n_delta = plan.delta.count()
            n_next, max_seq, _ = self._frontier_stats(plan.frontier_next, 0)
            n_seen_add = plan.seen_add.count() if self.use_bloom else 0
            self._bloom_fold(n_seen_add, plan.seen_add, plan.seen_next)
            ctx.metrics.append({
                "round": ctx.round_no, "frontier_size": n_frontier,
                "fetched": int(n_fetched), "errors": int(n_err or 0),
                "results_emitted": int(n_delta),
                "new_urls": int(n_next) - plan.carried_count,
                "politeness_wait_ms": float(wait_ms or 0.0),
                "retries": int(n_retry or 0),
                "wall_s": time.time() - rt0,
                "pages_per_s": int(n_fetched) / max(time.time() - rt0, 1e-9),
            })
            self._next_frontier_count = int(n_next)

            # precise mode defers: the lineage delta is still lazy,
            # so the round's caches must survive until the commit
            self._deferred_unpersist.extend(
                [*plan.caches, plan.round_results, plan.adm_results,
                 frontier, seen, states])
            if plan.lin is not None:
                self._pending_lineage.append(plan.lin)
            delta = plan.delta
            self._pending_att.append(plan.att_seg)
            self._pending_hops.append(plan.hop_seg)
            if (ctx.round_no + 1) % self.snapshot_every == 0:
                for d in self._pending_deltas:
                    delta = d.unionByName(delta)
                self._deferred_unpersist.extend(self._pending_deltas)
                self._pending_deltas = []
                self._commit(ctx.round_no, plan.frontier_next, plan.seen_next,
                             plan.states2, plan.host_state_next, delta,
                             ctx.round_no, ctx.seq_base, ctx.results_total,
                             ctx.enqueue_log,
                             lineage_delta=self._flush_lineage(),
                             att_delta=self._flush_hist("_pending_att"),
                             hops_delta=self._flush_hist("_pending_hops"))
                self._deferred_unpersist.extend(
                    [plan.frontier_next, plan.seen_next, plan.states2,
                     plan.host_state_next, delta])
                frontier, seen, states, host_state = self._reload()
                # history from parquet too: truncates the in-session
                # union lineage the same way _reload does for tables
                v = self.store.versions()[-1]
                att_hist = (self.store.read_deltas(self.spark, v, "attempts")
                            or self._empty(schemas.ATT_ROWS))
                hop_hist = (self.store.read_deltas(self.spark, v, "hops")
                            or self._empty(schemas.HOP_ROWS))
                for df in self._deferred_unpersist:
                    df.unpersist()
                self._deferred_unpersist = []
            else:
                # persisted (lazy cache); lineage is truncated at the next
                # parquet commit, resume point = last committed snapshot
                frontier, seen, states = (plan.frontier_next, plan.seen_next,
                                          plan.states2)
                host_state = plan.host_state_next
                att_hist, hop_hist = plan.att_hist_next, plan.hop_hist_next
                self._pending_deltas.append(delta)
            ctx.round_no += 1
        return frontier, seen, states, att_hist, hop_hist, host_state

    def _scale_loop(self, ctx, frontier, seen, states, att_hist,
                    hop_hist, host_state, opts, pages_meta, hot_thr,
                    max_rounds):
        """Pipelined driver (scale mode): round N+1's driver-serial DAG
        construction overlaps round N's executor actions (an action
        worker thread runs A+B while the main thread builds the next
        lazy plan — BENCH/BASELINE.md §6 roadmap item 1), and parquet
        snapshot commits run on a separate commit thread off the round
        critical path (item 2; the manifest write stays atomic and the
        next commit joins the previous, so durability ordering holds).
        Salting hot-sets are one round stale by construction — a pure
        perf heuristic. Enqueue sequence bases are deterministic per
        round ((round+1)·2^41) so the next round's admission needs no
        value from the current round's stats."""
        from concurrent.futures import ThreadPoolExecutor

        actions = ThreadPoolExecutor(max_workers=1,
                                     thread_name_prefix="crawl-actions")
        prep = ThreadPoolExecutor(max_workers=1,
                                  thread_name_prefix="crawl-prep")
        plan = None
        next_plan = None
        try:
            while True:
                if self._next_frontier_count is not None:
                    n_frontier = self._next_frontier_count
                else:
                    n_frontier, _, self._next_hot_hosts = self._frontier_stats(
                        frontier, hot_thr)
                if n_frontier == 0:
                    break
                if max_rounds is not None and ctx.round_no >= max_rounds:
                    break
                if self._cancel_evt.is_set():
                    break
                rt0 = time.time()
                # adapt partitioning to this round's frontier size; the
                # overlapped next_plan inherits it as a one-round-stale
                # proxy (perf-only — partitioning never changes results)
                self._set_round_parts(self._adaptive_parts(n_frontier))
                ctx.seq_base = self._scale_seq_base(ctx.round_no)
                if plan is None:
                    plan = self._build_round(
                        ctx.round_no, ctx.seq_base, frontier, seen, states,
                        att_hist, hop_hist, host_state, opts, pages_meta,
                        hot_thr, self._next_hot_hosts, precise=False,
                        ctx=ctx)
                fut = actions.submit(self._run_actions, plan, hot_thr)
                # overlap: construct round N+1's DAG (pure driver-side
                # py4j work) while round N's actions run on the cluster;
                # built speculatively — discarded if the frontier empties
                # hop history for the speculative build: checkpointed
                # prefix + exactly ONE raw layer (this round's — its
                # action-thread checkpoint doesn't exist yet); the
                # rotation below swaps the raw layer for the checkpoint
                next_plan = self._build_round(
                    ctx.round_no + 1, self._scale_seq_base(ctx.round_no + 1),
                    plan.frontier_next, plan.seen_next, plan.states2,
                    plan.att_hist_next,
                    hop_hist.unionByName(plan.hop_delta_raw),
                    plan.host_state_next, opts, pages_meta, hot_thr,
                    self._next_hot_hosts, precise=False, ctx=ctx)
                # pipelined handle prep: round N+1's toRdd (analysis +
                # broadcast builds, driver-serial) runs while round N's
                # actions keep the executors busy
                next_plan.prep_fut = prep.submit(
                    self._prepare_handles, next_plan)
                stats = fut.result()
                ctx.results_total += stats.n_delta
                self._bloom_fold(stats.n_seen_add, plan.seen_add,
                                 plan.seen_next)
                ctx.metrics.append({
                    "round": ctx.round_no, "frontier_size": n_frontier,
                    "fetched": stats.n_fetched, "errors": stats.n_err,
                    "results_emitted": stats.n_delta,
                    "new_urls": stats.n_next,
                    "politeness_wait_ms": stats.wait_ms,
                    "retries": stats.n_retry,
                    "wall_s": time.time() - rt0,
                    "pages_per_s": stats.n_fetched / max(time.time() - rt0, 1e-9),
                    "t_dag_s": round(plan.build_s, 2),
                    "t_a_s": round(stats.t_a, 2),
                    "t_b_s": round(stats.t_b, 2),
                    "t_dag_next_overlapped_s": round(next_plan.build_s, 2),
                })
                self._next_frontier_count = int(stats.n_next)
                self._next_hot_hosts = stats.hot
                # scale mode materialized every consumer (delta, state
                # checkpoints, lineage) in this round's actions — free
                # the caches NOW so executor memory and the CacheManager
                # (whose plan-normalization lookups scale with entry
                # count, pure driver time) stay O(1) per round
                unp = [*plan.caches, frontier, states, host_state]
                if self.settings.seen_segment_rounds <= 0:
                    # segment mode keeps `seen` referenced inside the
                    # seen_next union — its checkpoint blocks must NOT
                    # be dropped (a truncated-lineage RDD can't be
                    # recomputed); old segments are freed by the
                    # ContextCleaner once compaction drops the last
                    # reference
                    unp.append(seen)
                for df in unp:
                    df.unpersist()
                if plan.lin is not None:
                    self._pending_lineage.append(plan.lin)
                frontier, seen, states = (plan.frontier_next, plan.seen_next,
                                          plan.states2)
                host_state = plan.host_state_next
                # hop rotation: the speculative next_plan saw ONE raw
                # hop layer (plan.hop_hist_next); rounds after it chain
                # from the action-thread checkpoint instead, so raw
                # layers never accumulate
                att_hist = plan.att_hist_next
                hop_hist = hop_hist.unionByName(plan.hop_seg)
                hk = self.settings.history_compact_rounds
                if hk > 0 and (ctx.round_no + 1) % hk == 0:
                    # prefix compaction — all chains checkpoint-backed
                    hop_hist = (hop_hist.coalesce(self._n_parts)
                                .localCheckpoint(eager=False))
                self._pending_deltas.append(plan.delta)
                self._pending_att.append(plan.att_seg)
                self._pending_hops.append(plan.hop_seg)
                ctx.seq_base = self._scale_seq_base(ctx.round_no + 1)
                if (ctx.round_no + 1) % self.snapshot_every == 0:
                    delta = self._pending_deltas[0]
                    for d in self._pending_deltas[1:]:
                        delta = delta.unionByName(d)
                    flushed = self._pending_deltas
                    self._pending_deltas = []
                    self._commit_async(
                        ctx.round_no, frontier, seen, states, host_state,
                        delta, ctx.round_no, ctx.seq_base,
                        ctx.results_total, list(ctx.enqueue_log),
                        lineage_delta=self._flush_lineage(),
                        att_delta=self._flush_hist("_pending_att"),
                        hops_delta=self._flush_hist("_pending_hops"),
                        unpersist_after=flushed)
                ctx.round_no += 1
                plan, next_plan = next_plan, None
        finally:
            # the speculative last plan never ran — and on the error path
            # (fut.result()/commit join raising after next_plan was built)
            # BOTH plans hold live cache registrations: drop them so the
            # CacheManager doesn't accumulate for the session's lifetime
            for p in (plan, next_plan):
                if p is not None:
                    pf = getattr(p, "prep_fut", None)
                    if pf is not None:
                        p.prep_fut = None
                        try:
                            pf.result()
                        except Exception:
                            pass  # loop error already in flight
                    for df in p.caches:
                        df.unpersist()
            prep.shutdown(wait=True)
            actions.shutdown(wait=True)
        return frontier, seen, states, att_hist, hop_hist, host_state

    def _prepare_handles(self, plan):
        """Create the deferred heavy checkpoint HANDLES. ``toRdd`` at
        handle creation runs Catalyst analysis AND the plan's broadcast
        build sides — 2-3.7 s/round of driver-serial time (measured,
        sf0.1), during which the cluster would otherwise idle. The
        scale loop therefore calls this on a prep thread right after
        the round's DAG is built, overlapping the PREVIOUS round's
        executor actions; _run_actions joins the future (or falls back
        inline) so the action thread mostly pays only the count."""
        if plan.delta is not None:
            return
        self.spark.sparkContext.setJobGroup(
            self._job_group, "crawl handle prep", interruptOnCancel=True)
        plan.hop_seg = (plan.hop_delta_raw.coalesce(self._n_parts)
                        .localCheckpoint(eager=False))
        plan.delta = (plan.delta_raw.coalesce(self._n_parts)
                      .localCheckpoint(eager=False))

    def _run_actions(self, plan, hot_thr):
        """Round actions on the worker thread: A materializes the heavy
        chain into the caches (delta count), B is the fused stats pass
        that also materializes the state checkpoints. Job-group props
        are thread-local — re-attach so cancel() reaches these jobs."""
        from types import SimpleNamespace

        self.spark.sparkContext.setJobGroup(
            self._job_group, "crawl round loop", interruptOnCancel=True)
        a0 = time.time()
        prep = getattr(plan, "prep_fut", None)
        if prep is not None:
            # handles were prepared on the prep thread while the
            # PREVIOUS round's actions kept the cluster busy — join
            plan.prep_fut = None
            prep.result()
        if plan.delta is None:
            # deferred from the build phase (checkpoint-handle
            # discipline): the broadcast build sides chaining through
            # this round's fetch fire HERE, on the action thread,
            # overlapped with the next round's DAG construction
            self._prepare_handles(plan)
        t_han = time.time() - a0
        n_delta = plan.delta.count()
        t_a = time.time() - a0
        if os.environ.get("SPARK_GRAFT_TRACE"):
            import sys as _sys
            print(f"TRACE actions round={plan.round_no} t_handles="
                  f"{t_han:.2f} t_count={t_a - t_han:.2f}", file=_sys.stderr)
        mat = (plan.mat_seen, plan.states2, plan.host_state_next,
               *plan.hist_mat, plan.hop_seg)
        if plan.lin is not None:
            mat = (*mat, plan.lin)
        (n_fetched, wait_ms, n_err, n_retry, n_next, max_seq, hot,
         n_seen_add, _) = self._round_stats(
            plan.attempt_rows, plan.frontier_next,
            plan.seen_add if self.use_bloom else None, hot_thr,
            materialize=mat)
        return SimpleNamespace(
            n_delta=int(n_delta), n_fetched=int(n_fetched),
            wait_ms=float(wait_ms or 0.0), n_err=int(n_err or 0),
            n_retry=int(n_retry or 0), n_next=int(n_next),
            max_seq=max_seq, hot=hot, n_seen_add=int(n_seen_add),
            t_a=t_a, t_b=time.time() - a0 - t_a)

    def _adaptive_parts(self, n_rows: int | None, target: int = 6000) -> int:
        """Partition count derived from the round's input size (guide
        §2.2/§2.5: fewer, larger partitions; measured optimum ≈ 6-8k
        frontier rows/partition on this loop), floored at 4 and capped
        at the session's configured shuffle partitions — the conf keeps
        governing cluster-scale runs, the derivation only prevents a
        small round from paying hundreds of near-empty tasks per stage."""
        if not n_rows or n_rows <= 0:
            return self._n_parts_cap
        if os.environ.get("SPARK_GRAFT_ADAPTIVE_PARTS", "1") == "0":
            return self._n_parts_cap  # A/B kill-switch (perf-only)
        import math
        # rows/partition target is env-tunable for other hardware; the
        # 6k default is the measured optimum on this box at both test
        # scales AND on the 4-worker multi-JVM cluster (campaign_r6_ab)
        target = int(os.environ.get("SPARK_GRAFT_ROWS_PER_PART", target))
        return max(4, min(self._n_parts_cap, math.ceil(n_rows / target)))

    def _set_round_parts(self, np_: int) -> None:
        """Apply an adaptive partition count to both consumers: the
        coalesce width of checkpoint handles (_n_parts) and the SQL
        shuffle partitions of plans built from here on. run() restores
        the session conf afterwards."""
        if np_ != self._n_parts:
            self._n_parts = np_
            self.spark.conf.set("spark.sql.shuffle.partitions", str(np_))

    def _persistent_rdd_ids(self) -> set[int]:
        ids = set()
        it = self.spark.sparkContext._jsc.sc().getPersistentRDDs().iterator()
        while it.hasNext():
            ids.add(int(it.next()._1()))
        return ids

    def _release_run_persists(self):
        """Success-path cleanup: unpersist every RDD this run registered
        (state checkpoints, history/delta segments, round caches that
        outlived the loop). Safe because the CrawlOutput tables are all
        parquet-backed reads of the final snapshot by the time this is
        called. Blocks of RDDs persisted before the run (pages, caller
        caches) are untouched."""
        keep = getattr(self, "_persists_at_entry", None)
        if keep is None:
            return
        try:
            it = self.spark.sparkContext._jsc.sc().getPersistentRDDs() \
                .iterator()
            victims = []
            while it.hasNext():
                kv = it.next()
                if int(kv._1()) not in keep:
                    victims.append(kv._2())
            for rdd in victims:
                rdd.unpersist(False)
        except Exception:
            pass  # cleanup is best-effort; never fail a finished crawl

    def _bloom_fold(self, n_seen_add, seen_add, seen_next):
        """Step C: fold the round's new seen keys into the sharded
        blobs — distributed read-OR-write, no driver keys; crossing the
        activation threshold does a one-time rebuild from the full
        seen table."""
        if not self.use_bloom:
            return
        prev_seen = self._n_seen
        self._n_seen = prev_seen + n_seen_add
        if prev_seen >= self.bloom_min_seen:
            self._bloom_store.update(seen_add)
        elif self._n_seen >= self.bloom_min_seen:
            self._bloom_store.rebuild(seen_next)

    def _scale_seq_base(self, round_no: int) -> int:
        """Deterministic per-round enqueue-sequence base for scale mode:
        rounds may enqueue at most 2^41 rows each, so (round+1)·2^41 is
        always greater than every earlier round's sequence — per-host
        FIFO order is preserved without needing the previous round's
        max-seq statistic (which would serialize the pipelined loop)."""
        return (round_no + 1) << 41

    # ----------------------------------------------------- async commit
    def _commit_async(self, *args, unpersist_after=(), **kw):
        """Run a snapshot commit on the commit thread. At most one in
        flight (the next joins the previous), so versions land in
        order; run() joins before returning. The tables being written
        are already localCheckpoint-materialized, so the commit is pure
        parquet IO off the round-loop critical path."""
        from concurrent.futures import ThreadPoolExecutor

        if not hasattr(self, "_commit_pool"):
            self._commit_pool = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="crawl-commit")
        self._join_commits()

        def _job():
            try:
                self.spark.sparkContext.setJobGroup(
                    self._job_group, "crawl snapshot commit",
                    interruptOnCancel=True)
            except Exception:
                pass
            self._commit(*args, **kw)
            for df in unpersist_after:
                df.unpersist()

        self._commit_fut = self._commit_pool.submit(_job)

    def _join_commits(self):
        fut = getattr(self, "_commit_fut", None)
        if fut is not None:
            self._commit_fut = None
            fut.result()

    def _flush_lineage(self) -> DataFrame | None:
        if not self._pending_lineage:
            return None
        out = self._pending_lineage[0]
        for d in self._pending_lineage[1:]:
            out = out.unionByName(d)
        self._pending_lineage = []
        return out

    def _flush_hist(self, attr: str) -> DataFrame | None:
        """Union-and-clear a pending history-segment list
        (``_pending_att`` / ``_pending_hops``) for a commit."""
        segs = getattr(self, attr)
        if not segs:
            return None
        out = segs[0]
        for d in segs[1:]:
            out = out.unionByName(d)
        setattr(self, attr, [])
        return out

    # ------------------------------------------------------- snapshots
    def _commit(self, version_round, frontier, seen, states, host_state,
                results_delta, round_no, seq_base, results_total,
                enqueue_log, initial=False, lineage_delta=None,
                att_delta=None, hops_delta=None):
        version = version_round + 1  # v0 = initial state before round 0
        deltas = {"results": results_delta}
        if lineage_delta is not None:
            deltas["lineage"] = lineage_delta
        # append-only history (split states): per-version deltas, merged
        # across versions on resume by read_deltas — expiry keeps them
        if att_delta is not None:
            deltas["attempts"] = att_delta
        if hops_delta is not None:
            deltas["hops"] = hops_delta
        self.store.commit(
            version,
            tables={"frontier": frontier, "seen": seen, "states": states,
                    "host_state": host_state},
            deltas=deltas,
            meta={"round": round_no, "seq_base": seq_base,
                  "results_total": results_total,
                  "enqueue_log": enqueue_log if self.collect_enqueue_log else []},
        )
        if self.keep_snapshots > 0:
            # runs on the commit thread in async mode — expiry IO never
            # touches the round loop's critical path
            self.store.expire_snapshots(self.keep_snapshots)

    def _frontier_stats(
        self, frontier: DataFrame, hot_threshold: int,
    ) -> tuple[int, int | None, set[str]]:
        """One action: (n_rows, max enqueue_seq, hosts hotter than the
        salting threshold). rollup('host') gives per-host counts AND the
        grand total in a single partial-agg pass; only the total row and
        over-threshold hosts are collected."""
        agg = (frontier.rollup("host")
               .agg(F.count("*").alias("n"), F.max("enqueue_seq").alias("mx")))
        if hot_threshold > 0:
            agg = agg.filter(F.col("host").isNull()
                             | (F.col("n") > F.lit(hot_threshold)))
        else:
            agg = agg.filter(F.col("host").isNull())
        n_rows, max_seq, hot = 0, None, set()
        for r in agg.collect():
            if r.host is None:
                n_rows, max_seq = int(r.n), r.mx
            else:
                hot.add(r.host)
        return n_rows, max_seq, hot

    @staticmethod
    def _migrate(df: DataFrame, defaults: dict[str, str]) -> DataFrame:
        """Add columns that snapshots written by older engine versions
        lack (schema evolution on resume): FRONTIER.priority. (Legacy
        STATES att_log/hop_logs arrays are handled separately in _run —
        exploded into the append-only history tables.)"""
        missing = [f"{expr} as {name}" for name, expr in defaults.items()
                   if name not in df.columns]
        return df.selectExpr("*", *missing) if missing else df

    def _reload(self):
        v = self.store.versions()[-1]
        return (self.store.read_table(self.spark, v, "frontier"),
                self.store.read_table(self.spark, v, "seen"),
                self.store.read_table(self.spark, v, "states"),
                self.store.read_table(self.spark, v, "host_state"))


@F.pandas_udf(StringType())
def _resolve_redirect_udf(urls: pd.Series, redirect_tos: pd.Series) -> pd.Series:
    """AddRedirect target: resolve Location against the request URI and
    strip the fragment (CrawlRunner.cs:73-74)."""
    out = []
    for url, loc in zip(urls, redirect_tos):
        if not isinstance(loc, str) or not isinstance(url, str):
            out.append(None)
            continue
        resolved = resolve_href(url, loc)
        out.append(strip_fragment(canonicalize(resolved) or "") if resolved else None)
    return pd.Series(out, dtype="object")


def crawl_fixture(spark: SparkSession, fixture, settings: CrawlSettings | None = None,
                  **job_kwargs) -> CrawlOutput:
    """Convenience: run a CrawlJob over a WebFixture."""
    from infinitycrawler_spark.functions.robots import parse_robots_txt
    from infinitycrawler_spark.sources.web import pages_df

    settings = settings or CrawlSettings()
    robots_map = {h: parse_robots_txt(t) for h, t in fixture.robots_txt.items()}
    extra = job_kwargs.pop("extra_queue_urls", None)
    job = CrawlJob(
        spark=spark, pages=pages_df(spark, fixture), robots_map=robots_map,
        sitemap_urls=fixture.sitemap_urls, seed_uri=fixture.seed_uri,
        settings=settings, **job_kwargs)
    return job.run(extra_queue_urls=extra)
