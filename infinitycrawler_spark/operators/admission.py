"""Admission operator — CrawlRunner.cs:138-214 as DataFrame algebra.

Pipeline order is semantics (the reference's quirks are load-bearing):

1. host/alias scope filter (CrawlRunner.cs:140-152) — broadcast-style
   membership against the job's allowed-host set;
2. AddLink seen gate — **only** link candidates consult the seen set
   (CrawlRunner.cs:61-64); retries/redirects/seeds bypass it. This is
   the engine's load-bearing anti-join;
3. page budget — sequential fold in enqueue order replicating the
   ``expected == max`` check (CrawlRunner.cs:154-162, `==` not `>=`),
   where redirect candidates skip the check but still consume budget,
   and success-short-circuited candidates consume none. Inherently
   sequential *by reference semantics*; it only runs when
   max_number_of_pages_to_crawl > 0, which caps the crawl (and the
   fold input) at budget scale. At 10^10-frontier scale the budget is
   off and admission is fully parallel;
4. seen insert for every candidate that passed the budget — including
   ones about to be dropped/terminal (CrawlRunner.cs:164 ordering);
5. state checks (CrawlRunner.cs:166-198): success short-circuit,
   MaxRetries (== total attempts), MaxRedirects (result carries chain
   but no attempts, :190-195);
6. robots gate (CrawlRunner.cs:200-213): allowed → frontier; denied →
   RobotsBlocked result with neither attempts nor chain (:208-212).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

from infinitycrawler_spark.functions.robots import RobotsFile
from infinitycrawler_spark.functions.urls import host_of
from infinitycrawler_spark.settings import CrawlSettings

REDIRECT_CODES = (301, 302, 307)

def _order():
    # classic-mode F.col needs an active SparkContext → build lazily
    return [F.col("parent_seq").asc(), F.col("child_pos").asc()]


@dataclass
class AdmissionOutput:
    frontier_add: DataFrame   # FRONTIER columns
    results: DataFrame        # RESULTS columns (admission-time results)
    seen_add: DataFrame       # SEEN columns
    n_enqueued: int
    n_admitted: int
    #: the internal candidates cache — callers unpersist it once the
    #: round's outputs are materialized (keeps CacheManager O(1)/round)
    cached: DataFrame | None = None
    #: further internal caches with the same lifecycle (e.g. the
    #: post-bloom-UDF links branch in broadcast-suspect mode)
    extra_cached: list = field(default_factory=list)


def _robots_allowed_udf(robots_map: dict[str, RobotsFile], base_host: str,
                        per_host_robots: bool, user_agent: str):
    """Vectorized robots gate. Reference-compat mode applies the *base
    host's* robots file to every admitted host (the reference fetches a
    single RobotsFile per crawl, Crawler.cs:49, and consults it for all
    URIs, CrawlRunner.cs:200)."""

    @F.pandas_udf(BooleanType())
    def allowed(hosts: pd.Series, urls: pd.Series) -> pd.Series:
        from infinitycrawler_spark.functions.urls import path_and_query

        out = []
        for host, url in zip(hosts, urls):
            robots = robots_map.get(host if per_host_robots else base_host)
            if robots is None:
                out.append(True)
                continue
            out.append(robots.is_allowed(path_and_query(url), user_agent))
        return pd.Series(out, dtype="bool")

    return allowed


def select_robots_group(robots_rules: DataFrame, user_agent: str) -> DataFrame:
    """Per-host group selection over a ROBOTS_RULES table (host,
    user_agent, allow, disallow, crawl_delay_s): the group whose token
    is contained in the crawl's user agent wins over the ``*`` group
    (RobotsFile.group_for semantics); among several matching tokens the
    longest (then lexicographically first) wins, for determinism. One
    row per host out."""
    ua = user_agent.lower()
    w = Window.partitionBy("host").orderBy(
        F.col("specific").desc(), F.length("user_agent").desc(),
        F.col("user_agent").asc())
    return (robots_rules
            .filter((F.col("user_agent") == "*")
                    | (F.instr(F.lit(ua), F.lower("user_agent")) > 0))
            .withColumn("specific", (F.col("user_agent") != "*").cast("int"))
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("specific", "_rn"))


#: executor-resident compiled-ruleset cache, keyed by host. Bounded:
#: at the cap the whole dict drops (hosts cluster within partitions, so
#: the refill cost is one compile per distinct host per task at worst).
_MATCHER_CACHE: dict = {}
_MATCHER_CACHE_MAX = 50_000


def _matcher_for(key, allow, disallow):
    from infinitycrawler_spark.functions.robots import CompiledRuleset

    m = _MATCHER_CACHE.get(key) if key is not None else None
    if m is None:
        m = CompiledRuleset(allow, disallow)
        if key is not None:
            if len(_MATCHER_CACHE) >= _MATCHER_CACHE_MAX:
                _MATCHER_CACHE.clear()
            _MATCHER_CACHE[key] = m
    return m


def _robots_rules_arrays_udf(user_agent: str, epoch: str | None = None):
    """Vectorized RFC 9309 evaluation over per-row (allow, disallow)
    rule arrays — the robots-as-data path: rules ride a broadcast-joined
    column instead of a driver-held dict, so per-host robots scale to
    any host count. Null arrays (host without robots.txt) → allowed.

    Each host's ruleset compiles ONCE per executor (prefix trie +
    wildcard regex list, functions/robots.py::CompiledRuleset) and is
    reused across rows/batches via an (epoch, host)-keyed cache — a
    rule-heavy host (1k+ rules) costs an O(len(path)) trie walk per row
    instead of a full per-rule scan (VERDICT r3 item 5; A/B in
    BENCH/BASELINE.md). ``epoch`` scopes cache entries to one crawl
    job: within a job a host's broadcast rules are immutable (safe to
    reuse across rounds), while a different job reusing the same host
    name with different rules gets a fresh compile. epoch=None
    (direct/test calls) still compiles per batch-row miss with a
    call-local scope: a fresh uuid per UDF build."""
    import uuid

    if epoch is None:
        epoch = uuid.uuid4().hex

    @F.pandas_udf(BooleanType())
    def allowed(hosts: pd.Series, allow: pd.Series, disallow: pd.Series,
                urls: pd.Series) -> pd.Series:
        from infinitycrawler_spark.functions.urls import path_and_query

        out = []
        for host, al, dis, url in zip(hosts, allow, disallow, urls):
            if al is None and dis is None:
                out.append(True)
                continue
            matcher = _matcher_for(
                (epoch, host) if host is not None else None, al, dis)
            out.append(matcher.is_allowed(path_and_query(url)))
        return pd.Series(out, dtype="bool")

    return allowed


def _budget_fold(flags: list[tuple[bool, bool]], base: int, max_pages: int) -> list[bool]:
    """Exact replication of the serialized budget semantics. Each flag
    is (skip_budget, will_short_circuit)."""
    admitted = []
    total = base
    for skip, short in flags:
        if not skip and total == max_pages:
            admitted.append(False)
            continue
        admitted.append(True)
        if not short:
            total += 1
    return admitted


def _budget_admit_distributed(cands: DataFrame, base: int,
                              max_pages: int) -> DataFrame:
    """The budget fold without collecting candidates to the driver —
    the scale path (driver traffic: one ≤#partitions-row collect plus
    two scalars, independent of candidate count).

    The sequential fold (CrawlRunner.cs:154-162, ``==`` not ``>=``) has
    a closed form over the candidate order sk=(parent_seq, child_pos).
    Let c_i = 1 unless the candidate will success-short-circuit (shorts
    are admitted without consuming budget), and
    pc_i = base + Σ_{j<i} c_j (the running total while everything is
    still admitted). Then:

    - k = first non-skip candidate with pc_k == max_pages — the first
      rejection (if pc jumps past max while only skip_budget redirects
      stream by, the ``==`` check never fires and nothing is rejected);
    - from k the true total freezes at max_pages: non-skips are
      rejected (contributing nothing), skips are admitted;
    - m = first skip with c=1 at/after k — it pushes the total past
      max_pages, after which ``==`` can never fire again and everything
      is admitted (the reference's overshoot bug, replicated).

    Rejected ⟺ non-skip ∧ k ≤ sk < m. The prefix sums use the classic
    two-phase scheme: range-partition by sk, per-partition local prefix
    windows, cross-partition offsets from the tiny per-partition-total
    collect (range partitions are ordered by key).

    ``url`` rides the key as a deterministic tiebreaker: in scale mode
    ``enqueue_seq`` is assigned per-host, so two parents on different
    hosts can share (parent_seq, child_pos); without the tiebreaker the
    boundary predicates would treat such ties as one group and could
    reject a candidate the sequential fold admits when the budget
    saturates exactly between two tied rows."""
    key = [F.col("parent_seq"), F.col("child_pos"), F.col("url")]
    n_parts = max(cands.sparkSession.sparkContext.defaultParallelism, 4)
    d = (cands.select(
            "parent_seq", "child_pos", "url", "skip_budget",
            (~(F.col("has_state") & F.col("eff_success")))
            .cast("long").alias("c"))
         .repartitionByRange(n_parts, *key)
         .withColumn("_pid", F.spark_partition_id())
         .cache())
    totals = d.groupBy("_pid").agg(F.sum("c").alias("t")).collect()
    offs, run = {}, 0
    for r in sorted(totals, key=lambda r: r._pid):
        offs[int(r._pid)] = run
        run += int(r.t)
    if not offs:
        return cands  # no candidates at all
    off_map = F.create_map(
        *[F.lit(v) for kv in sorted(offs.items()) for v in kv])
    w_local = (Window.partitionBy("_pid").orderBy(*key)
               .rowsBetween(Window.unboundedPreceding, -1))
    d = d.withColumn(
        "pc", F.lit(base) + off_map[F.col("_pid")]
        + F.coalesce(F.sum("c").over(w_local), F.lit(0)))
    k = (d.filter((~F.col("skip_budget")) & (F.col("pc") == max_pages))
         .agg(F.min(F.struct(*key)).alias("k")).first()["k"])
    if k is None:
        d.unpersist()
        return cands  # pc never equals max at a checked candidate

    def _key_lit(row):
        return F.struct(
            F.lit(int(row[0])).cast("long").alias("parent_seq"),
            F.lit(int(row[1])).cast("int").alias("child_pos"),
            F.lit(str(row[2])).alias("url"))

    k_lit = _key_lit(k)
    m = (d.filter(F.col("skip_budget") & (F.col("c") == 1)
                  & (F.struct(*key) >= k_lit))
         .agg(F.min(F.struct(*key)).alias("m")).first()["m"])
    d.unpersist()
    rejected = (~F.col("skip_budget")) & (F.struct(*key) >= k_lit)
    if m is not None:
        rejected = rejected & (F.struct(*key) < _key_lit(m))
    return cands.filter(~rejected)


def _empty_results(spark, like: DataFrame | None = None):
    from infinitycrawler_spark import schemas
    return spark.createDataFrame([], schema=schemas.RESULTS)


def admit(
    candidates: DataFrame,
    seen: DataFrame,
    states: DataFrame,
    robots_map: dict[str, RobotsFile],
    settings: CrawlSettings,
    base_host: str,
    budget_base: int,
    seq_base: int,
    round_no: int,
    per_host_robots: bool = False,
    exact_order: bool = True,
    lazy_counts: bool = False,
    bloom_store=None,
    robots_rules: DataFrame | None = None,
    scope_hosts: DataFrame | None = None,
    robots_epoch: str | None = None,
    att_hist: DataFrame | None = None,
    hop_hist: DataFrame | None = None,
) -> AdmissionOutput:
    """candidates: CANDIDATES schema rows for one round, where
    ``moved_chain`` is set for redirect candidates. ``states`` must be
    the post-fetch-update state table *including* this round's redirect
    state moves, so a plain left join yields each candidate's effective
    crawl state.

    When ``att_hist``/``hop_hist`` are provided (split-history mode —
    the CrawlJob default), ``states`` carries only the live row
    (schemas.STATES_LIVE) and the attempt/hop logs the MaxRetries /
    MaxRedirects result rows need are gathered on demand from the
    append-only history tables for just those (tiny) url sets —
    state/history.py's scan-not-shuffle pattern. Without them, the
    legacy full-schema states path is used (states must carry
    att_log/hop_logs columns)."""
    spark = candidates.sparkSession
    extra_cached: list[DataFrame] = []

    # 1. host scope. ``scope_hosts`` (a one-column DataFrame built once
    # by the caller) scales to any alias-set size: an isin() literal
    # list costs one py4j round-trip per host on every admit call and
    # bloats every downstream plan with an |hosts|-ary In predicate
    # (measured ~2 s/round of driver time at 1 620 hosts), while the
    # broadcast semi-join is O(1) to build and plan.
    if scope_hosts is not None:
        cands = candidates.join(F.broadcast(scope_hosts.select("host")),
                                "host", "left_semi")
    else:
        if settings.host_aliases is not None:
            allowed_hosts = {base_host, *settings.host_aliases}
        else:
            allowed_hosts = {base_host}
        cands = candidates.filter(F.col("host").isin(list(allowed_hosts)))

    # engine extension (north rule): depth cap, off by default
    if settings.max_depth > 0:
        cands = cands.filter(F.col("depth") <= settings.max_depth)

    # 2. AddLink seen gate + within-round first occurrence (links only).
    # With a Bloom filter over the seen keys, filter-negative candidates
    # are definitely new and skip the anti-join entirely; only
    # filter-positive ones (a small fraction at 10^10 scale) pay the
    # shuffle. Exactness still comes from the anti-join.
    links = cands.filter(F.col("kind") == "link")
    others = cands.filter(F.col("kind") != "link")
    if bloom_store is not None:
        # cluster candidates by bloom bucket first so each check task
        # loads ~one bucket blob (at 10^10 scale blobs can't all fit on
        # every worker); rows of one url share a bucket, so downstream
        # url-keyed ops are unaffected
        nb = bloom_store.n_buckets
        links = links.repartition(
            nb, F.pmod(F.xxhash64("url"), F.lit(nb)))
        links = links.withColumn(
            "_maybe", bloom_store.maybe_seen_udf()(F.xxhash64("url")))
        if settings.seen_broadcast_suspects:
            # three consumers branch off this point (fresh, suspect,
            # and the sus_urls broadcast build) — cache it so the
            # bloom UDF runs once per row, not once per consumer;
            # lifecycle via extra_cached (callers unpersist per round)
            links = links.cache()
            extra_cached.append(links)
        fresh = links.filter(~F.col("_maybe")).drop("_maybe")
        suspect = links.filter(F.col("_maybe")).drop("_maybe")
        if settings.seen_broadcast_suspects:
            # scan-not-shuffle: suspects (small — bloom hits + FPs) are
            # broadcast against a columnar SCAN of seen; the confirmed
            # hits (≤ suspects) broadcast back into an anti-join. The
            # seen table is never sorted or shuffled — at 10^10 URLs
            # the per-round seen cost drops from shuffle O(|seen|) to
            # scan O(|seen|), and the scan prunes to the url column.
            sus_urls = suspect.select("url").distinct()
            hits = seen.select("url").join(
                F.broadcast(sus_urls), "url", "left_semi")
            suspect = suspect.join(F.broadcast(hits), "url", "left_anti")
        else:
            suspect = suspect.join(seen.select("url"), "url", "left_anti")
        links = fresh.unionByName(suspect)
    else:
        links = links.join(seen.select("url"), "url", "left_anti")
    w_first = Window.partitionBy("url").orderBy(*_order())
    links = (links.withColumn("_rn", F.row_number().over(w_first))
             .filter(F.col("_rn") == 1).drop("_rn"))
    cands = others.unionByName(links)

    # 3. effective crawl state (incl. the CrawlRequest / redirect-hop
    # logs the result rows carry — CrawledUri.cs:16-17)
    from infinitycrawler_spark.schemas import ATT_LOG_DDL, HOP_LOG_DDL

    # Split-history mode (att_hist provided — the CrawlJob default):
    # states carries only live rows; the log arrays are gathered in
    # step 6 for just the MaxRetries/MaxRedirects subsets (tiny).
    split_hist = att_hist is not None
    if split_hist:
        st = states.selectExpr("url", "n_attempts as st_attempts",
                               "redirect_chain as st_chain",
                               "last_success as st_success")
        log_exprs = []
    else:
        st = states.selectExpr("url", "n_attempts as st_attempts",
                               "redirect_chain as st_chain",
                               "last_success as st_success",
                               "att_log as st_att", "hop_logs as st_hops")
        log_exprs = [
            f"coalesce(st_att, cast(array() as {ATT_LOG_DDL})) as eff_att",
            f"coalesce(st_hops, cast(array() as {HOP_LOG_DDL})) as eff_hops",
        ]
    cands = cands.join(st, "url", "left").selectExpr(
        "*",
        "st_attempts is not null as has_state",
        "coalesce(st_attempts, 0) as eff_attempts",
        "coalesce(st_chain, moved_chain, cast(array() as array<string>))"
        " as eff_chain",
        "coalesce(st_success, false) as eff_success",
        *log_exprs,
    )

    # 4. budget fold. exact_order (reference replay / tests) keeps the
    # literal driver-side fold; scale mode uses the distributed closed
    # form — no candidate-count-proportional driver traffic, so a user
    # can set max_pages=10^8 over a huge frontier without a per-round
    # driver collect (VERDICT r2 §wrong 1).
    max_pages = settings.max_number_of_pages_to_crawl
    if max_pages > 0 and not exact_order:
        cands = _budget_admit_distributed(cands, budget_base, max_pages)
    elif max_pages > 0:
        ordered = (cands
                   .select("parent_seq", "child_pos", "skip_budget",
                           (F.col("has_state") & F.col("eff_success")).alias("short"))
                   .orderBy(*_order())
                   .collect())
        flags = [(r.skip_budget, r.short) for r in ordered]
        admitted_flags = _budget_fold(flags, budget_base, max_pages)
        admitted_keys = [(r.parent_seq, r.child_pos)
                         for r, a in zip(ordered, admitted_flags) if a]
        if not admitted_keys:
            cands = cands.limit(0)
        else:
            keys_df = spark.createDataFrame(
                admitted_keys, schema="parent_seq long, child_pos int")
            cands = cands.join(F.broadcast(keys_df), ["parent_seq", "child_pos"], "left_semi")

    # always cache: three consumers (seen insert, results routing, enqueue)
    # would otherwise recompute the explode+anti-join+window pipeline
    cands = cands.cache()
    n_admitted = -1 if lazy_counts else cands.count()
    try:
        return _admit_post_cache(
            cands, n_admitted, extra_cached, spark, seen, settings,
            robots_map, base_host, round_no, seq_base, per_host_robots,
            exact_order, lazy_counts, robots_rules, robots_epoch,
            att_hist, hop_hist)
    except Exception:
        # the caller only unpersists via AdmissionOutput; on failure that
        # output never exists, so release the caches here or they leak
        # across failed rounds in a long-lived session
        for df in [cands, *extra_cached]:
            try:
                df.unpersist()
            except Exception:
                pass
        raise


def _admit_post_cache(
    cands: DataFrame,
    n_admitted: int,
    extra_cached: list[DataFrame],
    spark,
    seen: DataFrame,
    settings,
    robots_map,
    base_host: str,
    round_no: int,
    seq_base: int,
    per_host_robots,
    exact_order: bool,
    lazy_counts: bool,
    robots_rules,
    robots_epoch,
    att_hist=None,
    hop_hist=None,
) -> AdmissionOutput:
    from infinitycrawler_spark.schemas import ATT_LOG_DDL, HOP_LOG_DDL

    # 5. seen insert for every admitted candidate (CrawlRunner.cs:164)
    seen_add = (cands.select("url", "host").distinct()
                .join(seen.select("url"), "url", "left_anti")
                .selectExpr("url", "xxhash64(url) as url_key", "host"))

    # 6. state checks — routing precedence mirrors CrawlRunner.cs:166-198
    n_retries = settings.number_of_retries
    max_redirects = settings.max_number_of_redirects
    # max_redirects fires only when crawlState.Redirects is non-null
    # (CrawlRunner.cs:187) — non-null ⟺ at least one redirect, so the
    # size>0 guard keeps max_number_of_redirects=0 from eating retries
    routed = cands.withColumn("route", F.expr(f"""
        case when has_state and eff_success then 'drop'
             when has_state and eff_attempts = {int(n_retries)}
               then 'max_retries'
             when has_state and size(eff_chain) > 0
               and size(eff_chain) = {int(max_redirects)}
               then 'max_redirects'
             else 'gate' end"""))

    if robots_rules is not None:
        # robots-as-data (scale path): per-host rule arrays broadcast-
        # joined in, RFC 9309 match vectorized via per-host compiled
        # matchers (executor-cached) — no driver-held dict, host count
        # unbounded
        sel = select_robots_group(robots_rules, settings.user_agent)
        arr_udf = _robots_rules_arrays_udf(settings.user_agent,
                                           epoch=robots_epoch)
        gated = (routed.filter(F.col("route") == "gate")
                 .join(F.broadcast(sel.select("host", "allow", "disallow")),
                       "host", "left")
                 .withColumn("robots_ok",
                             arr_udf(F.col("host"), F.col("allow"),
                                     F.col("disallow"), F.col("url")))
                 .drop("allow", "disallow"))
    else:
        allowed_udf = _robots_allowed_udf(robots_map, base_host,
                                          per_host_robots,
                                          settings.user_agent)
        gated = routed.filter(F.col("route") == "gate").withColumn(
            "robots_ok", allowed_udf(F.col("host"), F.col("url")))

    # one selectExpr call per table: each py4j Column round-trip costs
    # ~1-3 ms and these 13-column literal projections rebuild every
    # round — string expressions cut the driver DAG-construction time
    # ~4x (measured; plans are identical)
    def _res(df, status: str, attempts: str, chain: str,
             att_log: str, hops: str) -> DataFrame:
        # admission results never carry Content (the reference emits
        # them without a CrawledContent — CrawlRunner.cs:178-213)
        return df.selectExpr(
            "url", "host", f"'{status}' as status",
            f"{attempts} as n_attempts", f"{chain} as redirect_chain",
            "cast(null as int) as last_status_code",
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
            f"{att_log} as attempts", f"{hops} as redirect_hops",
        )

    mr = routed.filter("route = 'max_retries'")
    mrd = routed.filter("route = 'max_redirects'")
    if att_hist is not None:
        # split-history mode: gather the log arrays for just these two
        # (tiny) url sets from the append-only history tables — the
        # broadcast-driven scan never shuffles or rewrites the history
        from infinitycrawler_spark.state.history import (
            gather_attempts,
            gather_hops,
        )

        # checkpointed (tiny url list): `need` embeds the routed tree
        # twice and is itself embedded in both gathers, which are then
        # joined back onto mr/mrd — without truncation the candidates
        # subtree is re-analyzed ~6× per round (driver planning time)
        need = (mr.select("url").unionByName(mrd.select("url")).distinct()
                .coalesce(1).localCheckpoint(eager=False))
        ga = gather_attempts(att_hist, need, out_col="eff_att")
        gh = gather_hops(hop_hist, need, out_col="eff_hops")
        mr = mr.join(ga, "url", "left").join(gh, "url", "left")
        mrd = mrd.join(gh, "url", "left")
        att_expr = f"coalesce(eff_att, cast(array() as {ATT_LOG_DDL}))"
        hops_expr = f"coalesce(eff_hops, cast(array() as {HOP_LOG_DDL}))"
    else:
        att_expr, hops_expr = "eff_att", "eff_hops"
    res_retries = _res(mr, "MaxRetries", "eff_attempts", "eff_chain",
                       att_expr, hops_expr)
    # MaxRedirects result omits attempts (CrawlRunner.cs:190-195 emits
    # RedirectChain but no Requests)
    res_redirects = _res(mrd, "MaxRedirects", "0", "eff_chain",
                         f"cast(array() as {ATT_LOG_DDL})", hops_expr)
    # RobotsBlocked at admission carries neither (CrawlRunner.cs:208-212)
    res_blocked = _res(gated.filter("not robots_ok"), "RobotsBlocked",
                       "0", "cast(array() as array<string>)",
                       f"cast(array() as {ATT_LOG_DDL})",
                       f"cast(array() as {HOP_LOG_DDL})")
    results = res_retries.unionByName(res_redirects).unionByName(res_blocked)

    # 7. enqueue: deterministic sequence numbers
    enq = gated.filter(F.col("robots_ok"))
    if exact_order:
        # guard the single-partition global window — at production scale
        # it silently serializes the round; refuse loudly instead
        limit = getattr(settings, "exact_order_max_candidates", 0)
        if limit and n_admitted == -1:
            # lazy_counts must not disable the guard (ADVICE r4): the
            # count here is one action over the already-cached cands
            n_admitted = cands.count()
        if limit and n_admitted > limit:
            raise ValueError(
                f"exact_order=True admitted {n_admitted} candidates in one "
                f"round (> exact_order_max_candidates={limit}); the global "
                "enqueue window would run on a single partition. Use "
                "exact_order=False for large crawls, or raise "
                "CrawlSettings.exact_order_max_candidates deliberately.")
        w_seq = Window.orderBy(*_order())
    else:
        # scale mode: per-host FIFO is all politeness needs; avoids the
        # single-partition global window
        w_seq = Window.partitionBy("host").orderBy(*_order())
    prio = settings.priority_expr or "0"
    frontier_add = enq.withColumn(
        "enqueue_seq", F.row_number().over(w_seq) + F.lit(seq_base)
    ).selectExpr(
        "url", "host", "xxhash64(url) as url_key",
        "enqueue_seq", "depth", f"{int(round_no)} as round_enqueued",
        f"cast(coalesce({prio}, 0) as int) as priority",
    )

    n_enqueued = -1 if lazy_counts else frontier_add.count()
    return AdmissionOutput(
        frontier_add=frontier_add,
        results=results,
        seen_add=seen_add,
        n_enqueued=n_enqueued,
        n_admitted=n_admitted,
        cached=cands,
        extra_cached=extra_cached,
    )
