"""Round-5 hardening (VERDICT/ADVICE r4): phash bands=1 long overflow,
minhash hot-band cap, pagerank post-return usability, admission cache
release on failure + exact_order guard under lazy_counts, star-contraction
connected components for high-diameter graphs, and streaming session-state
versioning."""

import glob
import shutil
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from infinitycrawler_spark import schemas
from infinitycrawler_spark.operators.admission import admit
from infinitycrawler_spark.operators.dedup import minhash_lsh_pairs, phash_dup_pairs
from infinitycrawler_spark.operators.graph import (
    connected_components,
    connected_components_star,
    pagerank,
)
from infinitycrawler_spark.settings import CrawlSettings


def _n_persisted(spark):
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


# ---------------------------------------------------------------- phash


def test_phash_bands1_threshold0_no_long_overflow(spark):
    """threshold=0 derives bands=1 → 64-bit chunk; the (1<<64)-1 mask
    used to overflow java long at plan build (ADVICE r4). bands=1 must
    plan fine and find exactly the identical-phash pairs."""
    rows = [("a", 7), ("b", 7), ("c", 8)]
    imgs = spark.createDataFrame(rows, "image_id string, phash long")
    got = phash_dup_pairs(imgs, threshold=0).collect()
    assert [(r.image_a, r.image_b, r.hamming) for r in got] == [("a", "b", 0)]
    # explicit bands=1 with a nonzero threshold also plans (recall loss
    # for t>0 is the caller's explicit choice)
    got2 = phash_dup_pairs(imgs, threshold=1, bands=1).collect()
    assert [(r.image_a, r.image_b) for r in got2] == [("a", "b")]


# -------------------------------------------------------------- minhash


def test_minhash_max_band_df_caps_boilerplate_buckets(spark):
    """10 identical docs share every band signature; with the cap below
    the bucket size, candidate generation drops the hot buckets entirely
    (bounded cost), and without the cap all 45 pairs surface."""
    docs = spark.createDataFrame(
        [(f"d{i:02d}", "the same boilerplate text repeated here " * 2)
         for i in range(10)], "doc_id string, text string")
    uncapped = minhash_lsh_pairs(docs).count()
    assert uncapped == 45
    assert minhash_lsh_pairs(docs, max_band_df=3).count() == 0
    # a cap above the bucket size changes nothing
    assert minhash_lsh_pairs(docs, max_band_df=10).count() == 45


# ------------------------------------------------------------- pagerank


def test_pagerank_result_survives_reuse_without_leak(spark):
    """The returned frame must be reusable after pagerank() releases its
    internal caches (ADVICE r4: unpersist-before-materialize), and those
    caches must not linger."""
    before = _n_persisted(spark)
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string")
    ranks = pagerank(e, iters=3, checkpoint_every=0)
    first = sorted((r.id, r.rank) for r in ranks.collect())
    second = sorted((r.id, r.rank) for r in ranks.collect())
    assert first == second and len(first) == 3
    # the edges_deg cache is gone; at most the eager localCheckpoint of
    # the returned result remains (checkpoint RDDs are ContextCleaner-
    # managed — released when `ranks` is garbage collected)
    assert _n_persisted(spark) <= before + 1
    del ranks


# ------------------------------------------------------------ admission


def _cand_fixture(spark, n=5):
    rows = [(f"http://h/p{i}", "h", "link", 0, i, 1, False, None)
            for i in range(n)]
    cands = spark.createDataFrame(rows, schema=schemas.CANDIDATES)
    seen = spark.createDataFrame([], schema=schemas.SEEN)
    states = spark.createDataFrame([], schema=schemas.STATES)
    return cands, seen, states


def test_exact_order_guard_fires_under_lazy_counts(spark):
    """lazy_counts=True must not silently disable the single-partition
    window guard (ADVICE r4) — the count is computed on demand."""
    cands, seen, states = _cand_fixture(spark)
    settings = CrawlSettings(exact_order_max_candidates=2)
    with pytest.raises(ValueError, match="exact_order_max_candidates"):
        admit(cands, seen, states, {}, settings, "h",
              budget_base=0, seq_base=0, round_no=1,
              exact_order=True, lazy_counts=True)


def test_admit_releases_caches_when_raising(spark):
    """A failed admit() never hands the caller an AdmissionOutput, so it
    must release its own caches (ADVICE r4) — otherwise failed rounds
    accumulate CacheManager entries in a long-lived session."""
    before = _n_persisted(spark)
    cands, seen, states = _cand_fixture(spark)
    settings = CrawlSettings(exact_order_max_candidates=2)
    with pytest.raises(ValueError):
        admit(cands, seen, states, {}, settings, "h",
              budget_base=0, seq_base=0, round_no=1,
              exact_order=True, lazy_counts=True)
    assert _n_persisted(spark) == before


# ------------------------------------------------- star-contraction CC


def _ring(spark, n):
    names = [f"r{i:02d}" for i in range(n)]
    pairs = list(zip(names, names[1:])) + [(names[-1], names[0])]
    return spark.createDataFrame(pairs, "src string, dst string")


def test_min_label_fails_on_high_diameter_ring(spark):
    """A 50-ring has diameter 25 > the default 20-round budget: min-label
    propagation must refuse loudly (its scope is near-clique dedup
    clusters), and star contraction must close it in O(log n) rounds."""
    ring = _ring(spark, 50)
    with pytest.raises(RuntimeError, match="no fixpoint"):
        connected_components(ring)
    got = connected_components_star(ring).collect()
    assert len(got) == 50
    assert {r.component for r in got} == {"r00"}


def test_star_equals_min_label_on_clustered_graph(spark):
    """On the dedup-cluster shape (several small components) the two
    algorithms must produce identical labelings."""
    e = spark.createDataFrame(
        [("b", "c"), ("a", "b"), ("e", "f"), ("f", "g"), ("e", "g"),
         ("x", "y")], "src string, dst string")
    label = {r.id: r.component for r in connected_components(e).collect()}
    star = {r.id: r.component
            for r in connected_components_star(e).collect()}
    assert star == label
    assert star["c"] == "a" and star["g"] == "e" and star["y"] == "x"


def test_star_single_edge_and_self_loop(spark):
    e = spark.createDataFrame(
        [("a", "b"), ("c", "c")], "src string, dst string")
    got = {r.id: r.component
           for r in connected_components_star(e).collect()}
    # the self-loop node has no real neighbours → unlabelled (same
    # contract as min-label: only nodes with edges after u!=v filter)
    assert got == {"a": "a", "b": "a"}


# ------------------------------------------------ split-history states


def test_resume_from_legacy_array_states_store(spark, tmp_path):
    """A store written by the pre-split engine carried att_log/hop_logs
    arrays ON the states rows. Resuming over one must (a) explode the
    arrays into the append-only history tables, (b) converge to the
    exact golden result, and (c) persist the migrated history so a
    second resume still has it."""
    import os
    import shutil

    from infinitycrawler_spark import golden
    from infinitycrawler_spark.functions.robots import parse_robots_txt
    from infinitycrawler_spark.plans.crawl_job import CrawlJob
    from infinitycrawler_spark.settings import (
        CrawlSettings,
        RequestProcessorOptions,
    )
    from infinitycrawler_spark.sources.web import pages_df
    from infinitycrawler_spark.state.history import gather_attempts, gather_hops
    from infinitycrawler_spark.state.store import SnapshotStore
    from infinitycrawler_spark.synth.fixtures import basic_site

    settings = CrawlSettings(
        request_processor_options=RequestProcessorOptions().no_delay())

    def job(root):
        fx = basic_site()
        return CrawlJob(
            spark=spark, pages=pages_df(spark, fx),
            robots_map={h: parse_robots_txt(t)
                        for h, t in fx.robots_txt.items()},
            sitemap_urls=fx.sitemap_urls, seed_uri=fx.seed_uri,
            settings=settings, store_root=root, snapshot_every=1)

    root = str(tmp_path / "state")
    # partial crawl (deterministic cut) → committed mid-crawl snapshot
    # in the NEW format, with attempt history already populated
    job(root).run(max_rounds=2)

    # rewrite the snapshot in the LEGACY format: arrays back onto the
    # states rows, history delta files removed
    store = SnapshotStore(root)
    v = store.versions()[-1]
    live = store.read_table(spark, v, "states")
    assert "att_log" not in live.columns  # new engine writes live rows
    att = store.read_deltas(spark, v, "attempts")
    hops = store.read_deltas(spark, v, "hops")
    legacy = live
    if att is not None:
        legacy = legacy.join(
            gather_attempts(att, None, out_col="att_log"), "url", "left")
    else:
        legacy = legacy.selectExpr(
            "*", "cast(null as array<struct<start_ms:double,"
            "elapsed_ms:double,status_code:int,is_success:boolean>>)"
            " as att_log")
    if hops is not None:
        legacy = legacy.join(
            gather_hops(hops, None, out_col="hop_logs"), "url", "left")
    else:
        legacy = legacy.selectExpr(
            "*", "cast(null as array<struct<location:string,"
            "attempts:array<struct<start_ms:double,elapsed_ms:double,"
            "status_code:int,is_success:boolean>>>>) as hop_logs")
    tmp_out = str(tmp_path / "legacy_states.parquet")
    legacy.write.mode("overwrite").parquet(tmp_out)
    for vv in store.versions():
        vdir = store._vdir(vv)
        for name in ("attempts_delta.parquet", "hops_delta.parquet"):
            p = os.path.join(vdir, name)
            if os.path.exists(p):
                shutil.rmtree(p)
    states_path = os.path.join(store._vdir(v), "states.parquet")
    shutil.rmtree(states_path)
    shutil.move(tmp_out, states_path)

    # resume over the legacy store → exact golden convergence
    g = golden.crawl(basic_site(), settings)
    resumed = job(root).run(resume=True)
    got = {(r.url, r.status, r.n_attempts) for r in resumed.results.collect()}
    assert got == {(r.url, r.status, r.n_attempts) for r in g.results}
    assert {r.url for r in resumed.seen.collect()} == g.seen
    # attempt logs survived the migration: every Crawled result carries
    # exactly n_attempts attempt records
    for r in resumed.results.collect():
        if r.status == "Crawled":
            assert len(r.attempts) == r.n_attempts, r.url
    # the migrated history was persisted for future resumes
    v2 = store.versions()[-1]
    assert store.read_deltas(spark, v2, "attempts") is not None
    again = job(root).run(resume=True)
    got2 = {(r.url, r.status, r.n_attempts) for r in again.results.collect()}
    assert got2 == got


def test_scale_mode_deferred_checkpoints_match_golden(spark, tmp_path):
    """The cluster-topology checkpoint schedule (hop segment + results
    delta created on the action thread — CrawlJob.defer_heavy_checkpoints,
    auto-on for non-local masters) must produce the identical crawl;
    forced on here since tests run on a local master."""
    from infinitycrawler_spark import golden
    from infinitycrawler_spark.functions.robots import parse_robots_txt
    from infinitycrawler_spark.plans.crawl_job import CrawlJob
    from infinitycrawler_spark.settings import (
        CrawlSettings,
        RequestProcessorOptions,
    )
    from infinitycrawler_spark.sources.web import pages_df
    from infinitycrawler_spark.synth.fixtures import basic_site

    fx = basic_site()
    settings = CrawlSettings(
        request_processor_options=RequestProcessorOptions().no_delay())
    job = CrawlJob(
        spark=spark, pages=pages_df(spark, fx),
        robots_map={h: parse_robots_txt(t) for h, t in fx.robots_txt.items()},
        sitemap_urls=fx.sitemap_urls, seed_uri=fx.seed_uri,
        settings=settings, store_root=str(tmp_path / "state"),
        collect_enqueue_log=False, exact_order=False,
        snapshot_every=2, eager_checkpoint=False,
        defer_heavy_checkpoints=True)
    assert job._defer_ckpt is True
    out = job.run()
    g = golden.crawl(basic_site(), settings)
    assert {(r.url, r.status, r.n_attempts) for r in out.results.collect()} \
        == {(r.url, r.status, r.n_attempts) for r in g.results}
    assert {r.url for r in out.seen.collect()} == g.seen
    # attempt logs still complete through the deferred path
    for r in out.results.collect():
        if r.status == "Crawled":
            assert len(r.attempts) == r.n_attempts, r.url


# ----------------------------------------------------------- streaming


def _write_events(spark, stream_dir, tag, ts_list, tmp_path):
    from infinitycrawler_spark.streaming.events import EVENTS_SCHEMA

    rows = [(i, ts, 1, "click", 1.0, None) for i, ts in enumerate(ts_list)]
    out = tmp_path / f"stage_{tag}"
    (spark.createDataFrame(rows, EVENTS_SCHEMA)
     .coalesce(1).write.mode("overwrite").parquet(str(out)))
    part = glob.glob(f"{out}/part-*.parquet")[0]
    shutil.copy(part, f"{stream_dir}/{tag}.parquet")


def test_session_state_version_mismatch_fails_fast(spark, tmp_path):
    """Resuming the sessionizer over a checkpoint written by an older
    state version must raise the typed error, never misread (VERDICT r4
    missing #3)."""
    from infinitycrawler_spark.streaming.events import (
        read_events_stream,
        sessionize_stream,
    )

    stream_dir = tmp_path / "events"
    stream_dir.mkdir()
    cp = str(tmp_path / "cp")
    _write_events(spark, stream_dir, "b1",
                  [datetime(2024, 1, 1, 10, 0), datetime(2024, 1, 1, 11, 0)],
                  tmp_path)

    def _run(name, version):
        df = sessionize_stream(read_events_stream(spark, str(stream_dir)),
                               state_version=version)
        # memory sink can't recover from a checkpoint; foreachBatch can
        return (df.writeStream.foreachBatch(lambda b, _id: b.count())
                .queryName(name)
                .outputMode("update").option("checkpointLocation", cp)
                .trigger(availableNow=True).start())

    q1 = _run("s5_v1", 1)
    q1.awaitTermination(120)
    assert q1.exception() is None

    # new data for the same key so the resumed operator reads its state
    _write_events(spark, stream_dir, "b2",
                  [datetime(2024, 1, 1, 11, 30)], tmp_path)
    q2 = _run("s5_v2", 2)
    with pytest.raises(Exception, match="SessionStateVersionError"):
        q2.awaitTermination()
