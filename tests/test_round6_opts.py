"""Round-6 optimization-equivalence tests.

Every rewrite this round must be observably identical to the shape it
replaced; these tests pin the equivalences directly (the oracle rows
pin them end-to-end).
"""

import pytest
from pyspark.sql import functions as F

from infinitycrawler_spark.operators.dedup import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    word_shingles,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = []
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    for i in range(30):
        # overlapping suffixes → real near-dup structure + unique tails
        rows.append((i, base + f" tail{i % 7} extra{i}"))
    rows.append((100, base + " tail0 extra0"))  # exact dup of doc 0
    rows.append((101, None))                    # NULL text
    rows.append((102, "xy"))                    # < shingle_n words
    return spark.createDataFrame(rows, "doc_id long, text string")


def _old_minhash_pairs(spark, docs, k=8, bands=4, n=3):
    """The round-5 formulation, verbatim (crossJoin + two groupBys +
    collect_list band signatures), as the equivalence reference."""
    words = docs.select("doc_id", F.split("text", " ").alias("words"))
    arr = F.when(
        F.size("words") >= n,
        F.transform(F.sequence(F.lit(1), F.size("words") - (n - 1)),
                    lambda i: F.concat_ws(" ", F.slice("words", i, n))),
    ).otherwise(F.array().cast("array<string>"))
    sh = words.select("doc_id", F.explode(arr).alias("sh")).distinct()
    salts = spark.range(k).select(F.col("id").cast("int").alias("salt"))
    rows_per_band = k // bands
    sigs = (sh.crossJoin(F.broadcast(salts))
            .select("doc_id", "salt",
                    F.md5(F.concat_ws(":", F.col("salt"), F.col("sh"))).alias("h"))
            .groupBy("doc_id", "salt").agg(F.min("h").alias("mh")))
    banded = (sigs
              .withColumn("band", (F.col("salt") / rows_per_band).cast("int"))
              .groupBy("doc_id", "band")
              .agg(F.array_join(F.array_sort(
                  F.collect_list(F.concat_ws("=", F.col("salt"), F.col("mh")))),
                  "|").alias("sig")))
    a = banded.select(F.col("doc_id").alias("doc_a"), "band", "sig")
    b = banded.select(F.col("doc_id").alias("doc_b"), "band", "sig")
    return (a.join(b, ["band", "sig"]).filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b").distinct())


@pytest.mark.parametrize("k,bands", [(8, 4), (8, 3), (6, 2)])
def test_minhash_pairs_equal_old_formulation(spark, docs, k, bands):
    # k=8, bands=3 exercises the salt//rows_per_band grouping the old
    # band expression produced (an extra short band), which the rewrite
    # must reproduce exactly
    new = {(r.doc_a, r.doc_b)
           for r in minhash_lsh_pairs(docs, k=k, bands=bands).collect()}
    old = {(r.doc_a, r.doc_b)
           for r in _old_minhash_pairs(spark, docs, k=k, bands=bands).collect()}
    assert new == old
    assert new  # the planted dup must collide in at least one band


def test_minhash_pairs_string_ids(spark):
    docs = spark.createDataFrame(
        [(f"d{i}", "the same words repeated here forever " * 2)
         for i in range(4)], "doc_id string, text string")
    got = {(r.doc_a, r.doc_b) for r in minhash_lsh_pairs(docs).collect()}
    assert got == {("d0", "d1"), ("d0", "d2"), ("d0", "d3"),
                   ("d1", "d2"), ("d1", "d3"), ("d2", "d3")}


def test_word_shingles_unique_without_distinct_shuffle(spark):
    docs = spark.createDataFrame(
        [(1, "a b c a b c a b c")], "doc_id long, text string")
    rows = word_shingles(docs, 3).collect()
    # per-doc uniqueness preserved (the old .distinct() contract) …
    assert len(rows) == len({(r.doc_id, r.sh) for r in rows})
    assert {r.sh for r in rows} == {"a b c", "b c a", "c a b"}
    # … but with NO aggregate/exchange in the plan (row-local dedup)
    plan = word_shingles(docs, 3)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_ngram_jaccard_window_cap_reuses_shingle_exchange(spark, docs):
    """The df cap rides the shingle exchange as a window count, and at
    runtime AQE reuses that exchange for the self-join's second side
    (the old groupBy-df + left_semi shape exchanged the shingle set
    once per consumer with nothing reusable)."""
    out = ngram_jaccard_pairs(docs.filter("text is not null"),
                              shingle_n=3, threshold=0.8, max_shingle_df=50)
    got = {(r.doc_a, r.doc_b, r.jaccard) for r in out.collect()}
    assert (0, 100, 1.0) in got
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert plan.count("ReusedExchange") >= 1
    # the cap is a Window count over sh, not a join
    assert "windowspecdefinition(sh" in plan


def test_pagerank_releases_all_persists(spark):
    from infinitycrawler_spark.operators.graph import pagerank

    def n_persisted():
        jsc = spark.sparkContext._jsc.sc()
        return jsc.getPersistentRDDs().size()

    before = n_persisted()
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4)], "src long, dst long")
    pr = pagerank(edges, iters=3)
    assert pr.count() == 4
    # edges/nodes/edges_deg persists all released; only the returned
    # eager checkpoint may remain
    assert n_persisted() <= before + 1


def test_star_cc_detects_equal_cardinality_change(spark):
    """The single-action fixpoint (±1-tagged symmetric difference) must
    keep iterating when an iteration changes edges without changing the
    edge COUNT — the case the old count-shortcut alone would miss."""
    from infinitycrawler_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )
    # a 12-ring: every star round rewrites edges at similar cardinality
    n = 12
    edges = spark.createDataFrame(
        [(i, (i + 1) % n) for i in range(n)], "src long, dst long")
    got = {(r.id, r.component)
           for r in connected_components_star(edges).collect()}
    assert got == {(i, 0) for i in range(1, n)} | {(0, 0)}
    # and on a clustered graph it still matches min-label propagation
    e2 = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (11, 12), (12, 10)], "src long, dst long")
    star = {(r.id, r.component)
            for r in connected_components_star(e2).collect()}
    label = {(r.id, r.component)
             for r in connected_components(e2).collect()}
    assert star == label


def test_spread_read_is_identity_on_rows(spark, tmp_path):
    import __spark_entry__ as e

    p = str(tmp_path)
    spark.range(1000).selectExpr("id", "id * 2 as v").coalesce(1) \
        .write.mode("overwrite").parquet(f"{p}/t.parquet")
    plain = {(r.id, r.v) for r in e._t(spark, p, "t").collect()}
    spread = {(r.id, r.v) for r in e._t(spark, p, "t", spread=True).collect()}
    assert plain == spread
    # tiny file (< 4 MB): the spread must be a no-op (no repartition)
    assert "Exchange" not in (e._t(spark, p, "t", spread=True)
                              ._jdf.queryExecution().executedPlan().toString())


# ------------------------------------------------------------------
# bonus-phase rewrites: prefix-filtered ngram join, token_stats runs,
# crawl persist release + adaptive partitioning
# ------------------------------------------------------------------

def _old_ngram_pairs(docs, shingle_n=3, threshold=0.8, max_shingle_df=None):
    """The pre-prefix-filter formulation (full shingle self-join +
    (doc_a, doc_b) groupBy), verbatim, as the equivalence reference."""
    from pyspark.sql import Window
    sh = word_shingles(docs, shingle_n)
    if max_shingle_df is not None:
        w_df = Window.partitionBy("sh")
        sh = (sh.withColumn("df", F.count("*").over(w_df))
              .filter(F.col("df") <= max_shingle_df).drop("df"))
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "sh")
    b = sh.select(F.col("doc_id").alias("doc_b"), "sh")
    common = (a.join(b, "sh")
              .filter(F.col("doc_a") < F.col("doc_b"))
              .groupBy("doc_a", "doc_b")
              .agg(F.count("*").alias("common")))
    sz_a = sizes.select(F.col("doc_id").alias("doc_a"),
                        F.col("sz").alias("sz_a"))
    sz_b = sizes.select(F.col("doc_id").alias("doc_b"),
                        F.col("sz").alias("sz_b"))
    return (common.join(sz_a, "doc_a").join(sz_b, "doc_b")
            .withColumn("jaccard",
                        F.round(F.col("common")
                                / (F.col("sz_a") + F.col("sz_b")
                                   - F.col("common")), 4))
            .filter(F.col("jaccard") >= threshold)
            .select("doc_a", "doc_b", "jaccard"))


@pytest.mark.parametrize("threshold,cap", [(0.8, None), (0.8, 5),
                                           (0.5, None), (0.0, 5), (1.0, None)])
def test_ngram_prefix_filter_equals_old_formulation(spark, docs, threshold, cap):
    new = ngram_jaccard_pairs(docs, shingle_n=3, threshold=threshold,
                              max_shingle_df=cap)
    old = _old_ngram_pairs(docs, shingle_n=3, threshold=threshold,
                           max_shingle_df=cap)
    assert new.exceptAll(old).count() == 0
    assert old.exceptAll(new).count() == 0


def test_ngram_prefix_filter_keeps_exact_threshold_pair(spark):
    """A pair at jaccard == threshold EXACTLY must survive the prefix/
    positional filters (they use t' = t - 1e-4 to absorb the rounding
    boundary of the final round(j, 4) >= t predicate)."""
    # doc 0/1: 9 shingles each, 8 common -> j = 8/10 = 0.8 exactly
    a = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"        # 9 trigram shingles
    b = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 zz"         # 8 shared + 1 own
    docs = spark.createDataFrame(
        [(0, a), (1, b), (2, "q r s t u v")],
        "doc_id long, text string")
    got = [(r.doc_a, r.doc_b, r.jaccard) for r in
           ngram_jaccard_pairs(docs, shingle_n=3, threshold=0.8,
                               max_shingle_df=None).collect()]
    assert got == [(0, 1, 0.8)]


def test_token_stats_equals_old_formula_on_edges(spark):
    from infinitycrawler_spark.operators.text import token_stats
    rows = [(0, "hello world", "en"), (1, "", "en"), (2, "!!! ???", "de"),
            (3, "  a  b  ", "de"), (4, "ABC def", "fr"), (5, None, "fr"),
            (6, "ümlaut tëst", "es"), (7, "-", "es"),
            (8, "a1b2 c3", "zh")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    old_tokens = F.size(F.split(
        F.trim(F.regexp_replace("text", "[^a-z0-9 ]", " ")), " +"))
    old = (docs.select("lang", old_tokens.alias("n_tokens"))
           .groupBy("lang")
           .agg(F.count("*").cast("long").alias("n_docs"),
                F.round(F.avg("n_tokens"), 2).alias("avg_tokens"),
                F.max("n_tokens").alias("max_tokens"),
                F.min("n_tokens").alias("min_tokens"))
           .orderBy("lang"))
    got = token_stats(docs)
    assert [tuple(r) for r in got.collect()] == \
        [tuple(r) for r in old.collect()]


def test_crawl_run_releases_run_scoped_persists(spark, tmp_path):
    from infinitycrawler_spark.functions.robots import parse_robots_txt
    from infinitycrawler_spark.plans.crawl_job import CrawlJob
    from infinitycrawler_spark.settings import (
        CrawlSettings, RequestProcessorOptions)
    from infinitycrawler_spark.sources.web import pages_df
    from infinitycrawler_spark.synth.fixtures import basic_site

    def n_persisted():
        return spark.sparkContext._jsc.sc().getPersistentRDDs().size()

    fx = basic_site()
    settings = CrawlSettings(
        request_processor_options=RequestProcessorOptions().no_delay())
    before = n_persisted()
    job = CrawlJob(
        spark=spark, pages=pages_df(spark, fx),
        robots_map={h: parse_robots_txt(t) for h, t in fx.robots_txt.items()},
        sitemap_urls=fx.sitemap_urls, seed_uri=fx.seed_uri,
        settings=settings, store_root=str(tmp_path / "state"),
        collect_enqueue_log=False, exact_order=False,
        snapshot_every=100, eager_checkpoint=False)
    prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
    out = job.run()
    # adaptive per-round partitioning must restore the session conf
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev_sp
    # run-scoped checkpoints released; only the job's pages cache stays
    assert n_persisted() <= before + 1
    # the returned tables are parquet-backed and remain fully readable
    assert out.results.count() > 0
    assert out.seen.count() >= out.results.count()


def test_adaptive_parts_bounds(spark, tmp_path):
    from infinitycrawler_spark.plans.crawl_job import CrawlJob
    from infinitycrawler_spark.settings import (
        CrawlSettings, RequestProcessorOptions)
    from infinitycrawler_spark.sources.web import pages_df
    from infinitycrawler_spark.synth.fixtures import basic_site

    fx = basic_site()
    job = CrawlJob(
        spark=spark, pages=pages_df(spark, fx), robots_map={},
        sitemap_urls=fx.sitemap_urls, seed_uri=fx.seed_uri,
        settings=CrawlSettings(
            request_processor_options=RequestProcessorOptions().no_delay()),
        store_root=str(tmp_path / "state"))
    cap = job._n_parts_cap
    assert job._adaptive_parts(None) == cap
    assert job._adaptive_parts(0) == cap
    assert job._adaptive_parts(1) == 4
    assert job._adaptive_parts(100) == 4
    assert job._adaptive_parts(6000 * cap + 1) == cap
    assert job._adaptive_parts(10 ** 12) == cap
