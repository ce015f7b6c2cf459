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
