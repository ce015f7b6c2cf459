"""Scale-shape invariants for the training-data operators:

- top-k plans as TakeOrderedAndProject (distributed per-partition top-k
  + driver merge), never a single-partition Exchange of the full scored
  relation;
- n-gram Jaccard candidate generation is bounded by the shingle
  document-frequency cap — a boilerplate shingle shared by every doc
  must NOT produce quadratic candidate pairs;
- embedding near-dup pairs are LSH-bucket-blocked: a hot label alone
  does not make the self-join all-pairs.
"""

import pytest
from pyspark.sql import functions as F

from infinitycrawler_spark.operators.dedup import (
    embedding_dup_pairs,
    ngram_jaccard_pairs,
)
from infinitycrawler_spark.operators.similarity import cosine_topk, lsh_ann_topk


@pytest.fixture(scope="module")
def embeddings(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    rows = []
    for i in range(200):
        v = rng.normal(size=16).astype(float)
        rows.append((i, int(i % 3), [float(x) for x in v]))
    return spark.createDataFrame(
        rows, schema="vec_id long, label int, embedding array<double>")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_cosine_topk_uses_take_ordered(spark, embeddings):
    plan = _plan(cosine_topk(embeddings, query_vec_id=0, k=10))
    assert "TakeOrderedAndProject" in plan
    # the only allowed single-partition exchange is the k-row rank window,
    # which sits ABOVE the TakeOrdered; the scored relation (TakeOrdered's
    # subtree, printed after it) must never pass through one partition
    subtree = plan.split("TakeOrderedAndProject", 1)[1]
    assert "Exchange SinglePartition" not in subtree


def test_lsh_ann_topk_uses_take_ordered(spark, embeddings):
    plan = _plan(lsh_ann_topk(embeddings, query_vec_id=0, k=10, n_planes=4))
    assert "TakeOrderedAndProject" in plan


def test_topk_rows_deterministic(spark, embeddings):
    a = cosine_topk(embeddings, query_vec_id=0, k=5).collect()
    b = cosine_topk(embeddings.repartition(7), query_vec_id=0, k=5).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert [r.rank for r in a] == [1, 2, 3, 4, 5]


def test_ngram_jaccard_df_cap_bounds_boilerplate(spark):
    # 40 docs sharing ONE boilerplate shingle + unique content.
    # Uncapped, the boilerplate alone yields C(40,2)=780 candidate pairs;
    # capped, zero pairs reach the join (the unique shingles never match).
    docs = spark.createDataFrame(
        [(i, f"copyright footer boilerplate unique{i} text{i} words{i}")
         for i in range(40)],
        schema="doc_id long, text string")
    capped = ngram_jaccard_pairs(docs, shingle_n=3, threshold=0.0,
                                 max_shingle_df=5)
    uncapped = ngram_jaccard_pairs(docs, shingle_n=3, threshold=0.0,
                                   max_shingle_df=None)
    assert uncapped.count() == 40 * 39 // 2
    assert capped.count() == 0


def test_ngram_jaccard_cap_keeps_real_dups(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [(0, base), (1, base),  # exact dup pair
         *[(i, f"filler{i} junk{i} noise{i} pad{i}") for i in range(2, 10)]],
        schema="doc_id long, text string")
    out = ngram_jaccard_pairs(docs, shingle_n=3, threshold=0.8,
                              max_shingle_df=5).collect()
    assert [(r.doc_a, r.doc_b, r.jaccard) for r in out] == [(0, 1, 1.0)]


def test_embedding_dups_lsh_blocked(spark, embeddings):
    # planted exact duplicates land in the same LSH bucket → found;
    # plan must join on (bucket, label), not label alone
    planted = (embeddings.filter(F.col("vec_id") < 10)
               .withColumn("vec_id", F.col("vec_id") + 1000))
    df = embedding_dup_pairs(embeddings.unionByName(planted), threshold=0.999)
    found = {(r.label, r.n_pairs) for r in df.collect()}
    # 10 planted dups across 3 labels: vec_ids 0..9 → labels 0,1,2,0,1,...
    assert sum(n for _, n in found) >= 10
    plan = _plan(df)
    assert "bucket" in plan
