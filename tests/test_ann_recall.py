"""ANN recall measurement (VERDICT r3 item 7): recall@10 of the
LSH-bucketed top-k vs the brute-force baseline on a corpus where
buckets actually prune, so LSH tuning has a pinned reference point.

Corpus: 40 unit-norm cluster centers × 25 members with σ=0.05 Gaussian
noise (dim 64, fixed seed) — each query's true top-10 are cluster-mates.
Pinned numbers (documented in README):

- single-table LSH (n_planes=4, n_tables=1): recall@10 ≈ 0.47 —
  candidates are one bucket (~7% of corpus) and recall collapses toward
  the bucket fraction; kept as the cheapest configuration;
- OR-amplified LSH (n_planes=4, n_tables=4): recall@10 ≥ 0.9 (measured
  0.925) while candidates stay ≤ 35% of the corpus per query.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from infinitycrawler_spark.operators.similarity import (
    cosine_topk,
    lsh_ann_topk,
    lsh_bucket,
)

N_CLUSTERS, PER_CLUSTER, DIM, SIGMA = 40, 25, 64, 0.05
QUERIES = list(range(0, 200, 25))  # one representative per 8 clusters


def _corpus():
    rng = np.random.default_rng(123)
    centers = rng.standard_normal((N_CLUSTERS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    pts = (np.repeat(centers, PER_CLUSTER, axis=0)
           + SIGMA * rng.standard_normal((N_CLUSTERS * PER_CLUSTER, DIM)))
    return pts


@pytest.fixture(scope="module")
def clustered(spark):
    pts = _corpus()
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(pts)],
        "vec_id long, embedding array<double>").cache()
    df.count()
    yield df, pts
    df.unpersist()


def test_multitable_lsh_recall_at_10(clustered):
    df, pts = clustered
    hits = total = 0
    fracs = []
    n = len(pts)
    for q in QUERIES:
        exact = {r.vec_id for r in
                 cosine_topk(df, query_vec_id=q, k=10).collect()}
        approx = {r.vec_id for r in
                  lsh_ann_topk(df, query_vec_id=q, k=10,
                               n_planes=4, n_tables=4).collect()}
        hits += len(exact & approx)
        total += len(exact)
        # candidate fraction: rows sharing ≥1 of the query's 4 buckets
        b = [tuple(r) for r in df.select(
            *[lsh_bucket(F.col("embedding"), 4, t).alias(f"b{t}")
              for t in range(4)]).collect()]
        qb = b[q]
        cand = sum(1 for i, row in enumerate(b)
                   if i != q and any(x == y for x, y in zip(row, qb)))
        fracs.append(cand / n)
    recall = hits / total
    assert recall >= 0.9, f"recall@10 {recall:.3f} < 0.9 target"
    assert max(fracs) <= 0.40, f"buckets stopped pruning: {max(fracs):.2f}"


def test_single_table_lsh_degrades_as_documented(clustered):
    """The n_tables=1 configuration is kept for cheapness; pin that its
    recall really does collapse toward the bucket fraction so nobody
    mistakes it for the quality path."""
    df, pts = clustered
    hits = total = 0
    for q in QUERIES[:4]:
        exact = {r.vec_id for r in
                 cosine_topk(df, query_vec_id=q, k=10).collect()}
        approx = {r.vec_id for r in
                  lsh_ann_topk(df, query_vec_id=q, k=10,
                               n_planes=4, n_tables=1).collect()}
        hits += len(exact & approx)
        total += len(exact)
    assert hits / total < 0.9  # documented degradation


def test_multitable_matches_numpy_reference(clustered):
    """The Spark OR-join candidate set and scores equal a straight
    numpy evaluation of the same definition."""
    df, pts = clustered
    norms = np.linalg.norm(pts, axis=1)
    q = QUERIES[1]

    def np_bucket(v, t):
        b = 0
        for j in range(4):
            p = t * 4 + j
            if v[2 * p] > v[2 * p + 1]:
                b |= 1 << j
        return b

    B = np.array([[np_bucket(v, t) for t in range(4)] for v in pts])
    mask = (B == B[q]).any(axis=1)
    mask[q] = False
    cos = (pts @ pts[q]) / (norms * norms[q])
    cand = np.where(mask)[0]
    order = sorted(((round(float(cos[i]), 4), int(i)) for i in cand),
                   key=lambda t: (-t[0], t[1]))[:10]
    want = [(i, c, r + 1) for r, (c, i) in enumerate(order)]
    got = [(r.vec_id, r.cos, r.rank) for r in
           lsh_ann_topk(df, query_vec_id=q, k=10,
                        n_planes=4, n_tables=4)
           .orderBy("rank").collect()]
    assert got == want
