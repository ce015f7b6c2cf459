"""Graph operators: PageRank and connected components.

Unit oracles are closed-form/numpy on tiny graphs; the sf-level parity
vs DuckDB (recursive-CTE closure, unrolled power iteration) is covered
by the driver's oracle harness (`dedup_components`, `link_pagerank`).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from infinitycrawler_spark.operators.graph import (
    connected_components,
    minhash_components,
    pagerank,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_connected_components_two_clusters(spark):
    e = _edges(spark, [("b", "c"), ("a", "b"), ("e", "f")])
    got = {r.id: r.component
           for r in connected_components(e).collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "e": "e", "f": "e"}


def test_connected_components_long_chain_converges(spark):
    # min-label prop moves labels one hop per round → a chain needs
    # diameter rounds; 12 nodes stresses the loop + early-stop
    names = [f"n{i:02d}" for i in range(12)]
    e = _edges(spark, list(zip(names, names[1:])))
    got = connected_components(e, max_iter=20).collect()
    assert {r.component for r in got} == {"n00"}
    assert len(got) == 12


def test_connected_components_raises_without_fixpoint(spark):
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    with pytest.raises(RuntimeError, match="no fixpoint"):
        connected_components(e, max_iter=1)


def _numpy_pagerank(edge_list, iters, d=0.85):
    nodes = sorted({u for u, _ in edge_list} | {v for _, v in edge_list})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    outdeg = np.zeros(n)
    for u, _ in edge_list:
        outdeg[idx[u]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.full(n, (1.0 - d) / n)
        for u, v in edge_list:
            nxt[idx[v]] += d * r[idx[u]] / outdeg[idx[u]]
        r = nxt
    return dict(zip(nodes, r))


def test_pagerank_matches_numpy_power_iteration(spark):
    pairs = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "a")]
    got = {r.id: r.rank for r in pagerank(_edges(spark, pairs), iters=8).collect()}
    want = _numpy_pagerank(pairs, iters=8)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12)


def test_pagerank_sink_gets_only_teleport_mass(spark):
    # b is a pure sink: after one iteration its rank is base + d*r0;
    # a (no in-edges) holds only the teleport base
    e = _edges(spark, [("a", "b")])
    got = {r.id: r.rank for r in pagerank(e, iters=3).collect()}
    assert got["a"] == pytest.approx(0.15 / 2)
    assert got["b"] > got["a"]


def test_pagerank_checkpoint_every_is_identical(spark):
    pairs = [("a", "b"), ("b", "c"), ("c", "a")]
    plain = {r.id: r.rank
             for r in pagerank(_edges(spark, pairs), iters=6).collect()}
    ckpt = {r.id: r.rank
            for r in pagerank(_edges(spark, pairs), iters=6,
                              checkpoint_every=2).collect()}
    assert plain == ckpt


def test_minhash_components_closes_pairs_transitively(spark):
    # three near-identical docs A,B,C: LSH yields pairs among them;
    # components must put all three in ONE cluster even if the pair
    # (A,C) is present only transitively. An unrelated pair (x,y)
    # stays its own cluster.
    base = ("the quick brown fox jumps over the lazy dog while the "
            "patient grey owl watches from a very tall oak tree near "
            "the quiet river bank at dawn every single summer morning")
    docs = spark.createDataFrame(
        [("a1", base + " one"),
         ("a2", base + " two"),
         ("a3", base + " six"),
         ("x1", "completely different words entirely unrelated text body here"),
         ("x2", "completely different words entirely unrelated text body also"),
         ("solo", "nothing shares shingles with this standalone document")],
        "doc_id string, text string")
    out = minhash_components(docs, k=8, bands=4, shingle_n=3).collect()
    comp = {r.doc_id: r.component for r in out}
    sizes = {r.doc_id: r.comp_size for r in out}
    assert comp["a1"] == comp["a2"] == comp["a3"] == "a1"
    assert sizes["a1"] == 3
    if "x1" in comp:  # x-pair may or may not collide across all bands
        assert comp["x1"] == comp.get("x2", comp["x1"])
        assert comp["x1"] != "a1"
    assert "solo" not in comp  # singletons are not emitted
