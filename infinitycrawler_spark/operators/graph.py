"""Link-graph operators for training-data pipelines: PageRank and
connected components. North-rule additions (the reference crawler has
no graph analytics); both are pure DataFrame algebra — no Python UDFs —
so every step stays JVM-side under whole-stage codegen and each has an
exact ANSI-SQL oracle (unrolled power iteration / recursive-CTE
transitive closure in DuckDB).

Scale notes (100 TB):
- ``pagerank``: per iteration one shuffle join (edges ⋈ ranks on src)
  and one aggregation shuffle on dst. Out-degrees are folded into the
  edge list ONCE before the loop so the loop never recomputes them.
  The rank aggregation leaves the frame hash-partitioned on the node
  id, which the following nodes-left-join reuses, so an iteration
  costs two exchanges of |edges| rows. For deep iteration counts call
  with ``checkpoint_every`` to truncate lineage (localCheckpoint), the
  same discipline the crawl loop uses.
- ``connected_components``: min-label propagation. Duplicate clusters
  from MinHash/SimHash have tiny diameters (near-cliques), so the
  fixpoint closes in a handful of rounds; each round is one join on
  the symmetric edge list + one min-aggregation. Early-stops on a
  changed-label count (one scalar action per round — the same bounded
  per-round action shape as the crawl driver).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pagerank(edges: DataFrame, iters: int = 5, damping: float = 0.85,
             src: str = "src", dst: str = "dst",
             checkpoint_every: int = 0) -> DataFrame:
    """Power-iteration PageRank over an edge list → (id, rank).

    Nodes are the distinct endpoints of ``edges``. Dangling mass (nodes
    with no out-edges) is dropped, not redistributed — the oracle uses
    the identical formula, and for ranking purposes the order is
    unaffected. rank_0 = 1/N; rank_{k+1}(v) = (1-d)/N +
    d·Σ_{(u,v)∈E} rank_k(u)/outdeg(u).
    """
    nodes = (edges.select(F.col(src).alias("id"))
             .union(edges.select(F.col(dst).alias("id")))
             .distinct())
    n_nodes = nodes.count()  # one-time scalar; reused by every iteration
    outdeg = edges.groupBy(src).agg(F.count("*").alias("deg"))
    # fold degrees into the edge list once — the loop only touches this
    edges_deg = edges.join(outdeg, src).select(
        F.col(src).alias("e_src"), F.col(dst).alias("e_dst"), "deg")
    edges_deg = edges_deg.persist()
    base = F.lit((1.0 - damping) / n_nodes)
    ranks = nodes.select("id", F.lit(1.0 / n_nodes).alias("rank"))
    for i in range(iters):
        contrib = (edges_deg
                   .join(ranks, edges_deg.e_src == ranks.id)
                   .groupBy("e_dst")
                   .agg(F.sum(F.col("rank") / F.col("deg")).alias("c")))
        ranks = (nodes.join(contrib, nodes.id == contrib.e_dst, "left")
                 .select(nodes.id,
                         (base + F.lit(damping) * F.coalesce("c", F.lit(0.0))
                          ).alias("rank")))
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint()
    edges_deg.unpersist()
    return ranks


def connected_components(edges: DataFrame, src: str = "src",
                         dst: str = "dst", max_iter: int = 20) -> DataFrame:
    """Connected components by min-label propagation → (id, component)
    where ``component`` is the smallest node id reachable from ``id``
    (undirected). Only nodes that appear in ``edges`` are labelled.
    Converges when a round changes no label; raises if ``max_iter``
    rounds pass without convergence (diameter > max_iter)."""
    sym = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
           .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
           .distinct()
           .persist())
    labels = (sym.select("u").distinct()
              .select("u", F.col("u").alias("label")))
    for _ in range(max_iter):
        # candidate label for u: min over neighbours' labels and its own
        neigh = (sym.join(labels.withColumnRenamed("u", "v"), "v")
                 .select("u", "label"))
        new_labels = (labels.unionByName(neigh)
                      .groupBy("u")
                      .agg(F.min("label").alias("label"))
                      .localCheckpoint())  # truncate per-round lineage
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), "u")
                   .filter(F.col("n.label") != F.col("o.label"))
                   .count())
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components: no fixpoint in {max_iter} rounds")
    sym.unpersist()
    return labels.select(F.col("u").alias("id"),
                         F.col("label").alias("component"))


def minhash_components(docs: DataFrame, k: int = 8, bands: int = 4,
                       shingle_n: int = 3) -> DataFrame:
    """Near-duplicate clusters: MinHash-LSH candidate pairs closed into
    connected components → (doc_id, component, comp_size). The
    keep-one-per-cluster step of a dedup pipeline (keeper = the row
    where doc_id == component)."""
    from infinitycrawler_spark.operators.dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(docs, k=k, bands=bands, shingle_n=shingle_n)
    comp = connected_components(pairs, src="doc_a", dst="doc_b")
    w = Window.partitionBy("component")
    return (comp.select(F.col("id").alias("doc_id"), "component",
                        F.count("*").over(w).cast("long").alias("comp_size"))
            .orderBy("doc_id"))
