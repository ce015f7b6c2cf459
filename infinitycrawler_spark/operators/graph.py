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
    # the caller's edge expression is referenced four times during
    # setup (both node legs, the degree agg, the degree join) — persist
    # it so an expensive upstream build (unions + distinct over tagged
    # keys) runs once instead of per reference
    edges = edges.persist()
    # nodes is referenced by EVERY iteration's left join — persist it,
    # or the |edges|-row union+distinct re-executes once per iteration
    nodes = (edges.select(F.col(src).alias("id"))
             .union(edges.select(F.col(dst).alias("id")))
             .distinct()
             .persist())
    n_nodes = nodes.count()  # one-time scalar; reused by every iteration
    outdeg = edges.groupBy(src).agg(F.count("*").alias("deg"))
    # fold degrees into the edge list once — the loop only touches this.
    # Hash-partition by e_src BEFORE persisting (guide §2.4): the
    # per-iteration join keys on e_src, so the persisted partitioning
    # satisfies the join's requirement and only the (small) ranks side
    # is exchanged each iteration instead of the whole edge list.
    n_parts = edges.sparkSession.sparkContext.defaultParallelism
    edges_deg = edges.join(outdeg, src).select(
        F.col(src).alias("e_src"), F.col(dst).alias("e_dst"), "deg")
    edges_deg = edges_deg.repartition(n_parts, "e_src").persist()
    base = F.lit((1.0 - damping) / n_nodes)
    ranks = nodes.select("id", F.lit(1.0 / n_nodes).alias("rank"))
    for i in range(iters):
        # SHUFFLE_HASH on the ranks side: a sort-merge join here re-sorts
        # the whole edge list every iteration; hashing the (|nodes|-row)
        # ranks side instead leaves the persisted e_src partitioning as
        # the only edge-side requirement (guide §3.1)
        contrib = (edges_deg
                   .join(ranks.hint("shuffle_hash"),
                         edges_deg.e_src == ranks.id)
                   .groupBy("e_dst")
                   .agg(F.sum(F.col("rank") / F.col("deg")).alias("c")))
        ranks = (nodes.join(contrib, nodes.id == contrib.e_dst, "left")
                 .select(nodes.id,
                         (base + F.lit(damping) * F.coalesce("c", F.lit(0.0))
                          ).alias("rank")))
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint()
    # materialize before releasing edges_deg: the returned frame is lazy,
    # so unpersisting first would make every evaluation recompute the
    # degree join (ADVICE r4) — eager=True runs the loop's final plan
    # once and truncates its lineage, same discipline as the crawl loop
    ranks = ranks.localCheckpoint(eager=True)
    edges_deg.unpersist()
    nodes.unpersist()
    edges.unpersist()
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
        # candidate label for u: min over neighbours' labels and its
        # own. The own-label leg is tagged so the SAME groupBy also
        # emits each node's previous label (labels has exactly one row
        # per u, so min-over-the-tagged-leg IS the old label); the
        # changed count then rides the one materializing action instead
        # of a second per-round join+count action (guide §2.4 — the
        # old shape paid 2 actions and an extra label-table join per
        # round; labels are identical either way).
        own = labels.select("u", "label", F.lit(True).alias("own"))
        neigh = (sym.join(labels.withColumnRenamed("u", "v"), "v")
                 .select("u", "label", F.lit(False).alias("own")))
        nl = (own.unionByName(neigh)
              .groupBy("u")
              .agg(F.min("label").alias("label"),
                   F.min(F.when(F.col("own"), F.col("label")))
                   .alias("old_label"))
              .localCheckpoint(eager=False))  # truncate per-round lineage
        # ONE action: counting changed labels scans every partition of
        # the lazy checkpoint, materializing its blocks as a side effect
        changed = nl.filter(F.col("label") != F.col("old_label")).count()
        labels = nl.select("u", "label")
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components: no fixpoint in {max_iter} rounds")
    sym.unpersist()
    return labels.select(F.col("u").alias("id"),
                         F.col("label").alias("component"))


def _large_star(e: DataFrame) -> DataFrame:
    """Large-star round (Kiveris et al., "Connected Components in
    MapReduce and Beyond", SoCC'14): symmetrize, then for every node u
    connect each strictly-larger neighbour to m(u) = min(Γ(u) ∪ {u})."""
    g = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = g.groupBy("u").agg(F.min("v").alias("mn"))
    m = F.least(F.col("mn"), F.col("u"))
    return (g.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), m.alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct())


def _small_star(e: DataFrame) -> DataFrame:
    """Small-star round: edges arrive oriented u > v; connect u and all
    its (smaller) neighbours to m(u) = min(Γ(u))."""
    mins = e.groupBy("u").agg(F.min("v").alias("m"))
    relinked = (e.join(mins, "u")
                .filter(F.col("v") != F.col("m"))
                .select(F.col("v").alias("u"), F.col("m").alias("v")))
    rooted = mins.select("u", F.col("m").alias("v"))
    return (relinked.union(rooted)
            .filter(F.col("u") != F.col("v"))
            .distinct())


def connected_components_star(edges: DataFrame, src: str = "src",
                              dst: str = "dst",
                              max_iter: int = 50) -> DataFrame:
    """Connected components by alternating large-star/small-star
    contraction → (id, component), component = the smallest node id in
    the component. Same contract as :func:`connected_components` (only
    nodes appearing in ``edges`` are labelled) but converges in
    O(log n) rounds regardless of graph diameter — the right algorithm
    for high-diameter graphs (web link graphs, ring/path topologies)
    where min-label propagation needs O(diameter) joins.

    Scale: each round is two grouped min-aggregations + two joins on
    the (shrinking) edge list; convergence is detected with one
    bounded-scalar action per round (changed-edge count), and per-round
    lineage is truncated with localCheckpoint like the crawl loop."""
    e = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
         .filter(F.col("u") != F.col("v"))
         .distinct()
         .localCheckpoint())
    for _ in range(max_iter):
        new_e = _small_star(_large_star(e)).localCheckpoint()
        # fixpoint ⟺ identical edge sets. ONE action (VERDICT r5 #6):
        # both sides are distinct sets, so tagging rows ±1 and keeping
        # groups with a nonzero sum yields exactly the symmetric
        # difference — empty ⟺ unchanged. (Was: a count plus an
        # exceptAll/isEmpty — two driver actions per round.)
        sym_diff = (new_e.withColumn("t", F.lit(1))
                    .unionByName(e.withColumn("t", F.lit(-1)))
                    .groupBy("u", "v").agg(F.sum("t").alias("s"))
                    .filter(F.col("s") != 0))
        changed = not sym_diff.isEmpty()
        e = new_e
        if not changed:
            break
    else:
        raise RuntimeError(
            f"connected_components_star: no fixpoint in {max_iter} rounds")
    # converged edges form stars: every non-root points at its root
    comps = e.select(F.col("u").alias("id"), F.col("v").alias("component"))
    roots = (e.select(F.col("v").alias("id"), F.col("v").alias("component"))
             .distinct())
    return comps.union(roots).distinct()


def minhash_components(docs: DataFrame, k: int = 8, bands: int = 4,
                       shingle_n: int = 3,
                       algorithm: str = "label") -> DataFrame:
    """Near-duplicate clusters: MinHash-LSH candidate pairs closed into
    connected components → (doc_id, component, comp_size). The
    keep-one-per-cluster step of a dedup pipeline (keeper = the row
    where doc_id == component). ``algorithm``: "label" (min-label
    propagation — right for near-clique dedup clusters) or "star"
    (large-star/small-star contraction — O(log n) rounds, diameter-
    independent; same labels)."""
    from infinitycrawler_spark.operators.dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(docs, k=k, bands=bands, shingle_n=shingle_n)
    cc = (connected_components_star if algorithm == "star"
          else connected_components)
    comp = cc(pairs, src="doc_a", dst="doc_b")
    w = Window.partitionBy("component")
    return (comp.select(F.col("id").alias("doc_id"), "component",
                        F.count("*").over(w).cast("long").alias("comp_size"))
            .orderBy("doc_id"))
