"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``   — flagship: build a deterministic link graph from
  the sf0.001 TPC-H tables (orders→parts→suppliers pages) and run the
  full crawl engine fixpoint over it; returns the per-host/status
  result summary.
- ``queries()``      — one entry per implemented operator family from
  SURVEY.md §2 (relational crawl primitives, dedup, similarity, text
  analysis, sessionization).
- ``oracle_sql()``   — exact ANSI-SQL equivalents for DuckDB, including
  the crawl fixpoint (the derived web is a 3-level DAG, so the BFS
  closes in closed form — see the crawl_fixpoint oracle's comment).

Every computed column is aliased identically on both sides; float
aggregates are rounded in-query on both sides.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# make the engine package importable regardless of the caller's cwd
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


#: path → planned scan-side parallelism (parquet footer read, memoized).
_SCAN_TASKS_CACHE: dict[str, int | None] = {}


def _scan_tasks(path: str) -> int | None:
    """Effective scan parallelism of a parquet input: Spark assigns each
    ROW GROUP to exactly one task, so a single-file/single-row-group
    table scans as ONE task no matter how many byte-range splits the
    planner makes. None = unknown / many files (assume wide enough)."""
    if path in _SCAN_TASKS_CACHE:
        return _SCAN_TASKS_CACHE[path]
    n: int | None = None
    try:
        import pyarrow.parquet as pq

        if os.path.isfile(path):
            n = pq.ParquetFile(path).metadata.num_row_groups
        elif os.path.isdir(path):
            parts = [f for f in os.listdir(path) if f.endswith(".parquet")]
            # many files ⇒ at least one task each; close enough
            n = None if len(parts) >= 32 else sum(
                pq.ParquetFile(os.path.join(path, f)).metadata.num_row_groups
                for f in parts)
    except Exception:
        n = None
    _SCAN_TASKS_CACHE[path] = n
    return n


def _t(spark: SparkSession, sf_dir: str, name: str,
       spread: bool = False) -> DataFrame:
    """Read a table; with ``spread=True``, fix input under-parallelism
    first (guide §2.5 input skew / §6 split size): parquet row groups
    are the real split granularity, and the test tables ship as one
    file with 1-6 row groups — so every per-row expression feeding the
    first exchange (regex, md5, shingles, explodes, window sorts)
    would run on 1-6 cores of the N available. The spread is one
    deterministic hash repartition on the lead key column (xxhash64 of
    a near-unique key, NOT rand() — §2.5) before any compute.

    Opt-in per query because it trades one full-row shuffle for scan-
    stage parallelism: a clear win where the pre-exchange work is CPU-
    heavy (measured at sf1.0: minhash 12.6→3.4 s, ngram 28→15.6 s,
    simhash 3.0→1.3 s, top-k windows ~2→1.1 s) and a loss where a
    cheap partial aggregation would have shuffled almost nothing
    (pricing_summary 0.58→1.61 s, events_tumbling, text_tokens).
    Scale-adaptive: multi-file datasets (scan tasks ≥ cores/2) and
    small files (< 4 MB — broadcast fodder) are never repartitioned,
    so this is a no-op on real cluster-scale inputs."""
    path = f"{sf_dir}/{name}.parquet"
    df = spark.read.parquet(path)
    if not spread:
        return df
    p = spark.sparkContext.defaultParallelism
    tasks = _scan_tasks(path)
    try:
        big_enough = os.path.isfile(path) and os.path.getsize(path) >= 4 << 20
    except OSError:
        big_enough = True
    if tasks is not None and tasks < max(p // 2, 2) and big_enough \
            and df.columns:
        df = df.repartition(p, F.xxhash64(F.col(df.columns[0])))
    return df


# =====================================================================
# Relational crawl primitives over the TPC-H-ish tables (SURVEY.md §2.2)
# =====================================================================

def q_pricing_summary(spark, sf):
    """Aggregation + filter pushdown (TPC-H Q1 shape)."""
    li = _t(spark, sf, "lineitem").filter(F.col("l_shipdate") <= "1998-09-01")
    return (li.groupBy("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                 F.round(F.sum("l_extendedprice"), 2).alias("sum_base"),
                 F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
                 .alias("sum_disc_price"),
                 F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
                 F.count("*").cast("long").alias("n_rows")))


def q_topk_budget_window(spark, sf):
    """Deterministic top-k per group — the max-pages budget window
    (SURVEY.md O12): row_number over explicit sort keys, never limit."""
    o = _t(spark, sf, "orders", spread=True)
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return (o.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 3)
            .select("o_orderpriority", "o_orderkey",
                    F.round("o_totalprice", 2).alias("price"), "rn"))


def q_anti_join_seen(spark, sf):
    """Anti-join — the URL-seen set pattern (SURVEY.md O10): customers
    with no large order (the 'seen' side is the filtered orders set)."""
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders").filter(F.col("o_totalprice") > 400000.0)
    return (c.join(o.select("o_custkey"), c.c_custkey == o.o_custkey, "left_anti")
            .groupBy("c_mktsegment")
            .agg(F.count("*").cast("long").alias("n_customers")))


def q_semi_join_scope(spark, sf):
    """Semi-join — host-allowlist scope filter (SURVEY.md O11)."""
    s = _t(spark, sf, "supplier")
    li = _t(spark, sf, "lineitem")
    return (s.join(li.select("l_suppkey"), s.s_suppkey == li.l_suppkey, "left_semi")
            .groupBy("s_nationkey")
            .agg(F.count("*").cast("long").alias("n_suppliers")))


def q_broadcast_join(spark, sf):
    """Broadcast dim join — robots-rules join (SURVEY.md O15)."""
    li = _t(spark, sf, "lineitem")
    p = _t(spark, sf, "part")
    return (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
            .groupBy("p_brand")
            .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
                 .alias("revenue"),
                 F.count("*").cast("long").alias("n_items")))


def q_distinct_admission(spark, sf):
    """Distinct — sitemap URL dedup (SURVEY.md O5)."""
    o = _t(spark, sf, "orders")
    return (o.groupBy("o_orderpriority")
            .agg(F.countDistinct("o_custkey").cast("long").alias("n_custs")))


def q_union_seeds(spark, sf):
    """Union of seed sources (SURVEY.md O5): customer ∪ supplier nations."""
    c = _t(spark, sf, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    n = _t(spark, sf, "nation")
    return (c.unionByName(s).distinct()
            .join(n, F.col("nationkey") == n.n_nationkey)
            .groupBy("n_regionkey")
            .agg(F.count("*").cast("long").alias("n_nations")))


def q_multi_join(spark, sf):
    """3-way equi-join — order→customer→nation lineage rollup."""
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    n = _t(spark, sf, "nation")
    return (o.join(c, o.o_custkey == c.c_custkey)
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .groupBy("n_name")
            .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"),
                 F.count("*").cast("long").alias("n_orders")))


def q_rollup_metrics(spark, sf):
    """Rollup — the metrics mart cube (SURVEY.md §2.2 grouping sets)."""
    li = _t(spark, sf, "lineitem")
    return (li.rollup("l_returnflag", "l_linestatus")
            .agg(F.count("*").cast("long").alias("n_rows"),
                 F.round(F.sum("l_quantity"), 2).alias("sum_qty")))


def q_case_routing(spark, sf):
    """CASE routing — status classification (SURVEY.md O17)."""
    o = _t(spark, sf, "orders")
    status = (F.when(F.col("o_orderstatus") == "F", "Crawled")
              .when(F.col("o_orderstatus") == "O", "Pending")
              .when(F.col("o_orderstatus") == "P", "Retry")
              .otherwise("Other"))
    return (o.select(status.alias("crawl_status"))
            .groupBy("crawl_status")
            .agg(F.count("*").cast("long").alias("n_orders")))


def q_string_canonicalize(spark, sf):
    """String functions — canonicalization shapes (SURVEY.md O7/O8)."""
    p = _t(spark, sf, "part")
    first_word = F.split(F.lower("p_type"), " ").getItem(0)
    return (p.select(first_word.alias("type_head"), "p_retailprice")
            .groupBy("type_head")
            .agg(F.count("*").cast("long").alias("n_parts"),
                 F.round(F.avg("p_retailprice"), 2).alias("avg_price")))


def q_date_rounds(spark, sf):
    """Date functions — per-round time bucketing."""
    o = _t(spark, sf, "orders")
    return (o.select(F.date_format("o_orderdate", "yyyy-MM").alias("month"),
                     "o_totalprice")
            .groupBy("month")
            .agg(F.count("*").cast("long").alias("n_orders"),
                 F.round(F.sum("o_totalprice"), 2).alias("total")))


def q_greatest_delay_merge(spark, sf):
    """greatest() — the crawl-delay merge (SURVEY.md O4)."""
    o = _t(spark, sf, "orders")
    return (o.select("o_orderpriority",
                     F.greatest(F.col("o_totalprice"), F.lit(150000.0)).alias("g"))
            .groupBy("o_orderpriority")
            .agg(F.round(F.avg("g"), 2).alias("avg_merged"),
                 F.count("*").cast("long").alias("n_orders")))


def q_window_last_attempt(spark, sf):
    """Window last-per-key — last attempt per URI (SURVEY.md O18)."""
    o = _t(spark, sf, "orders", spread=True)
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc())
    return (o.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .groupBy("o_orderstatus")
            .agg(F.count("*").cast("long").alias("n_last_orders")))


def q_explode_wordcount(spark, sf):
    """Explode — link expansion shape (SURVEY.md O26) over documents."""
    d = _t(spark, sf, "documents", spread=True)
    w = Window.orderBy(F.col("n").desc(), F.col("word").asc())
    return (d.select(F.explode(F.split("text", " ")).alias("word"))
            .groupBy("word").agg(F.count("*").cast("long").alias("n"))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 20))


# =====================================================================
# Training-data operators (dedup / similarity / text)
# =====================================================================

def _with_planted_doc_dups(docs):
    """The corpus has no natural exact dups; plant a deterministic 10%
    (re-keyed copies) so the dedup operators have real work."""
    copies = (docs.filter(F.col("doc_id") % 10 == 0)
              .withColumn("doc_id", F.col("doc_id") + 1000000))
    return docs.unionByName(copies)


def q_dedup_exact(spark, sf):
    from infinitycrawler_spark.operators.dedup import exact_dedup
    return exact_dedup(_with_planted_doc_dups(_t(spark, sf, "documents")))


def q_dedup_minhash_lsh(spark, sf):
    from infinitycrawler_spark.operators.dedup import minhash_lsh_pairs
    return minhash_lsh_pairs(_t(spark, sf, "documents", spread=True),
                             k=8, bands=4, shingle_n=3)


def q_dedup_simhash(spark, sf):
    from infinitycrawler_spark.operators.dedup import simhash_groups
    return simhash_groups(_t(spark, sf, "documents", spread=True), bits=16)


def q_dedup_ngram_jaccard(spark, sf):
    from infinitycrawler_spark.operators.dedup import ngram_jaccard_pairs
    return ngram_jaccard_pairs(_t(spark, sf, "documents", spread=True),
                               shingle_n=3, threshold=0.8, max_shingle_df=100)


def q_dedup_embedding_cosine(spark, sf):
    from infinitycrawler_spark.operators.dedup import embedding_dup_pairs
    e = _t(spark, sf, "embeddings")
    planted = (e.filter(F.col("vec_id") % 20 == 0)
               .withColumn("vec_id", F.col("vec_id") + 1000000))
    return embedding_dup_pairs(e.unionByName(planted), threshold=0.95)


def q_dedup_phash(spark, sf):
    """Perceptual-hash near-dup pairs over the image+caption table shape
    (BASELINE.json input_hint). phash is synthesized deterministically
    from doc_id (multiply-add mod 2^62 — identical long arithmetic in
    Spark and DuckDB, no overflow at any SF); every 7th image gets a
    planted near-dup at Hamming distance 2 (xor 9). Banded Hamming-LSH
    with bands=threshold+1 is lossless, so Spark and the oracle agree
    exactly."""
    from infinitycrawler_spark.operators.dedup import phash_dup_pairs
    d = _t(spark, sf, "documents").select("doc_id")
    ph = _phash_expr()
    base = d.select(F.col("doc_id").alias("image_id"),
                    ph.alias("phash"))
    planted = (d.filter(F.col("doc_id") % 7 == 0)
               .select((F.col("doc_id") + 1000000).alias("image_id"),
                       ph.bitwiseXOR(F.lit(9)).alias("phash")))
    return (phash_dup_pairs(base.unionByName(planted), threshold=3)
            .orderBy("image_a", "image_b"))


def q_dedup_phash_components(spark, sf):
    """Image near-dup clusters: the dedup_phash pairs closed into
    connected components (keep-one-per-cluster on the image axis;
    keeper = the row where image_id == component). Oracle: the pairs
    SQL closed by a recursive-CTE transitive closure."""
    from infinitycrawler_spark.operators.graph import connected_components
    from infinitycrawler_spark.operators.dedup import phash_dup_pairs
    d = _t(spark, sf, "documents").select("doc_id")
    ph = _phash_expr()
    base = d.select(F.col("doc_id").alias("image_id"), ph.alias("phash"))
    planted = (d.filter(F.col("doc_id") % 7 == 0)
               .select((F.col("doc_id") + 1000000).alias("image_id"),
                       ph.bitwiseXOR(F.lit(9)).alias("phash")))
    pairs = phash_dup_pairs(base.unionByName(planted), threshold=3)
    comp = connected_components(pairs, src="image_a", dst="image_b")
    w = Window.partitionBy("component")
    return (comp.select(F.col("id").alias("image_id"), "component",
                        F.count("*").over(w).cast("long").alias("comp_size"))
            .orderBy("image_id"))


def _phash_expr():
    """The synthetic 62-bit phash used by every phash-oracled query
    (dedup_phash, dedup_phash_components, pairs_curate) — one source
    of truth for the Spark side of the shared SQL formula."""
    return (F.col("doc_id") * F.lit(1099511628211) + F.lit(2654435761)
            ) % F.lit(4611686018427387904)


def _pairs_table(spark, sf, caption_expr, with_phash=False):
    """The BASELINE.json input_hint table shape (image_id, w, h,
    caption[, phash]), synthesised deterministically from documents —
    metadata-only (bytes never materialised: these operators must
    prune it anyway)."""
    d = _t(spark, sf, "documents").select("doc_id", "text")
    cols = [
        F.col("doc_id").cast("string").alias("image_id"),
        (F.lit(16) + (F.col("doc_id") % 97) * 8).cast("int").alias("w"),
        (F.lit(16) + (F.col("doc_id") % 53) * 8).cast("int").alias("h"),
        caption_expr.alias("caption"),
    ]
    if with_phash:
        cols.append(_phash_expr().alias("phash"))
    return d.select(*cols)


def q_pairs_quality_filter(spark, sf):
    """LAION-style image+caption metadata gate (operators/pairs.py):
    resolution / aspect / caption-token / junk-caption rules as pure
    integer JVM expressions, first failing rule reported."""
    from infinitycrawler_spark.operators.pairs import pair_quality_filter
    cap = (F.when(F.col("doc_id") % 31 == 0, F.lit("12345 678"))
           .otherwise(F.expr("substr(text, 1, CAST(doc_id % 100 AS INT))")))
    return (pair_quality_filter(_pairs_table(spark, sf, cap), max_tokens=12)
            .orderBy("image_id"))


def q_pairs_caption_dedup(spark, sf):
    """Same-caption keep-best-image dedup (operators/pairs.py):
    keeper = highest w*h, ties to smallest image_id."""
    from infinitycrawler_spark.operators.pairs import caption_dedup
    cap = F.concat(F.lit("a photo of item "),
                   (F.col("doc_id") % 211).cast("string"))
    return caption_dedup(_pairs_table(spark, sf, cap)).orderBy("caption")


def q_pairs_curate(spark, sf):
    """End-to-end training-set curation over the input_hint shape:
    metadata quality gate (operators/pairs.py) → lossless phash
    near-dup connected components, keep each component's representative
    (operators/dedup.py + graph.py) → same-caption keep-best-image
    dedup. One composed pipeline, one chained-CTE oracle."""
    from infinitycrawler_spark.operators.dedup import phash_dup_pairs
    from infinitycrawler_spark.operators.graph import connected_components
    from infinitycrawler_spark.operators.pairs import (
        caption_dedup,
        pair_quality_filter,
    )
    cap = F.concat(F.lit("a photo of item "),
                   (F.col("doc_id") % 211).cast("string"))
    base = _pairs_table(spark, sf, cap, with_phash=True)
    planted = (_t(spark, sf, "documents").select("doc_id")
               .filter(F.col("doc_id") % 7 == 0)
               .select((F.col("doc_id") + 1000000).cast("string")
                       .alias("image_id"),
                       F.lit(640).cast("int").alias("w"),
                       F.lit(480).cast("int").alias("h"),
                       cap.alias("caption"),
                       _phash_expr().bitwiseXOR(F.lit(9)).alias("phash")))
    pairs_tbl = base.unionByName(planted)
    # left_semi: a gate, not an equi-join — can never multiply rows if
    # an image_id ever collides between base and planted
    kept = pairs_tbl.join(
        pair_quality_filter(pairs_tbl).filter("keep").select("image_id"),
        "image_id", "left_semi")
    dup = phash_dup_pairs(kept.select("image_id", "phash"))
    comp = connected_components(dup, src="image_a", dst="image_b")
    non_keepers = (comp.filter(F.col("id") != F.col("component"))
                   .select(F.col("id").alias("image_id")))
    reps = kept.join(non_keepers, "image_id", "left_anti")
    return caption_dedup(reps).orderBy("caption")


def q_dedup_components(spark, sf):
    """MinHash-LSH pairs closed into connected components (min-label
    propagation fixpoint) → near-duplicate clusters with sizes. Oracle:
    the same pairs SQL + a recursive-CTE transitive closure."""
    from infinitycrawler_spark.operators.graph import minhash_components
    return minhash_components(_t(spark, sf, "documents", spread=True),
                              k=8, bands=4, shingle_n=3)


def q_dedup_components_star(spark, sf):
    """The same clusters via large-star/small-star contraction
    (operators/graph.py::connected_components_star — O(log n) rounds,
    diameter-independent; the web-graph-scale alternative to min-label
    propagation). Oracle: identical recursive-CTE closure — both
    algorithms must produce the same labeling."""
    from infinitycrawler_spark.operators.graph import minhash_components
    return minhash_components(_t(spark, sf, "documents", spread=True),
                              k=8, bands=4, shingle_n=3,
                              algorithm="star")


def q_link_pagerank(spark, sf):
    """PageRank (5 power iterations, d=0.85) over a cyclic link graph
    derived from the TPC-H tables: customer→order→part→supplier→nation→
    customer. Oracle: the identical formula unrolled as 5 chained CTEs.
    Ranks rounded to 9 dp (values are O(1/N); fp sum-order noise is
    ~1e-17, far below the rounding quantum)."""
    from infinitycrawler_spark.operators.graph import pagerank

    # Long-encoded node ids for the iterative loop (optimization round):
    # the tagged-STRING ids ("c123", "o456") the oracle pins are a
    # bijection of (prefix, numeric key), so the 5 join+agg iterations
    # run over 8-byte longs (prefix in the high bits) and the strings
    # are re-derived only for the 20-row output — same graph, same
    # ranks, far cheaper hashing/shuffling of the |edges| rows.
    prefixes = ["c", "o", "p", "s", "n"]
    code = {p: i + 1 for i, p in enumerate(prefixes)}

    def tag(p, col):
        return (F.lit(code[p] << 40) + F.col(col).cast("long"))

    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    su = _t(spark, sf, "supplier")
    c = _t(spark, sf, "customer")
    active = o.select(F.col("o_custkey").alias("ck")).distinct()
    edges = (o.select(tag("c", "o_custkey").alias("src"),
                      tag("o", "o_orderkey").alias("dst"))
             .union(li.select(tag("o", "l_orderkey"), tag("p", "l_partkey")))
             .union(li.select(tag("p", "l_partkey"), tag("s", "l_suppkey")))
             .union(su.select(tag("s", "s_suppkey"), tag("n", "s_nationkey")))
             # nation links only to customers that have orders, so every
             # customer node has out-edges (no dangling mass on the cycle)
             .union(c.join(active, c.c_custkey == F.col("ck"))
                    .select(tag("n", "c_nationkey"), tag("c", "c_custkey")))
             .distinct())
    pr = pagerank(edges, iters=5, damping=0.85)
    str_id = F.concat(
        F.element_at(F.array(*[F.lit(p) for p in prefixes]),
                     F.shiftright("id", 40).cast("int")),
        (F.col("id").bitwiseAND(F.lit((1 << 40) - 1))).cast("string"))
    return (pr.select(str_id.alias("id"), F.round("rank", 9).alias("rank_r"))
            .orderBy(F.desc("rank_r"), "id").limit(20))


def q_ann_bruteforce_topk(spark, sf):
    from infinitycrawler_spark.operators.similarity import cosine_topk
    return cosine_topk(_t(spark, sf, "embeddings"), query_vec_id=0, k=10)


def q_ann_lsh_buckets(spark, sf):
    from infinitycrawler_spark.operators.similarity import lsh_bucket_stats
    return lsh_bucket_stats(_t(spark, sf, "embeddings"), n_planes=8)


def q_ann_lsh_topk(spark, sf):
    from infinitycrawler_spark.operators.similarity import lsh_ann_topk
    return lsh_ann_topk(_t(spark, sf, "embeddings"), query_vec_id=0, k=10, n_planes=4)


def q_ann_lsh_multiprobe(spark, sf):
    """OR-amplified LSH top-k (4 independent hash tables over disjoint
    coordinate windows): recall rises exponentially in the table count
    while candidates stay the union of 4 buckets — the quality/scale
    middle ground between single-bucket LSH and brute force
    (tests/test_ann_recall.py pins recall@10 ≥ 0.9 on a clustered
    corpus)."""
    from infinitycrawler_spark.operators.similarity import lsh_ann_topk
    return lsh_ann_topk(_t(spark, sf, "embeddings"), query_vec_id=0, k=10,
                        n_planes=4, n_tables=4)


def q_text_langid(spark, sf):
    from infinitycrawler_spark.operators.text import lang_id_summary
    return lang_id_summary(_t(spark, sf, "documents"))


def q_text_quality(spark, sf):
    from infinitycrawler_spark.operators.text import quality_score
    return quality_score(_t(spark, sf, "documents", spread=True))


def q_text_tokens(spark, sf):
    from infinitycrawler_spark.operators.text import token_stats
    return token_stats(_t(spark, sf, "documents"))


def q_text_fingerprint(spark, sf):
    from infinitycrawler_spark.operators.text import fingerprint
    return fingerprint(_t(spark, sf, "documents", spread=True))


# =====================================================================
# Events: sessionization / windows / JSON
# =====================================================================

def q_events_sessionize(spark, sf):
    """Gap-based sessionization (30 min) — stateful-stream shape as a
    batch window program."""
    e = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    marked = e.withColumn(
        "new_session",
        F.when(F.lag("ts").over(w).isNull() | (gap > 1800), 1).otherwise(0))
    per_user = (marked.groupBy("user_id")
                .agg(F.sum("new_session").cast("long").alias("n_sessions")))
    return (per_user.groupBy("n_sessions")
            .agg(F.count("*").cast("long").alias("n_users")))


def q_events_tumbling(spark, sf):
    """Tumbling 1h windows — streaming aggregation shape in batch."""
    e = _t(spark, sf, "events")
    return (e.groupBy(F.date_format(F.date_trunc("hour", "ts"),
                                    "yyyy-MM-dd HH:00").alias("hour"),
                      "event_type")
            .agg(F.count("*").cast("long").alias("n_events"),
                 F.round(F.sum("value"), 2).alias("sum_value")))


def q_events_json(spark, sf):
    """JSON extraction from the props column."""
    e = _t(spark, sf, "events", spread=True)
    k = F.get_json_object("props", "$.k").cast("int")
    return (e.select("event_type", k.alias("k"))
            .groupBy("event_type")
            .agg(F.round(F.avg("k"), 2).alias("avg_k"),
                 F.max("k").alias("max_k"),
                 F.count("*").cast("long").alias("n_events")))


# =====================================================================
# The flagship: crawl a web derived from the TPC-H graph
# =====================================================================

N_SEED_ORDERS = 150


def build_web_from_tpch(spark, sf_dir):
    """Deterministic synthetic web: each order is a page on its
    customer's nation host linking to its parts' pages (parts.shop),
    each part page links to its suppliers' pages (suppliers.shop).
    Status sprinkle: orderkey%37==0 → 404, %41==0 → 500 (retried);
    robots disallows /order/9* paths; orderkey%53==0 → meta nofollow."""
    from infinitycrawler_spark import schemas

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    li = _t(spark, sf_dir, "lineitem")

    def payload(url_col):
        return [
            url_col.alias("image_id"),
            F.lit(bytearray(b"\x00")).alias("bytes"),
            F.lit(1).alias("w"), F.lit(1).alias("h"),
            F.lit("rgb8-raw").alias("fmt"),
            F.lit("").alias("caption"), F.lit(0).cast("long").alias("phash"),
        ]

    def link_struct(href):
        return F.struct(
            href.alias("href"),
            F.lit(None).cast("string").alias("text"),
            F.lit(None).cast("string").alias("title"),
            F.lit(None).cast("string").alias("rel"))

    order_links = (li.select(
        "l_orderkey",
        F.concat(F.lit("http://parts.shop/part/"), F.col("l_partkey")).alias("href"))
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("href")).alias("hrefs")))
    orders_pages = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(order_links, o.o_orderkey == order_links.l_orderkey, "left")
        .select(
            F.concat(F.lit("http://"),
                     F.format_string("nation%02d.shop", "c_nationkey"),
                     F.lit("/order/"), F.col("o_orderkey")).alias("url"),
            F.format_string("nation%02d.shop", "c_nationkey").alias("host"),
            F.when(F.col("o_orderkey") % 37 == 0, 404)
             .when(F.col("o_orderkey") % 41 == 0, 500)
             .otherwise(200).alias("status_code"),
            F.lit(None).cast("string").alias("redirect_to"),
            F.lit(0).alias("delay_ms"),
            F.lit("text/html").alias("content_type"),
            F.lit("utf-8").alias("charset"),
            F.array().cast("array<string>").alias("x_robots_tag"),
            F.when(F.col("o_orderkey") % 53 == 0, "nofollow")
             .otherwise(F.lit(None).cast("string")).alias("robots_meta"),
            F.lit(None).cast("string").alias("base_href"),
            F.lit(None).cast("string").alias("canonical_href"),
            F.coalesce(
                F.transform("hrefs", lambda h: link_struct(h)),
                F.array().cast(schemas.CRAWL_PAGES["links"].dataType)).alias("links"),
            *payload(F.concat(F.lit("order-"), F.col("o_orderkey"))),
        ))

    part_links = (li.select(
        "l_partkey",
        F.concat(F.lit("http://suppliers.shop/supplier/"), F.col("l_suppkey")).alias("href"))
        .groupBy("l_partkey")
        .agg(F.array_sort(F.collect_set("href")).alias("hrefs")))
    part_pages = part_links.select(
        F.concat(F.lit("http://parts.shop/part/"), F.col("l_partkey")).alias("url"),
        F.lit("parts.shop").alias("host"),
        F.lit(200).alias("status_code"),
        F.lit(None).cast("string").alias("redirect_to"),
        F.lit(0).alias("delay_ms"),
        F.lit("text/html").alias("content_type"),
        F.lit("utf-8").alias("charset"),
        F.array().cast("array<string>").alias("x_robots_tag"),
        F.lit(None).cast("string").alias("robots_meta"),
        F.lit(None).cast("string").alias("base_href"),
        F.lit(None).cast("string").alias("canonical_href"),
        F.transform("hrefs", lambda h: link_struct(h)).alias("links"),
        *payload(F.concat(F.lit("part-"), F.col("l_partkey"))),
    )

    supplier_pages = (li.select("l_suppkey").distinct().select(
        F.concat(F.lit("http://suppliers.shop/supplier/"), F.col("l_suppkey")).alias("url"),
        F.lit("suppliers.shop").alias("host"),
        F.lit(200).alias("status_code"),
        F.lit(None).cast("string").alias("redirect_to"),
        F.lit(0).alias("delay_ms"),
        F.lit("text/html").alias("content_type"),
        F.lit("utf-8").alias("charset"),
        F.array().cast("array<string>").alias("x_robots_tag"),
        F.lit(None).cast("string").alias("robots_meta"),
        F.lit(None).cast("string").alias("base_href"),
        F.lit(None).cast("string").alias("canonical_href"),
        F.array().cast(schemas.CRAWL_PAGES["links"].dataType).alias("links"),
        *payload(F.concat(F.lit("sup-"), F.col("l_suppkey"))),
    ))

    pages = orders_pages.unionByName(part_pages).unionByName(supplier_pages)
    # seeds stay a DataFrame end-to-end (CrawlJob._seed_candidates takes
    # either; the distributed path never collects them to the driver —
    # at 10^7+ seeds a Python list would serialize through the driver)
    seeds = (orders_pages.filter(
                 F.split(F.col("url"), "/order/").getItem(1).cast("long")
                 <= N_SEED_ORDERS)
             .select("url"))
    # hosts is nation-count-bounded (≤ 27), not sf-proportional
    hosts = [r.host for r in pages.select("host").distinct().collect()]
    return pages, seeds, hosts


def crawl_fixpoint(spark, sf_dir):
    """Full engine fixpoint over the derived web (iterative — rows-only
    check). Returns the per-host/status summary."""
    from infinitycrawler_spark.functions.robots import parse_robots_txt
    from infinitycrawler_spark.plans.crawl_job import CrawlJob
    from infinitycrawler_spark.settings import CrawlSettings, RequestProcessorOptions

    pages, seeds, hosts = build_web_from_tpch(spark, sf_dir)
    settings = CrawlSettings(
        host_aliases=hosts,
        number_of_retries=2,
        validate_payload=False,
        request_processor_options=RequestProcessorOptions().no_delay(),
    )
    robots_map = {"nation00.shop": parse_robots_txt(
        "User-agent: *\nDisallow: /order/9\n")}
    job = CrawlJob(
        spark=spark, pages=pages, robots_map=robots_map,
        sitemap_urls=seeds, seed_uri="http://nation00.shop/",
        settings=settings, collect_enqueue_log=False, snapshot_every=100)
    out = job.run()
    return (out.results.groupBy("host", "status")
            .agg(F.count("*").cast("long").alias("n"))
            .orderBy("host", "status"))


def q_crawl_frontier_expand(spark, sf):
    """One generate→expand round as pure relational algebra (anti-join
    dedup + distinct), SQL-checkable: the part URLs discovered from the
    seed orders' pages."""
    li = _t(spark, sf, "lineitem")
    new_urls = (li.filter(F.col("l_orderkey") <= N_SEED_ORDERS)
                .select(F.concat(F.lit("http://parts.shop/part/"),
                                 F.col("l_partkey")).alias("url"))
                .distinct())
    return (new_urls
            .withColumn("partkey",
                        F.split("url", "/part/").getItem(1).cast("long"))
            .select("url", "partkey"))


def q_multimodal_audio(spark, sf):
    """Audio features over pcm16 clips synthesized deterministically
    from the documents table's doc ids (operators/multimodal.py;
    functions/media.py — raw PCM needs no codec); checked against the
    pinned VALUES-literal oracle AUDIO_ORACLE."""
    from infinitycrawler_spark.functions.media import make_audio
    from infinitycrawler_spark.operators.multimodal import audio_features

    # oracle: binary decode is not SQL-expressible, but the clips are
    # deterministic in the doc ids — expected rows are pinned as a
    # VALUES literal (AUDIO_ORACLE below) for full rows+schema+hash.

    ids = [r.doc_id for r in _t(spark, sf, "documents")
           .select("doc_id").orderBy("doc_id").limit(40).collect()]
    # bounded 40-row synthesis; payloads built driver-side only because
    # the corpus is fixed-size — production reads a binary column
    clips = spark.createDataFrame(
        [(d, make_audio(d, seconds=0.1), "pcm16") for d in ids],
        "audio_id string, bytes binary, fmt string")
    return audio_features(clips).orderBy("audio_id")


def q_multimodal_image(spark, sf):
    """Image decode + feature extraction over deterministic synthetic
    images keyed by doc ids (operators/multimodal.py::image_features —
    dimensions, channel means, phash, pooled embedding). Checked
    against the pinned VALUES-literal oracle IMAGE_ORACLE; the
    array-typed embedding is reduced to its L2 norm so every output
    column is scalar."""
    from pyspark.sql import functions as F  # noqa: F811

    from infinitycrawler_spark.functions.images import encode_image, expected_pixels
    from infinitycrawler_spark.operators.multimodal import image_features

    ids = [r.doc_id for r in _t(spark, sf, "documents")
           .select("doc_id").orderBy("doc_id").limit(30).collect()]
    fmt_for = lambda d: "rgb8-q" if int(d) % 2 else "rgb8-raw"  # noqa: E731
    imgs = spark.createDataFrame(
        [(str(d), encode_image(expected_pixels(str(d), 24, 16), fmt_for(d)),
          fmt_for(d)) for d in ids],
        "image_id string, bytes binary, fmt string")
    feats = image_features(imgs)
    emb_norm = F.sqrt(F.aggregate(
        F.transform("embedding", lambda x: x.cast("double") * x),
        F.lit(0.0), lambda acc, x: acc + x))
    return (feats.select(
        "image_id", "ok", "w", "h", "fmt",
        F.round(F.element_at("mean_rgb", 1), 4).alias("mean_r"),
        F.round(F.element_at("mean_rgb", 2), 4).alias("mean_g"),
        F.round(F.element_at("mean_rgb", 3), 4).alias("mean_b"),
        "phash",
        F.round(emb_norm, 4).alias("emb_norm"))
        .orderBy("image_id"))


def q_multimodal_resize(spark, sf):
    """Nearest-neighbor image resize (operators/multimodal.py::
    image_resize) composed with a re-decode + phash of the resized
    pixels — exercises decode → transform → re-encode end-to-end.
    Checked against the pinned VALUES-literal oracle RESIZE_ORACLE."""
    from infinitycrawler_spark.functions.images import (
        encode_image,
        expected_pixels,
    )
    from infinitycrawler_spark.operators.multimodal import image_resize

    ids = [r.doc_id for r in _t(spark, sf, "documents")
           .select("doc_id").orderBy("doc_id").limit(20).collect()]
    imgs = spark.createDataFrame(
        [(str(d), encode_image(expected_pixels(str(d), 32, 24), "rgb8-raw"),
          "rgb8-raw") for d in ids],
        "image_id string, bytes binary, fmt string")
    resized = image_resize(imgs, target_w=16, target_h=12)

    def add_phash(pdfs):
        from infinitycrawler_spark.functions.images import (
            decode_image as _dec,
            phash64 as _ph,
        )

        for pdf in pdfs:
            out = pdf[["image_id", "w", "h"]].copy()
            out["n_bytes"] = [None if b is None else len(b)
                              for b in pdf["bytes"]]
            import pandas as _pd

            # object dtype: a None in the batch must not coerce the
            # 63-bit hashes to (lossy) float64
            out["resized_phash"] = _pd.Series(
                [None if b is None else _ph(_dec(bytes(b))[0])
                 for b in pdf["bytes"]], dtype="object",
                index=pdf.index)
            yield out

    return (resized.mapInPandas(
        add_phash,
        schema="image_id string, w int, h int, n_bytes int,"
               " resized_phash long")
        .orderBy("image_id"))


def q_multimodal_bmp(spark, sf):
    """Image features over REAL uncompressed 24-bit BMP files (the
    on-disk Windows format, decoded with stdlib+numpy —
    functions/images.py::decode_bmp): exercises the codec seam on a
    genuine file layout instead of the synthetic container (VERDICT r3
    item 2). Includes a truncated payload pinning the typed
    error:corrupt row. Checked against the pinned VALUES-literal
    oracle BMP_ORACLE."""
    from pyspark.sql import functions as F  # noqa: F811

    from infinitycrawler_spark.functions.images import encode_bmp, expected_pixels
    from infinitycrawler_spark.operators.multimodal import image_features

    ids = [r.doc_id for r in _t(spark, sf, "documents")
           .select("doc_id").orderBy("doc_id").limit(20).collect()]
    rows = [(f"bmp-{d}", encode_bmp(expected_pixels(str(d), 24, 16)), "bmp")
            for d in ids]
    rows.append(("bmp-zz-corrupt",
                 encode_bmp(expected_pixels("c", 8, 8))[:30], "bmp"))
    imgs = spark.createDataFrame(
        rows, "image_id string, bytes binary, fmt string")
    feats = image_features(imgs)
    emb_norm = F.sqrt(F.aggregate(
        F.transform("embedding", lambda x: x.cast("double") * x),
        F.lit(0.0), lambda acc, x: acc + x))
    return (feats.select(
        "image_id", "ok", "w", "h", "fmt",
        F.round(F.element_at("mean_rgb", 1), 4).alias("mean_r"),
        F.round(F.element_at("mean_rgb", 2), 4).alias("mean_g"),
        F.round(F.element_at("mean_rgb", 3), 4).alias("mean_b"),
        "phash",
        F.round(emb_norm, 4).alias("emb_norm"))
        .orderBy("image_id"))


def q_multimodal_png(spark, sf):
    """Image features over REAL baseline PNG files (stdlib zlib +
    numpy decode, all five scanline filters exercised via the
    filter-cycling encoder — functions/images.py::decode_png): the most
    common crawl image format as a first-class green oracle in this
    container (VERDICT r4 next #4). Includes a truncated payload
    (error:corrupt) and an Adam7-interlaced header
    (error:unsupported — deployment dispatches it to PIL). Checked
    against the pinned VALUES-literal oracle PNG_ORACLE."""
    import struct
    import zlib

    from pyspark.sql import functions as F  # noqa: F811

    from infinitycrawler_spark.functions.images import (
        _PNG_SIG,
        _png_chunk,
        encode_png,
        expected_pixels,
    )
    from infinitycrawler_spark.operators.multimodal import image_features

    ids = [r.doc_id for r in _t(spark, sf, "documents")
           .select("doc_id").orderBy("doc_id").limit(20).collect()]
    rows = [(f"png-{d}", encode_png(expected_pixels(str(d), 24, 16)), "png")
            for d in ids]
    rows.append(("png-zz-corrupt",
                 encode_png(expected_pixels("c", 8, 8))[:40], "png"))
    interlaced = (_PNG_SIG
                  + _png_chunk(b"IHDR",
                               struct.pack(">IIBBBBB", 8, 8, 8, 2, 0, 0, 1))
                  + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 200))
                  + _png_chunk(b"IEND", b""))
    rows.append(("png-zz-interlaced", interlaced, "png"))
    imgs = spark.createDataFrame(
        rows, "image_id string, bytes binary, fmt string")
    feats = image_features(imgs)
    emb_norm = F.sqrt(F.aggregate(
        F.transform("embedding", lambda x: x.cast("double") * x),
        F.lit(0.0), lambda acc, x: acc + x))
    return (feats.select(
        "image_id", "ok", "w", "h", "fmt",
        F.round(F.element_at("mean_rgb", 1), 4).alias("mean_r"),
        F.round(F.element_at("mean_rgb", 2), 4).alias("mean_g"),
        F.round(F.element_at("mean_rgb", 3), 4).alias("mean_b"),
        "phash",
        F.round(emb_norm, 4).alias("emb_norm"))
        .orderBy("image_id"))


def q_multimodal_wav(spark, sf):
    """Audio features over REAL RIFF/WAVE PCM s16 files (stdlib
    ``wave`` decode — functions/media.py::decode_wav), mono and
    stereo, plus a truncated payload (error:corrupt) and an mp3 row
    (error:unsupported — codec formats stay typed errors). Checked
    against the pinned VALUES-literal oracle WAV_ORACLE."""
    from infinitycrawler_spark.functions.media import (
        decode_audio,
        encode_wav,
        make_audio,
    )
    from infinitycrawler_spark.operators.multimodal import audio_features

    ids = [r.doc_id for r in _t(spark, sf, "documents")
           .select("doc_id").orderBy("doc_id").limit(20).collect()]
    rows = []
    for i, d in enumerate(ids):
        ch = 2 if i % 3 == 0 else 1
        samples, sr, ch = decode_audio(
            make_audio(d, seconds=0.1, channels=ch))
        rows.append((f"wav-{d}", encode_wav(samples, sr, ch), "wav"))
    good = encode_wav(*decode_audio(make_audio("t", seconds=0.05)))
    rows.append(("wav-zz-corrupt", good[:21], "wav"))
    rows.append(("wav-zz-mp3", b"ID3\x04fake-mp3-frame", "mp3"))
    clips = spark.createDataFrame(
        rows, "audio_id string, bytes binary, fmt string")
    return audio_features(clips).orderBy("audio_id")


def q_multimodal_video(spark, sf):
    """Frame sampling over rawv clips synthesized from doc ids — one
    row per sampled frame, frames re-encoded as lossless images.
    Checked against the pinned VALUES-literal oracle VIDEO_ORACLE."""
    from infinitycrawler_spark.functions.media import make_video
    from infinitycrawler_spark.operators.multimodal import video_frame_sample
    from pyspark.sql import functions as F  # noqa: F811

    ids = [r.doc_id for r in _t(spark, sf, "documents")
           .select("doc_id").orderBy("doc_id").limit(20).collect()]
    clips = spark.createDataFrame(
        [(d, make_video(d, n_frames=6, w=16, h=12, fps=2.0), "rawv")
         for d in ids],
        "video_id string, bytes binary, fmt string")
    frames = video_frame_sample(clips, every_n_seconds=1.0)
    return (frames.select("video_id", "ok", "frame_idx", "ts_s", "w", "h",
                          F.length("bytes").alias("frame_bytes"))
            .orderBy("video_id", "frame_idx"))


# Pinned multimodal oracles (tools/gen_multimodal_oracle.py): the
# clips are deterministic functions of the sf0.01 doc ids, so the
# expected feature rows are precomputed once and pinned as DuckDB
# VALUES literals — a feature-math regression now fails rows+schema+
# hash instead of sliding through a rows-only count. Regenerate with
# `python tools/gen_multimodal_oracle.py` after intentional changes.
AUDIO_ORACLE = """
SELECT CAST(audio_id AS VARCHAR) AS audio_id, CAST(ok AS VARCHAR) AS ok, CAST(sample_rate AS INT) AS sample_rate, CAST(channels AS INT) AS channels, CAST(duration_s AS DOUBLE) AS duration_s, CAST(rms AS DOUBLE) AS rms, CAST(zero_crossing_rate AS DOUBLE) AS zero_crossing_rate, CAST(peak AS DOUBLE) AS peak
FROM (VALUES
  ('0', 'ok', 8000, 1, 0.1, 0.3913574771485436, 0.2565707133917397, 0.579681396484375),
  ('1', 'ok', 8000, 1, 0.1, 0.1569679492928154, 0.05006257822277847, 0.246856689453125),
  ('10', 'ok', 8000, 1, 0.1, 0.4302362067821273, 0.19524405506883605, 0.646820068359375),
  ('11', 'ok', 8000, 1, 0.1, 0.2974400577865127, 0.0851063829787234, 0.4425048828125),
  ('12', 'ok', 8000, 1, 0.1, 0.31013253862117746, 0.14267834793491865, 0.46417236328125),
  ('13', 'ok', 8000, 1, 0.1, 0.41727215855802, 0.3879849812265332, 0.608245849609375),
  ('14', 'ok', 8000, 1, 0.1, 0.5382493201153816, 0.1439299123904881, 0.783355712890625),
  ('15', 'ok', 8000, 1, 0.1, 0.5282226310229864, 0.06758448060075094, 0.773345947265625),
  ('16', 'ok', 8000, 1, 0.1, 0.16950636258169785, 0.2528160200250313, 0.262451171875),
  ('17', 'ok', 8000, 1, 0.1, 0.34543773324593985, 0.3904881101376721, 0.5069580078125),
  ('18', 'ok', 8000, 1, 0.1, 0.43768455573886866, 0.14893617021276595, 0.642059326171875),
  ('19', 'ok', 8000, 1, 0.1, 0.32142050537108985, 0.20525657071339173, 0.487884521484375),
  ('2', 'ok', 8000, 1, 0.1, 0.43971997455518147, 0.45431789737171463, 0.64483642578125),
  ('20', 'ok', 8000, 1, 0.1, 0.46390588815896167, 0.41051314142678347, 0.6806640625),
  ('21', 'ok', 8000, 1, 0.1, 0.42670469866561567, 0.4655819774718398, 0.629150390625),
  ('22', 'ok', 8000, 1, 0.1, 0.2014378420678948, 0.08010012515644556, 0.304779052734375),
  ('23', 'ok', 8000, 1, 0.1, 0.21962421573576305, 0.05506883604505632, 0.334716796875),
  ('24', 'ok', 8000, 1, 0.1, 0.3376091143631545, 0.4230287859824781, 0.502899169921875),
  ('25', 'ok', 8000, 1, 0.1, 0.27074865432910467, 0.37797246558197745, 0.404022216796875),
  ('26', 'ok', 8000, 1, 0.1, 0.3016641492311533, 0.1902377972465582, 0.449066162109375),
  ('27', 'ok', 8000, 1, 0.1, 0.5451536059312468, 0.392991239048811, 0.8028564453125),
  ('28', 'ok', 8000, 1, 0.1, 0.24130079524027584, 0.24405506883604505, 0.364593505859375),
  ('29', 'ok', 8000, 1, 0.1, 0.47954761877035, 0.06132665832290363, 0.70086669921875),
  ('3', 'ok', 8000, 1, 0.1, 0.26909645632582824, 0.24030037546933666, 0.401824951171875),
  ('30', 'ok', 8000, 1, 0.1, 0.33447080227240583, 0.056320400500625784, 0.487823486328125),
  ('31', 'ok', 8000, 1, 0.1, 0.22650341491301776, 0.4380475594493116, 0.346954345703125),
  ('32', 'ok', 8000, 1, 0.1, 0.43272905860013666, 0.44430538172715894, 0.638885498046875),
  ('33', 'ok', 8000, 1, 0.1, 0.14360224013668438, 0.03879849812265332, 0.222930908203125),
  ('34', 'ok', 8000, 1, 0.1, 0.3263403933008005, 0.4755944931163955, 0.48541259765625),
  ('35', 'ok', 8000, 1, 0.1, 0.3250333491312661, 0.1639549436795995, 0.478668212890625),
  ('36', 'ok', 8000, 1, 0.1, 0.44331911601783386, 0.19148936170212766, 0.65325927734375),
  ('37', 'ok', 8000, 1, 0.1, 0.438733324869454, 0.37296620775969963, 0.636383056640625),
  ('38', 'ok', 8000, 1, 0.1, 0.3583816953595795, 0.11889862327909888, 0.53216552734375),
  ('39', 'ok', 8000, 1, 0.1, 0.21371494073934538, 0.4568210262828536, 0.326629638671875),
  ('4', 'ok', 8000, 1, 0.1, 0.48581459434111945, 0.3742177722152691, 0.71337890625),
  ('5', 'ok', 8000, 1, 0.1, 0.359821637016943, 0.32540675844806005, 0.5283203125),
  ('6', 'ok', 8000, 1, 0.1, 0.36235534781461975, 0.23529411764705882, 0.533172607421875),
  ('7', 'ok', 8000, 1, 0.1, 0.5069965556884235, 0.35168961201501875, 0.7423095703125),
  ('8', 'ok', 8000, 1, 0.1, 0.2746331424893732, 0.41802252816020025, 0.409576416015625),
  ('9', 'ok', 8000, 1, 0.1, 0.2873749823257477, 0.409261576971214, 0.437957763671875)
) AS t(audio_id, ok, sample_rate, channels, duration_s, rms, zero_crossing_rate, peak)
"""

VIDEO_ORACLE = """
SELECT CAST(video_id AS VARCHAR) AS video_id, CAST(ok AS VARCHAR) AS ok, CAST(frame_idx AS INT) AS frame_idx, CAST(ts_s AS DOUBLE) AS ts_s, CAST(w AS INT) AS w, CAST(h AS INT) AS h, CAST(frame_bytes AS INT) AS frame_bytes
FROM (VALUES
  ('0', 'ok', 0, 0.0, 16, 12, 588),
  ('0', 'ok', 2, 1.0, 16, 12, 588),
  ('0', 'ok', 4, 2.0, 16, 12, 588),
  ('1', 'ok', 0, 0.0, 16, 12, 588),
  ('1', 'ok', 2, 1.0, 16, 12, 588),
  ('1', 'ok', 4, 2.0, 16, 12, 588),
  ('10', 'ok', 0, 0.0, 16, 12, 588),
  ('10', 'ok', 2, 1.0, 16, 12, 588),
  ('10', 'ok', 4, 2.0, 16, 12, 588),
  ('11', 'ok', 0, 0.0, 16, 12, 588),
  ('11', 'ok', 2, 1.0, 16, 12, 588),
  ('11', 'ok', 4, 2.0, 16, 12, 588),
  ('12', 'ok', 0, 0.0, 16, 12, 588),
  ('12', 'ok', 2, 1.0, 16, 12, 588),
  ('12', 'ok', 4, 2.0, 16, 12, 588),
  ('13', 'ok', 0, 0.0, 16, 12, 588),
  ('13', 'ok', 2, 1.0, 16, 12, 588),
  ('13', 'ok', 4, 2.0, 16, 12, 588),
  ('14', 'ok', 0, 0.0, 16, 12, 588),
  ('14', 'ok', 2, 1.0, 16, 12, 588),
  ('14', 'ok', 4, 2.0, 16, 12, 588),
  ('15', 'ok', 0, 0.0, 16, 12, 588),
  ('15', 'ok', 2, 1.0, 16, 12, 588),
  ('15', 'ok', 4, 2.0, 16, 12, 588),
  ('16', 'ok', 0, 0.0, 16, 12, 588),
  ('16', 'ok', 2, 1.0, 16, 12, 588),
  ('16', 'ok', 4, 2.0, 16, 12, 588),
  ('17', 'ok', 0, 0.0, 16, 12, 588),
  ('17', 'ok', 2, 1.0, 16, 12, 588),
  ('17', 'ok', 4, 2.0, 16, 12, 588),
  ('18', 'ok', 0, 0.0, 16, 12, 588),
  ('18', 'ok', 2, 1.0, 16, 12, 588),
  ('18', 'ok', 4, 2.0, 16, 12, 588),
  ('19', 'ok', 0, 0.0, 16, 12, 588),
  ('19', 'ok', 2, 1.0, 16, 12, 588),
  ('19', 'ok', 4, 2.0, 16, 12, 588),
  ('2', 'ok', 0, 0.0, 16, 12, 588),
  ('2', 'ok', 2, 1.0, 16, 12, 588),
  ('2', 'ok', 4, 2.0, 16, 12, 588),
  ('3', 'ok', 0, 0.0, 16, 12, 588),
  ('3', 'ok', 2, 1.0, 16, 12, 588),
  ('3', 'ok', 4, 2.0, 16, 12, 588),
  ('4', 'ok', 0, 0.0, 16, 12, 588),
  ('4', 'ok', 2, 1.0, 16, 12, 588),
  ('4', 'ok', 4, 2.0, 16, 12, 588),
  ('5', 'ok', 0, 0.0, 16, 12, 588),
  ('5', 'ok', 2, 1.0, 16, 12, 588),
  ('5', 'ok', 4, 2.0, 16, 12, 588),
  ('6', 'ok', 0, 0.0, 16, 12, 588),
  ('6', 'ok', 2, 1.0, 16, 12, 588),
  ('6', 'ok', 4, 2.0, 16, 12, 588),
  ('7', 'ok', 0, 0.0, 16, 12, 588),
  ('7', 'ok', 2, 1.0, 16, 12, 588),
  ('7', 'ok', 4, 2.0, 16, 12, 588),
  ('8', 'ok', 0, 0.0, 16, 12, 588),
  ('8', 'ok', 2, 1.0, 16, 12, 588),
  ('8', 'ok', 4, 2.0, 16, 12, 588),
  ('9', 'ok', 0, 0.0, 16, 12, 588),
  ('9', 'ok', 2, 1.0, 16, 12, 588),
  ('9', 'ok', 4, 2.0, 16, 12, 588)
) AS t(video_id, ok, frame_idx, ts_s, w, h, frame_bytes)
"""


IMAGE_ORACLE = """
SELECT CAST(image_id AS VARCHAR) AS image_id, CAST(ok AS VARCHAR) AS ok, CAST(w AS INT) AS w, CAST(h AS INT) AS h, CAST(fmt AS VARCHAR) AS fmt, CAST(mean_r AS DOUBLE) AS mean_r, CAST(mean_g AS DOUBLE) AS mean_g, CAST(mean_b AS DOUBLE) AS mean_b, CAST(phash AS BIGINT) AS phash, CAST(emb_norm AS DOUBLE) AS emb_norm
FROM (VALUES
  ('0', 'ok', 24, 16, 'rgb8-raw', 127.2448, 127.0391, 123.8073, -5626117873134815443, 1.98),
  ('1', 'ok', 24, 16, 'rgb8-q', 131.1458, 134.7708, 118.1771, -163724822979071574, 2.0111),
  ('10', 'ok', 24, 16, 'rgb8-raw', 126.026, 122.8698, 124.5104, -6498082179576682391, 1.9566),
  ('11', 'ok', 24, 16, 'rgb8-q', 130.0938, 126.125, 124.9063, -4040856762239936427, 1.9967),
  ('12', 'ok', 24, 16, 'rgb8-raw', 124.7161, 132.9297, 120.4505, 7450276150552858709, 1.9788),
  ('13', 'ok', 24, 16, 'rgb8-q', 127.9583, 124.4375, 121.5833, 2856312047075907756, 1.9602),
  ('14', 'ok', 24, 16, 'rgb8-raw', 124.9271, 124.5313, 126.9479, -3374603692881195214, 1.9742),
  ('15', 'ok', 24, 16, 'rgb8-q', 129.1667, 118.3021, 127.7917, 6855675696885514163, 1.9644),
  ('16', 'ok', 24, 16, 'rgb8-raw', 126.6641, 123.4193, 126.763, -5081897313026507437, 1.9736),
  ('17', 'ok', 24, 16, 'rgb8-q', 131.4583, 126.9271, 126.9479, 764674106765535216, 2.0204),
  ('18', 'ok', 24, 16, 'rgb8-raw', 126.0781, 121.0833, 127.3307, -6049761929356678454, 1.9627),
  ('19', 'ok', 24, 16, 'rgb8-q', 121.75, 122.2292, 126.2917, -7246406377139578680, 1.9394),
  ('2', 'ok', 24, 16, 'rgb8-raw', 125.3359, 130.75, 129.1615, 4371199851443277397, 2.017),
  ('20', 'ok', 24, 16, 'rgb8-raw', 122.2969, 127.3516, 121.8646, 2501379403136547908, 1.9486),
  ('21', 'ok', 24, 16, 'rgb8-q', 131.1771, 128.9375, 129.8958, 3003926713443105553, 2.0429),
  ('22', 'ok', 24, 16, 'rgb8-raw', 125.2526, 124.6589, 123.5495, 1115611856887737691, 1.9569),
  ('23', 'ok', 24, 16, 'rgb8-q', 125.1667, 130.4271, 126.4375, 8331467411560310996, 2.0038),
  ('24', 'ok', 24, 16, 'rgb8-raw', 129.1901, 122.2578, 134.8828, 6567672116033536924, 2.0242),
  ('25', 'ok', 24, 16, 'rgb8-q', 128.4063, 125.1979, 123.8229, 906187224217209910, 1.9742),
  ('26', 'ok', 24, 16, 'rgb8-raw', 129.25, 130.2344, 120.2682, 4341094607104369276, 1.9889),
  ('27', 'ok', 24, 16, 'rgb8-q', 121.9792, 116.0104, 126.8021, -1422772618211922409, 1.9122),
  ('28', 'ok', 24, 16, 'rgb8-raw', 124.4531, 123.112, 128.9036, 6701795945195320044, 1.9751),
  ('29', 'ok', 24, 16, 'rgb8-q', 129.2917, 116.6771, 129.1354, -5405004354539524276, 1.966),
  ('3', 'ok', 24, 16, 'rgb8-q', 125.0104, 124.125, 127.4167, -4692159174536251800, 1.9731),
  ('4', 'ok', 24, 16, 'rgb8-raw', 124.7161, 122.6042, 127.5104, 1751445521598602672, 1.9634),
  ('5', 'ok', 24, 16, 'rgb8-q', 125.8646, 126.8021, 129.875, -4276214909533111667, 2.0035),
  ('6', 'ok', 24, 16, 'rgb8-raw', 125.013, 127.9974, 125.6745, -5314059443779821899, 1.9855),
  ('7', 'ok', 24, 16, 'rgb8-q', 124.2917, 124.4583, 121.7188, 7364744121665530919, 1.9417),
  ('8', 'ok', 24, 16, 'rgb8-raw', 132.6458, 119.9115, 125.1068, -6950362261046240402, 1.9764),
  ('9', 'ok', 24, 16, 'rgb8-q', 128.5208, 126.6354, 120.9792, 5157682778868452215, 1.9692)
) AS t(image_id, ok, w, h, fmt, mean_r, mean_g, mean_b, phash, emb_norm)
"""


RESIZE_ORACLE = """
SELECT CAST(image_id AS VARCHAR) AS image_id, CAST(w AS INT) AS w, CAST(h AS INT) AS h, CAST(n_bytes AS INT) AS n_bytes, CAST(resized_phash AS BIGINT) AS resized_phash
FROM (VALUES
  ('0', 16, 12, 588, -5279884564644428033),
  ('1', 16, 12, 588, -5533762174673436875),
  ('10', 16, 12, 588, -5194700868503591156),
  ('11', 16, 12, 588, 3167544438947778600),
  ('12', 16, 12, 588, 3440135008204010386),
  ('13', 16, 12, 588, 5040292667026770351),
  ('14', 16, 12, 588, -1155683249809847720),
  ('15', 16, 12, 588, 7831162836962088973),
  ('16', 16, 12, 588, -1768955778074281388),
  ('17', 16, 12, 588, -1106229921332384457),
  ('18', 16, 12, 588, -7883526128009966727),
  ('19', 16, 12, 588, -245568852982362971),
  ('2', 16, 12, 588, -2751158452347113408),
  ('3', 16, 12, 588, -317854837511011462),
  ('4', 16, 12, 588, 1267486713406272483),
  ('5', 16, 12, 588, -6066776723959378238),
  ('6', 16, 12, 588, -6118637088585382155),
  ('7', 16, 12, 588, 5650012411524870999),
  ('8', 16, 12, 588, -3722627910311098965),
  ('9', 16, 12, 588, -7123758623811309367)
) AS t(image_id, w, h, n_bytes, resized_phash)
"""



BMP_ORACLE = """
SELECT CAST(image_id AS VARCHAR) AS image_id, CAST(ok AS VARCHAR) AS ok, CAST(w AS INT) AS w, CAST(h AS INT) AS h, CAST(fmt AS VARCHAR) AS fmt, CAST(mean_r AS DOUBLE) AS mean_r, CAST(mean_g AS DOUBLE) AS mean_g, CAST(mean_b AS DOUBLE) AS mean_b, CAST(phash AS BIGINT) AS phash, CAST(emb_norm AS DOUBLE) AS emb_norm
FROM (VALUES
  ('bmp-0', 'ok', 24, 16, 'bmp', 127.2448, 127.0391, 123.8073, -5626117873134815443, 1.98),
  ('bmp-1', 'ok', 24, 16, 'bmp', 132.7161, 136.362, 119.5573, -163724822979071574, 2.0349),
  ('bmp-10', 'ok', 24, 16, 'bmp', 126.026, 122.8698, 124.5104, -6498082179576682391, 1.9566),
  ('bmp-11', 'ok', 24, 16, 'bmp', 131.6146, 127.5651, 126.3802, -4040856762239936427, 2.0199),
  ('bmp-12', 'ok', 24, 16, 'bmp', 124.7161, 132.9297, 120.4505, 7450276150552858709, 1.9788),
  ('bmp-13', 'ok', 24, 16, 'bmp', 129.4427, 125.8594, 123.1693, 2856312047075907756, 1.9836),
  ('bmp-14', 'ok', 24, 16, 'bmp', 124.9271, 124.5313, 126.9479, -3374603692881195214, 1.9742),
  ('bmp-15', 'ok', 24, 16, 'bmp', 130.5781, 119.7917, 129.2786, 6855675696885514163, 1.9873),
  ('bmp-16', 'ok', 24, 16, 'bmp', 126.6641, 123.4193, 126.763, -5081897313026507437, 1.9736),
  ('bmp-17', 'ok', 24, 16, 'bmp', 132.9271, 128.375, 128.4922, 764674106765535216, 2.0436),
  ('bmp-18', 'ok', 24, 16, 'bmp', 126.0781, 121.0833, 127.3307, -6049761929356678454, 1.9627),
  ('bmp-19', 'ok', 24, 16, 'bmp', 123.2474, 123.7604, 127.7188, -7246406377139582776, 1.9626),
  ('bmp-2', 'ok', 24, 16, 'bmp', 125.3359, 130.75, 129.1615, 4371199851443277397, 2.017),
  ('bmp-3', 'ok', 24, 16, 'bmp', 126.5573, 125.6354, 129.0625, -4692159174536251800, 1.9977),
  ('bmp-4', 'ok', 24, 16, 'bmp', 124.7161, 122.6042, 127.5104, 1751445521598602672, 1.9634),
  ('bmp-5', 'ok', 24, 16, 'bmp', 127.3568, 128.2344, 131.2786, -4276214909533111675, 2.0261),
  ('bmp-6', 'ok', 24, 16, 'bmp', 125.013, 127.9974, 125.6745, -5314059443779821899, 1.9855),
  ('bmp-7', 'ok', 24, 16, 'bmp', 125.7656, 125.987, 123.2734, 7364744121665530919, 1.9654),
  ('bmp-8', 'ok', 24, 16, 'bmp', 132.6458, 119.9115, 125.1068, -6950362261046240402, 1.9764),
  ('bmp-9', 'ok', 24, 16, 'bmp', 129.9323, 128.2188, 122.3984, 5157682778868452215, 1.9923),
  ('bmp-zz-corrupt', 'error:corrupt', NULL, NULL, 'bmp', NULL, NULL, NULL, NULL, NULL)
) AS t(image_id, ok, w, h, fmt, mean_r, mean_g, mean_b, phash, emb_norm)
"""

PNG_ORACLE = """
SELECT CAST(image_id AS VARCHAR) AS image_id, CAST(ok AS VARCHAR) AS ok, CAST(w AS INT) AS w, CAST(h AS INT) AS h, CAST(fmt AS VARCHAR) AS fmt, CAST(mean_r AS DOUBLE) AS mean_r, CAST(mean_g AS DOUBLE) AS mean_g, CAST(mean_b AS DOUBLE) AS mean_b, CAST(phash AS BIGINT) AS phash, CAST(emb_norm AS DOUBLE) AS emb_norm
FROM (VALUES
  ('png-0', 'ok', 24, 16, 'png', 127.2448, 127.0391, 123.8073, -5626117873134815443, 1.98),
  ('png-1', 'ok', 24, 16, 'png', 132.7161, 136.362, 119.5573, -163724822979071574, 2.0349),
  ('png-10', 'ok', 24, 16, 'png', 126.026, 122.8698, 124.5104, -6498082179576682391, 1.9566),
  ('png-11', 'ok', 24, 16, 'png', 131.6146, 127.5651, 126.3802, -4040856762239936427, 2.0199),
  ('png-12', 'ok', 24, 16, 'png', 124.7161, 132.9297, 120.4505, 7450276150552858709, 1.9788),
  ('png-13', 'ok', 24, 16, 'png', 129.4427, 125.8594, 123.1693, 2856312047075907756, 1.9836),
  ('png-14', 'ok', 24, 16, 'png', 124.9271, 124.5313, 126.9479, -3374603692881195214, 1.9742),
  ('png-15', 'ok', 24, 16, 'png', 130.5781, 119.7917, 129.2786, 6855675696885514163, 1.9873),
  ('png-16', 'ok', 24, 16, 'png', 126.6641, 123.4193, 126.763, -5081897313026507437, 1.9736),
  ('png-17', 'ok', 24, 16, 'png', 132.9271, 128.375, 128.4922, 764674106765535216, 2.0436),
  ('png-18', 'ok', 24, 16, 'png', 126.0781, 121.0833, 127.3307, -6049761929356678454, 1.9627),
  ('png-19', 'ok', 24, 16, 'png', 123.2474, 123.7604, 127.7188, -7246406377139582776, 1.9626),
  ('png-2', 'ok', 24, 16, 'png', 125.3359, 130.75, 129.1615, 4371199851443277397, 2.017),
  ('png-3', 'ok', 24, 16, 'png', 126.5573, 125.6354, 129.0625, -4692159174536251800, 1.9977),
  ('png-4', 'ok', 24, 16, 'png', 124.7161, 122.6042, 127.5104, 1751445521598602672, 1.9634),
  ('png-5', 'ok', 24, 16, 'png', 127.3568, 128.2344, 131.2786, -4276214909533111675, 2.0261),
  ('png-6', 'ok', 24, 16, 'png', 125.013, 127.9974, 125.6745, -5314059443779821899, 1.9855),
  ('png-7', 'ok', 24, 16, 'png', 125.7656, 125.987, 123.2734, 7364744121665530919, 1.9654),
  ('png-8', 'ok', 24, 16, 'png', 132.6458, 119.9115, 125.1068, -6950362261046240402, 1.9764),
  ('png-9', 'ok', 24, 16, 'png', 129.9323, 128.2188, 122.3984, 5157682778868452215, 1.9923),
  ('png-zz-corrupt', 'error:corrupt', NULL, NULL, 'png', NULL, NULL, NULL, NULL, NULL),
  ('png-zz-interlaced', 'error:unsupported:png', NULL, NULL, 'png', NULL, NULL, NULL, NULL, NULL)
) AS t(image_id, ok, w, h, fmt, mean_r, mean_g, mean_b, phash, emb_norm)
"""

WAV_ORACLE = """
SELECT CAST(audio_id AS VARCHAR) AS audio_id, CAST(ok AS VARCHAR) AS ok, CAST(sample_rate AS INT) AS sample_rate, CAST(channels AS INT) AS channels, CAST(duration_s AS DOUBLE) AS duration_s, CAST(rms AS DOUBLE) AS rms, CAST(zero_crossing_rate AS DOUBLE) AS zero_crossing_rate, CAST(peak AS DOUBLE) AS peak
FROM (VALUES
  ('wav-0', 'ok', 8000, 2, 0.1, 0.3913574771485436, 0.2565707133917397, 0.579681396484375),
  ('wav-1', 'ok', 8000, 1, 0.1, 0.1569679492928154, 0.05006257822277847, 0.246856689453125),
  ('wav-10', 'ok', 8000, 1, 0.1, 0.4302362067821273, 0.19524405506883605, 0.646820068359375),
  ('wav-11', 'ok', 8000, 1, 0.1, 0.2974400577865127, 0.0851063829787234, 0.4425048828125),
  ('wav-12', 'ok', 8000, 2, 0.1, 0.31013253862117746, 0.14267834793491865, 0.46417236328125),
  ('wav-13', 'ok', 8000, 1, 0.1, 0.41727215855802, 0.3879849812265332, 0.608245849609375),
  ('wav-14', 'ok', 8000, 1, 0.1, 0.5382493201153816, 0.1439299123904881, 0.783355712890625),
  ('wav-15', 'ok', 8000, 2, 0.1, 0.5282226310229864, 0.06758448060075094, 0.773345947265625),
  ('wav-16', 'ok', 8000, 1, 0.1, 0.16950636258169785, 0.2528160200250313, 0.262451171875),
  ('wav-17', 'ok', 8000, 1, 0.1, 0.34543773324593985, 0.3904881101376721, 0.5069580078125),
  ('wav-18', 'ok', 8000, 2, 0.1, 0.43768455573886866, 0.14893617021276595, 0.642059326171875),
  ('wav-19', 'ok', 8000, 1, 0.1, 0.32142050537108985, 0.20525657071339173, 0.487884521484375),
  ('wav-2', 'ok', 8000, 1, 0.1, 0.43971997455518147, 0.45431789737171463, 0.64483642578125),
  ('wav-3', 'ok', 8000, 2, 0.1, 0.26909645632582824, 0.24030037546933666, 0.401824951171875),
  ('wav-4', 'ok', 8000, 1, 0.1, 0.48581459434111945, 0.3742177722152691, 0.71337890625),
  ('wav-5', 'ok', 8000, 1, 0.1, 0.359821637016943, 0.32540675844806005, 0.5283203125),
  ('wav-6', 'ok', 8000, 2, 0.1, 0.36235534781461975, 0.23529411764705882, 0.533172607421875),
  ('wav-7', 'ok', 8000, 1, 0.1, 0.5069965556884235, 0.35168961201501875, 0.7423095703125),
  ('wav-8', 'ok', 8000, 1, 0.1, 0.2746331424893732, 0.41802252816020025, 0.409576416015625),
  ('wav-9', 'ok', 8000, 2, 0.1, 0.2873749823257477, 0.409261576971214, 0.437957763671875),
  ('wav-zz-corrupt', 'error:corrupt', NULL, NULL, NULL, NULL, NULL, NULL),
  ('wav-zz-mp3', 'error:unsupported:mp3', NULL, NULL, NULL, NULL, NULL, NULL)
) AS t(audio_id, ok, sample_rate, channels, duration_s, rms, zero_crossing_rate, peak)
"""


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return crawl_fixpoint(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # relational crawl primitives
        "pricing_summary": q_pricing_summary,
        "topk_budget_window": q_topk_budget_window,
        "anti_join_seen": q_anti_join_seen,
        "semi_join_scope": q_semi_join_scope,
        "broadcast_join": q_broadcast_join,
        "distinct_admission": q_distinct_admission,
        "union_seeds": q_union_seeds,
        "multi_join": q_multi_join,
        "rollup_metrics": q_rollup_metrics,
        "case_routing": q_case_routing,
        "string_canonicalize": q_string_canonicalize,
        "date_rounds": q_date_rounds,
        "greatest_delay_merge": q_greatest_delay_merge,
        "window_last_attempt": q_window_last_attempt,
        "explode_wordcount": q_explode_wordcount,
        # training-data operators
        "dedup_exact": q_dedup_exact,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "dedup_simhash": q_dedup_simhash,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "dedup_embedding_cosine": q_dedup_embedding_cosine,
        "dedup_phash": q_dedup_phash,
        "dedup_phash_components": q_dedup_phash_components,
        # image+caption pair curation (payload-axis, input_hint shape)
        "pairs_quality_filter": q_pairs_quality_filter,
        "pairs_caption_dedup": q_pairs_caption_dedup,
        "pairs_curate": q_pairs_curate,
        # graph ops (iterative joins; exact SQL oracles)
        "dedup_components": q_dedup_components,
        "dedup_components_star": q_dedup_components_star,
        "link_pagerank": q_link_pagerank,
        "ann_bruteforce_topk": q_ann_bruteforce_topk,
        "ann_lsh_buckets": q_ann_lsh_buckets,
        "ann_lsh_topk": q_ann_lsh_topk,
        "ann_lsh_multiprobe": q_ann_lsh_multiprobe,
        "text_langid": q_text_langid,
        "text_quality": q_text_quality,
        "text_tokens": q_text_tokens,
        "text_fingerprint": q_text_fingerprint,
        # events
        "events_sessionize": q_events_sessionize,
        "events_tumbling": q_events_tumbling,
        "events_json": q_events_json,
        # multimodal (binary decode — oracled via pinned VALUES literals)
        "multimodal_audio_features": q_multimodal_audio,
        "multimodal_video_frames": q_multimodal_video,
        "multimodal_image_features": q_multimodal_image,
        "multimodal_resize": q_multimodal_resize,
        # real on-disk formats (BMP / PNG / WAV) through the same operators
        "multimodal_bmp_features": q_multimodal_bmp,
        "multimodal_png_features": q_multimodal_png,
        "multimodal_wav_features": q_multimodal_wav,
        # crawl
        "crawl_frontier_expand": q_crawl_frontier_expand,
        # iterative engine loop; oracle = closed-form 3-level BFS CTE
        "crawl_fixpoint": crawl_fixpoint,
    }


def _pagerank_oracle_sql(iters: int = 5) -> str:
    """The q_link_pagerank formula unrolled as chained CTEs (recursive
    CTEs cannot aggregate in the recursive term). Literal arithmetic is
    forced to DOUBLE so the fp ops are bit-identical to the Spark side:
    (1.0-0.85) computed in double on both engines, not decimal."""
    steps = []
    for i in range(1, iters + 1):
        steps.append(f"""
            p{i} AS (
                SELECT nd.id,
                       (CAST(1.0 AS DOUBLE) - 0.85) / (SELECT n FROM nn)
                       + 0.85 * coalesce(sum(p.rank / d.deg), 0) AS rank
                FROM nodes nd
                LEFT JOIN edges e ON e.dst = nd.id
                LEFT JOIN p{i - 1} p ON p.id = e.src
                LEFT JOIN outdeg d ON d.src = e.src
                GROUP BY nd.id)""")
    return f"""
            WITH edges AS (
                SELECT 'c' || o_custkey AS src, 'o' || o_orderkey AS dst
                FROM orders
                UNION SELECT 'o' || l_orderkey, 'p' || l_partkey FROM lineitem
                UNION SELECT 'p' || l_partkey, 's' || l_suppkey FROM lineitem
                UNION SELECT 's' || s_suppkey, 'n' || s_nationkey FROM supplier
                UNION SELECT 'n' || c_nationkey, 'c' || c_custkey
                      FROM customer
                      WHERE c_custkey IN (SELECT o_custkey FROM orders)),
            nodes AS (SELECT src AS id FROM edges
                      UNION SELECT dst FROM edges),
            nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
            outdeg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
            p0 AS (SELECT id, CAST(1.0 AS DOUBLE) / (SELECT n FROM nn) AS rank
                   FROM nodes),{",".join(steps)}
            SELECT id, round(rank, 9) AS rank_r FROM p{iters}
            ORDER BY rank_r DESC, id LIMIT 20
        """


def oracle_sql() -> dict[str, str]:
    d = _oracle_sql_dict()
    # the star-contraction variant must produce the identical
    # labeling — same recursive-CTE closure oracle
    d["dedup_components_star"] = d["dedup_components"]
    return d


def _oracle_sql_dict() -> dict[str, str]:
    return {
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(avg(l_quantity), 2) AS avg_qty,
                   CAST(count(*) AS BIGINT) AS n_rows
            FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
            GROUP BY l_returnflag, l_linestatus
        """,
        "topk_budget_window": """
            SELECT o_orderpriority, o_orderkey, round(o_totalprice, 2) AS price, rn
            FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
                         CAST(row_number() OVER (PARTITION BY o_orderpriority
                              ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rn
                  FROM orders) t
            WHERE rn <= 3
        """,
        "anti_join_seen": """
            SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers
            FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey
                                AND o.o_totalprice > 400000.0)
            GROUP BY c_mktsegment
        """,
        "semi_join_scope": """
            SELECT s_nationkey, CAST(count(*) AS BIGINT) AS n_suppliers
            FROM supplier s
            WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_suppkey = s.s_suppkey)
            GROUP BY s_nationkey
        """,
        "broadcast_join": """
            SELECT p_brand,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                   CAST(count(*) AS BIGINT) AS n_items
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY p_brand
        """,
        "distinct_admission": """
            SELECT o_orderpriority,
                   CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_custs
            FROM orders GROUP BY o_orderpriority
        """,
        "union_seeds": """
            SELECT n_regionkey, CAST(count(*) AS BIGINT) AS n_nations
            FROM (SELECT c_nationkey AS nationkey FROM customer
                  UNION SELECT s_nationkey FROM supplier) u
            JOIN nation ON nationkey = n_nationkey
            GROUP BY n_regionkey
        """,
        "multi_join": """
            SELECT n_name, round(sum(o_totalprice), 2) AS revenue,
                   CAST(count(*) AS BIGINT) AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "rollup_metrics": """
            SELECT l_returnflag, l_linestatus,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   round(sum(l_quantity), 2) AS sum_qty
            FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        """,
        "case_routing": """
            SELECT CASE o_orderstatus WHEN 'F' THEN 'Crawled'
                        WHEN 'O' THEN 'Pending' WHEN 'P' THEN 'Retry'
                        ELSE 'Other' END AS crawl_status,
                   CAST(count(*) AS BIGINT) AS n_orders
            FROM orders GROUP BY 1
        """,
        "string_canonicalize": """
            SELECT string_split(lower(p_type), ' ')[1] AS type_head,
                   CAST(count(*) AS BIGINT) AS n_parts,
                   round(avg(p_retailprice), 2) AS avg_price
            FROM part GROUP BY 1
        """,
        "date_rounds": """
            SELECT strftime(o_orderdate, '%Y-%m') AS month,
                   CAST(count(*) AS BIGINT) AS n_orders,
                   round(sum(o_totalprice), 2) AS total
            FROM orders GROUP BY 1
        """,
        "greatest_delay_merge": """
            SELECT o_orderpriority,
                   round(avg(greatest(o_totalprice, 150000.0)), 2) AS avg_merged,
                   CAST(count(*) AS BIGINT) AS n_orders
            FROM orders GROUP BY o_orderpriority
        """,
        "window_last_attempt": """
            SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_last_orders
            FROM (SELECT o_orderstatus,
                         row_number() OVER (PARTITION BY o_custkey
                             ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
                  FROM orders) t
            WHERE rn = 1 GROUP BY o_orderstatus
        """,
        "explode_wordcount": """
            SELECT word, n, rank FROM (
                SELECT word, n,
                       CAST(row_number() OVER (ORDER BY n DESC, word ASC) AS INT) AS rank
                FROM (SELECT word, CAST(count(*) AS BIGINT) AS n
                      FROM (SELECT unnest(string_split(text, ' ')) AS word
                            FROM documents) w
                      GROUP BY word) g) r
            WHERE rank <= 20
        """,
        "dedup_exact": """
            WITH corpus AS (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0)
            SELECT md5(text) AS text_hash, CAST(count(*) AS BIGINT) AS n_docs,
                   min(doc_id) AS keeper
            FROM corpus GROUP BY 1 HAVING count(*) > 1
        """,
        "dedup_minhash_lsh": """
            WITH words AS (
                SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
            shingles AS (
                SELECT DISTINCT doc_id,
                       array_to_string(ws[i:i+2], ' ') AS sh
                FROM words, unnest(generate_series(1, greatest(len(ws) - 2, 0))) t(i)),
            salted AS (
                SELECT doc_id, salt, min(md5(salt || ':' || sh)) AS mh
                FROM shingles, unnest(generate_series(0, 7)) s(salt)
                GROUP BY doc_id, salt),
            banded AS (
                SELECT doc_id, CAST(salt // 2 AS INT) AS band,
                       string_agg(salt || '=' || mh, '|' ORDER BY salt || '=' || mh) AS sig
                FROM salted GROUP BY doc_id, 2)
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM banded a JOIN banded b
              ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
        """,
        "dedup_phash": """
            WITH ph AS (
                SELECT doc_id,
                       (doc_id * 1099511628211 + 2654435761)
                           % 4611686018427387904 AS phash
                FROM documents),
            images AS (
                SELECT doc_id AS image_id, phash FROM ph
                UNION ALL
                SELECT doc_id + 1000000, xor(phash, 9)
                FROM ph WHERE doc_id % 7 = 0),
            chunks AS (
                SELECT image_id, phash, i AS band,
                       (phash >> (16 * i)) & 65535 AS chunk
                FROM images, unnest(generate_series(0, 3)) t(i)),
            cand AS (
                SELECT DISTINCT a.image_id AS image_a, b.image_id AS image_b,
                       a.phash AS ph_a, b.phash AS ph_b
                FROM chunks a JOIN chunks b
                  ON a.band = b.band AND a.chunk = b.chunk
                 AND a.image_id < b.image_id)
            SELECT image_a, image_b,
                   CAST(bit_count(xor(ph_a, ph_b)) AS INT) AS hamming
            FROM cand WHERE bit_count(xor(ph_a, ph_b)) <= 3
            ORDER BY image_a, image_b
        """,
        "pairs_quality_filter": """
            WITH pairs AS (
                SELECT CAST(doc_id AS VARCHAR) AS image_id,
                       CAST(16 + (doc_id % 97) * 8 AS INT) AS w,
                       CAST(16 + (doc_id % 53) * 8 AS INT) AS h,
                       CASE WHEN doc_id % 31 = 0 THEN '12345 678'
                            ELSE substr(text, 1, CAST(doc_id % 100 AS INT))
                       END AS caption
                FROM documents),
            scored AS (
                SELECT image_id, w, h, caption,
                       CAST(len(list_filter(string_split(caption, ' '),
                                            x -> x <> '')) AS INT) AS n_tokens
                FROM pairs),
            verdict AS (
                SELECT image_id, w, h, n_tokens,
                       CASE WHEN caption IS NULL OR w IS NULL OR h IS NULL
                                THEN 'missing'
                            WHEN least(w, h) < 64 THEN 'too_small'
                            WHEN greatest(w, h) > 3 * least(w, h)
                                THEN 'extreme_aspect'
                            WHEN n_tokens < 2 THEN 'caption_short'
                            WHEN n_tokens > 12 THEN 'caption_long'
                            WHEN NOT regexp_matches(caption, '[A-Za-z]')
                                THEN 'caption_junk'
                       END AS reject_reason
                FROM scored)
            SELECT image_id, w, h, n_tokens,
                   reject_reason IS NULL AS keep, reject_reason
            FROM verdict ORDER BY image_id
        """,
        "pairs_caption_dedup": """
            WITH pairs AS (
                SELECT CAST(doc_id AS VARCHAR) AS image_id,
                       CAST(16 + (doc_id % 97) * 8 AS INT) AS w,
                       CAST(16 + (doc_id % 53) * 8 AS INT) AS h,
                       'a photo of item ' || CAST(doc_id % 211 AS VARCHAR)
                           AS caption
                FROM documents),
            ranked AS (
                SELECT image_id, caption,
                       CAST(w AS BIGINT) * CAST(h AS BIGINT) AS pixels,
                       row_number() OVER (PARTITION BY caption
                           ORDER BY CAST(w AS BIGINT) * CAST(h AS BIGINT)
                                    DESC, image_id) AS rn,
                       CAST(count(*) OVER (PARTITION BY caption) AS BIGINT)
                           AS n_dups
                FROM pairs)
            SELECT image_id, caption, n_dups, pixels AS best_pixels
            FROM ranked WHERE rn = 1 ORDER BY caption
        """,
        "pairs_curate": """
            WITH RECURSIVE src AS (
                SELECT CAST(doc_id AS VARCHAR) AS image_id,
                       CAST(16 + (doc_id % 97) * 8 AS INT) AS w,
                       CAST(16 + (doc_id % 53) * 8 AS INT) AS h,
                       'a photo of item ' || CAST(doc_id % 211 AS VARCHAR)
                           AS caption,
                       (doc_id * 1099511628211 + 2654435761)
                           % 4611686018427387904 AS phash
                FROM documents
                UNION ALL
                SELECT CAST(doc_id + 1000000 AS VARCHAR), 640, 480,
                       'a photo of item ' || CAST(doc_id % 211 AS VARCHAR),
                       xor((doc_id * 1099511628211 + 2654435761)
                           % 4611686018427387904, 9)
                FROM documents WHERE doc_id % 7 = 0),
            -- quality gate: the token/letter rules always pass for
            -- these captions, so only the geometry rules bind
            kept AS (
                SELECT * FROM src
                WHERE least(w, h) >= 64
                  AND greatest(w, h) <= 3 * least(w, h)),
            chunks AS (
                SELECT image_id, phash, i AS band,
                       (phash >> (16 * i)) & 65535 AS chunk
                FROM kept, unnest(generate_series(0, 3)) t(i)),
            pairs AS (
                SELECT DISTINCT a.image_id AS image_a, b.image_id AS image_b
                FROM chunks a JOIN chunks b
                  ON a.band = b.band AND a.chunk = b.chunk
                 AND a.image_id < b.image_id
                WHERE bit_count(xor(a.phash, b.phash)) <= 3),
            sym AS (
                SELECT image_a AS u, image_b AS v FROM pairs
                UNION SELECT image_b, image_a FROM pairs),
            reach AS (
                SELECT u, u AS v FROM (SELECT DISTINCT u FROM sym) t
                UNION
                SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u),
            comp AS (
                SELECT u AS image_id, min(v) AS component FROM reach GROUP BY u),
            reps AS (
                SELECT k.* FROM kept k
                LEFT JOIN comp c ON k.image_id = c.image_id
                WHERE c.image_id IS NULL OR c.component = k.image_id),
            ranked AS (
                SELECT image_id, caption,
                       CAST(w AS BIGINT) * CAST(h AS BIGINT) AS pixels,
                       row_number() OVER (PARTITION BY caption
                           ORDER BY CAST(w AS BIGINT) * CAST(h AS BIGINT)
                                    DESC, image_id) AS rn,
                       CAST(count(*) OVER (PARTITION BY caption) AS BIGINT)
                           AS n_dups
                FROM reps)
            SELECT image_id, caption, n_dups, pixels AS best_pixels
            FROM ranked WHERE rn = 1 ORDER BY caption
        """,
        "dedup_phash_components": """
            WITH RECURSIVE ph AS (
                SELECT doc_id,
                       (doc_id * 1099511628211 + 2654435761)
                           % 4611686018427387904 AS phash
                FROM documents),
            images AS (
                SELECT doc_id AS image_id, phash FROM ph
                UNION ALL
                SELECT doc_id + 1000000, xor(phash, 9)
                FROM ph WHERE doc_id % 7 = 0),
            chunks AS (
                SELECT image_id, phash, i AS band,
                       (phash >> (16 * i)) & 65535 AS chunk
                FROM images, unnest(generate_series(0, 3)) t(i)),
            pairs AS (
                SELECT DISTINCT a.image_id AS image_a, b.image_id AS image_b
                FROM chunks a JOIN chunks b
                  ON a.band = b.band AND a.chunk = b.chunk
                 AND a.image_id < b.image_id
                WHERE bit_count(xor(a.phash, b.phash)) <= 3),
            sym AS (
                SELECT image_a AS u, image_b AS v FROM pairs
                UNION SELECT image_b, image_a FROM pairs),
            reach AS (
                SELECT u, u AS v FROM (SELECT DISTINCT u FROM sym) t
                UNION
                SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u),
            comp AS (
                SELECT u AS image_id, min(v) AS component FROM reach GROUP BY u)
            SELECT image_id, component,
                   CAST(count(*) OVER (PARTITION BY component) AS BIGINT)
                       AS comp_size
            FROM comp ORDER BY image_id
        """,
        "dedup_components": """
            WITH RECURSIVE words AS (
                SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
            shingles AS (
                SELECT DISTINCT doc_id,
                       array_to_string(ws[i:i+2], ' ') AS sh
                FROM words, unnest(generate_series(1, greatest(len(ws) - 2, 0))) t(i)),
            salted AS (
                SELECT doc_id, salt, min(md5(salt || ':' || sh)) AS mh
                FROM shingles, unnest(generate_series(0, 7)) s(salt)
                GROUP BY doc_id, salt),
            banded AS (
                SELECT doc_id, CAST(salt // 2 AS INT) AS band,
                       string_agg(salt || '=' || mh, '|' ORDER BY salt || '=' || mh) AS sig
                FROM salted GROUP BY doc_id, 2),
            pairs AS (
                SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                FROM banded a JOIN banded b
                  ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
            sym AS (
                SELECT doc_a AS u, doc_b AS v FROM pairs
                UNION SELECT doc_b, doc_a FROM pairs),
            reach AS (
                SELECT u, u AS v FROM (SELECT DISTINCT u FROM sym) t
                UNION
                SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u),
            comp AS (
                SELECT u AS doc_id, min(v) AS component FROM reach GROUP BY u)
            SELECT doc_id, component,
                   CAST(count(*) OVER (PARTITION BY component) AS BIGINT)
                       AS comp_size
            FROM comp ORDER BY doc_id
        """,
        "link_pagerank": _pagerank_oracle_sql(5),
        "dedup_simhash": """
            WITH hashed AS (
                SELECT doc_id,
                       CAST(('0x' || substr(md5(w), 1, 8)) AS BIGINT) AS h
                FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                      FROM documents) t),
            bits AS (
                SELECT doc_id, b,
                       sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
                FROM hashed, unnest(generate_series(0, 15)) bb(b)
                GROUP BY doc_id, b),
            sims AS (
                SELECT doc_id,
                       CAST(sum(CASE WHEN s > 0 THEN 1 << b ELSE 0 END) AS BIGINT) AS simhash
                FROM bits GROUP BY doc_id)
            SELECT simhash, CAST(count(*) AS BIGINT) AS n_docs, min(doc_id) AS keeper
            FROM sims GROUP BY simhash HAVING count(*) > 1
        """,
        "dedup_ngram_jaccard": """
            WITH words AS (
                SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
            sh_all AS (
                SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS sh
                FROM words, unnest(generate_series(1, greatest(len(ws) - 2, 0))) t(i)),
            sh AS (
                SELECT doc_id, sh FROM sh_all
                WHERE sh IN (SELECT sh FROM sh_all GROUP BY sh
                             HAVING count(*) <= 100)),
            sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
            common AS (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
                FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
                GROUP BY 1, 2)
            SELECT doc_a, doc_b,
                   round(CAST(c AS DOUBLE) / (sa.sz + sb.sz - c), 4) AS jaccard
            FROM common
            JOIN sizes sa ON sa.doc_id = doc_a
            JOIN sizes sb ON sb.doc_id = doc_b
            WHERE round(CAST(c AS DOUBLE) / (sa.sz + sb.sz - c), 4) >= 0.8
        """,
        "dedup_embedding_cosine": """
            WITH base AS (
                SELECT vec_id, label, embedding FROM embeddings
                UNION ALL
                SELECT vec_id + 1000000, label, embedding FROM embeddings
                WHERE vec_id % 20 = 0),
            e AS (
                SELECT vec_id, label, embedding::DOUBLE[] AS v,
                       CAST((CASE WHEN embedding[1] > embedding[2] THEN 1 ELSE 0 END)
                          + (CASE WHEN embedding[3] > embedding[4] THEN 2 ELSE 0 END)
                          + (CASE WHEN embedding[5] > embedding[6] THEN 4 ELSE 0 END)
                          + (CASE WHEN embedding[7] > embedding[8] THEN 8 ELSE 0 END)
                          + (CASE WHEN embedding[9] > embedding[10] THEN 16 ELSE 0 END)
                          + (CASE WHEN embedding[11] > embedding[12] THEN 32 ELSE 0 END)
                          + (CASE WHEN embedding[13] > embedding[14] THEN 64 ELSE 0 END)
                          + (CASE WHEN embedding[15] > embedding[16] THEN 128 ELSE 0 END)
                          AS INT) AS bucket
                FROM base),
            pairs AS (
                SELECT a.label,
                       round(list_dot_product(a.v, b.v)
                             / (sqrt(list_dot_product(a.v, a.v))
                                * sqrt(list_dot_product(b.v, b.v))), 4) AS cos
                FROM e a JOIN e b ON a.bucket = b.bucket AND a.label = b.label
                                 AND a.vec_id < b.vec_id)
            SELECT label, CAST(count(*) AS BIGINT) AS n_pairs
            FROM pairs WHERE cos >= 0.95 GROUP BY label ORDER BY label
        """,
        "ann_bruteforce_topk": """
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
            scored AS (
                SELECT vec_id,
                       round(list_dot_product(v, qv)
                             / (sqrt(list_dot_product(v, v))
                                * sqrt(list_dot_product(qv, qv))), 4) AS cos
                FROM e, q WHERE vec_id <> 0)
            SELECT vec_id, cos, rank FROM (
                SELECT vec_id, cos,
                       CAST(row_number() OVER (ORDER BY cos DESC, vec_id ASC) AS INT) AS rank
                FROM scored) r
            WHERE rank <= 10
        """,
        "ann_lsh_buckets": """
            WITH b AS (
                SELECT vec_id,
                       CAST((CASE WHEN embedding[1] > embedding[2] THEN 1 ELSE 0 END)
                          + (CASE WHEN embedding[3] > embedding[4] THEN 2 ELSE 0 END)
                          + (CASE WHEN embedding[5] > embedding[6] THEN 4 ELSE 0 END)
                          + (CASE WHEN embedding[7] > embedding[8] THEN 8 ELSE 0 END)
                          + (CASE WHEN embedding[9] > embedding[10] THEN 16 ELSE 0 END)
                          + (CASE WHEN embedding[11] > embedding[12] THEN 32 ELSE 0 END)
                          + (CASE WHEN embedding[13] > embedding[14] THEN 64 ELSE 0 END)
                          + (CASE WHEN embedding[15] > embedding[16] THEN 128 ELSE 0 END)
                          AS INT) AS bucket
                FROM embeddings)
            SELECT bucket, CAST(count(*) AS BIGINT) AS n_vecs,
                   CAST(count(*) * (count(*) - 1) / 2 AS BIGINT) AS n_pairs
            FROM b GROUP BY bucket ORDER BY bucket
        """,
        "ann_lsh_topk": """
            WITH e AS (
                SELECT vec_id, embedding::DOUBLE[] AS v,
                       CAST((CASE WHEN embedding[1] > embedding[2] THEN 1 ELSE 0 END)
                          + (CASE WHEN embedding[3] > embedding[4] THEN 2 ELSE 0 END)
                          + (CASE WHEN embedding[5] > embedding[6] THEN 4 ELSE 0 END)
                          + (CASE WHEN embedding[7] > embedding[8] THEN 8 ELSE 0 END)
                          AS INT) AS bucket
                FROM embeddings),
            q AS (SELECT v AS qv, bucket AS qbucket FROM e WHERE vec_id = 0),
            scored AS (
                SELECT vec_id,
                       round(list_dot_product(v, qv)
                             / (sqrt(list_dot_product(v, v))
                                * sqrt(list_dot_product(qv, qv))), 4) AS cos
                FROM e, q WHERE vec_id <> 0 AND bucket = qbucket)
            SELECT vec_id, cos, rank FROM (
                SELECT vec_id, cos,
                       CAST(row_number() OVER (ORDER BY cos DESC, vec_id ASC) AS INT) AS rank
                FROM scored) r
            WHERE rank <= 10
        """,
        "ann_lsh_multiprobe": """
            WITH e AS (
                SELECT vec_id, embedding::DOUBLE[] AS v,
                       CAST((CASE WHEN embedding[1] > embedding[2] THEN 1 ELSE 0 END)
                          + (CASE WHEN embedding[3] > embedding[4] THEN 2 ELSE 0 END)
                          + (CASE WHEN embedding[5] > embedding[6] THEN 4 ELSE 0 END)
                          + (CASE WHEN embedding[7] > embedding[8] THEN 8 ELSE 0 END)
                          AS INT) AS b0,
                       CAST((CASE WHEN embedding[9] > embedding[10] THEN 1 ELSE 0 END)
                          + (CASE WHEN embedding[11] > embedding[12] THEN 2 ELSE 0 END)
                          + (CASE WHEN embedding[13] > embedding[14] THEN 4 ELSE 0 END)
                          + (CASE WHEN embedding[15] > embedding[16] THEN 8 ELSE 0 END)
                          AS INT) AS b1,
                       CAST((CASE WHEN embedding[17] > embedding[18] THEN 1 ELSE 0 END)
                          + (CASE WHEN embedding[19] > embedding[20] THEN 2 ELSE 0 END)
                          + (CASE WHEN embedding[21] > embedding[22] THEN 4 ELSE 0 END)
                          + (CASE WHEN embedding[23] > embedding[24] THEN 8 ELSE 0 END)
                          AS INT) AS b2,
                       CAST((CASE WHEN embedding[25] > embedding[26] THEN 1 ELSE 0 END)
                          + (CASE WHEN embedding[27] > embedding[28] THEN 2 ELSE 0 END)
                          + (CASE WHEN embedding[29] > embedding[30] THEN 4 ELSE 0 END)
                          + (CASE WHEN embedding[31] > embedding[32] THEN 8 ELSE 0 END)
                          AS INT) AS b3
                FROM embeddings),
            q AS (SELECT v AS qv, b0 AS qb0, b1 AS qb1, b2 AS qb2, b3 AS qb3
                  FROM e WHERE vec_id = 0),
            scored AS (
                SELECT vec_id,
                       round(list_dot_product(v, qv)
                             / (sqrt(list_dot_product(v, v))
                                * sqrt(list_dot_product(qv, qv))), 4) AS cos
                FROM e, q
                WHERE vec_id <> 0
                  AND (b0 = qb0 OR b1 = qb1 OR b2 = qb2 OR b3 = qb3))
            SELECT vec_id, cos, rank FROM (
                SELECT vec_id, cos,
                       CAST(row_number() OVER (ORDER BY cos DESC, vec_id ASC) AS INT) AS rank
                FROM scored) r
            WHERE rank <= 10
        """,
        "text_langid": """
            WITH scored AS (
                SELECT doc_id,
                  (CASE WHEN ' '||text||' ' LIKE '% the %' THEN 1 ELSE 0 END
                 + CASE WHEN ' '||text||' ' LIKE '% and %' THEN 1 ELSE 0 END
                 + CASE WHEN ' '||text||' ' LIKE '% of %' THEN 1 ELSE 0 END) AS hits_en,
                  (CASE WHEN ' '||text||' ' LIKE '% der %' THEN 1 ELSE 0 END
                 + CASE WHEN ' '||text||' ' LIKE '% und %' THEN 1 ELSE 0 END
                 + CASE WHEN ' '||text||' ' LIKE '% das %' THEN 1 ELSE 0 END) AS hits_de,
                  (CASE WHEN ' '||text||' ' LIKE '% le %' THEN 1 ELSE 0 END
                 + CASE WHEN ' '||text||' ' LIKE '% et %' THEN 1 ELSE 0 END
                 + CASE WHEN ' '||text||' ' LIKE '% la %' THEN 1 ELSE 0 END) AS hits_fr,
                  (CASE WHEN ' '||text||' ' LIKE '% el %' THEN 1 ELSE 0 END
                 + CASE WHEN ' '||text||' ' LIKE '% y %' THEN 1 ELSE 0 END
                 + CASE WHEN ' '||text||' ' LIKE '% de %' THEN 1 ELSE 0 END) AS hits_es
                FROM documents),
            pred AS (
                SELECT doc_id,
                       CASE WHEN greatest(hits_en, hits_de, hits_fr, hits_es) = 0 THEN 'und'
                            WHEN hits_en = greatest(hits_en, hits_de, hits_fr, hits_es) THEN 'en'
                            WHEN hits_de = greatest(hits_en, hits_de, hits_fr, hits_es) THEN 'de'
                            WHEN hits_fr = greatest(hits_en, hits_de, hits_fr, hits_es) THEN 'fr'
                            ELSE 'es' END AS lang_pred
                FROM scored)
            SELECT lang_pred, CAST(count(*) AS BIGINT) AS n_docs
            FROM pred GROUP BY lang_pred ORDER BY lang_pred
        """,
        "text_quality": """
            WITH s AS (
                SELECT source,
                       round(least(length(text) / 400.0, 1.0) * 0.4
                           + (length(regexp_replace(text, '[^a-z ]', '', 'g'))
                              / greatest(length(text), 1)) * 0.4
                           + least(len(string_split(text, ' ')) / 80.0, 1.0) * 0.2,
                           4) AS score
                FROM documents)
            SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                   round(avg(score), 4) AS avg_score
            FROM s GROUP BY source ORDER BY source
        """,
        "text_tokens": """
            WITH t AS (
                SELECT lang,
                       len(string_split_regex(
                           trim(regexp_replace(text, '[^a-z0-9 ]', ' ', 'g')),
                           ' +')) AS n_tokens
                FROM documents)
            SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                   round(avg(n_tokens), 2) AS avg_tokens,
                   max(n_tokens) AS max_tokens, min(n_tokens) AS min_tokens
            FROM t GROUP BY lang ORDER BY lang
        """,
        "text_fingerprint": """
            WITH f AS (
                SELECT source,
                       md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fp
                FROM documents)
            SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(count(DISTINCT fp) AS BIGINT) AS n_distinct,
                   CAST(count(*) - count(DISTINCT fp) AS BIGINT) AS n_dups
            FROM f GROUP BY source ORDER BY source
        """,
        "events_sessionize": """
            WITH marked AS (
                SELECT user_id,
                       CASE WHEN lag(ts) OVER w IS NULL
                                 OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                            THEN 1 ELSE 0 END AS new_session
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            per_user AS (
                SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions
                FROM marked GROUP BY user_id)
            SELECT n_sessions, CAST(count(*) AS BIGINT) AS n_users
            FROM per_user GROUP BY n_sessions
        """,
        "events_tumbling": """
            SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
                   event_type, CAST(count(*) AS BIGINT) AS n_events,
                   round(sum(value), 2) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "events_json": """
            SELECT event_type,
                   round(avg(CAST(json_extract(props, '$.k') AS INT)), 2) AS avg_k,
                   max(CAST(json_extract(props, '$.k') AS INT)) AS max_k,
                   CAST(count(*) AS BIGINT) AS n_events
            FROM events GROUP BY event_type
        """,
        "multimodal_audio_features": AUDIO_ORACLE,
        "multimodal_video_frames": VIDEO_ORACLE,
        "multimodal_image_features": IMAGE_ORACLE,
        "multimodal_resize": RESIZE_ORACLE,
        "multimodal_bmp_features": BMP_ORACLE,
        "multimodal_png_features": PNG_ORACLE,
        "multimodal_wav_features": WAV_ORACLE,
        "crawl_frontier_expand": f"""
            SELECT url, partkey FROM (
                SELECT DISTINCT 'http://parts.shop/part/' || l_partkey AS url,
                       CAST(l_partkey AS BIGINT) AS partkey
                FROM lineitem WHERE l_orderkey <= {N_SEED_ORDERS}) t
        """,
        # The flagship. The derived web (build_web_from_tpch) is a
        # 3-level DAG (seed orders → parts → suppliers), so the no-delay
        # BFS fixpoint closes in 3 expansions and is exactly expressible
        # with plain CTEs replicating the engine's admission semantics:
        # robots (Disallow /order/9 via the base host's file applied to
        # every host), status routing (404→Crawled terminal, 500→retry
        # ×2→MaxRetries), meta-nofollow link suppression, the
        # authority-root seed (absent from the web → transport error →
        # MaxRetries), and seen-set dedup (DISTINCT).
        "crawl_fixpoint": f"""
            WITH op AS (
                SELECT o_orderkey AS k,
                       printf('nation%02d.shop', c_nationkey) AS host,
                       CASE WHEN o_orderkey % 37 = 0 THEN 404
                            WHEN o_orderkey % 41 = 0 THEN 500
                            ELSE 200 END AS status_code,
                       (o_orderkey % 53 = 0) AS nofollow
                FROM orders JOIN customer ON o_custkey = c_custkey),
            seeds AS (SELECT * FROM op WHERE k <= {N_SEED_ORDERS}),
            blocked AS (
                SELECT host, 'RobotsBlocked' AS status, count(*) AS n
                FROM seeds WHERE CAST(k AS VARCHAR) LIKE '9%'
                GROUP BY host),
            fetched AS (
                SELECT * FROM seeds WHERE CAST(k AS VARCHAR) NOT LIKE '9%'),
            seed_results AS (
                SELECT host,
                       CASE WHEN status_code = 500 THEN 'MaxRetries'
                            ELSE 'Crawled' END AS status,
                       count(*) AS n
                FROM fetched GROUP BY 1, 2),
            root_result AS (
                SELECT 'nation00.shop' AS host, 'MaxRetries' AS status,
                       1 AS n),
            parts AS (
                SELECT DISTINCT l_partkey AS pk
                FROM lineitem JOIN fetched ON l_orderkey = k
                WHERE status_code = 200 AND NOT nofollow),
            part_results AS (
                SELECT 'parts.shop' AS host, 'Crawled' AS status,
                       count(*) AS n FROM parts),
            supp AS (
                SELECT DISTINCT l_suppkey AS sk FROM lineitem
                WHERE l_partkey IN (SELECT pk FROM parts)),
            supp_results AS (
                SELECT 'suppliers.shop' AS host, 'Crawled' AS status,
                       count(*) AS n FROM supp),
            all_rows AS (
                SELECT * FROM blocked
                UNION ALL SELECT * FROM seed_results
                UNION ALL SELECT * FROM root_result
                UNION ALL SELECT * FROM part_results
                UNION ALL SELECT * FROM supp_results)
            SELECT host, status, CAST(sum(n) AS BIGINT) AS n
            FROM all_rows GROUP BY host, status ORDER BY host, status
        """,
    }
