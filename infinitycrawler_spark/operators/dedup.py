"""Deduplication operators for training-data pipelines.

Each operator is pure DataFrame algebra (JVM-side, no Python UDFs) so
Catalyst/AQE handle pushdown and skew; every hash is ``md5`` (identical
in Spark and DuckDB/ANSI engines) so each operator has an exact SQL
oracle. Designed for the ``documents`` table
(doc_id, text, lang, source, n_chars).

Scale notes (100 TB):
- exact dedup: one hash-shuffle on the digest — the same shape as the
  crawl engine's seen-set;
- MinHash/LSH: shingle explosion is the heavy stage; it is a narrow op
  (explode) followed by partial aggregation on (doc, salt) — map-side
  combine keeps the shuffle at |docs|·k rows, not |shingles|·k;
- banding joins are self-joins on band signatures: high-frequency
  buckets (boilerplate) are the skew risk → cap bucket width upstream
  or enable AQE skew-join (on by default in session.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _hex8_to_long(col):
    """First 8 hex chars of an md5 as a bigint — portable to ANSI SQL
    (`cast('0x' || substr(md5(x),1,8) as bigint)`)."""
    return F.conv(F.substring(col, 1, 8), 16, 10).cast("long")


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Exact duplicate groups by content digest → (text_hash, n_docs,
    keeper). The crawl seen-set pattern applied to content."""
    return (docs
            .groupBy(F.md5("text").alias("text_hash"))
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.min("doc_id").alias("keeper"))
            .filter(F.col("n_docs") > 1))


def _shingle_array(n: int):
    """Row-local n-word shingle array over a ``words`` column (the
    split text). Returns the UNDEDUPLICATED shingle sequence; wrap in
    ``F.array_distinct`` for set semantics — dedup then happens inside
    the row instead of via a full (doc_id, sh) shuffle."""
    # guard: sequence(1, 0) would *descend* in Spark → empty array instead
    return F.when(
        F.size("words") >= n,
        F.transform(F.sequence(F.lit(1), F.size("words") - (n - 1)),
                    lambda i: F.concat_ws(" ", F.slice("words", i, n))),
    ).otherwise(F.array().cast("array<string>"))


def word_shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    """Distinct n-word shingles per doc → (doc_id, sh). The per-doc
    dedup is row-local (``array_distinct`` before the explode), so this
    is a narrow op — no ``.distinct()`` shuffle of the shingle set
    (guide §2.4: the exploded (doc_id, sh) rows are already unique)."""
    words = docs.select("doc_id", F.split("text", " ").alias("words"))
    return words.select(
        "doc_id", F.explode(F.array_distinct(_shingle_array(n))).alias("sh"))


def minhash_signatures(shingles: DataFrame, k: int = 8) -> DataFrame:
    """k salted-md5 minhashes per doc → (doc_id, salt, mh). Uses k
    independent salts instead of permutations (standard trick; identical
    collision behavior for dedup purposes)."""
    spark = shingles.sparkSession
    salts = spark.range(k).select(F.col("id").cast("int").alias("salt"))
    return (shingles.crossJoin(F.broadcast(salts))
            .select("doc_id", "salt",
                    F.md5(F.concat_ws(":", F.col("salt"), F.col("sh"))).alias("h"))
            .groupBy("doc_id", "salt")
            .agg(F.min("h").alias("mh")))


def minhash_lsh_pairs(docs: DataFrame, k: int = 8, bands: int = 4,
                      shingle_n: int = 3,
                      max_band_df: int | None = None) -> DataFrame:
    """LSH candidate pairs: band the k minhashes into ``bands`` groups;
    docs sharing any full band signature are candidates →
    (doc_a, doc_b) distinct, doc_a < doc_b.

    ``max_band_df`` is the 100 TB skew guard (the ``max_shingle_df`` /
    ``max_chunk_df`` precedent): a band signature shared by more than N
    documents (boilerplate-heavy corpora where many docs share a whole
    minhash band) is dropped from candidate generation, bounding the
    self-join at O(N²) pairs per bucket instead of quadratic in the
    bucket. AQE skew-join splits the *partitions* of a hot bucket but
    not the pair count — this caps the pair count itself. TRADE: a pair
    whose only agreeing bands are all hot is missed (recall loss on
    exactly the boilerplate clusters that were the cost problem), so it
    is off by default."""
    # Single-shuffle signature computation (guide §2.3/§2.4): the k
    # salted hashes are k codegen md5 COLUMNS over the exploded
    # (doc_id, sh) rows — no crossJoin row blowup — and one
    # groupBy(doc_id) with k min() aggregates (map-side partial agg,
    # so the exchange carries |docs| rows × k digests) replaces the old
    # THREE exchanges (shingle distinct + per-(doc,salt) min +
    # per-(doc,band) collect_list). Band sigs become pure projections.
    # Hashing stays under whole-stage codegen — a row-local
    # transform()/array_min formulation was measured 3.5x SLOWER
    # because higher-order functions evaluate interpreted.
    sh = word_shingles(docs, shingle_n)
    mh_cols = [
        F.min(F.md5(F.concat_ws(":", F.lit(s), F.col("sh")))).alias(f"mh{s}")
        for s in range(k)
    ]
    sigs = sh.groupBy("doc_id").agg(*mh_cols)
    rows_per_band = k // bands
    # identical band partitioning and sig strings as the grouped form:
    # band = salt // rows_per_band; sig = lexically-sorted "salt=mh"
    # fragments joined by "|"
    groups: dict[int, list[int]] = {}
    for s in range(k):
        groups.setdefault(s // rows_per_band, []).append(s)
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.array_join(F.array_sort(F.array(*[
                F.concat_ws("=", F.lit(s), F.col(f"mh{s}"))
                for s in groups[b]])), "|").alias("sig"))
        for b in sorted(groups)
    ]
    banded = (sigs
              .select("doc_id", F.explode(F.array(*band_structs)).alias("bs"))
              .select("doc_id", "bs.band", "bs.sig"))
    if max_band_df is not None:
        hot = (banded.groupBy("band", "sig")
               .agg(F.count("*").alias("df"))
               .filter(F.col("df") > max_band_df)
               .select("band", "sig"))
        banded = banded.join(hot, ["band", "sig"], "left_anti")
    a = banded.select(F.col("doc_id").alias("doc_a"), "band", "sig")
    b = banded.select(F.col("doc_id").alias("doc_b"), "band", "sig")
    return (a.join(b, ["band", "sig"])
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b").distinct())


def simhash_groups(docs: DataFrame, bits: int = 16) -> DataFrame:
    """SimHash over word multisets (bit b set iff Σ ±1 votes > 0, vote
    from bit b of md5(word)) → near-dup groups (simhash, n_docs).

    Shape note (optimization round): a row-local higher-order
    ``aggregate`` over the split words (no explode, no per-doc shuffle)
    was measured 3x SLOWER than this explode + partial-agg form — HOFs
    evaluate interpreted while the explode path keeps md5/conv and the
    16 vote sums under whole-stage codegen, and the groupBy exchange
    only carries |docs| partially-aggregated rows anyway."""
    words = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w"))
    hashed = words.select(
        "doc_id", _hex8_to_long(F.md5("w")).alias("h"))
    bit_sums = [
        F.sum(F.when(F.shiftright(F.col("h"), b).bitwiseAND(1) == 1, 1)
              .otherwise(-1)).alias(f"s{b}")
        for b in range(bits)
    ]
    per_doc = hashed.groupBy("doc_id").agg(*bit_sums)
    sim = None
    for b in range(bits):
        term = F.when(F.col(f"s{b}") > 0, 1 << b).otherwise(0)
        sim = term if sim is None else sim + term
    return (per_doc.select("doc_id", sim.cast("long").alias("simhash"))
            .groupBy("simhash")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.min("doc_id").alias("keeper"))
            .filter(F.col("n_docs") > 1))


def ngram_jaccard_pairs(docs: DataFrame, shingle_n: int = 3,
                        threshold: float = 0.8,
                        max_shingle_df: int | None = None) -> DataFrame:
    """n-gram Jaccard over candidate pairs sharing ≥1 shingle →
    (doc_a, doc_b, jaccard).

    ``max_shingle_df`` is the 100 TB guard: shingles present in more
    than that many documents (boilerplate headers/footers) are dropped
    from every doc's shingle set *before* the self-join, so one hot
    shingle can never make candidate generation quadratic. Jaccard is
    then exact over the capped shingle sets (sizes and intersections
    both use the capped sets — self-consistent and SQL-expressible).
    None disables the cap (exact Jaccard over all shingles).

    Candidate generation is a PREFIX-FILTERED similarity self-join
    (Chaudhuri et al. SSJoin / Xiao et al. PPJoin): order every doc's
    shingles by global rarity (df asc, sh asc — one total order), keep
    only the first ``sz - ceil(t'·sz) + 1`` as the doc's *prefix*, and
    self-join prefixes instead of full shingle sets. Theorem: two sets
    with J ≥ t' must share their order-smallest common element inside
    BOTH prefixes, so no qualifying pair is lost; a size-ratio filter
    (``t'·sz_a ≤ sz_b`` both ways) and PPJoin's POSITIONAL filter
    (``1 + min(sz_a - rnk_a, sz_b - rnk_b) ≥ t'/(1+t')·(sz_a+sz_b)``,
    an overlap upper bound from the matched element's rank — satisfied
    at the smallest common element of any qualifying pair, so also
    lossless) prune further before the pair distinct; both are implied
    by J ≥ t' so they only drop non-qualifying candidates (measured:
    5.6M → 2.0M candidate pairs at sf1.0 density). t' = threshold - 1e-4
    absorbs the output's ``round(j, 4) >= threshold`` edge (a pair at
    j = t - 0.00004 rounds UP into the result and must not be lost) and
    float-product edges like 0.8·50 → 40.000000000000006. Exact common
    counts for the surviving candidates come from a row-local
    ``array_intersect`` over the per-doc shingle arrays — the old
    100M-row (doc_a, doc_b) groupBy at high shingle density is gone."""
    sh = word_shingles(docs, shingle_n)
    # df as a WINDOW count over sh (guide §2.4 — share one exchange):
    # count(*) over (partition by sh) establishes hashpartitioning(sh)
    # once and both the cap filter and the prefix rarity order read it
    # inline — no separate groupBy-df + join of the shingle set.
    w_df = Window.partitionBy("sh")
    sh = sh.withColumn("df", F.count("*").over(w_df))
    if max_shingle_df is not None:
        sh = sh.filter(F.col("df") <= max_shingle_df)
    t_eff = max(threshold - 1e-4, 0.0)
    # per-doc size + rarity rank share ONE doc_id exchange (§2.4: the
    # two windows and the collect_list below are all doc_id-partitioned)
    w_doc = Window.partitionBy("doc_id")
    w_rank = Window.partitionBy("doc_id").orderBy("df", "sh")
    ranked = (sh.withColumn("sz", F.count("*").over(w_doc))
              .withColumn("rnk", F.row_number().over(w_rank)))
    prefix = ranked.filter(
        F.col("rnk") <= F.col("sz") - F.ceil(F.lit(t_eff) * F.col("sz")) + 1)
    a = prefix.select(F.col("doc_id").alias("doc_a"), "sh",
                      F.col("sz").alias("sz_a"), F.col("rnk").alias("rnk_a"))
    b = prefix.select(F.col("doc_id").alias("doc_b"), "sh",
                      F.col("sz").alias("sz_b"), F.col("rnk").alias("rnk_b"))
    alpha = F.lit(t_eff / (1 + t_eff)) * (F.col("sz_a") + F.col("sz_b"))
    cand = (a.join(b, "sh")
            .filter((F.col("doc_a") < F.col("doc_b"))
                    & (F.col("sz_b") >= F.lit(t_eff) * F.col("sz_a"))
                    & (F.col("sz_a") >= F.lit(t_eff) * F.col("sz_b"))
                    & (F.lit(1) + F.least(F.col("sz_a") - F.col("rnk_a"),
                                          F.col("sz_b") - F.col("rnk_b"))
                       >= alpha))
            .select("doc_a", "doc_b")
            .distinct())
    # full shingle set per doc as ONE array row, built from ``ranked``
    # so it REUSES the doc_id exchange the windows established (§2.4);
    # candidates then verify row-locally. SHUFFLE_HASH: the sets side
    # is |docs| array rows — hashing it beats sorting the candidate
    # pair stream (§3.1), and a broadcast would not be 100 TB-safe.
    sets = ranked.groupBy("doc_id").agg(F.collect_list("sh").alias("shs"))
    set_a = sets.select(F.col("doc_id").alias("doc_a"),
                        F.col("shs").alias("shs_a")).hint("SHUFFLE_HASH")
    set_b = sets.select(F.col("doc_id").alias("doc_b"),
                        F.col("shs").alias("shs_b")).hint("SHUFFLE_HASH")
    return (cand.join(set_a, "doc_a").join(set_b, "doc_b")
            .withColumn("common", F.size(F.array_intersect("shs_a", "shs_b")))
            .withColumn("jaccard",
                        F.round(F.col("common")
                                / (F.size("shs_a") + F.size("shs_b")
                                   - F.col("common")), 4))
            .filter(F.col("jaccard") >= threshold)
            .select("doc_a", "doc_b", "jaccard"))


def phash_dup_pairs(images: DataFrame, threshold: int = 3,
                    bands: int | None = None, id_col: str = "image_id",
                    phash_col: str = "phash",
                    max_chunk_df: int | None = None) -> DataFrame:
    """Perceptual-hash near-duplicate image pairs over the image+caption
    table shape (image_id, bytes, w, h, fmt, caption, phash:int64) →
    (image_a, image_b, hamming), image_a < image_b.

    Banded Hamming-LSH: the 64-bit phash is split into ``bands``
    contiguous bit chunks; images sharing any (band, chunk) value are
    candidates, then the exact filter ``bit_count(a XOR b) <= threshold``
    runs only on candidates. With ``bands >= threshold + 1`` (the
    default) the blocking is LOSSLESS by pigeonhole — a pair within
    Hamming distance t differs in at most t chunks, so it must agree on
    at least one of t+1 disjoint chunks — unlike MinHash banding this
    finds EVERY qualifying pair, no recall loss.

    Scale: the self-join key is (band, chunk); with 64/bands-bit chunks
    a hot chunk value (e.g. a solid-color phash plateau) is the skew
    risk — AQE skew-join handles moderate cases, and candidate pairs
    are generated per-band then de-duplicated, never all-pairs. For
    plateau-heavy corpora, ``max_chunk_df`` is the 100 TB guard (the
    ``max_shingle_df`` precedent): (band, chunk) buckets with more than
    N members are dropped from candidate generation, bounding the
    self-join at O(N²) per bucket. This TRADES the pigeonhole
    losslessness for a hard cost bound — a pair whose every agreeing
    chunk is a plateau is missed — so it is off by default. Pure JVM
    expressions (shift/mask/xor/bit_count), exact SQL oracle."""
    if bands is None:
        # any bands >= threshold+1 keeps the pigeonhole guarantee; round
        # up to the next power of two so the chunks tile 64 bits evenly
        bands = 1
        while bands < threshold + 1:
            bands *= 2
    if not 1 <= bands <= 64 or 64 % bands:
        raise ValueError(f"bands must divide 64, got {bands}")
    width = 64 // bands
    ph = F.col(phash_col)

    def _chunk(i: int):
        # bands=1 → width=64 → the chunk IS the whole hash; masking with
        # (1<<64)-1 would overflow a java long at plan-build time
        if width == 64:
            return ph
        mask = (1 << width) - 1
        return (F.shiftrightunsigned(ph, i * width)
                .bitwiseAND(F.lit(mask)))

    chunks = F.array(*[
        F.struct(F.lit(i).alias("band"), _chunk(i).alias("chunk"))
        for i in range(bands)])
    ex = (images.select(F.col(id_col).alias("id"), ph.alias("ph"),
                        F.explode(chunks).alias("bc"))
          .select("id", "ph", "bc.band", "bc.chunk"))
    if max_chunk_df is not None:
        hot = (ex.groupBy("band", "chunk")
               .agg(F.count("*").alias("df"))
               .filter(F.col("df") > max_chunk_df)
               .select("band", "chunk"))
        ex = ex.join(hot, ["band", "chunk"], "left_anti")
    a = ex.select(F.col("id").alias("image_a"), F.col("ph").alias("ph_a"),
                  "band", "chunk")
    b = ex.select(F.col("id").alias("image_b"), F.col("ph").alias("ph_b"),
                  "band", "chunk")
    cand = (a.join(b, ["band", "chunk"])
            .filter(F.col("image_a") < F.col("image_b"))
            .select("image_a", "image_b", "ph_a", "ph_b").distinct())
    return (cand
            .withColumn("hamming",
                        F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b")))
                        .cast("int"))
            .filter(F.col("hamming") <= threshold)
            .select("image_a", "image_b", "hamming"))


def embedding_dup_pairs(embeddings: DataFrame, threshold: float = 0.95,
                        n_planes: int = 8) -> DataFrame:
    """Near-duplicate same-label embedding pairs by cosine ≥ threshold,
    *blocked by LSH bucket* (similarity.lsh_bucket) so a hot label can
    never make candidate generation all-pairs: only vectors sharing a
    bucket are scored. APPROXIMATE (recall < 1): exact duplicates always
    share a bucket, but a pair at cos ≈ threshold can straddle a
    hyperplane (one near-tie dot-product sign flip) and be missed —
    single-probe LSH trades that recall for never going all-pairs.
    Raise recall with fewer planes or multi-probe (query neighboring
    bucket codes at Hamming distance 1), at candidate-set cost. The
    self-join key is (bucket, label); hot buckets are handled by AQE
    skew-join → (label, n_pairs)."""
    from infinitycrawler_spark.operators.similarity import lsh_bucket

    e = embeddings.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v"))
    e = e.withColumn("bucket", lsh_bucket(F.col("v"), n_planes))
    dot = F.aggregate(F.zip_with("va", "vb", lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    norm = lambda c: F.sqrt(F.aggregate(  # noqa: E731
        F.transform(c, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))
    a = e.select(F.col("vec_id").alias("id_a"), "label", "bucket",
                 F.col("v").alias("va"))
    b = e.select(F.col("vec_id").alias("id_b"), "label", "bucket",
                 F.col("v").alias("vb"))
    pairs = (a.join(b, ["bucket", "label"]).filter(F.col("id_a") < F.col("id_b"))
             .withColumn("cos", F.round(dot / (norm("va") * norm("vb")), 4))
             .filter(F.col("cos") >= threshold))
    return (pairs.groupBy("label")
            .agg(F.count("*").cast("long").alias("n_pairs"))
            .orderBy("label"))
