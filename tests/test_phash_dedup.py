"""phash_dup_pairs: banded Hamming-LSH over the image+caption table
shape (BASELINE.json input_hint). The banding guarantee (bands =
threshold+1 → lossless by pigeonhole) is exercised by a brute-force
oracle over adversarial phashes, including a pair whose differing bits
span three different chunks; the sf-level DuckDB parity is covered by
the driver's `dedup_phash` oracle.
"""

import itertools

import pytest
from pyspark.sql import functions as F

from infinitycrawler_spark.operators.dedup import phash_dup_pairs


def _images(spark, rows):
    return spark.createDataFrame(
        [(i, ph) for i, ph in rows], "image_id long, phash long")


def _brute(rows, t):
    out = []
    for (ia, pa), (ib, pb) in itertools.combinations(sorted(rows), 2):
        h = bin(pa ^ pb).count("1")
        if h <= t:
            out.append((ia, ib, h))
    return sorted(out)


def test_phash_pairs_match_bruteforce(spark):
    # diffs spread across chunks: 0/1 same, 2 flips one bit in chunk 0,
    # 3 flips bits in chunks 0+1+3 (hamming 3 — pigeonhole forces the
    # agreeing chunk 2 to catch it), 4 is far from everything
    base = 0x123456789ABCDEF
    rows = [
        (0, base),
        (1, base),                                     # exact dup (h=0)
        (2, base ^ 0x4),                               # h=1, chunk 0
        (3, base ^ 0x8 ^ (1 << 20) ^ (1 << 60)),       # h=3, 3 chunks
        (4, base ^ 0xFFFF_FFFF),                       # h=32
    ]
    got = sorted(
        (r.image_a, r.image_b, r.hamming)
        for r in phash_dup_pairs(_images(spark, rows), threshold=3).collect())
    assert got == _brute(rows, 3)
    assert (0, 3, 3) in got  # the 3-chunk-spread pair was not missed


def test_phash_threshold_and_bands_validation(spark):
    rows = [(0, 0), (1, 0b11)]  # hamming 2
    df = _images(spark, rows)
    assert phash_dup_pairs(df, threshold=1).count() == 0
    assert phash_dup_pairs(df, threshold=2).count() == 1
    with pytest.raises(ValueError, match="divide 64"):
        phash_dup_pairs(df, threshold=3, bands=5)


def test_phash_dedup_over_decoded_bmps_end_to_end(spark):
    # real codec seam -> phash -> banded Hamming-LSH, end to end: encode
    # 16x16 BMPs whose 2x2 blocks map 1:1 onto the 8x8 average-hash
    # grid (0/255 contrast keeps every bit far from the threshold), so
    # the expected Hamming distances are exact by construction
    import numpy as np

    from infinitycrawler_spark.functions.images import encode_bmp
    from infinitycrawler_spark.operators.multimodal import image_features

    def bmp(bits):
        px = np.zeros((16, 16, 3), np.uint8)
        for i in range(8):
            for j in range(8):
                if bits[i][j]:
                    px[2 * i:2 * i + 2, 2 * j:2 * j + 2] = 255
        return encode_bmp(px)

    checker = [[(i + j) % 2 == 0 for j in range(8)] for i in range(8)]
    near = [row[:] for row in checker]
    near[0][0] = not near[0][0]                     # one block flipped
    far = [[not b for b in row] for row in checker]  # all 64 bits flipped
    df = spark.createDataFrame(
        [("a", bmp(checker), "bmp"), ("b", bmp(checker), "bmp"),
         ("c", bmp(near), "bmp"), ("d", bmp(far), "bmp")],
        "image_id string, bytes binary, fmt string")
    feats = image_features(df)
    assert feats.filter(F.col("ok") != "ok").count() == 0
    got = sorted(
        (r.image_a, r.image_b, r.hamming)
        for r in phash_dup_pairs(
            feats.select("image_id", "phash"), threshold=3).collect())
    assert got == [("a", "b", 0), ("a", "c", 1), ("b", "c", 1)]


def test_phash_negative_phash_uses_logical_shift(spark):
    # a real int64 phash can be negative; chunking must be logical, and
    # the pair must still be found with all-ones upper bits
    rows = [(0, -1), (1, -1 ^ 0b101)]  # hamming 2
    got = phash_dup_pairs(_images(spark, rows), threshold=3).collect()
    assert [(r.image_a, r.image_b, r.hamming) for r in got] == [(0, 1, 2)]


def test_max_chunk_df_bounds_plateau_buckets(spark):
    """A plateau phash (many identical hashes — solid-color images)
    must stop exploding candidate generation when max_chunk_df is set:
    plateau-internal pairs are dropped (documented recall trade), while
    pairs whose agreeing chunks are below the cap survive."""
    from infinitycrawler_spark.operators.dedup import phash_dup_pairs

    base = (1 << 40) | (1 << 20) | (1 << 10) | (1 << 5) | 1  # 5 bits set:
    # Hamming 5 from the plateau, so cross pairs fail the threshold
    rows = [(i, 0) for i in range(50)]        # 50-image plateau
    rows += [(100, base), (101, base ^ 3)]    # normal near-dup pair
    df = spark.createDataFrame(rows, "image_id long, phash long")

    capped = phash_dup_pairs(df, threshold=3, max_chunk_df=10).collect()
    got = {(r.image_a, r.image_b) for r in capped}
    # every (band, chunk) of the plateau holds 50 > 10 members → all
    # plateau pairs dropped; the pair at distance 2 agrees on 3 chunks
    # of df ≤ 10 (plateau shares no nonzero chunk) → kept
    assert got == {(100, 101)}
    # default (no cap) keeps losslessness: all 50*49/2 plateau pairs
    full = phash_dup_pairs(df, threshold=3).count()
    assert full == 50 * 49 // 2 + 1
