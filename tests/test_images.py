"""Image payload codec invariants (BASELINE.json input_hint):
decoded-pixel allclose / PSNR ≥ 40 dB for lossy, caption equality,
phash recompute."""

import numpy as np

from infinitycrawler_spark.functions.images import (
    decode_image,
    encode_image,
    expected_caption,
    expected_pixels,
    make_payload,
    phash64,
    psnr_db,
    validate_payload,
    PSNR_GATE_DB,
)


def test_raw_roundtrip_lossless():
    px = expected_pixels("img-1", 16, 12)
    decoded, fmt = decode_image(encode_image(px, "rgb8-raw"))
    assert fmt == "rgb8-raw"
    assert np.array_equal(decoded, px)


def test_lossy_meets_psnr_gate():
    px = expected_pixels("img-2", 32, 24)
    decoded, fmt = decode_image(encode_image(px, "rgb8-q"))
    assert fmt == "rgb8-q"
    score = psnr_db(decoded, px)
    assert PSNR_GATE_DB <= score < 50


def test_validate_payload_ok_and_corrupt():
    p = make_payload("http://h/p", "h", "/p", 16, 12, "rgb8-q")
    ok, score, phash_match, caption_ok = validate_payload(
        p["image_id"], p["bytes"], p["w"], p["h"], p["fmt"],
        p["caption"], p["phash"], "h", "/p")
    assert ok and phash_match and caption_ok and score >= PSNR_GATE_DB

    corrupted = p["bytes"][:-10] + b"\x00" * 10
    ok2, *_ = validate_payload(
        p["image_id"], corrupted[:20], p["w"], p["h"], p["fmt"],
        p["caption"], p["phash"], "h", "/p")
    assert not ok2

    wrong_caption = validate_payload(
        p["image_id"], p["bytes"], p["w"], p["h"], p["fmt"],
        "not the caption", p["phash"], "h", "/p")
    assert wrong_caption[0] and not wrong_caption[3]


def test_determinism_across_processes():
    # same id → same pixels/caption/phash (re-derivable on any worker)
    a = expected_pixels("stable", 8, 8)
    b = expected_pixels("stable", 8, 8)
    assert np.array_equal(a, b)
    assert expected_caption("x", "h", "/p") == expected_caption("x", "h", "/p")
    assert phash64(a) == phash64(b)


def test_phash_stable_under_quantization():
    px = expected_pixels("img-3", 64, 48)
    q, _ = decode_image(encode_image(px, "rgb8-q"))
    assert phash64(px) == phash64(q)


def test_phash_fast_path_matches_general_path():
    """The 8|h ∧ 8|w reshape-mean fast path must be bit-identical to the
    linspace slice-mean general path. Holds by construction because gray
    stays an integer channel sum (block sums exact in float64 under any
    summation order); this pins it, including near-tie blocks."""

    def general_path(pixels):
        gray = pixels.sum(axis=2, dtype=np.int32)
        h, w = gray.shape
        ys = np.linspace(0, h, 9).astype(int)
        xs = np.linspace(0, w, 9).astype(int)
        blocks = np.empty((8, 8))
        for i in range(8):
            for j in range(8):
                blocks[i, j] = gray[ys[i]:max(ys[i + 1], ys[i] + 1),
                                    xs[j]:max(xs[j + 1], xs[j] + 1)].mean()
        bits = (blocks > blocks.mean()).flatten()
        value = int.from_bytes(np.packbits(bits).tobytes(), "big")
        return value - (1 << 64) if value >= (1 << 63) else value

    for shape in [(8, 8), (16, 8), (32, 24), (64, 48), (40, 16)]:
        h, w = shape
        for seed in range(6):
            px = expected_pixels(f"branch-{h}x{w}-{seed}", w, h)
            assert phash64(px) == general_path(px), (shape, seed)
    # adversarial near-tie: constant image (every block == the mean)
    flat = np.full((16, 16, 3), 77, dtype=np.uint8)
    assert phash64(flat) == general_path(flat)
