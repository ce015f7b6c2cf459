"""Real on-disk codec seam (VERDICT r3 item 2 / r4 next #4):
uncompressed 24-bit BMP, baseline PNG (zlib inflate + all five scanline
filters) and RIFF/WAVE PCM s16 decode with stdlib+numpy alone;
PIL-backed jpeg/webp dispatch activates when PIL is importable
(importorskip-gated — skipped in this container); and the float64-phash
batch regression the BMP oracle surfaced is pinned."""

import struct
import zlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from infinitycrawler_spark.functions.images import (
    _PNG_SIG,
    _png_chunk,
    decode_bmp,
    decode_png,
    encode_bmp,
    encode_png,
    expected_pixels,
    phash64,
)
from infinitycrawler_spark.functions.media import (
    decode_audio,
    decode_wav,
    encode_wav,
    make_audio,
)

# ------------------------------------------------------------- BMP

@settings(max_examples=25, deadline=None)
@given(w=st.integers(1, 40), h=st.integers(1, 30), seed=st.integers(0, 99))
def test_bmp_roundtrip_any_size(w, h, seed):
    # widths not divisible by 4 exercise row padding
    px = expected_pixels(f"bmp{seed}", w, h)
    out = decode_bmp(encode_bmp(px))
    assert np.array_equal(out, px)


def test_bmp_top_down_variant():
    import struct

    px = expected_pixels("td", 6, 4)
    b = bytearray(encode_bmp(px[::-1]))   # rows already top-down
    b[22:26] = struct.pack("<i", -4)      # negative height = top-down
    assert np.array_equal(decode_bmp(bytes(b)), px)


@pytest.mark.parametrize("mut", [
    lambda b: b[:30],                       # truncated header
    lambda b: b[:len(b) - 5],               # truncated pixel data
    lambda b: b"XX" + b[2:],                # wrong magic
    lambda b: b[:28] + b"\x08\x00" + b[30:],  # 8-bit (palette) variant
])
def test_bmp_rejects_unsupported(mut):
    b = encode_bmp(expected_pixels("r", 8, 8))
    with pytest.raises(ValueError):
        decode_bmp(mut(b))


# ------------------------------------------------------------- WAV

@pytest.mark.parametrize("ch", [1, 2])
def test_wav_roundtrip(ch):
    samples, sr, c = decode_audio(make_audio("w", seconds=0.1, channels=ch))
    s2, sr2, c2 = decode_wav(encode_wav(samples, sr, c))
    assert np.array_equal(samples, s2) and (sr, c) == (sr2, c2)


def test_wav_rejects_corrupt_and_non_s16():
    import io
    import wave

    samples, sr, c = decode_audio(make_audio("w", seconds=0.05))
    good = encode_wav(samples, sr, c)
    with pytest.raises(ValueError):
        decode_wav(good[:21])
    with pytest.raises(ValueError):
        decode_wav(b"not riff at all")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:   # 8-bit PCM → unsupported width
        wf.setnchannels(1)
        wf.setsampwidth(1)
        wf.setframerate(8000)
        wf.writeframes(b"\x80" * 100)
    with pytest.raises(ValueError, match="sample width"):
        decode_wav(buf.getvalue())


# --------------------------------------------- operators over real files

def test_image_features_bmp_exact_phash_with_mixed_batch(spark):
    """The regression the BMP oracle caught: a pandas batch mixing an
    error row (phash=None) with ok rows must not round 63-bit phashes
    through float64 (multiples-of-1024 corruption)."""
    from infinitycrawler_spark.operators.multimodal import image_features

    ids = ["18", "19"]  # phashes with >53 significant bits
    rows = [(d, encode_bmp(expected_pixels(d, 24, 16)), "bmp") for d in ids]
    rows.append(("zz-corrupt", b"BMgarbage", "bmp"))
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, fmt string").coalesce(1)
    got = {r.image_id: r for r in image_features(df).collect()}
    for d in ids:
        assert got[d].ok == "ok"
        assert got[d].phash == phash64(expected_pixels(d, 24, 16))
    assert got["zz-corrupt"].ok == "error:corrupt"


def test_audio_features_wav(spark):
    from infinitycrawler_spark.operators.multimodal import audio_features

    samples, sr, c = decode_audio(make_audio("a1", seconds=0.1, channels=2))
    df = spark.createDataFrame(
        [("a1", encode_wav(samples, sr, c), "wav"),
         ("a2", b"RIFFjunk", "wav"),
         ("a3", b"ID3mp3", "mp3")],
        "audio_id string, bytes binary, fmt string")
    got = {r.audio_id: r for r in audio_features(df).collect()}
    assert got["a1"].ok == "ok" and got["a1"].channels == 2
    assert got["a1"].sample_rate == sr
    assert got["a2"].ok == "error:corrupt"
    assert got["a3"].ok == "error:unsupported:mp3"
    # WAV features equal the pcm16 features for the same samples
    pcm = spark.createDataFrame(
        [("a1", make_audio("a1", seconds=0.1, channels=2), "pcm16")],
        "audio_id string, bytes binary, fmt string")
    ref = audio_features(pcm).collect()[0]
    for f in ("duration_s", "rms", "zero_crossing_rate", "peak"):
        assert getattr(got["a1"], f) == getattr(ref, f)


def test_pil_dispatch_when_available(spark):
    """When PIL is installed, jpeg decodes through the same operator
    with identical schema (skipped in codec-less containers)."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    from infinitycrawler_spark.operators.multimodal import image_features

    px = expected_pixels("pil", 24, 16)
    buf = io.BytesIO()
    PIL_Image.fromarray(px).save(buf, format="JPEG", quality=95)
    df = spark.createDataFrame(
        [("p1", buf.getvalue(), "jpeg")],
        "image_id string, bytes binary, fmt string")
    row = image_features(df).collect()[0]
    assert row.ok == "ok" and (row.w, row.h) == (24, 16)


# ------------------------------------------------------------- PNG

@settings(max_examples=25, deadline=None)
@given(w=st.integers(1, 40), h=st.integers(1, 30), seed=st.integers(0, 99))
def test_png_roundtrip_any_size(w, h, seed):
    # filter_cycle exercises all five scanline filters across the rows
    px = expected_pixels(f"png{seed}", w, h)
    assert np.array_equal(decode_png(encode_png(px)), px)
    assert np.array_equal(decode_png(encode_png(px, filter_cycle=False)), px)


def _raw_png(w, h, color, channels_data, interlace=0):
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, interlace)
    raw = b"".join(b"\x00" + channels_data[r].tobytes() for r in range(h))
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(raw))
            + _png_chunk(b"IEND", b""))


def test_png_gray_and_rgba_variants():
    g = np.arange(12, dtype=np.uint8).reshape(3, 4)
    out = decode_png(_raw_png(4, 3, 0, g))
    assert out.shape == (3, 4, 3)
    for c in range(3):
        assert np.array_equal(out[..., c], g)
    rgba = expected_pixels("rgba", 4, 3)
    rgba4 = np.concatenate(
        [rgba, np.full((3, 4, 1), 128, np.uint8)], axis=2)
    # PIL convert("RGB") semantics: alpha dropped, not composited
    assert np.array_equal(
        decode_png(_raw_png(4, 3, 6, rgba4.reshape(3, -1))), rgba)


@pytest.mark.parametrize("mut", [
    lambda b: b[:40],                      # truncated mid-IDAT
    lambda b: b[:len(b) - 6],              # truncated IEND (no trailer)
    lambda b: b"nope" + b[4:],             # wrong signature
    lambda b: bytes(bytearray(b[:30]) + bytearray([b[30] ^ 0xFF])
                    + bytearray(b[31:])),  # CRC flip
])
def test_png_rejects_corrupt(mut):
    b = encode_png(expected_pixels("pc", 8, 8))
    with pytest.raises(ValueError):
        decode_png(mut(b))


def test_png_interlaced_is_typed_unsupported(spark):
    from infinitycrawler_spark.operators.multimodal import image_features

    interlaced = _raw_png(4, 3, 2, expected_pixels("il", 4, 3), interlace=1)
    with pytest.raises(NotImplementedError):
        decode_png(interlaced)
    df = spark.createDataFrame(
        [("i1", interlaced, "png"),
         ("i2", encode_png(expected_pixels("ok", 6, 5)), "png")],
        "image_id string, bytes binary, fmt string")
    rows = {r.image_id: r for r in image_features(df).collect()}
    assert rows["i1"].ok == "error:unsupported:png"
    assert rows["i2"].ok == "ok"
    assert rows["i2"].phash == phash64(expected_pixels("ok", 6, 5))


def test_png_matches_pil_where_importable():
    """Cross-implementation parity: PIL must read our PNGs pixel-exact
    and we must read PIL's (skipped in codec-less containers)."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    px = expected_pixels("xpil", 24, 16)
    ours = encode_png(px)
    assert np.array_equal(
        np.asarray(PIL_Image.open(io.BytesIO(ours)).convert("RGB")), px)
    buf = io.BytesIO()
    PIL_Image.fromarray(px).save(buf, format="PNG")
    assert np.array_equal(decode_png(buf.getvalue()), px)


def test_library_formats_without_pil_surface_typed_errors(spark):
    try:
        import PIL  # noqa: F401
        pytest.skip("PIL installed — the NotImplementedError path is moot")
    except ImportError:
        pass
    from infinitycrawler_spark.operators.multimodal import image_features

    df = spark.createDataFrame(
        [("j", b"\xff\xd8\xff\xe0fake", "jpeg")],
        "image_id string, bytes binary, fmt string")
    assert image_features(df).collect()[0].ok == "error:unsupported:jpeg"
