"""Multimodal operator plumbing: decode/feature/resize over binary
columns via mapInPandas; corrupt rows become error rows, unsupported
formats surface as typed errors. Audio (raw PCM) and video (raw RGB
frames) decode for real — functions/media.py — with codec formats as
error rows."""

import numpy as np
import pytest

from infinitycrawler_spark.functions.images import decode_image, expected_pixels
from infinitycrawler_spark.operators.multimodal import (
    audio_features,
    image_features,
    image_resize,
    video_frame_sample,
)
from infinitycrawler_spark.sources.web import pages_df
from infinitycrawler_spark.synth.fixtures import content_site


@pytest.fixture(scope="module")
def pages(spark):
    return pages_df(spark, content_site()).cache()


def test_image_features(spark, pages):
    feats = {r.image_id: r for r in image_features(pages).collect()}
    assert len(feats) == pages.count()
    ok = [f for f in feats.values() if f.ok == "ok"]
    assert len(ok) == len(feats)
    one = ok[0]
    assert one.w == 16 and one.h == 12
    assert len(one.mean_rgb) == 3 and all(0 <= m <= 255 for m in one.mean_rgb)
    assert len(one.embedding) == 16
    assert all(0.0 <= e <= 1.0 for e in one.embedding)
    # phash: exact for lossless rows; ≤ small hamming distance for the
    # quantized format (threshold-boundary blocks may flip)
    stored = {r.image_id: (r.phash, r.fmt) for r in
              pages.select("image_id", "phash", "fmt").collect()}
    for image_id, (phash, fmt) in stored.items():
        got = feats[image_id].phash
        if fmt == "rgb8-raw":
            assert got == phash, (image_id, fmt)
        else:
            hamming = bin((got ^ phash) & ((1 << 64) - 1)).count("1")
            assert hamming <= 4, (image_id, fmt, hamming)


def test_image_features_corrupt_and_unsupported(spark, pages):
    from pyspark.sql import functions as F

    corrupt = pages.limit(2).withColumn("bytes", F.lit(b"garbage"))
    rows = image_features(corrupt).collect()
    assert all(r.ok == "error:corrupt" for r in rows)

    jpeg = pages.limit(2).withColumn("fmt", F.lit("jpeg"))
    rows2 = image_features(jpeg).collect()
    assert all(r.ok == "error:unsupported:jpeg" for r in rows2)


def test_image_resize_roundtrip(spark, pages):
    out = {r.image_id: r for r in image_resize(pages, 8, 6).collect()}
    first = next(iter(out.values()))
    assert first.w == 8 and first.h == 6
    px, fmt = decode_image(bytes(first.bytes))
    assert px.shape == (6, 8, 3) and fmt == "rgb8-raw"
    # nearest-neighbor of a known image: pixel (0,0) preserved
    src = expected_pixels(first.image_id, 16, 12)
    resized = out[first.image_id]
    px2, _ = decode_image(bytes(resized.bytes))
    lossless = {r.image_id for r in pages.filter("fmt = 'rgb8-raw'")
                .select("image_id").collect()}
    if first.image_id in lossless:
        assert np.array_equal(px2[0, 0], src[0, 0])


def test_audio_features(spark):
    import numpy as np

    from infinitycrawler_spark.functions.media import (
        decode_audio,
        encode_audio,
        make_audio,
    )

    rows = [("a1", make_audio("a1", seconds=0.5, sample_rate=8000), "pcm16"),
            ("a2", make_audio("a2", seconds=0.25, sample_rate=16000,
                              channels=2), "pcm16"),
            ("bad", b"garbage", "pcm16"),
            ("mp3", make_audio("x"), "mp3")]
    df = spark.createDataFrame(
        rows, "audio_id string, bytes binary, fmt string")
    out = {r.audio_id: r for r in audio_features(df).collect()}
    assert out["bad"].ok == "error:corrupt"
    assert out["mp3"].ok == "error:unsupported:mp3"
    a1 = out["a1"]
    assert a1.ok == "ok" and a1.sample_rate == 8000 and a1.channels == 1
    assert abs(a1.duration_s - 0.5) < 1e-9
    assert 0.05 < a1.rms < 0.8 and 0 < a1.zero_crossing_rate < 1
    assert a1.peak <= 1.0
    # rms matches a direct numpy computation on the decoded samples
    samples, sr, ch = decode_audio(
        make_audio("a1", seconds=0.5, sample_rate=8000))
    x = samples.astype(np.float64) / 32768.0
    assert abs(a1.rms - float(np.sqrt(np.mean(x * x)))) < 1e-12
    a2 = out["a2"]
    assert a2.channels == 2 and a2.sample_rate == 16000
    assert abs(a2.duration_s - 0.25) < 1e-9
    # a pure silence clip: rms/zcr/peak are exactly zero
    silent = spark.createDataFrame(
        [("s", encode_audio(np.zeros(100, dtype=np.int16), 8000), "pcm16")],
        "audio_id string, bytes binary, fmt string")
    s = audio_features(silent).collect()[0]
    assert s.rms == 0.0 and s.zero_crossing_rate == 0.0 and s.peak == 0.0


def test_video_frame_sample(spark):
    from infinitycrawler_spark.functions.media import (
        decode_video_frame,
        make_video,
    )

    rows = [("v1", make_video("v1", n_frames=8, w=16, h=12, fps=4.0), "rawv"),
            ("bad", b"nope", "rawv"),
            ("mp4", make_video("x"), "mp4")]
    df = spark.createDataFrame(
        rows, "video_id string, bytes binary, fmt string")
    out = video_frame_sample(df, every_n_seconds=1.0).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r.video_id, []).append(r)
    assert by_id["bad"][0].ok == "error:corrupt"
    assert by_id["mp4"][0].ok == "error:unsupported:mp4"
    v1 = sorted(by_id["v1"], key=lambda r: r.frame_idx)
    # 8 frames at 4 fps, sampled every 1 s → frames 0 and 4
    assert [r.frame_idx for r in v1] == [0, 4]
    assert [r.ts_s for r in v1] == [0.0, 1.0]
    assert all(r.ok == "ok" and r.w == 16 and r.h == 12 for r in v1)
    # sampled frames round-trip through the image codec bit-exactly
    # and compose with image_features downstream
    raw = make_video("v1", n_frames=8, w=16, h=12, fps=4.0)
    px, fmt = decode_image(bytes(v1[1].bytes))
    assert fmt == "rgb8-raw"
    assert np.array_equal(px, decode_video_frame(raw, 4))
    frames_df = spark.createDataFrame(
        [(f"v1#{r.frame_idx}", bytes(r.bytes), "rgb8-raw") for r in v1],
        "image_id string, bytes binary, fmt string")
    feats = image_features(frames_df).collect()
    assert all(f.ok == "ok" for f in feats)
