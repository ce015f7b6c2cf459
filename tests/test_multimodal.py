"""Multimodal operator plumbing: decode/feature/resize over binary
columns via mapInPandas; corrupt rows become error rows, unsupported
formats surface as such (decode stubs), audio/video stubs raise."""

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


def test_audio_video_stubs_raise(pages):
    with pytest.raises(NotImplementedError):
        audio_features(pages)
    with pytest.raises(NotImplementedError):
        video_frame_sample(pages)
