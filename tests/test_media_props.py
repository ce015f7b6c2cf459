"""Property tests: the raw media containers (functions/media.py)
round-trip bit-exactly and reject malformed payloads."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from infinitycrawler_spark.functions.media import (
    decode_audio,
    decode_video_frame,
    decode_video_header,
    encode_audio,
    encode_video,
    make_audio,
    make_video,
)


@settings(max_examples=50, deadline=None)
@given(
    n=st.integers(min_value=0, max_value=2000),
    sr=st.integers(min_value=1, max_value=192_000),
    ch=st.integers(min_value=1, max_value=8),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_audio_roundtrip(n, sr, ch, seed):
    rng = np.random.default_rng(seed)
    samples = rng.integers(-32768, 32768, size=n * ch, dtype=np.int16)
    data = encode_audio(samples, sr, ch)
    out, sr2, ch2 = decode_audio(data)
    assert sr2 == sr and ch2 == ch
    assert np.array_equal(out, samples)


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=6),
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=24),
    fps_milli=st.integers(min_value=1, max_value=120_000),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_video_roundtrip(n, w, h, fps_milli, seed):
    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 256, size=(n, h, w, 3), dtype=np.uint8)
    fps = fps_milli / 1000.0
    data = encode_video(frames, fps)
    w2, h2, fps2, n2 = decode_video_header(data)
    assert (w2, h2, n2) == (w, h, n)
    assert abs(fps2 - round(fps * 1000) / 1000.0) < 1e-9
    for i in range(n):
        assert np.array_equal(decode_video_frame(data, i), frames[i])


@settings(max_examples=60, deadline=None)
@given(cut=st.integers(min_value=0, max_value=40),
       which=st.sampled_from(["audio", "video"]))
def test_truncation_rejected(cut, which):
    data = (make_audio("t") if which == "audio" else make_video("t"))
    truncated = data[:cut] if cut < len(data) else data[:-1]
    try:
        if which == "audio":
            decode_audio(truncated)
            # only valid if the truncation landed on a whole frame —
            # but the header demands ≥10 bytes and sample alignment
            assert len(truncated) >= 10 and \
                (len(truncated) - 10) % 2 == 0
        else:
            decode_video_header(truncated)
            raise AssertionError("truncated video must not decode")
    except (ValueError, IndexError):
        pass


def test_determinism():
    assert make_audio("x") == make_audio("x")
    assert make_video("x") == make_video("x")
    assert make_audio("x") != make_audio("y")
