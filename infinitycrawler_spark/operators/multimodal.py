"""Multimodal column operators — image/audio/video as opaque binary
columns with typed metadata, processed in Arrow-vectorized passes.

Raw containers decode for real without any media library: synthetic
images (functions/images.py), PCM s16 audio and raw-RGB-frame video
(functions/media.py), plus three REAL on-disk formats the stdlib+numpy
can handle — uncompressed 24-bit BMP, baseline PNG (zlib inflate + the
five scanline filters), and RIFF/WAVE PCM s16 — so the codec seam is
exercised end-to-end on genuine file layouts. Formats that need
external codecs (JPEG, WEBP, MP3, MP4) dispatch to PIL when it is
importable and surface as typed error rows otherwise; deployment
installs PIL/ffmpeg and keeps identical schemas, batch shapes, and
feature definitions.

At 100 TB: these are narrow ``mapInPandas`` passes — no shuffle — so
throughput scales with executors; `spark.sql.files.maxPartitionBytes`
bounds batch memory (binary payloads make rows heavy: size partitions
by bytes, not rows).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from infinitycrawler_spark.functions.images import decode_image, encode_image, phash64

IMAGE_FEATURES = StructType([
    StructField("image_id", StringType(), False),
    StructField("ok", StringType(), False),          # ok | error:<reason>
    StructField("w", IntegerType(), True),
    StructField("h", IntegerType(), True),
    StructField("fmt", StringType(), True),
    StructField("mean_rgb", ArrayType(DoubleType()), True),
    StructField("phash", LongType(), True),
    StructField("embedding", ArrayType(FloatType()), True),
])

RESIZED = StructType([
    StructField("image_id", StringType(), False),
    StructField("bytes", BinaryType(), True),
    StructField("w", IntegerType(), True),
    StructField("h", IntegerType(), True),
])


def _decode(data: bytes, fmt: str | None) -> np.ndarray:
    """Dispatch by format. Synthetic formats and uncompressed BMP
    decode for real (stdlib+numpy); library formats dispatch to PIL
    when it's importable and surface as typed errors otherwise."""
    if fmt in (None, "rgb8-raw", "rgb8-q"):
        pixels, _ = decode_image(data)
        return pixels
    if fmt == "bmp":
        from infinitycrawler_spark.functions.images import decode_bmp

        return decode_bmp(data)
    if fmt == "png":
        # baseline PNG decodes for real (stdlib zlib + numpy); Adam7
        # interlace raises NotImplementedError → typed unsupported row
        from infinitycrawler_spark.functions.images import decode_png

        return decode_png(data)
    if fmt in ("jpeg", "webp"):
        try:
            from PIL import Image  # noqa: PLC0415 — optional dependency
        except ImportError:
            raise NotImplementedError(
                f"{fmt} decode requires PIL/libvips (not in this "
                "container); the dispatch below activates when PIL is "
                "installed") from None
        import io

        return np.asarray(Image.open(io.BytesIO(bytes(data))).convert("RGB"))
    raise ValueError(f"unknown image fmt: {fmt}")


def image_features(df: DataFrame, id_col: str = "image_id",
                   bytes_col: str = "bytes", fmt_col: str = "fmt",
                   embedding_dim: int = 16) -> DataFrame:
    """Decode + feature-extract per image: dimensions, channel means,
    phash, and a deterministic pooled 'embedding' (grid of block means —
    the stand-in for a CNN encoder; same batch shape and output schema)."""
    cols = df.select(id_col, bytes_col, fmt_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for image_id, data, fmt in zip(pdf[id_col], pdf[bytes_col], pdf[fmt_col]):
                try:
                    px = _decode(bytes(data), fmt)
                except NotImplementedError:
                    out.append({"image_id": image_id, "ok": f"error:unsupported:{fmt}",
                                "w": None, "h": None, "fmt": fmt, "mean_rgb": None,
                                "phash": None, "embedding": None})
                    continue
                except Exception:  # noqa: BLE001 — corrupt payloads are data
                    out.append({"image_id": image_id, "ok": "error:corrupt",
                                "w": None, "h": None, "fmt": fmt, "mean_rgb": None,
                                "phash": None, "embedding": None})
                    continue
                h, w = px.shape[:2]
                gray = px.astype(np.float64).mean(axis=2)
                side = int(np.sqrt(embedding_dim))
                ys = np.linspace(0, h, side + 1).astype(int)
                xs = np.linspace(0, w, side + 1).astype(int)
                emb = [float(gray[ys[i]:max(ys[i + 1], ys[i] + 1),
                                   xs[j]:max(xs[j + 1], xs[j] + 1)].mean()) / 255.0
                       for i in range(side) for j in range(side)]
                out.append({
                    "image_id": image_id, "ok": "ok", "w": w, "h": h, "fmt": fmt,
                    "mean_rgb": [float(px[..., c].mean()) for c in range(3)],
                    "phash": phash64(px),
                    "embedding": np.asarray(emb, dtype=np.float32),
                })
            pdf_out = pd.DataFrame(out)
            if len(pdf_out):
                # a batch mixing error rows (phash=None) with ok rows
                # must NOT let pandas infer float64 for phash — 63-bit
                # hashes round to multiples of 1024 under float64.
                # object dtype keeps exact Python ints through Arrow.
                pdf_out["phash"] = pd.Series(
                    [r["phash"] for r in out], dtype="object")
            yield pdf_out

    return cols.mapInPandas(run, schema=IMAGE_FEATURES)


def image_resize(df: DataFrame, target_w: int, target_h: int,
                 id_col: str = "image_id", bytes_col: str = "bytes",
                 fmt_col: str = "fmt") -> DataFrame:
    """Nearest-neighbor resize (numpy) re-encoded in the synthetic
    lossless format; library formats raise at the decode stub."""
    cols = df.select(id_col, bytes_col, fmt_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for image_id, data, fmt in zip(pdf[id_col], pdf[bytes_col], pdf[fmt_col]):
                try:
                    px = _decode(bytes(data), fmt)
                except Exception:  # noqa: BLE001
                    out.append({"image_id": image_id, "bytes": None,
                                "w": None, "h": None})
                    continue
                h, w = px.shape[:2]
                yi = (np.arange(target_h) * h // target_h)
                xi = (np.arange(target_w) * w // target_w)
                resized = px[yi][:, xi]
                out.append({"image_id": image_id,
                            "bytes": encode_image(resized, "rgb8-raw"),
                            "w": target_w, "h": target_h})
            yield pd.DataFrame(out)

    return cols.mapInPandas(run, schema=RESIZED)


AUDIO_FEATURES = StructType([
    StructField("audio_id", StringType(), False),
    StructField("ok", StringType(), False),          # ok | error:<reason>
    StructField("sample_rate", IntegerType(), True),
    StructField("channels", IntegerType(), True),
    StructField("duration_s", DoubleType(), True),
    StructField("rms", DoubleType(), True),          # full-scale = 1.0
    StructField("zero_crossing_rate", DoubleType(), True),
    StructField("peak", DoubleType(), True),
])

VIDEO_FRAMES = StructType([
    StructField("video_id", StringType(), False),
    StructField("ok", StringType(), False),
    StructField("frame_idx", IntegerType(), True),
    StructField("ts_s", DoubleType(), True),
    StructField("bytes", BinaryType(), True),        # rgb8-raw image
    StructField("w", IntegerType(), True),
    StructField("h", IntegerType(), True),
])


def audio_features(df: DataFrame, id_col: str = "audio_id",
                   bytes_col: str = "bytes",
                   fmt_col: str = "fmt") -> DataFrame:
    """Decode + feature-extract per clip: duration, RMS loudness,
    zero-crossing rate, peak — over the raw ``pcm16`` container and
    RIFF/WAVE PCM s16 (``wav`` — a real on-disk format, stdlib-decoded;
    functions/media.py). Compressed formats (mp3/aac/flac) yield
    ``error:unsupported`` rows here; in deployment the decode dispatch
    swaps to ffmpeg/librosa with identical schema and batch shape.
    Narrow mapInPandas — no shuffle."""
    from infinitycrawler_spark.functions.media import decode_audio, decode_wav

    cols = df.select(id_col, bytes_col, fmt_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for audio_id, data, fmt in zip(pdf[id_col], pdf[bytes_col],
                                           pdf[fmt_col]):
                err = None
                if fmt not in (None, "pcm16", "wav"):
                    err = f"error:unsupported:{fmt}"
                else:
                    dec = decode_wav if fmt == "wav" else decode_audio
                    try:
                        samples, sr, ch = dec(bytes(data))
                    except Exception:  # noqa: BLE001 — corrupt is data
                        err = "error:corrupt"
                if err is not None:
                    out.append({"audio_id": audio_id, "ok": err,
                                "sample_rate": None, "channels": None,
                                "duration_s": None, "rms": None,
                                "zero_crossing_rate": None, "peak": None})
                    continue
                x = samples.astype(np.float64) / 32768.0
                n_frames = len(samples) // ch
                mono = (x.reshape(-1, ch).mean(axis=1)
                        if ch > 1 else x)
                zc = (float(np.count_nonzero(
                    np.signbit(mono[1:]) != np.signbit(mono[:-1])))
                    / max(len(mono) - 1, 1))
                out.append({
                    "audio_id": audio_id, "ok": "ok",
                    "sample_rate": sr, "channels": ch,
                    "duration_s": n_frames / sr,
                    "rms": float(np.sqrt(np.mean(x * x))) if len(x) else 0.0,
                    "zero_crossing_rate": zc,
                    "peak": float(np.max(np.abs(x))) if len(x) else 0.0,
                })
            yield pd.DataFrame(out)

    return cols.mapInPandas(run, schema=AUDIO_FEATURES)


def video_frame_sample(df: DataFrame, every_n_seconds: float = 1.0,
                       id_col: str = "video_id", bytes_col: str = "bytes",
                       fmt_col: str = "fmt") -> DataFrame:
    """One output row per sampled frame (every ``every_n_seconds`` of
    clip time, always including frame 0), frames re-encoded in the
    synthetic lossless image format so image_features/image_resize
    compose downstream. Real over the raw ``rawv`` container
    (functions/media.py); mp4/h264 yield ``error:unsupported`` rows
    (ffmpeg absent here — deployment swaps the decode dispatch).
    Narrow mapInPandas; size partitions by bytes, not rows — video
    payloads are the heaviest column in the table."""
    from infinitycrawler_spark.functions.media import (
        decode_video_frame,
        decode_video_header,
    )

    cols = df.select(id_col, bytes_col, fmt_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for video_id, data, fmt in zip(pdf[id_col], pdf[bytes_col],
                                           pdf[fmt_col]):
                if fmt not in (None, "rawv"):
                    out.append({"video_id": video_id,
                                "ok": f"error:unsupported:{fmt}",
                                "frame_idx": None, "ts_s": None,
                                "bytes": None, "w": None, "h": None})
                    continue
                try:
                    raw = bytes(data)
                    w, h, fps, n = decode_video_header(raw)
                except Exception:  # noqa: BLE001
                    out.append({"video_id": video_id, "ok": "error:corrupt",
                                "frame_idx": None, "ts_s": None,
                                "bytes": None, "w": None, "h": None})
                    continue
                step = max(int(round(every_n_seconds * fps)), 1)
                for idx in range(0, n, step):
                    frame = decode_video_frame(raw, idx)
                    out.append({
                        "video_id": video_id, "ok": "ok",
                        "frame_idx": idx, "ts_s": idx / fps,
                        "bytes": encode_image(frame, "rgb8-raw"),
                        "w": w, "h": h,
                    })
            yield pd.DataFrame(out)

    return cols.mapInPandas(run, schema=VIDEO_FRAMES)
