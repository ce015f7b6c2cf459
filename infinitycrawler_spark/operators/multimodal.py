"""Multimodal column operators — image/audio/video as opaque binary
columns with typed metadata, processed in Arrow-vectorized passes.

The Spark-side plumbing (schemas, batch shapes, partition sizing) is
real and tested; decoders for formats needing external libraries (JPEG,
MP3, MP4 — none are installed in this container) are stubbed behind
``NotImplementedError`` with the deterministic synthetic codec
(functions/images.py) as the working reference implementation.

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
    """Dispatch by format. Synthetic formats decode for real; library
    formats are stubbed (no image libs in this container)."""
    if fmt in (None, "rgb8-raw", "rgb8-q"):
        pixels, _ = decode_image(data)
        return pixels
    if fmt in ("jpeg", "png", "webp"):
        raise NotImplementedError(
            f"{fmt} decode requires PIL/libvips (not in this container); "
            "swap _decode for PIL.Image.open in deployment")
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
            yield pd.DataFrame(out)

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


def audio_features(df: DataFrame, **_kw) -> DataFrame:
    """STUB — audio decode needs ffmpeg/librosa (absent here). The
    deployment implementation mirrors image_features: mapInPandas over
    (audio_id, bytes, fmt) → (duration_s, sample_rate, loudness, mfcc)."""
    raise NotImplementedError(
        "audio decode requires ffmpeg/librosa; not available in this container")


def video_frame_sample(df: DataFrame, every_n_seconds: float = 1.0, **_kw) -> DataFrame:
    """STUB — video demux needs ffmpeg (absent here). Deployment shape:
    mapInPandas emitting one row per sampled frame (video_id, ts_s,
    frame_bytes), partitioned by bytes to bound executor memory."""
    raise NotImplementedError(
        "video demux requires ffmpeg; not available in this container")
