"""Attach real (deterministic) image payloads to a pages table, in
parallel on executors — used by benches so payload validation
(decode + PSNR + phash + caption) exercises true per-row compute."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from infinitycrawler_spark.functions.images import (
    _expected_art,
    encode_image,
    expected_caption,
)


def with_real_payload(pages: DataFrame, w: int = 32, h: int = 24,
                      fmt: str = "rgb8-q", partitions: int | None = None) -> DataFrame:
    """Replace the payload columns with real encodings derived from
    image_id (regenerable on any worker, per FIXTURES.md §1)."""
    schema = pages.schema
    # source tables are few parquet files → repartition or the pandas
    # generation runs at 2-way parallelism (measured)
    if partitions is None:
        partitions = int(pages.sparkSession.conf.get(
            "spark.sql.shuffle.partitions", "32")) * 2
    pages = pages.repartition(partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            bytes_col, captions, phashes = [], [], []
            for image_id, host, url in zip(pdf["image_id"], pdf["host"], pdf["url"]):
                px, ph = _expected_art(image_id, w, h)  # memoized
                bytes_col.append(encode_image(px, fmt))
                path = url.split(host, 1)[1] if host in url else url
                captions.append(expected_caption(image_id, host, path))
                phashes.append(ph)
            pdf = pdf.copy()
            pdf["bytes"] = bytes_col
            pdf["w"] = pd.Series([w] * n, index=pdf.index, dtype="int32")
            pdf["h"] = pd.Series([h] * n, index=pdf.index, dtype="int32")
            pdf["fmt"] = fmt
            pdf["caption"] = captions
            pdf["phash"] = pd.Series(phashes, index=pdf.index, dtype="int64")
            yield pdf

    return pages.mapInPandas(gen, schema=schema)
