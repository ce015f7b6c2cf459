"""Distributed per-bucket Bloom store for the URL-seen pre-filter.

SURVEY.md §4 names the 10^10-scale design: the seen-set Bloom filter is
maintained as per-bucket blobs INSIDE the snapshot state, not as one
driver-side filter. This module implements it:

- keys are bucketed by ``url_key % n_buckets`` (url_key = xxhash64(url),
  matching Spark's ``pmod``); each bucket owns one fixed-capacity
  :class:`~infinitycrawler_spark.state.bloom.BloomFilter` blob on the
  store filesystem (local dir here; HDFS/S3-fuse in production — any
  executor-visible path works);
- per round, the round's new seen keys are folded in DISTRIBUTED: one
  ``applyInPandas`` over ``groupBy(bucket)`` does an atomic
  read-OR-write per bucket (idempotent under task retry — re-adding
  keys is a no-op for a Bloom OR). The driver never sees a key;
- the membership check is a vectorized pandas UDF that loads bucket
  blobs lazily with a per-worker mtime cache, so candidate batches stay
  narrow (no join against the blob table, which would copy megabyte
  blobs onto every candidate row).

Correctness contract: the store must be a SUPERSET of the seen table at
check time (a missing key would let a duplicate skip the exact
anti-join). Extra keys are harmless — false positives just pay the
anti-join. Hence: updates happen at round end before the next round's
admission, and resume REBUILDS the blobs from the committed seen table.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

from infinitycrawler_spark.state.bloom import BloomFilter

#: per-worker blob cache: path -> (mtime_ns, BloomFilter)
_BLOB_CACHE: dict[str, tuple[int, BloomFilter]] = {}


def _blob_path(root: str, bucket: int) -> str:
    return os.path.join(root, f"bucket_{bucket:05d}.blm")


def _load_blob(path: str) -> BloomFilter | None:
    try:
        st = os.stat(path)
    except FileNotFoundError:
        return None
    cached = _BLOB_CACHE.get(path)
    if cached is not None and cached[0] == st.st_mtime_ns:
        return cached[1]
    with open(path, "rb") as f:
        bloom = BloomFilter.from_bytes(f.read())
    _BLOB_CACHE[path] = (st.st_mtime_ns, bloom)
    return bloom


class BloomShardStore:
    """Per-bucket Bloom blobs under ``<root>/bloom/``."""

    def __init__(self, root: str, n_buckets: int = 32,
                 capacity_per_bucket: int = 2_000_000,
                 fp_rate: float = 0.01):
        self.dir = os.path.join(root, "bloom")
        self.n_buckets = n_buckets
        self.capacity = capacity_per_bucket
        self.fp_rate = fp_rate
        os.makedirs(self.dir, exist_ok=True)

    # ------------------------------------------------------------ write
    def update(self, seen_add: DataFrame) -> int:
        """Fold new seen keys into the bucket blobs, distributed.
        ``seen_add`` needs a ``url_key`` column. ONE Spark action;
        returns the number of keys folded in."""
        root, cap, fp = self.dir, self.capacity, self.fp_rate

        def fold(pdf: pd.DataFrame) -> pd.DataFrame:
            bucket = int(pdf["_bucket"].iloc[0])
            path = _blob_path(root, bucket)
            bloom = _load_blob(path) or BloomFilter(cap, fp)
            bloom = BloomFilter(0, bits=bloom.bits.copy(), k=bloom.k)
            bloom.add_many(pdf["url_key"].to_numpy(dtype="int64"))
            tmp = f"{path}.tmp.{os.getpid()}"
            with open(tmp, "wb") as f:
                f.write(bloom.to_bytes())
            os.replace(tmp, path)  # atomic on POSIX
            return pd.DataFrame([{"bucket": bucket, "n": len(pdf)}])

        stats = (seen_add
                 .select(F.col("url_key"),
                         F.pmod("url_key", F.lit(self.n_buckets))
                         .cast("int").alias("_bucket"))
                 .groupBy("_bucket")
                 .applyInPandas(fold, schema="bucket int, n long")
                 .collect())
        return int(sum(r.n for r in stats))

    def rebuild(self, seen: DataFrame) -> int:
        """Resume path: recreate every blob from the committed seen
        table (blobs may lag or lead the snapshot; leading is safe but
        rebuilding gives the exact superset-of-seen invariant)."""
        for name in os.listdir(self.dir):
            if name.endswith(".blm"):
                os.unlink(os.path.join(self.dir, name))
        return self.update(seen)

    # ------------------------------------------------------------- read
    def maybe_seen_udf(self):
        """Vectorized membership test over url_key. False = definitely
        new (skips the exact anti-join); True = maybe seen (pays it)."""
        root, n_buckets = self.dir, self.n_buckets

        @F.pandas_udf(BooleanType())
        def maybe_seen(keys: pd.Series) -> pd.Series:
            arr = keys.to_numpy(dtype="int64")
            out = np.zeros(len(arr), dtype=bool)
            # int64 % positive == Spark pmod for our bucket counts
            buckets = arr % np.int64(n_buckets)
            for b in np.unique(buckets):
                bloom = _load_blob(_blob_path(root, int(b)))
                if bloom is None:
                    continue  # empty bucket: definitely new
                mask = buckets == b
                out[mask] = bloom.contains_many(arr[mask])
            return pd.Series(out, index=keys.index)

        return maybe_seen
