"""Serializable Bloom filter for the URL-seen pre-filter.

SURVEY.md §4: Spark's runtime Bloom filters don't persist across jobs,
so the engine maintains its own per-host-bucket filters inside the
``seen`` snapshot. Candidates the filter rejects are *definitely new*
and skip the exact anti-join; only filter-positive candidates (a small
fraction at a 10^10-URL frontier) pay the join. Exactness always comes
from the anti-join — the Bloom is pure pruning, so false positives
cost only work, never correctness.

numpy bit array + double hashing (Kirsch–Mitzenmacher) over xxhash-style
64-bit keys; serializes to bytes for snapshot storage / broadcast.
"""

from __future__ import annotations

import math
import struct

import numpy as np

_MAGIC = b"BLM1"


class BloomFilter:
    def __init__(self, capacity: int, fp_rate: float = 0.01,
                 bits: np.ndarray | None = None, k: int | None = None):
        if bits is not None:
            self.bits = bits
            self.k = k or 7
            self.m = int(bits.size) * 8
        else:
            m = max(64, int(-capacity * math.log(fp_rate) / (math.log(2) ** 2)))
            m = (m + 7) // 8 * 8
            self.m = m
            self.k = max(1, int(round(m / max(capacity, 1) * math.log(2))))
            self.bits = np.zeros(m // 8, dtype=np.uint8)

    # --- double hashing: h_i = h1 + i*h2 (Kirsch–Mitzenmacher) ---
    def _positions(self, keys: np.ndarray) -> np.ndarray:
        k1 = keys.astype(np.uint64)
        h1 = k1 * np.uint64(0x9E3779B97F4A7C15)
        h2 = (k1 ^ (k1 >> np.uint64(33))) * np.uint64(0xC2B2AE3D27D4EB4F) | np.uint64(1)
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        return ((h1[None, :] + i * h2[None, :]) % np.uint64(self.m)).astype(np.int64)

    def add_many(self, keys: np.ndarray) -> None:
        if len(keys) == 0:
            return
        pos = self._positions(np.asarray(keys)).ravel()
        np.bitwise_or.at(self.bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))

    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        """→ bool array; False = definitely not present."""
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(np.asarray(keys))
        got = (self.bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        return got.all(axis=0)

    # ------------------------------------------------------ serialization
    def to_bytes(self) -> bytes:
        return _MAGIC + struct.pack("<II", self.k, self.bits.size) + self.bits.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "BloomFilter":
        if data[:4] != _MAGIC:
            raise ValueError("not a bloom filter blob")
        k, nbytes = struct.unpack("<II", data[4:12])
        bits = np.frombuffer(data[12:12 + nbytes], dtype=np.uint8).copy()
        return cls(capacity=0, bits=bits, k=k)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        if self.m != other.m or self.k != other.k:
            raise ValueError("bloom parameter mismatch")
        return BloomFilter(0, bits=self.bits | other.bits, k=self.k)
