"""Deterministic, dependency-free 64-bit hashing.

Used for: image pixel seeds, caption derivation, minhash salts, and
host-shard assignment inside Python UDFs. Spark-side row keys use the
JVM ``F.xxhash64`` (fast, columnar); the Python hash here never needs
to agree with it — each side is internally consistent.
"""

from __future__ import annotations

import hashlib

import numpy as np

_MASK64 = (1 << 64) - 1


def stable_hash64(*parts: object) -> int:
    """64-bit stable hash of the string-joined parts (blake2b/8)."""
    data = "\x1f".join(str(p) for p in parts).encode("utf-8")
    return int.from_bytes(hashlib.blake2b(data, digest_size=8).digest(), "big")


def splitmix64(x: int) -> int:
    """SplitMix64 finalizer — cheap avalanche for derived seeds."""
    x = (x + 0x9E3779B97F4A7C15) & _MASK64
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _MASK64
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & _MASK64
    return (x ^ (x >> 31)) & _MASK64


def rng_for(*parts: object) -> np.random.Generator:
    """Seeded numpy generator — identical stream everywhere for a key."""
    return np.random.Generator(np.random.PCG64(stable_hash64(*parts)))
