"""Vectorized numpy Bloom filter.

Used as the cheap, lossy pre-filter inside fetch actors (north rule: "bloom
pre-filter") so obviously-seen URLs never reach the authoritative seen
shards. False positives only suppress duplicate *probes* — the authoritative
cuckoo/exact shard is still consulted for anything the bloom passes, so
correctness never depends on the bloom.

Hashing: double hashing h1 + i*h2 over the already-computed 64-bit URL
hashes (no per-item md5 here — inputs are uint64 keys).
"""

from __future__ import annotations

import numpy as np


class BloomFilter:
    def __init__(self, capacity: int, fp_rate: float = 0.01):
        capacity = max(64, int(capacity))
        # optimal bits/item = -ln(p)/ln(2)^2 ; k = (m/n) ln 2
        bits = int(-capacity * np.log(fp_rate) / (np.log(2) ** 2))
        self.m = max(512, 1 << int(np.ceil(np.log2(bits))))  # power of two
        self.k = max(1, int(round((self.m / capacity) * np.log(2))))
        self.bits = np.zeros(self.m // 64, dtype=np.uint64)
        self.n_items = 0

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        """(k, n) bit positions via double hashing of uint64 keys."""
        keys = keys.astype(np.uint64, copy=False)
        h1 = keys
        h2 = (keys >> np.uint64(17)) | np.uint64(1)  # odd → full cycle on 2^m
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        return (h1[None, :] + i * h2[None, :]) & np.uint64(self.m - 1)

    def add_many(self, keys: np.ndarray) -> None:
        if len(keys) == 0:
            return
        pos = self._positions(np.asarray(keys)).ravel()
        np.bitwise_or.at(
            self.bits, (pos >> np.uint64(6)).astype(np.int64),
            np.uint64(1) << (pos & np.uint64(63)),
        )
        self.n_items += len(keys)

    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        """Boolean array: possibly-seen (True) / definitely-unseen (False)."""
        keys = np.asarray(keys)
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(keys)
        words = self.bits[(pos >> np.uint64(6)).astype(np.int64)]
        hit = (words >> (pos & np.uint64(63))) & np.uint64(1)
        return hit.all(axis=0)

    def to_bytes(self) -> bytes:
        header = np.array([self.m, self.k, self.n_items], dtype=np.uint64)
        return header.tobytes() + self.bits.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "BloomFilter":
        header = np.frombuffer(data[:24], dtype=np.uint64)
        obj = cls.__new__(cls)
        obj.m, obj.k, obj.n_items = int(header[0]), int(header[1]), int(header[2])
        obj.bits = np.frombuffer(data[24:], dtype=np.uint64).copy()
        return obj
