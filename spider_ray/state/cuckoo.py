"""Numpy-backed cuckoo filter (Fan et al., "Cuckoo Filter: Practically
Better Than Bloom", CoNEXT 2014 — public paper).

The authoritative membership structure for each URL-seen shard: 4-slot
buckets of 16-bit fingerprints, partial-key cuckoo hashing with bounded
eviction. FP rate ≈ 2 * 4 / 2^16 ≈ 0.012%; supports delete (unlike bloom)
and serializes compactly for epoch checkpoints.

Inputs are pre-hashed uint64 URL keys (md5-derived, see functions.urls) —
the upper bits pick the bucket, a derived 16-bit nonzero fingerprint is
stored.
"""

from __future__ import annotations

import numpy as np

_MAX_KICKS = 500


class CuckooFilter:
    def __init__(self, capacity: int):
        capacity = max(1024, int(capacity))
        n_buckets = 1 << int(np.ceil(np.log2(capacity / 4 / 0.95)))
        self.n_buckets = n_buckets
        self.table = np.zeros((n_buckets, 4), dtype=np.uint16)  # 0 = empty
        self.n_items = 0
        self._rng_state = np.uint64(0x9E3779B97F4A7C15)

    # -- key → (fingerprint, bucket1) ; bucket2 = b1 ^ hash(fp) ------------
    def _fp_and_bucket(self, keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        keys = keys.astype(np.uint64, copy=False)
        fp = (keys & np.uint64(0xFFFF)).astype(np.uint16)
        fp = np.where(fp == 0, np.uint16(1), fp)  # fingerprints are nonzero
        b1 = (keys >> np.uint64(16)) & np.uint64(self.n_buckets - 1)
        return fp, b1.astype(np.int64)

    def _alt_bucket(self, bucket: np.ndarray, fp: np.ndarray) -> np.ndarray:
        # partial-key hashing: alt = b ^ H(fp) (multiply-shift hash of fp)
        h = (fp.astype(np.uint64) * np.uint64(0x5BD1E995)) & np.uint64(
            self.n_buckets - 1
        )
        return (bucket.astype(np.uint64) ^ h).astype(np.int64)

    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        keys = np.asarray(keys)
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        fp, b1 = self._fp_and_bucket(keys)
        b2 = self._alt_bucket(b1, fp)
        t = self.table
        hit1 = (t[b1] == fp[:, None]).any(axis=1)
        hit2 = (t[b2] == fp[:, None]).any(axis=1)
        return hit1 | hit2

    def _insert_one(self, fp: int, b1: int, b2: int) -> bool:
        for b in (b1, b2):
            row = self.table[b]
            empty = np.nonzero(row == 0)[0]
            if empty.size:
                row[empty[0]] = fp
                return True
        # evict loop
        b = b1
        cur = np.uint16(fp)
        for _ in range(_MAX_KICKS):
            # deterministic slot choice (xorshift on internal state)
            self._rng_state ^= self._rng_state << np.uint64(13)
            self._rng_state ^= self._rng_state >> np.uint64(7)
            self._rng_state ^= self._rng_state << np.uint64(17)
            slot = int(self._rng_state & np.uint64(3))
            cur, self.table[b, slot] = self.table[b, slot], cur
            b = int(self._alt_bucket(np.array([b]), np.array([cur]))[0])
            row = self.table[b]
            empty = np.nonzero(row == 0)[0]
            if empty.size:
                row[empty[0]] = cur
                return True
        return False  # filter over-full

    def add_many(self, keys: np.ndarray) -> int:
        """Insert keys; returns number successfully inserted.

        Bulk fast path: vectorized placement over (bucket1, bucket2) × 4
        slots — at the sized load factor almost every key lands without
        eviction; only the residue walks the per-key eviction loop.
        """
        keys = np.asarray(keys)
        if len(keys) == 0:
            return 0
        fp, b1 = self._fp_and_bucket(keys)
        b2 = self._alt_bucket(b1, fp)
        n = len(keys)
        pending = np.ones(n, dtype=bool)
        for buckets in (b1, b2):
            for slot in range(4):
                if not pending.any():
                    break
                idx = np.nonzero(pending)[0]
                b_sel = buckets[idx]
                empty = self.table[b_sel, slot] == 0
                idx = idx[empty]
                if idx.size == 0:
                    continue
                # same bucket twice in one pass → keep first occurrence only
                _, first = np.unique(buckets[idx], return_index=True)
                chosen = idx[np.sort(first)]
                self.table[buckets[chosen], slot] = fp[chosen]
                pending[chosen] = False
        ok = int(n - pending.sum())
        for i in np.nonzero(pending)[0]:  # rare eviction path
            if self._insert_one(int(fp[i]), int(b1[i]), int(b2[i])):
                ok += 1
        self.n_items += ok
        return ok

    def to_bytes(self) -> bytes:
        header = np.array(
            [self.n_buckets, self.n_items, int(self._rng_state)], dtype=np.uint64
        )
        return header.tobytes() + self.table.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "CuckooFilter":
        header = np.frombuffer(data[:24], dtype=np.uint64)
        obj = cls.__new__(cls)
        obj.n_buckets = int(header[0])
        obj.n_items = int(header[1])
        obj._rng_state = np.uint64(header[2])
        obj.table = (
            np.frombuffer(data[24:], dtype=np.uint16)
            .reshape(obj.n_buckets, 4)
            .copy()
        )
        return obj
