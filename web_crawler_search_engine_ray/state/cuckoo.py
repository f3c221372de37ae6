"""Cuckoo filter — compact approximate membership (Fan et al., CoNEXT'14).

Fast path for the URL-seen set (reference ``discovered_urls`` dict,
web_crawler/crawler/frontier.py:21): ~2 bytes/key at billions of keys where
an exact hash set would not fit. A filter "maybe" is always verified against
the shard's exact ledger (SURVEY.md §7.6 hazard 6 — seen-set EQUALITY needs
a 0 false-positive rate); a filter "no" is authoritative, which is the
common case on a growing frontier and skips the ledger probe.

Pure numpy: bucketed uint16 fingerprint table, 4 slots/bucket, standard
partial-key cuckoo eviction.
"""

from __future__ import annotations

import numpy as np

_EMPTY = np.uint16(0)
_MAX_KICKS = 500


class CuckooFilter:
    def __init__(self, capacity: int, seed: int = 0x5EED):
        # 4 slots per bucket, sized to ~84% max load
        n_buckets = max(8, int(capacity / 4 / 0.84))
        # power of two buckets for cheap masking
        self.n_buckets = 1 << int(np.ceil(np.log2(n_buckets)))
        self.table = np.zeros((self.n_buckets, 4), dtype=np.uint16)
        self.mask = np.uint64(self.n_buckets - 1)
        self.count = 0
        self._rng = np.random.RandomState(seed)
        # victim stash: (bucket_idx, fp) pairs homeless after MAX_KICKS.
        # The homeless item is the FINAL displaced fingerprint (usually some
        # OTHER key's), so the stash must be keyed by (idx, fp) — stashing
        # the original key would silently drop the victim's membership (a
        # false negative, which the seen-set contract forbids).
        self.overflow: set[tuple[int, int]] = set()

    @staticmethod
    def _fingerprint(h: np.ndarray) -> np.ndarray:
        fp = (h >> np.uint64(48)).astype(np.uint16)
        fp[fp == 0] = 1  # 0 means empty slot
        return fp

    def _index1(self, h: np.ndarray) -> np.ndarray:
        return (h & self.mask).astype(np.int64)

    def _index2(self, i1: np.ndarray, fp: np.ndarray) -> np.ndarray:
        # alt bucket = i1 xor hash(fp); odd multiplier mix keeps it in range
        mix = (fp.astype(np.uint64) * np.uint64(0x5BD1E995)) & self.mask
        return (i1.astype(np.uint64) ^ mix).astype(np.int64)

    def contains_batch(self, hashes: np.ndarray) -> np.ndarray:
        """Vectorized membership probe for uint64 key hashes."""
        h = hashes.astype(np.uint64)
        fp = self._fingerprint(h)
        i1 = self._index1(h)
        i2 = self._index2(i1, fp)
        found = (self.table[i1] == fp[:, None]).any(axis=1) | (
            self.table[i2] == fp[:, None]
        ).any(axis=1)
        if self.overflow:
            for k in np.nonzero(~found)[0]:
                if (int(i1[k]), int(fp[k])) in self.overflow or (
                    int(i2[k]), int(fp[k])
                ) in self.overflow:
                    found[k] = True
        return found

    def _insert_one(self, h: int) -> None:
        h = np.uint64(h)
        fp = np.uint16(max(1, int(h) >> 48))
        i = int(h & self.mask)
        for idx in (i, int((np.uint64(i) ^ ((np.uint64(fp) * np.uint64(0x5BD1E995)) & self.mask)))):
            row = self.table[idx]
            empty = np.nonzero(row == _EMPTY)[0]
            if len(empty):
                row[empty[0]] = fp
                self.count += 1
                return
        # evict
        idx = i
        for _ in range(_MAX_KICKS):
            slot = self._rng.randint(0, 4)
            fp, self.table[idx, slot] = self.table[idx, slot], fp
            idx = int(
                (np.uint64(idx) ^ ((np.uint64(fp) * np.uint64(0x5BD1E995)) & self.mask))
            )
            row = self.table[idx]
            empty = np.nonzero(row == _EMPTY)[0]
            if len(empty):
                row[empty[0]] = fp
                self.count += 1
                return
        # the homeless item is the final displaced fingerprint; stash it
        # under BOTH its candidate buckets so lookups from either side hit
        alt = int(
            np.uint64(idx) ^ ((np.uint64(fp) * np.uint64(0x5BD1E995)) & self.mask)
        )
        self.overflow.add((idx, int(fp)))
        self.overflow.add((alt, int(fp)))
        self.count += 1

    def add_batch(self, hashes: np.ndarray) -> None:
        for h in hashes:
            self._insert_one(int(h))

    def state(self) -> dict:
        ov = (
            np.array(sorted(self.overflow), dtype=np.int64)
            if self.overflow
            else np.empty((0, 2), dtype=np.int64)
        )
        return {"table": self.table, "count": self.count, "overflow": ov}

    @classmethod
    def from_state(cls, state: dict) -> "CuckooFilter":
        obj = cls.__new__(cls)
        obj.table = state["table"]
        obj.n_buckets = obj.table.shape[0]
        obj.mask = np.uint64(obj.n_buckets - 1)
        obj.count = int(state["count"])
        obj._rng = np.random.RandomState(0x5EED)
        obj.overflow = set((int(a), int(b)) for a, b in state["overflow"])
        return obj
