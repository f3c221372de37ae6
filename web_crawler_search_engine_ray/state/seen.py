"""Sharded URL-seen set: cuckoo-filter fast path + exact ledger.

Ray-Data-first re-expression of the reference's shared ``discovered_urls``
dict (web_crawler/crawler/frontier.py:21,137-152; lengths merged at
worker.py:113-127). Shard key = 64-bit URL hash % num_shards (independent of
host so a hot host's URLs spread across shards — SURVEY.md §7.4).

Every call is BATCHED: a map_batches task groups its batch by shard and
issues one RPC per shard, so actor traffic scales with batches, not rows.
The cuckoo filter answers the common "never seen" case without touching the
exact dict; "maybe" falls through to the exact ledger so membership is
exact (seen-set equality conformance). At 10^10 keys the per-shard exact
ledger would page to Arrow/Parquet runs consulted only on filter-maybe;
here it is an in-memory dict with the same interface.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa

import ray

from ..functions.urls import hash64_batch
from ..schema import SEEN_SCHEMA
from .cuckoo import CuckooFilter


@ray.remote(num_cpus=0)
class SeenShard:
    """One shard of the URL-seen set / crawl ledger."""

    def __init__(self, shard_id: int, capacity: int = 1 << 16):
        self.shard_id = shard_id
        self.filter = CuckooFilter(capacity)
        # url -> [downloaded, length, wave_registered]
        # insertion order = discovery order
        self.ledger: Dict[str, list] = {}
        # urls touched since the last delta flush (dict = ordered set):
        # the per-wave incremental checkpoint is exactly these entries.
        self.dirty: Dict[str, None] = {}

    def test_and_add(self, urls: List[str], hashes: np.ndarray, wave: int) -> np.ndarray:
        """For each url: True if it was NEW (now registered as discovered).
        Mirrors Frontier.add_url's membership check (frontier.py:139-140).

        Idempotent under Ray task retries: a url registered in THIS wave and
        not yet downloaded answers True again (within-wave dedup upstream
        guarantees at most one caller per (url, wave))."""
        maybe = self.filter.contains_batch(hashes)
        new_mask = np.empty(len(urls), dtype=bool)
        to_add = []
        for i, url in enumerate(urls):
            # filter has no false negatives: a "no" skips the dict probe
            entry = self.ledger.get(url) if maybe[i] else None
            if entry is None:
                new_mask[i] = True
                self.ledger[url] = [False, 0, wave]
                self.dirty[url] = None
                to_add.append(i)
            else:
                new_mask[i] = not entry[0] and entry[2] == wave
        if to_add:
            self.filter.add_batch(hashes[np.asarray(to_add)])
            # auto-grow: past ~84% design load the kick chains degrade into
            # the victim stash; rebuild double-size from the exact ledger
            # (the authoritative key set) before that happens
            if self.filter.count * 5 > self.filter.n_buckets * 4 * 4:
                self.filter = CuckooFilter(2 * self.filter.n_buckets * 4)
                if self.ledger:
                    self.filter.add_batch(hash64_batch(list(self.ledger.keys())))
        return new_mask

    def mark_complete(self, urls: List[str], lengths: Optional[List[int]] = None):
        """mark_url_complete / Worker.sync ledger updates
        (frontier.py:148-152, worker.py:122-126)."""
        if lengths is None:
            lengths = [0] * len(urls)
        unregistered = []
        for url, ln in zip(urls, lengths):
            prev = self.ledger.get(url)
            if prev is None:
                # keep the filter's no-false-negatives invariant: a ledger
                # entry without its fingerprint would let a later
                # test_and_add declare the url NEW and erase the
                # downloaded mark (all in-repo callers complete only
                # registered urls, but the accept-anyway branch must not
                # corrupt state)
                unregistered.append(url)
            self.ledger[url] = [True, int(ln), prev[2] if prev else -1]
            self.dirty[url] = None
        if unregistered:
            self.filter.add_batch(hash64_batch(unregistered))

    def _table_of(self, urls) -> pa.Table:
        return pa.Table.from_arrays(
            [
                pa.array(urls, pa.string()),
                pa.array([self.ledger[u][0] for u in urls], pa.bool_()),
                pa.array([self.ledger[u][1] for u in urls], pa.int64()),
            ],
            schema=SEEN_SCHEMA,
        )

    def snapshot(self) -> pa.Table:
        return self._table_of(list(self.ledger.keys()))

    def flush_delta(self, dir_path: str) -> int:
        """Per-partition incremental checkpoint (north_rule): write ONLY the
        entries touched since the last flush as this shard's delta file in
        the wave's staging dir, then clear the dirty set. The actor writes
        its own file — the driver never sees ledger rows."""
        import pyarrow.parquet as pq

        urls = list(self.dirty.keys())
        tbl = self._table_of(urls)
        pq.write_table(
            tbl, os.path.join(dir_path, f"shard={self.shard_id:04d}.parquet")
        )
        self.dirty.clear()
        return tbl.num_rows

    def restore_deltas(self, paths: List[str]) -> int:
        """Replay this shard's delta chain in wave order (last write wins
        per URL), then rebuild the cuckoo filter from the replayed ledger."""
        import pyarrow.parquet as pq

        self.ledger = {}
        for p in paths:
            for r in pq.read_table(p).to_pylist():
                self.ledger[r["url"]] = [r["downloaded"], r["length"], -1]
        self.dirty = {}
        self.filter = CuckooFilter(max(1 << 16, 2 * len(self.ledger)))
        if self.ledger:
            self.filter.add_batch(hash64_batch(list(self.ledger.keys())))
        return len(self.ledger)

    def write_snapshot(self, dir_path: str) -> int:
        """Final per-shard ledger write (distributed seen_final sink)."""
        import pyarrow.parquet as pq

        tbl = self.snapshot()
        pq.write_table(
            tbl, os.path.join(dir_path, f"shard={self.shard_id:04d}.parquet")
        )
        return tbl.num_rows

    def flush_full(self, dir_path: str) -> int:
        """Compaction flush: write the WHOLE ledger as this wave's shard
        file (replay restarts here — earlier delta chains become
        garbage-collectable) and clear the dirty set."""
        n = self.write_snapshot(dir_path)
        self.dirty.clear()
        return n

    def restore(self, table: pa.Table) -> int:
        self.ledger = {
            r["url"]: [r["downloaded"], r["length"], -1] for r in table.to_pylist()
        }
        self.filter = CuckooFilter(max(1 << 16, 2 * len(self.ledger)))
        if self.ledger:
            self.filter.add_batch(hash64_batch(list(self.ledger.keys())))
        return len(self.ledger)

    def stats(self) -> dict:
        return {
            "shard": self.shard_id,
            "keys": len(self.ledger),
            "filter_count": self.filter.count,
            "overflow": len(self.filter.overflow),
        }


class SeenSet:
    """Driver/worker-side handle over the shard pool."""

    def __init__(self, num_shards: int = 8, capacity_per_shard: int = 1 << 16):
        self.num_shards = num_shards
        self.shards = [
            SeenShard.remote(i, capacity_per_shard) for i in range(num_shards)
        ]

    def _partition(self, urls: List[str]) -> Tuple[np.ndarray, np.ndarray]:
        hashes = hash64_batch(urls)
        return hashes, (hashes % np.uint64(self.num_shards)).astype(np.int64)

    def test_and_add(self, urls: List[str], wave: int) -> np.ndarray:
        """Batched first-discovery test across shards; one RPC per shard."""
        if not urls:
            return np.empty(0, dtype=bool)
        hashes, shard_ids = self._partition(urls)
        mask = np.empty(len(urls), dtype=bool)
        futures = {}
        for s in range(self.num_shards):
            idx = np.nonzero(shard_ids == s)[0]
            if len(idx):
                futures[s] = (
                    idx,
                    self.shards[s].test_and_add.remote(
                        [urls[i] for i in idx], hashes[idx], wave
                    ),
                )
        for s, (idx, fut) in futures.items():
            mask[idx] = ray.get(fut)
        return mask

    def mark_complete(self, urls: List[str], lengths: Optional[List[int]] = None):
        if not urls:
            return
        _, shard_ids = self._partition(urls)
        futures = []
        for s in range(self.num_shards):
            idx = np.nonzero(shard_ids == s)[0]
            if len(idx):
                futures.append(
                    self.shards[s].mark_complete.remote(
                        [urls[i] for i in idx],
                        None if lengths is None else [lengths[i] for i in idx],
                    )
                )
        ray.get(futures)

    def snapshot(self) -> pa.Table:
        tables = ray.get([s.snapshot.remote() for s in self.shards])
        return pa.concat_tables(tables)

    def flush_deltas(self, dir_path: str) -> int:
        """Every shard writes its incremental delta into the wave's staging
        dir concurrently; returns total delta rows."""
        return sum(ray.get([s.flush_delta.remote(dir_path) for s in self.shards]))

    def flush_full(self, dir_path: str) -> int:
        """Compaction flush: every shard writes its FULL ledger into the
        wave's staging dir concurrently. The wave's meta records
        ``seen_full``; replay restarts here and earlier wave dirs become
        garbage-collectable (checkpoint.gc_checkpoints)."""
        return sum(ray.get([s.flush_full.remote(dir_path) for s in self.shards]))

    def restore_from_deltas(self, files: List[Tuple[int, str]]) -> int:
        """files = (shard_id, path) pairs in wave order
        (checkpoint.seen_delta_files). Requires the same num_shards the
        deltas were written with (recorded in checkpoint meta)."""
        per_shard: List[List[str]] = [[] for _ in range(self.num_shards)]
        for sid, path in files:
            per_shard[sid].append(path)
        return sum(
            ray.get(
                [
                    s.restore_deltas.remote(per_shard[i])
                    for i, s in enumerate(self.shards)
                ]
            )
        )

    def write_final(self, dir_path: str) -> int:
        import os as _os

        _os.makedirs(dir_path, exist_ok=True)
        return sum(ray.get([s.write_snapshot.remote(dir_path) for s in self.shards]))

    def restore(self, table: pa.Table) -> None:
        """Rebuild shards from a checkpoint snapshot (resume path)."""
        hashes = hash64_batch(table.column("url").to_pylist())
        shard_ids = (hashes % np.uint64(self.num_shards)).astype(np.int64)
        futures = []
        for s in range(self.num_shards):
            idx = np.nonzero(shard_ids == s)[0]
            futures.append(self.shards[s].restore.remote(table.take(idx)))
        ray.get(futures)

    def stats(self) -> List[dict]:
        return ray.get([s.stats.remote() for s in self.shards])
