"""Fetch stage: the synthetic-web lookup join (reference ``download()``,
web_crawler/utils/download.py:4-18 → SURVEY.md S1/J4).

A wave's dispatched URLs are joined against the docs table by ``doc_id``
(canonical URL). Missing doc_id ⇒ fabricated 404 row with empty content,
mirroring download.py:13-18. Implemented as an ACTOR-POOL ``map_batches``
stage: each actor opens the docs store once (``__init__``) and serves
batched keyed reads (``__call__``) — the Lance-`take` pattern. Storage here
is Parquet (Lance is not installed): large stores use per-batch predicate
pushdown (`doc_id isin batch`) against sorted row groups; small stores are
memoized in actor memory.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads

from ..schema import DOCS_SCHEMA

# Docs stores under this many BYTES are cached fully in each fetch worker
# (a broadcast-small-side join; the bound is per worker PROCESS — size it
# against workers-per-node × threshold). Larger stores fall back to
# predicate-pushdown reads; at the 100 TB regime the store would be
# hash-bucketed by doc_id (or a Lance table with `take`) so each fetch
# batch opens only its buckets instead of filtering the full dataset.
_IN_MEMORY_BYTES = 512 * 1024 * 1024


class DocStore:
    """Keyed access to the docs table (the 'network').

    ``table_ref`` (a ``ray.put`` of the whole docs table) is the broadcast
    small-side path: the table lives ONCE in the shared-memory object store
    and every worker maps it zero-copy — without it each worker process
    would materialize its own heap copy (observed to dominate fetch wall
    time at high worker counts). Only the url→row dict index (8 bytes/key)
    is per-worker."""

    def __init__(self, docs_path: str, table_ref=None):
        self._mem: Optional[pa.Table] = None
        self._index: Optional[dict] = None
        if table_ref is not None:
            import ray as _ray

            if isinstance(table_ref, list):
                # per-row-group refs (broadcast_docs_ref): zero-copy map
                # each part and view them as one chunked table
                parts = _ray.get(table_ref)
                self._mem = pa.concat_tables([p for p in parts if p.num_rows])
                if self._mem.num_rows == 0:
                    self._mem = parts[0]
            else:
                self._mem = _ray.get(table_ref)  # zero-copy shared-memory view
            self.dataset = None
        else:
            self.dataset = pads.dataset(docs_path, format="parquet")
            total_bytes = sum(
                rg.total_byte_size
                for frag in self.dataset.get_fragments()
                for rg in frag.row_groups
            )
            if total_bytes <= _IN_MEMORY_BYTES:
                self._mem = self.dataset.to_table()
        if self._mem is not None:
            self._index = {
                u: i for i, u in enumerate(self._mem.column("doc_id").to_pylist())
            }
            # per-chunk views + row offsets: a .take() on a multi-GB
            # CHUNKED table concatenates the underlying arrays first,
            # which overflows Arrow's 32-bit string/list offsets — so
            # gather per chunk instead (each result is batch-sized)
            self._parts = [
                pa.Table.from_batches([b], schema=self._mem.schema)
                for b in self._mem.to_batches()
            ]
            self._offs = np.cumsum([0] + [p.num_rows for p in self._parts])

    def _gather(self, rows: np.ndarray) -> pa.Table:
        """Chunk-aware row gather from the in-memory table, preserving the
        order of ``rows``."""
        if len(self._parts) == 1:
            return self._parts[0].take(pa.array(rows, pa.int64()))
        if not len(rows):
            return self._mem.schema.empty_table()
        order = np.argsort(rows, kind="stable")
        srt = rows[order]
        ci = np.searchsorted(self._offs, srt, side="right") - 1
        pieces = []
        for c in np.unique(ci):
            local = srt[ci == c] - self._offs[c]
            pieces.append(self._parts[c].take(pa.array(local, pa.int64())))
        small = pa.concat_tables(pieces)
        inv = np.empty_like(order)
        inv[order] = np.arange(len(order), dtype=np.int64)
        return small.take(pa.array(inv, pa.int64()))

    def take(self, urls: list) -> tuple:
        """Return (pos, table): ``pos[i]`` is the row index of ``urls[i]``
        within the returned table, or -1 on miss."""
        if self._mem is not None:
            mem_pos = np.fromiter(
                (self._index.get(u, -1) for u in urls), dtype=np.int64, count=len(urls)
            )
            hit = mem_pos >= 0
            tbl = self._gather(mem_pos[hit])
            pos = np.full(len(urls), -1, dtype=np.int64)
            pos[hit] = np.arange(int(hit.sum()), dtype=np.int64)
            return pos, tbl
        tbl = self.dataset.to_table(
            filter=pc.field("doc_id").isin(pa.array(urls, pa.string()))
        )
        idx = {u: i for i, u in enumerate(tbl.column("doc_id").to_pylist())}
        pos = np.fromiter(
            (idx.get(u, -1) for u in urls), dtype=np.int64, count=len(urls)
        )
        return pos, tbl


_STORE_CACHE: dict = {}


def cached_store(docs_path: str, table_ref=None) -> DocStore:
    """Per-worker-process DocStore cache. The crawl loop runs one Dataset
    execution PER WAVE; an actor pool would be torn down and restarted
    each wave (setup × waves), while Ray reuses worker processes across
    executions of the same job — so a module-level cache gives actor-style
    amortized setup across the whole crawl. Read-only state, so no
    coherence concerns."""
    store = _STORE_CACHE.get(docs_path)
    if store is None:
        store = _STORE_CACHE[docs_path] = DocStore(docs_path, table_ref)
    return store


# the BROADCAST bound is wider than the per-process heap bound: a ray.put
# table lives ONCE in the shared-memory object store regardless of worker
# count (zero-copy maps), so it is sized against the store, not the heap
_BROADCAST_BYTES = 4 * 1024 * 1024 * 1024


def broadcast_docs_ref(docs_path: str):
    """ray.put the docs table once (shared-memory broadcast) when it fits
    the broadcast bound; None → workers fall back to predicate-pushdown
    reads (the 100 TB path, where the store is bucketed/Lance)."""
    import ray as _ray

    ds = pads.dataset(docs_path, format="parquet")
    frags = list(ds.get_fragments())
    total_bytes = sum(
        rg.total_byte_size for frag in frags for rg in frag.row_groups
    )
    if total_bytes > _BROADCAST_BYTES:
        return None

    # parallel load: one task per row group straight into the object
    # store (a driver-serial read of a ~GB store costs ~8 s/run). Each
    # row-group table stays a SEPARATE ref — workers map them zero-copy
    # and DocStore treats them as its chunk parts, so no multi-GB nested
    # column is ever combined (32-bit offset ceiling).
    @_ray.remote
    def _read_rg(path: str, rg: int) -> pa.Table:
        import pyarrow.parquet as _pq

        f = _pq.ParquetFile(path)
        return f.read_row_group(rg)

    refs = []
    for frag in frags:
        for rg in frag.row_groups:
            refs.append(_read_rg.remote(frag.path, rg.id))
    if not refs:
        return [_ray.put(ds.schema.empty_table())]
    return refs


def make_fetch_fn(docs_path: str, table_ref=None):
    """Task-pool fetch fn for the per-wave executions (store via
    cached_store, amortized across waves)."""

    def fetch_batch(batch: pa.Table) -> pa.Table:
        return _fetch_with_store(cached_store(docs_path, table_ref), batch)

    return fetch_batch


class FetchStage:
    """map_batches callable class → actor pool (single-execution pipelines;
    the wave loop uses make_fetch_fn instead, see cached_store). Input
    batch: scheduled frontier rows (seq, wave, url, host, virtual_ts,
    discovery_seq, depth); output: + status, content_bytes, is_html, spans."""

    def __init__(self, docs_path: str):
        self.store = cached_store(docs_path)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _fetch_with_store(self.store, batch)


def _fetch_with_store(store: DocStore, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        pos, docs_tbl = store.take(urls)
        n = len(urls)

        status = np.full(n, 404, dtype=np.int32)
        content_bytes = np.zeros(n, dtype=np.int64)
        is_html = np.zeros(n, dtype=bool)

        hit_mask = pos >= 0
        hit_rows = np.nonzero(hit_mask)[0]
        if len(hit_rows):
            take_idx = pa.array(pos[hit_mask], pa.int64())
            aligned = docs_tbl.take(take_idx)
            status[hit_mask] = aligned.column("status").to_numpy()
            content_bytes[hit_mask] = aligned.column("content_bytes").to_numpy()
            is_html[hit_mask] = aligned.column("is_html").to_numpy(zero_copy_only=False)
            spans_aligned = aligned.column("spans")
        # spans column: null for misses, aligned values for hits
        spans_type = DOCS_SCHEMA.field("spans").type
        if len(hit_rows) == n:
            spans_col = spans_aligned.combine_chunks()
        else:
            py = [None] * n
            if len(hit_rows):
                vals = spans_aligned.to_pylist()
                for j, i in enumerate(hit_rows):
                    py[i] = vals[j]
            spans_col = pa.array(py, spans_type)

        out = batch
        for name, arr in (
            ("status", pa.array(status, pa.int32())),
            ("content_bytes", pa.array(content_bytes, pa.int64())),
            ("is_html", pa.array(is_html, pa.bool_())),
            ("spans", spans_col),
        ):
            out = out.append_column(name, arr)
        return out


def should_scrape_mask(batch: pa.Table) -> np.ndarray:
    """Vectorized should_scrape gates (worker.py:53-71): status 200,
    ≥256 bytes, html sniff."""
    return (
        pc.and_(
            pc.and_(
                pc.equal(batch.column("status"), 200),
                pc.greater_equal(batch.column("content_bytes"), 256),
            ),
            batch.column("is_html"),
        )
        .to_numpy(zero_copy_only=False)
        .astype(bool)
    )


def filter_scrapeable(batch: pa.Table) -> pa.Table:
    return batch.filter(pa.array(should_scrape_mask(batch)))
