"""Distributed hash join: big ⨝ big, co-partitioned by key hash.

The one relational primitive the engine's query layer still lacked as a
reusable operator (broadcast joins cover only big ⨝ small — see
pipelines/relational.py top_customers / lineitem_bloom_semijoin). Neither
input fits in one task's heap at 100 TB, so the classic shuffle join:

  1. tag each side and pad it to a common schema (missing columns become
     typed nulls) so the two Datasets ``union`` into one stream;
  2. one ``map_batches`` appends a bucket id = stable hash(key) mod B —
     the SAME function on both sides, so matching keys land in the same
     bucket regardless of which side they came from;
  3. ``groupby(bucket).map_groups`` co-locates each bucket once (a single
     all-to-all exchange for BOTH inputs) and joins inside the bucket with
     sorted-array binary search: right side sorted by key once per bucket,
     every left row's match range found with ``np.searchsorted``, and the
     multi-match fan-out materialized by ``np.repeat`` + a vectorized
     ranges gather — no per-row Python.

Skew: a hot key concentrates in one bucket, but only that key's rows —
``num_buckets`` bounds reduce width, and callers can raise it
data-proportionally (see pipelines/crawl.py's shuffle-width policy).
Reference parity: the reference joins postings to documents in-process
(inverted_indexer/indexer/__init__.py:162-201); this generalizes that to
datasets where neither side is broadcastable.
"""

from __future__ import annotations

from typing import List

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

__all__ = ["hash_join"]

_SIDE = "__join_side"
_KEY = "__join_key"
_BUCKET = "__join_bucket"


def _bucket_ids(keys: np.ndarray, num_buckets: int) -> np.ndarray:
    """Stable bucket assignment; integer keys avalanche through mix32 so
    sequential key ranges don't stripe, strings go through the FNV path."""
    from ..functions.hashing import mix32_batch

    if np.issubdtype(keys.dtype, np.integer):
        h = mix32_batch(keys.astype(np.int64), 9176)
    else:
        from ..functions.urls import hash64_batch

        h = hash64_batch([str(k) for k in keys])
    return (h % np.uint64(num_buckets)).astype(np.int32)


def _pad(
    batch: pa.Table,
    key: str,
    side: int,
    l_fields: pa.Schema,
    r_fields: pa.Schema,
    num_buckets: int,
) -> pa.Table:
    """Common-schema tag: canonical column order (key, side, left fields,
    right fields, bucket) on BOTH sides so the two streams union cleanly;
    the absent side's columns are typed nulls."""
    n = batch.num_rows
    cols = {
        _KEY: batch.column(key).cast(pa.int64())
        if pa.types.is_integer(batch.schema.field(key).type)
        else batch.column(key),
        _SIDE: pa.array(np.full(n, side, np.int8), pa.int8()),
    }
    for f in l_fields:
        cols[f.name] = batch.column(f.name) if side == 0 else pa.nulls(n, f.type)
    for f in r_fields:
        cols[f.name] = batch.column(f.name) if side == 1 else pa.nulls(n, f.type)
    keys_np = batch.column(key).to_numpy(zero_copy_only=False)
    cols[_BUCKET] = pa.array(_bucket_ids(keys_np, num_buckets), pa.int32())
    return pa.table(cols)


def _ranges_gather(lo: np.ndarray, cnt: np.ndarray) -> np.ndarray:
    """Concatenate [lo[i], lo[i]+cnt[i]) ranges without a Python loop."""
    total = int(cnt.sum())
    if total == 0:
        return np.empty(0, np.int64)
    starts = np.repeat(cnt.cumsum() - cnt, cnt)
    return np.arange(total, dtype=np.int64) - starts + np.repeat(lo, cnt)


def hash_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    *,
    left_on: str,
    right_on: str,
    num_buckets: int = 64,
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
    bucket_post=None,
) -> "ray.data.Dataset":
    """Inner-join two Datasets on a single key column (co-partitioned
    shuffle join; see module docstring). Non-key column names must be
    disjoint; both key columns appear in the output.

    Pass ``left_schema``/``right_schema`` when known statically —
    ``Dataset.schema()`` on a lazy mapped dataset executes a task to
    infer it, a wasted pipeline warm-up per side on the hot path.

    ``bucket_post`` (optional) runs on each bucket's joined table INSIDE
    the join stage. Because a key's rows are co-located in exactly one
    bucket, any per-join-key aggregate/top-k computed there is already
    complete — passing it here removes the follow-up all-to-all shuffle
    a ``.groupby(key)`` after the join would cost."""
    def _arrow_schema(ds: "ray.data.Dataset") -> pa.Schema:
        s = ds.schema()
        base = getattr(s, "base_schema", None)
        if isinstance(base, pa.Schema):
            return base
        fields = []
        for n, t in zip(s.names, s.types):
            if not isinstance(t, pa.DataType):
                dt = np.dtype(t)
                # pandas-block schemas surface str columns as np.object_
                t = pa.string() if dt == np.dtype(object) else pa.from_numpy_dtype(dt)
            fields.append(pa.field(n, t))
        return pa.schema(fields)

    l_fields = left_schema if left_schema is not None else _arrow_schema(left)
    r_fields = right_schema if right_schema is not None else _arrow_schema(right)
    ls, rs = l_fields, r_fields
    clash = (set(ls.names) & set(rs.names)) - {left_on, right_on}
    if clash:
        raise ValueError(f"column name collision across join sides: {sorted(clash)}")
    l_names: List[str] = list(ls.names)
    r_names: List[str] = list(rs.names)

    tagged = left.map_batches(
        lambda b: _pad(b, left_on, 0, l_fields, r_fields, num_buckets),
        batch_format="pyarrow",
    ).union(
        right.map_batches(
            lambda b: _pad(b, right_on, 1, l_fields, r_fields, num_buckets),
            batch_format="pyarrow",
        )
    )

    def join_bucket(group: pa.Table) -> pa.Table:
        side = group.column(_SIDE).to_numpy(zero_copy_only=False)
        keys = group.column(_KEY).to_numpy(zero_copy_only=False)
        li = np.flatnonzero(side == 0)
        ri = np.flatnonzero(side == 1)
        empty = {
            name: pa.chunked_array([[]], type=group.schema.field(name).type)
            for name in l_names + r_names
        }
        if len(li) == 0 or len(ri) == 0:
            out_tbl = pa.table(empty)
            return bucket_post(out_tbl) if bucket_post is not None else out_tbl
        rk = keys[ri]
        order = np.argsort(rk, kind="stable")
        rk_sorted = rk[order]
        lk = keys[li]
        lo = np.searchsorted(rk_sorted, lk, side="left")
        hi = np.searchsorted(rk_sorted, lk, side="right")
        cnt = hi - lo
        left_idx = li[np.repeat(np.arange(len(li), dtype=np.int64), cnt)]
        right_idx = ri[order[_ranges_gather(lo, cnt)]]
        if len(left_idx) == 0:
            out_tbl = pa.table(empty)
            return bucket_post(out_tbl) if bucket_post is not None else out_tbl
        out = {}
        lt = group.take(pa.array(left_idx, pa.int64()))
        rt = group.take(pa.array(right_idx, pa.int64()))
        for name in l_names:
            out[name] = lt.column(name)
        for name in r_names:
            out[name] = rt.column(name)
        out_tbl = pa.table(out)
        return bucket_post(out_tbl) if bucket_post is not None else out_tbl

    # manual exchange instead of groupby(_BUCKET): Ray's sort AllToAll
    # costs ~2 s of executor latency regardless of size; the exchange is
    # one integer argsort + zero-copy slices per block and a concat per
    # bucket (stages/util.py bucket_exchange) — identical co-partitioning
    from .util import bucket_exchange

    return bucket_exchange(
        tagged.materialize(), _BUCKET, num_buckets, join_bucket
    )
