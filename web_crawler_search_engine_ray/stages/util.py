"""Small Ray Data utilities used by the wave loop."""

from __future__ import annotations

import pyarrow as pa

import ray
import ray.data


@ray.remote
def _block_count(table: pa.Table) -> int:
    return table.num_rows


@ray.remote
def _with_index(table: pa.Table, col: str, start: int) -> pa.Table:
    idx = pa.array(range(start, start + table.num_rows), pa.int64())
    if col in table.column_names:
        table = table.drop_columns([col])
    return table.append_column(col, idx)


@ray.remote
def _slice_block(table: pa.Table, offset: int, length: int) -> pa.Table:
    return table.slice(offset, length)


@ray.remote
def _prefix_len(table: pa.Table, col: str, upper: int) -> int:
    """Rows in the block's prefix with table[col] < upper (col sorted asc)."""
    import numpy as np

    a = table.column(col).to_numpy(zero_copy_only=False)
    return int(np.searchsorted(a, upper, side="left"))


@ray.remote
def _slice_stamp(table: pa.Table, length: int, col: str, start: int) -> pa.Table:
    t = table.slice(0, length)
    if col in t.column_names:
        t = t.drop_columns([col])
    return t.append_column(col, pa.array(range(start, start + length), pa.int64()))


def zip_with_index(ds: "ray.data.Dataset", col: str, start: int) -> "ray.data.Dataset":
    return zip_with_index_counted(ds, col, start)[0]


def zip_with_index_counted(
    ds: "ray.data.Dataset", col: str, start: int, target_splits: int = 0
) -> tuple:
    """Append a dense int64 index column following the dataset's current
    block order (caller sorts first); returns (dataset, row_count) so
    callers don't need a separate count() execution. Counts come from the
    materialized plan's block metadata; stamping is one fire-and-forget
    task per block — wave-bounded datasets only (the frontier delta is
    ~100 bytes/URL, so materializing it is cheap relative to fetched
    bytes).

    ``target_splits`` > 0 re-splits the stamped blocks toward that many
    output blocks (zero-copy slices): block COUNT sizing upstream is
    coarse (fewer tiny shuffle tasks) while a downstream compute-heavy
    map (the fetch/tokenize join) still fans out across the cluster.
    """
    mat = ds.materialize()
    # block row counts come from the materialized plan's metadata — no
    # count tasks, no extra ray.get round
    refs_counts = []
    for bundle in mat.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            n = meta.num_rows
            if n is None:  # metadata gap: fall back to a count task
                n = ray.get(_block_count.remote(ref))
            refs_counts.append((ref, n))
    total_rows = sum(c for _, c in refs_counts)
    chunk = 0
    if target_splits and total_rows:
        # floor of 256 rows/split: each downstream fetch task writes its
        # sink files once per block, so tiny blocks trade compute
        # parallelism for per-file + per-task overhead (measured: a 64-row
        # floor at 32 CPUs made the stamp+fetch phases SLOWER than at 8)
        chunk = max(256, -(-total_rows // target_splits))
    out_refs = []
    off = start
    for r, c in refs_counts:
        if not c:
            # skip empty blocks: expression filters may emit them with a
            # pruned (even empty) schema, which would poison a later union
            continue
        stamped = _with_index.remote(r, col, off)
        if chunk and c > chunk:
            out_refs.extend(
                _slice_block.remote(stamped, i, chunk) for i in range(0, c, chunk)
            )
        else:
            out_refs.append(stamped)
        off += c
    total = off - start
    if not out_refs:
        return mat, 0
    return ray.data.from_arrow_refs(out_refs), total


def split_prefix_zip(
    mat: "ray.data.Dataset",
    action_col: str,
    upper: int,
    col: str,
    start: int,
    target_splits: int = 0,
) -> tuple:
    """Over a MATERIALIZED dataset globally sorted with ``action_col`` as
    the leading sort key: split every block into its ``action < upper``
    prefix and the remainder (zero-copy slices), stamp a dense int64
    ``col`` across the prefix rows in block order, and re-split the
    stamped prefix toward ``target_splits`` blocks.

    Returns ``(prefix_ds | None, n_prefix_rows, rest_refs)``.

    This is the dispatch half of the wave loop fused into the schedule
    execution: the politeness groupby, the global dispatch sort, the seq
    stamping and the carry-block extraction all ride ONE streaming
    execution plus one round of tiny per-block tasks — instead of a
    second filter+sort+materialize run per wave (measured ~0.5 s/wave of
    pure executor overhead at 32 CPUs on kilobyte-scale waves).
    """
    refs_counts = []
    for bundle in mat.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            n = meta.num_rows
            if n is None:
                n = ray.get(_block_count.remote(ref))
            if n:
                refs_counts.append((ref, n))
    plens = ray.get([_prefix_len.remote(r, action_col, upper) for r, _ in refs_counts])
    total = sum(plens)
    chunk = 0
    if target_splits and total:
        # same 256-row floor rationale as zip_with_index_counted
        chunk = max(256, -(-total // target_splits))
    out_refs, rest_refs = [], []
    off = start
    for (r, n), fl in zip(refs_counts, plens):
        if fl:
            stamped = _slice_stamp.remote(r, fl, col, off)
            if chunk and fl > chunk:
                out_refs.extend(
                    _slice_block.remote(stamped, i, chunk) for i in range(0, fl, chunk)
                )
            else:
                out_refs.append(stamped)
            off += fl
        if n - fl:
            rest_refs.append(_slice_block.remote(r, fl, n - fl))
    prefix_ds = ray.data.from_arrow_refs(out_refs) if out_refs else None
    return prefix_ds, total, rest_refs
