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
