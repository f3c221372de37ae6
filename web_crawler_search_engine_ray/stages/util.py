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


def zip_with_index(ds: "ray.data.Dataset", col: str, start: int) -> "ray.data.Dataset":
    return zip_with_index_counted(ds, col, start)[0]


def zip_with_index_counted(
    ds: "ray.data.Dataset", col: str, start: int
) -> tuple:
    """Append a dense int64 index column following the dataset's current
    block order (caller sorts first); returns (dataset, row_count) so
    callers don't need a separate count() execution. Two passes over block
    refs: count, then offset-stamp — wave-bounded datasets only (the
    frontier delta is ~100 bytes/URL, so materializing it is cheap relative
    to fetched bytes).
    """
    mat = ds.materialize()
    refs = mat.to_arrow_refs()
    counts = ray.get([_block_count.remote(r) for r in refs])
    out_refs = []
    off = start
    for r, c in zip(refs, counts):
        if c == 0:
            # skip empty blocks: expression filters may emit them with a
            # pruned (even empty) schema, which would poison a later union
            continue
        out_refs.append(_with_index.remote(r, col, off))
        off += c
    total = off - start
    if not out_refs:
        return mat, 0
    return ray.data.from_arrow_refs(out_refs), total
