"""Small Ray Data utilities used by the wave loop."""

from __future__ import annotations

from typing import List, Optional

import pyarrow as pa

import ray
import ray.data


def dataset_from_known_refs(
    refs: List["ray.ObjectRef"],
    row_counts: List[int],
    schema: Optional[pa.Schema],
    row_bytes: int = 160,
) -> "ray.data.Dataset":
    """Build a Dataset over Arrow-table ObjectRefs whose row counts and
    schema the caller ALREADY knows — without ``from_arrow_refs``'s one
    metadata task per ref + blocking ``ray.get`` over all of them.

    In the wave loop every handoff is refs whose shapes were computed
    driver-side (slice lengths, filter counts), so the metadata round is
    pure latency: measured ~0.3-0.6 s/wave at 32 CPUs (worse at MORE cpus
    — the task count grows with the re-split width while the work doesn't).
    Crucially this never blocks on the refs themselves, so producer tasks
    (stamp/slice/filter) overlap the next execution's startup instead of
    being awaited by the driver.

    Uses Ray Data internals pinned to this environment's ray 2.49; falls
    back to the public ``from_arrow_refs`` if they drift.
    """
    try:
        from ray.data._internal.logical.interfaces import LogicalPlan
        from ray.data._internal.logical.operators.from_operators import FromArrow
        from ray.data._internal.plan import ExecutionPlan
        from ray.data._internal.stats import DatasetStats
        from ray.data.block import BlockMetadata, BlockMetadataWithSchema
        from ray.data.context import DataContext
        from ray.data.dataset import MaterializedDataset
    except ImportError:  # pragma: no cover - version drift fallback
        return ray.data.from_arrow_refs(refs)
    metas = [
        BlockMetadataWithSchema(
            BlockMetadata(
                num_rows=n,
                size_bytes=n * row_bytes,
                input_files=None,
                exec_stats=None,
            ),
            schema=schema,
        )
        for n in row_counts
    ]
    execution_plan = ExecutionPlan(
        DatasetStats(metadata={"FromArrow": metas}, parent=None),
        DataContext.get_current().copy(),
    )
    logical_plan = LogicalPlan(FromArrow(refs, metas), execution_plan._context)
    return MaterializedDataset(execution_plan, logical_plan)


def arrow_schema_of(ds: "ray.data.Dataset") -> Optional[pa.Schema]:
    """The underlying pyarrow schema of a (materialized) dataset, without
    triggering execution."""
    sch = ds.schema(fetch_if_missing=False)
    return getattr(sch, "base_schema", None) if sch is not None else None


def chunk_floor() -> int:
    """Target rows per re-split block for the dispatch→fetch handoff when
    the wave is large (see ``even_chunk``). Env-tunable for experiments."""
    import os

    return int(os.environ.get("WCSE_CHUNK_FLOOR", "128"))


def even_chunk(total: int, width: int, floor: int) -> int:
    """Chunk size that splits ``total`` rows into a task count that is an
    even MULTIPLE of the cluster width.

    Straight ``max(floor, total//splits)`` chunking leaves a ragged last
    scheduling round: e.g. 6.3k rows / 128 = 49 tasks on 32 cores = 1.53
    rounds — the fetch stage then runs 2 wall-clock rounds with half the
    cores idle in the second (measured as the 4N leg's fetch phase barely
    beating the N leg). Instead pick r = how many ≥floor-row rounds fit,
    then divide the wave EVENLY over r×width tasks: every core gets r
    tasks, no ragged tail. Small waves (< floor×width rows) spread across
    all cores down to a 32-row floor — per-task overhead is ~ms while a
    row costs ~2.5 ms of fetch+tokenize, so wide-and-tiny beats
    narrow-and-idle."""
    if total <= 0 or width <= 0:
        return floor
    rounds = max(1, total // (floor * width))
    return max(32, -(-total // (rounds * width)))


@ray.remote
def _block_count(table: pa.Table) -> int:
    return table.num_rows


@ray.remote
def _concat_blocks(*tables: pa.Table) -> pa.Table:
    return pa.concat_tables(tables).combine_chunks()


def refs_and_counts(mat: "ray.data.Dataset"):
    """(non-empty block refs, their row counts) of a MATERIALIZED dataset,
    from plan metadata — no tasks unless a count is missing."""
    refs, counts = [], []
    for bundle in mat.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            n = meta.num_rows
            if n is None:
                n = ray.get(_block_count.remote(ref))
            if n:
                refs.append(ref)
                counts.append(n)
    return refs, counts


def coalesce_ref_list(
    refs, counts, schema: Optional[pa.Schema], target_blocks: int
) -> "ray.data.Dataset":
    """Coalesce block refs toward ``target_blocks`` with driver-launched
    concat tasks — the block-width effect of ``repartition(n)`` without its
    AllToAll barrier; nothing blocks the driver."""
    total = sum(counts)
    if not refs:
        return ray.data.from_arrow(
            schema.empty_table() if schema is not None else pa.table({})
        )
    if len(refs) <= max(1, target_blocks):
        return dataset_from_known_refs(refs, counts, schema)
    target_rows = -(-total // max(1, target_blocks))
    out_refs, out_counts = [], []
    cur, cur_rows = [], 0
    for r, c in zip(refs, counts):
        cur.append(r)
        cur_rows += c
        if cur_rows >= target_rows:
            out_refs.append(_concat_blocks.remote(*cur) if len(cur) > 1 else cur[0])
            out_counts.append(cur_rows)
            cur, cur_rows = [], 0
    if cur:
        out_refs.append(_concat_blocks.remote(*cur) if len(cur) > 1 else cur[0])
        out_counts.append(cur_rows)
    return dataset_from_known_refs(out_refs, out_counts, schema)


def coalesce_refs(
    mat: "ray.data.Dataset", target_blocks: int
) -> "ray.data.Dataset":
    """``coalesce_ref_list`` over a materialized dataset's own blocks."""
    refs, counts = refs_and_counts(mat)
    if not refs:
        return mat
    return coalesce_ref_list(refs, counts, arrow_schema_of(mat), target_blocks)


@ray.remote
def _partition_block(table: pa.Table, key: str, nparts: int):
    """Map side of the manual hash exchange: one stable int-key argsort +
    one gather, then zero-copy slices — no per-key sort-merge machinery."""
    import numpy as np

    k = table.column(key).to_numpy(zero_copy_only=False)
    order = np.argsort(k, kind="stable")
    t = table.take(pa.array(order, pa.int64()))
    ks = k[order]
    bounds = np.searchsorted(ks, np.arange(nparts + 1))
    return tuple(
        t.slice(int(bounds[i]), int(bounds[i + 1] - bounds[i]))
        for i in range(nparts)
    )


@ray.remote
def _reduce_concat(fn, key: str, *parts: pa.Table) -> pa.Table:
    tables = [p for p in parts if p.num_rows]
    if not tables:
        # run fn on the empty (key-dropped) input so every reduce block
        # carries fn's OUTPUT schema — returning the input schema here
        # mixes schemas across blocks (Ray logs a RefBundle schema warning)
        if not parts:
            return pa.table({})
        empty = parts[0]
        if key in empty.column_names:
            empty = empty.drop_columns([key])
        return fn(empty)
    tbl = pa.concat_tables(tables)
    if key in tbl.column_names:
        tbl = tbl.drop_columns([key])
    return fn(tbl)


def bucket_exchange(
    mat: "ray.data.Dataset", bucket_col: str, n_buckets: int, fn
) -> "ray.data.Dataset":
    """Manual hash-partition exchange: every row lands in the reduce task
    of its ``bucket_col`` value (ints in [0, n_buckets)), where ``fn``
    runs over the whole bucket.

    Replaces ``groupby(bucket).map_groups(fn)`` for the wide integer-
    bucketed shuffles: Ray's sort-based shuffle SORTS every block and
    MERGE-SORTS every reduce partition — measured 460 s of CPU on the
    129M-row postings shuffle just to co-locate 256 bucket values. Here
    the map side is one stable integer argsort + gather + zero-copy
    slices per block, and the reduce side is a concat. Every exchanged
    object is addressed (block, bucket), so data still moves point-to-
    point on a multi-node cluster exactly like a shuffle."""
    refs, _counts = refs_and_counts(mat)
    if not refs:
        return mat
    # coalesce fragmented inputs first: a read/map stage over a small
    # table can leave dozens of sub-16k-row blocks, and the exchange grid
    # (blocks × buckets tiny objects) then dominates — merge toward
    # ~64k-row blocks with non-blocking concat tasks before partitioning
    total = sum(_counts)
    if len(refs) > 4 and total // len(refs) < 16384:
        target = max(1, min(len(refs), total // 65536 + 1))
        ds2 = coalesce_ref_list(refs, _counts, arrow_schema_of(mat), target)
        refs, _counts = refs_and_counts(ds2)
    if n_buckets == 1:
        # num_returns=1 makes Ray return a bare ref (not a 1-list); a
        # width-1 exchange is just one reduce over every block anyway
        return ray.data.from_arrow_refs(
            [_reduce_concat.remote(fn, bucket_col, *refs)]
        )
    part_lists = [
        _partition_block.options(num_returns=n_buckets).remote(
            r, bucket_col, n_buckets
        )
        for r in refs
    ]
    out_refs = [
        _reduce_concat.remote(fn, bucket_col, *[pl[b] for pl in part_lists])
        for b in range(n_buckets)
    ]
    return ray.data.from_arrow_refs(out_refs)


def exchange_sum_by_key(
    ds: "ray.data.Dataset", key: str, nbuck: int
) -> "ray.data.Dataset":
    """Sum every non-key column per integer ``key`` via one manual
    exchange: rows route to ``key % nbuck`` and each bucket reduces with
    an argsort + ``np.add.reduceat`` — exact because a key's rows are
    bucket-local. The drop-in replacement for the
    ``map_batches(partial).groupby(key).aggregate(Sum, ...)`` chain on
    narrow partial tables, where Ray's sort AllToAll costs ~2 s of
    executor latency regardless of data size. Column dtypes are
    preserved (int64 sums stay int64)."""
    import numpy as np

    def add_bucket(b: pa.Table) -> pa.Table:
        k = np.asarray(b.column(key), dtype=np.int64)
        return b.append_column(
            "__xbucket", pa.array(k % nbuck, pa.int64())
        )

    def reduce(tbl: pa.Table) -> pa.Table:
        names = [n for n in tbl.column_names if n != key]
        if tbl.num_rows == 0:
            return tbl
        k = np.asarray(tbl.column(key), dtype=np.int64)
        order = np.argsort(k, kind="stable")
        ks = k[order]
        first = np.concatenate(([True], ks[1:] != ks[:-1]))
        starts = np.flatnonzero(first)
        cols = {key: pa.array(ks[first], pa.int64())}
        for name in names:
            v = tbl.column(name).to_numpy(zero_copy_only=False)[order]
            cols[name] = pa.array(
                np.add.reduceat(v, starts),
                tbl.schema.field(name).type,
            )
        return pa.table(cols)

    mat = ds.map_batches(add_bucket, batch_format="pyarrow").materialize()
    return bucket_exchange(mat, "__xbucket", nbuck, reduce)


def exchange_group_agg(
    ds: "ray.data.Dataset",
    keys: List[str],
    aggs: list,
    nbuck: int = 32,
) -> "ray.data.Dataset":
    """Generic groupby-aggregate on a manual hash exchange — the drop-in
    for ``ds.groupby(keys).aggregate(...)`` over (possibly composite,
    possibly string) keys, where Ray's sort AllToAll pays ~1-2 s of
    executor latency regardless of data size. ``aggs`` is a list of
    ``(col, fn)`` pairs in ``pyarrow.Table.group_by`` form ("sum", "min",
    "max", "mean", ...); the output keeps the INPUT column name (``col``,
    not ``col_fn``). Rows route on a mixed 64-bit hash of the key
    columns; string keys hash per dictionary-unique, not per row. A key's
    rows are bucket-local, so per-bucket pyarrow aggregation is exact."""
    import numpy as np
    import pyarrow.compute as pc

    from ..functions.urls import hash64_batch

    def add_bucket(b: pa.Table) -> pa.Table:
        h = np.zeros(b.num_rows, np.uint64)
        for kcol in keys:
            col = b.column(kcol)
            typ = b.schema.field(kcol).type
            if pa.types.is_string(typ) or pa.types.is_large_string(typ):
                enc = pc.dictionary_encode(col.combine_chunks())
                hu = hash64_batch(enc.dictionary.to_pylist())
                # Null keys encode as null indices; fill with a sentinel so
                # to_numpy stays integral and all nulls land in one bucket
                # (pa group_by treats null as its own key, so this is exact).
                idx = pc.fill_null(enc.indices, -1).to_numpy(zero_copy_only=False)
                hk = np.where(
                    idx < 0,
                    np.uint64(0xD6E8FEB86659FD93),
                    hu[np.maximum(idx, 0)],
                )
            else:
                cc = col.combine_chunks()
                nulls = None
                if cc.null_count:
                    nulls = pc.is_null(cc).to_numpy(zero_copy_only=False)
                    cc = pc.fill_null(cc, 0)
                k = cc.to_numpy(zero_copy_only=False)
                if k.dtype.kind in "mM":  # datetime/timedelta → epoch ints
                    k = k.astype(np.int64)
                k = k.astype(np.uint64)
                hk = k * np.uint64(0x9E3779B97F4A7C15)
                if nulls is not None:
                    hk = np.where(nulls, np.uint64(0xD6E8FEB86659FD93), hk)
            h = (h * np.uint64(0x100000001B3)) ^ hk
        return b.append_column(
            "__gbucket",
            pa.array((h % np.uint64(nbuck)).astype(np.int64), pa.int64()),
        )

    def reduce(tbl: pa.Table) -> pa.Table:
        g = tbl.group_by(keys).aggregate(list(aggs))
        cols = {k: g.column(k) for k in keys}
        for c, f in aggs:
            cols[c] = g.column(f"{c}_{f}")
        return pa.table(cols)

    mat = ds.map_batches(add_bucket, batch_format="pyarrow").materialize()
    return bucket_exchange(mat, "__gbucket", nbuck, reduce)


def resplit_ref(ref: "ray.ObjectRef", total_rows: int, target_splits: int):
    """Slice one block ref into even task rounds (see even_chunk); returns
    (refs, counts) without blocking."""
    chunk = even_chunk(total_rows, target_splits, chunk_floor())
    if total_rows <= chunk:
        return [ref], [total_rows]
    refs, counts = [], []
    for i in range(0, total_rows, chunk):
        refs.append(_slice_block.remote(ref, i, chunk))
        counts.append(min(chunk, total_rows - i))
    return refs, counts


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
    schema = arrow_schema_of(mat)
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
        chunk = even_chunk(total_rows, target_splits, chunk_floor())
    out_refs, out_counts = [], []
    off = start
    for r, c in refs_counts:
        if not c:
            # skip empty blocks: expression filters may emit them with a
            # pruned (even empty) schema, which would poison a later union
            continue
        stamped = _with_index.remote(r, col, off)
        if chunk and c > chunk:
            for i in range(0, c, chunk):
                out_refs.append(_slice_block.remote(stamped, i, chunk))
                out_counts.append(min(chunk, c - i))
        else:
            out_refs.append(stamped)
            out_counts.append(c)
        off += c
    total = off - start
    if not out_refs:
        return mat, 0
    if schema is not None and col not in schema.names:
        schema = schema.append(pa.field(col, pa.int64()))
    return dataset_from_known_refs(out_refs, out_counts, schema), total


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
    schema = arrow_schema_of(mat)
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
        chunk = even_chunk(total, target_splits, chunk_floor())
    out_refs, out_counts, rest_refs = [], [], []
    off = start
    for (r, n), fl in zip(refs_counts, plens):
        if fl:
            stamped = _slice_stamp.remote(r, fl, col, off)
            if chunk and fl > chunk:
                for i in range(0, fl, chunk):
                    out_refs.append(_slice_block.remote(stamped, i, chunk))
                    out_counts.append(min(chunk, fl - i))
            else:
                out_refs.append(stamped)
                out_counts.append(fl)
            off += fl
        if n - fl:
            rest_refs.append(_slice_block.remote(r, fl, n - fl))
    if schema is not None and col not in schema.names:
        schema = schema.append(pa.field(col, pa.int64()))
    prefix_ds = (
        dataset_from_known_refs(out_refs, out_counts, schema) if out_refs else None
    )
    return prefix_ds, total, rest_refs


def sf_table_rows(sf_dir: str, table: str) -> int:
    """Row count from the parquet footer — free, known before any read."""
    import os

    import pyarrow.parquet as pq

    return pq.read_metadata(os.path.join(sf_dir, f"{table}.parquet")).num_rows


def empty_guard(*tables: str, _rows: Optional[list] = None, **out_cols):
    """Short-circuit an ``fn(sf_dir, ...)`` query when any listed input
    table has zero rows: return the query's TYPED empty result (or the
    literal ``_rows`` — e.g. a global aggregate's zeros row) instead of
    running the pipeline.

    Ray Data drops zero-row parquet blocks entirely — the read yields
    column-less blocks, map UDFs never execute on them, and every
    downstream ``batch.column(...)`` or final schema vanishes — so an
    empty table/partition (a normal state on resumed or skew-filtered
    100 TB runs) cannot be typed mid-pipeline. The head guard is the
    contract: empty input in → the same typed result the query's SQL
    oracle produces on empty views. Pinned per query by
    tests/test_empty_inputs.py.
    """
    import functools

    schema = pa.schema([(k, t) for k, t in out_cols.items()])

    def deco(fn):
        @functools.wraps(fn)
        def wrapper(sf_dir, *args, **kwargs):
            if any(sf_table_rows(sf_dir, t) == 0 for t in tables):
                if _rows is not None:
                    return pa.Table.from_pylist(_rows, schema=schema)
                return schema.empty_table()
            return fn(sf_dir, *args, **kwargs)

        return wrapper

    return deco
