"""Index build pipeline: crawl pages → postings + catalog + duplicates.

Dataflow (all Ray Data; see stages/index.py for reference citations):

    pages (wave-partitioned parquet; page_hash stored at crawl time)
      ├─ PASS 1 (pruned columns: page_hash, seq, url + gates):
      │    filter status==200 ∧ is_html ∧ ≤10MB         (M11 + size gate)
      │    → manual exchange on page_hash bucket         (D2, global)
      │    → vectorized first-wins run kernel → dup rows
      │    → manual exchange on seq RANGE → duplicates sink: one
      │      seq-sorted parquet file per range (write_dup_store — no
      │      Ray AllToAll, no global sort; file/row-group stats give
      │      the same range pushdown)
      └─ PASS 2 (full rows, spans scanned exactly once), FUSED map
         tasks (_tokenize_partition_task, one generation):
           read pages slice → filter gates → drop dup seqs
             (range-pushdown anti-join against the duplicates store)
           → tokenize (per-process Porter memo)          (T3 + A3 weights)
                ├─ catalog sink rides the task (S8, side-effect write)
                └─ (token, doc_id, tf) rows hash-partitioned in-task
                     → reduce: vectorized df/idf scorer, dictionary-rank
                       (token, doc_id) sort               (A4/A5)
                     → bucket-partitioned postings runs  (O2 — no global
                       string sort; columnar pushdown replaces it)

The reference's partial-index spill files + two k-way merges are replaced
by the token-bucket shuffle; byte-offset seek indexes are replaced by
columnar predicate pushdown at query time (S9/S10 obsolete).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..stages.index import (
    tokenize_batch,
    add_page_hash,
    add_token_bucket,
    catalog_batch,
    make_score_fn,
)


@dataclass
class IndexPaths:
    postings: str
    catalog: str
    duplicates: str
    n_indexed: int
    # wall-clock per phase (dedup scan, tokenize+exchange barrier,
    # score+write) — the scaling sweep reads these to locate serial terms
    phase_seconds: dict = None


@ray.remote
def _tokenize_partition_task(
    paths,
    dup_dir: str,
    cat_dir: str,
    tok_batch: int,
    n_buckets: int,
):
    """Fused map side of the index build: read a slice of the pages store
    (``paths`` = [(file, row-group ids | None)], so ONE oversized file —
    an externally produced single-file store — still splits across
    tasks), gate + anti-join dups + catalog-write + tokenize in
    sub-batches, then
    hash-partition the postings into ``n_buckets`` return slices — one
    task generation instead of tokenize-materialize + re-read + partition.
    Fusing kills the barrier (reduce tasks start as soon as the first map
    finishes) and one full postings round-trip through the object store
    (the partitioned slices are the ONLY copy written to plasma), which
    measured ~2 GB of avoidable memory-bus traffic per 30k-page build."""
    import pyarrow.parquet as pq

    from ..stages.index import (
        add_token_bucket,
        catalog_batch,
        dup_seqs_in_range,
        tokenize_batch,
    )

    cols = ["spans", "seq", "url", "status", "is_html", "content_bytes"]
    tables = []
    for path, rgs in paths:
        pf = pq.ParquetFile(path)
        tables.append(
            pf.read_row_groups(rgs, columns=cols)
            if rgs is not None
            else pf.read(columns=cols)
        )
    tbl = pa.concat_tables(tables)
    pieces = []
    for off in range(0, tbl.num_rows, tok_batch):
        b = _valid_pages(tbl.slice(off, tok_batch))
        if b.num_rows == 0:
            continue
        seqs = b.column("seq").to_numpy(zero_copy_only=False)
        dup_arr = dup_seqs_in_range(dup_dir, int(seqs.min()), int(seqs.max()))
        if len(dup_arr):
            b = b.filter(pa.array(~np.isin(seqs, dup_arr)))
        if b.num_rows == 0:
            continue
        cat = catalog_batch(b)
        part = f"part-{cat.column('doc_id')[0].as_py():012d}.parquet"
        pq.write_table(cat, os.path.join(cat_dir, part))
        pieces.append(add_token_bucket(tokenize_batch(b), n_buckets))
    if not pieces:
        empty = pa.table(
            {
                "token": pa.array([], pa.string()),
                "doc_id": pa.array([], pa.int64()),
                "tf": pa.array([], pa.int64()),
            }
        )
        return tuple(empty for _ in range(n_buckets))
    p = pa.concat_tables(pieces)
    k = p.column("tbucket").to_numpy(zero_copy_only=False)
    order = np.argsort(k, kind="stable")
    t = p.take(pa.array(order, pa.int64())).drop_columns(["tbucket"])
    bounds = np.searchsorted(k[order], np.arange(n_buckets + 1))
    return tuple(
        t.slice(int(bounds[i]), int(bounds[i + 1] - bounds[i]))
        for i in range(n_buckets)
    )


def _valid_pages(batch: pa.Table) -> pa.Table:
    mask = pc.and_(
        pc.and_(
            pc.equal(batch.column("status"), 200),
            batch.column("is_html"),
        ),
        pc.less_equal(batch.column("content_bytes"), 10_000_000),
    )
    return batch.filter(mask)


def build_index(
    pages_path: str,
    out_dir: str,
    tokenize_concurrency: int = 4,
    min_ngram_df: int = 10,
) -> IndexPaths:
    """Build the inverted index from crawled pages. Ray must be initialised
    by the caller.

    ``tokenize_concurrency`` bounds the tokenize stage's parallelism on
    the Dataset legs (map_batches concurrency). The fused exchange path
    submits one task per ~rows_per_task fragment group and relies on the
    Ray scheduler's CPU cap instead — its per-task memory is bounded by
    the group size, not the worker count."""
    import time as _time

    phases: dict = {}
    _t0 = _time.perf_counter()

    def _mark(name: str):
        nonlocal _t0
        now = _time.perf_counter()
        phases[name] = round(now - _t0, 3)
        _t0 = now

    os.makedirs(out_dir, exist_ok=True)
    import pyarrow.dataset as _pads
    import pyarrow.parquet as _pq

    # schema + row count from parquet footers directly — Ray's
    # Dataset.schema() spawns per-file metadata tasks (~3 s on a
    # 300-file store) for what one footer answers
    _pages_ds = _pads.dataset(pages_path, format="parquet")
    has_hash = "page_hash" in _pages_ds.schema.names
    n_pages_total = sum(
        frag.metadata.num_rows for frag in _pages_ds.get_fragments()
    )

    # D2 dedup decision on the PROJECTED (page_hash, seq) pair only — the
    # heavy spans column never enters the dedup shuffle (when the crawl
    # stored page_hash with the page, the dedup scan reads two pruned
    # columns from parquet and never touches spans at all). Coarse buckets
    # keep the group count at O(buckets); the per-bucket kernel vectorized.
    if has_hash:
        proj_ds = ray.data.read_parquet(
            pages_path,
            columns=["page_hash", "seq", "url", "status", "is_html", "content_bytes"],
        ).map_batches(_valid_pages, batch_format="pyarrow")
        hashed = (
            ray.data.read_parquet(pages_path)
            .map_batches(_valid_pages, batch_format="pyarrow")
        )
    else:
        hashed = (
            ray.data.read_parquet(pages_path)
            .map_batches(_valid_pages, batch_format="pyarrow")
            .map_batches(add_page_hash, batch_format="pyarrow")
            .materialize()
        )
        proj_ds = hashed
    import numpy as np

    # duplicates sink: dup decisions land in a seq-range-partitioned,
    # per-file-sorted parquet store (write_dup_store: two manual
    # exchanges, no Ray AllToAll), becoming the probe side of a
    # range-pushdown anti-join — no driver collection, no broadcast
    # array; dup volume can be 25-40 % of the corpus and never touches
    # one process.
    from ..stages.index import write_dup_store

    dup_dir = os.path.join(out_dir, "duplicates")
    n_dups, n_valid = write_dup_store(
        proj_ds.select_columns(["page_hash", "seq", "url"]),
        dup_dir,
        seq_hint=n_pages_total,
    )
    _mark("dedup")

    n_indexed = n_valid - n_dups
    cat_dir = os.path.join(out_dir, "catalog")
    os.makedirs(cat_dir, exist_ok=True)

    from ..stages.index import dup_seqs_in_range

    def _drop_dups(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        seqs = batch.column("seq").to_numpy(zero_copy_only=False)
        lo, hi = int(seqs.min()), int(seqs.max())
        dup_arr = dup_seqs_in_range(dup_dir, lo, hi)
        if not len(dup_arr):
            return batch
        return batch.filter(pa.array(~np.isin(seqs, dup_arr)))

    # One fused pass over the kept pages: catalog sink rides the tokenize
    # tasks as a side-effect write (retry-stable part names), so the heavy
    # spans column is scanned exactly once.
    # Task-pool tokenize: the Porter memo cache is per worker PROCESS
    # (functions/porter.py), so plain tasks get actor-style amortization
    # without paying an actor-pool startup per index run.
    def _tokenize_catalog(batch: pa.Table) -> pa.Table:
        b = _drop_dups(batch)
        if b.num_rows == 0:
            return tokenize_batch(b)
        cat = catalog_batch(b)
        part = f"part-{cat.column('doc_id')[0].as_py():012d}.parquet"
        _pq.write_table(cat, os.path.join(cat_dir, part))
        return tokenize_batch(b)

    # batch_size trades tokenize-task memory against the token-shuffle
    # GRID: the shuffle creates (map tasks x reduce partitions)
    # sub-objects, and at ~500 map outputs (batch 64 over 31.5k pages)
    # the ~250k tiny shuffle objects put gigabytes of block metadata in
    # the driver. 256 pages/batch keeps a task's postings under ~50 MB
    # while cutting the grid 16x.
    tok_batch = int(os.environ.get("WCSE_TOKENIZE_BATCH", 256))
    from ..stages.index import _TOKEN_BUCKETS
    from ..stages.util import _reduce_concat, bucket_exchange

    shuffle_mode = os.environ.get("WCSE_INDEX_SHUFFLE", "exchange")
    fused = os.environ.get("WCSE_INDEX_FUSED", "1") == "1"
    if shuffle_mode == "exchange" and has_hash and fused:
        # FUSED manual exchange: each map task reads its slice of the
        # pages store, gates + anti-joins dups + writes catalog +
        # tokenizes + hash-partitions in ONE generation
        # (_tokenize_partition_task); reduce tasks (score fn) start as
        # soon as their inputs exist — no materialize barrier, and the
        # unpartitioned postings never hit the object store. (Ray's
        # sort-based groupby shuffle was measured at ~460 s CPU on the
        # same postings — see stages/index.py module docstring.)
        rows_per_task = max(tok_batch, n_pages_total // 256)
        # read units: whole files, except oversized multi-row-group files
        # (e.g. an externally produced SINGLE-file store), which split by
        # row group so the tokenize phase still parallelizes
        units = []  # (path, row-group ids | None, rows)
        for frag in _pages_ds.get_fragments():
            rows = frag.metadata.num_rows
            n_rgs = frag.metadata.num_row_groups
            if rows > 2 * rows_per_task and n_rgs > 1:
                cur_ids, cur_rows_f = [], 0
                for rg in range(n_rgs):
                    cur_ids.append(rg)
                    cur_rows_f += frag.metadata.row_group(rg).num_rows
                    if cur_rows_f >= rows_per_task:
                        units.append((frag.path, cur_ids, cur_rows_f))
                        cur_ids, cur_rows_f = [], 0
                if cur_ids:
                    units.append((frag.path, cur_ids, cur_rows_f))
            else:
                units.append((frag.path, None, rows))
        groups, cur, cur_rows = [], [], 0
        for path, rgs, rows in units:
            cur.append((path, rgs))
            cur_rows += rows
            if cur_rows >= rows_per_task:
                groups.append(cur)
                cur, cur_rows = [], 0
        if cur:
            groups.append(cur)
        part_lists = [
            _tokenize_partition_task.options(num_returns=_TOKEN_BUCKETS).remote(
                g, dup_dir, cat_dir, tok_batch, _TOKEN_BUCKETS
            )
            for g in groups
        ]
        if _TOKEN_BUCKETS == 1:
            part_lists = [[p] for p in part_lists]
        _mark("tokenize")  # task submission only; work overlaps the reduce
        score = make_score_fn(n_indexed, min_ngram_df)
        scored = ray.data.from_arrow_refs(
            [
                _reduce_concat.remote(
                    score, "tbucket", *[pl[b] for pl in part_lists]
                )
                for b in range(_TOKEN_BUCKETS)
            ]
        )
    elif shuffle_mode == "exchange":
        # no page_hash column (externally-produced pages store) or
        # WCSE_INDEX_FUSED=0 A/B leg: Dataset path with an explicit
        # materialize + exchange
        postings_mat = (
            hashed.map_batches(
                _tokenize_catalog,
                batch_format="pyarrow",
                batch_size=tok_batch,
                num_cpus=1,
                concurrency=tokenize_concurrency,
            )
            .map_batches(add_token_bucket, batch_format="pyarrow")
            .materialize()
        )
        _mark("tokenize")
        scored = bucket_exchange(
            postings_mat,
            "tbucket",
            _TOKEN_BUCKETS,
            make_score_fn(n_indexed, min_ngram_df),
        )
    else:  # A/B leg: Ray Data sort-based shuffle
        postings_raw = hashed.map_batches(
            _tokenize_catalog,
            batch_format="pyarrow",
            batch_size=tok_batch,
            num_cpus=1,
            concurrency=tokenize_concurrency,
        ).map_batches(add_token_bucket, batch_format="pyarrow")
        scored = postings_raw.groupby("tbucket").map_groups(
            make_score_fn(n_indexed, min_ngram_df), batch_format="pyarrow"
        )
    post_dir = os.path.join(out_dir, "postings")
    # bucket-partitioned sorted runs (each reduce output is locally
    # (token, doc_id)-sorted) — no global string sort; see make_score_fn
    if os.environ.get("WCSE_INDEX_SINK", "write") == "discard":
        # BENCH-ONLY isolation leg (the index analogue of the crawl's
        # --sinkscale): run the full exchange + scorer but drop the
        # parquet sink, separating single-disk write bandwidth (which
        # multiplies with node count on a real cluster) from the
        # CPU-scaling terms. Never used by the real pipeline.
        for _ in scored.iter_internal_ref_bundles():
            pass
    else:
        scored.write_parquet(post_dir)
    _mark("score_write")

    return IndexPaths(
        postings=post_dir,
        catalog=cat_dir,
        duplicates=dup_dir,
        n_indexed=n_indexed,
        phase_seconds=phases,
    )
