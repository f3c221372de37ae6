"""Index build pipeline: crawl pages → postings + catalog + duplicates.

Dataflow (all Ray Data; see stages/index.py for reference citations):

    pages (wave-partitioned parquet; page_hash stored at crawl time)
      ├─ PASS 1 (pruned columns: page_hash, seq, url + gates):
      │    filter status==200 ∧ is_html ∧ ≤10MB         (M11 + size gate)
      │    → coarse-bucket groupby(page_hash % 256)      (D2, global)
      │    → vectorized first-wins run kernel → dup rows
      │         └─ duplicates sink (driver-side, already collected)
      └─ PASS 2 (full rows, spans scanned exactly once):
           filter gates → drop dup seqs (broadcast np.isin)
           → tokenize tasks (per-process Porter memo)    (T3 + A3 weights)
                ├─ catalog sink rides the task (S8, side-effect write)
                └─ (token, doc_id, tf) rows
                     → groupby(token_hash % 256)         (A4/A5 shuffle)
                     → vectorized df/idf scorer, local (token, doc_id) sort
                     → bucket-partitioned postings runs  (O2 — no global
                       string sort; columnar pushdown replaces it)

The reference's partial-index spill files + two k-way merges are replaced
by the token-bucket shuffle; byte-offset seek indexes are replaced by
columnar predicate pushdown at query time (S9/S10 obsolete).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..stages.index import (
    tokenize_batch,
    add_page_hash,
    add_token_bucket,
    catalog_batch,
    dedup_decisions,
    make_score_fn,
)


@dataclass
class IndexPaths:
    postings: str
    catalog: str
    duplicates: str
    n_indexed: int


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
    by the caller."""
    os.makedirs(out_dir, exist_ok=True)
    import pyarrow.parquet as _pq

    frag_schema = ray.data.read_parquet(pages_path).schema()
    has_hash = "page_hash" in frag_schema.names

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
    dup_tbl = dedup_decisions(proj_ds)
    dup_map = dict(
        zip(
            dup_tbl.column("seq").to_pylist(), dup_tbl.column("dup_of").to_pylist()
        )
    )
    dup_ref = ray.put(dup_map)

    import numpy as np

    dup_arr_ref = ray.put(
        np.asarray(dup_tbl.column("seq"), dtype=np.int64)
        if dup_tbl.num_rows
        else np.empty(0, dtype=np.int64)
    )

    def _split(batch: pa.Table, want_dups: bool) -> pa.Table:
        dup_arr = ray.get(dup_arr_ref)
        seqs = batch.column("seq").to_numpy(zero_copy_only=False)
        mask = np.isin(seqs, dup_arr)
        if not want_dups:
            mask = ~mask
        return batch.filter(pa.array(mask))

    # duplicates sink: the dedup decision pass already collected the full
    # (seq, url, dup_of) rows driver-side — write them directly, no extra
    # execution over the pages store
    dup_dir = os.path.join(out_dir, "duplicates")
    os.makedirs(dup_dir, exist_ok=True)
    _pq.write_table(
        dup_tbl.select(["seq", "url", "dup_of"]),
        os.path.join(dup_dir, "part-0.parquet"),
    )

    n_indexed = proj_ds.count() - len(dup_map)
    cat_dir = os.path.join(out_dir, "catalog")
    os.makedirs(cat_dir, exist_ok=True)

    # One fused pass over the kept pages: catalog sink rides the tokenize
    # tasks as a side-effect write (retry-stable part names), so the heavy
    # spans column is scanned exactly once.
    # Task-pool tokenize: the Porter memo cache is per worker PROCESS
    # (functions/porter.py), so plain tasks get actor-style amortization
    # without paying an actor-pool startup per index run.
    def _tokenize_catalog(batch: pa.Table) -> pa.Table:
        b = _split(batch, False)
        if b.num_rows == 0:
            return tokenize_batch(b)
        cat = catalog_batch(b)
        part = f"part-{cat.column('doc_id')[0].as_py():012d}.parquet"
        _pq.write_table(cat, os.path.join(cat_dir, part))
        return tokenize_batch(b)

    postings_raw = hashed.map_batches(
        _tokenize_catalog,
        batch_format="pyarrow",
        batch_size=64,
        num_cpus=1,
    )
    scored = (
        postings_raw.map_batches(add_token_bucket, batch_format="pyarrow")
        .groupby("tbucket")
        .map_groups(make_score_fn(n_indexed, min_ngram_df), batch_format="pyarrow")
    )
    post_dir = os.path.join(out_dir, "postings")
    # bucket-partitioned sorted runs (each map_groups output is locally
    # (token, doc_id)-sorted) — no global string sort; see make_score_fn
    scored.write_parquet(post_dir)

    return IndexPaths(
        postings=post_dir,
        catalog=cat_dir,
        duplicates=dup_dir,
        n_indexed=n_indexed,
    )
