"""Index build pipeline: crawl pages → postings + catalog + duplicates.

Dataflow (all Ray Data; see stages/index.py for reference citations):

    pages (wave-partitioned parquet; page_hash stored at crawl time)
      ├─ PASS 1 (pruned columns: page_hash, seq, url + gates):
      │    filter status==200 ∧ is_html ∧ ≤10MB         (M11 + size gate)
      │    → coarse-bucket groupby(page_hash % 256)      (D2, global)
      │    → vectorized first-wins run kernel → dup rows
      │         └─ duplicates sink: seq-sorted distributed parquet
      └─ PASS 2 (full rows, spans scanned exactly once):
           filter gates → drop dup seqs (range-pushdown anti-join against
             the sorted duplicates store; dup volume never aggregates in
             one process)
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
    import numpy as np

    # duplicates sink: the dup-decision DATASET is sorted by seq and
    # written distributed (sorted runs → row-group stats), becoming the
    # probe side of a range-pushdown anti-join — no driver collection, no
    # broadcast array; dup volume can be 25-40 % of the corpus and never
    # touches one process.
    dup_dir = os.path.join(out_dir, "duplicates")
    os.makedirs(dup_dir, exist_ok=True)
    dedup_decisions(proj_ds).sort("seq").write_parquet(dup_dir)
    n_dups = sum(
        _pq.ParquetFile(os.path.join(dup_dir, f)).metadata.num_rows
        for f in os.listdir(dup_dir)
        if f.endswith(".parquet")
    )

    n_indexed = proj_ds.count() - n_dups
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
    # GRID: the groupby's sort-shuffle creates (map blocks x reduce
    # partitions) sub-objects, and at ~500 blocks (batch 64 over 31.5k
    # pages) the ~250k tiny shuffle objects put gigabytes of block
    # metadata in the driver. 256 pages/batch keeps a task's postings
    # under ~50 MB while cutting the grid 16x.
    tok_batch = int(os.environ.get("WCSE_TOKENIZE_BATCH", 256))
    postings_raw = hashed.map_batches(
        _tokenize_catalog,
        batch_format="pyarrow",
        batch_size=tok_batch,
        num_cpus=1,
    ).map_batches(add_token_bucket, batch_format="pyarrow")
    from ..stages.index import _TOKEN_BUCKETS
    from ..stages.util import bucket_exchange

    if os.environ.get("WCSE_INDEX_SHUFFLE", "exchange") == "exchange":
        # MANUAL hash exchange (stages/util.py bucket_exchange): Ray's
        # sort-based groupby shuffle spends ~460 s CPU sorting +
        # merge-sorting the 129M-row string postings just to co-locate
        # 256 integer bucket values; the exchange does one integer argsort
        # + gather per map block and a concat per reduce bucket.
        postings_mat = postings_raw.materialize()
        scored = bucket_exchange(
            postings_mat,
            "tbucket",
            _TOKEN_BUCKETS,
            make_score_fn(n_indexed, min_ngram_df),
        )
    else:  # A/B leg: Ray Data sort-based shuffle
        scored = postings_raw.groupby("tbucket").map_groups(
            make_score_fn(n_indexed, min_ngram_df), batch_format="pyarrow"
        )
    post_dir = os.path.join(out_dir, "postings")
    # bucket-partitioned sorted runs (each reduce output is locally
    # (token, doc_id)-sorted) — no global string sort; see make_score_fn
    scored.write_parquet(post_dir)

    return IndexPaths(
        postings=post_dir,
        catalog=cat_dir,
        duplicates=dup_dir,
        n_indexed=n_indexed,
    )
