"""Index build pipeline: crawl pages → postings + catalog + duplicates.

Dataflow (all Ray Data; see stages/index.py for reference citations):

    pages (wave-partitioned parquet from the crawl)
      └─ filter: status==200 ∧ is_html ∧ ≤10MB         (M11 + size gate)
      └─ map_batches(add_page_hash)                     (F6)
      └─ groupby(page_hash).map_groups(first_wins)      (D2, global)
            ├─ duplicates sink
            └─ kept pages
                 ├─ map_batches(catalog_batch) → catalog sink (S8)
                 └─ map_batches(TokenizeStage, actor pool) → (token,doc_id,tf)
                      └─ groupby(token).map_groups(score(N)) (A4/A5)
                           └─ sort(token, doc_id) → postings sink (O2)

The reference's partial-index spill files + two k-way merges are replaced
by the token-range shuffle; byte-offset seek indexes are replaced by
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
    pages = ray.data.read_parquet(pages_path)

    valid = pages.map_batches(_valid_pages, batch_format="pyarrow")
    hashed = valid.map_batches(add_page_hash, batch_format="pyarrow").materialize()

    # D2 dedup decision on the PROJECTED (page_hash, seq) pair only — the
    # heavy spans column never enters the dedup shuffle. Coarse buckets keep
    # the group count at O(buckets); the per-bucket kernel is vectorized.
    dup_tbl = dedup_decisions(hashed)
    dup_map = dict(
        zip(
            dup_tbl.column("seq").to_pylist(), dup_tbl.column("dup_of").to_pylist()
        )
    )
    dup_ref = ray.put(dup_map)

    def _split(batch: pa.Table, want_dups: bool) -> pa.Table:
        dm = ray.get(dup_ref)
        seqs = batch.column("seq").to_pylist()
        mask = pa.array([(s in dm) == want_dups for s in seqs])
        return batch.filter(mask)

    def _dup_rows(batch: pa.Table) -> pa.Table:
        dm = ray.get(dup_ref)
        b = _split(batch, True)
        return pa.table(
            {
                "seq": b.column("seq"),
                "url": b.column("url"),
                "dup_of": pa.array(
                    [dm[s] for s in b.column("seq").to_pylist()], pa.int64()
                ),
            }
        )

    dup_dir = os.path.join(out_dir, "duplicates")
    os.makedirs(dup_dir, exist_ok=True)
    if dup_map:
        hashed.map_batches(_dup_rows, batch_format="pyarrow").write_parquet(dup_dir)
    else:  # write_parquet emits nothing for an empty dataset
        import pyarrow.parquet as pq

        pq.write_table(
            pa.Table.from_pylist(
                [],
                schema=pa.schema(
                    [("seq", pa.int64()), ("url", pa.string()), ("dup_of", pa.int64())]
                ),
            ),
            os.path.join(dup_dir, "empty.parquet"),
        )

    kept = hashed.map_batches(
        lambda b: _split(b, False), batch_format="pyarrow"
    )
    n_indexed = hashed.count() - len(dup_map)

    catalog = kept.map_batches(catalog_batch, batch_format="pyarrow")
    cat_dir = os.path.join(out_dir, "catalog")
    catalog.write_parquet(cat_dir)

    # task-pool tokenize: the Porter memo cache is per worker PROCESS
    # (functions/porter.py), so plain tasks get actor-style amortization
    # without paying an actor-pool startup per index run
    postings_raw = kept.map_batches(
        tokenize_batch,
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
    scored.sort(["token", "doc_id"]).write_parquet(post_dir)

    return IndexPaths(
        postings=post_dir,
        catalog=cat_dir,
        duplicates=dup_dir,
        n_indexed=n_indexed,
    )
