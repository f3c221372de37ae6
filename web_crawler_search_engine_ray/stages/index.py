"""Indexer stages: page-hash dedup, tokenize actor pool, tf-idf scoring.

Ray Data re-expression of the inverted indexer (inverted_indexer/indexer/
worker.py + __init__.py):

- the per-worker in-memory postings buffer + spill + two k-way text merges
  (worker.py:48-50,61-115, __init__.py:162-201) disappear — the
  ``groupby("token")`` range shuffle IS the external merge sort;
- per-process first-wins dedup (worker.py:118-122, nondeterministic under
  multiprocessing — SURVEY.md D2) becomes a global
  ``groupby(page_hash) → keep min doc_id``, deterministic and strictly
  stronger; hash-collision semantics preserved (same 32-bit hash);
- tf-idf + n-gram pruning (__init__.py:188-198) run inside
  ``map_groups`` per token with the corpus size N broadcast.

Measured shuffle alternatives (129M postings, 32 CPUs, one box — kept for
the record so the coarse-bucket design isn't "first thing that worked"):
sort-shuffle groupby(token_hash%256) = 77 s end-to-end index build;
``ShuffleStrategy.HASH_SHUFFLE`` = 169 s; a two-pass df-broadcast design
(narrow (hash,cnt) global aggregate + map-only scoring — no full-row
shuffle) did not finish in 800 s because Ray's high-cardinality aggregate
over ~100M distinct keys is far slower than sorting by the 256-value
bucket key; dictionary-encoded token columns ballooned shuffle spill
(round 1, reverted). The 256-bucket key keeps the exchange sort trivial
while still co-locating every posting of a token for exact df.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from ..functions.hashing import poly_hash_batch
from ..functions.postings import doc_term_frequencies, page_title


def add_page_hash(batch: pa.Table) -> pa.Table:
    """Append the reference's 32-bit polynomial hash of the dedup-profile
    text (indexer/worker.py:124-142). The profile join runs columnar
    (functions/text.profile_joined_text_batch ≡ dedup_text per row,
    equivalence-tested) — only the n joined page strings touch Python."""
    from ..functions import text as T

    joined = T.profile_joined_text_batch(batch.column("spans"), T.PROFILE_DEDUP)
    hashes = poly_hash_batch(joined.to_pylist()).astype(np.int64)
    return batch.append_column("page_hash", pa.array(hashes, pa.int64()))


_DEDUP_BUCKETS = 256


def _dup_rows(tbl: pa.Table) -> pa.Table:
    """The ONE first-wins run-detection kernel (lexsort by (page_hash,
    seq), first of each hash run kept, the rest emitted as dup rows) —
    shared by dedup_decisions and write_dup_store so the D2 semantics
    cannot drift between the Dataset-API and manual-exchange paths."""
    h = tbl.column("page_hash").to_numpy(zero_copy_only=False)
    s = tbl.column("seq").to_numpy(zero_copy_only=False)
    order = np.lexsort((s, h))
    hs, ss = h[order], s[order]
    new_run = (
        np.concatenate(([True], hs[1:] != hs[:-1]))
        if len(hs)
        else np.empty(0, bool)
    )
    run_idx = np.cumsum(new_run) - 1
    kept = ss[np.flatnonzero(new_run)][run_idx] if len(hs) else ss
    dup_mask = ~new_run
    dup_idx = pa.array(order[dup_mask], pa.int64())
    return pa.table(
        {
            "seq": pa.array(ss[dup_mask], pa.int64()),
            "url": tbl.column("url").combine_chunks().take(dup_idx),
            "dup_of": pa.array(kept[dup_mask], pa.int64()),
        }
    )


def dedup_decisions(hashed):
    """Global first-wins dup decisions from the PROJECTED (page_hash, seq)
    columns: coarse-bucket shuffle (O(buckets) groups), vectorized run
    detection per bucket. Returns a DATASET of dup rows (seq, url, dup_of)
    — never driver-collected (real web corpora run 25-40 % duplicates, so
    the dup table is not 'small'). The spans payload never moves — the
    dedup shuffle carries 16 bytes/page regardless of page size."""
    proj = hashed.select_columns(["page_hash", "seq", "url"])

    def bucket(b: pa.Table) -> pa.Table:
        h = np.asarray(b.column("page_hash"), dtype=np.int64)
        return b.append_column(
            "bucket",
            pa.array((h % _DEDUP_BUCKETS).astype(np.int32), pa.int32()),
        )

    def dups(tbl: pa.Table) -> pa.Table:
        return _dup_rows(tbl)

    return (
        proj.map_batches(bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(dups, batch_format="pyarrow")
    )


def write_dup_store(proj, dup_dir: str, seq_hint: int) -> tuple:
    """D2 dedup decisions + seq-range-partitioned duplicates store in TWO
    cheap manual exchanges (stages/util.py bucket_exchange) instead of the
    former groupby + global sort + write chain — three Ray AllToAll ops
    whose fixed executor overhead (~7 s at 32 CPUs) dwarfed the kilobytes
    of (page_hash, seq) actually moved on a 30k-page corpus and capped the
    8→32 scaling ratio of the whole index build.

    Exchange 1 keys on page_hash buckets (first-wins run kernel per
    bucket, as dedup_decisions); exchange 2 keys on seq-RANGE buckets and
    its reduce task writes one seq-sorted parquet file per range — so
    every file covers a narrow seq span and dup_seqs_in_range's per-batch
    range filter prunes to O(dups in range) via file/row-group stats,
    exactly what the global sort previously bought. Both widths are
    data-proportional. Returns (n_dups, n_valid).
    """
    import os

    import pyarrow.parquet as _pq

    from .util import bucket_exchange

    os.makedirs(dup_dir, exist_ok=True)
    hint = max(int(seq_hint), 1)
    n_hash_buckets = int(min(_DEDUP_BUCKETS, max(4, hint // 100_000)))
    n_seq_buckets = int(max(1, hint // 250_000))

    def bucket(b: pa.Table) -> pa.Table:
        h = np.asarray(b.column("page_hash"), dtype=np.int64)
        return b.append_column(
            "bucket",
            pa.array((h % n_hash_buckets).astype(np.int32), pa.int32()),
        )

    def dups(tbl: pa.Table) -> pa.Table:
        rows = _dup_rows(tbl)
        dup_seqs = rows.column("seq").to_numpy(zero_copy_only=False)
        return rows.append_column(
            "sbucket",
            pa.array(
                np.minimum(
                    dup_seqs * n_seq_buckets // hint, n_seq_buckets - 1
                ).astype(np.int64),
                pa.int64(),
            ),
        )

    def write_range(tbl: pa.Table) -> pa.Table:
        rows = tbl.num_rows
        if rows:
            import pyarrow.compute as _pc

            tbl = tbl.take(_pc.sort_indices(tbl.column("seq")))
            lo = tbl.column("seq")[0].as_py()
            b = min(lo * n_seq_buckets // hint, n_seq_buckets - 1)
            _pq.write_table(
                tbl,
                os.path.join(dup_dir, f"dups-{b:06d}.parquet"),
                row_group_size=2048,
            )
        return pa.table({"rows": pa.array([rows], pa.int64())})

    mat = proj.map_batches(bucket, batch_format="pyarrow").materialize()
    n_valid = mat.count()
    dup_mat = bucket_exchange(mat, "bucket", n_hash_buckets, dups).materialize()
    counts = bucket_exchange(
        dup_mat, "sbucket", n_seq_buckets, write_range
    ).materialize()
    n_dups = sum(r["rows"] for r in counts.take_all())
    return n_dups, n_valid


_DUP_DS_CACHE: dict = {}


def dup_seqs_in_range(dup_dir: str, lo: int, hi: int) -> np.ndarray:
    """Worker-side range lookup into the seq-sorted duplicates store: the
    distributed anti-join's probe side. Row-group stats prune to the
    batch's seq range, so each tokenize task reads O(dups in range), never
    the whole dup table (and never a driver broadcast).

    The per-process cache keys on the dir's FILE LISTING, not just its
    path: a second build_index into the same out_dir within one Ray
    session rewrites the dup store, and a path-only key would keep
    serving the previous build's dataset (or a sticky empty=True) —
    silently skipping duplicate filtering. Listing a <=n_seq_buckets-file
    dir is microseconds per BATCH, cheap insurance."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    try:
        listing = tuple(sorted(os.listdir(dup_dir)))
    except FileNotFoundError:
        listing = ()
    key = (dup_dir, listing)
    entry = _DUP_DS_CACHE.get(key)
    if entry is None:
        # drop THIS dir's stale generations (other dirs' entries stay live)
        for k in [k for k in _DUP_DS_CACHE if k[0] == dup_dir]:
            del _DUP_DS_CACHE[k]
        try:
            ds = pads.dataset(dup_dir, format="parquet")
            empty = ds.count_rows() == 0
        except (FileNotFoundError, pa.ArrowInvalid):
            ds, empty = None, True
        entry = _DUP_DS_CACHE[key] = (ds, empty)
    ds, empty = entry
    if empty:
        return np.empty(0, dtype=np.int64)
    tbl = ds.to_table(
        columns=["seq"],
        filter=(pc.field("seq") >= lo) & (pc.field("seq") <= hi),
    )
    return tbl.column("seq").to_numpy(zero_copy_only=False).astype(np.int64)


def tokenize_batch(batch: pa.Table) -> pa.Table:
    """Task-pool tokenize: same kernel as TokenizeStage; the Porter memo
    cache lives in the worker process, so repeated tasks reuse it.

    The token column stays PLAIN string. Dictionary-encoding it was tried
    and reverted: Ray's shuffle splits each map block across all reduce
    partitions and every split slice keeps a full copy of its source
    block's vocabulary, so the 'compressed' shuffle ballooned (observed
    ~50 GB of spill vs near-zero for plain strings). Plain columns split
    zero-copy."""
    spans_col = batch.column("spans").to_pylist()
    seqs = batch.column("seq").to_pylist()
    tokens, doc_ids, tfs = [], [], []
    for seq, spans in zip(seqs, spans_col):
        freqs = doc_term_frequencies(spans or [])
        tokens.extend(freqs.keys())
        doc_ids.extend([seq] * len(freqs))
        tfs.extend(freqs.values())
    return pa.Table.from_arrays(
        [
            pa.array(tokens, pa.string()),
            pa.array(doc_ids, pa.int64()),
            pa.array(tfs, pa.int64()),
        ],
        names=["token", "doc_id", "tf"],
    )


class TokenizeStage:
    """Actor-pool map_batches stage: pages -> (token, doc_id, tf) rows.

    Stateful per SURVEY.md ST7: the Porter stemmer memo cache and compiled
    regexes live in the worker process and amortize across batches (the
    reference constructs a PorterStemmer per call, shared/tokenizer.py:51).
    Emits per-(doc, token) aggregated tf — the combiner that keeps the
    token shuffle at ~unique-tokens-per-doc volume (§7.6 hazard 8).
    """

    def __init__(self):
        # touch the stemmer cache so the first batch pays the import, not
        # each call
        from ..functions.porter import stem

        stem("initialization")

    def __call__(self, batch: pa.Table) -> pa.Table:
        # ONE kernel copy: the task-pool path (tokenize_batch) and this
        # actor-pool wrapper must not drift
        return tokenize_batch(batch)


_TOKEN_BUCKETS = 256


def add_token_bucket(batch: pa.Table, n_buckets: int = _TOKEN_BUCKETS) -> pa.Table:
    """Coarse shuffle key for the scoring groupby: token-hash % buckets.
    The bucket groupby co-locates every posting of a token (all that df
    needs) with O(buckets) Python calls instead of O(unique tokens).
    Dictionary-encoded token columns hash only the (small) vocabulary and
    scatter through the index array."""
    from ..functions.urls import hash64_batch

    col = batch.column("token").combine_chunks()
    if pa.types.is_dictionary(col.type):
        vocab_h = hash64_batch(col.dictionary.to_pylist())
        h = vocab_h[col.indices.to_numpy(zero_copy_only=False)]
    else:
        h = hash64_batch(col.to_pylist())
    return batch.append_column(
        "tbucket",
        pa.array((h % np.uint64(n_buckets)).astype(np.int32), pa.int32()),
    )


def make_score_fn(n_docs: int, min_ngram_df: int = 10):
    """tf-idf over one token-hash bucket, vectorized: df per token via
    np.unique inverse mapping; idf = ln(N/df); tf_idf = (1+ln tf)·idf
    rounded to 3 decimals with the engine-wide fixed-point formula
    floor(x·1000 + 0.5)/1000 (shared with every DuckDB oracle — see
    pipelines/corpus.py determinism contract; diverges from the reference
    codec's ``f"{x:.3f}"`` half-even only at exact .0005 ties, a
    measure-zero set for (1+ln tf)·ln(N/df)); multi-word tokens with
    df < min_ngram_df dropped (indexer/__init__.py:188-198)."""

    import pyarrow.compute as pc

    def score(tbl: pa.Table) -> pa.Table:
        col = tbl.column("token").combine_chunks()
        # combine_chunks on dictionary chunks unifies (and dedupes) the
        # vocabularies, so codes are a valid global encoding of the bucket
        enc = col if pa.types.is_dictionary(col.type) else pc.dictionary_encode(col)
        codes = enc.indices.to_numpy(zero_copy_only=False)
        counts = np.bincount(codes, minlength=len(enc.dictionary))
        dfreq = counts[codes]
        has_space = pc.match_substring(enc.dictionary, " ").to_numpy(
            zero_copy_only=False
        )
        keep = ~(has_space[codes] & (dfreq < min_ngram_df))
        kept = np.flatnonzero(keep)
        # local (token, doc_id) sort — with bucket-partitioned output this
        # yields sorted runs whose row-group stats drive predicate
        # pushdown; the global string sort the reference's single-file
        # index needed (O2) is unnecessary in a columnar store. The sort
        # runs as an integer lexsort over dictionary RANKS (tokens are
        # ASCII, so numpy's string order ≡ Arrow's), folded with the keep
        # filter into ONE permutation — the bucket's string column is
        # gathered once, not sorted and not gathered twice (this kernel is
        # memory-bandwidth-bound; string traffic dominated its profile).
        n_uniq = len(enc.dictionary)
        rank = np.empty(n_uniq, np.int64)
        # Arrow C++ sort of the (unique) dictionary — a numpy object-array
        # argsort here costs ~0.6 s per 400k uniques in Python comparisons
        rank[pc.sort_indices(enc.dictionary).to_numpy(zero_copy_only=False)] = (
            np.arange(n_uniq)
        )
        docs = np.asarray(tbl.column("doc_id"), dtype=np.int64)
        perm = kept[np.lexsort((docs[kept], rank[codes[kept]]))]
        tf = tbl.column("tf").to_numpy(zero_copy_only=False).astype(np.float64)[
            perm
        ]
        idf = np.log(n_docs / dfreq[perm].astype(np.float64))
        tf_idf = np.floor((1.0 + np.log(tf)) * idf * 1000.0 + 0.5) / 1000.0
        perm_arr = pa.array(perm, pa.int64())
        # decode post-shuffle: the store and query path use plain strings
        token_out = pc.cast(enc.take(perm_arr), pa.string())
        return pa.table(
            {
                "token": token_out,
                "doc_id": pa.array(docs[perm], pa.int64()),
                "tf_idf": pa.array(tf_idf, pa.float64()),
            }
        )

    return score


def catalog_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, url, title) rows — the crawled.txt catalog (S8,
    indexer/__init__.py:136-160) without byte-seek indexes."""
    spans_col = batch.column("spans").to_pylist()
    urls = batch.column("url").to_pylist()
    seqs = batch.column("seq").to_pylist()
    titles = [page_title(s or [], u) for s, u in zip(spans_col, urls)]
    return pa.Table.from_arrays(
        [
            pa.array([int(s) for s in seqs], pa.int64()),
            pa.array(urls, pa.string()),
            pa.array(titles, pa.string()),
        ],
        names=["doc_id", "url", "title"],
    )
