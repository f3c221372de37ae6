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
"""

from __future__ import annotations

import math
from typing import Dict

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import poly_hash_batch
from ..functions.postings import dedup_text, doc_term_frequencies, page_title


def add_page_hash(batch: pa.Table) -> pa.Table:
    """Append the reference's 32-bit polynomial hash of the dedup-profile
    text (indexer/worker.py:124-142)."""
    spans_col = batch.column("spans").to_pylist()
    texts = [dedup_text(s or []) for s in spans_col]
    hashes = poly_hash_batch(texts).astype(np.int64)
    return batch.append_column("page_hash", pa.array(hashes, pa.int64()))


def first_wins_dedup(tbl: pa.Table) -> pa.Table:
    """Per page_hash group: keep the lowest doc id (single-process oracle
    semantics); mark the rest with dup_of = kept doc id. Arrow in/out —
    the nested spans column must not round-trip through pandas."""
    import pyarrow.compute as pc

    order = pc.sort_indices(tbl.column("seq"))
    tbl = tbl.take(order)
    kept = tbl.column("seq")[0].as_py()
    dup_of = np.full(tbl.num_rows, kept, dtype=np.int64)
    dup_of[0] = -1
    return tbl.append_column("dup_of", pa.array(dup_of, pa.int64()))


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


def make_score_fn(n_docs: int, min_ngram_df: int = 10):
    """tf-idf per token group: idf = ln(N/df), tf_idf = (1+ln tf)·idf
    rounded to 3 decimals (posting string codec, shared/posting.py:35);
    multi-word tokens with df < min_ngram_df dropped
    (indexer/__init__.py:188-198)."""

    def score(df: pd.DataFrame) -> pd.DataFrame:
        token = df["token"].iloc[0]
        dfreq = len(df)
        if " " in token and dfreq < min_ngram_df:
            return df.iloc[0:0][["token", "doc_id"]].assign(tf_idf=np.float64())
        idf = math.log(n_docs / dfreq)
        out = df.sort_values("doc_id", kind="stable")[["token", "doc_id"]].copy()
        out["tf_idf"] = np.round((1.0 + np.log(df.sort_values("doc_id")["tf"].to_numpy())) * idf, 3)
        return out

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
