"""Corpus analytics over the testdata ``documents`` / ``embeddings`` tables.

The crawl/index operators (SURVEY.md §2) re-applied to a flat document
corpus, plus the beyond-reference training-data operators (dedup families,
similarity search, text analysis). Every function takes ``sf_dir`` and
returns a Ray Dataset / pyarrow Table; each has a DuckDB oracle in
``__ray_entry__.oracle_sql`` (or is flagged rows-only there).

Determinism contract with the oracles: any float that feeds a comparison,
ranking or output is either (a) integer-ized (milli/e4 fixed point via the
shared ``floor(x*K + 0.5)`` formula — DuckDB ROUND-half-away semantics,
identical in numpy/math.floor) or (b) rounded after exact integer
summation, so Ray's float-sum order can never flip a rank or a hash.

Scale notes (100 TB posture):
- every read prunes columns at the parquet scan;
- per-doc token work is a compiled-regex batch loop feeding *partial*
  (token, count) tables, so the global ``groupby`` shuffles unique tokens
  per batch, not raw token streams (SURVEY.md §7.6 hazard 8);
- pairwise ops (near-dup, ANN) never materialize O(n²): MinHash-LSH buckets
  via ``groupby(band)``, ANN keeps per-batch top-k before the per-query
  merge, and the small side (query matrix / candidate shingles) is
  broadcast once with ``ray.put``.
"""

from __future__ import annotations

import math
import os
import re
import time as _time
from collections import Counter
from typing import Dict, List, Sequence, Tuple

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..stages.util import empty_guard
from ..functions.hashing import (
    minhash_band_keys,
    minhash_signature,
    poly_hash,
    poly_hash_batch,
    shingle_hashes,
    stable_text_digest,
)

# T1 tokenizer applied to a flat text corpus: maximal [a-z0-9] runs over the
# lowercased text (shared/tokenizer.py:27-46 semantics; regex-equivalent).
_TOK_RE = re.compile(r"[a-z0-9]+")
# BPE-ish pretokenizer (GPT-2 style split, simplified to RE2-compatible
# alternation shared verbatim with the DuckDB oracle).
_BPE_RE = re.compile(r"[a-z]+|[0-9]|[^a-z0-9 ]")
_WS_RE = re.compile(r"[^ ]+")

# 5+-digit purely-numeric tokens are dropped (shared/tokenizer.py:54-56).
_LONG_NUM_RE = re.compile(r"[0-9]{5,}$")
_NUM_RE = re.compile(r"[0-9]+$")

STOPWORDS = (
    "the a of and to in is on for with as by at from this that it be are".split()
)

LANG_WORDLISTS: Dict[str, Tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "zu"),
    "en": ("the", "and", "of", "to", "in", "is", "that", "it", "was", "for"),
    "es": ("el", "la", "los", "las", "que", "y", "en", "un", "una", "por"),
    "fr": ("le", "les", "des", "et", "est", "que", "une", "du", "dans", "pour"),
    "zh": ("de", "shi", "le", "zai", "he", "you", "wo", "ta", "men", "zhe"),
}
LANGS = tuple(sorted(LANG_WORDLISTS))  # tie-break order: alphabetical

SEARCH_QUERY_TOKENS = ("data", "stream", "merge", "sort")

NGRAM_MIN_DF = 10           # A5 pruning threshold (indexer/__init__.py:188-190)
JACCARD_THRESHOLD = 0.8     # near-dup acceptance (exact, verified)
MINHASH_PERMS = 128
MINHASH_BANDS = 32          # 4 rows/band: P(catch | j=0.8) ≈ 1 - 5e-8
EMBED_DUP_THRESHOLD = 0.45  # pair threshold for embedding near-dup
ANN_NUM_QUERIES = 8
ANN_TOP_K = 10


def _docs(sf_dir: str, columns: List[str]) -> "ray.data.Dataset":
    return ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=columns
    )


def _emb(sf_dir: str, columns: List[str]) -> "ray.data.Dataset":
    return ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=columns
    )


def _fixed(x: float, scale: int) -> int:
    """Shared fixed-point formula — identical expression in the oracles."""
    return int(math.floor(x * scale + 0.5))


def collect_table(ds: "ray.data.Dataset") -> pa.Table:
    """Materialize a SMALL dataset to one Arrow table (driver-side)."""
    blocks = ray.get(ds.to_arrow_refs())
    tables = [t for t in blocks if t.num_rows]
    if tables:
        return pa.concat_tables(tables)
    # zero-row result: Dataset.schema() is None when no sampled block had
    # rows, but the executed empty blocks still carry the output schema —
    # an empty input table/partition must yield an empty TYPED table, not
    # a crash (normal state on resumed/skewed runs)
    if blocks:
        return blocks[0]
    schema = ds.schema()
    return (
        pa.Table.from_pylist([], schema=schema.base_schema)
        if schema is not None
        else pa.table({})
    )


def _dedup_pairs(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Distinct (doc_a, doc_b) rows — pairs repeat across LSH bands.
    One manual exchange on the packed pair key (doc ids < 2^32, the
    jaccard packing convention) with an in-bucket np.unique — exact
    because a pair's rows are bucket-local."""
    from ..stages.util import bucket_exchange

    def pack(b: pa.Table) -> pa.Table:
        a = np.asarray(b.column("doc_a"), dtype=np.int64)
        d = np.asarray(b.column("doc_b"), dtype=np.int64)
        pk = np.unique((a.astype(np.uint64) << np.uint64(32)) | d.astype(np.uint64))
        return pa.table(
            {
                "pk": pa.array(pk, pa.uint64()),
                "dbucket": pa.array(
                    (pk % np.uint64(_PAIR_BUCKETS)).astype(np.int32), pa.int32()
                ),
            }
        )

    def uniq(tbl: pa.Table) -> pa.Table:
        pk = np.unique(tbl.column("pk").to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "doc_a": pa.array((pk >> np.uint64(32)).astype(np.int64), pa.int64()),
                "doc_b": pa.array(
                    (pk & np.uint64(0xFFFFFFFF)).astype(np.int64), pa.int64()
                ),
            }
        )

    mat = ds.map_batches(pack, batch_format="pyarrow").materialize()
    nb = _proportional_buckets(mat.count())
    if nb < _PAIR_BUCKETS:
        # fold the precomputed bucket ids down to the proportional width
        # (pk % nb keeps every pair bucket-local); only runs on small
        # inputs where the pass is cheap
        def refold(b: pa.Table) -> pa.Table:
            pk = b.column("pk").to_numpy(zero_copy_only=False)
            return b.set_column(
                1,
                "dbucket",
                pa.array((pk % np.uint64(nb)).astype(np.int32), pa.int32()),
            )

        mat = mat.map_batches(refold, batch_format="pyarrow").materialize()
    return bucket_exchange(mat, "dbucket", nb, uniq)


_PAIR_BUCKETS = 256  # coarse shuffle buckets for pair emission


def _proportional_buckets(n_rows: int, rows_per_bucket: int = 4096) -> int:
    """Shuffle-bucket count proportional to input size, capped at
    _PAIR_BUCKETS: a groupby's executor cost grows with groups x blocks,
    so kilobyte-scale inputs shuffle into a handful of groups while
    10^8-row inputs still fan out to the full width. Bucket count never
    changes RESULTS (hash routing only) — only granularity."""
    return max(1, min(_PAIR_BUCKETS, n_rows // rows_per_bucket + 1))


def _emit_run_pairs(
    keys: np.ndarray, docs: np.ndarray, max_run: int = 0
) -> Tuple[np.ndarray, np.ndarray]:
    """All (doc_a < doc_b) pairs of docs sharing a key, vectorized.

    Sorts by (key, doc); equal-key runs emit their doc combinations via
    triu indices. The per-run Python loop touches only runs with >1 doc
    (bounded by bucket skew, not corpus size).

    ``max_run`` > 0 SKIPS runs longer than it — the df-cap on hot keys
    that bounds emission at O(cap·rows) instead of O(rows²) when a
    boilerplate key is shared by a large doc population."""
    if len(keys) == 0:
        return (np.empty(0, np.int64), np.empty(0, np.int64))
    order = np.lexsort((docs, keys))
    k, d = keys[order], docs[order]
    # run boundaries over equal keys
    starts = np.flatnonzero(np.concatenate(([True], k[1:] != k[:-1])))
    ends = np.concatenate((starts[1:], [len(k)]))
    a_parts, b_parts = [], []
    for s, e in zip(starts, ends):
        c = e - s
        if c < 2 or (max_run and c > max_run):
            continue
        ii, jj = np.triu_indices(c, 1)
        run = d[s:e]
        a_parts.append(run[ii])
        b_parts.append(run[jj])
    if not a_parts:
        return (np.empty(0, np.int64), np.empty(0, np.int64))
    a = np.concatenate(a_parts).astype(np.int64)
    b = np.concatenate(b_parts).astype(np.int64)
    keep = a < b  # drop self-pairs if a doc repeats within a run
    return (a[keep], b[keep])


def _pair_table(a: np.ndarray, b: np.ndarray) -> pa.Table:
    return pa.table(
        {"doc_a": pa.array(a, pa.int64()), "doc_b": pa.array(b, pa.int64())}
    )


def tokens_of(text: str) -> List[str]:
    return _TOK_RE.findall(text.lower())


# ---------------------------------------------------------------------------
# A1/A2 analytics on the document corpus
# ---------------------------------------------------------------------------


@empty_guard("documents", token=pa.string(), count=pa.int64())
def word_frequencies(sf_dir: str) -> "ray.data.Dataset":
    """A1 global word-frequency sum (worker.py:93-97): per-batch Counter
    partials, then ONE manual token-hash exchange — the shuffle carries
    unique tokens per batch only."""
    from ..stages.util import exchange_group_agg

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch.column("text").to_pylist():
            c.update(_TOK_RE.findall(t.lower()))
        return pa.table(
            {
                "token": pa.array(list(c.keys()), pa.string()),
                "count": pa.array(list(c.values()), pa.int64()),
            }
        )

    return exchange_group_agg(
        _docs(sf_dir, ["text"]).map_batches(partial, batch_format="pyarrow"),
        ["token"],
        [("count", "sum")],
        nbuck=8,
    )


@empty_guard("documents", doc_id=pa.int64(), n_tokens=pa.int64())
def doc_token_counts(sf_dir: str) -> "ray.data.Dataset":
    """A2 page length per document (worker.py:98)."""

    def counts(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        n = [len(_TOK_RE.findall(t.lower())) for t in texts]
        return pa.table(
            {"doc_id": batch.column("doc_id"), "n_tokens": pa.array(n, pa.int64())}
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(counts, batch_format="pyarrow")


@empty_guard("documents", token=pa.string(), count=pa.int64())
def top_words(sf_dir: str, k: int = 50) -> pa.Table:
    """Top-50-words analytic (crawler checkpoint ordering O1,
    crawler/__init__.py:44): global word frequencies sorted count desc /
    token asc, limit 50. The groupby shrinks the data to unique tokens
    before the sort, so the sort input is small at any corpus scale."""
    ds = (
        word_frequencies(sf_dir)
        .sort(["count", "token"], descending=[True, False])
        .limit(k)
    )
    return collect_table(ds)


@empty_guard("documents", doc_id=pa.int64(), n_tokens=pa.int64())
def longest_pages(sf_dir: str, k: int = 20) -> pa.Table:
    """Longest-page analytic (A2 + O1, crawler/__init__.py:43): per-doc
    token counts sorted length desc / doc_id asc, top 20."""
    ds = (
        doc_token_counts(sf_dir)
        .sort(["n_tokens", "doc_id"], descending=[True, False])
        .limit(k)
    )
    return collect_table(ds)


@empty_guard("documents", host=pa.string(), n_pages=pa.int64())
def subdomain_counts(sf_dir: str) -> "ray.data.Dataset":
    """A7 subdomain counting (north-star re-expression target): pages per
    subdomain host over the deterministically constructed URL corpus
    (same URL builder as url_normalize_validate), counted only for URLs
    that pass the validity chain (M4-M8)."""
    from ray.data.aggregate import Sum

    from ..functions.urls import host_batch, is_valid_batch, normalize_batch

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        raws = _build_raw_urls(ids)
        normd = normalize_batch(raws)
        valid = is_valid_batch(normd, ("example.org",))
        hosts = host_batch(normd)
        c: Counter = Counter(h for h, v in zip(hosts, valid) if v)
        return pa.table(
            {
                "host": pa.array(list(c.keys()), pa.string()),
                "n_pages": pa.array(list(c.values()), pa.int64()),
            }
        )

    return (
        _docs(sf_dir, ["doc_id"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("host")
        .aggregate(Sum("n_pages", alias_name="n_pages"))
    )


# ---------------------------------------------------------------------------
# T3 + A4/A5: n-gram postings with tf-idf
# ---------------------------------------------------------------------------


def _doc_grams(text: str) -> Counter:
    """T3 n-grams with the reference's numeric-token rules
    (shared/tokenizer.py:50-63): unigrams + bigrams + trigrams; 5+-digit
    numeric tokens dropped; an n-gram kept only if at least one member is
    non-numeric."""
    toks = [t for t in _TOK_RE.findall(text.lower()) if not _LONG_NUM_RE.match(t)]
    grams = list(toks)
    isnum = [bool(_NUM_RE.match(t)) for t in toks]
    for i in range(len(toks) - 1):
        if not (isnum[i] and isnum[i + 1]):
            grams.append(toks[i] + " " + toks[i + 1])
    for i in range(len(toks) - 2):
        if not (isnum[i] and isnum[i + 1] and isnum[i + 2]):
            grams.append(toks[i] + " " + toks[i + 1] + " " + toks[i + 2])
    return Counter(grams)


def _postings_tf(sf_dir: str) -> Tuple["ray.data.Dataset", int]:
    n_docs = _docs(sf_dir, ["doc_id"]).count()

    def tf_batch(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        doc_ids, tokens, tfs = [], [], []
        for did, text in zip(ids, texts):
            c = _doc_grams(text)
            doc_ids.extend([did] * len(c))
            tokens.extend(c.keys())
            tfs.extend(c.values())
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "token": pa.array(tokens, pa.string()),
                "tf": pa.array(tfs, pa.int64()),
            }
        )

    tf = _docs(sf_dir, ["doc_id", "text"]).map_batches(tf_batch, batch_format="pyarrow")
    return tf, n_docs


_POSTINGS_CACHE: dict = {}
_MINHASH_PAIRS_CACHE: dict = {}


def _session_cache_key(sf_dir: str) -> tuple:
    """Cache key for materialized datasets: (sf_dir, ray job id). A
    MaterializedDataset holds object refs that die with the Ray session —
    keying on the job id prevents a later session from reading refs owned
    by a dead one. Caveat: regenerating sf_dir's files IN PLACE within one
    session still serves the stale cache (testdata is immutable here)."""
    job = ""
    try:
        if ray.is_initialized():
            job = ray.get_runtime_context().get_job_id() or ""
    except Exception:
        pass
    return (sf_dir, job)


@empty_guard("documents", doc_id=pa.int64(), token=pa.string(), tf=pa.int64(), tf_idf=pa.float64())
def postings_tfidf(sf_dir: str) -> "ray.data.Dataset":
    """A4/A5: df per token, idf = ln(N/df), tf_idf = (1 + ln tf)·idf
    rounded to 3 decimals (indexer/__init__.py:192-198); multi-word tokens
    with df < 10 pruned. The scoring groupby keys on token-hash % 256 —
    every posting of a token still co-locates (df correct), but the Python
    call count is O(buckets), with one vectorized np.unique pass each.

    The materialized postings memoize per sf_dir within a Ray session —
    the reference builds its index once and serves every query from it
    (start_search_engine.py reads index.txt), so repeated query calls
    (search_topk, the driver's per-query runs) reuse the built index
    instead of re-tokenizing the corpus."""
    cached = _POSTINGS_CACHE.get(_session_cache_key(sf_dir))
    if cached is not None:
        return cached
    from ..functions.urls import hash64_batch

    tf, n_docs = _postings_tf(sf_dir)

    def bucketed(batch: pa.Table) -> pa.Table:
        h = hash64_batch(batch.column("token").to_pylist())
        return batch.append_column(
            "tbucket",
            pa.array((h % np.uint64(_PAIR_BUCKETS)).astype(np.int32), pa.int32()),
        )

    import pyarrow.compute as pc

    def score(tbl: pa.Table) -> pa.Table:
        col = tbl.column("token").combine_chunks()
        enc = pc.dictionary_encode(col)
        codes = enc.indices.to_numpy(zero_copy_only=False)
        counts = np.bincount(codes, minlength=len(enc.dictionary))
        dfreq = counts[codes]
        has_space = pc.match_substring(enc.dictionary, " ").to_numpy(
            zero_copy_only=False
        )
        keep = ~(has_space[codes] & (dfreq < NGRAM_MIN_DF))
        tfs = tbl.column("tf").to_numpy(zero_copy_only=False)
        idf = np.log(n_docs / dfreq[keep].astype(np.float64))
        raw = (1.0 + np.log(tfs[keep].astype(np.float64))) * idf
        rounded = np.floor(raw * 1000.0 + 0.5) / 1000.0
        keep_idx = pa.array(np.flatnonzero(keep), pa.int64())
        return pa.table(
            {
                "doc_id": tbl.column("doc_id").combine_chunks().take(keep_idx),
                "token": col.take(keep_idx),
                "tf": pa.array(tfs[keep], pa.int64()),
                "tf_idf": pa.array(rounded, pa.float64()),
            }
        )

    out = (
        tf.map_batches(bucketed, batch_format="pyarrow")
        .groupby("tbucket")
        .map_groups(score, batch_format="pyarrow")
        .materialize()
    )
    _POSTINGS_CACHE[_session_cache_key(sf_dir)] = out
    return out


@empty_guard("documents", doc_id=pa.int64(), score=pa.float64())
def search_topk(sf_dir: str) -> pa.Table:
    """O3/A6 top-5 search for a fixed unigram query: per-doc score = sum of
    matching tf_idf, summed in exact milli-units so ranking is
    order-independent (start_search_engine.py:99-115 + :75)."""
    from ray.data.aggregate import Sum

    import pyarrow.compute as pc

    postings = postings_tfidf(sf_dir)
    query_arr = pa.array(list(SEARCH_QUERY_TOKENS), pa.string())

    def to_milli(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.is_in(batch.column("token"), value_set=query_arr))
        milli = np.floor(
            b.column("tf_idf").to_numpy(zero_copy_only=False) * 1000.0 + 0.5
        ).astype(np.int64)
        return pa.table(
            {"doc_id": b.column("doc_id"), "milli": pa.array(milli, pa.int64())}
        )

    scores = (
        postings.map_batches(to_milli, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Sum("milli", alias_name="score_milli"))
        .sort(["score_milli", "doc_id"], descending=[True, False])
        .limit(5)
    )
    tbl = collect_table(scores)
    score = np.asarray(tbl.column("score_milli"), dtype=np.float64) / 1000.0
    return pa.table(
        {
            "doc_id": tbl.column("doc_id"),
            "score": pa.array(score, pa.float64()),
        }
    )


BM25_K1 = 1.2
BM25_B = 0.75


@empty_guard("documents", doc_id=pa.int64(), score_milli=pa.int64())
def search_topk_bm25(sf_dir: str) -> pa.Table:
    """Okapi BM25 top-5 for the fixed query — the modern ranking
    counterpart to the reference's (1+ln tf)·ln(N/df) scorer, kept as a
    first-class query so both ranking families are driver-checked.

    Lucene-style non-negative idf: ln((N-df+0.5)/(df+0.5)+1); per-term
    scores round to exact milli units before the integer doc sum, so
    ranking is block-layout-independent and the SQL oracle replays the
    identical floating-point expression shape.

    Scale shape: ONE streaming tokenize pass over the corpus emits the
    (doc, query-term, tf, dl) rows — postings for the 4 query terms,
    never the full vocabulary — plus one sentinel row per BATCH
    (doc_id=-1, token='') carrying that batch's (n_docs, Σdl) partials,
    so N/avgdl cost no extra scan; then a tiny per-term df aggregate
    (driver-side: 4 rows) and ONE narrow groupby(doc).sum."""

    import pyarrow.compute as pc

    query = list(SEARCH_QUERY_TOKENS)

    def term_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        d_out, t_out, tf_out, dl_out = [], [], [], []
        dl_sum = 0
        for did, text in zip(ids, texts):
            toks = _TOK_RE.findall(text.lower())
            dl = len(toks)
            dl_sum += dl
            c = Counter(t for t in toks if t in query)
            for t, tf in c.items():
                d_out.append(did)
                t_out.append(t)
                tf_out.append(tf)
                dl_out.append(dl)
        # per-batch corpus-stats sentinel: tf = docs in batch, dl = Σdl
        d_out.append(-1)
        t_out.append("")
        tf_out.append(len(ids))
        dl_out.append(dl_sum)
        return pa.table(
            {
                "doc_id": pa.array(d_out, pa.int64()),
                "token": pa.array(t_out, pa.string()),
                "tf": pa.array(tf_out, pa.int64()),
                "dl": pa.array(dl_out, pa.int64()),
            }
        )

    docs = _docs(sf_dir, ["doc_id", "text"])
    matches_all = docs.map_batches(term_rows, batch_format="pyarrow").materialize()

    # per-block (df, N, Σdl) partials in ONE pass: each (doc, term) pair
    # is one row, so a block's rows-per-token IS its df contribution; the
    # sentinel row carries the block's doc-count/length partials. Collect
    # is O(blocks × terms) — tiny at any corpus size.
    def _summaries(b: pa.Table) -> pa.Table:
        sent = pc.equal(b.column("token"), "")
        real = b.filter(pc.invert(sent))
        s = b.filter(sent)
        toks, cnts = np.unique(
            np.asarray(real.column("token")), return_counts=True
        )
        return pa.table(
            {
                "token": pa.array(list(toks) + [""], pa.string()),
                "n": pa.array(
                    list(cnts.astype(np.int64))
                    + [int(pc.sum(s.column("tf")).as_py() or 0)],
                    pa.int64(),
                ),
                "dl": pa.array(
                    [0] * len(toks)
                    + [int(pc.sum(s.column("dl")).as_py() or 0)],
                    pa.int64(),
                ),
            }
        )

    summ = collect_table(
        matches_all.map_batches(
            _summaries, batch_format="pyarrow", batch_size=None
        )
    )
    sent_mask = pc.equal(summ.column("token"), "")
    stats = summ.filter(sent_mask)
    n_docs = int(pc.sum(stats.column("n")).as_py() or 0)
    avgdl = float(pc.sum(stats.column("dl")).as_py() or 0) / float(n_docs)
    df: dict = {}
    for r in summ.filter(pc.invert(sent_mask)).to_pylist():
        df[r["token"]] = df.get(r["token"], 0.0) + float(r["n"])
    n_f = float(n_docs)

    # score + per-doc sum + local top-5 per BLOCK: term_rows emits each
    # doc's rows into one output block and batch_size=None maps 1:1 over
    # those materialized blocks, so a per-doc integer sum is exact
    # in-block (partitioning assumption: doc rows never straddle blocks —
    # holds by construction, NOT for arbitrary re-batched input). The
    # former groupby(doc).sum + global sort AllToAlls become a driver
    # merge over blocks × 5 candidate rows.
    def score_top(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.not_equal(batch.column("token"), ""))
        tfs = batch.column("tf").to_numpy(zero_copy_only=False).astype(np.float64)
        dls = batch.column("dl").to_numpy(zero_copy_only=False).astype(np.float64)
        dfs = np.asarray(
            [df[t] for t in batch.column("token").to_pylist()], dtype=np.float64
        )
        idf = np.log((n_f - dfs + 0.5) / (dfs + 0.5) + 1.0)
        raw = idf * (tfs * (BM25_K1 + 1.0)) / (
            tfs + BM25_K1 * ((1.0 - BM25_B) + BM25_B * dls / avgdl)
        )
        milli = np.floor(raw * 1000.0 + 0.5).astype(np.int64)
        doc = np.asarray(batch.column("doc_id"), dtype=np.int64)
        uniq, inv = np.unique(doc, return_inverse=True)
        sums = np.bincount(inv, weights=milli.astype(np.float64)).astype(np.int64)
        top = np.lexsort((uniq, -sums))[:5]
        return pa.table(
            {
                "doc_id": pa.array(uniq[top], pa.int64()),
                "score_milli": pa.array(sums[top], pa.int64()),
            }
        )

    cands = collect_table(
        matches_all.map_batches(
            score_top, batch_format="pyarrow", batch_size=None
        )
    )
    doc = np.asarray(cands.column("doc_id"), dtype=np.int64)
    sm = np.asarray(cands.column("score_milli"), dtype=np.int64)
    top = np.lexsort((doc, -sm))[:5]
    return pa.table(
        {
            "doc_id": pa.array(doc[top], pa.int64()),
            "score_milli": pa.array(sm[top], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# Text analysis: quality, language-ID, token counting, fingerprints
# ---------------------------------------------------------------------------


@empty_guard("documents", doc_id=pa.int64(), n_chars=pa.int64(), n_tokens=pa.int64(), n_stopwords=pa.int64(), n_numeric=pa.int64(), n_unique=pa.int64())
def quality_scores(sf_dir: str) -> "ray.data.Dataset":
    """Quality-signal columns as exact integers (no float ratios → no
    rounding drift): chars, tokens, stopwords, numeric tokens, distinct
    tokens."""
    stop = frozenset(STOPWORDS)

    def score(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        n_chars, n_tok, n_stop, n_num, n_uniq = [], [], [], [], []
        for t in texts:
            toks = _TOK_RE.findall(t.lower())
            n_chars.append(len(t))
            n_tok.append(len(toks))
            n_stop.append(sum(1 for x in toks if x in stop))
            n_num.append(sum(1 for x in toks if _NUM_RE.match(x)))
            n_uniq.append(len(set(toks)))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_chars": pa.array(n_chars, pa.int64()),
                "n_tokens": pa.array(n_tok, pa.int64()),
                "n_stopwords": pa.array(n_stop, pa.int64()),
                "n_numeric": pa.array(n_num, pa.int64()),
                "n_unique": pa.array(n_uniq, pa.int64()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(score, batch_format="pyarrow")


@empty_guard("documents", doc_id=pa.int64(), de_hits=pa.int64(), en_hits=pa.int64(), es_hits=pa.int64(), fr_hits=pa.int64(), zh_hits=pa.int64(), pred_lang=pa.string())
def lang_profile(sf_dir: str) -> "ray.data.Dataset":
    """Stopword-hit language-ID heuristic: per-language hit counts plus the
    argmax (ties broken by language code, ascending)."""
    wordsets = {lang: frozenset(ws) for lang, ws in LANG_WORDLISTS.items()}

    def profile(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        hits = {lang: [] for lang in LANGS}
        preds = []
        for t in texts:
            toks = _TOK_RE.findall(t.lower())
            best_lang, best_hits = None, -1
            for lang in LANGS:
                h = sum(1 for x in toks if x in wordsets[lang])
                hits[lang].append(h)
                if h > best_hits:
                    best_lang, best_hits = lang, h
            preds.append(best_lang)
        cols = {"doc_id": batch.column("doc_id")}
        for lang in LANGS:
            cols[f"{lang}_hits"] = pa.array(hits[lang], pa.int64())
        cols["pred_lang"] = pa.array(preds, pa.string())
        return pa.table(cols)

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(profile, batch_format="pyarrow")


@empty_guard("documents", doc_id=pa.int64(), n_ws_tokens=pa.int64(), n_bpe_tokens=pa.int64())
def token_count_bpe(sf_dir: str) -> "ray.data.Dataset":
    """Token counting two ways: whitespace tokens and a BPE-ish regex
    pretokenizer (same RE2-compatible pattern as the oracle)."""

    def count(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        n_ws = [len(_WS_RE.findall(t)) for t in texts]
        n_bpe = [len(_BPE_RE.findall(t.lower())) for t in texts]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_ws_tokens": pa.array(n_ws, pa.int64()),
                "n_bpe_tokens": pa.array(n_bpe, pa.int64()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(count, batch_format="pyarrow")


@empty_guard("documents", doc_id=pa.int64(), fingerprint=pa.int64())
def doc_fingerprints(sf_dir: str) -> "ray.data.Dataset":
    """F6 32-bit polynomial rolling hash of the raw text per document
    (indexer/worker.py:138-142 arithmetic, vectorized)."""

    def fp(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "fingerprint": pa.array(
                    [poly_hash(t) for t in texts], pa.int64()
                ),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fp, batch_format="pyarrow")


WINNOW_K = 3  # tokens per gram
WINNOW_W = 4  # grams per selection window


@empty_guard("documents", doc_id=pa.int64(), pos=pa.int64(), fp=pa.int64())
def winnow_fingerprints(sf_dir: str) -> "ray.data.Dataset":
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003
    — the MOSS selection rule): hash every ``WINNOW_K``-token gram, then
    for each window of ``WINNOW_W`` consecutive gram hashes select the
    RIGHTMOST minimum; the distinct selected (pos, fp) pairs are the
    document's fingerprint set. Guarantees: any shared substring of
    ≥ w+k−1 tokens yields a shared fingerprint, and consecutive
    selections are ≤ w positions apart — the local-fingerprint sketch
    robust substring matching builds on (vs ``doc_fingerprints``' single
    whole-document rolling hash).

    Docs with < k tokens are absent; docs with fewer grams than w form
    one window over all their grams. Positions are 1-based gram indices.

    100 TB design: ONE streaming ``map_batches`` pass, zero shuffle —
    each doc's fingerprints depend only on its own text, and output rows
    are bounded by ~n_grams/w per doc (the winnowing density guarantee),
    a strict reduction of the input. The per-doc kernel is numpy:
    sliding-window view + argmin over reversed rows (rightmost-tie) +
    unique; gram hashing reuses the vectorized poly32."""

    def winnow(batch: pa.Table) -> pa.Table:
        out_doc: List[int] = []
        out_pos: List[int] = []
        out_fp: List[int] = []
        for did, txt in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            toks = _TOK_RE.findall((txt or "").lower())
            m = len(toks) - WINNOW_K + 1
            if m < 1:
                continue
            grams = [
                " ".join(toks[i : i + WINNOW_K]) for i in range(m)
            ]
            h = poly_hash_batch(grams).astype(np.int64)
            if m <= WINNOW_W:
                # single window over all grams: rightmost min
                sel = np.array([m - 1 - int(np.argmin(h[::-1]))], np.int64)
            else:
                sw = np.lib.stride_tricks.sliding_window_view(h, WINNOW_W)
                # argmin on the reversed rows = rightmost minimum
                idx = WINNOW_W - 1 - np.argmin(sw[:, ::-1], axis=1)
                sel = np.unique(np.arange(len(sw), dtype=np.int64) + idx)
            out_doc.extend([did] * len(sel))
            out_pos.extend((sel + 1).tolist())  # 1-based gram positions
            out_fp.extend(h[sel].tolist())
        return pa.table(
            {
                "doc_id": pa.array(out_doc, pa.int64()),
                "pos": pa.array(out_pos, pa.int64()),
                "fp": pa.array(out_fp, pa.int64()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        winnow, batch_format="pyarrow"
    )


WINNOW_PAIR_CAP = 64  # hot-fingerprint guard: skip fps in > cap docs
WINNOW_MIN_SHARED = 3


@empty_guard(
    "documents", doc_a=pa.int64(), doc_b=pa.int64(), n_shared=pa.int64()
)
def winnow_pairs(
    sf_dir: str,
    cap: int = WINNOW_PAIR_CAP,
    min_shared: int = WINNOW_MIN_SHARED,
) -> "ray.data.Dataset":
    """MOSS match step on top of :func:`winnow_fingerprints`: candidate
    near-dup pairs = documents sharing ≥ ``min_shared`` distinct selected
    fingerprints, with the count as the match score. Fingerprints
    selected by > ``cap`` documents are skipped (the df-cap guard every
    banded/bucketed dedup op in this repo uses — a boilerplate gram
    shared by everything generates O(n²) pairs and zero signal; the
    oracle applies the identical HAVING cap, so the cut is exact, not
    approximate).

    100 TB design: two narrow exchanges, never all-pairs over the corpus
    — (1) fingerprint rows route by fp-hash; each bucket's per-fp
    segments emit pairs only for 2..cap-doc segments (≤ C(cap,2) pairs
    per fingerprint); (2) the (doc_a, doc_b, 1) partials sum in a pair
    exchange and gate at ``min_shared``. Per-doc fingerprint sets are
    already distinct within a batch because a document never splits
    across batches."""

    fps = winnow_fingerprints(sf_dir)

    def distinct_per_doc(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy(zero_copy_only=False)
        f = batch.column("fp").to_numpy(zero_copy_only=False)
        keys = (d.astype(np.uint64) << np.uint64(32)) | f.astype(np.uint64)
        _, idx = np.unique(keys, return_index=True)
        bucket = (f[idx].astype(np.uint64) % np.uint64(32)).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(d[idx], pa.int64()),
                "fp": pa.array(f[idx], pa.int64()),
                "__fbucket": pa.array(bucket, pa.int64()),
            }
        )

    def emit_pairs(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table(
                {
                    "doc_a": pa.array([], pa.int64()),
                    "doc_b": pa.array([], pa.int64()),
                    "n_shared": pa.array([], pa.int64()),
                }
            )
        d = group.column("doc_id").to_numpy(zero_copy_only=False)
        f = group.column("fp").to_numpy(zero_copy_only=False)
        order = np.lexsort((d, f))
        fs, ds = f[order], d[order]
        first = np.concatenate(([True], fs[1:] != fs[:-1]))
        starts = np.flatnonzero(first)
        ends = np.append(starts[1:], len(fs))
        a_out, b_out = [], []
        for s, e in zip(starts, ends):
            n = e - s
            if n < 2 or n > cap:
                continue
            docs = ds[s:e]  # ascending (lexsort secondary key)
            iu, ju = np.triu_indices(n, k=1)
            a_out.append(docs[iu])
            b_out.append(docs[ju])
        if not a_out:
            return pa.table(
                {
                    "doc_a": pa.array([], pa.int64()),
                    "doc_b": pa.array([], pa.int64()),
                    "n_shared": pa.array([], pa.int64()),
                }
            )
        a = np.concatenate(a_out)
        b = np.concatenate(b_out)
        return pa.table(
            {
                "doc_a": pa.array(a, pa.int64()),
                "doc_b": pa.array(b, pa.int64()),
                "n_shared": pa.array(np.ones(len(a), np.int64), pa.int64()),
            }
        )

    from ..stages.util import bucket_exchange, exchange_group_agg

    pair_partials = bucket_exchange(
        fps.map_batches(distinct_per_doc, batch_format="pyarrow").materialize(),
        "__fbucket",
        32,
        emit_pairs,
    )
    summed = exchange_group_agg(
        pair_partials, ["doc_a", "doc_b"], [("n_shared", "sum")], nbuck=8
    )

    def gate(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(
            pc.greater_equal(batch.column("n_shared"), pa.scalar(min_shared))
        )

    return summed.map_batches(gate, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Dedup family
# ---------------------------------------------------------------------------


@empty_guard("documents", doc_id=pa.int64(), n_copies=pa.int64())
def dedup_exact(sf_dir: str) -> "ray.data.Dataset":
    """Exact dedup: hash-partition on a 128-bit content digest, keep the
    lowest doc_id per group (D2 first-wins made global/deterministic)."""

    def digest(batch: pa.Table) -> pa.Table:
        keys = [d.hex() for d in stable_text_digest(batch.column("text").to_pylist())]
        return pa.table(
            {"doc_id": batch.column("doc_id"), "tkey": pa.array(keys, pa.string())}
        )

    import pyarrow.compute as pc

    from ray.data.aggregate import Count, Min

    def out_types(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.cast(batch.column("doc_id"), pa.int64()),
                "n_copies": pc.cast(batch.column("n_copies"), pa.int64()),
            }
        )

    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(digest, batch_format="pyarrow")
        .groupby("tkey")
        .aggregate(
            Min("doc_id", alias_name="doc_id"),
            Count(alias_name="n_copies"),
        )
        .map_batches(out_types, batch_format="pyarrow")
    )


def _doc_shingle_strings(text: str, k: int = 3) -> frozenset:
    toks = _TOK_RE.findall(text.lower())
    if len(toks) >= k:
        return frozenset(" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1))
    return frozenset([" ".join(toks)]) if toks else frozenset()


def _empty_jaccard() -> pa.Table:
    return pa.table(
        {
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            "jaccard_milli": pa.array([], pa.int64()),
        }
    )


_VERIFY_SCHEMA = pa.schema(
    [
        ("k", pa.int64()),          # routing doc id for this hop
        ("other", pa.int64()),      # the pair's other doc (-1 on set rows)
        ("shingles", pa.list_(pa.uint64())),  # set rows / A-side payload
        ("is_set", pa.bool_()),
        ("vbucket", pa.int32()),
    ]
)


def _verify_pairs_distributed(
    docs: "ray.data.Dataset", candidates: "ray.data.Dataset"
) -> "ray.data.Dataset":
    """Exact-Jaccard verification of candidate pairs WITHOUT driver
    materialization: a two-hop hash-partitioned join of the pairs against
    the per-doc shingle-hash sets (the verdict-prescribed 'join candidate
    pairs back to shingles by doc_id partition').

    hop A: pairs routed to bucket(doc_a) alongside the shingle sets; each
           group attaches A's set to its pairs.
    hop B: those rows routed to bucket(doc_b); each group computes
           |A∩B| / |A∪B| on sorted-unique uint64 hash arrays and keeps
           pairs ≥ the threshold.

    The shingle-set dataset is materialized once (8 bytes/token) and moves
    through two bucket shuffles — O(corpus), never O(pairs²), and the
    driver only ever sees the final verified pairs."""

    def sh_sets(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out = []
        for text in texts:
            toks = _TOK_RE.findall(text.lower())
            out.append(np.unique(shingle_hashes(toks, k=3)))
        return pa.table(
            {
                "k": pa.array(ids, pa.int64()),
                "other": pa.array([-1] * len(ids), pa.int64()),
                "shingles": pa.array(out, pa.list_(pa.uint64())),
                "is_set": pa.array([True] * len(ids), pa.bool_()),
            }
        )

    sets_ds = docs.map_batches(sh_sets, batch_format="pyarrow").materialize()
    n_sets = int(sets_ds.count())
    # data-proportional shuffle: the two verify hops move O(corpus) shingle
    # sets; at bench scale (10^3-10^4 docs) a 256-group sort over 64 tiny
    # blocks is pure executor overhead, so width follows the data
    nb = _proportional_buckets(n_sets, rows_per_bucket=2048)
    n_cpus = int(ray.cluster_resources().get("CPU", 8))
    width = max(1, min(2 * n_cpus, n_sets // 65536 + 1))
    if sets_ds.num_blocks() > 4 * width:
        sets_ds = sets_ds.repartition(width).materialize()

    def _vbucket(batch: pa.Table) -> pa.Table:
        h = np.asarray(batch.column("k"), dtype=np.uint64)
        return batch.append_column(
            "vbucket",
            pa.array((h % np.uint64(nb)).astype(np.int32), pa.int32()),
        )

    def pair_rows(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "doc_a" not in batch.column_names:
            return pa.Table.from_pylist([], schema=_VERIFY_SCHEMA).drop_columns(
                ["vbucket"]
            )
        return pa.table(
            {
                "k": batch.column("doc_a"),
                "other": batch.column("doc_b"),
                "shingles": pa.array(
                    [None] * batch.num_rows, pa.list_(pa.uint64())
                ),
                "is_set": pa.array([False] * batch.num_rows, pa.bool_()),
            }
        )

    def _group_views(group: pa.Table):
        """Columnar views of one bucket group: flat shingle values +
        per-row offsets (zero python conversion of the set payloads) and a
        sorted set-key index for searchsorted pair→set lookup."""
        is_set = group.column("is_set").to_numpy(zero_copy_only=False).astype(bool)
        ks = group.column("k").to_numpy(zero_copy_only=False)
        others = group.column("other").to_numpy(zero_copy_only=False)
        sh = group.column("shingles").combine_chunks()
        vals = sh.values.to_numpy(zero_copy_only=False).astype(np.uint64, copy=False)
        offs = np.asarray(sh.offsets)
        set_idx = np.flatnonzero(is_set)
        order = np.argsort(ks[set_idx], kind="stable")
        set_keys_sorted = ks[set_idx][order]
        set_rows_sorted = set_idx[order]
        pair_idx = np.flatnonzero(~is_set)

        def set_slice(pair_keys: np.ndarray):
            pos = np.searchsorted(set_keys_sorted, pair_keys)
            pos_c = np.clip(pos, 0, max(0, len(set_keys_sorted) - 1))
            found = (
                (set_keys_sorted[pos_c] == pair_keys)
                if len(set_keys_sorted)
                else np.zeros(len(pair_keys), bool)
            )
            return found, set_rows_sorted[pos_c] if len(set_keys_sorted) else pos_c

        return ks, others, vals, offs, pair_idx, set_slice

    def gather_a(group: pa.Table) -> pa.Table:
        ks, others, vals, offs, pair_idx, set_slice = _group_views(group)
        found, src = set_slice(ks[pair_idx])
        out_sh = [
            vals[offs[src[j]] : offs[src[j] + 1]] if found[j] else vals[0:0]
            for j in range(len(pair_idx))
        ]
        return pa.table(
            {
                # route to doc_b's bucket carrying doc_a's set
                "k": pa.array(others[pair_idx], pa.int64()),
                "other": pa.array(ks[pair_idx], pa.int64()),
                "shingles": pa.array(out_sh, pa.list_(pa.uint64())),
                "is_set": pa.array(np.zeros(len(pair_idx), bool), pa.bool_()),
            }
        )

    def verify_b(group: pa.Table) -> pa.Table:
        ks, others, vals, offs, pair_idx, set_slice = _group_views(group)
        found, src = set_slice(ks[pair_idx])
        out_a, out_b, out_j = [], [], []
        for j in np.flatnonzero(found):
            i = pair_idx[j]
            A = vals[offs[i] : offs[i + 1]]
            B = vals[offs[src[j]] : offs[src[j] + 1]]
            inter = len(np.intersect1d(A, B, assume_unique=True))
            union = len(A) + len(B) - inter
            # i/u >= 0.8 as exact integers — no float boundary drift
            if union > 0 and 5 * inter >= 4 * union:
                out_a.append(others[i])
                out_b.append(ks[i])
                out_j.append(_fixed(1000.0 * inter / union, 1))
        return pa.table(
            {
                "doc_a": pa.array(out_a, pa.int64()),
                "doc_b": pa.array(out_b, pa.int64()),
                "jaccard_milli": pa.array(out_j, pa.int64()),
            }
        )

    from ..stages.util import bucket_exchange

    hop_a = bucket_exchange(
        sets_ds.union(candidates.map_batches(pair_rows, batch_format="pyarrow"))
        .map_batches(_vbucket, batch_format="pyarrow")
        .materialize(),
        "vbucket",
        nb,
        gather_a,
    ).materialize()
    return bucket_exchange(
        sets_ds.union(hop_a)
        .map_batches(_vbucket, batch_format="pyarrow")
        .materialize(),
        "vbucket",
        nb,
        verify_b,
    )


def _minhash_verified_pairs(sf_dir: str) -> "ray.data.Dataset":
    """MinHash+LSH near-dup pairs, exact-verified, as a DATASET.

    shingle(3-gram) → 128-perm minhash → 32 band keys → bucketed groupby
    candidate pairs → exact Jaccard ≥ 0.8 on the candidates only.

    The band shuffle groups by a COARSE bucket (band_key64 % 256) rather
    than per band key: the pair kernel re-splits exact equal-key runs
    vectorized inside each bucket group, so there are O(buckets) Python
    calls, not O(unique band keys), and the bucket count follows the data
    (_proportional_buckets). The candidate verify joins shingles by doc_id
    partition (_verify_pairs_distributed) — no driver materialization.

    Memoized per (sf_dir, Ray session): dedup_minhash_lsh AND
    dedup_components consume the same pair graph — without the memo the
    whole LSH+verify pipeline runs once per caller.
    """
    key = _session_cache_key(sf_dir)
    cached = _MINHASH_PAIRS_CACHE.get(key)
    if cached is not None:
        return cached
    n_docs = int(_docs(sf_dir, ["doc_id"]).count())
    nb_sig = _proportional_buckets(n_docs * MINHASH_BANDS)

    def sig_batch(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        n_bands = MINHASH_BANDS
        key_parts, doc_parts = [], []
        for did, text in zip(ids, texts):
            toks = _TOK_RE.findall(text.lower())
            sh = shingle_hashes(toks, k=3)
            sig = minhash_signature(sh, num_perm=MINHASH_PERMS)
            keys = np.fromiter(
                (
                    int.from_bytes(k, "little")
                    for k in minhash_band_keys(sig, num_bands=n_bands)
                ),
                dtype=np.uint64,
                count=n_bands,
            )
            # fold the band index into the key so equal chunks from
            # different bands never collide into one run
            keys ^= np.arange(n_bands, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            key_parts.append(keys)
            doc_parts.append(np.full(n_bands, did, dtype=np.int64))
        keys = np.concatenate(key_parts) if key_parts else np.empty(0, np.uint64)
        docs_col = np.concatenate(doc_parts) if doc_parts else np.empty(0, np.int64)
        return pa.table(
            {
                "key64": pa.array(keys, pa.uint64()),
                "bucket": pa.array(
                    (keys % np.uint64(nb_sig)).astype(np.int32), pa.int32()
                ),
                "doc_id": pa.array(docs_col, pa.int64()),
            }
        )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        a, b = _emit_run_pairs(
            group.column("key64").to_numpy(zero_copy_only=False),
            group.column("doc_id").to_numpy(zero_copy_only=False),
        )
        return _pair_table(a, b)

    from ..stages.util import bucket_exchange

    docs = _docs(sf_dir, ["doc_id", "text"])
    candidates = bucket_exchange(
        docs.map_batches(sig_batch, batch_format="pyarrow").materialize(),
        "bucket",
        nb_sig,
        bucket_pairs,
    )
    # materialize the (near-dup-sized, distributed) candidate pairs so the
    # two verify hops don't re-execute the signature chain
    candidates = _dedup_pairs(candidates).materialize()
    out = _verify_pairs_distributed(docs, candidates).materialize()
    _MINHASH_PAIRS_CACHE[key] = out
    return out


@empty_guard("documents", doc_a=pa.int64(), doc_b=pa.int64(), jaccard_milli=pa.int64())
def dedup_minhash_lsh(sf_dir: str) -> pa.Table:
    """MinHash+LSH near-dup pairs (see `_minhash_verified_pairs`)."""
    tbl = collect_table(_minhash_verified_pairs(sf_dir))
    if tbl.num_rows == 0:
        return _empty_jaccard()
    return tbl.select(["doc_a", "doc_b", "jaccard_milli"])


@ray.remote
def _cc_part_edges(tbl: pa.Table, nbuck: int):
    """Route (src, dst) rows to ``src % nbuck`` slices (modulo — node ids
    are dense doc ids, matching the label-table partition rule)."""
    if nbuck == 1:
        return tbl
    srcs = tbl.column("src").to_numpy(zero_copy_only=False)
    b = (srcs % nbuck).astype(np.int64)
    order = np.argsort(b, kind="stable")
    t = tbl.take(pa.array(order, pa.int64()))
    bounds = np.searchsorted(b[order], np.arange(nbuck + 1))
    return tuple(
        t.slice(int(bounds[i]), int(bounds[i + 1] - bounds[i]))
        for i in range(nbuck)
    )


@ray.remote
def _cc_build_bucket(*parts: pa.Table):
    """One src-bucket: dedup (src, dst), sort by src; also returns the
    bucket's initial label table (node = unique srcs, label = node)."""
    tables = [p for p in parts if p.num_rows]
    if not tables:
        e = pa.table(
            {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
        )
        l = pa.table(
            {"node": pa.array([], pa.int64()), "label": pa.array([], pa.int64())}
        )
        return e, l
    t = pa.concat_tables(tables)
    src = t.column("src").to_numpy(zero_copy_only=False)
    dst = t.column("dst").to_numpy(zero_copy_only=False)
    order = np.lexsort((dst, src))
    s, d = src[order], dst[order]
    m = np.concatenate(([True], (s[1:] != s[:-1]) | (d[1:] != d[:-1])))
    s, d = s[m], d[m]
    uniq = np.unique(s)
    edges = pa.table(
        {"src": pa.array(s, pa.int64()), "dst": pa.array(d, pa.int64())}
    )
    labels = pa.table(
        {"node": pa.array(uniq, pa.int64()), "label": pa.array(uniq, pa.int64())}
    )
    return edges, labels


@ray.remote
def _cc_ptr(L: pa.Table, nbuck: int):
    """Pointer-doubling half of hash-to-min: emit (label -> node) rows for
    node != label, routed to the LABEL's bucket (where label[label] is
    known). The (node -> label) direction carries label[node] = label — a
    no-op message — so only this direction travels."""
    node = L.column("node").to_numpy(zero_copy_only=False)
    lab = L.column("label").to_numpy(zero_copy_only=False)
    nz = node != lab
    srcs, dsts = lab[nz], node[nz]
    if nbuck == 1:
        return pa.table(
            {"src": pa.array(srcs, pa.int64()), "dst": pa.array(dsts, pa.int64())}
        )
    b = (srcs % nbuck).astype(np.int64)
    order = np.argsort(b, kind="stable")
    s2, d2 = srcs[order], dsts[order]
    bounds = np.searchsorted(b[order], np.arange(nbuck + 1))
    return tuple(
        pa.table(
            {
                "src": pa.array(s2[int(bounds[i]) : int(bounds[i + 1])], pa.int64()),
                "dst": pa.array(d2[int(bounds[i]) : int(bounds[i + 1])], pa.int64()),
            }
        )
        for i in range(nbuck)
    )


@ray.remote
def _cc_send(E: pa.Table, L: pa.Table, nbuck: int, *inptr: pa.Table):
    """One round, one src-bucket: attach label[src] to the bucket's static
    edges and incoming pointer rows (sorted searchsorted — labels share
    the % nbuck partition), emit (node, label) messages routed by node."""
    lk = L.column("node").to_numpy(zero_copy_only=False)  # sorted
    lv = L.column("label").to_numpy(zero_copy_only=False)
    srcs = [E.column("src").to_numpy(zero_copy_only=False)]
    dsts = [E.column("dst").to_numpy(zero_copy_only=False)]
    for p in inptr:
        if p.num_rows:
            srcs.append(p.column("src").to_numpy(zero_copy_only=False))
            dsts.append(p.column("dst").to_numpy(zero_copy_only=False))
    s = np.concatenate(srcs)
    d = np.concatenate(dsts)
    if not len(s):
        empty = pa.table(
            {"node": pa.array([], pa.int64()), "label": pa.array([], pa.int64())}
        )
        return tuple(empty for _ in range(nbuck)) if nbuck > 1 else empty
    pos = np.searchsorted(lk, s)  # every src has a label row in its bucket
    msg_lab = lv[pos]
    b = (d % nbuck).astype(np.int64)
    order = np.argsort(b, kind="stable")
    d2, m2 = d[order], msg_lab[order]
    bounds = np.searchsorted(b[order], np.arange(nbuck + 1))
    out = tuple(
        pa.table(
            {
                "node": pa.array(d2[int(bounds[i]) : int(bounds[i + 1])], pa.int64()),
                "label": pa.array(m2[int(bounds[i]) : int(bounds[i + 1])], pa.int64()),
            }
        )
        for i in range(nbuck)
    )
    return out if nbuck > 1 else out[0]


@ray.remote(num_returns=2)
def _cc_min(L: pa.Table, *msgs: pa.Table):
    """One round, one node-bucket: label = min(old label, incoming
    messages); second return is the bucket's label sum (the convergence
    witness — labels only decrease)."""
    nodes = L.column("node").to_numpy(zero_copy_only=False)
    lab = L.column("label").to_numpy(zero_copy_only=False).copy()
    for m in msgs:
        if not m.num_rows:
            continue
        idx = np.searchsorted(nodes, m.column("node").to_numpy(zero_copy_only=False))
        np.minimum.at(lab, idx, m.column("label").to_numpy(zero_copy_only=False))
    out = pa.table(
        {"node": pa.array(nodes, pa.int64()), "label": pa.array(lab, pa.int64())}
    )
    return out, int(lab.sum())


def connected_components(
    edges: "ray.data.Dataset", max_rounds: int = 64
) -> pa.Table:
    """Connected components of an undirected (doc_a, doc_b) edge Dataset
    by distributed min-label propagation; returns the component map as a
    small Arrow table (component-member-sized — the query result itself).

    Hash-to-min (Rastogi et al. 2012, "Finding connected components in
    MapReduce") over raw exchange tasks, the Pregel structure shared with
    `graph.pagerank`: the static (bidirected) edge set is partitioned by
    ``src % B`` ONCE and never moves again; each round is B pointer tasks
    (the label->node doubling rows, routed point-to-point), B send tasks
    (label[src] attached in-bucket by sorted searchsorted, messages routed
    by dst), and B min tasks (np.minimum.at per node). Pointer edges
    double the propagation distance per round, so rounds are
    O(log diameter). Labels only ever decrease, so the int64 sum of all
    labels is a strictly-decreasing convergence witness — the driver sees
    B scalars per round, never the labels. (The former Dataset-op loop
    paid two AllToAll shuffles + a sum execution per round — executor
    latency dominated on query-scale graphs.)
    """

    def both(batch: pa.Table) -> pa.Table:
        a = batch.column("doc_a").to_numpy(zero_copy_only=False)
        b = batch.column("doc_b").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, b]), pa.int64()),
                "dst": pa.array(np.concatenate([b, a]), pa.int64()),
            }
        )

    from ..stages.util import refs_and_counts

    edges_dir = edges.map_batches(both, batch_format="pyarrow").materialize()
    n_edges = int(edges_dir.count())
    if n_edges == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "component_id": pa.array([], pa.int64()),
                "keep": pa.array([], pa.int64()),
                "csize": pa.array([], pa.int64()),
            }
        )
    nbuck = int(max(1, min(_PAIR_BUCKETS, n_edges // 16384 + 1)))
    erefs, _ = refs_and_counts(edges_dir)
    eparts = [
        _cc_part_edges.options(num_returns=nbuck).remote(r, nbuck) for r in erefs
    ]
    if nbuck == 1:
        eparts = [[p] for p in eparts]
    built = [
        _cc_build_bucket.options(num_returns=2).remote(*[pl[b] for pl in eparts])
        for b in range(nbuck)
    ]
    E = [b_[0] for b_ in built]
    L = [b_[1] for b_ in built]

    prev_sum = None
    for _round in range(max_rounds):
        ptrs = [
            _cc_ptr.options(num_returns=nbuck).remote(L[b], nbuck)
            for b in range(nbuck)
        ]
        if nbuck == 1:
            ptrs = [[p] for p in ptrs]
        sends = [
            _cc_send.options(num_returns=nbuck).remote(
                E[b], L[b], nbuck, *[pl[b] for pl in ptrs]
            )
            for b in range(nbuck)
        ]
        if nbuck == 1:
            sends = [[s] for s in sends]
        outs = [
            _cc_min.remote(L[b], *[sl[b] for sl in sends]) for b in range(nbuck)
        ]
        L = [o[0] for o in outs]
        cur_sum = int(sum(ray.get([o[1] for o in outs])))
        if cur_sum == prev_sum:  # labels are non-increasing: fixpoint
            break
        prev_sum = cur_sum
    else:
        raise RuntimeError(f"connected_components: no fixpoint in {max_rounds} rounds")

    tbl = pa.concat_tables(ray.get(L))  # component map == final result (small)
    node = tbl.column("node").to_numpy(zero_copy_only=False)
    comp = tbl.column("label").to_numpy(zero_copy_only=False)
    order = np.argsort(node, kind="stable")
    node, comp = node[order], comp[order]
    _, inv, counts = np.unique(comp, return_inverse=True, return_counts=True)
    return pa.table(
        {
            "doc_id": pa.array(node, pa.int64()),
            "component_id": pa.array(comp, pa.int64()),
            "keep": pa.array((node == comp).astype(np.int64), pa.int64()),
            "csize": pa.array(counts[inv].astype(np.int64), pa.int64()),
        }
    )


@empty_guard("documents", doc_id=pa.int64(), component_id=pa.int64(), keep=pa.int64(), csize=pa.int64())
def dedup_components(sf_dir: str) -> pa.Table:
    """Near-dup clusters over the documents table: connected components of
    the exact-verified MinHash-LSH pair graph (`_minhash_verified_pairs`),
    one row per clustered doc with its component id (= min doc_id in the
    cluster), a keep flag on the canonical doc, and the cluster size —
    the dedup GROUP operator an LLM-data pipeline applies after pairwise
    near-dup detection (keep one doc per cluster, drop the rest)."""
    pairs = _minhash_verified_pairs(sf_dir).select_columns(["doc_a", "doc_b"])
    return connected_components(pairs)


@empty_guard("documents", doc_id=pa.int64(), simhash=pa.int64())
def dedup_simhash(sf_dir: str) -> "ray.data.Dataset":
    """32-bit SimHash (Charikar 2002) with the F6 polynomial token hash so
    the oracle can reproduce it in SQL: bit b set iff
    sum_tokens(tf * sign(bit b of poly_hash(token))) > 0."""

    def sim(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        out = []
        for t in texts:
            c = Counter(_TOK_RE.findall(t.lower()))
            if not c:
                out.append(0)
                continue
            hashes = np.fromiter(
                (poly_hash(tok) for tok in c), dtype=np.uint32, count=len(c)
            )
            weights = np.fromiter(c.values(), dtype=np.int64, count=len(c))
            bits = ((hashes[:, None] >> np.arange(32, dtype=np.uint32)[None, :]) & 1).astype(np.int64)
            scores = ((bits * 2 - 1) * weights[:, None]).sum(axis=0)
            out.append(int((np.uint64(1) << np.arange(32, dtype=np.uint64))[scores > 0].sum()))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "simhash": pa.array(out, pa.int64()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(sim, batch_format="pyarrow")


SHINGLE_DF_CAP = 64  # hot-shingle df cap for pair emission (see docstring)


@empty_guard("documents", doc_a=pa.int64(), doc_b=pa.int64(), jaccard_milli=pa.int64())
def ngram_jaccard_pairs(sf_dir: str) -> pa.Table:
    """Exact n-gram (3-shingle) Jaccard near-dup pairs ≥ 0.8.

    Intersection-counting dataflow (no candidate-verify second pass):
    explode docs to (shingle_hash64, doc_id) rows, emit a (doc_a, doc_b)
    row per SHARED shingle inside coarse bucket groups (vectorized run
    kernel), then ``groupby(pair).count()`` IS |A∩B|; |A∪B| follows from
    the broadcast per-doc set sizes, so jaccard needs no shingle-set
    re-read. The shingle-equality join mirrors the SQL oracle's semi-join;
    equality is on 64-bit blake2b shingle hashes (collision-free in
    practice; the MinHash path is the sub-linear scale variant).

    Hot-shingle df cap: a boilerplate shingle shared by M docs would emit
    M²/2 pair rows, so runs longer than SHINGLE_DF_CAP are skipped —
    emission is O(cap · shingle rows), not O(M²) — and the whole Jaccard
    is computed CONSISTENTLY in the df-pruned shingle space: per-doc set
    sizes count only shingles with df ≤ cap (size partials come out of the
    same bucketed run kernel), so |A∩B| and |A∪B| agree on the universe.
    Standard df-pruning trade, documented for the oracle: a pair is missed
    only if its every shared shingle is boilerplate-hot, and jaccard for
    boilerplate-laden pairs measures their NON-boilerplate similarity —
    the cap never binds on the driver corpus (max shingle df there ≪ 64),
    so the DuckDB oracle stays exact; tests/test_corpus_ops.py pins the
    hot-fixture behavior (cluster pair still found, no M² blowup). Per-doc
    pruned sizes are a (doc, size) table broadcast as SORTED arrays +
    searchsorted (memory O(n_docs), never O(max doc_id)); beyond broadcast
    scale that side becomes the MinHash path's distributed verify join.
    """

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        key_parts, doc_parts = [], []
        for did, text in zip(ids, texts):
            toks = _TOK_RE.findall(text.lower())
            sh = shingle_hashes(toks, k=3)
            if len(sh):
                key_parts.append(sh)
                doc_parts.append(np.full(len(sh), did, dtype=np.int64))
        keys = np.concatenate(key_parts) if key_parts else np.empty(0, np.uint64)
        dids = np.concatenate(doc_parts) if doc_parts else np.empty(0, np.int64)
        return pa.table(
            {
                "key64": pa.array(keys, pa.uint64()),
                "bucket": pa.array(
                    (keys % np.uint64(_PAIR_BUCKETS)).astype(np.int32), pa.int32()
                ),
                "doc_id": pa.array(dids, pa.int64()),
            }
        )

    def runs_kernel(group: pa.Table) -> pa.Table:
        """Per bucket: pair rows for runs 2..cap AND df-pruned per-doc size
        partials (one count per doc over its runs ≤ cap — each run is a
        full global key group, so run length IS the shingle's df)."""
        keys = group.column("key64").to_numpy(zero_copy_only=False)
        docs_col = group.column("doc_id").to_numpy(zero_copy_only=False)
        a, b = _emit_run_pairs(keys, docs_col, max_run=SHINGLE_DF_CAP)
        # pack the pair into one uint64 (assumes doc_id < 2^32; use 128-bit
        # split-key packing for wider id spaces) so the intersection count
        # is a single-key shuffle + np.unique, not a generic two-key agg
        pk = (a.astype(np.uint64) << np.uint64(32)) | b.astype(np.uint64)
        # size partials: membership count over runs with df <= cap
        order = np.lexsort((docs_col, keys))
        ks = keys[order]
        starts = (
            np.flatnonzero(np.concatenate(([True], ks[1:] != ks[:-1])))
            if len(ks)
            else np.empty(0, np.int64)
        )
        ends = np.concatenate((starts[1:], [len(ks)])) if len(ks) else starts
        lens = ends - starts
        runlen = np.repeat(lens, lens)
        keep = runlen <= SHINGLE_DF_CAP
        sdocs, scnt = (
            np.unique(docs_col[order][keep], return_counts=True)
            if len(ks)
            else (np.empty(0, np.int64), np.empty(0, np.int64))
        )
        n_pair, n_size = len(pk), len(sdocs)
        return pa.table(
            {
                "pk": pa.array(
                    np.concatenate((pk, np.zeros(n_size, np.uint64))), pa.uint64()
                ),
                "pbucket": pa.array(
                    np.concatenate(
                        (
                            (pk % np.uint64(_PAIR_BUCKETS)).astype(np.int32),
                            np.full(n_size, -1, np.int32),
                        )
                    ),
                    pa.int32(),
                ),
                "doc_id": pa.array(
                    np.concatenate((np.full(n_pair, -1, np.int64), sdocs)),
                    pa.int64(),
                ),
                "cnt": pa.array(
                    np.concatenate((np.zeros(n_pair, np.int64), scnt)), pa.int64()
                ),
            }
        )

    from ..stages.util import bucket_exchange, exchange_sum_by_key

    docs = _docs(sf_dir, ["doc_id", "text"])
    runs_out = bucket_exchange(
        docs.map_batches(explode, batch_format="pyarrow").materialize(),
        "bucket",
        _PAIR_BUCKETS,
        runs_kernel,
    ).materialize()

    # df-pruned per-doc sizes: small aggregate, broadcast as SORTED id +
    # size arrays (searchsorted lookup — memory O(docs), not O(max id))
    import pyarrow.compute as pc

    def size_only(batch: pa.Table) -> pa.Table:
        mask = pc.greater_equal(batch.column("doc_id"), 0)
        return batch.filter(mask).select(["doc_id", "cnt"])

    size_tbl = collect_table(
        exchange_sum_by_key(
            runs_out.map_batches(size_only, batch_format="pyarrow"),
            "doc_id",
            nbuck=4,
        )
    )
    doc_arr = np.asarray(size_tbl.column("doc_id"), dtype=np.int64)
    sz_arr = np.asarray(size_tbl.column("cnt"), dtype=np.int64)
    order = np.argsort(doc_arr)
    size_ref = ray.put((doc_arr[order], sz_arr[order]))

    def count_jaccard(group: pa.Table) -> pa.Table:
        sm_ids, sm_sz = ray.get(size_ref)
        pk = group.column("pk").to_numpy(zero_copy_only=False)
        uniq, inter = np.unique(pk, return_counts=True)
        a = (uniq >> np.uint64(32)).astype(np.int64)
        b = (uniq & np.uint64(0xFFFFFFFF)).astype(np.int64)
        inter = inter.astype(np.int64)
        sz_a = sm_sz[np.searchsorted(sm_ids, a)]
        sz_b = sm_sz[np.searchsorted(sm_ids, b)]
        union = sz_a + sz_b - inter
        # i/u >= 0.8 as exact integers (5i >= 4u) — no float boundary drift
        ok = (union > 0) & (5 * inter >= 4 * union)
        jm = np.floor(1000.0 * inter[ok] / union[ok] + 0.5).astype(np.int64)
        return pa.table(
            {
                "doc_a": pa.array(a[ok], pa.int64()),
                "doc_b": pa.array(b[ok], pa.int64()),
                "jaccard_milli": pa.array(jm, pa.int64()),
            }
        )

    def pair_only(batch: pa.Table) -> pa.Table:
        mask = pc.greater_equal(batch.column("pbucket"), 0)
        return batch.filter(mask).select(["pk", "pbucket"])

    result = bucket_exchange(
        runs_out.map_batches(pair_only, batch_format="pyarrow").materialize(),
        "pbucket",
        _PAIR_BUCKETS,
        count_jaccard,
    )
    tbl = collect_table(result)
    if tbl.num_rows == 0:
        return _empty_jaccard()
    return tbl.select(["doc_a", "doc_b", "jaccard_milli"])


# ---------------------------------------------------------------------------
# Embedding similarity: near-dup pairs + ANN top-k
# ---------------------------------------------------------------------------


def _list_col_matrix(col) -> np.ndarray:
    """list<float> column → (n, d) float64 matrix via the flat Arrow values
    buffer (no per-row Python lists). Assumes equal-length vectors."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if n == 0:
        return np.empty((0, 0), dtype=np.float64)
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(n, len(flat) // n)


def _load_embedding_matrix(sf_dir: str) -> Tuple[np.ndarray, np.ndarray]:
    """Driver-side load of the (small) embedding side that gets broadcast;
    at 100 TB this side would be the IVF centroid/codebook table instead."""
    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    ids = np.asarray(t.column("vec_id"), dtype=np.int64)
    mat = _list_col_matrix(t.column("embedding"))
    order = np.argsort(ids)
    return ids[order], mat[order]


def _cosine(q: np.ndarray, m: np.ndarray) -> np.ndarray:
    """cos = dot/(|a||b|) in float64 — the oracle's DOUBLE[] formula."""
    dots = q @ m.T
    nq = np.sqrt((q * q).sum(axis=1))
    nm = np.sqrt((m * m).sum(axis=1))
    return dots / (nq[:, None] * nm[None, :])


@empty_guard("embeddings", vec_a=pa.int64(), vec_b=pa.int64(), sim_e4=pa.int64())
def embedding_neardup_pairs(sf_dir: str) -> "ray.data.Dataset":
    """Embedding-cosine near-dup: all pairs (a<b) with cosine ≥ threshold.
    One side streams in batches; the other is a broadcast matrix
    (ray.put once, read per task — never re-shipped per batch)."""
    ids, mat = _load_embedding_matrix(sf_dir)
    ref = ray.put((ids, mat))
    thr = EMBED_DUP_THRESHOLD

    def pairs(batch: pa.Table) -> pa.Table:
        all_ids, all_mat = ray.get(ref)
        bids = np.asarray(batch.column("vec_id"), dtype=np.int64)
        bmat = _list_col_matrix(batch.column("embedding"))
        sims = _cosine(bmat, all_mat)
        # keep only a<b to emit each pair once
        keep = (sims >= thr) & (bids[:, None] < all_ids[None, :])
        bi, aj = np.nonzero(keep)
        sim_e4 = np.floor(sims[bi, aj] * 10000.0 + 0.5).astype(np.int64)
        return pa.table(
            {
                "vec_a": pa.array(bids[bi], pa.int64()),
                "vec_b": pa.array(all_ids[aj], pa.int64()),
                "sim_e4": pa.array(sim_e4, pa.int64()),
            }
        )

    return _emb(sf_dir, ["vec_id", "embedding"]).map_batches(
        pairs, batch_format="pyarrow"
    )


@empty_guard("embeddings", query_id=pa.int64(), vec_id=pa.int64(), sim_e4=pa.int64())
def ann_topk_bruteforce(sf_dir: str) -> "ray.data.Dataset":
    """Brute-force cosine top-k: broadcast query matrix, per-batch matmul,
    per-batch top-k prune, per-query merge via groupby — the baseline the
    IVF variant is measured against."""
    ids, mat = _load_embedding_matrix(sf_dir)
    qmask = ids < ANN_NUM_QUERIES
    q_ids, q_mat = ids[qmask], mat[qmask]
    qref = ray.put((q_ids, q_mat))
    k = ANN_TOP_K

    def score(batch: pa.Table) -> pa.Table:
        qi, qm = ray.get(qref)
        bids = np.asarray(batch.column("vec_id"), dtype=np.int64)
        bmat = _list_col_matrix(batch.column("embedding"))
        sims = _cosine(qm, bmat)  # (nq, nb)
        out_q, out_v, out_s = [], [], []
        for r in range(sims.shape[0]):
            row = sims[r]
            if len(row) > k:
                top = np.argpartition(-row, k)[:k]
            else:
                top = np.arange(len(row))
            out_q.extend([int(qi[r])] * len(top))
            out_v.extend(bids[top].tolist())
            out_s.extend(row[top].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    def topk(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        order = pc.sort_indices(
            group,
            sort_keys=[("sim", "descending"), ("vec_id", "ascending")],
        )
        g = group.take(order[:k])
        sim_e4 = np.floor(
            g.column("sim").to_numpy(zero_copy_only=False) * 10000.0 + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "query_id": g.column("query_id"),
                "vec_id": g.column("vec_id"),
                "sim_e4": pa.array(sim_e4, pa.int64()),
            }
        )

    return (
        _emb(sf_dir, ["vec_id", "embedding"])
        .map_batches(score, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(topk, batch_format="pyarrow")
    )


def _kmeans_centroids(mat: np.ndarray, nlist: int, iters: int = 5) -> np.ndarray:
    """Deterministic spherical k-means (cosine Lloyd iterations): init =
    index-evenly-spaced vectors, assign by max dot with normalized
    centroids, recompute as renormalized means. Pure numpy, no RNG — same
    input → same centroids. At 100 TB the training matrix is a sampled
    subset; here it is the broadcast side."""
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    idx = np.unique(
        np.linspace(0, len(mat) - 1, num=min(nlist, len(mat)), dtype=np.int64)
    )
    cents = norm[idx].copy()
    for _ in range(iters):
        assign = np.argmax(norm @ cents.T, axis=1)
        for j in range(len(cents)):
            members = norm[assign == j]
            if len(members):
                c = members.mean(axis=0)
                nc = np.linalg.norm(c)
                if nc > 0:
                    cents[j] = c / nc
    return cents


def ivf_planned_sim_fraction(sf_dir: str, nlist: int = 16, nprobe: int = 4) -> float:
    """Planned similarity-op fraction of IVF vs brute force (driver-side
    audit): Σ_lists |members| × |queries probing it| / (nq × n). Tests pin
    this ≪ 1 — the compute saving that justifies IVF."""
    ids, mat = _load_embedding_matrix(sf_dir)
    cents = _kmeans_centroids(mat, nlist)
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    assign = np.argmax(norm @ cents.T, axis=1)
    q_norm = norm[ids < ANN_NUM_QUERIES]
    probe = np.argsort(-(q_norm @ cents.T), axis=1)[:, :nprobe]
    ops = sum(
        int((probe == l).any(axis=1).sum()) * int((assign == l).sum())
        for l in range(len(cents))
    )
    return ops / float(len(q_norm) * len(mat))


def ann_topk_ivf(sf_dir: str, nlist: int = 16, nprobe: int = 4) -> "ray.data.Dataset":
    """IVF-flat ANN (scale path): deterministic k-means centroids
    (_kmeans_centroids), batch vectors assigned to lists inside
    map_batches, similarities computed ONLY for (query, member) pairs of
    probed lists — per-batch sim work ≈ nprobe/nlist of brute force
    (measured by ivf_planned_sim_fraction; recall + op-saving pinned in
    tests/test_corpus_ops.py). With nprobe = nlist the output is exactly
    brute-force top-k — the driver-oracle mode (__ray_entry__)."""
    ids, mat = _load_embedding_matrix(sf_dir)
    cents = _kmeans_centroids(mat, nlist)
    qmask = ids < ANN_NUM_QUERIES
    q_ids, q_mat = ids[qmask], mat[qmask]
    q_norm = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)
    probe = np.argsort(-(q_norm @ cents.T), axis=1)[:, :nprobe]
    # inverted probe map: list -> indices of queries probing it
    list_q = [np.nonzero((probe == l).any(axis=1))[0] for l in range(len(cents))]
    bref = ray.put((q_ids, q_mat, cents, list_q))
    k = ANN_TOP_K

    def score(batch: pa.Table) -> pa.Table:
        qi, qm, C, lq = ray.get(bref)
        bids = np.asarray(batch.column("vec_id"), dtype=np.int64)
        bmat = _list_col_matrix(batch.column("embedding"))
        if not len(bids):
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "sim": pa.array([], pa.float64()),
                }
            )
        bnorm = bmat / np.linalg.norm(bmat, axis=1, keepdims=True)
        assign = np.argmax(bnorm @ C.T, axis=1)
        # accumulate per-query candidates over probed members ONLY — the
        # full query × batch sim matrix is never formed
        acc_v: Dict[int, list] = {}
        acc_s: Dict[int, list] = {}
        for l in np.unique(assign):
            qidx = lq[int(l)]
            if not len(qidx):
                continue
            sub = np.nonzero(assign == l)[0]
            sims = _cosine(qm[qidx], bmat[sub])  # (|probing queries|, |members|)
            for r_i, r in enumerate(qidx):
                acc_v.setdefault(int(r), []).append(bids[sub])
                acc_s.setdefault(int(r), []).append(sims[r_i])
        out_q, out_v, out_s = [], [], []
        for r in sorted(acc_v):
            vids = np.concatenate(acc_v[r])
            svals = np.concatenate(acc_s[r])
            top = (
                np.argpartition(-svals, k)[:k]
                if len(svals) > k
                else np.arange(len(svals))
            )
            out_q.extend([int(qi[r])] * len(top))
            out_v.extend(vids[top].tolist())
            out_s.extend(svals[top].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    def topk(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        order = pc.sort_indices(
            group, sort_keys=[("sim", "descending"), ("vec_id", "ascending")]
        )
        g = group.take(order[:k])
        sim_e4 = np.floor(
            g.column("sim").to_numpy(zero_copy_only=False) * 10000.0 + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "query_id": g.column("query_id"),
                "vec_id": g.column("vec_id"),
                "sim_e4": pa.array(sim_e4, pa.int64()),
            }
        )

    return (
        _emb(sf_dir, ["vec_id", "embedding"])
        .map_batches(score, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(topk, batch_format="pyarrow")
    )


def _kmeans_centroids_fp(
    ids: np.ndarray, mat: np.ndarray, nlist: int, iters: int = 1
) -> np.ndarray:
    """Fixed-point (e6-scaled int64) dot-product k-means so the SQL oracle
    can replay centroid training bit-for-bit: init = vectors at
    vec_id = j*(n//nlist), assign by max integer dot (tie → smallest cid,
    np.argmax ≡ ROW_NUMBER ORDER BY dot DESC, cid), update = floor-mean
    (exact in double: |sum| ≪ 2^53). Driver-side on the broadcast side —
    at 100 TB this trains on a sampled subset exactly like
    _kmeans_centroids."""
    X = np.floor(mat * 1e6 + 0.5).astype(np.int64)
    n = len(X)
    step = max(n // nlist, 1)
    init_pos = np.searchsorted(ids, np.arange(min(nlist, n), dtype=np.int64) * step)
    cents = X[init_pos].copy()
    for _ in range(iters):
        assign = np.argmax(X @ cents.T, axis=1)
        for j in range(len(cents)):
            members = X[assign == j]
            if len(members):
                cents[j] = np.floor(
                    members.sum(axis=0, dtype=np.int64) / len(members)
                ).astype(np.int64)
    return cents


@empty_guard("embeddings", query_id=pa.int64(), vec_id=pa.int64(), sim_e4=pa.int64())
def ann_topk_ivf_fp(
    sf_dir: str, nlist: int = 16, nprobe: int = 4, iters: int = 1
) -> "ray.data.Dataset":
    """IVF-flat ANN with a genuinely pruned probe (nprobe < nlist) whose
    every approximation decision — centroid training, list assignment,
    probe selection — is integer fixed-point and replayed bit-exactly by
    the driver's SQL oracle (__ray_entry__ 'ann_topk_ivf'). Candidate
    similarities are exact float64 cosine (the oracle's DOUBLE[] formula),
    computed ONLY for members of probed lists."""
    ids, mat = _load_embedding_matrix(sf_dir)
    cents = _kmeans_centroids_fp(ids, mat, nlist, iters)
    qmask = ids < ANN_NUM_QUERIES
    q_ids, q_mat = ids[qmask], mat[qmask]
    Xq = np.floor(q_mat * 1e6 + 0.5).astype(np.int64)
    qdots = Xq @ cents.T  # (nq, nlist) int64 — exact
    # top-nprobe by dot DESC, cid ASC (stable argsort on -dots keeps
    # smaller cid first on ties, matching the oracle's ROW_NUMBER)
    probe = np.argsort(-qdots, axis=1, kind="stable")[:, :nprobe]
    list_q = [np.nonzero((probe == l).any(axis=1))[0] for l in range(len(cents))]
    bref = ray.put((q_ids, q_mat, cents, list_q))
    k = ANN_TOP_K

    def score(batch: pa.Table) -> pa.Table:
        qi, qm, C, lq = ray.get(bref)
        bids = np.asarray(batch.column("vec_id"), dtype=np.int64)
        if not len(bids):
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "sim": pa.array([], pa.float64()),
                }
            )
        bmat = _list_col_matrix(batch.column("embedding"))
        Xb = np.floor(bmat * 1e6 + 0.5).astype(np.int64)
        assign = np.argmax(Xb @ C.T, axis=1)
        out_q, out_v, out_s = [], [], []
        acc_v: Dict[int, list] = {}
        acc_s: Dict[int, list] = {}
        for l in np.unique(assign):
            qidx = lq[int(l)]
            if not len(qidx):
                continue
            sub = np.nonzero(assign == l)[0]
            sims = _cosine(qm[qidx], bmat[sub])
            for r_i, r in enumerate(qidx):
                acc_v.setdefault(int(r), []).append(bids[sub])
                acc_s.setdefault(int(r), []).append(sims[r_i])
        for r in sorted(acc_v):
            vids = np.concatenate(acc_v[r])
            svals = np.concatenate(acc_s[r])
            top = (
                np.argpartition(-svals, k)[:k]
                if len(svals) > k
                else np.arange(len(svals))
            )
            out_q.extend([int(qi[r])] * len(top))
            out_v.extend(vids[top].tolist())
            out_s.extend(svals[top].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    def topk(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        order = pc.sort_indices(
            group, sort_keys=[("sim", "descending"), ("vec_id", "ascending")]
        )
        g = group.take(order[:k])
        sim_e4 = np.floor(
            g.column("sim").to_numpy(zero_copy_only=False) * 10000.0 + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "query_id": g.column("query_id"),
                "vec_id": g.column("vec_id"),
                "sim_e4": pa.array(sim_e4, pa.int64()),
            }
        )

    return (
        _emb(sf_dir, ["vec_id", "embedding"])
        .map_batches(score, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(topk, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# URL kernel conformance over constructed inputs (M1-M8)
# ---------------------------------------------------------------------------


def _build_raw_urls(ids: Sequence[int]) -> List[str]:
    """Deterministic URL corpus from doc_id (testdata has no URL column);
    the SQL oracles build the identical strings."""
    raws = []
    for d in ids:
        host = f"w{d % 7}.example.org"
        path = f"/s{d % 7}/p{d}"
        m = d % 10
        if m == 0:
            raws.append(f"HTTP://{host}{path}")
        elif m == 1:
            raws.append(f"https://{host}{path}/")
        elif m == 2:
            raws.append(f"https://{host}/%73{d % 7}/p{d}")
        elif m == 3:
            raws.append(f"https://{host}/a/b/a/b")
        elif m == 4:
            raws.append(f"https://{host}{path}.pdf")
        elif m == 5:
            raws.append(f"https://{host}{path}?ical=1")
        elif m == 6:
            raws.append(f"https://{host}{path}?color_filter=red")
        elif m == 7:
            raws.append(f"ftp://{host}{path}")
        elif m == 8:
            raws.append(f"https://ext.other.net{path}")
        else:
            raws.append(f"https://{host}{path}?afg3_page_id=2")
    return raws


@empty_guard("documents", doc_id=pa.int64(), url_norm=pa.string(), valid=pa.bool_())
def url_normalize_validate(sf_dir: str) -> "ray.data.Dataset":
    """Exercise normalize (M1) + the validity chain (M4-M8) on URLs
    constructed deterministically from doc_id (the testdata has no URL
    column); the oracle builds the identical strings in SQL."""
    from ..functions.urls import is_valid_batch, normalize_batch

    def build(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        raws = _build_raw_urls(ids)
        normd = normalize_batch(raws)
        valid = is_valid_batch(normd, ("example.org",))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "url_norm": pa.array(normd, pa.string()),
                "valid": pa.array(valid.tolist(), pa.bool_()),
            }
        )

    return _docs(sf_dir, ["doc_id"]).map_batches(build, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# round-3 additions: per-doc keyword extraction, dedup keep-list, corpus
# profile by (source, lang) — each with a DuckDB oracle in __ray_entry__.


@empty_guard("documents", doc_id=pa.int64(), token=pa.string(), tf_idf=pa.float64(), rank=pa.int64())
def keyword_topk(sf_dir: str, k: int = 3) -> "ray.data.Dataset":
    """Per-document top-k keywords by tf-idf (the per-doc view of A4's
    scores — what a training-data pipeline tags documents with before
    topic bucketing). Rank order: tf_idf milli-units DESC, token ASC —
    integer comparison on both sides, so Ray and SQL rank identically.

    Scale shape: reuses the memoized postings (built once per corpus,
    like the reference's one-time index build); ONE manual hash exchange
    on doc_id co-locates a doc's postings; the per-bucket kernel is a
    single multi-key Arrow sort + vectorized run-rank, no per-doc Python."""
    from ..stages.util import bucket_exchange

    postings = postings_tfidf(sf_dir)
    nbuck = 16

    def add_bucket(b: pa.Table) -> pa.Table:
        d = b.column("doc_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (d * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)
        milli = np.floor(
            b.column("tf_idf").to_numpy(zero_copy_only=False) * 1000.0 + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "token": b.column("token"),
                "milli": pa.array(milli, pa.int64()),
                "kbucket": pa.array(
                    (h % np.uint64(nbuck)).astype(np.int64), pa.int64()
                ),
            }
        )

    def topk(tbl: pa.Table) -> pa.Table:
        out_schema = pa.schema(
            [
                ("doc_id", pa.int64()),
                ("token", pa.string()),
                ("tf_idf", pa.float64()),
                ("rank", pa.int64()),
            ]
        )
        if tbl.num_rows == 0:
            return out_schema.empty_table()
        s = tbl.sort_by(
            [
                ("doc_id", "ascending"),
                ("milli", "descending"),
                ("token", "ascending"),
            ]
        )
        d = s.column("doc_id").to_numpy(zero_copy_only=False)
        first = np.concatenate(([True], d[1:] != d[:-1]))
        starts = np.flatnonzero(first)
        rank = np.arange(len(d), dtype=np.int64) - np.repeat(
            starts, np.diff(np.append(starts, len(d)))
        )
        keep = rank < k
        idx = pa.array(np.flatnonzero(keep), pa.int64())
        return pa.table(
            {
                "doc_id": s.column("doc_id").take(idx),
                "token": s.column("token").take(idx),
                "tf_idf": pa.array(
                    s.column("milli").to_numpy(zero_copy_only=False)[keep]
                    / 1000.0,
                    pa.float64(),
                ),
                "rank": pa.array(rank[keep] + 1, pa.int64()),
            }
        )

    mat = postings.map_batches(add_bucket, batch_format="pyarrow").materialize()
    return bucket_exchange(mat, "kbucket", nbuck, topk)


@empty_guard("documents", doc_id=pa.int64())
def dedup_keep_list(sf_dir: str) -> "ray.data.Dataset":
    """Documents SURVIVING near-dup removal: one doc per MinHash cluster
    (the component min) plus every unclustered doc — the actual output a
    dedup stage hands to training (D2 applied corpus-wide, the keep side
    of dedup_components). The removed set (clustered docs minus their
    canonical) is proportional to dup clusters, not corpus size, so it is
    broadcast once via ray.put and each batch anti-filters with a sorted
    searchsorted — beyond broadcast scale this side becomes a bucketed
    anti-join on doc_id (stages/join.py pattern), same semantics."""
    comp = dedup_components(sf_dir)
    node = comp.column("doc_id").to_numpy(zero_copy_only=False)
    root = comp.column("component_id").to_numpy(zero_copy_only=False)
    removed_ref = ray.put(np.sort(node[node != root]))

    def keep(batch: pa.Table) -> pa.Table:
        removed = ray.get(removed_ref)
        d = batch.column("doc_id").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(removed, d)
        hit = (pos < len(removed)) & (removed[np.minimum(pos, max(len(removed) - 1, 0))] == d) if len(removed) else np.zeros(len(d), bool)
        return pa.table({"doc_id": pa.array(d[~hit], pa.int64())})

    return _docs(sf_dir, ["doc_id"]).map_batches(keep, batch_format="pyarrow")


@empty_guard("documents", source=pa.string(), lang=pa.string(), n_docs=pa.int64(), sum_chars=pa.int64(), max_chars=pa.int64())
def source_stats(sf_dir: str) -> "ray.data.Dataset":
    """Corpus profile per (source, lang): doc count, total/max chars —
    the partition-level accounting report a 100 TB ingest runs first.
    Batch-local combine (one Arrow group_by per block) then ONE manual
    exchange on the composite string key; the shuffle carries at most
    |sources|×|langs| rows per block."""
    from ..stages.util import exchange_group_agg

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["source", "lang"]).aggregate(
            [("n_chars", "sum"), ("n_chars", "max"), ("doc_id", "count")]
        )
        return pa.table(
            {
                "source": g.column("source"),
                "lang": g.column("lang"),
                "n_docs": g.column("doc_id_count").cast(pa.int64()),
                "sum_chars": g.column("n_chars_sum"),
                "max_chars": g.column("n_chars_max"),
            }
        )

    return exchange_group_agg(
        _docs(sf_dir, ["doc_id", "source", "lang", "n_chars"]).map_batches(
            partial, batch_format="pyarrow"
        ),
        ["source", "lang"],
        [("n_docs", "sum"), ("sum_chars", "sum"), ("max_chars", "max")],
        nbuck=4,
    )
