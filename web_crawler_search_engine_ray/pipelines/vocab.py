"""Vocabulary / tokenizer-training statistics over the document corpus:
the BPE merge-step pair count and distinct-document token co-occurrence.

Both are beyond-reference first-class operators in the LLM-data family
(the reference's tokenizers T1-T5 stop at word/n-gram counting; training
a subword tokenizer or building a co-occurrence graph are the next two
passes a corpus owner runs on the same text). Design for 100 TB:

- ``bpe_pair_counts``: the inner statistic of one BPE training
  iteration — for every corpus word occurrence, count adjacent symbol
  pairs (here: the character-bigram base case, i.e. iteration 0 of the
  merge loop). One streaming ``map_batches`` pass; the per-batch kernel
  is a single numpy pass over the codepoints of all words joined with a
  separator (no per-word Python loop), and the partial each batch emits
  is bounded by the alphabet squared (36² = 1,296 rows for the [a-z0-9]
  tokenizer) regardless of batch size. The only exchange carries those
  constant-size partials.
- ``token_cooccurrence``: document-level co-occurrence counts for the
  top-K df tokens (the statistic under PMI / word-vector windows and
  topic co-occurrence graphs). Pass 1 computes document frequencies
  (per-batch Counter partials -> one token exchange, the
  word_frequencies shape) and takes the global top-K (df desc, token
  asc) — K rows to the driver, broadcast back. Pass 2 streams the
  corpus once more, intersects each document's token set with the
  broadcast top-K, and accumulates pairs into a K×K upper-triangle
  int64 grid per batch — the emitted partial is ≤ K(K-1)/2 rows per
  batch (2,016 at K=64) no matter how many documents the batch holds,
  so the pair exchange is constant-size too. Never all-pairs over the
  vocabulary, never a row per (doc, token) on the wire.

Both oracles replay the exact expression in SQL (same [a-z0-9]+
tokenizer as T1, same top-K tie-break), so the driver hash-checks
values, not just shapes.
"""

from __future__ import annotations

from collections import Counter
from typing import List

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..stages.util import empty_guard, exchange_group_agg
from .corpus import _TOK_RE, _docs, collect_table

__all__ = [
    "bpe_pair_counts",
    "token_cooccurrence",
    "doc_surprisal",
    "bpe_train",
    "bpe_encode_stats",
    "vocab_coverage",
    "doc_bigram_surprisal",
]

# '\n' (codepoint 10) can never appear inside a [a-z0-9]+ token, so it is
# a safe word separator for the fused codepoint scan.
_SEP = 10


def char_pair_counts(words: List[str]) -> pa.Table:
    """Adjacent character-pair counts over ``words`` in one numpy pass:
    join with a separator, pair (c[i], c[i+1]) counts where neither side
    is the separator. Words must not contain '\\n' (the [a-z0-9]+
    tokenizer guarantees it) nor lone surrogates (category Cs — they
    cannot round-trip utf-32, and pa.string() cannot hold them either,
    so they are outside the kernel's domain); property-tested equal to
    the per-word Python loop in tests/test_vocab_ops.py."""
    if not words:
        return pa.table(
            {
                "a": pa.array([], pa.string()),
                "b": pa.array([], pa.string()),
                "cnt": pa.array([], pa.int64()),
            }
        )
    cp = np.frombuffer("\n".join(words).encode("utf-32-le"), dtype=np.uint32)
    lo, hi = cp[:-1], cp[1:]
    keep = (lo != _SEP) & (hi != _SEP)
    keys = (lo[keep].astype(np.uint64) << np.uint64(32)) | hi[keep].astype(np.uint64)
    uniq, counts = np.unique(keys, return_counts=True)
    # codepoint → 1-char string, vectorized: one utf-32 decode per side
    # then a C-level list(str) split (no per-element chr() loop).
    a_chars = list((uniq >> np.uint64(32)).astype("<u4").tobytes().decode("utf-32-le"))
    b_chars = list(
        (uniq & np.uint64(0xFFFFFFFF)).astype("<u4").tobytes().decode("utf-32-le")
    )
    return pa.table(
        {
            "a": pa.array(a_chars, pa.string()),
            "b": pa.array(b_chars, pa.string()),
            "cnt": pa.array(counts.astype(np.int64), pa.int64()),
        }
    )


@empty_guard("documents", a=pa.string(), b=pa.string(), cnt=pa.int64())
def bpe_pair_counts(sf_dir: str) -> "ray.data.Dataset":
    """Adjacent-symbol pair frequencies over all corpus word occurrences
    (the argmax input of a BPE merge step, at the character base case).

    Words are the T1 tokens (lowercase [a-z0-9]+); words shorter than 2
    symbols contribute nothing. Counting every occurrence is identical
    to the textbook formulation (unique words weighted by frequency).
    Output: (a, b, cnt), one row per distinct adjacent pair.
    """

    def partial(batch: pa.Table) -> pa.Table:
        words: List[str] = []
        for t in batch.column("text").to_pylist():
            words.extend(w for w in _TOK_RE.findall(t.lower()) if len(w) >= 2)
        return char_pair_counts(words)

    return exchange_group_agg(
        _docs(sf_dir, ["text"]).map_batches(partial, batch_format="pyarrow"),
        ["a", "b"],
        [("cnt", "sum")],
        nbuck=8,
    )


@empty_guard(
    "documents", token_a=pa.string(), token_b=pa.string(), n_docs=pa.int64()
)
def token_cooccurrence(
    sf_dir: str, top: int = 64, min_docs: int = 2
) -> "ray.data.Dataset":
    """Distinct-document co-occurrence counts for the top-``top`` df
    tokens: n_docs(a, b) = |{d : a ∈ d ∧ b ∈ d}| for a < b, kept when
    n_docs >= ``min_docs``. The PMI / co-occurrence-graph base statistic.

    The top-K gate is what keeps this off the all-pairs cliff at scale:
    pass 1's df aggregate shrinks the corpus to unique tokens before the
    (small) sort, and pass 2's per-batch partial is a K×K triangle of
    int64 counters regardless of corpus size. Ties in the top-K cut are
    broken df desc then token asc — the identical ORDER BY in the oracle.
    """
    # pass 1: document frequencies (each document is one row, so per-row
    # distinct tokens == per-document distinct tokens)
    def df_partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch.column("text").to_pylist():
            c.update(set(_TOK_RE.findall(t.lower())))
        return pa.table(
            {
                "token": pa.array(list(c.keys()), pa.string()),
                "dfc": pa.array(list(c.values()), pa.int64()),
            }
        )

    df = exchange_group_agg(
        _docs(sf_dir, ["text"]).map_batches(df_partial, batch_format="pyarrow"),
        ["token"],
        [("dfc", "sum")],
        nbuck=8,
    )
    top_tbl = collect_table(
        df.sort(["dfc", "token"], descending=[True, False]).limit(top)
    )
    vocab = top_tbl.column("token").to_pylist()
    if not vocab:
        return ray.data.from_arrow(
            pa.table(
                {
                    "token_a": pa.array([], pa.string()),
                    "token_b": pa.array([], pa.string()),
                    "n_docs": pa.array([], pa.int64()),
                }
            )
        )
    index = {t: i for i, t in enumerate(vocab)}
    k = len(vocab)

    # pass 2: per-batch K×K upper-triangle pair accumulation
    def pair_partial(batch: pa.Table) -> pa.Table:
        grid = np.zeros((k, k), np.int64)
        for t in batch.column("text").to_pylist():
            idxs = sorted(
                {index[w] for w in _TOK_RE.findall(t.lower()) if w in index}
            )
            if len(idxs) < 2:
                continue
            iv = np.asarray(idxs, np.int64)
            ii, jj = np.meshgrid(iv, iv, indexing="ij")
            m = ii < jj
            np.add.at(grid, (ii[m], jj[m]), 1)
        ia, ja = np.nonzero(grid)
        return pa.table(
            {
                "ia": pa.array(ia.astype(np.int64), pa.int64()),
                "ja": pa.array(ja.astype(np.int64), pa.int64()),
                "n_docs": pa.array(grid[ia, ja], pa.int64()),
            }
        )

    pairs = exchange_group_agg(
        _docs(sf_dir, ["text"]).map_batches(pair_partial, batch_format="pyarrow"),
        ["ia", "ja"],
        [("n_docs", "sum")],
        nbuck=8,
    )

    def finish(batch: pa.Table) -> pa.Table:
        n = batch.column("n_docs")
        ia = batch.column("ia").to_pylist()
        ja = batch.column("ja").to_pylist()
        ta = [vocab[i] for i in ia]
        tb = [vocab[j] for j in ja]
        # token_a < token_b lexicographically, as the oracle's join
        # condition demands (index order is df order, not lex order)
        lo = [min(x, y) for x, y in zip(ta, tb)]
        hi = [max(x, y) for x, y in zip(ta, tb)]
        out = pa.table(
            {
                "token_a": pa.array(lo, pa.string()),
                "token_b": pa.array(hi, pa.string()),
                "n_docs": n,
            }
        )
        import pyarrow.compute as pc

        return out.filter(pc.greater_equal(out.column("n_docs"), min_docs))

    return pairs.map_batches(finish, batch_format="pyarrow")


# --- doc_surprisal ------------------------------------------------------------


@empty_guard(
    "documents",
    doc_id=pa.int64(),
    n_tokens=pa.int64(),
    surprisal_milli=pa.int64(),
    avg_surprisal_milli=pa.int64(),
)
def doc_surprisal(sf_dir: str) -> "ray.data.Dataset":
    """Unigram-LM surprisal per document — the perplexity-bucketing
    statistic of CCNet-style corpus filtering, with the corpus itself as
    the language model: surprisal(d) = Σ_t tf(d,t) · ln(N / cnt(t)), in
    exact milli fixed point (ln is IEEE double on both sides, the same
    contract as tf-idf/BM25; all sums and the final // are int64, so the
    result is identical under any block layout). Documents with zero
    tokens have no defined surprisal and are absent from the output
    (mirrored by the oracle's tf-derived join).

    100 TB design: this is deliberately NOT a broadcast-vocabulary join
    (the vocabulary of a web corpus does not fit a worker heap). Pass 1
    computes the global token count N as a driver scalar (one int per
    block). Pass 2 emits (doc_id, token, tf, dl) postings and
    hash-routes them by TOKEN, so each reduce bucket holds every row of
    its tokens and computes cnt(t) locally — the same-shape exchange the
    index build uses; the per-row surprisal part is then re-keyed by
    DOC on a second (narrow int) exchange that carries one int64 per
    (doc, token). Two exchanges, both over shrunk columns; nothing
    vocabulary-sized is ever collected or broadcast."""
    import pyarrow.compute as pc

    from ..functions.urls import hash64_batch
    from ..stages.util import bucket_exchange

    # pass 1: global token count (one scalar per block to the driver)
    def block_count(batch: pa.Table) -> pa.Table:
        n = sum(len(_TOK_RE.findall(t.lower())) for t in batch.column("text").to_pylist())
        return pa.table({"n": pa.array([n], pa.int64())})

    n_tbl = collect_table(
        _docs(sf_dir, ["text"]).map_batches(block_count, batch_format="pyarrow")
    )
    n_total = int(pc.sum(n_tbl.column("n")).as_py() or 0)
    if n_total == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "surprisal_milli": pa.array([], pa.int64()),
                    "avg_surprisal_milli": pa.array([], pa.int64()),
                }
            )
        )

    nbuck = 8

    # pass 2a: postings partials, routed by token hash
    def tf_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        doc, tok, tfs, dls = [], [], [], []
        for d, t in zip(ids, texts):
            c = Counter(_TOK_RE.findall(t.lower()))
            dl = sum(c.values())
            for w, f in c.items():
                doc.append(d)
                tok.append(w)
                tfs.append(f)
                dls.append(dl)
        t = pa.table(
            {
                "doc_id": pa.array(doc, pa.int64()),
                "token": pa.array(tok, pa.string()),
                "tf": pa.array(tfs, pa.int64()),
                "dl": pa.array(dls, pa.int64()),
            }
        )
        if t.num_rows == 0:
            return t.append_column("tbucket", pa.array([], pa.int64()))
        enc = pc.dictionary_encode(t.column("token").combine_chunks())
        hu = hash64_batch(enc.dictionary.to_pylist())
        h = hu[enc.indices.to_numpy(zero_copy_only=False)]
        return t.append_column(
            "tbucket", pa.array((h % np.uint64(nbuck)).astype(np.int64), pa.int64())
        )

    def token_reduce(tbl: pa.Table) -> pa.Table:
        out_schema = pa.schema(
            [("doc_id", pa.int64()), ("p", pa.int64()), ("dl", pa.int64())]
        )
        if tbl.num_rows == 0:
            return out_schema.empty_table()
        # a token's rows are all in this bucket: local sum IS the global cnt
        g = tbl.group_by(["token"]).aggregate([("tf", "sum")])
        toks = np.asarray(g.column("token").to_pylist())
        cnts = g.column("tf_sum").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(toks)
        row_tok = np.asarray(tbl.column("token").to_pylist())
        cnt_row = cnts[order[np.searchsorted(toks[order], row_tok)]]
        tf = tbl.column("tf").to_numpy(zero_copy_only=False).astype(np.float64)
        # the shared milli contract: floor(tf * ln(N/cnt) * 1000.0 + 0.5),
        # every factor the same double expression the oracle evaluates
        p = np.floor(
            tf * np.log(float(n_total) / cnt_row.astype(np.float64)) * 1000.0 + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "doc_id": tbl.column("doc_id"),
                "p": pa.array(p, pa.int64()),
                "dl": tbl.column("dl"),
            }
        )

    mat = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(tf_rows, batch_format="pyarrow")
        .materialize()
    )
    parts = bucket_exchange(mat, "tbucket", nbuck, token_reduce)

    # pass 2b: re-key by doc (narrow int columns only)
    summed = exchange_group_agg(
        parts, ["doc_id"], [("p", "sum"), ("dl", "max")], nbuck=nbuck
    )

    def finish(batch: pa.Table) -> pa.Table:
        p = batch.column("p").to_numpy(zero_copy_only=False).astype(np.int64)
        dl = batch.column("dl").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": pa.array(dl, pa.int64()),
                "surprisal_milli": pa.array(p, pa.int64()),
                "avg_surprisal_milli": pa.array(p // dl, pa.int64()),
            }
        )

    return summed.map_batches(finish, batch_format="pyarrow")


# --- bpe_train ----------------------------------------------------------------

BPE_ROUNDS = 8


def merge_pair(sym: List[str], a: str, b: str) -> List[str]:
    """One BPE merge over a symbol sequence: left-to-right non-overlapping
    replacement of adjacent (a, b) with a+b — the textbook scan (Sennrich
    et al. 2016) shared by training (apply_merge) and encoding
    (bpe_encode_stats), and replayed in SQL by plain replace() over the
    fully-NUL-delimited representation (__ray_entry__._bpe_train_sql)."""
    merged, i = [], 0
    n = len(sym)
    while i < n:
        if i + 1 < n and sym[i] == a and sym[i + 1] == b:
            merged.append(a + b)
            i += 2
        else:
            merged.append(sym[i])
            i += 1
    return merged


@empty_guard(
    "documents",
    rank=pa.int64(),
    a=pa.string(),
    b=pa.string(),
    count=pa.int64(),
)
def bpe_train(sf_dir: str, rounds: int = BPE_ROUNDS) -> pa.Table:
    """Iterative BPE tokenizer training (Sennrich et al. 2016): ``rounds``
    merge steps over the corpus, returning (rank, a, b, count) per merge
    with count = the pair's pre-merge occurrence total. Argmax ties break
    count desc, then (a, b) lexicographically — fully deterministic.

    Correctness is pinned TWICE: by the pure-Python reference trainer in
    tests/test_vocab_ops.py, and (since round 5) by a driver-checkable
    DuckDB oracle — the merge loop unrolls into MATERIALIZED CTEs over a
    fully-NUL-delimited symbol string where plain replace() is exactly
    this kernel's left-to-right non-overlapping whole-symbol merge
    (__ray_entry__._bpe_train_sql). Changing the merge semantics here
    requires the same change there.

    100 TB design: classic BPE trains on the UNIQUE-WORD frequency table,
    not the corpus — one corpus-scale exchange builds (word, freq) and
    every later pass is vocabulary-scale (~10^8 rows at web scale, a
    small Dataset). Each round is: one map_batches pair-count partial
    (rows bounded by the batch's distinct adjacent pairs) + one pair
    exchange + a 1-row driver argmax + one broadcast merge applied
    map_batches-side; the evolving word table is re-materialized per
    round so round k+1 reads blocks, not a k-stage recompute chain. The
    per-word scan inside a batch is the same per-unique-word loop every
    BPE implementation runs; it touches vocabulary rows only.
    """
    # corpus-scale pass: unique (word, freq)
    def word_partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch.column("text").to_pylist():
            c.update(w for w in _TOK_RE.findall(t.lower()) if len(w) >= 2)
        return pa.table(
            {
                "word": pa.array(list(c.keys()), pa.string()),
                "freq": pa.array(list(c.values()), pa.int64()),
            }
        )

    words = exchange_group_agg(
        _docs(sf_dir, ["text"]).map_batches(word_partial, batch_format="pyarrow"),
        ["word"],
        [("freq", "sum")],
        nbuck=8,
    )

    # symbol sequences start as characters; '\x00' joins multi-char symbols
    def to_seqs(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "seq": pa.array(
                    ["\x00".join(w) for w in batch.column("word").to_pylist()],
                    pa.string(),
                ),
                "freq": batch.column("freq"),
            }
        )

    ds = words.map_batches(to_seqs, batch_format="pyarrow").materialize()
    merges = []

    for r in range(rounds):
        def pair_counts(batch: pa.Table) -> pa.Table:
            c: Counter = Counter()
            seqs = batch.column("seq").to_pylist()
            freqs = batch.column("freq").to_pylist()
            for s, f in zip(seqs, freqs):
                sym = s.split("\x00")
                for x, y in zip(sym, sym[1:]):
                    c[(x, y)] += f
            ks = list(c.keys())
            return pa.table(
                {
                    "a": pa.array([k[0] for k in ks], pa.string()),
                    "b": pa.array([k[1] for k in ks], pa.string()),
                    "count": pa.array([c[k] for k in ks], pa.int64()),
                }
            )

        agg = exchange_group_agg(
            ds.map_batches(pair_counts, batch_format="pyarrow"),
            ["a", "b"],
            [("count", "sum")],
            nbuck=8,
        )
        best = collect_table(
            agg.sort(["count", "a", "b"], descending=[True, False, False]).limit(1)
        )
        if best.num_rows == 0:
            break
        a = best.column("a")[0].as_py()
        b = best.column("b")[0].as_py()
        cnt = int(best.column("count")[0].as_py())
        merges.append((r + 1, a, b, cnt))

        def apply_merge(batch: pa.Table, _a=a, _b=b) -> pa.Table:
            out = [
                "\x00".join(merge_pair(s.split("\x00"), _a, _b))
                for s in batch.column("seq").to_pylist()
            ]
            return pa.table({"seq": pa.array(out, pa.string()), "freq": batch.column("freq")})

        ds = ds.map_batches(apply_merge, batch_format="pyarrow").materialize()

    return pa.table(
        {
            "rank": pa.array([m[0] for m in merges], pa.int64()),
            "a": pa.array([m[1] for m in merges], pa.string()),
            "b": pa.array([m[2] for m in merges], pa.string()),
            "count": pa.array([m[3] for m in merges], pa.int64()),
        }
    )


# --- bpe_encode_stats ---------------------------------------------------------


@empty_guard(
    "documents",
    doc_id=pa.int64(),
    n_tokens=pa.int64(),
    n_bpe_tokens=pa.int64(),
    avg_symbols_milli=pa.int64(),
)
def bpe_encode_stats(sf_dir: str, rounds: int = BPE_ROUNDS) -> "ray.data.Dataset":
    """Tokenizer APPLY at corpus scale: train the ``rounds``-merge BPE
    vocabulary with :func:`bpe_train`, then encode every document and
    report its token count before and after merging plus the average
    symbols-per-word in the shared milli fixed point (zero-token docs are
    absent, the doc_surprisal convention).

    100 TB design: the trained merge list is TINY (``rounds`` rows) — it
    rides into every map task as a closure (one object-store put), and
    encoding is a single streaming ``map_batches`` pass with NO exchange
    at all: each doc's stats depend only on its own text. Per-batch
    unique words are memoized so a word is encoded once per batch, not
    once per occurrence — the same unique-word economics the trainer
    uses. The per-word merge scan is the same bounded text loop every
    BPE implementation runs (no vectorized equivalent).
    """
    merges_tbl = bpe_train(sf_dir, rounds)
    merges = list(
        zip(merges_tbl.column("a").to_pylist(), merges_tbl.column("b").to_pylist())
    )

    def enc(batch: pa.Table) -> pa.Table:
        memo: dict = {}

        def nsym(w: str) -> int:
            n = memo.get(w)
            if n is None:
                sym = list(w)
                for a, b in merges:
                    if len(sym) < 2:
                        break
                    sym = merge_pair(sym, a, b)
                n = memo[w] = len(sym)
            return n

        ids, ntok, nbpe, avg = [], [], [], []
        for did, txt in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            toks = _TOK_RE.findall((txt or "").lower())
            if not toks:
                continue
            n = len(toks)
            nb = sum(nsym(w) for w in toks)
            ids.append(did)
            ntok.append(n)
            nbpe.append(nb)
            avg.append((1000 * nb + n // 2) // n)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": pa.array(ntok, pa.int64()),
                "n_bpe_tokens": pa.array(nbpe, pa.int64()),
                "avg_symbols_milli": pa.array(avg, pa.int64()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(enc, batch_format="pyarrow")


# --- vocab_coverage -----------------------------------------------------------

VOCAB_SIZES = (256, 1024, 4096, 16384)


@empty_guard(
    "documents",
    vocab_size=pa.int64(),
    covered=pa.int64(),
    total=pa.int64(),
    coverage_milli=pa.int64(),
)
def vocab_coverage(sf_dir: str, sizes=VOCAB_SIZES) -> pa.Table:
    """Vocabulary-coverage / OOV curve (the statistic behind vocab-size
    selection): for each candidate vocabulary size V, what fraction of
    corpus token OCCURRENCES the top-V types cover (cut by count desc,
    token asc — fully deterministic). Output one row per V:
    (vocab_size, covered, total, coverage_milli) with the shared
    (1000*covered + total//2)//total fixed point.

    100 TB design: classic distributed top-K. One token exchange builds
    the (token, cnt) table (vocabulary-scale); each batch then emits its
    LOCAL top-max(V) — correct pruning, since a global-top token beaten
    by max(V) tokens inside its own batch would be beaten globally too —
    and a single-bucket second-level truncate reduces those partials to
    one max(V)-row table before the driver sees anything. The grand
    total rides the same materialized counts as a constant-size sum
    partial. Driver work is O(max(V)) — never the vocabulary.
    """
    vmax = max(sizes)

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch.column("text").to_pylist():
            c.update(_TOK_RE.findall((t or "").lower()))
        return pa.table(
            {
                "token": pa.array(list(c.keys()), pa.string()),
                "cnt": pa.array(list(c.values()), pa.int64()),
            }
        )

    counts = exchange_group_agg(
        _docs(sf_dir, ["text"]).map_batches(partial, batch_format="pyarrow"),
        ["token"],
        [("cnt", "sum")],
        nbuck=8,
    ).materialize()

    def local_top(batch: pa.Table) -> pa.Table:
        if batch.num_rows <= vmax:
            return batch.select(["token", "cnt"])
        toks = np.array(batch.column("token").to_pylist())
        cnt = batch.column("cnt").to_numpy(zero_copy_only=False)
        keep = np.lexsort((toks, -cnt))[:vmax]
        return pa.table(
            {
                "token": pa.array(toks[keep], pa.string()),
                "cnt": pa.array(cnt[keep], pa.int64()),
            }
        )

    def add_zero_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__tbucket", pa.array(np.zeros(batch.num_rows, np.int64), pa.int64())
        )

    from ..stages.util import bucket_exchange

    tops = collect_table(
        bucket_exchange(
            counts.map_batches(local_top, batch_format="pyarrow")
            .map_batches(add_zero_bucket, batch_format="pyarrow")
            .materialize(),
            "__tbucket",
            1,
            local_top,
        )
    )

    def total_partial(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "t": pa.array(
                    [int(batch.column("cnt").to_numpy(zero_copy_only=False).sum())]
                    if batch.num_rows
                    else [0],
                    pa.int64(),
                )
            }
        )

    total = int(
        sum(
            collect_table(counts.map_batches(total_partial, batch_format="pyarrow"))
            .column("t")
            .to_pylist()
        )
    )
    schema = pa.schema(
        [
            ("vocab_size", pa.int64()),
            ("covered", pa.int64()),
            ("total", pa.int64()),
            ("coverage_milli", pa.int64()),
        ]
    )
    if total == 0 or tops.num_rows == 0:
        return schema.empty_table()
    toks = np.array(tops.column("token").to_pylist())
    cnt = tops.column("cnt").to_numpy(zero_copy_only=False)
    order = np.lexsort((toks, -cnt))
    csum = np.cumsum(cnt[order])
    rows = []
    for v in sizes:
        covered = int(csum[min(v, len(csum)) - 1])
        rows.append(
            {
                "vocab_size": int(v),
                "covered": covered,
                "total": total,
                "coverage_milli": (1000 * covered + total // 2) // total,
            }
        )
    return pa.Table.from_pylist(rows, schema=schema)


# --- doc_bigram_surprisal -----------------------------------------------------


@empty_guard(
    "documents",
    doc_id=pa.int64(),
    n_bigrams=pa.int64(),
    surprisal_milli=pa.int64(),
    avg_surprisal_milli=pa.int64(),
)
def doc_bigram_surprisal(sf_dir: str) -> "ray.data.Dataset":
    """Bigram-LM surprisal per document — the next-order CCNet filter
    statistic above :func:`doc_surprisal`'s unigram model, with the
    corpus as its own LM: surprisal(d) = Σ_{(a,b)∈d} tf₂(d,a,b) ·
    ln(C₁(a) / C₂(a,b)), where C₂ is the corpus bigram count and
    C₁(a) = Σ_b C₂(a,b) is a's count as a bigram CONTEXT — i.e. the sum
    is Σ −ln P(b|a) in exact milli fixed point (each term ≥ 0 since
    C₁ ≥ C₂). Documents with < 2 tokens are absent.

    100 TB design: the routing trick that kills the broadcast gets
    BETTER at bigram order — rows hash-route by the FIRST token, so one
    reduce bucket holds every bigram starting with its contexts and
    computes both C₂(a,b) AND C₁(a) locally; no vocabulary- or
    bigram-table-sized structure is ever collected or broadcast. One
    token-hash exchange + one narrow doc-keyed re-exchange, the
    doc_surprisal shape exactly."""
    import pyarrow.compute as pc

    from ..functions.urls import hash64_batch
    from ..stages.util import bucket_exchange

    nbuck = 8

    def tf2_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        doc, aa, bb, tfs, nbs = [], [], [], [], []
        for d, t in zip(ids, texts):
            toks = _TOK_RE.findall((t or "").lower())
            if len(toks) < 2:
                continue
            c = Counter(zip(toks, toks[1:]))
            nb = len(toks) - 1
            for (a, b), f in c.items():
                doc.append(d)
                aa.append(a)
                bb.append(b)
                tfs.append(f)
                nbs.append(nb)
        t = pa.table(
            {
                "doc_id": pa.array(doc, pa.int64()),
                "a": pa.array(aa, pa.string()),
                "b": pa.array(bb, pa.string()),
                "f": pa.array(tfs, pa.int64()),
                "nb": pa.array(nbs, pa.int64()),
            }
        )
        if t.num_rows == 0:
            return t.append_column("tbucket", pa.array([], pa.int64()))
        enc = pc.dictionary_encode(t.column("a").combine_chunks())
        hu = hash64_batch(enc.dictionary.to_pylist())
        h = hu[enc.indices.to_numpy(zero_copy_only=False)]
        return t.append_column(
            "tbucket",
            pa.array((h % np.uint64(nbuck)).astype(np.int64), pa.int64()),
        )

    def ctx_reduce(tbl: pa.Table) -> pa.Table:
        out_schema = pa.schema(
            [("doc_id", pa.int64()), ("p", pa.int64()), ("nb", pa.int64())]
        )
        if tbl.num_rows == 0:
            return out_schema.empty_table()
        # every bigram starting with this bucket's contexts is here:
        # local sums ARE the global C2(a, b) and C1(a)
        g2 = tbl.group_by(["a", "b"]).aggregate([("f", "sum")])
        key2 = np.asarray(
            [
                x + "\x00" + y
                for x, y in zip(
                    g2.column("a").to_pylist(), g2.column("b").to_pylist()
                )
            ]
        )
        c2 = g2.column("f_sum").to_numpy(zero_copy_only=False).astype(np.int64)
        o2 = np.argsort(key2)
        g1 = g2.group_by(["a"]).aggregate([("f_sum", "sum")])
        key1 = np.asarray(g1.column("a").to_pylist())
        c1 = (
            g1.column("f_sum_sum").to_numpy(zero_copy_only=False).astype(np.int64)
        )
        o1 = np.argsort(key1)
        row_key2 = np.asarray(
            [
                x + "\x00" + y
                for x, y in zip(
                    tbl.column("a").to_pylist(), tbl.column("b").to_pylist()
                )
            ]
        )
        row_key1 = np.asarray(tbl.column("a").to_pylist())
        c2_row = c2[o2[np.searchsorted(key2[o2], row_key2)]]
        c1_row = c1[o1[np.searchsorted(key1[o1], row_key1)]]
        f = tbl.column("f").to_numpy(zero_copy_only=False).astype(np.float64)
        p = np.floor(
            f
            * np.log(c1_row.astype(np.float64) / c2_row.astype(np.float64))
            * 1000.0
            + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "doc_id": tbl.column("doc_id"),
                "p": pa.array(p, pa.int64()),
                "nb": tbl.column("nb"),
            }
        )

    mat = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(tf2_rows, batch_format="pyarrow")
        .materialize()
    )
    parts = bucket_exchange(mat, "tbucket", nbuck, ctx_reduce)

    # narrow doc-keyed re-exchange: p sums; nb rides as max (constant per
    # doc — a doc's rows span buckets, so it must NOT sum)
    summed = exchange_group_agg(
        parts, ["doc_id"], [("p", "sum"), ("nb", "max")], nbuck=nbuck
    )

    def finish(batch: pa.Table) -> pa.Table:
        s = batch.column("p").to_numpy(zero_copy_only=False).astype(np.int64)
        nb = batch.column("nb").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_bigrams": pa.array(nb, pa.int64()),
                "surprisal_milli": pa.array(s, pa.int64()),
                "avg_surprisal_milli": pa.array(s // nb, pa.int64()),
            }
        )

    return summed.map_batches(finish, batch_format="pyarrow")
