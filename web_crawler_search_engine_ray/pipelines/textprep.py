"""Training-data text-prep operators: PII redaction and Gopher-style
quality gating.

Both are single-pass streaming map_batches over pruned (doc_id, text)
scans — no shuffle, no materialization — which is the shape that matters
at 100 TB: the whole stage is embarrassingly parallel and the output is
written/consumed block-by-block. Patterns are compiled once per process
(module import), not per batch.

- ``pii_redact``: regex PII scrubbing (emails, phone numbers, IPv4) with
  per-document match counts. The testdata documents are synthetic prose
  with no PII, so the query derives a deterministic contact line from
  doc_id first (identical expression in the SQL oracle) — the operator
  then has real matches to find and the driver hash-checks both the
  counts and the redacted text byte-for-byte.
- ``quality_gopher``: Gopher-style (Rae et al. 2021) repetition/length
  signals as exact integers — word count, distinct count, top-token
  count, summed word length — plus milli fixed-point ratios and a
  boolean keep/drop gate, all in integer arithmetic identical to the
  oracle.

No counterpart in the reference (SURVEY.md §2.8 beyond-reference family).
"""

from __future__ import annotations

import re
from collections import Counter

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..stages.util import empty_guard
from .corpus import _TOK_RE, _docs

__all__ = [
    "pii_redact",
    "quality_gopher",
    "decontaminate",
    "dup_substring_spans",
    "sequence_pack",
    "interleave_mix",
    "shuffle_order",
    "dsir_select",
    "sequence_pack_shuffled",
    "repetition_ngrams",
    "corpus_funnel",
    "train_stream_pack",
    "quality_c4",
]

# RE2-compatible patterns (no lookarounds) so the DuckDB oracle uses the
# SAME pattern strings — keep in sync with __ray_entry__.py.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"555-[0-9]{3}-[0-9]{4}"
IP_RE = r"10\.0\.[0-9]{1,3}\.[0-9]{1,3}"

_EMAIL = re.compile(EMAIL_RE)
_PHONE = re.compile(PHONE_RE)
_IP = re.compile(IP_RE)


def _contact_line(doc_id: int) -> str:
    """Deterministic injected PII — mirrored exactly by the SQL oracle."""
    return (
        f" Contact user{doc_id}@example.com or call "
        f"555-{doc_id % 1000:03d}-1234 from 10.0.{doc_id % 256}.1"
    )


@empty_guard("documents", doc_id=pa.int64(), n_emails=pa.int64(), n_phones=pa.int64(), n_ips=pa.int64(), redacted=pa.string())
def pii_redact(sf_dir: str) -> "ray.data.Dataset":
    """Scrub emails/phones/IPv4 from (augmented) document text; emit
    per-doc match counts and the redacted text."""

    def scrub(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        n_em, n_ph, n_ip, red = [], [], [], []
        for d, t in zip(ids, texts):
            s = t + _contact_line(d)
            s, e = _EMAIL.subn("<EMAIL>", s)
            s, p = _PHONE.subn("<PHONE>", s)
            s, i = _IP.subn("<IP>", s)
            n_em.append(e)
            n_ph.append(p)
            n_ip.append(i)
            red.append(s)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_emails": pa.array(n_em, pa.int64()),
                "n_phones": pa.array(n_ph, pa.int64()),
                "n_ips": pa.array(n_ip, pa.int64()),
                "redacted": pa.array(red, pa.string()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(scrub, batch_format="pyarrow")


# Gopher-style gate thresholds (integer / milli fixed-point)
GATE_MIN_WORDS = 50
GATE_MAX_WORDS = 100_000
GATE_MIN_MWL_MILLI = 3_000  # mean word length in [3, 10]
GATE_MAX_MWL_MILLI = 10_000
GATE_MAX_TOP_MILLI = 250  # most common token <= 25% of tokens


def _gopher_stats(toks: list) -> tuple:
    """The ONE copy of the Gopher gate's integer math, shared by
    quality_gopher and corpus_funnel (COVERAGE.md promises 'gate math ≡
    quality_gopher' — a shared kernel makes that true by construction).
    Returns (n_words, n_distinct, top_count, sum_word_len,
    mean_word_len_milli, top_frac_milli, passes_gate)."""
    n = len(toks)
    c = Counter(toks)
    top = max(c.values()) if c else 0
    sl = sum(len(x) for x in toks)
    mean_milli = (1000 * sl + n // 2) // n if n else 0
    top_milli = (1000 * top + n // 2) // n if n else 0
    gate = (
        GATE_MIN_WORDS <= n <= GATE_MAX_WORDS
        and GATE_MIN_MWL_MILLI <= mean_milli <= GATE_MAX_MWL_MILLI
        and top_milli <= GATE_MAX_TOP_MILLI
    )
    return n, len(c), top, sl, mean_milli, top_milli, gate


@empty_guard("documents", doc_id=pa.int64(), n_words=pa.int64(), n_distinct=pa.int64(), top_tok_count=pa.int64(), sum_word_len=pa.int64(), mean_word_len_milli=pa.int64(), top_frac_milli=pa.int64(), passes_gate=pa.bool_())
def quality_gopher(sf_dir: str) -> "ray.data.Dataset":
    """Repetition/length quality signals + keep/drop gate per document."""

    def score(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        n_w, n_d, top_c, sum_l, mwl, top_m, keep = [], [], [], [], [], [], []
        for t in texts:
            n, nd, top, sl, mean_milli, top_milli, gate = _gopher_stats(
                _TOK_RE.findall(t.lower())
            )
            n_w.append(n)
            n_d.append(nd)
            top_c.append(top)
            sum_l.append(sl)
            mwl.append(mean_milli)
            top_m.append(top_milli)
            keep.append(gate)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_words": pa.array(n_w, pa.int64()),
                "n_distinct": pa.array(n_d, pa.int64()),
                "top_tok_count": pa.array(top_c, pa.int64()),
                "sum_word_len": pa.array(sum_l, pa.int64()),
                "mean_word_len_milli": pa.array(mwl, pa.int64()),
                "top_frac_milli": pa.array(top_m, pa.int64()),
                "passes_gate": pa.array(keep, pa.bool_()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(score, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# benchmark decontamination (n-gram overlap vs a held-out eval set)
# ---------------------------------------------------------------------------

DECON_NGRAM = 8  # window length in tokens (13 is common for LLM decontam;
#                  8 keeps the synthetic docs, avg ~54 tokens, testable)
DECON_BENCH_MOD = 97  # doc_id % 97 == 0 -> the "benchmark" side
# deterministic injected overlap (the synthetic prose has none), mirrored
# exactly by the SQL oracle: the canary lands on every benchmark doc and on
# every doc_id % 7 == 3 doc, so the latter are the true contaminated set.
DECON_CANARY = (
    " benchmark canary alpha beta gamma delta epsilon zeta eta theta"
)


def _decon_augment(doc_id: int, text: str) -> str:
    if doc_id % DECON_BENCH_MOD == 0 or doc_id % 7 == 3:
        return text + DECON_CANARY
    return text


def _decon_grams(text: str) -> set:
    toks = _TOK_RE.findall(text.lower())
    k = DECON_NGRAM
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


_BENCH_REF_CACHE: dict = {}


def _decon_bench_ref(sf_dir: str, augment=None):
    """ray.put-broadcast frozenset of the benchmark side's n-grams (the
    eval suites are tiny at ANY corpus scale, so one shared-memory copy
    per node). ``augment`` pre-transforms each doc's text (corpus_funnel
    passes its shared-duplicate rewrite) so both consumers share this ONE
    builder instead of drifting copies. Memoized per (sf_dir, augment,
    Ray session) — building it is a full documents scan, and three
    queries (decontaminate, corpus_funnel, train_stream_pack) would
    otherwise each pay it."""
    from .corpus import _session_cache_key

    key = (_session_cache_key(sf_dir), getattr(augment, "__name__", None))
    cached = _BENCH_REF_CACHE.get(key)
    if cached is not None:
        return cached

    def bench_grams(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out: set = set()
        for d, t in zip(ids, texts):
            if d % DECON_BENCH_MOD == 0:
                if augment is not None:
                    t = augment(d, t)
                out.update(_decon_grams(_decon_augment(d, t)))
        return pa.table({"g": pa.array(sorted(out), pa.string())})

    from .corpus import collect_table

    tbl = collect_table(
        _docs(sf_dir, ["doc_id", "text"]).map_batches(
            bench_grams, batch_format="pyarrow"
        )
    )
    ref = ray.put(frozenset(tbl.column("g").to_pylist()))
    _BENCH_REF_CACHE[key] = ref
    return ref


@empty_guard("documents", doc_id=pa.int64(), n_grams=pa.int64(), n_overlap=pa.int64(), contaminated=pa.int64())
def decontaminate(sf_dir: str) -> "ray.data.Dataset":
    """Training-set decontamination (the eval-overlap gate every LLM data
    pipeline runs before training — e.g. GPT-3 appendix C / Gopher):
    flag training documents sharing any DECON_NGRAM-token window with the
    benchmark set.

    Scale shape: the benchmark side is a handful of eval suites — tiny at
    ANY corpus scale — so it broadcasts via ``ray.put`` (one shared-memory
    copy per node, never re-shipped per batch) and the training side
    streams through one map_batches: no shuffle at all. Per doc we emit
    (distinct-window count, overlap count, contaminated flag)."""
    ref = _decon_bench_ref(sf_dir)

    def scan(batch: pa.Table) -> pa.Table:
        bset = ray.get(ref)
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        doc_ids, n_grams, n_overlap, flag = [], [], [], []
        for d, t in zip(ids, texts):
            if d % DECON_BENCH_MOD == 0:
                continue
            grams = _decon_grams(_decon_augment(d, t))
            if not grams:
                continue
            ov = len(grams & bset)
            doc_ids.append(d)
            n_grams.append(len(grams))
            n_overlap.append(ov)
            flag.append(1 if ov else 0)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "n_grams": pa.array(n_grams, pa.int64()),
                "n_overlap": pa.array(n_overlap, pa.int64()),
                "contaminated": pa.array(flag, pa.int64()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        scan, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# exact substring-duplication spans (window form of Lee et al. 2022,
# "Deduplicating Training Data Makes Language Models Better": find text
# shared VERBATIM across documents and measure how much of each document
# is duplicated — the remove-span counterpart to whole-doc MinHash dedup)
# ---------------------------------------------------------------------------

DUPSPAN_W = 10  # window length in tokens (Lee et al. use 50-token spans at
#                 corpus scale; 10 fits the ~54-token synthetic docs)
DUPSPAN_MOD = 5  # doc_id % 5 == 2 docs carry the injected boilerplate
# deterministic injected cross-doc duplicate (16 tokens), mirrored exactly
# by the SQL oracle — the synthetic prose alone shares few exact windows
DUPSPAN_CANARY = (
    " duplicated boilerplate segment alpha beta gamma delta epsilon zeta"
    " eta theta iota kappa lambda mu nu"
)


def _dupspan_augment(doc_id: int, text: str) -> str:
    return text + DUPSPAN_CANARY if doc_id % DUPSPAN_MOD == 2 else text


@empty_guard("documents", doc_id=pa.int64(), n_windows=pa.int64(), n_dup_windows=pa.int64(), dup_frac_milli=pa.int64(), max_dup_run=pa.int64(), longest_dup_span=pa.int64())
def dup_substring_spans(sf_dir: str) -> "ray.data.Dataset":
    """Per-document duplicated-substring spans: for every document that
    shares at least one DUPSPAN_W-token window VERBATIM with another
    document, emit how many of its windows are cross-doc duplicates and
    the longest consecutive duplicated run (→ longest duplicated span in
    tokens, the unit Lee et al. remove).

    Distributed shape (scale path): two bucketed shuffles, both carrying
    narrow rows —
      1. (window, doc, pos) rows bucket-grouped by window hash; a
         vectorized kernel keeps only windows seen in ≥2 DISTINCT docs
         (cross-doc duplicates; within-doc repeats alone don't count).
         At 100 TB the window string is replaced by a 128-bit content
         hash (collision-safe), shrinking the shuffle to fixed-width
         rows; here the string itself is the key so the DuckDB oracle
         replays byte-for-byte.
      2. surviving (doc, pos) rows bucket-grouped by doc id; a numpy
         gaps-and-islands pass turns sorted positions into run lengths.
    No driver-side materialization anywhere; both kernels are C-side."""
    import numpy as np

    W = DUPSPAN_W

    def windows(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        g_out, d_out, p_out, nw_out = [], [], [], []
        for d, t in zip(ids, texts):
            toks = _TOK_RE.findall(_dupspan_augment(d, t).lower())
            nw = len(toks) - W + 1
            if nw <= 0:
                continue
            joined = toks  # sliding join below
            for i in range(nw):
                g_out.append(" ".join(joined[i : i + W]))
                d_out.append(d)
                p_out.append(i + 1)  # 1-based, matching the SQL replay
                nw_out.append(nw)
        from ..functions.urls import hash64_batch

        # bucket on the engine's deterministic 64-bit hash: ONLY a shuffle
        # key (equality is on the string), but it must agree ACROSS worker
        # processes — never the salted builtin hash()
        h = hash64_batch(g_out) if g_out else np.empty(0, np.uint64)
        return pa.table(
            {
                "g": pa.array(g_out, pa.string()),
                "doc_id": pa.array(d_out, pa.int64()),
                "pos": pa.array(p_out, pa.int64()),
                "nw": pa.array(nw_out, pa.int64()),
                "gbucket": pa.array(
                    (h % np.uint64(256)).astype(np.int32), pa.int32()
                ),
            }
        )

    def dup_only(tbl: pa.Table) -> pa.Table:
        """Within a window-hash bucket: keep rows whose window occurs in
        ≥2 distinct docs. Vectorized: dictionary-encode the window
        strings, count distinct docs per code."""
        codes = (
            pc.dictionary_encode(tbl.column("g").combine_chunks())
            .indices.to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        docs = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((docs, codes))
        cs, ds = codes[order], docs[order]
        new_pair = np.concatenate(
            ([True], (cs[1:] != cs[:-1]) | (ds[1:] != ds[:-1]))
        ) if len(cs) else np.empty(0, bool)
        # distinct-doc count per code
        pair_codes = cs[new_pair]
        n_codes = int(codes.max()) + 1 if len(codes) else 0
        ddc = np.bincount(pair_codes, minlength=n_codes)
        keep = ddc[codes] >= 2
        return tbl.filter(pa.array(keep)).select(["doc_id", "pos", "nw"])

    def doc_spans(tbl: pa.Table) -> pa.Table:
        """Within a doc bucket: per doc, count duplicated windows and the
        longest consecutive run (numpy gaps-and-islands)."""
        docs = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        poss = tbl.column("pos").to_numpy(zero_copy_only=False)
        nws = tbl.column("nw").to_numpy(zero_copy_only=False)
        order = np.lexsort((poss, docs))
        d, p, w = docs[order], poss[order], nws[order]
        n = len(d)
        if not n:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_windows": pa.array([], pa.int64()),
                    "n_dup_windows": pa.array([], pa.int64()),
                    "dup_frac_milli": pa.array([], pa.int64()),
                    "max_dup_run": pa.array([], pa.int64()),
                    "longest_dup_span": pa.array([], pa.int64()),
                }
            )
        new_doc = np.concatenate(([True], d[1:] != d[:-1]))
        new_run = new_doc | np.concatenate(([True], p[1:] != p[:-1] + 1))
        run_id = np.cumsum(new_run) - 1
        run_len = np.bincount(run_id)
        doc_id_of_run = d[new_run]
        doc_idx = np.cumsum(new_doc) - 1
        n_docs = int(doc_idx[-1]) + 1
        n_dup = np.bincount(doc_idx, minlength=n_docs)
        doc_of = d[new_doc]
        nw_of = w[new_doc]
        run_doc_idx = doc_idx[new_run]
        max_run = np.zeros(n_docs, dtype=np.int64)
        np.maximum.at(max_run, run_doc_idx, run_len)
        frac = (1000 * n_dup + nw_of // 2) // nw_of
        return pa.table(
            {
                "doc_id": pa.array(doc_of, pa.int64()),
                "n_windows": pa.array(nw_of.astype(np.int64)),
                "n_dup_windows": pa.array(n_dup.astype(np.int64)),
                "dup_frac_milli": pa.array(frac.astype(np.int64)),
                "max_dup_run": pa.array(max_run, pa.int64()),
                "longest_dup_span": pa.array(max_run + W - 1, pa.int64()),
            }
        )

    def add_dbucket(batch: pa.Table) -> pa.Table:
        b = pc.cast(
            pc.bit_wise_and(batch.column("doc_id"), pa.scalar(255, pa.int64())),
            pa.int32(),
        )
        return batch.append_column("dbucket", b)

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        windows, batch_format="pyarrow"
    )
    dup = (
        ds.groupby("gbucket")
        .map_groups(dup_only, batch_format="pyarrow")
        .map_batches(add_dbucket, batch_format="pyarrow")
    )
    return dup.groupby("dbucket").map_groups(doc_spans, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# training-sequence packing (GPT-style: concatenate documents in a fixed
# global order, split into fixed-capacity token windows) — built on a
# DISTRIBUTED ORDERED PREFIX-SCAN, the primitive Ray Data lacks natively
# ---------------------------------------------------------------------------

PACK_CAPACITY = 256  # tokens per training sequence (2048/4096 in practice;
#                      256 makes the ~54-token synthetic docs span packs)


@empty_guard("documents", doc_id=pa.int64(), n_tokens=pa.int64(), start_offset=pa.int64(), pack_id=pa.int64(), end_pack=pa.int64(), n_packs_spanned=pa.int64())
def sequence_pack(sf_dir: str) -> "ray.data.Dataset":
    """Assign every document its byte-exact place in the packed training
    stream: concatenation order is doc_id ascending; each doc occupies
    [start_offset, start_offset + n_tokens) in the global token stream and
    therefore lands in pack(s) of PACK_CAPACITY tokens.

    The global start_offset is an ORDERED PREFIX SUM — the one shape a
    pure groupby/map engine can't express — implemented the scan way:
    (1) one streaming pass computes per-block token subtotals (the driver
    sees ONE scalar per block, never rows); (2) the driver exclusive-scans
    those subtotals (O(blocks)); (3) a second per-block pass stamps
    offsets = block_base + local cumsum. Blocks are processed in doc_id
    order because the scan sorts by each block's min doc_id and asserts
    block ranges don't interleave (repartition-safe: the sort execution
    guarantees it).

    Output per doc: n_tokens, start_offset, pack_id (of its first token),
    end_pack (of its last), n_packs_spanned. SQL oracle = a window
    cumulative sum."""

    def tok_counts(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        n = [len(_TOK_RE.findall(t.lower())) for t in texts]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": pa.array(n, pa.int64()),
            }
        )

    import numpy as np

    import ray as _ray

    from ..stages.util import dataset_from_known_refs, refs_and_counts

    counts = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(tok_counts, batch_format="pyarrow")
        .sort("doc_id")
        .materialize()
    )
    refs, nrows = refs_and_counts(counts)

    @_ray.remote(num_returns=2)
    def block_stats(tbl: pa.Table):
        d = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        n = tbl.column("n_tokens").to_numpy(zero_copy_only=False)
        return (int(d[0]), int(d[-1]), int(n.sum())), tbl

    pairs = [block_stats.remote(r) for r in refs]
    stats = _ray.get([p[0] for p in pairs])
    order = np.argsort([s[0] for s in stats], kind="stable")
    # block doc ranges must partition the key space (sort guarantees it)
    for a, b in zip(order[:-1], order[1:]):
        assert stats[a][1] < stats[b][0], "sorted blocks interleave"
    base = 0
    bases = {}
    for i in order:
        bases[i] = base
        base += stats[i][2]

    @_ray.remote
    def stamp(tbl: pa.Table, base_off: int) -> pa.Table:
        n = tbl.column("n_tokens").to_numpy(zero_copy_only=False)
        start = base_off + np.cumsum(n) - n
        pack = start // PACK_CAPACITY
        last = np.maximum(start, start + n - 1)  # empty docs stay in place
        end_pack = last // PACK_CAPACITY
        return pa.table(
            {
                "doc_id": tbl.column("doc_id"),
                "n_tokens": tbl.column("n_tokens"),
                "start_offset": pa.array(start, pa.int64()),
                "pack_id": pa.array(pack, pa.int64()),
                "end_pack": pa.array(end_pack, pa.int64()),
                "n_packs_spanned": pa.array(end_pack - pack + 1, pa.int64()),
            }
        )

    out_refs = [stamp.remote(pairs[i][1], bases[i]) for i in range(len(pairs))]
    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_tokens", pa.int64()),
            ("start_offset", pa.int64()),
            ("pack_id", pa.int64()),
            ("end_pack", pa.int64()),
            ("n_packs_spanned", pa.int64()),
        ]
    )
    return dataset_from_known_refs(out_refs, nrows, schema)


# ---------------------------------------------------------------------------
# deterministic weighted source interleaving (the training-stream mix) —
# closed-form stride scheduling, NO global sort
# ---------------------------------------------------------------------------

MIX_STRIDE_LCM = 12  # lcm(1..4): strides 12//w stay exact integers


def _mix_weight(src_idx: "np.ndarray") -> "np.ndarray":
    """Deterministic per-source mix weight 1..4 (stands in for the config
    a trainer would supply; same expression in the SQL oracle)."""
    import numpy as np

    return 1 + (src_idx % 4)


@empty_guard("documents", doc_id=pa.int64(), source=pa.string(), seq=pa.int64(), vt=pa.int64(), slot=pa.int64())
def interleave_mix(sf_dir: str) -> "ray.data.Dataset":
    """Deterministic weighted interleave of the per-source document
    streams into ONE training-stream order (the HF
    ``interleave_datasets`` / tf.data ``sample_from_datasets`` op, made
    reproducible): source ``srcI`` has weight ``w = 1 + I % 4``; its k-th
    document (doc_id ascending) carries virtual time
    ``vt = (k+1) * (12 // w)`` (stride scheduling, exact integers), and
    the global consume position is the rank under ``(vt, src_idx)``.

    Scale shape — the rank needs NO global sort: with the tiny
    per-source totals ``n_s`` broadcast (one dict, |sources| entries),
    every row's slot is CLOSED FORM:

        slot = seq                                  # same-source preds
             + sum_{s'!=s} min(n_s', (vt-1) // d_s')   # earlier vt
             + #{s' < s : d_s' divides vt, vt//d_s' <= n_s'}  # vt ties

    so the only distributed work is the per-source ordered rank ``seq``
    — the same sort + per-block prefix-scan primitive ``sequence_pack``
    uses (driver sees one boundary tuple per block, never rows), here
    keyed by (source, doc_id). Columns carried: 2. At 100 TB the stage
    is a narrow sort plus an embarrassingly parallel stamped map.

    No counterpart in the reference (SURVEY.md §2.8 beyond-reference
    family); semantics follow the published interleaving samplers.
    """
    import numpy as np

    from ..stages.util import dataset_from_known_refs, refs_and_counts

    sorted_ds = (
        _docs(sf_dir, ["doc_id", "source"]).sort(["source", "doc_id"]).materialize()
    )
    refs, nrows = refs_and_counts(sorted_ds)

    @ray.remote(num_returns=2)
    def block_stats(tbl: pa.Table):
        col = tbl.column("source")
        did = tbl.column("doc_id")
        vc = pc.value_counts(col.combine_chunks())
        counts = dict(
            zip(vc.field("values").to_pylist(), vc.field("counts").to_pylist())
        )
        first = (col[0].as_py(), did[0].as_py())
        last = (col[-1].as_py(), did[-1].as_py())
        return (first, last, counts), tbl

    pairs = [block_stats.remote(r) for r in refs]
    stats = ray.get([p[0] for p in pairs])
    order = sorted(range(len(stats)), key=lambda i: stats[i][0])
    for a, b in zip(order[:-1], order[1:]):
        assert stats[a][1] < stats[b][0], "sorted blocks interleave"
    running: dict = {}
    bases: dict = {}
    for i in order:
        blk_counts = stats[i][2]
        bases[i] = {s: running.get(s, 0) for s in blk_counts}
        for s, c in blk_counts.items():
            running[s] = running.get(s, 0) + c
    totals = running  # per-source n_s — |sources| entries, broadcast once
    tref = ray.put(totals)

    @ray.remote
    def stamp(tbl: pa.Table, base: dict) -> pa.Table:
        totals_d = ray.get(tref)
        names = sorted(totals_d, key=lambda s: int(s[3:]))
        s_idx_all = np.array([int(s[3:]) for s in names], dtype=np.int64)
        d_all = MIX_STRIDE_LCM // _mix_weight(s_idx_all)
        n_all = np.array([totals_d[s] for s in names], dtype=np.int64)

        src_col = tbl.column("source").combine_chunks()
        pos = pc.index_in(src_col, value_set=pa.array(names)).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        # local per-source rank: runs are contiguous (block is sorted)
        change = np.empty(len(pos), dtype=bool)
        if len(pos):
            change[0] = True
            change[1:] = pos[1:] != pos[:-1]
        run_start = np.maximum.accumulate(
            np.where(change, np.arange(len(pos)), 0)
        )
        local = np.arange(len(pos)) - run_start
        base_by_idx = np.array([base.get(s, 0) for s in names], dtype=np.int64)
        seq = base_by_idx[pos] + local
        vt = (seq + 1) * d_all[pos]
        s_idx = s_idx_all[pos]

        slot = seq.copy()
        for j in range(len(names)):
            other = pos != j
            dj, nj, ij = int(d_all[j]), int(n_all[j]), int(s_idx_all[j])
            earlier = np.minimum(nj, (vt - 1) // dj)
            tie = (ij < s_idx) & (vt % dj == 0) & (vt // dj <= nj)
            slot += np.where(other, earlier + tie.astype(np.int64), 0)
        return pa.table(
            {
                "doc_id": tbl.column("doc_id"),
                "source": tbl.column("source"),
                "seq": pa.array(seq, pa.int64()),
                "vt": pa.array(vt, pa.int64()),
                "slot": pa.array(slot, pa.int64()),
            }
        )

    out_refs = [stamp.remote(pairs[i][1], bases[i]) for i in range(len(pairs))]
    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("source", pa.string()),
            ("seq", pa.int64()),
            ("vt", pa.int64()),
            ("slot", pa.int64()),
        ]
    )
    return dataset_from_known_refs(out_refs, nrows, schema)


# ---------------------------------------------------------------------------
# deterministic seeded global shuffle (the training-order shuffle) —
# distributed rank under a mix32 key, driver sees one scalar per block
# ---------------------------------------------------------------------------

SHUFFLE_SEED = 20177  # the trainer's shuffle seed; replayed by the oracle


@empty_guard("documents", doc_id=pa.int64(), shuffle_key=pa.int64(), pos=pa.int64())
def shuffle_order(sf_dir: str) -> "ray.data.Dataset":
    """Deterministic seeded GLOBAL SHUFFLE of the document stream — the
    reproducible training-order permutation a trainer applies before
    ``sequence_pack``. Each doc's shuffle key is
    ``mix32(doc_id, SHUFFLE_SEED)`` (functions/hashing.py — LCG+xorshift,
    SQL-replayable); its position is the global rank under
    ``(shuffle_key, doc_id)``.

    Scale shape: ONE narrow distributed sort of (doc_id, shuffle_key) —
    16 bytes/row — then per-block positions are block_base + arange,
    where block bases come from the sorted blocks' row counts (the
    ordered prefix-scan primitive shared with ``sequence_pack`` /
    ``interleave_mix``: the driver sees one boundary tuple + count per
    block, never rows). Contrast with ``Dataset.random_shuffle()``,
    whose permutation depends on block layout — this one is bit-stable
    across any partitioning, which is what resumable training needs.
    """
    import numpy as np

    from ..functions.hashing import mix32_batch
    from ..stages.util import dataset_from_known_refs, refs_and_counts

    def keyed(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        k = mix32_batch(ids.astype(np.uint64), SHUFFLE_SEED).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "shuffle_key": pa.array(k, pa.int64()),
            }
        )

    sorted_ds = (
        _docs(sf_dir, ["doc_id"])
        .map_batches(keyed, batch_format="pyarrow")
        .sort(["shuffle_key", "doc_id"])
        .materialize()
    )
    refs, nrows = refs_and_counts(sorted_ds)

    @ray.remote(num_returns=2)
    def block_stats(tbl: pa.Table):
        k = tbl.column("shuffle_key").to_numpy(zero_copy_only=False)
        d = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        return (
            (int(k[0]), int(d[0])),
            (int(k[-1]), int(d[-1])),
            tbl.num_rows,
        ), tbl

    pairs = [block_stats.remote(r) for r in refs]
    stats = ray.get([p[0] for p in pairs])
    order = sorted(range(len(stats)), key=lambda i: stats[i][0])
    for a, b in zip(order[:-1], order[1:]):
        assert stats[a][1] < stats[b][0], "sorted blocks interleave"
    base = 0
    bases = {}
    for i in order:
        bases[i] = base
        base += stats[i][2]

    @ray.remote
    def stamp(tbl: pa.Table, b: int) -> pa.Table:
        return tbl.append_column(
            "pos", pa.array(b + np.arange(tbl.num_rows, dtype=np.int64), pa.int64())
        )

    out_refs = [stamp.remote(pairs[i][1], bases[i]) for i in range(len(pairs))]
    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("shuffle_key", pa.int64()),
            ("pos", pa.int64()),
        ]
    )
    return dataset_from_known_refs(out_refs, nrows, schema)


# ---------------------------------------------------------------------------
# DSIR-style data selection (Xie et al. 2023): hashed-bigram importance
# weights toward a target distribution — constant-size state, no shuffle
# ---------------------------------------------------------------------------

DSIR_BUCKETS = 4096  # hashed-feature dimensionality (10^4..10^6 in practice;
#                     4096 separates the target lang cleanly at test scale)
DSIR_TARGET_LANG = "en"  # stands in for the trainer's target corpus
DSIR_SEL_MILLI = 392  # selected iff mean per-bigram weight >= 0.392 (between
#                       the target-lang 25th pct and the rest's 75th at sf0.001)


@empty_guard("documents", doc_id=pa.int64(), n_bigrams=pa.int64(), score_milli=pa.int64(), selected=pa.bool_())
def dsir_select(sf_dir: str) -> "ray.data.Dataset":
    """Data Selection with Importance Resampling (DSIR, Xie et al. 2023),
    integer-exact: score every document by how much its hashed-bigram
    profile resembles the TARGET distribution (here: the ``lang='en'``
    slice standing in for the trainer's target corpus).

    Feature = poly32(tok_i + ' ' + tok_{i+1}) % DSIR_BUCKETS per bigram
    occurrence; bucket counts ct (target) and cr (all) accumulate in ONE
    streaming pass as per-batch partial count vectors — the driver merges
    |buckets|-sized arrays, CONSTANT in corpus size — then broadcast once
    via ``ray.put``; a second pass scores each doc:
    ``score_milli = Σ_bigrams (1000 * (ct[b]+1)) // (cr[b]+1)`` (Laplace-
    smoothed importance weight, floor division, exact in the SQL replay)
    and gates ``selected = score_milli >= 400 * n_bigrams``. No shuffle
    anywhere: two embarrassingly parallel passes + one tiny broadcast —
    the DSIR paper's shape, which is why it runs at full-corpus scale.

    Token hashes are memoized per actor (tokens repeat heavily) and the
    bigram hash composes from token hashes via the Horner identity
    h(a+' '+b) = h(a)*31^(1+|b|) + 32*31^(|b|) + h(b) mod 2^32 — no
    per-bigram string building in the hot loop."""
    import numpy as np

    from ..functions.hashing import _pow31, poly_hash
    from .corpus import collect_table

    B = DSIR_BUCKETS
    _memo: dict = {}

    def _tok_hashes(toks: list) -> "np.ndarray":
        out = np.empty(len(toks), dtype=np.uint32)
        for i, t in enumerate(toks):
            h = _memo.get(t)
            if h is None:
                h = np.uint32(poly_hash(t))
                _memo[t] = h
            out[i] = h
        return out

    def _bigram_buckets(toks: list) -> "np.ndarray":
        if len(toks) < 2:
            return np.empty(0, dtype=np.int64)
        th = _tok_hashes(toks)
        blen = np.array([len(t) for t in toks[1:]], dtype=np.int64)
        p = _pow31(int(blen.max()) + 2)  # 31^k mod 2^32 table
        with np.errstate(over="ignore"):
            h = (
                th[:-1] * p[blen + 1]
                + np.uint32(32) * p[blen]  # ord(' ') == 32
                + th[1:]
            )
        return (h % np.uint32(B)).astype(np.int64)

    def partials(batch: pa.Table) -> pa.Table:
        ct = np.zeros(B, dtype=np.int64)
        cr = np.zeros(B, dtype=np.int64)
        for t, lg in zip(
            batch.column("text").to_pylist(), batch.column("lang").to_pylist()
        ):
            bk = _bigram_buckets(_TOK_RE.findall(t.lower()))
            bc = np.bincount(bk, minlength=B)
            cr += bc
            if lg == DSIR_TARGET_LANG:
                ct += bc
        return pa.table(
            {
                "bucket": pa.array(np.arange(B, dtype=np.int64), pa.int64()),
                "ct": pa.array(ct, pa.int64()),
                "cr": pa.array(cr, pa.int64()),
            }
        )

    # per-batch partials are B-row vectors; one narrow exchange reduces
    # them to EXACTLY B rows before the driver sees anything — without it
    # the driver would collect B x n_blocks rows (a scale-killer at 10^6
    # blocks). Width 4 keeps the reduce parallel yet constant-size.
    from ..stages.util import exchange_sum_by_key

    parts = collect_table(
        exchange_sum_by_key(
            _docs(sf_dir, ["doc_id", "text", "lang"]).map_batches(
                partials, batch_format="pyarrow"
            ),
            "bucket",
            4,
        )
    )
    ct = np.zeros(B, dtype=np.int64)
    cr = np.zeros(B, dtype=np.int64)
    np.add.at(ct, parts.column("bucket").to_numpy(), parts.column("ct").to_numpy())
    np.add.at(cr, parts.column("bucket").to_numpy(), parts.column("cr").to_numpy())
    wref = ray.put((1000 * (ct + 1)) // (cr + 1))  # per-bucket milli-weight

    def score(batch: pa.Table) -> pa.Table:
        w = ray.get(wref)
        nbg, sc = [], []
        for t in batch.column("text").to_pylist():
            bk = _bigram_buckets(_TOK_RE.findall(t.lower()))
            nbg.append(len(bk))
            sc.append(int(w[bk].sum()))
        nbg_a = np.array(nbg, dtype=np.int64)
        sc_a = np.array(sc, dtype=np.int64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_bigrams": pa.array(nbg_a, pa.int64()),
                "score_milli": pa.array(sc_a, pa.int64()),
                "selected": pa.array(
                    (nbg_a > 0) & (sc_a >= DSIR_SEL_MILLI * nbg_a), pa.bool_()
                ),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow"
    )


PACK_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("n_tokens", pa.int64()),
        ("start_offset", pa.int64()),
        ("pack_id", pa.int64()),
        ("end_pack", pa.int64()),
    ]
)


def _pack_sorted(counts: "ray.data.Dataset"):
    """Distributed ordered prefix-scan packing over a MATERIALIZED
    (doc_id, shuffle_key, n_tokens) dataset already sorted by
    (shuffle_key, doc_id): one scalar (block token sum + boundary keys)
    per block to the driver, then per-block cumsum stamping — the shared
    tail of sequence_pack_shuffled and train_stream_pack. Returns a
    Dataset, or a typed empty pa.Table when every input block is empty
    (the empty_guard convention — a zero-row Ray dataset drops its
    schema on to_pandas())."""
    import numpy as np

    from ..stages.util import dataset_from_known_refs, refs_and_counts

    refs, block_counts = refs_and_counts(counts)
    if not refs:  # refs_and_counts drops zero-row blocks
        return PACK_SCHEMA.empty_table()

    @ray.remote(num_returns=2)
    def block_stats(tbl: pa.Table):
        k = tbl.column("shuffle_key").to_numpy(zero_copy_only=False)
        d = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        n = tbl.column("n_tokens").to_numpy(zero_copy_only=False)
        return (
            (int(k[0]), int(d[0])),
            (int(k[-1]), int(d[-1])),
            int(n.sum()),
        ), tbl

    pairs = [block_stats.remote(r) for r in refs]
    stats = ray.get([p[0] for p in pairs])
    order = sorted(range(len(stats)), key=lambda i: stats[i][0])
    for a, b in zip(order[:-1], order[1:]):
        assert stats[a][1] < stats[b][0], "sorted blocks interleave"
    base = 0
    bases = {}
    for i in order:
        bases[i] = base
        base += stats[i][2]

    @ray.remote
    def stamp(tbl: pa.Table, base_off: int) -> pa.Table:
        n = tbl.column("n_tokens").to_numpy(zero_copy_only=False)
        start = base_off + np.cumsum(n) - n
        pack = start // PACK_CAPACITY
        last = np.maximum(start, start + n - 1)
        end_pack = last // PACK_CAPACITY
        return pa.table(
            {
                "doc_id": tbl.column("doc_id"),
                "n_tokens": tbl.column("n_tokens"),
                "start_offset": pa.array(start, pa.int64()),
                "pack_id": pa.array(pack, pa.int64()),
                "end_pack": pa.array(end_pack, pa.int64()),
            }
        )

    out_refs = [stamp.remote(pairs[i][1], bases[i]) for i in range(len(pairs))]
    return dataset_from_known_refs(out_refs, block_counts, PACK_SCHEMA)


@empty_guard("documents", doc_id=pa.int64(), n_tokens=pa.int64(), start_offset=pa.int64(), pack_id=pa.int64(), end_pack=pa.int64())
def sequence_pack_shuffled(sf_dir: str) -> "ray.data.Dataset":
    """The composed training-stream pipeline: documents are packed into
    fixed-capacity token windows in the SEEDED-SHUFFLE order (the
    ``shuffle_order`` permutation), not doc_id order — exactly what a
    trainer consumes after ``shuffle -> pack``. Same distributed shape as
    ``sequence_pack`` (one narrow sort + per-block ordered prefix scan,
    one scalar per block to the driver), with the scan keyed by
    (mix32(doc_id, seed), doc_id) instead of doc_id."""
    import numpy as np

    from ..functions.hashing import mix32_batch

    def tok_counts(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        n = [len(_TOK_RE.findall(t.lower())) for t in texts]
        k = mix32_batch(ids.astype(np.uint64), SHUFFLE_SEED).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "shuffle_key": pa.array(k, pa.int64()),
                "n_tokens": pa.array(n, pa.int64()),
            }
        )

    counts = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(tok_counts, batch_format="pyarrow")
        .sort(["shuffle_key", "doc_id"])
        .materialize()
    )
    return _pack_sorted(counts)


# ---------------------------------------------------------------------------
# Gopher n-gram repetition signals (Rae et al. 2021 table A1, the n-gram
# half of the repetition family; ``quality_gopher`` covers the unigram
# half): top-2-gram character fraction and the character fraction covered
# by duplicated 5-grams (overlap-aware union coverage, not per-occurrence
# double counting).
# ---------------------------------------------------------------------------

REP_MAX_TOP2_MILLI = 200  # drop if top 2-gram > 20% of word chars (Gopher)
REP_MAX_DUP5_MILLI = 150  # drop if dup-5-gram coverage > 15% of word chars
# the synthetic prose has no duplicated 5-grams, so (same pattern as
# DECON_CANARY / DUPSPAN_CANARY) doc_id % 9 == 4 docs get a phrase
# appended TWICE — real dup-5-gram coverage for the kernel to find, the
# short docs among them exceeding the 150-milli gate; mirrored exactly
# in the SQL oracle.
REP_DUP_MOD, REP_DUP_REM = 9, 4
REP_CANARY = " repeat alpha beta gamma delta epsilon zeta"


def _rep_augment(doc_id: int, text: str) -> str:
    if doc_id % REP_DUP_MOD == REP_DUP_REM:
        return text + REP_CANARY + REP_CANARY
    return text


@empty_guard(
    "documents",
    doc_id=pa.int64(),
    n_words=pa.int64(),
    total_chars=pa.int64(),
    top2_count=pa.int64(),
    top2_chars=pa.int64(),
    top2_frac_milli=pa.int64(),
    dup5_chars=pa.int64(),
    dup5_frac_milli=pa.int64(),
    passes_gate=pa.bool_(),
)
def repetition_ngrams(sf_dir: str) -> "ray.data.Dataset":
    """Per-document n-gram repetition metrics + keep/drop gate.

    Scale shape: one streaming ``map_batches`` over a pruned
    (doc_id, text) scan — no shuffle, no materialization; the per-doc
    kernel is O(tokens). All ratios are milli fixed-point integers with
    the shared ``(1000*x + total//2) // total`` rounding so the DuckDB
    oracle replays them bit-exactly. Top-bigram ties break on the
    lexicographically smallest bigram string (SQL: ``ORDER BY c DESC,
    g ASC``). Coverage is the UNION of duplicated-5-gram windows per
    Gopher's "taking care not to count characters in overlapping n-grams
    more than once"."""

    def score(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        texts = batch.column("text").to_pylist()
        cols: dict = {k: [] for k in (
            "n_words", "total_chars", "top2_count", "top2_chars",
            "top2_frac_milli", "dup5_chars", "dup5_frac_milli", "passes_gate",
        )}
        for d, t in zip(ids.to_pylist(), texts):
            toks = _TOK_RE.findall(_rep_augment(d, t).lower())
            n = len(toks)
            lens = [len(x) for x in toks]
            total = sum(lens)
            top2_count = top2_chars = 0
            if n >= 2:
                c2 = Counter(
                    toks[i] + " " + toks[i + 1] for i in range(n - 1)
                )
                g, c = min(c2.items(), key=lambda kv: (-kv[1], kv[0]))
                top2_count, top2_chars = c, c * (len(g) - 1)
            dup5_chars = 0
            if n >= 5:
                grams = [" ".join(toks[i : i + 5]) for i in range(n - 4)]
                c5 = Counter(grams)
                covered = bytearray(n)
                for i, g5 in enumerate(grams):
                    if c5[g5] >= 2:
                        covered[i : i + 5] = b"\x01" * 5
                dup5_chars = sum(l for l, cv in zip(lens, covered) if cv)
            t2m = (1000 * top2_chars + total // 2) // total if total else 0
            d5m = (1000 * dup5_chars + total // 2) // total if total else 0
            cols["n_words"].append(n)
            cols["total_chars"].append(total)
            cols["top2_count"].append(top2_count)
            cols["top2_chars"].append(top2_chars)
            cols["top2_frac_milli"].append(t2m)
            cols["dup5_chars"].append(dup5_chars)
            cols["dup5_frac_milli"].append(d5m)
            cols["passes_gate"].append(
                t2m <= REP_MAX_TOP2_MILLI and d5m <= REP_MAX_DUP5_MILLI
            )
        return pa.table(
            {
                "doc_id": ids,
                **{
                    k: pa.array(
                        v, pa.bool_() if k == "passes_gate" else pa.int64()
                    )
                    for k, v in cols.items()
                },
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# corpus_funnel: the composed end-to-end training-data filter chain —
# total -> language gate -> Gopher quality gate -> exact first-wins dedup
# -> benchmark decontamination — reported as a per-stage retention funnel
# (the one table every corpus build publishes; cf. RefinedWeb fig. 2 /
# Dolma's per-stage doc counts).
# ---------------------------------------------------------------------------

FUNNEL_LANG = "en"
FUNNEL_STAGES = ("total", "lang", "quality", "exact_dedup", "decontaminate")
# the synthetic corpus has no byte-identical documents, so (same canary
# pattern as DECON/DUPSPAN/REP) doc_id % 41 == 7 docs get their text
# REPLACED by one shared 60-word block — all-distinct words so it passes
# the Gopher gate and the exact-dedup stage has real duplicates to
# collapse; mirrored exactly in the SQL oracle.
FUNNEL_DUP_MOD, FUNNEL_DUP_REM = 41, 7
FUNNEL_DUP_TEXT = (
    "shared corpus duplicate document body alpha beta gamma delta epsilon"
    " zeta eta theta iota kappa lambda mu nu xi omicron pi rho sigma tau"
    " upsilon phi chi psi omega one two three four five six seven eight"
    " nine ten eleven twelve thirteen fourteen fifteen sixteen seventeen"
    " eighteen nineteen twenty stable text block ends here with exactly"
    " sixty tokens total count"
)


def _funnel_augment(doc_id: int, text: str) -> str:
    if doc_id % FUNNEL_DUP_MOD == FUNNEL_DUP_REM:
        return FUNNEL_DUP_TEXT
    return text


@empty_guard(
    "documents",
    _rows=[
        {"stage": i, "stage_name": s, "docs": 0}
        for i, s in enumerate(FUNNEL_STAGES)
    ],
    stage=pa.int64(),
    stage_name=pa.string(),
    docs=pa.int64(),
)
def corpus_funnel(sf_dir: str) -> "ray.data.Dataset":
    """Survivor counts after each sequential corpus-filter stage.

    Scale shape: ONE streaming scoring pass over the pruned
    (doc_id, text, lang) scan computes every per-doc flag (language,
    Gopher gate with the exact ``quality_gopher`` integer math, a 128-bit
    content digest, and the ``decontaminate`` benchmark-overlap flag
    against the ray.put-broadcast eval-gram set). The flag table — five
    narrow columns, ~60 bytes/doc regardless of document size — is
    materialized once and consumed twice: a driver-side Sum aggregate for
    the map-only stage counts, and ONE hash shuffle (groupby digest) for
    first-wins exact dedup, where ``min(doc_id*2 + (1-clean))`` carries
    the keeper's decontamination flag through the aggregate so no second
    join is needed. Output is a 5-row funnel table.
    """
    import hashlib

    import pyarrow.compute as _pc
    from ray.data.aggregate import Sum

    ref = _decon_bench_ref(sf_dir, augment=_funnel_augment)

    def flags(batch: pa.Table) -> pa.Table:
        bset = ray.get(ref)
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        langs = batch.column("lang").to_pylist()
        lang_ok, s2, digest, code = [], [], [], []
        for d, t, lg in zip(ids, texts, langs):
            t = _funnel_augment(d, t)
            gate = _gopher_stats(_TOK_RE.findall(t.lower()))[-1]
            l1 = lg == FUNNEL_LANG
            lang_ok.append(int(l1))
            s2.append(int(l1 and gate))
            digest.append(hashlib.md5(t.encode()).hexdigest())
            clean = d % DECON_BENCH_MOD != 0 and not (
                _decon_grams(_decon_augment(d, t)) & bset
            )
            code.append(2 * d + (0 if clean else 1))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "lang_ok": pa.array(lang_ok, pa.int64()),
                "s2": pa.array(s2, pa.int64()),
                "digest": pa.array(digest, pa.string()),
                "code": pa.array(code, pa.int64()),
            }
        )

    mat = (
        _docs(sf_dir, ["doc_id", "text", "lang"])
        .map_batches(flags, batch_format="pyarrow")
        .materialize()
    )
    n0 = mat.count()
    agg = mat.aggregate(Sum("lang_ok"), Sum("s2"))
    n1 = int(agg["sum(lang_ok)"] or 0)
    n2 = int(agg["sum(s2)"] or 0)

    def keep_s2(batch: pa.Table) -> pa.Table:
        return batch.filter(_pc.equal(batch.column("s2"), 1)).select(
            ["digest", "code"]
        )

    kept = (
        mat.map_batches(keep_s2, batch_format="pyarrow")
        .groupby("digest")
        .min("code")
    )

    def keeper_clean(batch: pa.Table) -> pa.Table:
        c = batch.column("min(code)")
        return pa.table(
            {
                "one": pa.array([1] * batch.num_rows, pa.int64()),
                "clean": _pc.subtract(
                    pa.scalar(1, pa.int64()),
                    _pc.bit_wise_and(c, pa.scalar(1, pa.int64())),
                ),
            }
        )

    kagg = kept.map_batches(keeper_clean, batch_format="pyarrow").aggregate(
        Sum("one"), Sum("clean")
    )
    n3 = int(kagg["sum(one)"] or 0) if kagg else 0
    n4 = int(kagg["sum(clean)"] or 0) if kagg else 0

    out = pa.table(
        {
            "stage": pa.array(range(5), pa.int64()),
            "stage_name": pa.array(list(FUNNEL_STAGES), pa.string()),
            "docs": pa.array([n0, n1, n2, n3, n4], pa.int64()),
        }
    )
    return ray.data.from_arrow(out)


# ---------------------------------------------------------------------------
# train_stream_pack: the FULL trainer-input composition — corpus_funnel's
# surviving documents (language -> Gopher gate -> exact first-wins dedup
# keeper -> decontaminated) packed into fixed-capacity token sequences in
# the seeded shuffle order. The "what a user actually runs end-to-end"
# capstone: filter chain ∘ shuffle ∘ pack in one query.
# ---------------------------------------------------------------------------


@empty_guard("documents", doc_id=pa.int64(), n_tokens=pa.int64(), start_offset=pa.int64(), pack_id=pa.int64(), end_pack=pa.int64())
def train_stream_pack(sf_dir: str) -> "ray.data.Dataset":
    """Pack the corpus_funnel survivors in seeded-shuffle order.

    Scale shape: ONE streaming flag pass emits only the stage-2 survivor
    rows — four narrow columns (digest, code, n_tokens, shuffle key
    precomputed) regardless of document size; ONE digest groupby picks
    each duplicate group's keeper via the same ``min(doc_id*2 +
    (1-clean))`` encoding as corpus_funnel (the keeper's n_tokens rides
    along through a map_groups argmin, groups are duplicate-cardinality
    tiny); then the shared narrow sort + per-block prefix-scan pack
    (``_pack_sorted``). No full-corpus join, no driver-side doc state.
    """
    import numpy as np

    from ..functions.hashing import mix32_batch

    ref = _decon_bench_ref(sf_dir, augment=_funnel_augment)

    def flags(batch: pa.Table) -> pa.Table:
        bset = ray.get(ref)
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        langs = batch.column("lang").to_pylist()
        import hashlib

        digest, code, ntok, kept_ids = [], [], [], []
        for d, t, lg in zip(ids, texts, langs):
            if lg != FUNNEL_LANG:
                continue
            t = _funnel_augment(d, t)
            toks = _TOK_RE.findall(t.lower())
            stats = _gopher_stats(toks)
            if not stats[-1]:
                continue
            clean = d % DECON_BENCH_MOD != 0 and not (
                _decon_grams(_decon_augment(d, t)) & bset
            )
            digest.append(hashlib.md5(t.encode()).hexdigest())
            code.append(2 * d + (0 if clean else 1))
            ntok.append(stats[0])
            kept_ids.append(d)
        # shuffle key precomputed VECTORIZED here (one mix32_batch per
        # batch), so keeper stays a pure argmin row-pick
        keys = mix32_batch(
            np.asarray(kept_ids, dtype=np.uint64), SHUFFLE_SEED
        ).astype(np.int64)
        return pa.table(
            {
                "digest": pa.array(digest, pa.string()),
                "code": pa.array(code, pa.int64()),
                "n_tokens": pa.array(ntok, pa.int64()),
                "shuffle_key": pa.array(keys, pa.int64()),
            }
        )

    def keeper(tbl: pa.Table) -> pa.Table:
        codes = tbl.column("code").to_numpy(zero_copy_only=False)
        i = int(np.argmin(codes))
        if codes[i] & 1:  # the first-wins keeper is contaminated: drop group
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "shuffle_key": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "doc_id": pa.array([int(codes[i]) // 2], pa.int64()),
                "shuffle_key": pa.array(
                    [int(tbl.column("shuffle_key")[i].as_py())], pa.int64()
                ),
                "n_tokens": pa.array(
                    [int(tbl.column("n_tokens")[i].as_py())], pa.int64()
                ),
            }
        )

    counts = (
        _docs(sf_dir, ["doc_id", "text", "lang"])
        .map_batches(flags, batch_format="pyarrow")
        .groupby("digest")
        .map_groups(keeper, batch_format="pyarrow")
        .sort(["shuffle_key", "doc_id"])
        .materialize()
    )
    return _pack_sorted(counts)


# --- quality_c4 ---------------------------------------------------------------

C4_LINE_TOKENS = 8  # tokens per reconstructed line
C4_MIN_LINE_WORDS = 5  # C4: drop lines with fewer than 5 words
C4_MIN_KEPT_LINES = 3  # C4: drop docs with fewer than 3 kept sentences


def _c4_lines(doc_id: int, tokens: list) -> list:
    """Deterministic line view of a document plus the C4-relevant
    augmentations (the synthetic corpus is one unpunctuated line, so —
    like segment_dedup's boilerplate header — structure is injected so
    the driver checks REAL filter behavior, not a no-op):

    - tokens group into lines of C4_LINE_TOKENS;
    - line k 'ends with terminal punctuation' iff (doc_id + k) % 3 != 2;
    - doc_id % 13 == 6 prepends the tokens ['lorem', 'ipsum'] to line 0
      (C4's lorem-ipsum trap);
    - doc_id % 17 == 9 appends the token '{' to line 1 (curly-brace /
      code trap);
    - doc_id % 11 == 4 truncates line 2 to its first 3 tokens (the
      short-line trap).

    Returns [(n_words, ends_punct, has_lorem, has_brace), ...] per line.
    The SQL oracle reconstructs the identical lines with list slices.
    """
    out = []
    n = len(tokens)
    k = 0
    while k * C4_LINE_TOKENS < n:
        lt = tokens[k * C4_LINE_TOKENS : (k + 1) * C4_LINE_TOKENS]
        if doc_id % 13 == 6 and k == 0:
            lt = ["lorem", "ipsum"] + lt
        if doc_id % 17 == 9 and k == 1:
            lt = lt + ["{"]
        if doc_id % 11 == 4 and k == 2:
            lt = lt[:3]
        out.append(
            (
                len(lt),
                (doc_id + k) % 3 != 2,
                "lorem" in lt,
                "{" in lt,
            )
        )
        k += 1
    return out


@empty_guard(
    "documents",
    doc_id=pa.int64(),
    n_lines=pa.int64(),
    n_kept_lines=pa.int64(),
    n_kept_words=pa.int64(),
    keep=pa.bool_(),
)
def quality_c4(sf_dir: str) -> "ray.data.Dataset":
    """C4-style rule filter (Raffel et al. 2020 §2.2), the standard
    complement to the Gopher repetition gate: a line is kept iff it ends
    in terminal punctuation AND has >= 5 words AND is free of the
    lorem-ipsum and curly-brace traps; a document is kept iff >= 3 of its
    lines survive. Single streaming pass over a pruned (doc_id, text)
    scan — zero shuffle, nothing driver-side; the per-doc kernel is a
    token-slice scan over the line view."""

    def score(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        n_l, n_k, n_w, keep = [], [], [], []
        for d, t in zip(ids, texts):
            lines = _c4_lines(d, _TOK_RE.findall(t.lower()))
            kept = [
                nw
                for nw, punct, lorem, brace in lines
                if punct and nw >= C4_MIN_LINE_WORDS and not lorem and not brace
            ]
            n_l.append(len(lines))
            n_k.append(len(kept))
            n_w.append(sum(kept))
            keep.append(len(kept) >= C4_MIN_KEPT_LINES)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_lines": pa.array(n_l, pa.int64()),
                "n_kept_lines": pa.array(n_k, pa.int64()),
                "n_kept_words": pa.array(n_w, pa.int64()),
                "keep": pa.array(keep, pa.bool_()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(score, batch_format="pyarrow")


# --- temperature-based source mixing -----------------------------------------

TEMP_TAU = 0.7  # the multilingual-pretraining rebalancing exponent
TEMP_BUDGET_NUM, TEMP_BUDGET_DEN = 2, 5  # budget B = 2N // 5


@empty_guard(
    "documents", doc_id=pa.int64(), source=pa.string(), sel_rank=pa.int64()
)
def source_temperature_mix(sf_dir: str) -> "ray.data.Dataset":
    """Temperature-based source rebalancing (the XLM-R / mT5 sampling
    rule): per-source budget ∝ N_s^τ (τ=0.7 flattens the head so
    low-resource sources are over-represented), integerized by
    largest-remainder apportionment over a total budget B = 2N//5 and
    capped at N_s; each source then contributes its first alloc_s
    documents in the seeded global shuffle order (mix32(doc_id, seed) —
    the shuffle_order key, so the selection is a deterministic sample
    without replacement). Output: one row per selected doc
    (doc_id, source, sel_rank).

    Exactness: the ONLY float step is floor(pow(N_s, 0.7)·1000 + 0.5) —
    one libm pow per SOURCE, bit-identical between numpy and DuckDB on
    the verified platform (same contract as doc_surprisal's ln); every
    other step (apportionment, remainder ranking, rank-vs-alloc gate) is
    int64.

    100 TB design: pass 1 is a per-source count partial + one tiny
    exchange (sources are bounded — thousands, not corpus-scale), and
    the apportionment is a driver epilogue over that small table. Pass 2
    routes (doc_id, source) by source-hash and ranks within source by
    the mix key per bucket — one narrow exchange, no global sort; the
    broadcast state is the alloc dict (one int per source)."""
    import numpy as np

    from ..functions.hashing import mix32_batch
    from ..functions.urls import hash64_batch
    from ..stages.util import bucket_exchange, exchange_group_agg
    from .corpus import collect_table

    def cnt_partial(batch: pa.Table) -> pa.Table:
        c = Counter(batch.column("source").to_pylist())
        return pa.table(
            {
                "source": pa.array(list(c.keys()), pa.string()),
                "n": pa.array(list(c.values()), pa.int64()),
            }
        )

    counts = collect_table(
        exchange_group_agg(
            _docs(sf_dir, ["source"]).map_batches(
                cnt_partial, batch_format="pyarrow"
            ),
            ["source"],
            [("n", "sum")],
            nbuck=4,
        )
    )
    srcs = counts.column("source").to_pylist()
    ns = counts.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
    n_total = int(ns.sum())
    budget = TEMP_BUDGET_NUM * n_total // TEMP_BUDGET_DEN
    wm = np.floor(np.power(ns.astype(np.float64), TEMP_TAU) * 1000.0 + 0.5).astype(
        np.int64
    )
    w_tot = int(wm.sum())
    base = budget * wm // w_tot
    rem = (budget * wm) % w_tot
    # largest-remainder: top-k remainders get +1 (ties: remainder desc,
    # source asc — the oracle's ORDER BY rem DESC, source)
    order = sorted(range(len(srcs)), key=lambda i: (-int(rem[i]), srcs[i]))
    k = budget - int(base.sum())
    alloc = {s: int(b) for s, b in zip(srcs, base)}
    for i in order[:k]:
        alloc[srcs[i]] += 1
    for s, n in zip(srcs, ns):
        alloc[s] = min(alloc[s], int(n))  # never oversample a source

    NBUCK = 8

    def add_bucket(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        key = mix32_batch(ids.astype(np.uint64), SHUFFLE_SEED).astype(np.int64)
        h = hash64_batch(batch.column("source").to_pylist())
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "source": batch.column("source"),
                "mixh": pa.array(key, pa.int64()),
                "__sbucket": pa.array(
                    (h % np.uint64(NBUCK)).astype(np.int64), pa.int64()
                ),
            }
        )

    def select(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "source": pa.array([], pa.string()),
                "sel_rank": pa.array([], pa.int64()),
            }
        )
        if group.num_rows == 0:
            return empty
        d = group.column("doc_id").to_numpy(zero_copy_only=False)
        s = np.array(group.column("source").to_pylist())
        m = group.column("mixh").to_numpy(zero_copy_only=False)
        order = np.lexsort((d, m, s))
        ss, dd, mm = s[order], d[order], m[order]
        first = np.concatenate(([True], ss[1:] != ss[:-1]))
        seg = np.cumsum(first) - 1
        starts = np.flatnonzero(first)
        rank = np.arange(len(ss), dtype=np.int64) - starts[seg]
        amax = np.array([alloc.get(x, 0) for x in ss[starts]], np.int64)
        keep = rank < amax[seg]
        if not keep.any():
            return empty
        return pa.table(
            {
                "doc_id": pa.array(dd[keep], pa.int64()),
                "source": pa.array(ss[keep], pa.string()),
                "sel_rank": pa.array(rank[keep], pa.int64()),
            }
        )

    return bucket_exchange(
        _docs(sf_dir, ["doc_id", "source"])
        .map_batches(add_bucket, batch_format="pyarrow")
        .materialize(),
        "__sbucket",
        NBUCK,
        select,
    )


# --- incremental (snapshot) dedup --------------------------------------------

INCR_BASE_MOD = 3  # doc_id % 3 != 0 -> existing snapshot; == 0 -> new batch
# second injection family: 51 ≡ 0 (mod 3), so every doc_id % 51 == 0 doc
# lands in the INCOMING batch — guaranteeing the dup_batch verdict fires
# (the % 41 family always has snapshot members, so it only exercises
# dup_base). Precedence: the % 41 replacement wins when both match
# (first CRT collision is doc_id 663; mirrored by the oracle's CASE).
INCR_BATCH_DUP_MOD = 51
INCR_BATCH_DUP_TEXT = (
    "batch only duplicate body red orange yellow green blue indigo violet"
    " crimson amber teal navy maroon olive silver golden copper bronze"
    " shared within one incoming wave only never in the snapshot side"
)


def _incr_augment(doc_id: int, text: str) -> str:
    if doc_id % FUNNEL_DUP_MOD == FUNNEL_DUP_REM:
        return FUNNEL_DUP_TEXT
    if doc_id % INCR_BATCH_DUP_MOD == 0:
        return INCR_BATCH_DUP_TEXT
    return text


@empty_guard("documents", doc_id=pa.int64(), status=pa.string())
def dedup_incremental(sf_dir: str) -> "ray.data.Dataset":
    """Incremental dedup of a NEW crawl batch against an EXISTING corpus
    snapshot — the steady-state shape of a resumable 10^10-URL crawl,
    where every wave dedups against everything already ingested, not
    against itself alone. The deterministic split: ``doc_id % 3 != 0`` is
    the snapshot, ``% 3 == 0`` is the incoming batch; the corpus_funnel
    duplicate augmentation (doc_id % 41 == 7 → one shared body) supplies
    guaranteed cross-side duplicates at every scale. Per incoming doc:

    - ``dup_base``  — its content already exists in the snapshot;
    - ``dup_batch`` — new content, but an earlier (smaller doc_id)
      incoming doc in the same batch has it (first-wins);
    - ``novel``     — first appearance anywhere.

    100 TB design: ONE side-tagged digest-bucket exchange (the
    dedup_exact shape) — snapshot rows carry only (digest, is_base), so
    the wire is narrow; the per-bucket kernel is a numpy segment scan
    (any-base flag + min-incoming-id per digest). Text equality is keyed
    by the 128-bit content digest; the oracle joins on the text itself —
    identical verdicts unless blake2b collides."""
    import numpy as np

    from ..functions.hashing import stable_text_digest
    from ..stages.util import bucket_exchange

    NBUCK = 16

    def prep(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = [
            _incr_augment(int(d), t)
            for d, t in zip(ids, batch.column("text").to_pylist())
        ]
        dig = np.frombuffer(
            b"".join(stable_text_digest(texts)), dtype=np.uint64
        ).reshape(-1, 2)
        key = dig[:, 0] ^ dig[:, 1]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "dkey": pa.array(key.view(np.int64), pa.int64()),
                "dkey2": pa.array(dig[:, 0].view(np.int64), pa.int64()),
                "is_base": pa.array(ids % INCR_BASE_MOD != 0, pa.bool_()),
                "__dbucket": pa.array(
                    (key % np.uint64(NBUCK)).astype(np.int64), pa.int64()
                ),
            }
        )

    def verdicts(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "status": pa.array([], pa.string()),
            }
        )
        if group.num_rows == 0:
            return empty
        d = group.column("doc_id").to_numpy(zero_copy_only=False)
        k1 = group.column("dkey").to_numpy(zero_copy_only=False)
        k2 = group.column("dkey2").to_numpy(zero_copy_only=False)
        isb = group.column("is_base").to_numpy(zero_copy_only=False).astype(bool)
        order = np.lexsort((d, k2, k1))
        ds, k1s, k2s, bs = d[order], k1[order], k2[order], isb[order]
        first = np.concatenate(
            ([True], (k1s[1:] != k1s[:-1]) | (k2s[1:] != k2s[:-1]))
        )
        seg = np.cumsum(first) - 1
        nseg = int(seg[-1]) + 1
        base_in_seg = np.zeros(nseg, bool)
        np.logical_or.at(base_in_seg, seg, bs)
        # first INCOMING doc per segment, vectorized: incoming rows are
        # doc_id-sorted within a segment, so the first element of each
        # run of inc_seg is the min-doc incoming row
        inc = ~bs
        inc_idx = np.flatnonzero(inc)
        first_inc = np.zeros(len(ds), bool)
        if len(inc_idx):
            inc_seg = seg[inc_idx]
            run_start = np.concatenate(([True], inc_seg[1:] != inc_seg[:-1]))
            first_inc[inc_idx[run_start]] = True
        status = np.where(
            base_in_seg[seg],
            "dup_base",
            np.where(first_inc, "novel", "dup_batch"),
        )
        return pa.table(
            {
                "doc_id": pa.array(ds[inc], pa.int64()),
                "status": pa.array(status[inc].tolist(), pa.string()),
            }
        )

    return bucket_exchange(
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(prep, batch_format="pyarrow")
        .materialize(),
        "__dbucket",
        NBUCK,
        verdicts,
    )


# --- sequence-length bucketing ------------------------------------------------


@empty_guard(
    "documents",
    bucket=pa.int64(),
    lo=pa.int64(),
    hi=pa.int64(),
    n_docs=pa.int64(),
    n_tokens=pa.int64(),
)
def length_buckets(sf_dir: str) -> "ray.data.Dataset":
    """Power-of-2 sequence-length histogram — the planning statistic
    behind length-grouped batching (docs of similar token count batch
    together to minimize padding): bucket b holds docs with token count
    in [2^b, 2^(b+1)) (bucket 0 additionally holds n = 1; zero-token
    docs are absent, the house convention). Output per non-empty bucket:
    (bucket, lo, hi, n_docs, n_tokens).

    100 TB design: per-batch int partials (one row per ~30 buckets at
    most) + one integer-keyed exchange — constant-size wire regardless
    of corpus size."""
    import numpy as np

    from ..stages.util import exchange_sum_by_key

    def partial(batch: pa.Table) -> pa.Table:
        counts = np.array(
            [
                len(_TOK_RE.findall((t or "").lower()))
                for t in batch.column("text").to_pylist()
            ],
            dtype=np.int64,
        )
        counts = counts[counts > 0]
        if not len(counts):
            return pa.table(
                {
                    "bucket": pa.array([], pa.int64()),
                    "n_docs": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                }
            )
        # exact integer bucket = bit_length(n) - 1: frexp's exponent is
        # exact for ints < 2^53, unlike floor(log2(n)) which can round up
        # at 2^k - 1 boundaries; the oracle uses printf('%b') length
        b = (np.frexp(counts.astype(np.float64))[1] - 1).astype(np.int64)
        uniq, inv = np.unique(b, return_inverse=True)
        return pa.table(
            {
                "bucket": pa.array(uniq, pa.int64()),
                "n_docs": pa.array(np.bincount(inv).astype(np.int64), pa.int64()),
                "n_tokens": pa.array(
                    np.bincount(inv, weights=counts).astype(np.int64), pa.int64()
                ),
            }
        )

    summed = exchange_sum_by_key(
        _docs(sf_dir, ["text"]).map_batches(partial, batch_format="pyarrow"),
        "bucket",
        nbuck=2,
    )

    def finish(batch: pa.Table) -> pa.Table:
        b = batch.column("bucket").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket": batch.column("bucket"),
                "lo": pa.array((np.int64(1) << b), pa.int64()),
                "hi": pa.array((np.int64(1) << (b + 1)) - 1, pa.int64()),
                "n_docs": batch.column("n_docs"),
                "n_tokens": batch.column("n_tokens"),
            }
        )

    return summed.map_batches(finish, batch_format="pyarrow")
