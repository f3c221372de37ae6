"""RAG / training-corpus preparation operators: token-window chunking,
segment-level (paragraph-analog) dedup, text normalization, and int8
embedding quantization.

All four are beyond-reference first-class pipeline operators (SURVEY.md
§2.8 family). Design for 100 TB:

- ``doc_chunk``: one streaming ``map_batches`` pass over a pruned
  (doc_id, text) scan — embarrassingly parallel, zero shuffle. Windows
  are token-positional (size 32, stride 24), the standard RAG chunker
  shape; the output fans out ~1.5-4x rows but each block stays bounded
  because chunk text is a slice of its source block.
- ``segment_dedup``: paragraph-level exact dedup (RefinedWeb / CCNet
  shape) re-expressed over non-overlapping 16-token segments (the
  synthetic docs are single-line, so fixed windows stand in for
  paragraph splits). Two narrow exchanges only: one digest-bucket
  exchange to pick the global first occurrence per distinct segment
  (min (doc_id, seg_id) — deterministic first-wins), then an int-keyed
  groupby to roll dropped/kept token counts back up per document.
  Nothing driver-side; the exchanged rows are (digest, ids, counts).
- ``text_normalize``: NFC + lowercase + whitespace-collapse canonical
  form with an md5 content digest — single streaming pass, no shuffle.
  The canonicalization order (collapse RE2-\\s+ -> trim -> lower -> NFC)
  is mirrored step-for-step by the SQL oracle.
- ``embedding_quantize``: symmetric per-vector int8 quantization
  (scale = max|v| / 127, code = floor(v/scale + 0.5)) — the standard
  scalar-quantization kernel used to shrink ANN indexes 4x. Vectorized
  numpy over float64 so every arithmetic step (cast, max, divide,
  floor) is the IEEE-double expression the DuckDB oracle evaluates;
  emitted stats (sum/abs-sum/saturation counts) are exact integers.

Like ``pii_redact``/``decontaminate`` (textprep.py), the text operators
inject a deterministic augmentation first — a shared 16-word boilerplate
header for ``doc_id % 7 == 3`` (segment_dedup) and a decomposed-accent
suffix for ``doc_id % 5 == 0`` (text_normalize) — because the synthetic
corpus has no natural cross-doc duplicate paragraphs or non-NFC bytes.
The SQL oracles apply the identical expression, so the driver
hash-checks real behavior, not a no-op.
"""

from __future__ import annotations

import hashlib
import re
import unicodedata

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..functions.urls import hash64_batch
from ..stages.util import bucket_exchange, empty_guard
from .corpus import _docs, _emb

__all__ = [
    "doc_chunk",
    "segment_dedup",
    "text_normalize",
    "embedding_quantize",
]

# RE2 (DuckDB) whitespace is exactly [ \t\n\f\r] — narrower than both
# Python's \s under re.ASCII (adds \v) and str.split() (all Unicode
# whitespace incl. \xa0). The kernels tokenize with the RE2 class so
# engine ≡ oracle holds on ARBITRARY bytes, not just the space-separated
# ASCII fixture (pinned by tests/test_ragprep_ops.py adversarial parity).
_RS_TOKEN_RE = re.compile(r"[^ \t\n\f\r]+")
_RS_WS_RE = re.compile(r"[ \t\n\f\r]+")


def _rs_tokens(text: str) -> list:
    return _RS_TOKEN_RE.findall(text)


# --- doc_chunk ---------------------------------------------------------------

CHUNK_SIZE = 32  # tokens per window
CHUNK_STRIDE = 24  # window start step (overlap = 8 tokens)


@empty_guard(
    "documents",
    doc_id=pa.int64(),
    chunk_id=pa.int64(),
    n_tokens=pa.int64(),
    chunk_text=pa.string(),
)
def doc_chunk(sf_dir: str) -> "ray.data.Dataset":
    """Overlapping token-window chunking (RAG retrieval-unit shape).

    Window k covers whitespace tokens [k*STRIDE, k*STRIDE + SIZE); the
    number of windows is 1 for n <= SIZE else ceil((n-SIZE)/STRIDE)+1,
    so the final window always reaches the last token and every token
    is covered. Empty/whitespace-only docs emit zero chunks (matching
    the oracle's ``len(tk) > 0`` filter).
    """

    def chunk(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        o_id, o_ck, o_nt, o_tx = [], [], [], []
        for d, t in zip(ids, texts):
            tk = _rs_tokens(t)
            n = len(tk)
            if n == 0:
                continue
            n_chunks = 1 if n <= CHUNK_SIZE else (n - CHUNK_SIZE + CHUNK_STRIDE - 1) // CHUNK_STRIDE + 1
            for k in range(n_chunks):
                s = k * CHUNK_STRIDE
                w = tk[s : s + CHUNK_SIZE]
                o_id.append(d)
                o_ck.append(k)
                o_nt.append(len(w))
                o_tx.append(" ".join(w))
        return pa.table(
            {
                "doc_id": pa.array(o_id, pa.int64()),
                "chunk_id": pa.array(o_ck, pa.int64()),
                "n_tokens": pa.array(o_nt, pa.int64()),
                "chunk_text": pa.array(o_tx, pa.string()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(chunk, batch_format="pyarrow")


# --- segment_dedup -----------------------------------------------------------

SEG_SIZE = 16  # tokens per non-overlapping segment
# 16-word shared header simulating the boilerplate paragraph that
# paragraph-dedup exists to remove; mirrored verbatim in the SQL oracle.
SEG_BOILERPLATE = (
    "all rights reserved this page is part of the example corpus "
    "please see terms for details"
)
_N_BOILER_WORDS = len(SEG_BOILERPLATE.split())
assert _N_BOILER_WORDS == SEG_SIZE

# seg_id packs into the low bits of the first-wins ordering key; 2**20
# segments/doc = 16M tokens/doc headroom.
_SEG_ID_BITS = 20


def _seg_augment(doc_id: int, text: str) -> str:
    return (SEG_BOILERPLATE + " " + text) if doc_id % 7 == 3 else text


@empty_guard(
    "documents",
    doc_id=pa.int64(),
    n_segments=pa.int64(),
    n_dup_segments=pa.int64(),
    n_tokens_total=pa.int64(),
    n_tokens_kept=pa.int64(),
)
def segment_dedup(sf_dir: str, n_buckets: int = 32) -> "ray.data.Dataset":
    """Paragraph-level exact dedup over 16-token segments: global
    first-wins (min (doc_id, seg_id)) per distinct segment, rolled up to
    per-document kept/dropped token counts.

    Stage 1 (map): explode docs -> (digest, order-key, counts) rows.
    Stage 2 (digest-bucket exchange): within each bucket every row of a
    digest is present, so first-wins is a local argmin — emit per-row
    dropped flags. Stage 3 (int-keyed groupby): per-doc sums.
    """
    from ray.data.aggregate import Count, Sum

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        segs, o_key, o_nt = [], [], []
        for d, t in zip(ids, texts):
            tk = _rs_tokens(_seg_augment(d, t))
            n = len(tk)
            for k in range((n + SEG_SIZE - 1) // SEG_SIZE):
                w = tk[k * SEG_SIZE : (k + 1) * SEG_SIZE]
                segs.append(" ".join(w))
                o_key.append((d << _SEG_ID_BITS) | k)
                o_nt.append(len(w))
        h = hash64_batch(segs)
        dg = [hashlib.blake2b(s.encode(), digest_size=16).hexdigest() for s in segs]
        return pa.table(
            {
                "digest": pa.array(dg, pa.string()),
                "bucket": pa.array((h % np.uint64(n_buckets)).astype(np.int64)),
                "okey": pa.array(o_key, pa.int64()),
                "n_toks": pa.array(o_nt, pa.int64()),
            }
        )

    def first_wins(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "dropped": pa.array([], pa.int64()),
                    "n_toks": pa.array([], pa.int64()),
                }
            )
        dg = tbl.column("digest").combine_chunks().to_numpy(zero_copy_only=False)
        okey = tbl.column("okey").combine_chunks().to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(dg, return_inverse=True)
        keeper = np.full(len(uniq), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(keeper, inv, okey)
        dropped = (okey != keeper[inv]).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(okey >> _SEG_ID_BITS, pa.int64()),
                "dropped": pa.array(dropped, pa.int64()),
                "n_toks": tbl.column("n_toks"),
            }
        )

    import pyarrow.compute as pc

    def rollup_types(batch: pa.Table) -> pa.Table:
        kept = pc.subtract(batch.column("n_tokens_total"), batch.column("n_tokens_dropped"))
        return pa.table(
            {
                "doc_id": pc.cast(batch.column("doc_id"), pa.int64()),
                "n_segments": pc.cast(batch.column("n_segments"), pa.int64()),
                "n_dup_segments": pc.cast(batch.column("n_dup_segments"), pa.int64()),
                "n_tokens_total": pc.cast(batch.column("n_tokens_total"), pa.int64()),
                "n_tokens_kept": pc.cast(kept, pa.int64()),
            }
        )

    mat = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(explode, batch_format="pyarrow")
        .materialize()
    )
    marked = bucket_exchange(mat, "bucket", n_buckets, first_wins)

    def dropped_toks(batch: pa.Table) -> pa.Table:
        dt = pc.multiply(batch.column("dropped"), batch.column("n_toks"))
        return batch.append_column("dropped_toks", dt)

    return (
        marked.map_batches(dropped_toks, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(
            Count(alias_name="n_segments"),
            Sum("dropped", alias_name="n_dup_segments"),
            Sum("n_toks", alias_name="n_tokens_total"),
            Sum("dropped_toks", alias_name="n_tokens_dropped"),
        )
        .map_batches(rollup_types, batch_format="pyarrow")
    )


# --- text_normalize ----------------------------------------------------------

# decomposed-accent + double-space + uppercase suffix so the NFC /
# collapse / lower steps each have real work; oracle mirrors with
# chr(769) (combining acute).
_NORM_SUFFIX = " Cafe\u0301  TEST"  # decomposed e + combining acute


def _norm_augment(doc_id: int, text: str) -> str:
    return (text + _NORM_SUFFIX) if doc_id % 5 == 0 else text


@empty_guard(
    "documents",
    doc_id=pa.int64(),
    n_chars_norm=pa.int64(),
    digest=pa.string(),
    changed=pa.bool_(),
)
def text_normalize(sf_dir: str) -> "ray.data.Dataset":
    """Canonical text form: collapse whitespace -> trim -> lowercase ->
    NFC, with an md5 digest of the result. Single streaming pass.

    Collapse runs BEFORE trim so the oracle's space-only ``trim()``
    is exactly equivalent (any leading/trailing whitespace run has
    already become a single space)."""

    def norm(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        n_chars, digests, changed = [], [], []
        for d, t in zip(ids, texts):
            aug = _norm_augment(d, t)
            s = unicodedata.normalize("NFC", _RS_WS_RE.sub(" ", aug).strip(" ").lower())
            n_chars.append(len(s))
            digests.append(hashlib.md5(s.encode("utf-8")).hexdigest())
            changed.append(s != aug)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_chars_norm": pa.array(n_chars, pa.int64()),
                "digest": pa.array(digests, pa.string()),
                "changed": pa.array(changed, pa.bool_()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(norm, batch_format="pyarrow")


# --- embedding_quantize ------------------------------------------------------


@empty_guard(
    "embeddings",
    vec_id=pa.int64(),
    n_dims=pa.int64(),
    scale=pa.float64(),
    sum_codes=pa.int64(),
    sum_abs_codes=pa.int64(),
    n_saturated=pa.int64(),
)
def embedding_quantize(sf_dir: str) -> "ray.data.Dataset":
    """Symmetric per-vector int8 quantization stats.

    scale = max|v| / 127 in float64; code = floor(v/scale + 0.5) (half-up,
    the deterministic expression shared with the oracle — NOT numpy's
    banker's rounding). All-zero vectors get scale 0 and all-zero codes.
    """

    def quant(batch: pa.Table) -> pa.Table:
        emb = batch.column("embedding").combine_chunks()
        m = np.array(emb.to_numpy(zero_copy_only=False).tolist(), dtype=np.float64)
        if m.ndim == 1:  # zero rows
            m = m.reshape(0, 0)
        scale = np.abs(m).max(axis=1, initial=0.0) / 127.0
        safe = np.where(scale == 0.0, 1.0, scale)
        codes = np.floor(m / safe[:, None] + 0.5)
        codes[scale == 0.0, :] = 0.0
        ic = codes.astype(np.int64)
        return pa.table(
            {
                "vec_id": batch.column("vec_id"),
                "n_dims": pa.array(np.full(m.shape[0], m.shape[1], np.int64)),
                "scale": pa.array(scale, pa.float64()),
                "sum_codes": pa.array(ic.sum(axis=1)),
                "sum_abs_codes": pa.array(np.abs(ic).sum(axis=1)),
                "n_saturated": pa.array((np.abs(ic) == 127).sum(axis=1).astype(np.int64)),
            }
        )

    return _emb(sf_dir, ["vec_id", "embedding"]).map_batches(quant, batch_format="pyarrow")
