"""Model inference at corpus scale: the actor-pool scoring pattern.

``quality_classifier`` runs a deterministic hashed bag-of-words linear
classifier (the fastText-/CCNet-quality-filter shape) over every
document. The point of the operator is the EXECUTION pattern the 100 TB
brief calls out as first-class: a stateful ``map_batches`` ACTOR POOL
where the "model load" — materializing the weight vector — happens once
per actor in ``__init__``, and ``__call__`` does only vectorized batch
scoring. Swapping the deterministic weights for a real checkpoint file
changes ``__init__`` only; the Ray plumbing (actor pool, batch size,
zero-shuffle streaming pass, milli fixed-point outputs) is the real
thing and is hash-checked by the DuckDB oracle.

Model: token → poly32 hash bucket (``N_BUCKETS``); bucket b carries an
integer milli weight ``mix32(b, W_SEED) % 2001 − 1000`` ∈ [−1000, 1000];
doc logit = Σ over token occurrences of its bucket weight; keep iff
logit ≥ 0. Every step is integer-exact, so the oracle replays it
bit-for-bit (``_POLY_HASH`` + ``_mix_sql`` in ``__ray_entry__``).

100 TB design: ONE streaming ``map_batches`` pass over a pruned
(doc_id, text) scan — no exchange at all (each doc's score depends only
on its own text). The weight table is N_BUCKETS ints built per actor
(never shipped per batch); the token→bucket map is memoized per actor so
a hot token hashes once per actor lifetime, not once per occurrence.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..functions.hashing import mix32_batch, poly_hash_batch
from ..stages.util import empty_guard
from .corpus import _TOK_RE, _docs

__all__ = ["QualityClassifierStage", "quality_classifier", "N_BUCKETS", "W_SEED"]

N_BUCKETS = 1024
W_SEED = 77


class QualityClassifierStage:
    """Callable-class stage for ``map_batches(..., concurrency=N)``:
    weights materialize ONCE per actor here (the model-load slot);
    ``__call__`` is the per-batch scoring kernel."""

    def __init__(self, n_buckets: int = N_BUCKETS, seed: int = W_SEED):
        b = np.arange(n_buckets, dtype=np.uint64)
        self.w = (mix32_batch(b, seed) % np.uint64(2001)).astype(np.int64) - 1000
        self.n_buckets = n_buckets
        self._bucket_memo: dict = {}

    def _buckets(self, tokens: list) -> np.ndarray:
        memo = self._bucket_memo
        missing = [t for t in tokens if t not in memo]
        if missing:
            uniq = list(dict.fromkeys(missing))
            hb = poly_hash_batch(uniq).astype(np.int64) % self.n_buckets
            memo.update(zip(uniq, hb))
        return np.fromiter(
            (memo[t] for t in tokens), dtype=np.int64, count=len(tokens)
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, toks, bounds = [], [], [0]
        for did, txt in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            ts = _TOK_RE.findall((txt or "").lower())
            if not ts:
                continue  # zero-token docs absent (oracle convention)
            ids.append(did)
            toks.extend(ts)
            bounds.append(len(toks))
        if not ids:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "logit_milli": pa.array([], pa.int64()),
                    "keep": pa.array([], pa.bool_()),
                }
            )
        wv = self.w[self._buckets(toks)]
        starts = np.asarray(bounds[:-1], dtype=np.int64)
        logits = np.add.reduceat(wv, starts)
        n_tok = np.diff(np.asarray(bounds, dtype=np.int64))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": pa.array(n_tok, pa.int64()),
                "logit_milli": pa.array(logits, pa.int64()),
                "keep": pa.array(logits >= 0, pa.bool_()),
            }
        )


@empty_guard(
    "documents",
    doc_id=pa.int64(),
    n_tokens=pa.int64(),
    logit_milli=pa.int64(),
    keep=pa.bool_(),
)
def quality_classifier(sf_dir: str) -> "ray.data.Dataset":
    """Score every document with the hashed linear classifier (see module
    docstring). Actor-pool execution: ``concurrency=(1, 4)`` autoscales
    between one and four warm scorer actors (each holding the weight
    table + token memo) — the min=1 floor matters on small CPU budgets,
    where a FIXED pool of 4 one-CPU actors would hold every core and
    starve the upstream read tasks (streaming-executor deadlock)."""
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        QualityClassifierStage,
        batch_format="pyarrow",
        concurrency=(1, 4),
        batch_size=256,
    )
