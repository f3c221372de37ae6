"""Embedding clustering + LSH-bucketed similarity search.

Beyond-reference training-data operators (prompt §"add the operations"):

- ``embedding_kmeans`` — distributed Lloyd k-means over the embeddings
  table in **fixed-point int64** arithmetic, so every assignment and
  centroid update is bit-identical on any block layout, any cluster
  size, AND in the DuckDB replay (no float-summation-order hazard).
  The per-iteration shuffle carries only O(k x d) partial sums — the
  classic "centroid state is tiny, data is huge" shape that holds at
  100 TB (the data passes stream; nothing per-row ever reaches the
  driver).
- ``ann_topk_lsh`` — sign-random-projection LSH (Charikar 2002) as the
  bucketed scale path for similarity search: NT hash tables of NB-bit
  hyperplane-sign codes; only (query, vector) pairs that collide in at
  least one table get an exact cosine — per-batch sim work is the
  candidate fraction of brute force (measured by
  ``lsh_planned_sim_fraction``, pinned in tests). The hyperplanes have
  +-1 entries drawn from the repo's mix32 integer avalanche, so a SQL
  oracle replays code construction bit-for-bit.

Both read only ``vec_id, embedding`` (pruned scan) and never
materialize the dataset driver-side.
"""

from __future__ import annotations

import os
from typing import Dict, List, Tuple

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..stages.util import empty_guard
from ..functions.hashing import mix32_batch
from .corpus import (
    ANN_NUM_QUERIES,
    ANN_TOP_K,
    _emb,
    _list_col_matrix,
    _load_embedding_matrix,
)

__all__ = [
    "embedding_kmeans",
    "semantic_dedup",
    "ann_topk_lsh",
    "lsh_planned_sim_fraction",
    "embedding_covariance",
]

FP_SCALE = 1_000_000  # embedding fixed-point scale (floor(x*1e6 + 0.5))
KMEANS_K = 8
KMEANS_ITERS = 2  # assignment rounds (one centroid update between them)

LSH_TABLES = 4
LSH_BITS = 8
LSH_SALT = 77


def _fp_matrix(col) -> np.ndarray:
    """list<float> column -> (n, d) int64 fixed-point matrix, the shared
    floor(x*1e6 + 0.5) formula (float32 -> float64 cast is exact on both
    sides)."""
    m = _list_col_matrix(col)
    return np.floor(m * FP_SCALE + 0.5).astype(np.int64)


def _dist2(x_fp: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """(n, k) int64 squared L2 distances — exact integer arithmetic
    (|x_fp| <= ~1e7, 64 dims: every term < 2^63)."""
    xx = (x_fp * x_fp).sum(axis=1)[:, None]
    cc = (cents * cents).sum(axis=1)[None, :]
    return xx - 2 * (x_fp @ cents.T) + cc


def _init_centroids(sf_dir: str, k: int) -> np.ndarray:
    """Deterministic init: the vectors at vec_id = j * (n // k) — a tiny
    keyed pushdown read (at 100 TB this stays k rows)."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    ds = pads.dataset(os.path.join(sf_dir, "embeddings.parquet"), format="parquet")
    n = ds.count_rows()
    step = n // k
    want = pa.array([j * step for j in range(k)], pa.int64())
    t = ds.to_table(
        columns=["vec_id", "embedding"], filter=pc.field("vec_id").isin(want)
    )
    order = np.argsort(np.asarray(t.column("vec_id"), dtype=np.int64))
    return _fp_matrix(t.column("embedding"))[order]


def _train_centroids(sf_dir: str, k: int, iters: int) -> np.ndarray:
    """``iters - 1`` distributed centroid-update rounds from the
    deterministic init — the shared training front-half of
    ``embedding_kmeans`` and ``semantic_dedup``. Per round the only
    shuffle is (cluster, dim, partial-sum) rows -> ``groupby.sum`` to
    k x d cells; new centroid = floor(sum / count) (exact: sums < 2^53 so
    the double division floors correctly), empty clusters keep their
    previous centroid."""
    from ray.data.aggregate import Sum

    cents = _init_centroids(sf_dir, k)

    for _ in range(iters - 1):
        cref = ray.put(cents)

        def partials(batch: pa.Table, _cref=cref) -> pa.Table:
            C = ray.get(_cref)
            x = _fp_matrix(batch.column("embedding"))
            if not len(x):
                return pa.table(
                    {
                        "cluster": pa.array([], pa.int64()),
                        "dim": pa.array([], pa.int64()),
                        "s": pa.array([], pa.int64()),
                    }
                )
            assign = np.argmin(_dist2(x, C), axis=1)  # ties -> lowest cid
            cl, dims, sums = [], [], []
            for j in np.unique(assign):
                member_sum = x[assign == j].sum(axis=0)  # exact int64
                d = x.shape[1]
                cl.extend([int(j)] * (d + 1))
                dims.extend(range(1, d + 1))
                sums.extend(member_sum.tolist())
                dims.append(0)  # dim 0 carries the member count
                sums.append(int((assign == j).sum()))
            return pa.table(
                {
                    "cluster": pa.array(cl, pa.int64()),
                    "dim": pa.array(dims, pa.int64()),
                    "s": pa.array(sums, pa.int64()),
                }
            )

        cells = (
            _emb(sf_dir, ["embedding"])
            .map_batches(partials, batch_format="pyarrow")
            .groupby(["cluster", "dim"])
            .aggregate(Sum("s", alias_name="s"))
            .to_arrow_refs()
        )
        tbl = pa.concat_tables([t for t in ray.get(cells) if t.num_rows])
        cl = np.asarray(tbl.column("cluster"), dtype=np.int64)
        dim = np.asarray(tbl.column("dim"), dtype=np.int64)
        s = np.asarray(tbl.column("s"), dtype=np.int64)
        counts = np.zeros(k, dtype=np.int64)
        counts[cl[dim == 0]] = s[dim == 0]
        new = cents.copy()  # empty clusters keep their centroid
        mask = dim > 0
        sums = np.zeros((k, cents.shape[1]), dtype=np.int64)
        sums[cl[mask], dim[mask] - 1] = s[mask]
        nonempty = counts > 0
        new[nonempty] = np.floor(
            sums[nonempty].astype(np.float64) / counts[nonempty, None]
        ).astype(np.int64)
        cents = new
    return cents


@empty_guard("embeddings", vec_id=pa.int64(), cluster_id=pa.int64(), dist2=pa.int64())
def embedding_kmeans(
    sf_dir: str, k: int = KMEANS_K, iters: int = KMEANS_ITERS
) -> "ray.data.Dataset":
    """Distributed fixed-point k-means: ``iters`` assignment rounds with a
    centroid update between consecutive rounds (see ``_train_centroids``
    for the update shuffle shape). Returns the final (vec_id, cluster_id,
    dist2) assignment as a streaming Dataset."""
    cents = _train_centroids(sf_dir, k, iters)
    fref = ray.put(cents)

    def assign_rows(batch: pa.Table) -> pa.Table:
        C = ray.get(fref)
        ids = np.asarray(batch.column("vec_id"), dtype=np.int64)
        x = _fp_matrix(batch.column("embedding"))
        if not len(ids):
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "cluster_id": pa.array([], pa.int64()),
                    "dist2": pa.array([], pa.int64()),
                }
            )
        d2 = _dist2(x, C)
        assign = np.argmin(d2, axis=1)
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "cluster_id": pa.array(assign.astype(np.int64), pa.int64()),
                "dist2": pa.array(d2[np.arange(len(ids)), assign], pa.int64()),
            }
        )

    return _emb(sf_dir, ["vec_id", "embedding"]).map_batches(
        assign_rows, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# sign-random-projection LSH ANN
# ---------------------------------------------------------------------------


def _lsh_signs(d: int) -> np.ndarray:
    """(NT, NB, d) +-1 hyperplane entries from mix32(t*10007 + b*257 + dim,
    LSH_SALT) & 1 — dim is 1-based so the SQL replay indexes lists
    directly. Key ranges never collide (dim <= 256 < 257, b*257 < 10007)."""
    t = np.arange(LSH_TABLES, dtype=np.int64)[:, None, None]
    b = np.arange(LSH_BITS, dtype=np.int64)[None, :, None]
    dim = np.arange(1, d + 1, dtype=np.int64)[None, None, :]
    keys = (t * 10007 + b * 257 + dim).reshape(-1)
    bits = (mix32_batch(keys, LSH_SALT) & np.uint64(1)).astype(np.int64)
    return (bits * 2 - 1).reshape(LSH_TABLES, LSH_BITS, d)


def _lsh_codes(x_fp: np.ndarray, signs: np.ndarray) -> np.ndarray:
    """(n, NT) int64 bucket codes: bit b of table t is 1 iff
    sum_d signs[t,b,d] * x_fp[d] > 0 (exact int64 — no float order
    hazard)."""
    # (NT*NB, d) @ (d, n) -> (NT, NB, n)
    dots = (signs.reshape(-1, signs.shape[2]) @ x_fp.T).reshape(
        signs.shape[0], signs.shape[1], -1
    )
    bits = (dots > 0).astype(np.int64)
    weights = (1 << np.arange(LSH_BITS, dtype=np.int64))[None, :, None]
    return (bits * weights).sum(axis=1).T  # (n, NT)


def _query_side(sf_dir: str):
    ids, mat = _load_embedding_matrix(sf_dir)
    signs = _lsh_signs(mat.shape[1])
    qmask = ids < ANN_NUM_QUERIES
    q_ids, q_mat = ids[qmask], mat[qmask]
    q_fp = np.floor(q_mat * FP_SCALE + 0.5).astype(np.int64)
    q_codes = _lsh_codes(q_fp, signs)
    return q_ids, q_mat, q_codes, signs


def lsh_planned_sim_fraction(sf_dir: str) -> float:
    """Fraction of the nq x n exact-sim work the LSH candidate set keeps —
    the compute saving that justifies the bucketing (pinned << 1 in
    tests)."""
    q_ids, _q_mat, q_codes, signs = _query_side(sf_dir)
    ids, mat = _load_embedding_matrix(sf_dir)
    codes = _lsh_codes(np.floor(mat * FP_SCALE + 0.5).astype(np.int64), signs)
    match = (q_codes[:, None, :] == codes[None, :, :]).any(axis=2)
    return float(match.sum()) / float(len(q_ids) * len(ids))


@empty_guard("embeddings", query_id=pa.int64(), vec_id=pa.int64(), sim_e4=pa.int64())
def ann_topk_lsh(sf_dir: str) -> "ray.data.Dataset":
    """LSH-bucketed cosine top-k: exact sims computed ONLY for (query,
    vector) pairs whose codes collide in >= 1 of the NT tables; per-batch
    top-k prune, then one groupby(query_id) merge. Queries with fewer
    than k candidates return fewer rows — the SQL oracle replays the
    identical candidate set, so the driver hash still matches."""
    q_ids, q_mat, q_codes, signs = _query_side(sf_dir)
    q_norms = np.sqrt((q_mat * q_mat).sum(axis=1))
    bref = ray.put((q_ids, q_mat, q_norms, q_codes, signs))
    k = ANN_TOP_K

    def score(batch: pa.Table) -> pa.Table:
        qi_ids, qm, qn, qc, S = ray.get(bref)
        bids = np.asarray(batch.column("vec_id"), dtype=np.int64)
        empty = pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
                "sim": pa.array([], pa.float64()),
            }
        )
        if not len(bids):
            return empty
        bmat = _list_col_matrix(batch.column("embedding"))
        bcodes = _lsh_codes(np.floor(bmat * FP_SCALE + 0.5).astype(np.int64), S)
        match = (qc[:, None, :] == bcodes[None, :, :]).any(axis=2)  # (nq, nb)
        qi, vi = np.nonzero(match)
        if not len(qi):
            return empty
        # exact cosine per colliding pair only — O(pairs x d), not nq x nb x d
        bnorms = np.sqrt((bmat * bmat).sum(axis=1))
        sims = (qm[qi] * bmat[vi]).sum(axis=1) / (qn[qi] * bnorms[vi])
        out_q, out_v, out_s = [], [], []
        for r in np.unique(qi):
            sel = np.nonzero(qi == r)[0]
            if len(sel) > k:
                sel = sel[np.argpartition(-sims[sel], k)[:k]]
            out_q.extend([int(qi_ids[r])] * len(sel))
            out_v.extend(bids[vi[sel]].tolist())
            out_s.extend(sims[sel].tolist())
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


SEMDEDUP_TAU = 0.45  # shared with the embedding_neardup oracle threshold


@empty_guard("embeddings", vec_id=pa.int64())
def semantic_dedup(sf_dir: str, tau: float = SEMDEDUP_TAU) -> "ray.data.Dataset":
    """SemDeDup-shaped semantic deduplication (Abbas et al. 2023): k-means
    the embedding space, then remove near-duplicates WITHIN each cluster
    only — the clustering bounds the pairwise work that a global
    embedding dedup would make O(n²). A vector is removed iff a
    lower-vec_id member of ITS cluster has cosine ≥ tau; survivors
    (one canonical per ε-ball, plus everything unclustered-by-similarity)
    stream out as the keep-list.

    Scale shape: centroids train distributed (``_train_centroids``, k×d
    cells per round) and broadcast once via ``ray.put``; ONE map assigns
    rows and ONE manual exchange on cluster_id co-locates each cluster;
    the per-cluster kernel is a vectorized normalized-matmul (O(|c|²) by
    design — at 100 TB k grows with n so |c| = n/k stays bounded, the
    SemDeDup trade). The cosine threshold compare is the same
    double-precision expression the embedding_neardup oracle hash-checks.
    """
    from ..stages.util import bucket_exchange

    cents = _train_centroids(sf_dir, KMEANS_K, KMEANS_ITERS)
    fref = ray.put(cents)

    def assign_bucket(batch: pa.Table) -> pa.Table:
        C = ray.get(fref)
        ids = np.asarray(batch.column("vec_id"), dtype=np.int64)
        if not len(ids):
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "embedding": batch.column("embedding"),
                    "cluster_id": pa.array([], pa.int64()),
                }
            )
        x = _fp_matrix(batch.column("embedding"))
        assign = np.argmin(_dist2(x, C), axis=1).astype(np.int64)
        return pa.table(
            {
                "vec_id": batch.column("vec_id"),
                "embedding": batch.column("embedding"),
                "cluster_id": pa.array(assign, pa.int64()),
            }
        )

    def dedup_cluster(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return pa.table({"vec_id": pa.array([], pa.int64())})
        s = tbl.sort_by([("vec_id", "ascending")])
        ids = np.asarray(s.column("vec_id"), dtype=np.int64)
        m = np.array(
            s.column("embedding").combine_chunks().to_numpy(zero_copy_only=False).tolist(),
            dtype=np.float64,
        )
        norm = np.linalg.norm(m, axis=1)
        norm[norm == 0] = 1.0
        # dot/(|a||b|) — the EXACT double-precision expression the
        # list_cosine_similarity oracle and embedding_neardup use, so a sim
        # within 1 ulp of tau cannot flip keep/remove vs the oracle.
        sims = (m @ m.T) / np.outer(norm, norm)
        # removed iff ANY strictly-lower-id cluster member has cos >= tau
        dup = np.triu(sims >= tau, k=1).any(axis=0)
        return pa.table({"vec_id": pa.array(ids[~dup], pa.int64())})

    mat = (
        _emb(sf_dir, ["vec_id", "embedding"])
        .map_batches(assign_bucket, batch_format="pyarrow")
        .materialize()
    )
    return bucket_exchange(mat, "cluster_id", KMEANS_K, dedup_cluster)


# --- embedding_covariance ----------------------------------------------------

COV_SCALE = 1_000  # covariance fixed-point scale (floor(x*1e3 + 0.5))


@empty_guard("embeddings", i=pa.int64(), j=pa.int64(), s=pa.int64())
def embedding_covariance(sf_dir: str) -> "ray.data.Dataset":
    """Distributed second-moment (Gram) matrix over the embedding column —
    the one-pass statistic under PCA / whitening / covariance-shrinkage:
    S[i, j] = sum_v q_v[i] * q_v[j] with q = floor(emb * 1e3 + 0.5) in
    int64 (exact under any summation order, so the DuckDB replay is
    bit-identical). Output is the upper triangle in long form
    (i, j, s), 1-based to match SQL list indexing.

    100 TB design: each batch contributes ONE d x d partial (a single
    int64 matmul over the batch matrix — the d(d+1)/2 = 2,080 rows at
    d=64 are independent of batch row count), and the only exchange
    carries those constant-size partials. Eigen-decomposition of the
    resulting d x d matrix is a driver-side O(d^3) epilogue a caller
    runs on the collected table; nothing per-vector leaves the workers.
    """

    def partial(batch: pa.Table) -> pa.Table:
        m = _list_col_matrix(batch.column("embedding"))
        if m.size == 0:
            return pa.table(
                {
                    "i": pa.array([], pa.int64()),
                    "j": pa.array([], pa.int64()),
                    "s": pa.array([], pa.int64()),
                }
            )
        q = np.floor(m * COV_SCALE + 0.5).astype(np.int64)
        gram = q.T @ q  # (d, d) int64 — exact
        d = gram.shape[0]
        iu, ju = np.triu_indices(d)
        return pa.table(
            {
                "i": pa.array((iu + 1).astype(np.int64), pa.int64()),
                "j": pa.array((ju + 1).astype(np.int64), pa.int64()),
                "s": pa.array(gram[iu, ju], pa.int64()),
            }
        )

    from ..stages.util import exchange_group_agg

    return exchange_group_agg(
        _emb(sf_dir, ["embedding"]).map_batches(partial, batch_format="pyarrow"),
        ["i", "j"],
        [("s", "sum")],
        nbuck=8,
    )


# --- random projection (Johnson–Lindenstrauss) --------------------------------

RP_OUT_DIM = 16
RP_SEED = 4099


@empty_guard("embeddings", vec_id=pa.int64(), dim=pa.int64(), v=pa.int64())
def embedding_project_rp(sf_dir: str, k: int = RP_OUT_DIM) -> "ray.data.Dataset":
    """Johnson–Lindenstrauss random projection of the embedding column to
    ``k`` dimensions with a deterministic ±1 matrix (Achlioptas 2003 sign
    variant): P[j,c] = +1 if mix32(j·k + c, seed) is even else −1, and
    out[c] = Σ_j q[j]·P[j,c] over the shared milli fixed point
    q = floor(e·10³ + 0.5) — exact int64 end to end, so the DuckDB
    replay is bit-identical. Output long form (vec_id, dim, v), dim
    0-based. The pre-ANN dimensionality-reduction step (16 dims ≈ 4×
    cheaper distance math for the LSH/IVF stages downstream).

    100 TB design: ONE streaming ``map_batches`` pass, zero shuffle —
    the projection matrix is d×k ints built per batch call from the mix
    (cheaper than shipping it), and the per-batch kernel is a single
    int64 matmul. Output is k rows per vector (a 4× reduction of the
    embedding payload at d=64, k=16)."""

    def partial(batch: pa.Table) -> pa.Table:
        m = _list_col_matrix(batch.column("embedding"))
        if m.size == 0:
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "dim": pa.array([], pa.int64()),
                    "v": pa.array([], pa.int64()),
                }
            )
        d = m.shape[1]
        idx = np.arange(d * k, dtype=np.uint64)
        signs = np.where(
            mix32_batch(idx, RP_SEED) % np.uint64(2) == 0, 1, -1
        ).astype(np.int64)
        P = signs.reshape(d, k)
        q = np.floor(m * COV_SCALE + 0.5).astype(np.int64)
        out = q @ P  # (n, k) int64 — exact
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        n = len(ids)
        return pa.table(
            {
                "vec_id": pa.array(np.repeat(ids, k), pa.int64()),
                "dim": pa.array(
                    np.tile(np.arange(k, dtype=np.int64), n), pa.int64()
                ),
                "v": pa.array(out.reshape(-1), pa.int64()),
            }
        )

    return _emb(sf_dir, ["vec_id", "embedding"]).map_batches(
        partial, batch_format="pyarrow"
    )
