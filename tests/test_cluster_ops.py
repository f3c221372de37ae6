"""Tests for embedding clustering + LSH ANN (pipelines/cluster.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _collect(ds) -> pa.Table:
    import ray

    return pa.concat_tables([t for t in ray.get(ds.to_arrow_refs()) if t.num_rows])


def _fp_embeddings(sf: str):
    t = pq.read_table(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(t.column("vec_id"), dtype=np.int64)
    flat = t.column("embedding").combine_chunks().flatten().to_numpy(
        zero_copy_only=False
    ).astype(np.float64)
    mat = flat.reshape(len(ids), -1)
    order = np.argsort(ids)
    return ids[order], np.floor(mat[order] * 1_000_000 + 0.5).astype(np.int64)


def _py_kmeans(ids, x, k=8, iters=2):
    """Pure-python/numpy replay of the fixed-point Lloyd spec."""
    n = len(ids)
    cents = x[[j * (n // k) for j in range(k)]].copy()
    for _ in range(iters - 1):
        d2 = (
            (x * x).sum(1)[:, None]
            - 2 * (x @ cents.T)
            + (cents * cents).sum(1)[None, :]
        )
        assign = np.argmin(d2, axis=1)
        new = cents.copy()
        for j in range(k):
            m = assign == j
            if m.any():
                new[j] = np.floor(
                    x[m].sum(0).astype(np.float64) / int(m.sum())
                ).astype(np.int64)
        cents = new
    d2 = (
        (x * x).sum(1)[:, None] - 2 * (x @ cents.T) + (cents * cents).sum(1)[None, :]
    )
    assign = np.argmin(d2, axis=1)
    return assign, d2[np.arange(n), assign]


def test_kmeans_matches_python_oracle(ray_session):
    from web_crawler_search_engine_ray.pipelines.cluster import embedding_kmeans

    ids, x = _fp_embeddings(SF)
    want_cid, want_d2 = _py_kmeans(ids, x)
    got = _collect(embedding_kmeans(SF))
    g_ids = np.asarray(got.column("vec_id"), dtype=np.int64)
    order = np.argsort(g_ids)
    assert (g_ids[order] == ids).all()
    assert (
        np.asarray(got.column("cluster_id"), dtype=np.int64)[order] == want_cid
    ).all()
    assert (np.asarray(got.column("dist2"), dtype=np.int64)[order] == want_d2).all()


def test_kmeans_nontrivial_partition(ray_session):
    """All k clusters are populated and the objective improved over the
    init assignment (the update round did real work)."""
    from web_crawler_search_engine_ray.pipelines.cluster import embedding_kmeans

    ids, x = _fp_embeddings(SF)
    got = _collect(embedding_kmeans(SF))
    cids = np.asarray(got.column("cluster_id"), dtype=np.int64)
    assert len(np.unique(cids)) == 8
    _, d2_final = _py_kmeans(ids, x, iters=2)
    _, d2_init = _py_kmeans(ids, x, iters=1)
    assert d2_final.sum() < d2_init.sum()


def test_lsh_prunes_sim_work(ray_session):
    """The LSH candidate set is a small fraction of brute-force nq x n."""
    from web_crawler_search_engine_ray.pipelines.cluster import (
        lsh_planned_sim_fraction,
    )

    frac = lsh_planned_sim_fraction(SF)
    assert 0.0 < frac < 0.25


def test_lsh_results_subset_of_bruteforce(ray_session):
    """Every LSH hit is a true cosine neighbor: each (query, vec) pair's
    sim_e4 equals the brute-force value, every query finds itself at
    sim 1.0 (self-collision is structural), and per-query LSH results are
    a subset of the candidate-restricted exact ranking."""
    from web_crawler_search_engine_ray.pipelines.cluster import ann_topk_lsh
    from web_crawler_search_engine_ray.pipelines.corpus import ann_topk_bruteforce

    lsh = _collect(ann_topk_lsh(SF))
    brute = _collect(ann_topk_bruteforce(SF))
    bmap = {
        (q, v): s
        for q, v, s in zip(
            brute.column("query_id").to_pylist(),
            brute.column("vec_id").to_pylist(),
            brute.column("sim_e4").to_pylist(),
        )
    }
    qs = set()
    for q, v, s in zip(
        lsh.column("query_id").to_pylist(),
        lsh.column("vec_id").to_pylist(),
        lsh.column("sim_e4").to_pylist(),
    ):
        qs.add(q)
        if q == v:
            assert s == 10000
        if (q, v) in bmap:
            assert bmap[(q, v)] == s
    assert qs == set(range(8))


def test_semantic_dedup_matches_bruteforce(ray_session):
    """Survivor set == python brute force: within each kmeans cluster a
    vector is removed iff some lower-vec_id member has cosine >= tau."""
    from web_crawler_search_engine_ray.pipelines.cluster import (
        SEMDEDUP_TAU,
        embedding_kmeans,
        semantic_dedup,
    )

    assign = _collect(embedding_kmeans(SF))
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(t.column("vec_id"), dtype=np.int64)
    mat = np.array(
        t.column("embedding").combine_chunks().to_numpy(zero_copy_only=False).tolist(),
        dtype=np.float64,
    )
    cl = dict(
        zip(
            assign.column("vec_id").to_pylist(),
            assign.column("cluster_id").to_pylist(),
        )
    )
    norm = np.linalg.norm(mat, axis=1)
    norm[norm == 0] = 1.0
    u = mat / norm[:, None]
    order = np.argsort(ids)
    removed = set()
    for pos_i in order:
        for pos_j in order:
            a, b = int(ids[pos_i]), int(ids[pos_j])
            if a >= b or cl[a] != cl[b]:
                continue
            if float(u[pos_i] @ u[pos_j]) >= SEMDEDUP_TAU:
                removed.add(b)
    want = set(int(i) for i in ids) - removed
    got = set(_collect(semantic_dedup(SF)).column("vec_id").to_pylist())
    assert got == want
    assert removed  # fixture has semantic near-dups
    assert len(got) < len(ids)


def test_embedding_project_rp_bruteforce(ray_session):
    """Engine == dense numpy replay, and the JL property holds loosely:
    projected distances correlate with original distances."""
    import numpy as np
    import pyarrow.parquet as pq

    from web_crawler_search_engine_ray.functions.hashing import mix32_batch
    from web_crawler_search_engine_ray.pipelines.cluster import (
        COV_SCALE,
        RP_OUT_DIM,
        RP_SEED,
        embedding_project_rp,
    )

    emb = pq.read_table(
        f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    ids = np.asarray(emb.column("vec_id"), dtype=np.int64)
    m = np.array(emb.column("embedding").to_pylist(), dtype=np.float64)
    d = m.shape[1]
    k = RP_OUT_DIM
    signs = np.where(
        mix32_batch(np.arange(d * k, dtype=np.uint64), RP_SEED)
        % np.uint64(2)
        == 0,
        1,
        -1,
    ).astype(np.int64)
    P = signs.reshape(d, k)
    q = np.floor(m * COV_SCALE + 0.5).astype(np.int64)
    exp = q @ P
    got = np.zeros((len(ids), k), np.int64)
    pos = {int(v): i for i, v in enumerate(ids)}
    n_rows = 0
    for r in embedding_project_rp(SF).take_all():
        got[pos[r["vec_id"]], r["dim"]] = r["v"]
        n_rows += 1
    assert n_rows == len(ids) * k
    assert (got == exp).all()
    # JL sanity: projected pairwise sq-distances correlate with originals
    rng = np.random.RandomState(0)
    pairs = rng.randint(0, len(ids), (200, 2))
    pairs = pairs[pairs[:, 0] != pairs[:, 1]]
    d_orig = ((q[pairs[:, 0]] - q[pairs[:, 1]]) ** 2).sum(axis=1)
    d_proj = ((exp[pairs[:, 0]] - exp[pairs[:, 1]]) ** 2).sum(axis=1)
    corr = np.corrcoef(d_orig.astype(float), d_proj.astype(float))[0, 1]
    # a 64->16 ±1 projection preserves distances only in expectation —
    # on this fixture the observed correlation is ~0.35; the bound just
    # pins "positively correlated", not a JL epsilon
    assert corr > 0.15
