"""Model-inference actor-pool stage (pipelines/infer.py): brute-force
python parity of the hashed linear classifier plus actor-state checks."""

from __future__ import annotations

import re

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"
_TOK = re.compile(r"[a-z0-9]+")


def _texts():
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    return dict(zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()))


def test_quality_classifier_bruteforce(ray_session):
    from web_crawler_search_engine_ray.functions.hashing import (
        mix32_batch,
        poly_hash,
    )
    from web_crawler_search_engine_ray.pipelines.infer import (
        N_BUCKETS,
        W_SEED,
        quality_classifier,
    )

    got = {r["doc_id"]: r for r in quality_classifier(SF).take_all()}
    w = (
        mix32_batch(np.arange(N_BUCKETS, dtype=np.uint64), W_SEED)
        % np.uint64(2001)
    ).astype(np.int64) - 1000
    n_checked = 0
    for d, t in _texts().items():
        toks = _TOK.findall(t.lower())
        if not toks:
            assert d not in got
            continue
        logit = int(sum(int(w[poly_hash(tok) % N_BUCKETS]) for tok in toks))
        r = got[d]
        assert r["n_tokens"] == len(toks)
        assert r["logit_milli"] == logit
        assert r["keep"] == (logit >= 0)
        n_checked += 1
    assert n_checked == len(got) > 0
    # the classifier genuinely separates: both verdicts occur
    keeps = [r["keep"] for r in got.values()]
    assert any(keeps) and not all(keeps)


def test_classifier_stage_state_reuse():
    """The weight table is actor-init state and the token memo persists
    across __call__s — the model-load-once contract."""
    import pyarrow as pa

    from web_crawler_search_engine_ray.pipelines.infer import (
        QualityClassifierStage,
    )

    st = QualityClassifierStage()
    w0 = st.w.copy()
    b1 = pa.table({"doc_id": pa.array([1], pa.int64()),
                   "text": pa.array(["alpha beta alpha"])})
    b2 = pa.table({"doc_id": pa.array([2], pa.int64()),
                   "text": pa.array(["beta gamma"])})
    r1 = st(b1)
    memo_after_1 = dict(st._bucket_memo)
    r2 = st(b2)
    assert set(memo_after_1) == {"alpha", "beta"}
    assert set(st._bucket_memo) == {"alpha", "beta", "gamma"}
    assert (st.w == w0).all()  # weights never mutate
    # logit decomposition: 2*w[alpha] + w[beta]
    wa = st.w[st._bucket_memo["alpha"]]
    wb = st.w[st._bucket_memo["beta"]]
    wg = st.w[st._bucket_memo["gamma"]]
    assert r1.column("logit_milli")[0].as_py() == 2 * wa + wb
    assert r2.column("logit_milli")[0].as_py() == wb + wg
    assert r1.column("n_tokens")[0].as_py() == 3
