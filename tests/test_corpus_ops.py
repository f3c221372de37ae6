"""Tests for the corpus analytics / dedup / similarity / multimodal ops
(pipelines/corpus.py, stages/multimodal.py) over the read-only testdata."""

from __future__ import annotations

import itertools
import re

import numpy as np
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_table():
    return pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])


def _exact_jaccard_pairs(docs, threshold=0.8):
    from web_crawler_search_engine_ray.pipelines.corpus import _doc_shingle_strings

    ids = docs.column("doc_id").to_pylist()
    texts = docs.column("text").to_pylist()
    sh = {d: _doc_shingle_strings(t) for d, t in zip(ids, texts)}
    out = []
    for a, b in itertools.combinations(sorted(ids), 2):
        A, B = sh[a], sh[b]
        u = len(A | B)
        if u and len(A & B) / u >= threshold:
            out.append((a, b))
    return sorted(out)


def test_minhash_lsh_matches_exact(ray_session, docs_table):
    """LSH candidate generation + exact verify finds exactly the true
    near-dup pairs (recall 1 at these parameters)."""
    from web_crawler_search_engine_ray.pipelines.corpus import dedup_minhash_lsh

    got = dedup_minhash_lsh(SF)
    pairs = sorted(zip(got.column("doc_a").to_pylist(), got.column("doc_b").to_pylist()))
    assert pairs == _exact_jaccard_pairs(docs_table)


def test_ngram_jaccard_matches_exact(ray_session, docs_table):
    from web_crawler_search_engine_ray.pipelines.corpus import ngram_jaccard_pairs

    got = ngram_jaccard_pairs(SF)
    pairs = sorted(zip(got.column("doc_a").to_pylist(), got.column("doc_b").to_pylist()))
    assert pairs == _exact_jaccard_pairs(docs_table)


def test_connected_components_chain(ray_session):
    """Min-label propagation on a long chain (worst-case diameter), a
    star, and singleton-free output: component id == min node id."""
    import ray.data

    from web_crawler_search_engine_ray.pipelines.corpus import connected_components

    # chain 10-11-...-29 (diameter 19, forces many rounds), star at 100,
    # isolated pair (7, 9)
    chain = [(i, i + 1) for i in range(10, 29)]
    star = [(100, x) for x in (103, 101, 108, 105)]
    edges = chain + star + [(9, 7)]
    a = [e[0] for e in edges]
    b = [e[1] for e in edges]
    ds = ray.data.from_items([{"doc_a": x, "doc_b": y} for x, y in zip(a, b)])
    got = connected_components(ds)
    comp = dict(
        zip(got.column("doc_id").to_pylist(), got.column("component_id").to_pylist())
    )
    assert all(comp[n] == 10 for n in range(10, 30))
    assert all(comp[n] == 100 for n in (100, 101, 103, 105, 108))
    assert comp[7] == 7 and comp[9] == 7
    keep = dict(zip(got.column("doc_id").to_pylist(), got.column("keep").to_pylist()))
    assert sum(keep.values()) == 3 and keep[10] and keep[100] and keep[7]
    csize = dict(zip(got.column("doc_id").to_pylist(), got.column("csize").to_pylist()))
    assert csize[15] == 20 and csize[100] == 5 and csize[9] == 2


def test_dedup_components_matches_union_find(ray_session, docs_table):
    """Engine components over the real near-dup graph == python union-find
    over the exact-Jaccard pair oracle."""
    from web_crawler_search_engine_ray.pipelines.corpus import dedup_components

    pairs = _exact_jaccard_pairs(docs_table)
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in pairs:
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
    want = {n: find(n) for n in parent}
    got = dedup_components(SF)
    comp = dict(
        zip(got.column("doc_id").to_pylist(), got.column("component_id").to_pylist())
    )
    assert comp == want


def test_simhash_neardups_are_close(ray_session, docs_table):
    """Near-dup docs should have much closer simhashes than random docs."""
    from web_crawler_search_engine_ray.pipelines.corpus import (
        collect_table,
        dedup_simhash,
    )

    tbl = collect_table(dedup_simhash(SF))
    sh = dict(zip(tbl.column("doc_id").to_pylist(), tbl.column("simhash").to_pylist()))
    near = _exact_jaccard_pairs(docs_table)
    assert near, "fixture should contain near-dups"
    near_d = np.mean([bin(sh[a] ^ sh[b]).count("1") for a, b in near])
    ids = sorted(sh)
    rng = np.random.RandomState(0)
    rand_pairs = [(ids[i], ids[j]) for i, j in rng.randint(0, len(ids), (200, 2)) if i != j]
    rand_d = np.mean([bin(sh[a] ^ sh[b]).count("1") for a, b in rand_pairs])
    assert near_d < rand_d / 2


def test_dedup_exact_all_distinct(ray_session):
    from web_crawler_search_engine_ray.pipelines.corpus import collect_table, dedup_exact

    tbl = collect_table(dedup_exact(SF))
    assert tbl.num_rows == 500
    assert set(tbl.column("n_copies").to_pylist()) == {1}


def test_ann_ivf_recall(ray_session):
    """IVF probe misses some lists; recall@10 vs brute force must stay high."""
    from web_crawler_search_engine_ray.pipelines.corpus import (
        ann_topk_bruteforce,
        ann_topk_ivf,
        collect_table,
    )

    bf = collect_table(ann_topk_bruteforce(SF)).to_pylist()
    ivf = collect_table(ann_topk_ivf(SF)).to_pylist()
    bf_sets = {}
    for r in bf:
        bf_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    ivf_sets = {}
    for r in ivf:
        ivf_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [
        len(bf_sets[q] & ivf_sets.get(q, set())) / len(bf_sets[q]) for q in bf_sets
    ]
    assert np.mean(recalls) >= 0.5  # nprobe=4/16 lists on unclustered vectors
    # brute force itself: self-hit must rank (query is its own best match)
    for q, s in bf_sets.items():
        assert q in s
    # the point of IVF: measured sim-op plan must be well under brute force
    from web_crawler_search_engine_ray.pipelines.corpus import (
        ivf_planned_sim_fraction,
    )

    frac = ivf_planned_sim_fraction(SF, nlist=16, nprobe=4)
    assert frac <= 0.6  # nprobe/nlist = 0.25 ideal; skewed lists allowed slack
    # exact mode (nprobe = nlist) must equal brute force exactly
    exact = collect_table(ann_topk_ivf(SF, nlist=16, nprobe=16)).to_pylist()
    key = lambda r: (r["query_id"], r["vec_id"], r["sim_e4"])
    assert sorted(map(key, exact)) == sorted(map(key, bf))


def test_embedding_neardup_symmetric_ground_truth(ray_session):
    from web_crawler_search_engine_ray.pipelines.corpus import (
        collect_table,
        embedding_neardup_pairs,
    )

    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(t.column("vec_id"), dtype=np.int64)
    m = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    S = mn @ mn.T
    exp = {
        (int(ids[i]), int(ids[j]))
        for i in range(len(ids))
        for j in range(len(ids))
        if ids[i] < ids[j] and S[i, j] >= 0.45
    }
    got = collect_table(embedding_neardup_pairs(SF))
    pairs = set(zip(got.column("vec_a").to_pylist(), got.column("vec_b").to_pylist()))
    assert pairs == exp


def test_quality_and_counts_invariants(ray_session):
    from web_crawler_search_engine_ray.pipelines.corpus import (
        collect_table,
        quality_scores,
    )

    tbl = collect_table(quality_scores(SF)).to_pylist()
    assert len(tbl) == 500
    for r in tbl:
        assert 0 <= r["n_unique"] <= r["n_tokens"]
        assert 0 <= r["n_stopwords"] <= r["n_tokens"]
        assert r["n_chars"] > 0


def test_url_validate_partition(ray_session):
    """Constructed URL forms: doc_id%10 in {0,1,2} valid, rest invalid."""
    from web_crawler_search_engine_ray.pipelines.corpus import (
        collect_table,
        url_normalize_validate,
    )

    tbl = collect_table(url_normalize_validate(SF)).to_pylist()
    for r in tbl:
        assert r["valid"] == (r["doc_id"] % 10 in (0, 1, 2)), r
        assert r["url_norm"].startswith(("https://", "ftp://"))
        assert not r["url_norm"].endswith("/")


def test_search_topk_ranked(ray_session):
    from web_crawler_search_engine_ray.pipelines.corpus import search_topk

    tbl = search_topk(SF)
    scores = tbl.column("score").to_pylist()
    assert len(scores) == 5
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)


def test_multimodal_feature_stage(ray_session, micro_web):
    """Media stage: one row per image span, deterministic features,
    fixed-size list schema; 'real' decode raises."""
    import ray

    from web_crawler_search_engine_ray.stages.multimodal import (
        FEATURE_DIM,
        MediaFeatureStage,
    )

    docs = ray.data.from_arrow(micro_web["docs"])
    out = docs.map_batches(
        MediaFeatureStage, batch_format="pyarrow", concurrency=2, batch_size=16
    ).to_pandas()
    n_images = sum(
        1
        for r in micro_web["docs"].to_pylist()
        for s in r["spans"]
        if s["kind"] == "image" and s["media_ref"]
    )
    assert len(out) == n_images
    assert all(len(f) == FEATURE_DIM for f in out["feature"])
    # determinism: same media_ref -> same norm
    again = docs.map_batches(
        MediaFeatureStage, batch_format="pyarrow", concurrency=2, batch_size=16
    ).to_pandas()
    a = out.sort_values(["doc_id", "media_ref"]).reset_index(drop=True)
    b = again.sort_values(["doc_id", "media_ref"]).reset_index(drop=True)
    assert (a["feat_norm_e4"] == b["feat_norm_e4"]).all()

    try:
        import PIL  # noqa: F401
    except ImportError:
        # without PIL the real-decode gate raises per actor at __init__
        with pytest.raises(NotImplementedError):
            MediaFeatureStage(decode="real")
    # with PIL present, the real path is covered by test_multimodal_real.py


def test_lang_profile_pred_matches_argmax(ray_session):
    from web_crawler_search_engine_ray.pipelines.corpus import (
        LANGS,
        collect_table,
        lang_profile,
    )

    tbl = collect_table(lang_profile(SF)).to_pylist()
    for r in tbl:
        hits = {lang: r[f"{lang}_hits"] for lang in LANGS}
        best = max(LANGS, key=lambda l: (hits[l], -LANGS.index(l)))
        # max() keeps the first maximal lang in LANGS order (alphabetical)
        best = next(l for l in LANGS if hits[l] == max(hits.values()))
        assert r["pred_lang"] == best


def test_top_words_and_longest_pages(ray_session, docs_table):
    """Top-50 words / longest-20 pages agree with a driver-side recount."""
    from collections import Counter

    from web_crawler_search_engine_ray.pipelines.corpus import (
        longest_pages,
        top_words,
        tokens_of,
    )

    texts = docs_table.column("text").to_pylist()
    ids = docs_table.column("doc_id").to_pylist()
    c = Counter()
    for t in texts:
        c.update(tokens_of(t))
    want_top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    got = top_words(SF)
    got_top = list(zip(got.column("token").to_pylist(), got.column("count").to_pylist()))
    assert got_top == want_top

    lens = sorted(
        ((d, len(tokens_of(t))) for d, t in zip(ids, texts)),
        key=lambda kv: (-kv[1], kv[0]),
    )[:20]
    got = longest_pages(SF)
    got_lens = list(
        zip(got.column("doc_id").to_pylist(), got.column("n_tokens").to_pylist())
    )
    assert got_lens == lens


def test_subdomain_counts_partition(ray_session, docs_table):
    """Valid URL modes are doc_id%10 in {0,1,2}; counts group by w{id%7}."""
    from collections import Counter

    from web_crawler_search_engine_ray.pipelines.corpus import (
        collect_table,
        subdomain_counts,
    )

    ids = docs_table.column("doc_id").to_pylist()
    want = Counter(
        f"w{d % 7}.example.org" for d in ids if d % 10 in (0, 1, 2)
    )
    got = collect_table(subdomain_counts(SF))
    got_map = dict(
        zip(got.column("host").to_pylist(), got.column("n_pages").to_pylist())
    )
    assert got_map == dict(want)


def test_multimodal_resize_and_frames(ray_session, micro_web):
    """Resize and frame-sample actor-pool stages: schema, determinism,
    rows-per-media-span multiplication, and real-decode gating."""
    import ray.data

    from web_crawler_search_engine_ray.stages.multimodal import (
        FRAMES_SCHEMA,
        FrameSampleStage,
        MediaResizeStage,
        RESIZED_SCHEMA,
    )

    docs = ray.data.from_arrow(micro_web["docs"])
    n_media = sum(
        1
        for r in micro_web["docs"].to_pylist()
        for s in (r["spans"] or [])
        if s["kind"] == "image" and s["media_ref"]
    )
    assert n_media > 0

    resized = docs.map_batches(
        MediaResizeStage, batch_format="pyarrow", concurrency=2, batch_size=8,
        fn_constructor_kwargs={"width": 32, "height": 16},
    ).take_all()
    assert len(resized) == n_media
    assert all(len(r["payload"]) == 32 * 16 for r in resized)
    # deterministic across runs
    resized2 = docs.map_batches(
        MediaResizeStage, batch_format="pyarrow", concurrency=2, batch_size=8,
        fn_constructor_kwargs={"width": 32, "height": 16},
    ).take_all()
    assert {r["media_ref"]: r["payload"] for r in resized} == {
        r["media_ref"]: r["payload"] for r in resized2
    }

    frames_ds = docs.map_batches(
        FrameSampleStage, batch_format="pyarrow", concurrency=2, batch_size=8,
        fn_constructor_kwargs={"num_frames": 3},
    )
    assert [f.name for f in FRAMES_SCHEMA] == frames_ds.schema().base_schema.names
    frames = frames_ds.take_all()
    assert len(frames) == 3 * n_media
    by_ref = {}
    for f in frames:
        by_ref.setdefault(f["media_ref"], []).append(f)
    for ref, fs in by_ref.items():
        ts = sorted(x["frame_ts_ms"] for x in fs)
        assert ts[0] == 0 and ts == sorted(set(ts))

    import pytest as _pytest

    with _pytest.raises(Exception):
        docs.map_batches(
            MediaResizeStage, batch_format="pyarrow", concurrency=1,
            fn_constructor_kwargs={"decode": "real"},
        ).materialize()


def test_ngram_jaccard_hot_shingle_cap(ray_session, tmp_path):
    """Boilerplate df-cap (SHINGLE_DF_CAP): a shingle shared by hundreds of
    docs must not explode pair emission, while a true near-dup pair that
    also carries the boilerplate is still found (df-pruned Jaccard)."""
    import pyarrow as pa
    import pyarrow.parquet as pq2

    from web_crawler_search_engine_ray.pipelines import corpus as C

    # unit bound: one hot key over 10k docs emits zero pairs under the cap
    keys = np.zeros(10_000, dtype=np.uint64)
    docs = np.arange(10_000, dtype=np.int64)
    a, b = C._emit_run_pairs(keys, docs, max_run=C.SHINGLE_DF_CAP)
    assert len(a) == 0

    # e2e: 300 docs share a boilerplate prefix; doc 300 duplicates doc 0
    texts = [
        f"common boiler plate prefix here alpha u{i} v{i} w{i} x{i} y{i} z{i}"
        for i in range(300)
    ]
    texts.append(texts[0])
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq2.write_table(tbl, str(tmp_path / "documents.parquet"))
    out = C.ngram_jaccard_pairs(str(tmp_path))
    pairs = set(zip(out.column("doc_a").to_pylist(), out.column("doc_b").to_pylist()))
    assert (0, 300) in pairs                       # identical pair found
    assert all(j == 1000 for p, j in zip(pairs, out.column("jaccard_milli").to_pylist()) if p == (0, 300))
    assert len(pairs) < 1000                       # no boilerplate blowup


def test_bm25_matches_python_oracle(ray_session):
    """Independent python replay of the BM25 scorer (identical fp
    expression shape, milli rounding, tie order)."""
    import math
    import re
    from collections import Counter

    import pyarrow.parquet as pq

    from web_crawler_search_engine_ray.pipelines.corpus import (
        BM25_B,
        BM25_K1,
        SEARCH_QUERY_TOKENS,
        search_topk_bm25,
    )

    got = search_topk_bm25(SF).to_pylist()

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    tok = re.compile(r"[a-z0-9]+")
    toks = {
        d: tok.findall(t.lower())
        for d, t in zip(
            docs.column("doc_id").to_pylist(), docs.column("text").to_pylist()
        )
    }
    n = float(len(toks))
    avgdl = float(sum(len(v) for v in toks.values())) / float(len(toks))
    q = set(SEARCH_QUERY_TOKENS)
    tf = {d: Counter(t for t in v if t in q) for d, v in toks.items()}
    df = Counter(t for c in tf.values() for t in c)
    scores = {}
    for d, c in tf.items():
        s = 0
        for t, f in c.items():
            idf = math.log((n - float(df[t]) + 0.5) / (float(df[t]) + 0.5) + 1.0)
            raw = (
                idf
                * (float(f) * (BM25_K1 + 1.0))
                / (float(f) + BM25_K1 * ((1.0 - BM25_B) + BM25_B * len(toks[d]) / avgdl))
            )
            s += int(math.floor(raw * 1000.0 + 0.5))
        if s:
            scores[d] = s
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert [(r["doc_id"], r["score_milli"]) for r in got] == want


def test_phash_pairs_structure(ray_session):
    """pHash near-dup pairs: every pair stays within its re-encoding
    group (cross-group stub hashes are ~24 bits apart), distances respect
    the threshold, and a python replay of hash+LSH+verify matches."""
    import numpy as np
    import ray.data

    from web_crawler_search_engine_ray.sources.conformance_web import (
        build_conformance_web,
    )
    from web_crawler_search_engine_ray.stages.multimodal import (
        PHASH_GROUP,
        PHASH_MAX_DIST,
        phash_for_refs,
        phash_pairs,
    )

    import tempfile

    out = tempfile.mkdtemp(prefix="phash_web_")
    docs_path = build_conformance_web(SF, out)
    docs = ray.data.read_parquet(docs_path)
    got = phash_pairs(docs).to_pandas()

    def gid(ref):
        return int(ref.rsplit("conf", 1)[1], 16) // PHASH_GROUP

    assert len(got) > 0
    assert (got["hamming"] <= PHASH_MAX_DIST).all()
    assert (got["media_a"] < got["media_b"]).all()
    for _, r in got.iterrows():
        assert gid(r["media_a"]) == gid(r["media_b"]), r

    # python replay: same refs, same hashes, same banded-LSH candidacy
    refs = sorted({*got["media_a"], *got["media_b"]})
    all_refs = sorted(
        {f"media://conf{d:04x}" for d in range(50)}
    )
    ph = dict(zip(all_refs, phash_for_refs(all_refs)))
    want = set()
    for i, a in enumerate(all_refs):
        for b in all_refs[i + 1:]:
            x = int(ph[a] ^ ph[b])
            if bin(x).count("1") > PHASH_MAX_DIST:
                continue
            shares_band = any(
                (int(ph[a]) >> (12 * k)) & 0xFFF == (int(ph[b]) >> (12 * k)) & 0xFFF
                for k in range(4)
            )
            if shares_band:
                want.add((a, b))
    assert {(r["media_a"], r["media_b"]) for _, r in got.iterrows()} == want


def test_keyword_topk_ranks_and_membership(ray_session):
    """Every doc's keywords are its top-3 postings by (milli tf-idf DESC,
    token ASC), ranks are 1..k, and tf_idf values come from the postings."""
    from web_crawler_search_engine_ray.pipelines.corpus import (
        keyword_topk,
        postings_tfidf,
    )

    post = postings_tfidf(SF).to_pandas()
    kw = keyword_topk(SF).to_pandas()
    assert set(kw["rank"]) <= {1, 2, 3}
    # per-doc reference ranking in pandas
    post["milli"] = (post["tf_idf"] * 1000.0 + 0.5).astype("int64")
    ref = (
        post.sort_values(["doc_id", "milli", "token"], ascending=[True, False, True])
        .groupby("doc_id")
        .head(3)
    )
    got = kw.sort_values(["doc_id", "rank"])[["doc_id", "token"]].to_numpy()
    want = ref[["doc_id", "token"]].to_numpy()
    assert (got == want).all()


def test_dedup_keep_list_consistent_with_components(ray_session, docs_table):
    """keep-list = all docs minus non-canonical clustered docs."""
    from web_crawler_search_engine_ray.pipelines.corpus import (
        dedup_components,
        dedup_keep_list,
    )

    comp = dedup_components(SF)
    removed = {
        d
        for d, r in zip(
            comp.column("doc_id").to_pylist(),
            comp.column("component_id").to_pylist(),
        )
        if d != r
    }
    kept = set(
        dedup_keep_list(SF).to_pandas()["doc_id"].tolist()
    )
    all_ids = set(docs_table.column("doc_id").to_pylist())
    assert kept == all_ids - removed
    assert removed and kept  # fixture has dups AND survivors


def test_source_stats_matches_pandas(ray_session):
    from web_crawler_search_engine_ray.pipelines.corpus import source_stats

    docs = pq.read_table(
        f"{SF}/documents.parquet", columns=["source", "lang", "n_chars"]
    ).to_pandas()
    want = (
        docs.groupby(["source", "lang"])["n_chars"]
        .agg(n_docs="count", sum_chars="sum", max_chars="max")
        .reset_index()
    )
    got = source_stats(SF).to_pandas()
    m = got.merge(want, on=["source", "lang"], suffixes=("", "_w"))
    assert len(m) == len(want) == len(got)
    for c in ("n_docs", "sum_chars", "max_chars"):
        assert (m[c] == m[f"{c}_w"]).all()


def test_winnow_fingerprints_bruteforce(ray_session):
    """Engine == per-doc pure-python winnowing (rightmost window min),
    plus the two winnowing guarantees: every w-window contributes a
    selection, and consecutive selections are <= w apart."""
    import numpy as np

    from web_crawler_search_engine_ray.functions.hashing import poly_hash
    from web_crawler_search_engine_ray.pipelines.corpus import (
        WINNOW_K,
        WINNOW_W,
        winnow_fingerprints,
    )

    import re

    TOK_RE = re.compile(r"[a-z0-9]+")
    got = {}
    for r in winnow_fingerprints(SF).take_all():
        got.setdefault(r["doc_id"], []).append((r["pos"], r["fp"]))
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    n_docs_checked = 0
    for did, txt in zip(
        docs.column("doc_id").to_pylist(), docs.column("text").to_pylist()
    ):
        toks = TOK_RE.findall(txt.lower())
        m = len(toks) - WINNOW_K + 1
        if m < 1:
            assert did not in got
            continue
        h = [
            poly_hash(" ".join(toks[i : i + WINNOW_K])) for i in range(m)
        ]
        sel = set()
        if m <= WINNOW_W:
            mn = min(h)
            sel.add(max(i for i in range(m) if h[i] == mn))
        else:
            for j in range(WINNOW_W - 1, m):
                lo = j - WINNOW_W + 1
                mn = min(h[lo : j + 1])
                sel.add(max(i for i in range(lo, j + 1) if h[i] == mn))
        exp = sorted((i + 1, h[i]) for i in sel)
        assert sorted(got[did]) == exp, did
        # density guarantee: gaps between selections <= w
        pos = sorted(p for p, _ in exp)
        assert pos[0] <= WINNOW_W
        assert all(b - a <= WINNOW_W for a, b in zip(pos, pos[1:]))
        n_docs_checked += 1
    assert n_docs_checked == len(got) > 0


def test_winnow_shared_substring_guarantee(ray_session, tmp_path):
    """Two docs sharing a >= w+k-1 token substring share a fingerprint
    VALUE (the property substring matching builds on)."""
    import pyarrow as pa

    from web_crawler_search_engine_ray.pipelines.corpus import (
        winnow_fingerprints,
    )

    shared = "alpha beta gamma delta epsilon zeta eta"  # 7 >= 4+3-1 tokens
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(
                [
                    "one two three " + shared + " four five",
                    "nine eight " + shared + " seven six umpteen",
                ]
            ),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    fps = {}
    for r in winnow_fingerprints(str(tmp_path)).take_all():
        fps.setdefault(r["doc_id"], set()).add(r["fp"])
    assert fps[1] & fps[2], "shared substring must yield a shared fingerprint"


def test_winnow_pairs_bruteforce(ray_session):
    """Pairs = docs sharing >= MIN distinct selected fingerprints, with
    hot fps (> cap docs) excluded — recomputed from the (already
    brute-force-verified) winnow_fingerprints output."""
    from collections import Counter, defaultdict

    from web_crawler_search_engine_ray.pipelines.corpus import (
        WINNOW_MIN_SHARED,
        WINNOW_PAIR_CAP,
        winnow_fingerprints,
        winnow_pairs,
    )

    by_fp = defaultdict(set)
    for r in winnow_fingerprints(SF).take_all():
        by_fp[r["fp"]].add(r["doc_id"])
    exp: Counter = Counter()
    for fp, docs in by_fp.items():
        if len(docs) > WINNOW_PAIR_CAP:
            continue
        ds = sorted(docs)
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                exp[(ds[i], ds[j])] += 1
    exp = {k: v for k, v in exp.items() if v >= WINNOW_MIN_SHARED}
    got = {
        (r["doc_a"], r["doc_b"]): r["n_shared"]
        for r in winnow_pairs(SF).take_all()
    }
    assert got == exp and len(got) > 0
    assert all(a < b for a, b in got)


def test_winnow_short_documents(ray_session, tmp_path):
    """Docs with fewer grams than one window: <k tokens absent, k tokens
    = 1 gram = 1 fingerprint, k..w+k-1 tokens = one whole-range window."""
    import pyarrow as pa

    from web_crawler_search_engine_ray.functions.hashing import poly_hash
    from web_crawler_search_engine_ray.pipelines.corpus import (
        WINNOW_K,
        winnow_fingerprints,
    )

    words = "alpha beta gamma delta epsilon zeta".split()
    rows = [
        {"doc_id": n, "text": " ".join(words[:n])} for n in range(0, 7)
    ]
    pq.write_table(pa.Table.from_pylist(rows), str(tmp_path / "documents.parquet"))
    got = {}
    for r in winnow_fingerprints(str(tmp_path)).take_all():
        got.setdefault(r["doc_id"], []).append((r["pos"], r["fp"]))
    # < k tokens -> absent entirely
    for n in range(0, WINNOW_K):
        assert n not in got
    # exactly k tokens -> the single gram is the fingerprint at pos 1
    g = " ".join(words[:WINNOW_K])
    assert got[WINNOW_K] == [(1, poly_hash(g))]
    # k..w+k-1 tokens: exactly ONE selection (a single whole-range window)
    for n in range(WINNOW_K, 7):
        m = n - WINNOW_K + 1
        if m <= 4:
            assert len(got[n]) == 1, n
