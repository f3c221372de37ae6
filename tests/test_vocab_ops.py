"""Tests for the vocabulary/tokenizer-statistics ops (pipelines/vocab.py)
plus the Gram-matrix and event-pivot ops they shipped with: brute-force
Python parity on the sf0.001 fixture, so engine == spec holds independent
of the SQL oracles."""

from __future__ import annotations

import math
import re
from collections import Counter
from itertools import combinations

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"
_TOK = re.compile(r"[a-z0-9]+")


def _texts():
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    return dict(zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()))


def test_bpe_pair_counts_bruteforce(ray_session):
    from web_crawler_search_engine_ray.pipelines.vocab import bpe_pair_counts

    df = bpe_pair_counts(SF).to_pandas()
    exp: Counter = Counter()
    for t in _texts().values():
        for w in _TOK.findall(t.lower()):
            for a, b in zip(w, w[1:]):
                exp[(a, b)] += 1
    got = {(r.a, r.b): r.cnt for r in df.itertuples()}
    assert got == dict(exp)
    # partials are alphabet-bounded: [a-z0-9] pairs only
    assert len(df) <= 36 * 36


def test_token_cooccurrence_bruteforce(ray_session):
    from web_crawler_search_engine_ray.pipelines.vocab import token_cooccurrence

    df = token_cooccurrence(SF).to_pandas()
    texts = _texts()
    docsets = {d: set(_TOK.findall(t.lower())) for d, t in texts.items()}
    dfc: Counter = Counter()
    for s in docsets.values():
        dfc.update(s)
    top = sorted(dfc, key=lambda t: (-dfc[t], t))[:64]
    topset = set(top)
    exp: Counter = Counter()
    for s in docsets.values():
        for a, b in combinations(sorted(s & topset), 2):
            exp[(a, b)] += 1
    exp = {k: v for k, v in exp.items() if v >= 2}
    got = {(r.token_a, r.token_b): r.n_docs for r in df.itertuples()}
    assert got == exp
    # pair keys are lexicographically ordered
    assert (df["token_a"] < df["token_b"]).all()


def test_embedding_covariance_exact(ray_session):
    from web_crawler_search_engine_ray.pipelines.cluster import (
        COV_SCALE,
        embedding_covariance,
    )

    df = embedding_covariance(SF).to_pandas()
    emb = pq.read_table(f"{SF}/embeddings.parquet", columns=["embedding"])
    m = np.array(emb.column("embedding").to_pylist(), dtype=np.float64)
    q = np.floor(m * COV_SCALE + 0.5).astype(np.int64)
    gram = q.T @ q
    d = gram.shape[0]
    assert len(df) == d * (d + 1) // 2
    for r in df.itertuples():
        assert gram[r.i - 1, r.j - 1] == r.s
    # symmetric matrix is recoverable from the upper triangle alone
    assert (df["i"] <= df["j"]).all()


def test_embedding_covariance_block_invariant(ray_session):
    """Partial-sum exchange must be exact under any block layout: the
    int64 Gram partials commute, so 1-block and many-block runs agree."""
    import ray
    import pyarrow as pa
    from web_crawler_search_engine_ray.pipelines import cluster as CL

    # monkeypatch-free: run over a repartitioned copy via the same kernel
    emb = pq.read_table(f"{SF}/embeddings.parquet", columns=["embedding"])
    base = CL.embedding_covariance(SF).to_pandas().sort_values(["i", "j"])
    m = np.array(emb.column("embedding").to_pylist(), dtype=np.float64)
    q = np.floor(m * CL.COV_SCALE + 0.5).astype(np.int64)
    # split into 7 uneven chunks and sum partial Grams
    parts = np.array_split(q, 7)
    gram = sum(p.T @ p for p in parts)
    got = base.set_index(["i", "j"])["s"]
    iu, ju = np.triu_indices(gram.shape[0])
    for i, j in zip(iu, ju):
        assert got[(i + 1, j + 1)] == gram[i, j]


def test_events_pivot_bruteforce(ray_session):
    from web_crawler_search_engine_ray.pipelines.relational import (
        EVENT_TYPES,
        events_pivot,
    )

    df = events_pivot(SF).to_pandas().set_index("user_id").sort_index()
    ev = pq.read_table(
        f"{SF}/events.parquet", columns=["user_id", "event_type", "value"]
    ).to_pandas()
    for uid, g in ev.groupby("user_id"):
        row = df.loc[uid]
        assert row["n_events"] == len(g)
        for t in EVENT_TYPES:
            assert row[f"n_{t}"] == (g["event_type"] == t).sum()
        cents = np.floor(g["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        mask = (g["event_type"] == "purchase").to_numpy()
        assert row["purchase_value_c"] == int(cents[mask].sum())
    assert set(df.index) == set(ev["user_id"].unique())
    # counts pivot back to the total
    type_cols = [f"n_{t}" for t in EVENT_TYPES]
    assert (df[type_cols].sum(axis=1) == df["n_events"]).all()


def test_events_pivot_null_values(ray_session, tmp_path):
    """A NULL purchase value contributes 0 to purchase_value_c (the
    oracle's SUM ... FILTER skips NULLs) — not INT64_MIN garbage from
    floor(NaN)."""
    import pyarrow as pa

    from web_crawler_search_engine_ray.pipelines.relational import events_pivot

    tbl = pa.table(
        {
            "user_id": pa.array([1, 1, 2, 2], pa.int64()),
            "event_type": pa.array(["purchase", "purchase", "purchase", "click"]),
            "value": pa.array([None, 2.505, None, None], pa.float64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    df = events_pivot(str(tmp_path)).to_pandas().set_index("user_id").sort_index()
    assert df.loc[1, "purchase_value_c"] == 251  # floor(2.505*100 + 0.5)
    assert df.loc[2, "purchase_value_c"] == 0
    assert df.loc[1, "n_purchase"] == 2 and df.loc[2, "n_purchase"] == 1


def test_quality_c4_bruteforce(ray_session):
    from web_crawler_search_engine_ray.pipelines.textprep import (
        C4_LINE_TOKENS,
        C4_MIN_KEPT_LINES,
        C4_MIN_LINE_WORDS,
        quality_c4,
    )

    df = quality_c4(SF).to_pandas().set_index("doc_id").sort_index()
    texts = _texts()
    saw_lorem = saw_brace = saw_short = saw_nopunct = 0
    for d, t in texts.items():
        toks = _TOK.findall(t.lower())
        lines = [
            toks[k * C4_LINE_TOKENS : (k + 1) * C4_LINE_TOKENS]
            for k in range(math.ceil(len(toks) / C4_LINE_TOKENS))
        ]
        if d % 13 == 6 and lines:
            lines[0] = ["lorem", "ipsum"] + lines[0]
        if d % 17 == 9 and len(lines) > 1:
            lines[1] = lines[1] + ["{"]
        if d % 11 == 4 and len(lines) > 2:
            lines[2] = lines[2][:3]
        kept = []
        for k, lt in enumerate(lines):
            punct = (d + k) % 3 != 2
            ok = (
                punct
                and len(lt) >= C4_MIN_LINE_WORDS
                and "lorem" not in lt
                and "{" not in lt
            )
            saw_lorem += "lorem" in lt
            saw_brace += "{" in lt
            saw_short += len(lt) < C4_MIN_LINE_WORDS
            saw_nopunct += not punct
            if ok:
                kept.append(len(lt))
        row = df.loc[d]
        assert row["n_lines"] == len(lines)
        assert row["n_kept_lines"] == len(kept)
        assert row["n_kept_words"] == sum(kept)
        assert row["keep"] == (len(kept) >= C4_MIN_KEPT_LINES)
    # every trap fired somewhere on the fixture, and both verdicts occur
    assert saw_lorem and saw_brace and saw_short and saw_nopunct
    assert df["keep"].any() and (~df["keep"]).any()


def test_doc_surprisal_bruteforce(ray_session):
    from web_crawler_search_engine_ray.pipelines.vocab import doc_surprisal

    df = doc_surprisal(SF).to_pandas().set_index("doc_id").sort_index()
    texts = _texts()
    tf_all = Counter()
    per_doc = {}
    for d, t in texts.items():
        c = Counter(_TOK.findall(t.lower()))
        per_doc[d] = c
        tf_all.update(c)
    n_total = sum(tf_all.values())
    for d, c in per_doc.items():
        dl = sum(c.values())
        if dl == 0:
            assert d not in df.index
            continue
        p = sum(
            int(math.floor(f * math.log(n_total / tf_all[w]) * 1000.0 + 0.5))
            for w, f in c.items()
        )
        row = df.loc[d]
        assert row["n_tokens"] == dl
        assert row["surprisal_milli"] == p
        assert row["avg_surprisal_milli"] == p // dl
    assert set(df.index) == {d for d, c in per_doc.items() if sum(c.values())}
    # rarer vocabularies must read as more surprising than common ones
    assert df["avg_surprisal_milli"].nunique() > 1


def test_bpe_train_reference_trainer(ray_session):
    from web_crawler_search_engine_ray.pipelines.vocab import BPE_ROUNDS, bpe_train

    got = bpe_train(SF).to_pandas()

    # pure-Python reference BPE (Sennrich et al.): unique-word freqs,
    # overlapping pair counts, argmax (count desc, pair asc),
    # left-to-right non-overlapping merge
    freqs = Counter()
    for t in _texts().values():
        freqs.update(w for w in _TOK.findall(t.lower()) if len(w) >= 2)
    seqs = {w: list(w) for w in freqs}
    exp = []
    for r in range(BPE_ROUNDS):
        pc_ = Counter()
        for w, sym in seqs.items():
            f = freqs[w]
            for x, y in zip(sym, sym[1:]):
                pc_[(x, y)] += f
        if not pc_:
            break
        (a, b), cnt = min(pc_.items(), key=lambda kv: (-kv[1], kv[0]))
        exp.append((r + 1, a, b, cnt))
        for w, sym in seqs.items():
            merged, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(sym[i])
                    i += 1
            seqs[w] = merged
    assert [tuple(r) for r in got[["rank", "a", "b", "count"]].itertuples(index=False)] == exp
    # merges actually compound: some later merge uses a multi-char symbol
    assert any(len(a) > 1 or len(b) > 1 for _, a, b, _ in exp)


def test_char_pair_counts_property():
    """Hypothesis parity: the fused codepoint scan == the per-word loop,
    on arbitrary words (any unicode except the '\\n' separator and lone
    surrogates — category Cs can't round-trip utf-32 and can't be held
    by pa.string() either, so it is outside the kernel's domain), without
    needing a Ray session."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from web_crawler_search_engine_ray.pipelines.vocab import char_pair_counts

    words_st = st.lists(
        st.text(
            alphabet=st.characters(
                blacklist_categories=("Cs",), blacklist_characters="\n"
            ),
            min_size=0,
            max_size=12,
        ),
        min_size=0,
        max_size=40,
    )

    @settings(max_examples=200, deadline=None)
    @given(words_st)
    def check(words):
        got = {
            (r.a, r.b): r.cnt
            for r in char_pair_counts(words).to_pandas().itertuples()
        }
        exp = Counter()
        for w in words:
            for a, b in zip(w, w[1:]):
                exp[(a, b)] += 1
        assert got == dict(exp)

    check()


def test_vocab_coverage_bruteforce(ray_session):
    from web_crawler_search_engine_ray.pipelines.corpus import _TOK_RE
    from web_crawler_search_engine_ray.pipelines.vocab import (
        VOCAB_SIZES,
        vocab_coverage,
    )

    got = {r["vocab_size"]: r for r in vocab_coverage(SF).to_pylist()}
    c = Counter()
    for t in _texts().values():
        c.update(_TOK_RE.findall(t.lower()))
    ordered = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(c.values())
    assert set(got) == set(VOCAB_SIZES)
    for v in VOCAB_SIZES:
        covered = sum(cnt for _, cnt in ordered[:v])
        r = got[v]
        assert r["covered"] == covered and r["total"] == total
        assert r["coverage_milli"] == (1000 * covered + total // 2) // total
    # curve is monotone and ends at full coverage iff vocab fits
    vals = [got[v]["covered"] for v in sorted(VOCAB_SIZES)]
    assert vals == sorted(vals)
    if len(ordered) <= max(VOCAB_SIZES):
        assert got[max(VOCAB_SIZES)]["covered"] == total


def test_bpe_encode_stats_bruteforce(ray_session):
    """Encode matches a pure-python apply of the trained merges (in rank
    order, left-to-right non-overlapping), per document."""
    from web_crawler_search_engine_ray.pipelines.corpus import _TOK_RE
    from web_crawler_search_engine_ray.pipelines.vocab import (
        bpe_encode_stats,
        bpe_train,
        merge_pair,
    )

    merges_tbl = bpe_train(SF)
    merges = list(
        zip(merges_tbl.column("a").to_pylist(), merges_tbl.column("b").to_pylist())
    )
    assert len(merges) == 8

    def nsym(w):
        sym = list(w)
        for a, b in merges:
            sym = merge_pair(sym, a, b)
        return len(sym)

    got = {r["doc_id"]: r for r in bpe_encode_stats(SF).take_all()}
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    n_checked = 0
    for did, txt in zip(
        docs.column("doc_id").to_pylist(), docs.column("text").to_pylist()
    ):
        toks = _TOK_RE.findall(txt.lower())
        if not toks:
            assert did not in got
            continue
        n, nb = len(toks), sum(nsym(w) for w in toks)
        r = got[did]
        assert r["n_tokens"] == n and r["n_bpe_tokens"] == nb
        assert r["avg_symbols_milli"] == (1000 * nb + n // 2) // n
        n_checked += 1
    assert n_checked == len(got) and n_checked > 0
    # merging strictly compresses somewhere in a real corpus
    assert any(got[d]["n_bpe_tokens"] < sum(len(w) for w in
               _TOK_RE.findall(t.lower()))
               for d, t in zip(docs.column("doc_id").to_pylist()[:50],
                               docs.column("text").to_pylist()[:50])
               if _TOK_RE.findall(t.lower()))


def test_merge_pair_semantics():
    from web_crawler_search_engine_ray.pipelines.vocab import merge_pair

    # left-to-right non-overlapping on runs
    assert merge_pair(list("bbbb"), "b", "b") == ["bb", "bb"]
    assert merge_pair(list("bbbbb"), "b", "b") == ["bb", "bb", "b"]
    assert merge_pair(list("bbb"), "b", "b") == ["bb", "b"]
    # whole-symbol matching only (no substring merges)
    assert merge_pair(["yx", "a"], "x", "a") == ["yx", "a"]
    assert merge_pair(["a", "ab"], "a", "a") == ["a", "ab"]
    # merged symbol is not rescanned within the round
    assert merge_pair(["a", "b", "b"], "a", "b") == ["ab", "b"]


def test_doc_bigram_surprisal_bruteforce(ray_session):
    """Engine == dense python replay of sum of -ln P(b|a) milli terms,
    and the bigram model orders the injected repetitive doc below (more
    predictable than) typical docs."""
    from web_crawler_search_engine_ray.pipelines.vocab import (
        doc_bigram_surprisal,
    )

    texts = _texts()
    tf2: Counter = Counter()
    doc_bg = {}
    for d, t in texts.items():
        toks = _TOK.findall(t.lower())
        pairs = list(zip(toks, toks[1:]))
        if not pairs:
            continue
        doc_bg[d] = Counter(pairs)
        tf2.update(pairs)
    c1: Counter = Counter()
    for (a, _), c in tf2.items():
        c1[a] += c
    got = {r["doc_id"]: r for r in doc_bigram_surprisal(SF).take_all()}
    assert set(got) == set(doc_bg)
    for d, bgs in doc_bg.items():
        nb = sum(bgs.values())
        s = sum(
            int(
                np.floor(
                    float(f) * np.log(float(c1[a]) / float(tf2[(a, b)])) * 1000.0
                    + 0.5
                )
            )
            for (a, b), f in bgs.items()
        )
        r = got[d]
        assert r["n_bigrams"] == nb
        assert r["surprisal_milli"] == s
        assert r["avg_surprisal_milli"] == s // nb
    # every term is non-negative (C1 >= C2), so surprisal >= 0
    assert all(r["surprisal_milli"] >= 0 for r in got.values())


def test_bpe_fewer_merges_than_rounds(ray_session, tmp_path):
    """A tiny-alphabet corpus exhausts its merge pairs before 8 rounds:
    the engine breaks early and the oracle's NULL-guard CASE (a round
    with no merge leaves sequences untouched) must replay it exactly —
    for BOTH bpe_train and bpe_encode_stats."""
    import duckdb
    import pyarrow as pa

    from web_crawler_search_engine_ray.pipelines.vocab import (
        bpe_encode_stats,
        bpe_train,
    )

    rows = [
        {"doc_id": 0, "text": "ab ab ab ba"},
        {"doc_id": 1, "text": "ab ba ba"},
        {"doc_id": 2, "text": "b a"},  # 1-char words: encoded, never trained
    ]
    pq.write_table(pa.Table.from_pylist(rows), str(tmp_path / "documents.parquet"))

    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "__wcse_entry_bpe__",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "__ray_entry__.py",
        ),
    )
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )

    merges = bpe_train(str(tmp_path))
    assert 0 < merges.num_rows < 8  # genuinely exhausted early
    sql_m = con.execute(entry.oracle_sql()["bpe_train"]).fetchall()
    assert [
        (r["rank"], r["a"], r["b"], r["count"]) for r in merges.to_pylist()
    ] == [tuple(r) for r in sql_m]

    enc = sorted(
        (r["doc_id"], r["n_tokens"], r["n_bpe_tokens"], r["avg_symbols_milli"])
        for r in bpe_encode_stats(str(tmp_path)).take_all()
    )
    sql_e = sorted(
        tuple(r)
        for r in con.execute(
            entry.oracle_sql()["bpe_encode_stats"]
        ).fetchall()
    )
    assert enc == sql_e
