"""Tests for text-prep ops (pipelines/textprep.py) + stratified sampling."""

from __future__ import annotations

import re
from collections import Counter

import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_pii_redact_scrubs_everything(ray_session):
    from web_crawler_search_engine_ray.pipelines.textprep import pii_redact

    df = pii_redact(SF).to_pandas()
    assert (df["n_emails"] >= 1).all()
    assert (df["n_phones"] >= 1).all()
    assert (df["n_ips"] >= 1).all()
    joined = "\n".join(df["redacted"])
    assert "@example.com" not in joined
    assert "555-" not in joined
    assert "<EMAIL>" in joined and "<PHONE>" in joined and "<IP>" in joined


def test_quality_gopher_matches_direct(ray_session):
    from web_crawler_search_engine_ray.pipelines.textprep import quality_gopher

    df = quality_gopher(SF).to_pandas().set_index("doc_id")
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    tok = re.compile(r"[a-z0-9]+")
    for d, t in list(zip(docs.column("doc_id").to_pylist(), docs.column("text").to_pylist()))[:25]:
        toks = tok.findall(t.lower())
        c = Counter(toks)
        row = df.loc[d]
        assert row["n_words"] == len(toks)
        assert row["n_distinct"] == len(c)
        assert row["top_tok_count"] == (max(c.values()) if c else 0)
        n = len(toks)
        mean = (1000 * sum(map(len, toks)) + n // 2) // n if n else 0
        assert row["mean_word_len_milli"] == mean
    # the gate must be internally consistent with the emitted signals
    gate = (
        df["n_words"].between(50, 100_000)
        & df["mean_word_len_milli"].between(3000, 10_000)
        & (df["top_frac_milli"] <= 250)
    )
    assert (df["passes_gate"] == gate).all()


def test_stratified_sample_rates(ray_session):
    from web_crawler_search_engine_ray.pipelines.sketch import (
        stratified_sample_events,
    )

    got = stratified_sample_events(SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet", columns=["event_type"]).to_pandas()
    base = ev["event_type"].value_counts()
    kept = got["event_type"].value_counts()
    # error stratum keeps 100%
    if "error" in base:
        assert kept.get("error", 0) == base["error"]
    # purchase ~50%, bulk ~5%
    if "purchase" in base and base["purchase"] > 50:
        r = kept.get("purchase", 0) / base["purchase"]
        assert 0.35 < r < 0.65
    bulk = [t for t in base.index if t not in ("error", "purchase")]
    n_bulk = sum(base[t] for t in bulk)
    k_bulk = sum(kept.get(t, 0) for t in bulk)
    assert 0.02 < k_bulk / n_bulk < 0.10


def test_decontaminate_flags_canary_docs(ray_session):
    """Contaminated == exactly the doc_id % 7 == 3 training docs (the
    canary-injected set), each overlapping in >= 3 windows (the 3 fully
    inside-canary 8-grams); benchmark docs are excluded from the output."""
    from web_crawler_search_engine_ray.pipelines.textprep import decontaminate

    from web_crawler_search_engine_ray.pipelines.textprep import (
        _decon_augment,
        _decon_grams,
    )

    got = decontaminate(SF).to_pandas().set_index("doc_id")
    assert not any(i % 97 == 0 for i in got.index)
    flagged = set(got.index[got["contaminated"] == 1])
    want_canary = {i for i in got.index if i % 7 == 3}
    # every canary doc flagged, with at least the 3 inside-canary windows
    assert want_canary <= flagged
    assert (got.loc[sorted(want_canary), "n_overlap"] >= 3).all()
    # full python-oracle replay: flagged == docs sharing any window with
    # the benchmark side (canary docs + genuine near-dups of bench docs)
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    pairs = list(
        zip(docs.column("doc_id").to_pylist(), docs.column("text").to_pylist())
    )
    bench = set()
    for d, t in pairs:
        if d % 97 == 0:
            bench |= _decon_grams(_decon_augment(d, t))
    for d, t in pairs:
        if d % 97 == 0:
            continue
        grams = _decon_grams(_decon_augment(d, t))
        assert got.loc[d, "n_grams"] == len(grams)
        assert got.loc[d, "n_overlap"] == len(grams & bench)
    clean = got[got["contaminated"] == 0]
    assert (clean["n_overlap"] == 0).all()
    assert (got["n_grams"] > 0).all()


def test_dup_substring_spans_matches_python_oracle(ray_session):
    """Independent python replay of the windowed exact-substring dedup:
    10-token windows, cross-doc duplicates, gaps-and-islands runs."""
    from web_crawler_search_engine_ray.pipelines.textprep import (
        DUPSPAN_CANARY,
        DUPSPAN_MOD,
        DUPSPAN_W,
        dup_substring_spans,
    )

    got = (
        dup_substring_spans(SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    tok = re.compile(r"[a-z0-9]+")
    W = DUPSPAN_W
    wins = {}  # doc -> list of window strings
    for d, t in zip(docs.column("doc_id").to_pylist(), docs.column("text").to_pylist()):
        if d % DUPSPAN_MOD == 2:
            t = t + DUPSPAN_CANARY
        toks = tok.findall(t.lower())
        if len(toks) >= W:
            wins[d] = [" ".join(toks[i : i + W]) for i in range(len(toks) - W + 1)]
    doc_count = Counter()
    for d, ws in wins.items():
        for g in set(ws):
            doc_count[g] += 1
    dup = {g for g, c in doc_count.items() if c >= 2}
    exp = {}
    for d, ws in wins.items():
        pos = [i for i, g in enumerate(ws) if g in dup]
        if not pos:
            continue
        runs, cur = [], 1
        for a, b in zip(pos, pos[1:]):
            if b == a + 1:
                cur += 1
            else:
                runs.append(cur)
                cur = 1
        runs.append(cur)
        nw, nd = len(ws), len(pos)
        exp[d] = (
            nw,
            nd,
            (1000 * nd + nw // 2) // nw,
            max(runs),
            max(runs) + W - 1,
        )

    assert set(got["doc_id"]) == set(exp)
    for _, r in got.iterrows():
        e = exp[r["doc_id"]]
        assert (
            r["n_windows"],
            r["n_dup_windows"],
            r["dup_frac_milli"],
            r["max_dup_run"],
            r["longest_dup_span"],
        ) == e
    # injected boilerplate guarantees every %5==2 doc is flagged with a
    # run spanning at least the 16-token canary
    canary_docs = {d for d in wins if d % DUPSPAN_MOD == 2}
    flagged = set(got["doc_id"])
    assert canary_docs <= flagged
    sub = got[got["doc_id"] % DUPSPAN_MOD == 2]
    assert (sub["longest_dup_span"] >= 16).all()


def test_sequence_pack_scan_invariants(ray_session):
    """The distributed prefix-scan must produce a gapless token stream in
    doc_id order, matching a single-process replay exactly."""
    import numpy as np

    from web_crawler_search_engine_ray.pipelines.textprep import (
        PACK_CAPACITY,
        sequence_pack,
    )

    df = sequence_pack(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    tok = re.compile(r"[a-z0-9]+")
    n = {
        d: len(tok.findall(t.lower()))
        for d, t in zip(
            docs.column("doc_id").to_pylist(), docs.column("text").to_pylist()
        )
    }
    assert list(df["doc_id"]) == sorted(n)
    assert list(df["n_tokens"]) == [n[d] for d in sorted(n)]
    # gapless: each start = previous start + previous length
    starts = df["start_offset"].to_numpy()
    lens = df["n_tokens"].to_numpy()
    assert starts[0] == 0
    assert (starts[1:] == starts[:-1] + lens[:-1]).all()
    # pack arithmetic
    assert (df["pack_id"] == starts // PACK_CAPACITY).all()
    last = np.maximum(starts, starts + lens - 1)
    assert (df["end_pack"] == last // PACK_CAPACITY).all()
    assert (df["n_packs_spanned"] >= 1).all()
    assert (df["n_packs_spanned"].to_numpy() >= 2).any()  # capacity spans happen


def test_interleave_mix_matches_simulated_schedule(ray_session):
    """The closed-form slot must equal an explicitly SIMULATED stride
    schedule: sort all (vt, src_idx) pairs and rank them."""
    import numpy as np

    from web_crawler_search_engine_ray.pipelines.textprep import (
        MIX_STRIDE_LCM,
        interleave_mix,
    )

    out = interleave_mix(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "source"])
    rows = sorted(
        zip(docs.column("doc_id").to_pylist(), docs.column("source").to_pylist())
    )
    per_src_seq: dict = {}
    sim = []
    for did, src in rows:  # doc_id asc => per-source seq asc
        k = per_src_seq.get(src, 0)
        per_src_seq[src] = k + 1
        idx = int(src[3:])
        d = MIX_STRIDE_LCM // (1 + idx % 4)
        sim.append(((k + 1) * d, idx, did, src, k))
    sim.sort(key=lambda r: (r[0], r[1]))
    want = {r[2]: (slot, r[4], r[0]) for slot, r in enumerate(sim)}
    got = dict(zip(out["doc_id"], zip(out["slot"], out["seq"], out["vt"])))
    assert got == {k: tuple(map(int, v)) for k, v in want.items()}
    # slots are a permutation and weight-2x sources appear ~2x as often
    sl = np.sort(out["slot"].to_numpy())
    assert (sl == np.arange(len(sl))).all()


def test_interleave_mix_weight_proportionality(ray_session):
    """In any prefix of the interleaved stream, each source's share tracks
    its weight (the property trainers rely on)."""
    from web_crawler_search_engine_ray.pipelines.textprep import interleave_mix

    out = interleave_mix(SF).to_pandas().sort_values("slot")
    head = out.head(200)
    by_w: dict = {}
    for src, cnt in head["source"].value_counts().items():
        w = 1 + int(src[3:]) % 4
        by_w.setdefault(w, []).append(cnt)
    means = {w: sum(v) / len(v) for w, v in by_w.items()}
    assert means[4] > means[1] * 2.5  # 4x-weight sources dominate 1x ones


def test_shuffle_order_is_seeded_permutation(ray_session):
    """pos is a permutation of 0..n-1, ordered exactly by
    (mix32(doc_id, seed), doc_id), and stable across partitioning."""
    import numpy as np

    from web_crawler_search_engine_ray.functions.hashing import mix32_batch
    from web_crawler_search_engine_ray.pipelines.textprep import (
        SHUFFLE_SEED,
        shuffle_order,
    )

    out = shuffle_order(SF).to_pandas().sort_values("pos").reset_index(drop=True)
    assert (out["pos"].to_numpy() == np.arange(len(out))).all()
    ids = out["doc_id"].to_numpy()
    keys = mix32_batch(ids.astype(np.uint64), SHUFFLE_SEED).astype(np.int64)
    assert (out["shuffle_key"].to_numpy() == keys).all()
    want = sorted(zip(keys, ids))
    assert [d for _, d in want] == list(ids)
    # the shuffle actually permutes (not identity / not sorted by doc_id)
    assert not (ids == np.sort(ids)).all()


def test_dsir_select_discriminates_target_lang(ray_session):
    """DSIR selection must strongly enrich the target-lang slice, and the
    score must equal a single-process replay of the hashed-bigram math."""
    import numpy as np

    from web_crawler_search_engine_ray.functions.hashing import poly_hash
    from web_crawler_search_engine_ray.pipelines.textprep import (
        DSIR_BUCKETS,
        DSIR_SEL_MILLI,
        DSIR_TARGET_LANG,
        dsir_select,
    )
    from web_crawler_search_engine_ray.pipelines.corpus import _TOK_RE

    out = dsir_select(SF).to_pandas().set_index("doc_id")
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text", "lang"])
    ids = docs.column("doc_id").to_pylist()
    texts = docs.column("text").to_pylist()
    langs = docs.column("lang").to_pylist()

    def buckets(t):
        toks = _TOK_RE.findall(t.lower())
        return [
            poly_hash(a + " " + b) % DSIR_BUCKETS for a, b in zip(toks, toks[1:])
        ]

    ct = np.zeros(DSIR_BUCKETS, dtype=np.int64)
    cr = np.zeros(DSIR_BUCKETS, dtype=np.int64)
    for t, lg in zip(texts, langs):
        for b in buckets(t):
            cr[b] += 1
            if lg == DSIR_TARGET_LANG:
                ct[b] += 1
    w = (1000 * (ct + 1)) // (cr + 1)
    for d, t in list(zip(ids, texts))[:40]:
        bk = buckets(t)
        row = out.loc[d]
        assert row["n_bigrams"] == len(bk)
        assert row["score_milli"] == int(w[bk].sum())
        assert row["selected"] == (
            len(bk) > 0 and int(w[bk].sum()) >= DSIR_SEL_MILLI * len(bk)
        )
    # enrichment: selected set is mostly target-lang, recall is high
    sel_langs = [lg for d, lg in zip(ids, langs) if out.loc[d, "selected"]]
    n_en = sum(1 for lg in sel_langs if lg == DSIR_TARGET_LANG)
    assert n_en / len(sel_langs) >= 0.75
    total_en = sum(1 for lg in langs if lg == DSIR_TARGET_LANG)
    assert n_en / total_en >= 0.75


def test_sequence_pack_shuffled_is_gapless_in_shuffle_order(ray_session):
    """Offsets must form a gapless token stream when rows are ordered by
    the shuffle permutation (not doc_id), and agree with shuffle_order."""
    import numpy as np

    from web_crawler_search_engine_ray.pipelines.textprep import (
        sequence_pack_shuffled,
        shuffle_order,
    )

    packs = sequence_pack_shuffled(SF).to_pandas()
    order = shuffle_order(SF).to_pandas().sort_values("pos")
    merged = order.merge(packs, on="doc_id").sort_values("pos")
    n = merged["n_tokens"].to_numpy()
    start = merged["start_offset"].to_numpy()
    assert start[0] == 0
    assert (start[1:] == start[:-1] + n[:-1]).all()  # gapless in stream order
    # and NOT gapless in doc_id order (the shuffle actually reordered)
    by_doc = packs.sort_values("doc_id")
    sd = by_doc["start_offset"].to_numpy()
    assert not (sd[1:] >= sd[:-1]).all()


def test_repetition_ngrams_signals(ray_session):
    """Canary docs (doc_id % 9 == 4, REP_CANARY appended twice) must show
    dup-5-gram coverage of at least the two canary copies' characters;
    this corpus' plain word-soup docs have none. Fixed-point ratios and
    the gate must be internally consistent."""
    from web_crawler_search_engine_ray.pipelines.textprep import (
        REP_CANARY,
        REP_DUP_MOD,
        REP_DUP_REM,
        REP_MAX_DUP5_MILLI,
        REP_MAX_TOP2_MILLI,
        repetition_ngrams,
    )

    df = repetition_ngrams(SF).to_pandas().set_index("doc_id")
    canary_chars = 2 * sum(len(w) for w in REP_CANARY.split())
    for d, row in df.iterrows():
        if d % REP_DUP_MOD == REP_DUP_REM:
            assert row["dup5_chars"] >= canary_chars
        else:
            assert row["dup5_chars"] == 0
        total = row["total_chars"]
        for frac, chars in (
            ("top2_frac_milli", "top2_chars"),
            ("dup5_frac_milli", "dup5_chars"),
        ):
            expect = (1000 * row[chars] + total // 2) // total if total else 0
            assert row[frac] == expect
        assert row["passes_gate"] == (
            row["top2_frac_milli"] <= REP_MAX_TOP2_MILLI
            and row["dup5_frac_milli"] <= REP_MAX_DUP5_MILLI
        )
    # the gate discriminates: some docs fail, most pass
    assert 0 < (~df["passes_gate"]).sum() < len(df) // 2


def test_corpus_funnel_counts(ray_session):
    """Stage counts must be monotone non-increasing, start at the table
    row count, and each stage must remove at least one document on this
    corpus (language, quality, the injected exact duplicates, and the
    decontamination canaries all fire)."""
    from web_crawler_search_engine_ray.pipelines.textprep import (
        FUNNEL_STAGES,
        corpus_funnel,
    )

    df = corpus_funnel(SF).to_pandas().sort_values("stage")
    assert list(df["stage_name"]) == list(FUNNEL_STAGES)
    docs = list(df["docs"])
    n_docs = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    assert docs[0] == n_docs
    # every stage removes something on this corpus
    assert docs[0] > docs[1] > 0  # language gate fired
    assert docs[1] > docs[2] > 0  # gopher quality gate fired
    assert docs[2] > docs[3] > 0  # exact dedup fired and kept survivors
    assert docs[3] > docs[4] > 0  # decontamination fired


def test_train_stream_pack_composition(ray_session):
    """The capstone composition must pack EXACTLY corpus_funnel's
    surviving documents, gaplessly, in the shuffle_order permutation
    restricted to the kept set."""
    import numpy as np

    from web_crawler_search_engine_ray.pipelines.textprep import (
        corpus_funnel,
        train_stream_pack,
    )

    packs = train_stream_pack(SF).to_pandas()
    funnel = corpus_funnel(SF).to_pandas().sort_values("stage")
    assert len(packs) == int(funnel["docs"].iloc[4])  # stage-4 survivors
    # gapless token stream in (mix32 shuffle key, doc_id) order
    from web_crawler_search_engine_ray.functions.hashing import mix32_batch
    from web_crawler_search_engine_ray.pipelines.textprep import SHUFFLE_SEED

    key = mix32_batch(
        packs["doc_id"].to_numpy().astype(np.uint64), SHUFFLE_SEED
    ).astype(np.int64)
    order = np.lexsort((packs["doc_id"].to_numpy(), key))
    start = packs["start_offset"].to_numpy()[order]
    n = packs["n_tokens"].to_numpy()[order]
    assert start[0] == 0
    assert (start[1:] == start[:-1] + n[:-1]).all()


def test_tokenizer_seam_unicode_parity():
    """Adversarial pin of the engine-tokenizer vs DuckDB-oracle seam:
    `_TOK_RE.findall(t.lower())` (Python) must tokenize identically to
    `regexp_extract_all(lower(text), '[a-z0-9]+')` (DuckDB/RE2+utf8proc)
    on arbitrary unicode text. The SINGLE known divergence is U+0130
    (LATIN CAPITAL LETTER I WITH DOT ABOVE): Python's SpecialCasing
    lower() expands it to 'i'+U+0307 (combining dot splits the [a-z0-9]
    run: 'AİB' -> ['ai','b']) while utf8proc folds it to plain 'i'
    ('aib'). It is excluded from the strategy here, and
    test_fixture_text_is_ascii below proves the fixture generator can
    never emit it — together these close the seam. (Lone surrogates are
    excluded because parquet/pa.string() cannot carry them at all.)"""
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from web_crawler_search_engine_ray.pipelines.corpus import _TOK_RE

    con = duckdb.connect()
    text_st = st.text(
        alphabet=st.characters(
            blacklist_categories=("Cs",), blacklist_characters="İ"
        ),
        max_size=60,
    )

    @settings(max_examples=300, deadline=None)
    @given(text_st)
    def check(t):
        engine = _TOK_RE.findall(t.lower())
        oracle = con.execute(
            "SELECT regexp_extract_all(lower(?), '[a-z0-9]+')", [t]
        ).fetchone()[0]
        assert engine == oracle, (t, engine, oracle)

    check()


def test_fixture_text_is_ascii():
    """Executable fixture contract: every text-bearing column the
    synthetic generators emit is pure ASCII, so the U+0130 divergence
    documented above is unreachable from any fixture-driven pipeline."""
    from web_crawler_search_engine_ray.sources.synthetic_web import generate_web

    web = generate_web(seed=42, num_hosts=4, num_docs=60)
    for r in web["docs"].to_pylist():
        for s in r["spans"]:
            assert (s["text"] or "").isascii()
            assert (s["media_ref"] or "").isascii()
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/documents.parquet", columns=["text"])
    for chunk in t.column("text").chunks:
        arr = chunk.to_pylist()
        assert all(s.isascii() for s in arr if s is not None)


def test_source_temperature_mix_bruteforce(ray_session):
    """Engine == pure-python apportionment + rank selection, plus the
    temperature property: a small source's selected share exceeds its
    proportional share (tau < 1 flattens the head)."""
    import numpy as np

    from web_crawler_search_engine_ray.functions.hashing import mix32_batch
    from web_crawler_search_engine_ray.pipelines.textprep import (
        SHUFFLE_SEED,
        TEMP_BUDGET_DEN,
        TEMP_BUDGET_NUM,
        TEMP_TAU,
        source_temperature_mix,
    )

    docs = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "source"]
    )
    ids = np.asarray(docs.column("doc_id"), dtype=np.int64)
    srcs = np.array(docs.column("source").to_pylist())
    uniq, counts = np.unique(srcs, return_counts=True)
    n_total = int(counts.sum())
    budget = TEMP_BUDGET_NUM * n_total // TEMP_BUDGET_DEN
    wm = np.floor(np.power(counts.astype(np.float64), TEMP_TAU) * 1000.0 + 0.5
                  ).astype(np.int64)
    w_tot = int(wm.sum())
    base = budget * wm // w_tot
    rem = (budget * wm) % w_tot
    order = sorted(range(len(uniq)), key=lambda i: (-int(rem[i]), uniq[i]))
    alloc = {s: int(b) for s, b in zip(uniq, base)}
    for i in order[: budget - int(base.sum())]:
        alloc[uniq[i]] += 1
    for s, n in zip(uniq, counts):
        alloc[s] = min(alloc[s], int(n))
    key = mix32_batch(ids.astype(np.uint64), SHUFFLE_SEED).astype(np.int64)
    exp = set()
    for s in uniq:
        m = srcs == s
        order_s = np.lexsort((ids[m], key[m]))
        for r, i in enumerate(order_s[: alloc[s]]):
            exp.add((int(ids[m][i]), s, r))
    got = {
        (r["doc_id"], r["source"], r["sel_rank"])
        for r in source_temperature_mix(SF).take_all()
    }
    assert got == exp
    assert len(got) == min(budget, n_total)
    # flattening: smallest source over-represented vs proportional share
    smallest = uniq[np.argmin(counts)]
    prop = counts.min() / n_total
    sel_share = alloc[smallest] / budget
    if counts.min() < counts.max():  # only meaningful when sizes differ
        assert sel_share >= prop


def test_dedup_incremental_bruteforce(ray_session):
    """Engine == python replay over the augmented corpus, and all three
    verdicts fire (dup_base via the %41 family whose members span both
    sides; dup_batch via the %51 family that lands entirely incoming)."""
    from collections import Counter

    from web_crawler_search_engine_ray.pipelines.textprep import (
        INCR_BASE_MOD,
        _incr_augment,
        dedup_incremental,
    )

    docs = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    )
    texts = {
        int(d): _incr_augment(int(d), t)
        for d, t in zip(
            docs.column("doc_id").to_pylist(), docs.column("text").to_pylist()
        )
    }
    base_texts = {t for d, t in texts.items() if d % INCR_BASE_MOD != 0}
    incoming = sorted(d for d in texts if d % INCR_BASE_MOD == 0)
    first_seen: dict = {}
    exp = {}
    for d in incoming:
        t = texts[d]
        if t in base_texts:
            exp[d] = "dup_base"
        elif t in first_seen:
            exp[d] = "dup_batch"
        else:
            first_seen[t] = d
            exp[d] = "novel"
    got = {
        r["doc_id"]: r["status"] for r in dedup_incremental(SF).take_all()
    }
    assert got == exp
    dist = Counter(got.values())
    assert dist["dup_base"] > 0 and dist["dup_batch"] > 0 and dist["novel"] > 0


def test_length_buckets_bruteforce(ray_session):
    """Engine == python bit_length histogram; bucket boundaries exact at
    2^k and 2^k - 1 (the floor(log2) rounding trap)."""
    from collections import Counter

    from web_crawler_search_engine_ray.pipelines.textprep import length_buckets

    tok = re.compile(r"[a-z0-9]+")
    texts = pq.read_table(f"{SF}/documents.parquet", columns=["text"])
    nd: Counter = Counter()
    nt: Counter = Counter()
    total_docs = 0
    for t in texts.column("text").to_pylist():
        n = len(tok.findall(t.lower()))
        if n == 0:
            continue
        b = n.bit_length() - 1
        nd[b] += 1
        nt[b] += n
        total_docs += 1
    got = {r["bucket"]: r for r in length_buckets(SF).take_all()}
    assert set(got) == set(nd)
    for b in nd:
        r = got[b]
        assert r["n_docs"] == nd[b] and r["n_tokens"] == nt[b]
        assert r["lo"] == 1 << b and r["hi"] == (1 << (b + 1)) - 1
    assert sum(r["n_docs"] for r in got.values()) == total_docs


def test_length_buckets_boundaries(ray_session, tmp_path):
    """Docs with exactly 2^k and 2^k - 1 tokens land in adjacent buckets."""
    import pyarrow as pa

    from web_crawler_search_engine_ray.pipelines.textprep import length_buckets

    rows = []
    for i, n in enumerate((1, 2, 3, 4, 7, 8, 15, 16, 31, 32)):
        rows.append({"doc_id": i, "text": " ".join(["tok"] * n)})
    tbl = pa.Table.from_pylist(rows)
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    got = {r["bucket"]: r["n_docs"] for r in length_buckets(str(tmp_path)).take_all()}
    # n=1 -> b0; 2,3 -> b1; 4,7 -> b2; 8,15 -> b3; 16,31 -> b4; 32 -> b5
    assert got == {0: 1, 1: 2, 2: 2, 3: 2, 4: 2, 5: 1}


def test_dedup_incremental_random_collisions(ray_session, tmp_path):
    """Randomized stress: texts drawn from a tiny pool force heavy
    cross-side and batch-only collisions; engine == hash-free replay."""
    import numpy as np
    import pyarrow as pa

    from web_crawler_search_engine_ray.pipelines.textprep import (
        INCR_BASE_MOD,
        _incr_augment,
        dedup_incremental,
    )

    for seed in (11, 12):
        rng = np.random.RandomState(seed)
        pool = [f"text body variant {i} filler words here" for i in range(6)]
        n = 300
        rows = [
            {"doc_id": i, "text": pool[rng.randint(len(pool))]}
            for i in range(n)
        ]
        d = tmp_path / f"s{seed}"
        d.mkdir()
        pq.write_table(pa.Table.from_pylist(rows), str(d / "documents.parquet"))
        texts = {r["doc_id"]: _incr_augment(r["doc_id"], r["text"]) for r in rows}
        base = {t for i, t in texts.items() if i % INCR_BASE_MOD != 0}
        exp, first = {}, {}
        for i in sorted(i for i in texts if i % INCR_BASE_MOD == 0):
            t = texts[i]
            if t in base:
                exp[i] = "dup_base"
            elif t in first:
                exp[i] = "dup_batch"
            else:
                first[t] = i
                exp[i] = "novel"
        got = {
            r["doc_id"]: r["status"]
            for r in dedup_incremental(str(d)).take_all()
        }
        assert got == exp, f"seed {seed}"


def test_source_temperature_mix_caps_small_sources(ray_session, tmp_path):
    """A tiny source whose tau-boosted allocation exceeds its size is
    capped at N_s (never oversampled), and the freed budget is NOT
    reassigned (the documented apportionment semantics)."""
    import numpy as np
    import pyarrow as pa

    from web_crawler_search_engine_ray.pipelines.textprep import (
        source_temperature_mix,
    )

    # source 'rare' has 2 docs vs 298 in 'bulk': tau=0.7 boosts rare far
    # beyond 2/300, so its pre-cap allocation of the 120-doc budget
    # (2*300//5) would exceed 2
    rows = []
    for i in range(300):
        rows.append(
            {
                "doc_id": i,
                "text": f"doc {i} words",
                "source": "rare" if i < 2 else "bulk",
            }
        )
    pq.write_table(pa.Table.from_pylist(rows), str(tmp_path / "documents.parquet"))
    got = {}
    for r in source_temperature_mix(str(tmp_path)).take_all():
        got.setdefault(r["source"], []).append(r["sel_rank"])
    # capped: every rare doc selected, none duplicated
    assert sorted(got["rare"]) == [0, 1]
    # bulk got its own allocation; total <= budget (cap shrinks, never grows)
    assert len(got["bulk"]) + len(got["rare"]) <= 2 * 300 // 5
    assert sorted(got["bulk"]) == list(range(len(got["bulk"])))
