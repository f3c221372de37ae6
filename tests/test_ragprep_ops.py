"""Tests for the RAG/corpus-prep ops (pipelines/ragprep.py): chunking,
segment dedup, text normalization, int8 quantization."""

from __future__ import annotations

import hashlib
import re
import unicodedata

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_doc_chunk_covers_every_token(ray_session):
    from web_crawler_search_engine_ray.pipelines.ragprep import (
        CHUNK_SIZE,
        CHUNK_STRIDE,
        doc_chunk,
    )

    df = doc_chunk(SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    texts = dict(zip(docs.column("doc_id").to_pylist(), docs.column("text").to_pylist()))

    assert (df["n_tokens"] <= CHUNK_SIZE).all() and (df["n_tokens"] >= 1).all()
    for d, g in df.groupby("doc_id"):
        tk = texts[d].split()
        n = len(tk)
        exp_chunks = 1 if n <= CHUNK_SIZE else (n - CHUNK_SIZE + CHUNK_STRIDE - 1) // CHUNK_STRIDE + 1
        assert sorted(g["chunk_id"]) == list(range(exp_chunks))
        g = g.sort_values("chunk_id")
        # each chunk is the exact token slice; the last chunk reaches the end
        for _, row in g.iterrows():
            s = int(row["chunk_id"]) * CHUNK_STRIDE
            assert row["chunk_text"] == " ".join(tk[s : s + CHUNK_SIZE])
        last = g.iloc[-1]
        assert int(last["chunk_id"]) * CHUNK_STRIDE + int(last["n_tokens"]) == n
    # every doc with >= 1 token appears
    assert set(df["doc_id"]) == {d for d, t in texts.items() if t.split()}


def test_segment_dedup_first_wins(ray_session):
    from web_crawler_search_engine_ray.pipelines.ragprep import (
        SEG_SIZE,
        segment_dedup,
    )

    df = segment_dedup(SF).to_pandas().set_index("doc_id").sort_index()
    boiler = sorted(d for d in df.index if d % 7 == 3)
    assert len(boiler) > 2
    # the first boilerplate doc owns the shared header segment; every
    # later one has it deduplicated away (>= 1 dropped segment of
    # exactly SEG_SIZE tokens)
    # (the first doc can still drop a SHORT tail segment — tails of a few
    # tokens from the small synthetic vocabulary collide across docs —
    # but never the full-size boilerplate header itself)
    first, rest = boiler[0], boiler[1:]
    assert df.loc[first, "n_tokens_total"] - df.loc[first, "n_tokens_kept"] < SEG_SIZE
    for d in rest:
        assert df.loc[d, "n_dup_segments"] >= 1
        assert df.loc[d, "n_tokens_total"] - df.loc[d, "n_tokens_kept"] >= SEG_SIZE
    # non-boilerplate docs of random words should keep everything
    clean = df.loc[[d for d in df.index if d % 7 != 3]]
    assert (clean["n_dup_segments"] == 0).mean() > 0.9
    # conservation + segment count arithmetic
    kept_plus = df["n_tokens_kept"] <= df["n_tokens_total"]
    assert kept_plus.all()
    assert (df["n_segments"] >= 1).all()


def test_text_normalize_digest_and_flags(ray_session):
    from web_crawler_search_engine_ray.pipelines.ragprep import (
        _norm_augment,
        text_normalize,
    )

    df = text_normalize(SF).to_pandas().set_index("doc_id")
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    ws = re.compile(r"[ \t\n\f\r]+")  # the RE2 \s class the oracle uses
    for d, t in list(zip(docs.column("doc_id").to_pylist(), docs.column("text").to_pylist()))[:50]:
        aug = _norm_augment(d, t)
        norm = unicodedata.normalize("NFC", ws.sub(" ", aug).strip(" ").lower())
        row = df.loc[d]
        assert row["n_chars_norm"] == len(norm)
        assert row["digest"] == hashlib.md5(norm.encode()).hexdigest()
        assert bool(row["changed"]) == (norm != aug)
    # the injected decomposed suffix makes exactly the %5 docs change
    # (base corpus is already canonical lowercase single-space ascii)
    assert (df["changed"] == (df.index % 5 == 0)).all()


ADVERSARIAL_TEXTS = [
    "",  # empty -> zero chunks/segments
    "   ",  # whitespace-only
    "one",
    "a\vb c",  # \v is NOT whitespace to RE2 -> 'a\vb' is ONE token
    "x\xa0y z",  # NBSP is NOT whitespace to RE2 either
    "tab\tsep\nline\rcr\fff",  # the four real RE2 whitespace chars
    "  lead and trail  ",
    "double  space   runs",
    "café composed and Café decomposed",  # NFC has work
    "MiXeD CaSe Éclair",
    " ".join(f"w{i}" for i in range(100)),  # multi-chunk doc
]


def test_ragprep_adversarial_oracle_parity(ray_session, tmp_path):
    """Engine ≡ DuckDB oracle on adversarial inputs (RE2-vs-Python
    whitespace classes, NBSP/\\v non-whitespace, NFC-relevant unicode,
    empty/whitespace-only docs) — the parity the sf fixture's single-space
    ASCII corpus cannot exercise."""
    import duckdb
    import pandas as pd
    import pyarrow as pa

    import __ray_entry__ as E

    sf = str(tmp_path)
    docs = pa.table(
        {
            "doc_id": pa.array(range(len(ADVERSARIAL_TEXTS)), pa.int64()),
            "text": pa.array(ADVERSARIAL_TEXTS, pa.string()),
            "lang": pa.array(["en"] * len(ADVERSARIAL_TEXTS)),
            "source": pa.array(["t"] * len(ADVERSARIAL_TEXTS)),
            "n_chars": pa.array([len(t) for t in ADVERSARIAL_TEXTS], pa.int64()),
        }
    )
    pq.write_table(docs, f"{sf}/documents.parquet")

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    qs, oracles = E.queries(), E.oracle_sql()

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        df = df[sorted(df.columns)].copy()
        for c in df.columns:
            if df[c].dtype == object:
                df[c] = df[c].astype(str)
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    for name in ("doc_chunk", "segment_dedup", "text_normalize"):
        got = canon(qs[name](sf).to_pandas())
        want = canon(con.sql(oracles[name]).df())
        pd.testing.assert_frame_equal(got, want, check_dtype=False), name


def test_embedding_quantize_invariants(ray_session):
    from web_crawler_search_engine_ray.pipelines.ragprep import embedding_quantize

    df = embedding_quantize(SF).to_pandas().set_index("vec_id").sort_index()
    emb = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    vecs = dict(zip(emb.column("vec_id").to_pylist(), emb.column("embedding").to_pylist()))
    dims = {len(v) for v in vecs.values()}
    assert set(df["n_dims"]) == dims
    for d, row in df.head(50).iterrows():
        v = np.asarray(vecs[d], dtype=np.float64)
        maxabs = np.abs(v).max() if len(v) else 0.0
        assert row["scale"] == maxabs / 127.0
        if maxabs > 0:
            codes = np.floor(v / row["scale"] + 0.5)
            assert np.abs(codes).max() <= 127
            assert row["sum_codes"] == codes.sum()
            assert row["sum_abs_codes"] == np.abs(codes).sum()
            assert row["n_saturated"] == int((np.abs(codes) == 127).sum())
            # the max-|v| component always saturates
            assert row["n_saturated"] >= 1
