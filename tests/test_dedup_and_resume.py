"""Direct exact-dedup conformance (D2) and crawl kill/resume replay
(north_rule resumability)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from web_crawler_search_engine_ray.oracle import oracle_crawl
from web_crawler_search_engine_ray.pipelines.crawl import run_crawl
from web_crawler_search_engine_ray.pipelines.index_pipeline import build_index
from web_crawler_search_engine_ray.sources.synthetic_web import (
    CrawlConfig,
    write_web,
)


def _page(seq, url, spans, status=200, content_bytes=1000, is_html=True):
    return {
        "seq": seq,
        "url": url,
        "host": "h.example.org",
        "virtual_ts": float(seq),
        "status": status,
        "content_bytes": content_bytes,
        "is_html": is_html,
        "spans": spans,
        "discovery_seq": seq,
        "depth": 0,
        "wave": 0,
    }


def _spans(*texts):
    return [
        {"kind": "text", "text": t, "media_ref": "", "offset": i}
        for i, t in enumerate(texts)
    ]


def test_exact_dedup_first_wins(ray_session, tmp_path):
    """groupby(page_hash) keep-min-doc-id ≡ reference first-seen-wins under
    single-process enumeration (indexer/worker.py:118-122)."""
    pages = [
        _page(0, "https://h.example.org/a", _spans("alpha beta gamma", "delta")),
        _page(1, "https://h.example.org/b", _spans("unique content one here")),
        # exact duplicate of doc 0 (same dedup-profile text)
        _page(2, "https://h.example.org/c", _spans("alpha beta gamma", "delta")),
        # another duplicate of doc 0
        _page(3, "https://h.example.org/d", _spans("alpha beta gamma", "delta")),
        # duplicate of doc 1
        _page(4, "https://h.example.org/e", _spans("unique content one here")),
        # non-html page: excluded before dedup (indexer/worker.py:10-12)
        _page(5, "https://h.example.org/f", _spans("alpha beta gamma", "delta"), is_html=False),
    ]
    pages_dir = str(tmp_path / "pages")
    os.makedirs(pages_dir)
    from web_crawler_search_engine_ray.schema import DOCS_SCHEMA

    spans_arr = pa.array(
        [p["spans"] for p in pages], DOCS_SCHEMA.field("spans").type
    )
    tbl = pa.Table.from_pylist([{k: v for k, v in p.items() if k != "spans"} for p in pages])
    tbl = tbl.append_column("spans", spans_arr)
    pq.write_table(tbl, os.path.join(pages_dir, "part-0.parquet"))

    paths = build_index(pages_dir, str(tmp_path / "index"), min_ngram_df=2)
    dups = sorted(
        (r["seq"], r["dup_of"]) for r in pq.read_table(paths.duplicates).to_pylist()
    )
    assert dups == [(2, 0), (3, 0), (4, 1)]
    assert paths.n_indexed == 2
    cat = sorted(r["doc_id"] for r in pq.read_table(paths.catalog).to_pylist())
    assert cat == [0, 1]


@pytest.mark.slow
def test_crawl_kill_resume_exact_replay(ray_session, micro_web, tmp_path):
    """Kill after 2 waves (max_waves), resume from checkpoint, final state
    byte-equal to the oracle (and hence to an uninterrupted run)."""
    cfg = CrawlConfig()
    seeds = micro_web["seeds"].column("url").to_pylist()
    data_dir = str(tmp_path / "web")
    write_web(micro_web, data_dir)
    robots_bodies = {r["host"]: r["body"] for r in micro_web["robots"].to_pylist()}
    workdir = str(tmp_path / "crawl")

    # phase 1: killed after two waves
    run_crawl(
        docs_path=os.path.join(data_dir, "docs.parquet"),
        robots_bodies=robots_bodies,
        seed_urls=seeds,
        config=cfg,
        workdir=workdir,
        max_waves=2,
    )
    # phase 2: resume to completion
    outputs = run_crawl(
        docs_path=os.path.join(data_dir, "docs.parquet"),
        robots_bodies=robots_bodies,
        seed_urls=seeds,
        config=cfg,
        workdir=workdir,
        resume=True,
    )

    oracle = oracle_crawl(micro_web["docs"], micro_web["robots"], seeds, cfg)
    eng = outputs.lineage().to_pandas()
    got = list(zip(eng["seq"], eng["wave"], eng["url"], eng["host"]))
    want = [(l[0], l[1], l[2], l[3]) for l in oracle.lineage]
    assert got == want
    eng_seen = {
        r["url"]: (r["downloaded"], r["length"]) for r in outputs.seen().to_pylist()
    }
    assert eng_seen == dict(oracle.seen)


@pytest.mark.slow
def test_resume_through_compaction(ray_session, micro_web, tmp_path):
    """With a 2-wave compaction cadence: full seen snapshots replace the
    delta chain, earlier wave dirs are garbage-collected (bounded
    checkpoint storage / replay length), and kill/resume across a
    compaction boundary still replays byte-equal to the oracle."""
    cfg = CrawlConfig()
    seeds = micro_web["seeds"].column("url").to_pylist()
    data_dir = str(tmp_path / "web")
    write_web(micro_web, data_dir)
    robots_bodies = {r["host"]: r["body"] for r in micro_web["robots"].to_pylist()}
    workdir = str(tmp_path / "crawl")
    kw = dict(
        docs_path=os.path.join(data_dir, "docs.parquet"),
        robots_bodies=robots_bodies,
        seed_urls=seeds,
        config=cfg,
        workdir=workdir,
        compact_every=2,
    )

    # killed right after the wave-2 full snapshot
    run_crawl(max_waves=3, **kw)
    ckpts = sorted(
        d for d in os.listdir(os.path.join(workdir, "checkpoints"))
        if d.startswith("wave=") and not d.endswith(".tmp")
    )
    # waves 0,1 GC'd by the wave-2 compaction
    assert ckpts[0] == "wave=00002"

    outputs = run_crawl(resume=True, **kw)
    # storage stays bounded: never more than compact_every+1 wave dirs
    ckpts = [
        d for d in os.listdir(os.path.join(workdir, "checkpoints"))
        if d.startswith("wave=") and not d.endswith(".tmp")
    ]
    assert len(ckpts) <= 3

    oracle = oracle_crawl(micro_web["docs"], micro_web["robots"], seeds, cfg)
    eng = outputs.lineage().to_pandas()
    got = list(zip(eng["seq"], eng["wave"], eng["url"], eng["host"]))
    want = [(l[0], l[1], l[2], l[3]) for l in oracle.lineage]
    assert got == want
    eng_seen = {
        r["url"]: (r["downloaded"], r["length"]) for r in outputs.seen().to_pylist()
    }
    assert eng_seen == dict(oracle.seen)


def test_resume_refuses_foreign_hash_impl(ray_session, micro_web, tmp_path):
    """A checkpoint whose meta carries a different url_hash_impl (e.g. the
    round-3 polars-seeded era, or a future hash change) must REFUSE to
    resume: its seen-shard routing and cuckoo fingerprints were computed
    under the other hash and would silently mis-route every lookup."""
    import json

    from web_crawler_search_engine_ray.state.checkpoint import (
        HashImplMismatch,
        latest_checkpoint,
    )

    cfg = CrawlConfig()
    seeds = micro_web["seeds"].column("url").to_pylist()
    data_dir = str(tmp_path / "web")
    write_web(micro_web, data_dir)
    robots_bodies = {r["host"]: r["body"] for r in micro_web["robots"].to_pylist()}
    workdir = str(tmp_path / "crawl")
    kw = dict(
        docs_path=os.path.join(data_dir, "docs.parquet"),
        robots_bodies=robots_bodies,
        seed_urls=seeds,
        config=cfg,
        workdir=workdir,
    )
    run_crawl(max_waves=2, **kw)

    wave = latest_checkpoint(workdir)
    meta_path = os.path.join(
        workdir, "checkpoints", f"wave={wave:05d}", "meta.json"
    )
    with open(meta_path) as f:
        meta = json.load(f)
    # the stamp is present on every finalized checkpoint
    assert meta["url_hash_impl"] == "fnv1a64/1"

    # forge the polars-seeded-era stamp -> resume must refuse
    meta["url_hash_impl"] = "polars-xxhash-seed0"
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    with pytest.raises(HashImplMismatch):
        run_crawl(resume=True, **kw)

    # a pre-stamp meta (round <=3 checkpoint, no key at all) also refuses
    del meta["url_hash_impl"]
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    with pytest.raises(HashImplMismatch):
        run_crawl(resume=True, **kw)

    # restore the true stamp -> resume completes and replays the oracle
    meta["url_hash_impl"] = "fnv1a64/1"
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    outputs = run_crawl(resume=True, **kw)
    oracle = oracle_crawl(micro_web["docs"], micro_web["robots"], seeds, cfg)
    eng = outputs.lineage().to_pandas()
    got = list(zip(eng["seq"], eng["wave"], eng["url"], eng["host"]))
    assert got == [(l[0], l[1], l[2], l[3]) for l in oracle.lineage]
