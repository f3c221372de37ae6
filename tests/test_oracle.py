"""Fixture-generator and oracle sanity tests (SURVEY.md §5 step 1)."""

from __future__ import annotations

import pyarrow as pa

from web_crawler_search_engine_ray.oracle import (
    oracle_crawl,
    oracle_index,
    oracle_search,
)
from web_crawler_search_engine_ray.schema import DOCS_SCHEMA
from web_crawler_search_engine_ray.sources.synthetic_web import (
    CrawlConfig,
    generate_web,
)


def test_generator_deterministic():
    a = generate_web(seed=42, num_hosts=5, num_docs=50)
    b = generate_web(seed=42, num_hosts=5, num_docs=50)
    assert a["docs"].equals(b["docs"])
    assert a["robots"].equals(b["robots"])
    assert a["seeds"].equals(b["seeds"])
    c = generate_web(seed=43, num_hosts=5, num_docs=50)
    assert not a["docs"].equals(c["docs"])


def test_generator_schema_and_roles(micro_web):
    docs = micro_web["docs"]
    assert docs.schema.equals(DOCS_SCHEMA)
    rows = docs.to_pylist()
    kinds = {s["kind"] for r in rows for s in r["spans"]}
    assert {"title", "text", "link"} <= kinds
    # media spans present (interleaved requirement)
    assert any(
        s["kind"] == "image" and s["media_ref"].startswith("media://")
        for r in rows
        for s in r["spans"]
    )
    # offsets dense in order
    for r in rows:
        offs = [s["offset"] for s in r["spans"]]
        assert offs == list(range(len(offs)))


def test_oracle_crawl_basics(micro_web):
    cfg = CrawlConfig()
    res = oracle_crawl(
        micro_web["docs"],
        micro_web["robots"],
        micro_web["seeds"].column("url").to_pylist(),
        cfg,
    )
    # crawl reached a meaningful fraction of the web
    assert len(res.lineage) >= 30
    # lineage seq is dense and ordered
    seqs = [l[0] for l in res.lineage]
    assert seqs == list(range(len(seqs)))
    # virtual timestamps never violate per-host politeness
    by_host = {}
    for seq, wave, url, host, vts, status in res.lineage:
        by_host.setdefault(host, []).append(vts)
    for host, times in by_host.items():
        diffs = [b - a for a, b in zip(times, times[1:])]
        assert all(d >= cfg.politeness - 1e-9 for d in diffs), (host, times)
    # every dispatched URL is marked downloaded in the ledger
    for seq, wave, url, host, vts, status in res.lineage:
        assert res.seen[url][0] is True
    # frequencies/page_lengths populated
    assert sum(res.frequencies.values()) == sum(res.page_lengths.values())
    assert len(res.page_lengths) > 0


def test_oracle_crawl_robots_disallowed(micro_web):
    cfg = CrawlConfig()
    res = oracle_crawl(
        micro_web["docs"],
        micro_web["robots"],
        micro_web["seeds"].column("url").to_pylist(),
        cfg,
    )
    # the robots fixture disallows /s1/p1 on host w1 (synthetic_web.py)
    blocked = "https://w1.example.org/s1/p1"
    if blocked in res.seen:
        assert all(l[2] != blocked for l in res.lineage)
        assert res.seen[blocked] == (True, 0)


def test_oracle_crawl_politeness_slow_host(micro_web):
    cfg = CrawlConfig()
    res = oracle_crawl(
        micro_web["docs"],
        micro_web["robots"],
        micro_web["seeds"].column("url").to_pylist(),
        cfg,
    )
    # host w2 has Crawl-delay: 2 > politeness 0.5
    times = [l[4] for l in res.lineage if l[3] == "w2.example.org"]
    diffs = [b - a for a, b in zip(times, times[1:])]
    assert all(d >= 2.0 - 1e-9 for d in diffs)


def test_oracle_index_and_search(micro_web):
    cfg = CrawlConfig()
    crawl = oracle_crawl(
        micro_web["docs"],
        micro_web["robots"],
        micro_web["seeds"].column("url").to_pylist(),
        cfg,
    )
    idx = oracle_index(crawl)
    assert idx.n_indexed > 0
    assert len(idx.catalog) == idx.n_indexed
    # doc ids in catalog are lineage seqs
    lineage_seqs = {l[0] for l in crawl.lineage}
    assert all(doc_id in lineage_seqs for doc_id, _, _ in idx.catalog)
    # n-gram pruning: every multi-word token has df >= 10
    for token, plist in idx.postings.items():
        if " " in token:
            assert len(plist) >= 10, token
    # single-token postings exist and scores are 3-decimal rounded
    uni = [t for t in idx.postings if " " not in t]
    assert uni
    for t in uni[:20]:
        for doc_id, score in idx.postings[t]:
            assert abs(score - round(score, 3)) < 1e-12

    # search returns ranked results for a common vocabulary word
    results = oracle_search(idx, "data stream")
    assert len(results) <= 5
    if results:
        scores = [r[1] for r in results]
        assert scores == sorted(scores, reverse=True)


def test_oracle_dedup_pairs(micro_web):
    cfg = CrawlConfig()
    crawl = oracle_crawl(
        micro_web["docs"],
        micro_web["robots"],
        micro_web["seeds"].column("url").to_pylist(),
        cfg,
    )
    idx = oracle_index(crawl)
    # duplicates (if any were both crawled) keep the lower doc id
    for dup_id, dup_url, kept_id, kept_url in idx.duplicates:
        assert kept_id < dup_id
