"""Index + search conformance: Ray pipelines ≡ oracle (SURVEY.md §5)."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from web_crawler_search_engine_ray.oracle import (
    oracle_crawl,
    oracle_index,
    oracle_search,
)
from web_crawler_search_engine_ray.pipelines.crawl import run_crawl
from web_crawler_search_engine_ray.pipelines.index_pipeline import build_index
from web_crawler_search_engine_ray.pipelines.search import SearchService
from web_crawler_search_engine_ray.sources.synthetic_web import (
    CrawlConfig,
    write_web,
)


@pytest.fixture(scope="module")
def indexed(ray_session, micro_web, tmp_path_factory):
    cfg = CrawlConfig()
    seeds = micro_web["seeds"].column("url").to_pylist()

    oracle_c = oracle_crawl(micro_web["docs"], micro_web["robots"], seeds, cfg)
    oracle_i = oracle_index(oracle_c)

    data_dir = str(tmp_path_factory.mktemp("web"))
    write_web(micro_web, data_dir)
    workdir = str(tmp_path_factory.mktemp("crawl"))
    robots_bodies = {r["host"]: r["body"] for r in micro_web["robots"].to_pylist()}
    crawl_out = run_crawl(
        docs_path=os.path.join(data_dir, "docs.parquet"),
        robots_bodies=robots_bodies,
        seed_urls=seeds,
        config=cfg,
        workdir=workdir,
    )
    index_dir = str(tmp_path_factory.mktemp("index"))
    paths = build_index(os.path.join(workdir, "pages"), index_dir)
    return oracle_i, paths


def test_catalog_equality(indexed):
    oracle_i, paths = indexed
    got = sorted(
        (r["doc_id"], r["url"], r["title"])
        for r in pq.read_table(os.path.join(paths.catalog)).to_pylist()
    )
    want = sorted(oracle_i.catalog)
    assert got == want
    assert paths.n_indexed == oracle_i.n_indexed


def test_duplicates_equality(indexed):
    oracle_i, paths = indexed
    got = sorted(
        (r["seq"], r["dup_of"])
        for r in pq.read_table(paths.duplicates).to_pylist()
    )
    want = sorted((dup_id, kept_id) for dup_id, _, kept_id, _ in oracle_i.duplicates)
    assert got == want


def test_postings_equality(indexed):
    oracle_i, paths = indexed
    got: dict = {}
    for r in pq.read_table(paths.postings).to_pylist():
        got.setdefault(r["token"], []).append((r["doc_id"], r["tf_idf"]))
    want = oracle_i.postings
    assert set(got) == set(want)
    for token in want:
        assert got[token] == want[token], token


def test_search_equality(indexed):
    oracle_i, paths = indexed
    svc = SearchService(paths.postings, paths.catalog)
    queries = [
        "data stream",                  # common bigram
        "crawl index search",           # trigram query -> bigrams
        "politeness",                   # unigram
        "xyzzy nothing matches here",   # forces stemmed fallback / empty
        "merging sorted runs",          # stemming-sensitive
    ]
    for q in queries:
        got = svc.search(q)
        want = oracle_search(oracle_i, q)
        assert [(d, round(s, 6)) for d, s, _, _ in got] == [
            (d, round(s, 6)) for d, s, _, _ in want
        ], q
        assert [(u, t) for _, _, u, t in got] == [(u, t) for _, _, u, t in want], q
