"""End-to-end crawl conformance: Ray pipeline ≡ oracle (SURVEY.md §5 step 4,
north_rule: crawl ordering + URL-seen set equality under the same seed list
and politeness budget; per-row span-sequence equality)."""

from __future__ import annotations

import os

import pyarrow as pa
import pytest

from web_crawler_search_engine_ray.oracle import oracle_crawl
from web_crawler_search_engine_ray.pipelines.crawl import run_crawl
from web_crawler_search_engine_ray.sources.synthetic_web import (
    CrawlConfig,
    write_web,
)


@pytest.fixture(scope="module")
def crawl_pair(ray_session, micro_web, tmp_path_factory):
    """Run oracle and engine over the same micro web; return both results."""
    cfg = CrawlConfig()
    seeds = micro_web["seeds"].column("url").to_pylist()

    oracle = oracle_crawl(micro_web["docs"], micro_web["robots"], seeds, cfg)

    data_dir = str(tmp_path_factory.mktemp("web"))
    write_web(micro_web, data_dir)
    workdir = str(tmp_path_factory.mktemp("crawl"))
    robots_bodies = {
        r["host"]: r["body"] for r in micro_web["robots"].to_pylist()
    }
    outputs = run_crawl(
        docs_path=os.path.join(data_dir, "docs.parquet"),
        robots_bodies=robots_bodies,
        seed_urls=seeds,
        config=cfg,
        workdir=workdir,
    )
    return oracle, outputs


def test_lineage_order_equality(crawl_pair):
    """Crawl (dispatch) ordering equality — the riskiest conformance
    surface (SURVEY.md §7.6 hazard 1)."""
    oracle, outputs = crawl_pair
    eng = outputs.lineage().to_pandas()
    got = list(
        zip(eng["seq"], eng["wave"], eng["url"], eng["host"], eng["virtual_ts"], eng["status"])
    )
    want = oracle.lineage
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[0] == w[0] and g[2] == w[2], (g, w)          # seq, url
        assert g[1] == w[1] and g[3] == w[3], (g, w)          # wave, host
        assert abs(g[4] - w[4]) < 1e-9, (g, w)                # virtual_ts
        assert g[5] == w[5], (g, w)                           # status


def test_seen_set_equality(crawl_pair):
    oracle, outputs = crawl_pair
    eng = {
        r["url"]: (r["downloaded"], r["length"])
        for r in outputs.seen().to_pylist()
    }
    want = dict(oracle.seen)
    assert eng == want


def test_frequencies_equality(crawl_pair):
    oracle, outputs = crawl_pair
    eng = {
        r["token"]: r["count"] for r in outputs.frequencies().to_pandas().to_dict("records")
    }
    assert eng == oracle.frequencies


def test_page_lengths_equality(crawl_pair):
    oracle, outputs = crawl_pair
    eng = {
        r["url"]: r["length"]
        for r in outputs.page_lengths().to_pandas().to_dict("records")
    }
    assert eng == oracle.page_lengths


def test_span_sequence_equality(crawl_pair, micro_web):
    """Per-row invariant: fetched pages carry the exact span sequence
    (kind, text, media_ref, order) of the docs table (input_hint)."""
    oracle, outputs = crawl_pair
    docs = {r["doc_id"]: r["spans"] for r in micro_web["docs"].to_pylist()}
    pages = outputs.pages().take_all()  # micro web: small
    checked = 0
    for row in pages:
        want = docs.get(row["url"])
        if want is None:
            assert row["status"] == 404
            continue
        got = row["spans"] or []
        assert len(got) == len(want)
        for g, w in zip(
            sorted(got, key=lambda s: s["offset"]),
            sorted(want, key=lambda s: s["offset"]),
        ):
            assert (g["kind"], g["text"], g["media_ref"], g["offset"]) == (
                w["kind"], w["text"], w["media_ref"], w["offset"]
            )
        checked += 1
    assert checked > 0


def test_hot_host_skew_conformance(ray_session, tmp_path_factory):
    """Hot-host skew (60% of pages on one host) still matches the oracle:
    lineage order + seen set equality with the salted fetch path."""
    from web_crawler_search_engine_ray.sources.synthetic_web import generate_web

    web = generate_web(seed=77, num_hosts=4, num_docs=60, hot_host_frac=0.6)
    cfg = CrawlConfig(wave_span=16.0)
    seeds = web["seeds"].column("url").to_pylist()
    oracle = oracle_crawl(web["docs"], web["robots"], seeds, cfg)

    data_dir = str(tmp_path_factory.mktemp("hotweb"))
    write_web(web, data_dir)
    outputs = run_crawl(
        docs_path=os.path.join(data_dir, "docs.parquet"),
        robots_bodies={r["host"]: r["body"] for r in web["robots"].to_pylist()},
        seed_urls=seeds,
        config=cfg,
        workdir=str(tmp_path_factory.mktemp("hotcrawl")),
    )
    eng = outputs.lineage().to_pandas()
    got = list(zip(eng["seq"], eng["url"], eng["host"]))
    want = [(w[0], w[2], w[3]) for w in oracle.lineage]
    assert got == want
    eng_seen = {
        r["url"]: (r["downloaded"], r["length"]) for r in outputs.seen().to_pylist()
    }
    assert eng_seen == dict(oracle.seen)

    # shard-spreading under skew: the seen ledger shards by URL hash, not
    # host (state/seen.py docstring), so the hot host's URLs must spread
    # across shards instead of concentrating the ledger (and its checkpoint
    # files) on one actor. With ~60 keys over 8 shards a 3x-mean cap is a
    # loose but regression-catching bound.
    import glob

    import pyarrow.parquet as pq

    shard_files = sorted(
        glob.glob(os.path.join(outputs.workdir, "seen_final", "shard=*.parquet"))
    )
    counts = [pq.read_metadata(p).num_rows for p in shard_files]
    assert len(shard_files) == 8 and sum(counts) == len(eng_seen)
    assert max(counts) <= 3 * (sum(counts) / len(counts)), counts


@pytest.mark.parametrize(
    "seed,hosts,docs,span",
    [
        (5, 3, 40, 2.0),    # very narrow waves: politeness carryover every wave
        (123, 8, 90, 8.0),  # wider web incl. crawl-delay host (host 2)
        (9, 2, 30, 64.0),   # wide waves: near-pure per-host FIFO
    ],
)
def test_crawl_conformance_configs(ray_session, tmp_path_factory, seed, hosts, docs, span):
    """Lineage-order + seen-set equality vs the oracle across politeness
    regimes and web shapes (SURVEY.md §7.4 determinism model)."""
    from web_crawler_search_engine_ray.sources.synthetic_web import generate_web

    web = generate_web(seed=seed, num_hosts=hosts, num_docs=docs)
    cfg = CrawlConfig(wave_span=span)
    seeds = web["seeds"].column("url").to_pylist()
    oracle = oracle_crawl(web["docs"], web["robots"], seeds, cfg)

    data_dir = str(tmp_path_factory.mktemp(f"web{seed}"))
    write_web(web, data_dir)
    outputs = run_crawl(
        docs_path=os.path.join(data_dir, "docs.parquet"),
        robots_bodies={r["host"]: r["body"] for r in web["robots"].to_pylist()},
        seed_urls=seeds,
        config=cfg,
        workdir=str(tmp_path_factory.mktemp(f"crawl{seed}")),
    )
    eng = outputs.lineage().to_pandas()
    got = list(zip(eng["seq"], eng["url"], eng["virtual_ts"]))
    want = [(w[0], w[2], w[4]) for w in oracle.lineage]
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[0] == w[0] and g[1] == w[1], (g, w)
        assert abs(g[2] - w[2]) < 1e-9, (g, w)
    eng_seen = {
        r["url"]: (r["downloaded"], r["length"]) for r in outputs.seen().to_pylist()
    }
    assert eng_seen == dict(oracle.seen)


def test_distributed_path_equals_fast_path(ray_session, tmp_path_factory, monkeypatch):
    """The adaptive small-wave fast path (one-task schedule / link chain)
    and the distributed path (groupby+sort AllToAlls) must produce
    IDENTICAL lineage + seen state: run the same web with the fast path
    disabled and compare against the oracle (which the fast-path configs
    above already match)."""
    import web_crawler_search_engine_ray.pipelines.crawl as CR
    from web_crawler_search_engine_ray.sources.synthetic_web import generate_web

    monkeypatch.setattr(CR, "SMALL_WAVE_ROWS", 0)  # force distributed path

    web = generate_web(seed=123, num_hosts=8, num_docs=90)
    cfg = CrawlConfig(wave_span=8.0)
    seeds = web["seeds"].column("url").to_pylist()
    oracle = oracle_crawl(web["docs"], web["robots"], seeds, cfg)

    data_dir = str(tmp_path_factory.mktemp("webdist"))
    write_web(web, data_dir)
    outputs = run_crawl(
        docs_path=os.path.join(data_dir, "docs.parquet"),
        robots_bodies={r["host"]: r["body"] for r in web["robots"].to_pylist()},
        seed_urls=seeds,
        config=cfg,
        workdir=str(tmp_path_factory.mktemp("crawldist")),
    )
    eng = outputs.lineage().to_pandas()
    got = list(zip(eng["seq"], eng["url"], eng["virtual_ts"]))
    want = [(w[0], w[2], w[4]) for w in oracle.lineage]
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[0] == w[0] and g[1] == w[1], (g, w)
        assert abs(g[2] - w[2]) < 1e-9, (g, w)
    eng_seen = {
        r["url"]: (r["downloaded"], r["length"]) for r in outputs.seen().to_pylist()
    }
    assert eng_seen == dict(oracle.seen)


def test_backlog_bypass_hot_host_distributed(ray_session, tmp_path_factory, monkeypatch):
    """Distributed path with the hot-host backlog bypass ACTIVE: narrow
    waves (slots_cap = wave_span/politeness = 4) over a skewed web make
    every host's backlog exceed the cap, so most carry rows skip the
    schedule shuffle — output must still match the oracle exactly."""
    import web_crawler_search_engine_ray.pipelines.crawl as CR
    from web_crawler_search_engine_ray.sources.synthetic_web import generate_web

    monkeypatch.setattr(CR, "SMALL_WAVE_ROWS", 0)

    web = generate_web(seed=31, num_hosts=4, num_docs=80, hot_host_frac=0.55)
    cfg = CrawlConfig(wave_span=2.0)
    seeds = web["seeds"].column("url").to_pylist()
    oracle = oracle_crawl(web["docs"], web["robots"], seeds, cfg)

    data_dir = str(tmp_path_factory.mktemp("webbyp"))
    write_web(web, data_dir)
    outputs = run_crawl(
        docs_path=os.path.join(data_dir, "docs.parquet"),
        robots_bodies={r["host"]: r["body"] for r in web["robots"].to_pylist()},
        seed_urls=seeds,
        config=cfg,
        workdir=str(tmp_path_factory.mktemp("crawlbyp")),
    )
    eng = outputs.lineage().to_pandas()
    got = list(zip(eng["seq"], eng["url"], eng["virtual_ts"]))
    want = [(w[0], w[2], w[4]) for w in oracle.lineage]
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[0] == w[0] and g[1] == w[1], (g, w)
        assert abs(g[2] - w[2]) < 1e-9, (g, w)
    eng_seen = {
        r["url"]: (r["downloaded"], r["length"]) for r in outputs.seen().to_pylist()
    }
    assert eng_seen == dict(oracle.seen)


def test_carried_seed_relinked_in_wave0_fetched_once(ray_session, tmp_path):
    """End-to-end INVARIANT for the seed/wave-0 collision scenario: a host
    with more seeds than wave-0 politeness slots carries a seed over, and
    a wave-0 page links back to that carried seed. Each page must be
    fetched exactly once with duplicate-free lineage. (The root cause —
    the retry-idempotency rule re-admitting wave-0-registered seeds — is
    pinned SENSITIVELY by the unit test in test_cuckoo.py; end-to-end the
    downstream scheduling also self-heals the duplicate, so this test
    guards the user-visible contract rather than the specific code path.)"""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_crawler_search_engine_ray.pipelines.crawl import run_crawl
    from web_crawler_search_engine_ray.schema import DOCS_SCHEMA
    from web_crawler_search_engine_ray.sources.synthetic_web import CrawlConfig

    host = "h0.regress.org"
    urls = [f"https://{host}/p{i}" for i in range(3)]

    def doc(u, link_to=None):
        spans = [
            {"kind": "title", "text": "t", "media_ref": "", "offset": 0},
            {"kind": "text", "text": "alpha beta gamma delta", "media_ref": "", "offset": 1},
        ]
        if link_to:
            spans.append(
                {"kind": "link", "text": "a", "media_ref": link_to, "offset": 2}
            )
        return {
            "doc_id": u,
            "spans": spans,
            "status": 200,
            "content_bytes": 100,
            "is_html": True,
        }

    docs = pa.Table.from_pylist(
        # p0 links BACK to seed p2 (which carries over from wave 0)
        [doc(urls[0], link_to=urls[2]), doc(urls[1]), doc(urls[2])],
        schema=DOCS_SCHEMA,
    )
    docs_path = str(tmp_path / "docs.parquet")
    pq.write_table(docs, docs_path)

    # wave_span 2.0 / politeness 1.0 -> ~2 slots per wave; the host's
    # first wave burns slot 0 on the robots fetch, so wave 0 fetches ONE
    # page and seeds p1/p2 carry over
    out = run_crawl(
        docs_path=docs_path,
        robots_bodies={},
        seed_urls=list(urls),
        config=CrawlConfig(
            root_domains=("regress.org",), politeness=1.0, wave_span=2.0,
            num_seen_shards=2,
        ),
        workdir=str(tmp_path / "crawl"),
    )
    lin = out.lineage().to_pandas()
    assert out.waves >= 2  # the carryover actually happened
    assert len(lin) == 3  # each page fetched exactly once
    assert lin["url"].is_unique
    assert sorted(lin["url"]) == sorted(urls)
