"""Conformance-web triple check: engine crawl ≡ pure-python oracle ≡
independent unrolled-SQL replay (conformance_sql) — three disjoint
implementations of the same wave semantics (SURVEY.md §5; north_rule crawl
ordering + seen-set equality)."""

from __future__ import annotations

import os

import duckdb
import pyarrow as pa
import pytest

from web_crawler_search_engine_ray.conformance_sql import CRAWL_LINEAGE_SQL
from web_crawler_search_engine_ray.oracle import oracle_crawl
from web_crawler_search_engine_ray.pipelines.crawl import run_crawl
from web_crawler_search_engine_ray.schema import ROBOTS_SCHEMA
from web_crawler_search_engine_ray.sources.conformance_web import (
    ROBOTS_BODIES,
    build_conformance_web,
    conf_config,
    conf_seeds,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def conf_crawl(ray_session, tmp_path_factory):
    wd = tmp_path_factory.mktemp("confweb")
    docs_path = build_conformance_web(SF, str(wd / "web"))
    out = run_crawl(
        docs_path=docs_path,
        robots_bodies=dict(ROBOTS_BODIES),
        seed_urls=conf_seeds(),
        config=conf_config(),
        workdir=str(wd / "crawl"),
    )
    return docs_path, out


def test_conf_crawl_matches_python_oracle(conf_crawl):
    import pyarrow.parquet as pq

    docs_path, out = conf_crawl
    docs = pq.read_table(docs_path)
    robots = pa.Table.from_arrays(
        [
            pa.array(list(ROBOTS_BODIES.keys()), pa.string()),
            pa.array(list(ROBOTS_BODIES.values()), pa.string()),
            pa.array([None] * len(ROBOTS_BODIES), pa.float64()),
        ],
        schema=ROBOTS_SCHEMA,
    )
    oracle = oracle_crawl(docs, robots, conf_seeds(), conf_config())
    eng = out.lineage().to_pandas()
    got = list(zip(eng["seq"], eng["wave"], eng["url"], eng["host"]))
    want = [(l[0], l[1], l[2], l[3]) for l in oracle.lineage]
    assert got == want
    eng_seen = {
        r["url"]: (r["downloaded"], r["length"]) for r in out.seen().to_pylist()
    }
    assert eng_seen == dict(oracle.seen)


def test_conf_crawl_matches_sql_replay(conf_crawl):
    _, out = conf_crawl
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{os.path.join(SF, 'documents.parquet')}')"
    )
    sql = con.execute(CRAWL_LINEAGE_SQL).df().sort_values("seq")
    eng = out.lineage().to_pandas().sort_values("seq")
    assert len(sql) == len(eng) > 0
    assert list(sql["url"]) == list(eng["url"])
    assert list(sql["wave"]) == list(eng["wave"])
    assert (abs(sql["virtual_ts"].to_numpy() - eng["virtual_ts"].to_numpy()) < 1e-12).all()


def test_conf_crawl_politeness_floor(conf_crawl):
    """The politeness INVARIANT itself (not just oracle parity): every
    host's consecutive fetches are spaced >= max(robots crawl_delay,
    POLITENESS) in virtual time — the reference's frontier.py:121-133
    guarantee. h1 declares Crawl-delay: 1 (ROBOTS_BODIES), so its floor
    is 1.0 s, not the global 0.5 s."""
    import re

    import numpy as np

    _, out = conf_crawl
    lin = out.lineage().to_pandas()
    cfg = conf_config()
    delays = {
        h: float(m.group(1))
        for h, body in ROBOTS_BODIES.items()
        if (m := re.search(r"Crawl-delay:\s*([0-9.]+)", body))
    }
    checked_delayed = 0
    for host, grp in lin.groupby("host"):
        ts = np.sort(grp["virtual_ts"].to_numpy())
        if len(ts) < 2:
            continue
        floor = max(cfg.politeness, delays.get(host, 0.0))
        min_gap = float(np.min(np.diff(ts)))
        assert min_gap >= floor - 1e-9, (host, min_gap, floor)
        if delays.get(host, 0.0) > cfg.politeness:
            checked_delayed += 1
    # the crawl-delay half of the invariant must actually be exercised
    assert checked_delayed >= 1
