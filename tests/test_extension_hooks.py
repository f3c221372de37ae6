"""User-extension surface (SURVEY §2.11): pluggable link-extractor UDF and
priority function on run_crawl, mirroring the reference's scraper hook +
frontier/worker factories (web_crawler/README.md:58-204)."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pytest

from web_crawler_search_engine_ray.pipelines.crawl import run_crawl
from web_crawler_search_engine_ray.sources.conformance_web import (
    ROBOTS_BODIES,
    build_conformance_web,
    conf_config,
    conf_seeds,
)
from web_crawler_search_engine_ray.stages.extract import extract_links_batch

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def conf_docs(tmp_path_factory):
    wd = tmp_path_factory.mktemp("hooks_web")
    return build_conformance_web(SF, str(wd))


def test_link_extractor_hook_drops_all_links(ray_session, conf_docs, tmp_path):
    """A scraper hook that returns no links ends the crawl at the seeds —
    the reference's empty-scraper semantics."""

    def no_links(batch: pa.Table, root_domains) -> pa.Table:
        full = extract_links_batch(batch, root_domains)
        return full.slice(0, 0)

    out = run_crawl(
        docs_path=conf_docs,
        robots_bodies=dict(ROBOTS_BODIES),
        seed_urls=conf_seeds(),
        config=conf_config(),
        workdir=str(tmp_path / "crawl"),
        link_extractor=no_links,
    )
    assert out.pages_fetched == 1  # the seed only
    assert out.urls_discovered == 1


def test_priority_hook_reorders_within_budget(ray_session, conf_docs, tmp_path):
    """Priority = -discovery_seq (LIFO): within each host's wave budget the
    newest pending URL dispatches first, changing dispatch order while the
    fetched URL SET stays identical to FIFO (budget-complete crawl)."""

    def lifo(batch: pa.Table) -> pa.Table:
        d = batch.column("discovery_seq").to_numpy(zero_copy_only=False)
        return batch.append_column("priority", pa.array(-d, pa.int64()))

    fifo = run_crawl(
        docs_path=conf_docs,
        robots_bodies=dict(ROBOTS_BODIES),
        seed_urls=conf_seeds(),
        config=conf_config(),
        workdir=str(tmp_path / "fifo"),
    )
    out = run_crawl(
        docs_path=conf_docs,
        robots_bodies=dict(ROBOTS_BODIES),
        seed_urls=conf_seeds(),
        config=conf_config(),
        workdir=str(tmp_path / "lifo"),
        priority_fn=lifo,
    )
    f_lin = fifo.lineage().to_pandas()
    l_lin = out.lineage().to_pandas()
    assert set(f_lin["url"]) == set(l_lin["url"])  # same crawled set
    assert list(f_lin["url"]) != list(l_lin["url"])  # different order
    # politeness invariant holds under any priority: per host, consecutive
    # dispatches are >= the host's effective delay apart
    for host, grp in l_lin.groupby("host"):
        ts = np.sort(grp["virtual_ts"].to_numpy())
        if len(ts) > 1:
            delay = 1.0 if host.startswith("h1.") else 0.5
            assert (np.diff(ts) >= delay - 1e-9).all()
