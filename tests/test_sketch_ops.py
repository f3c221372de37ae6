"""Tests for the sampling & sketch operators (pipelines/sketch.py)."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def test_mix32_matches_domain_and_determinism():
    from web_crawler_search_engine_ray.pipelines.sketch import mix32_batch

    k = np.arange(10_000, dtype=np.int64)
    h1 = mix32_batch(k, 7)
    h2 = mix32_batch(k, 7)
    assert np.array_equal(h1, h2)
    assert h1.max() < (1 << 32)
    # avalanche sanity: buckets of h % 100 are roughly uniform
    counts = np.bincount((h1 % 100).astype(np.int64), minlength=100)
    assert counts.min() > 50 and counts.max() < 200


def test_sample_lineitem_rate_and_determinism(ray_session):
    from web_crawler_search_engine_ray.pipelines.sketch import sample_lineitem

    total = pq.read_metadata(f"{SF}/lineitem.parquet").num_rows
    # (orderkey, linenumber) is not unique in the synthetic testdata, so
    # canonicalize row order over ALL columns before comparing runs.
    cols = ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"]
    a = sample_lineitem(SF).to_pandas().sort_values(cols).reset_index(drop=True)
    b = sample_lineitem(SF).to_pandas().sort_values(cols).reset_index(drop=True)
    assert a.equals(b)  # same rows every run
    assert 0.05 < len(a) / total < 0.15  # ~10% Bernoulli


def test_value_percentiles_exact(ray_session):
    from web_crawler_search_engine_ray.pipelines.sketch import value_percentiles

    got = value_percentiles(SF).to_pandas().set_index("event_type")
    ev = pq.read_table(
        f"{SF}/events.parquet", columns=["event_type", "value"]
    ).to_pandas()
    for et, grp in ev.groupby("event_type"):
        v = np.sort(np.floor(grp["value"].to_numpy() * 1000.0 + 0.5).astype(np.int64))
        n = len(v)
        row = got.loc[et]
        assert row["n_events"] == n
        for q, col in ((1, "p50_milli"), (9, "p90_milli"), (99, "p99_milli")):
            den = {1: 2, 9: 10, 99: 100}[q]
            target = (q * n + den - 1) // den
            assert row[col] == v[target - 1]  # 1-indexed discrete quantile


def test_supplier_topk_invariants(ray_session):
    from web_crawler_search_engine_ray.pipelines.sketch import supplier_topk

    df = supplier_topk(SF).to_pandas()
    li = pq.read_table(
        f"{SF}/lineitem.parquet", columns=["l_suppkey", "l_extendedprice"]
    ).to_pandas()
    for supp, grp in df.groupby("l_suppkey"):
        grp = grp.sort_values("rk")
        assert list(grp["rk"]) == list(range(1, len(grp) + 1))
        assert len(grp) <= 3
        # rank-1 price is the group max in the base table
        base_max = li[li["l_suppkey"] == supp]["l_extendedprice"].max()
        assert grp.iloc[0]["l_extendedprice"] == base_max
        # prices non-increasing down the ranks
        assert (np.diff(grp["l_extendedprice"].to_numpy()) <= 0).all()


def test_hll_error_bound_and_exact(ray_session):
    from web_crawler_search_engine_ray.pipelines.sketch import distinct_users_hll

    df = distinct_users_hll(SF).to_pandas()
    ev = pq.read_table(
        f"{SF}/events.parquet", columns=["event_type", "user_id"]
    ).to_pandas()
    truth = ev.groupby("event_type")["user_id"].nunique()
    for row in df.itertuples():
        assert row.n_exact == truth[row.event_type]
        # m=64 -> sigma ~ 1.04/8 = 13%; allow 3.5 sigma
        assert abs(row.n_hll - row.n_exact) <= max(5, 0.46 * row.n_exact)


def test_cms_heavy_hitters_properties(ray_session):
    from web_crawler_search_engine_ray.pipelines.sketch import (
        CMS_THRESHOLD,
        heavy_hitters_cms,
    )

    df = heavy_hitters_cms(SF).to_pandas()
    li = pq.read_table(f"{SF}/lineitem.parquet", columns=["l_suppkey"]).to_pandas()
    truth = li.groupby("l_suppkey").size()
    # CMS only over-counts, and every true heavy hitter is reported
    for row in df.itertuples():
        assert row.n_cms >= row.n_exact == truth[row.l_suppkey]
    for supp, n in truth.items():
        if n >= CMS_THRESHOLD:
            assert supp in set(df["l_suppkey"])


def test_cms_sketch_is_partition_invariant():
    """Bucket counts are associative sums: any shard split merged must equal
    the single-pass sketch (the property that lets the shuffle carry 768
    counters regardless of partitioning)."""
    from web_crawler_search_engine_ray.pipelines.sketch import (
        CMS_D,
        CMS_SALT,
        CMS_W,
        mix32_batch,
    )

    rng = np.random.RandomState(5)
    keys = rng.zipf(1.3, size=30_000).astype(np.int64) % 1000

    def sketch(idx):
        m = np.zeros((CMS_D, CMS_W), np.int64)
        for d in range(CMS_D):
            b = (mix32_batch(keys[idx], CMS_SALT + d) % np.uint64(CMS_W)).astype(
                np.int64
            )
            np.add.at(m[d], b, 1)
        return m

    whole = sketch(np.arange(len(keys)))
    parts = np.array_split(np.arange(len(keys)), 9)
    merged = sum(sketch(p) for p in parts)
    assert np.array_equal(whole, merged)
    # point estimates: min over rows never under-counts true frequency
    counts = np.bincount(keys, minlength=1000)
    uniq = np.unique(keys)
    est = np.min(
        np.stack(
            [
                whole[d, (mix32_batch(uniq, CMS_SALT + d) % np.uint64(CMS_W)).astype(np.int64)]
                for d in range(CMS_D)
            ]
        ),
        axis=0,
    )
    assert (est >= counts[uniq]).all()


def test_hll_merge_is_partition_invariant():
    """Register construction is an associative max: hashing any shard split
    and merging must give identical registers to a single pass."""
    from web_crawler_search_engine_ray.pipelines.sketch import (
        _hll_rho,
        hll_estimate,
        mix32_batch,
    )

    rng = np.random.RandomState(3)
    users = rng.randint(0, 5000, size=20_000).astype(np.int64)
    h = mix32_batch(users, 911)
    reg, rho = _hll_rho(h)

    def registers(idx):
        r = np.zeros(64, dtype=np.int64)
        np.maximum.at(r, reg[idx], rho[idx])
        return r

    whole = registers(np.arange(len(users)))
    parts = np.array_split(np.arange(len(users)), 7)
    merged = np.max([registers(p) for p in parts], axis=0)
    assert np.array_equal(whole, merged)

    s = int((np.int64(1) << (27 - whole[whole > 0])).sum()) + int(
        (whole == 0).sum()
    ) * (1 << 27)
    est = hll_estimate(s, int((whole == 0).sum()))
    n_true = len(np.unique(users))
    assert abs(est - n_true) / n_true < 0.4
