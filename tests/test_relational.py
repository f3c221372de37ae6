"""Invariant tests for the relational custom operators (session window,
as-of join) over the read-only testdata."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_events_sessions_invariants(ray_session):
    """Session windows: gaps within a session <= 30 min, consecutive
    sessions of one user > 30 min apart, event counts conserve."""
    import numpy as np
    import pyarrow.parquet as pq

    from web_crawler_search_engine_ray.pipelines.corpus import collect_table
    from web_crawler_search_engine_ray.pipelines.relational import (
        SESSION_GAP_US,
        events_sessions,
    )

    tbl = collect_table(events_sessions(SF)).to_pandas()
    total = pq.ParquetFile(f"{SF}/events.parquet").metadata.num_rows
    assert tbl["n_events"].sum() == total
    for uid, grp in tbl.groupby("user_id"):
        g = grp.sort_values("session_start")
        assert (g["session_end"] >= g["session_start"]).all()
        if len(g) > 1:
            gaps = (
                g["session_start"].to_numpy()[1:].astype("datetime64[us]").astype(np.int64)
                - g["session_end"].to_numpy()[:-1].astype("datetime64[us]").astype(np.int64)
            )
            assert (gaps > SESSION_GAP_US).all()


def test_events_orders_asof_spot_check(ray_session):
    """As-of join vs a pandas merge_asof-style reference on a sample."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from web_crawler_search_engine_ray.pipelines.corpus import collect_table
    from web_crawler_search_engine_ray.pipelines.relational import events_orders_asof

    got = collect_table(events_orders_asof(SF)).to_pandas().set_index("event_id")
    ev = pq.read_table(f"{SF}/events.parquet", columns=["event_id", "ts", "user_id"]).to_pandas()
    od = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).to_pandas()
    assert len(got) == len(ev)
    rng = np.random.RandomState(7)
    for i in rng.randint(0, len(ev), 50):
        e = ev.iloc[i]
        cand = od[(od.o_custkey == e.user_id) & (od.o_orderdate <= e.ts)]
        want = (
            int(cand.sort_values(["o_orderdate", "o_orderkey"]).iloc[-1].o_orderkey)
            if len(cand)
            else -1
        )
        assert got.loc[e.event_id, "asof_orderkey"] == want


def test_bloom_semijoin_exact_and_fp(ray_session):
    """The bloom must never drop a true match (no false negatives) and the
    final matched aggregate must equal the exact semi-join; candidates
    may exceed matches (false positives are allowed, misses are not)."""
    import numpy as np
    import pyarrow.parquet as pq

    from web_crawler_search_engine_ray.pipelines.relational import (
        BLOOM_PRICE_CUT,
        lineitem_bloom_semijoin,
    )

    sf = "/root/testdata/sf0.001"
    got = lineitem_bloom_semijoin(sf).to_pandas().set_index("l_returnflag")
    orders = pq.read_table(
        f"{sf}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    ).to_pandas()
    keys = set(orders[orders["o_totalprice"] > BLOOM_PRICE_CUT]["o_orderkey"])
    li = pq.read_table(
        f"{sf}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag", "l_quantity"],
    ).to_pandas()
    li["hit"] = li["l_orderkey"].isin(keys)
    for flag, grp in li.groupby("l_returnflag"):
        row = got.loc[flag]
        n_match = int(grp["hit"].sum())
        assert row["n_matched"] == n_match
        assert row["n_candidates"] >= n_match
        want_q = int(np.floor(grp[grp["hit"]]["l_quantity"].sum() * 1000.0 + 0.5))
        assert abs(int(row["sum_qty_milli"]) - want_q) <= 1  # float-sum order
