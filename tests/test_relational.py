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


def test_hash_join_multimatch_and_misses(ray_session):
    """Generic distributed hash join: multi-match fan-out (M×N rows per
    key), unmatched keys on either side dropped, exact pandas parity."""
    import pandas as pd
    import ray.data

    from web_crawler_search_engine_ray.stages.join import hash_join

    left = pd.DataFrame(
        {"k": [1, 1, 2, 3, 5, 5, 5], "lv": [10, 11, 20, 30, 50, 51, 52]}
    )
    right = pd.DataFrame(
        {"rk": [1, 1, 1, 3, 4, 5], "rv": ["a", "b", "c", "d", "e", "f"]}
    )
    out = (
        hash_join(
            ray.data.from_pandas(left).repartition(3),
            ray.data.from_pandas(right).repartition(2),
            left_on="k",
            right_on="rk",
            num_buckets=4,
        )
        .to_pandas()
        .sort_values(["k", "lv", "rv"])
        .reset_index(drop=True)
    )
    exp = (
        left.merge(right, left_on="k", right_on="rk")
        .sort_values(["k", "lv", "rv"])
        .reset_index(drop=True)[out.columns]
    )
    pd.testing.assert_frame_equal(out, exp)


def test_hash_join_string_keys_and_collision(ray_session):
    import pandas as pd
    import pytest
    import ray.data

    from web_crawler_search_engine_ray.stages.join import hash_join

    left = pd.DataFrame({"host": ["a.com", "b.com", "c.com"], "n": [1, 2, 3]})
    right = pd.DataFrame({"rhost": ["b.com", "c.com", "c.com"], "m": [7, 8, 9]})
    out = hash_join(
        ray.data.from_pandas(left),
        ray.data.from_pandas(right),
        left_on="host",
        right_on="rhost",
        num_buckets=8,
    ).to_pandas()
    assert sorted(zip(out["host"], out["m"])) == [
        ("b.com", 7),
        ("c.com", 8),
        ("c.com", 9),
    ]

    with pytest.raises(ValueError, match="collision"):
        hash_join(
            ray.data.from_pandas(left.rename(columns={"n": "m"})),
            ray.data.from_pandas(right),
            left_on="host",
            right_on="rhost",
        )


def test_shipping_priority_matches_duckdb(ray_session):
    """Q3-shaped big-join-big query vs an independent DuckDB replay."""
    import duckdb

    from web_crawler_search_engine_ray.pipelines.relational import shipping_priority

    tbl = shipping_priority(SF).to_pandas()
    con = duckdb.connect()
    for t in ("customer", "orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    exp = con.execute(
        """
        SELECT l.l_orderkey,
               sum(CAST(floor(l.l_extendedprice * 100.0 + 0.5) AS BIGINT)
                   * (100 - CAST(floor(l.l_discount * 100.0 + 0.5) AS BIGINT))
               )::BIGINT AS revenue_e4,
               o.o_orderdate, o.o_orderpriority
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-06-01'
          AND l.l_shipdate > TIMESTAMP '1998-06-01'
        GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
        ORDER BY revenue_e4 DESC, l.l_orderkey LIMIT 10
        """
    ).df()
    assert list(tbl["l_orderkey"]) == list(exp["l_orderkey"])
    assert list(tbl["revenue_e4"]) == list(exp["revenue_e4"])


def test_events_rolling_window_invariants(ray_session):
    """Rolling window: first event per user has gap -1, rolling sum over a
    full window equals the sum of the last ROLL_WINDOW milli values."""
    import numpy as np

    from web_crawler_search_engine_ray.pipelines.corpus import collect_table
    from web_crawler_search_engine_ray.pipelines.relational import (
        ROLL_WINDOW,
        events_rolling,
    )

    tbl = collect_table(events_rolling(SF)).to_pandas()
    import pyarrow.parquet as pq

    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    assert len(tbl) == len(ev)
    ev["milli"] = np.floor(ev["value"].to_numpy() * 1000.0 + 0.5).astype("int64")
    m = tbl.merge(ev[["event_id", "ts", "milli"]], on="event_id")
    for uid, grp in m.groupby("user_id"):
        g = grp.sort_values(["ts", "event_id"]).reset_index(drop=True)
        assert g.loc[0, "prev_gap_us"] == -1
        assert (g["prev_gap_us"][1:] >= 0).all()
        exp = g["milli"].rolling(ROLL_WINDOW, min_periods=1).sum().astype("int64")
        assert (g["roll_sum_milli"] == exp).all()


def test_order_shipments_window_matches_duckdb(ray_session):
    """Banded interval join vs a direct DuckDB non-equi join, including
    windows that straddle band edges (counted exactly once)."""
    import duckdb

    from web_crawler_search_engine_ray.pipelines.corpus import collect_table
    from web_crawler_search_engine_ray.pipelines.relational import (
        order_shipments_window,
    )

    tbl = (
        collect_table(order_shipments_window(SF))
        .to_pandas()
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    exp = con.execute(
        """
        SELECT o.o_orderkey,
               count(l.l_shipdate)::BIGINT AS n_shipped_3d,
               COALESCE(sum(CAST(floor(l.l_quantity * 1000.0 + 0.5) AS BIGINT)),
                        0)::BIGINT AS sum_qty_milli_3d
        FROM orders o LEFT JOIN lineitem l
          ON l.l_shipdate > o.o_orderdate
         AND l.l_shipdate <= o.o_orderdate + INTERVAL 3 DAY
        GROUP BY 1 ORDER BY 1
        """
    ).df()
    assert len(tbl) == len(exp)
    assert (tbl["o_orderkey"].to_numpy() == exp["o_orderkey"].to_numpy()).all()
    assert (tbl["n_shipped_3d"].to_numpy() == exp["n_shipped_3d"].to_numpy()).all()
    assert (
        tbl["sum_qty_milli_3d"].to_numpy() == exp["sum_qty_milli_3d"].to_numpy()
    ).all()
    # the fixture really exercises band straddling: some window crosses a
    # 16-day band edge
    import numpy as np
    import pyarrow.parquet as pq

    od = pq.read_table(f"{SF}/orders.parquet", columns=["o_orderdate"])
    t_us = od.column("o_orderdate").cast("int64").to_numpy(zero_copy_only=False)
    band_us = 16 * 86_400_000_000
    win_us = 3 * 86_400_000_000
    assert ((t_us + 1) // band_us != (t_us + win_us) // band_us).any()


def test_events_funnel_stages(ray_session, tmp_path):
    """Crafted funnel paths: full conversion, click-before-view (doesn't
    count), view-only, view+click-only, ts ties (strict > required), and
    a user with no view at all (excluded)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_crawler_search_engine_ray.pipelines.relational import events_funnel

    T = lambda s: pa.scalar(s, pa.timestamp("us"))
    rows = [
        # u1: full funnel
        (1, "2024-01-01T00:00:00", "view"),
        (1, "2024-01-01T00:01:00", "click"),
        (1, "2024-01-01T00:02:00", "purchase"),
        # u2: click BEFORE view, purchase after -> stage 1 (no click after view)
        (2, "2024-01-01T00:00:00", "click"),
        (2, "2024-01-01T00:01:00", "view"),
        (2, "2024-01-01T00:02:00", "purchase"),
        # u3: view only -> stage 1
        (3, "2024-01-01T00:00:00", "view"),
        # u4: view + click, purchase TIED with click ts -> stage 2 (strict >)
        (4, "2024-01-01T00:00:00", "view"),
        (4, "2024-01-01T00:01:00", "click"),
        (4, "2024-01-01T00:01:00", "purchase"),
        # u5: no view -> excluded entirely
        (5, "2024-01-01T00:00:00", "click"),
        (5, "2024-01-01T00:01:00", "purchase"),
    ]
    tbl = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array([r[1] for r in rows]).cast(pa.timestamp("us")),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array([""] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    got = {
        int(r["stage"]): int(r["n_users"])
        for r in events_funnel(str(tmp_path)).to_pylist()
    }
    assert got == {1: 2, 2: 1, 3: 1}


def test_orders_no_returns_anti_join(ray_session):
    """Anti-join equals the python set difference, and partitioning can't
    leak a matched order through (every orderkey's rows co-locate)."""
    import pyarrow.parquet as pq

    from web_crawler_search_engine_ray.pipelines.relational import orders_no_returns

    SF = "/root/testdata/sf0.001"
    got = {
        r["o_orderkey"]: r["o_custkey"]
        for r in orders_no_returns(SF).take_all()
    }
    orders = pq.read_table(f"{SF}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    li = pq.read_table(f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_returnflag"])
    returned = {
        k for k, f in zip(
            li.column("l_orderkey").to_pylist(), li.column("l_returnflag").to_pylist()
        ) if f == "R"
    }
    want = {
        k: c for k, c in zip(
            orders.column("o_orderkey").to_pylist(), orders.column("o_custkey").to_pylist()
        ) if k not in returned
    }
    assert got == want and len(got) > 0


def test_pricing_rollup_levels(ray_session):
    """Rollup internal consistency: subtotals sum to the grand total at
    every level, and the finest cells match a direct pandas groupby."""
    import pyarrow.parquet as pq

    from web_crawler_search_engine_ray.pipelines.relational import pricing_rollup

    SF = "/root/testdata/sf0.001"
    t = pricing_rollup(SF).to_pandas()
    fine = t[(t.l_returnflag != "ALL") & (t.l_linestatus != "ALL")]
    sub = t[(t.l_returnflag != "ALL") & (t.l_linestatus == "ALL")]
    grand = t[(t.l_returnflag == "ALL") & (t.l_linestatus == "ALL")]
    assert len(grand) == 1
    assert fine.sum_qty_milli.sum() == sub.sum_qty_milli.sum() == int(grand.sum_qty_milli.iloc[0])
    assert fine.n_rows.sum() == sub.n_rows.sum() == int(grand.n_rows.iloc[0])

    li = pq.read_table(
        f"{SF}/lineitem.parquet", columns=["l_returnflag", "l_linestatus", "l_quantity"]
    ).to_pandas()
    import numpy as np

    li["q"] = np.floor(li.l_quantity * 1000.0 + 0.5).astype("int64")
    want = li.groupby(["l_returnflag", "l_linestatus"])["q"].sum().to_dict()
    got = {
        (r.l_returnflag, r.l_linestatus): r.sum_qty_milli for r in fine.itertuples()
    }
    assert got == want


def test_event_transitions_matches_pandas(ray_session):
    import pandas as pd
    import pyarrow.parquet as pq

    from web_crawler_search_engine_ray.pipelines.relational import (
        event_transitions,
    )

    sf = "/root/testdata/sf0.001"
    ev = pq.read_table(
        f"{sf}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    ).to_pandas()
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    prev = ev.groupby("user_id")["event_type"].shift(1)
    pairs = pd.DataFrame({"prev_type": prev, "next_type": ev["event_type"]})
    want = (
        pairs.dropna()
        .groupby(["prev_type", "next_type"])
        .size()
        .reset_index(name="n_transitions")
    )
    got = event_transitions(sf).to_pandas()
    m = got.merge(want, on=["prev_type", "next_type"], suffixes=("", "_w"))
    assert len(m) == len(want) == len(got)
    assert (m["n_transitions"] == m["n_transitions_w"]).all()
    # transitions conserve: total = sum over users of (n_events - 1)
    per_user = ev.groupby("user_id").size()
    assert got["n_transitions"].sum() == int((per_user - 1).clip(lower=0).sum())


def test_purchase_attribution_bruteforce(ray_session):
    import numpy as np
    import pyarrow.parquet as pq

    from web_crawler_search_engine_ray.pipelines.relational import (
        ATTRIB_WINDOW_US,
        purchase_attribution,
    )

    got = {
        r["event_id"]: r for r in purchase_attribution(SF).take_all()
    }
    ev = pq.read_table(
        f"{SF}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    ).to_pandas()
    t_us = ev["ts"].astype("int64")
    milli = np.floor(ev["value"].fillna(0.0).to_numpy() * 1000.0 + 0.5).astype(
        "int64"
    )
    purchases = ev[ev["event_type"] == "purchase"]
    assert set(got) == set(purchases["event_id"])
    for _, p in purchases.iterrows():
        pt = int(t_us[p.name])
        mask = (
            (ev["user_id"] == p["user_id"])
            & (t_us >= pt - ATTRIB_WINDOW_US)
            & (t_us < pt)
        )
        r = got[p["event_id"]]
        assert r["user_id"] == p["user_id"]
        assert r["n_prior_1h"] == int(mask.sum())
        assert r["sum_value_milli"] == int(milli[mask.to_numpy()].sum())


def test_purchase_attribution_random_streams(ray_session, tmp_path):
    """Prefix-rank kernel vs brute force on adversarial random streams:
    duplicate timestamps (forcing the boundary/tie rules), bursts inside
    and outside the window, many users per bucket."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_crawler_search_engine_ray.pipelines.relational import (
        ATTRIB_WINDOW_US,
        purchase_attribution,
    )

    for seed in (1, 2, 3):
        rng = np.random.RandomState(seed)
        n = 400
        user = rng.randint(0, 12, n).astype(np.int64)
        # coarse time grid -> many exact duplicate timestamps
        base = np.int64(1_700_000_000_000_000)
        t_us = base + rng.randint(0, 5, n).astype(np.int64) * ATTRIB_WINDOW_US // 2
        t_us += rng.randint(0, 4, n).astype(np.int64)  # micro jitter, collisions kept
        types = np.where(rng.rand(n) < 0.3, "purchase", "click")
        value = rng.rand(n) * 10
        value[rng.rand(n) < 0.1] = np.nan  # NULLs
        d = tmp_path / f"s{seed}"
        d.mkdir()
        tbl = pa.table(
            {
                "event_id": pa.array(np.arange(n), pa.int64()),
                "ts": pa.array(t_us, pa.timestamp("us")),
                "user_id": pa.array(user, pa.int64()),
                "event_type": pa.array(types.tolist(), pa.string()),
                "value": pa.array(
                    [None if np.isnan(v) else float(v) for v in value],
                    pa.float64(),
                ),
            }
        )
        pq.write_table(tbl, str(d / "events.parquet"))
        got = {
            r["event_id"]: (r["n_prior_1h"], r["sum_value_milli"])
            for r in purchase_attribution(str(d)).take_all()
        }
        milli = np.floor(np.nan_to_num(value) * 1000.0 + 0.5).astype(np.int64)
        exp = {}
        for i in np.flatnonzero(types == "purchase"):
            m = (
                (user == user[i])
                & (t_us >= t_us[i] - ATTRIB_WINDOW_US)
                & (t_us < t_us[i])
            )
            exp[int(i)] = (int(m.sum()), int(milli[m].sum()))
        assert got == exp, f"seed {seed}"
