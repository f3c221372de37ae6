"""Relational pipelines over the TPC-H-ish testdata tables.

These exercise the engine's generic dataflow primitives (scan with column
pruning, vectorized Arrow expressions, multi-key groupby aggregation,
broadcast hash join, sort/limit, temporal bucketing) against DuckDB
oracles. Float sums are rounded only at the output edge (shared
``floor(x*K+0.5)`` fixed-point formula), and every ranking key is either
integral or separated by orders of magnitude more than float-sum error.

Every aggregate pre-combines INSIDE map_batches with pyarrow's C-level
``Table.group_by`` (the map-side combiner), so the Ray ``groupby`` shuffle
carries at most (group-cardinality × batches) partial rows, not the raw
table — the 100 TB posture for low-cardinality aggregates.
"""

from __future__ import annotations

import os
from typing import List, Sequence, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..stages.util import empty_guard
from .corpus import collect_table

PRICING_CUTOFF = "1998-09-02"


def _read(sf_dir: str, table: str, columns: List[str]) -> "ray.data.Dataset":
    return ray.data.read_parquet(
        os.path.join(sf_dir, f"{table}.parquet"), columns=columns
    )


def _round_col(arr: np.ndarray, scale: float) -> np.ndarray:
    return np.floor(arr * scale + 0.5) / scale


def _partial(
    t: pa.Table, keys: List[str], sums: Sequence[Tuple[str, str]], count_as: str
) -> pa.Table:
    """Batch-local combine: pyarrow group_by sum/count with stable output
    names; the Ray shuffle then sums these partials."""
    aggs = [(src, "sum") for src, _ in sums] + [([], "count_all")]
    g = t.group_by(keys).aggregate(aggs)
    cols = {k: g.column(k) for k in keys}
    for src, out in sums:
        cols[out] = g.column(f"{src}_sum")
    cols[count_as] = pc.cast(g.column("count_all"), pa.int64())
    return pa.table(cols)


@empty_guard("lineitem", l_returnflag=pa.string(), l_linestatus=pa.string(), sum_qty=pa.float64(), sum_base_price=pa.float64(), sum_disc_price=pa.float64(), sum_charge=pa.float64(), count_order=pa.int64())
def pricing_summary(sf_dir: str) -> pa.Table:
    """TPC-H Q1-shaped pricing summary: filter on ship date, vectorized
    derived columns, batch-local combine to 6 partial rows per block,
    then ONE reduce task merges the tiny partials (no AllToAll — the
    post-combine data is 6 rows × blocks regardless of input size)."""
    cutoff = np.datetime64(PRICING_CUTOFF, "us")

    def prep(batch: pa.Table) -> pa.Table:
        mask = pc.less_equal(
            batch.column("l_shipdate"), pa.scalar(cutoff, batch.column("l_shipdate").type)
        )
        b = batch.filter(mask)
        ext = b.column("l_extendedprice")
        disc = b.column("l_discount")
        tax = b.column("l_tax")
        disc_price = pc.multiply(ext, pc.subtract(pa.scalar(1.0), disc))
        charge = pc.multiply(disc_price, pc.add(pa.scalar(1.0), tax))
        t = pa.table(
            {
                "l_returnflag": b.column("l_returnflag"),
                "l_linestatus": b.column("l_linestatus"),
                "l_quantity": b.column("l_quantity"),
                "l_extendedprice": ext,
                "disc_price": disc_price,
                "charge": charge,
            }
        )
        return _partial(
            t,
            ["l_returnflag", "l_linestatus"],
            [
                ("l_quantity", "sum_qty"),
                ("l_extendedprice", "sum_base_price"),
                ("disc_price", "sum_disc_price"),
                ("charge", "sum_charge"),
            ],
            "count_order",
        )

    agg = (
        _read(
            sf_dir,
            "lineitem",
            [
                "l_returnflag",
                "l_linestatus",
                "l_quantity",
                "l_extendedprice",
                "l_discount",
                "l_tax",
                "l_shipdate",
            ],
        )
        .map_batches(prep, batch_format="pyarrow")
    )
    from ..stages.util import exchange_group_agg

    agg = exchange_group_agg(
        agg,
        ["l_returnflag", "l_linestatus"],
        [
            ("sum_qty", "sum"),
            ("sum_base_price", "sum"),
            ("sum_disc_price", "sum"),
            ("sum_charge", "sum"),
            ("count_order", "sum"),
        ],
        nbuck=1,
    )
    tbl = collect_table(agg)
    out = {
        "l_returnflag": tbl.column("l_returnflag"),
        "l_linestatus": tbl.column("l_linestatus"),
    }
    for col in ("sum_qty", "sum_base_price", "sum_disc_price", "sum_charge"):
        out[col] = pa.array(
            _round_col(tbl.column(col).to_numpy(zero_copy_only=False), 100.0),
            pa.float64(),
        )
    out["count_order"] = pc.cast(tbl.column("count_order"), pa.int64())
    return pa.table(out)


@empty_guard("customer", "orders", "lineitem", c_custkey=pa.int64(), c_name=pa.string(), revenue=pa.float64(), n_orders=pa.int64())
def top_customers(sf_dir: str) -> pa.Table:
    """Top-10 customers by total order value: batch-local combine routed
    through ONE manual bucket exchange on custkey (each customer's
    partials are bucket-local, so the per-bucket sum and local top-10 are
    exact), then a driver merge over buckets × 10 candidates with the
    small customer catalog broadcast via ray.put — no all-to-all join, no
    global sort. (The former groupby + sort chain paid two AllToAlls on
    a partial table this narrow.)"""
    from ..stages.util import bucket_exchange

    import pyarrow.parquet as pq

    nbuck = int(
        max(
            1,
            min(
                64,
                pq.ParquetFile(
                    os.path.join(sf_dir, "orders.parquet")
                ).metadata.num_rows
                // 500_000
                + 1,
            ),
        )
    )

    def prep(batch: pa.Table) -> pa.Table:
        p = _partial(
            batch.select(["o_custkey", "o_totalprice"]),
            ["o_custkey"],
            [("o_totalprice", "revenue")],
            "n_orders",
        )
        b = np.asarray(p.column("o_custkey"), dtype=np.int64) % nbuck
        return p.append_column("bucket", pa.array(b, pa.int64()))

    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_name"]
    )
    names = dict(
        zip(
            np.asarray(cust.column("c_custkey"), dtype=np.int64).tolist(),
            cust.column("c_name").to_pylist(),
        )
    )
    names_ref = ray.put(names)

    def reduce_top(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return pa.table(
                {
                    "c_custkey": pa.array([], pa.int64()),
                    "c_name": pa.array([], pa.string()),
                    "revenue": pa.array([], pa.float64()),
                    "n_orders": pa.array([], pa.int64()),
                }
            )
        k = np.asarray(tbl.column("o_custkey"), dtype=np.int64)
        rev = tbl.column("revenue").to_numpy(zero_copy_only=False)
        cnt = tbl.column("n_orders").to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(k, return_inverse=True)
        rsum = np.bincount(inv, weights=rev)
        nsum = np.bincount(inv, weights=cnt.astype(np.float64)).astype(np.int64)
        top = np.lexsort((uniq, -rsum))[:10]
        lookup = ray.get(names_ref)
        return pa.table(
            {
                "c_custkey": pa.array(uniq[top], pa.int64()),
                "c_name": pa.array(
                    [lookup.get(int(x), "") for x in uniq[top]], pa.string()
                ),
                "revenue": pa.array(rsum[top], pa.float64()),
                "n_orders": pa.array(nsum[top], pa.int64()),
            }
        )

    mat = (
        _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
        .map_batches(prep, batch_format="pyarrow")
        .materialize()
    )
    cands = collect_table(bucket_exchange(mat, "bucket", nbuck, reduce_top))
    rev = cands.column("revenue").to_numpy(zero_copy_only=False)
    key = np.asarray(cands.column("c_custkey"), dtype=np.int64)
    top = np.lexsort((key, -rev))[:10]
    tbl = cands.take(pa.array(top, pa.int64()))
    return pa.table(
        {
            "c_custkey": tbl.column("c_custkey"),
            "c_name": tbl.column("c_name"),
            "revenue": pa.array(
                _round_col(tbl.column("revenue").to_numpy(zero_copy_only=False), 100.0),
                pa.float64(),
            ),
            "n_orders": tbl.column("n_orders"),
        }
    )


@empty_guard("events", event_type=pa.string(), hour=pa.timestamp("us"), n_events=pa.int64(), sum_value=pa.float64())
def events_hourly(sf_dir: str) -> pa.Table:
    """Tumbling-window (hourly) aggregate of the events stream table:
    temporal floor + batch-local combine, then ONE manual hash exchange
    on the composite (type, hour) key."""
    from ..stages.util import exchange_group_agg

    def bucket(batch: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(batch.column("ts"), unit="hour")
        t = pa.table(
            {
                "event_type": batch.column("event_type"),
                "hour": hour,
                "value": batch.column("value"),
            }
        )
        return _partial(
            t, ["event_type", "hour"], [("value", "sum_value")], "n_events"
        )

    agg = exchange_group_agg(
        _read(sf_dir, "events", ["ts", "event_type", "value"]).map_batches(
            bucket, batch_format="pyarrow"
        ),
        ["event_type", "hour"],
        [("n_events", "sum"), ("sum_value", "sum")],
        nbuck=8,
    )
    tbl = collect_table(agg)
    return pa.table(
        {
            "event_type": tbl.column("event_type"),
            # us resolution so the hash compare sees identical physical values
            # to DuckDB's date_trunc (which yields timestamp[us]).
            "hour": pc.cast(tbl.column("hour"), pa.timestamp("us")),
            "n_events": pc.cast(tbl.column("n_events"), pa.int64()),
            "sum_value": pa.array(
                _round_col(tbl.column("sum_value").to_numpy(zero_copy_only=False), 1000.0),
                pa.float64(),
            ),
        }
    )


@empty_guard("events", user_id=pa.int64(), n_events=pa.int64(), n_purchases=pa.int64(), n_errors=pa.int64(), sum_value=pa.float64())
def events_user_stats(sf_dir: str) -> pa.Table:
    """Per-user event profile: conditional aggregation as vectorized masks,
    batch-local combine, then ONE manual exchange of partials keyed by
    user (stages/util.py exchange_sum_by_key) instead of a sort
    AllToAll."""
    from ..stages.util import exchange_sum_by_key

    def prep(batch: pa.Table) -> pa.Table:
        is_purchase = pc.cast(
            pc.equal(batch.column("event_type"), pa.scalar("purchase")), pa.int64()
        )
        is_error = pc.cast(
            pc.equal(batch.column("event_type"), pa.scalar("error")), pa.int64()
        )
        t = pa.table(
            {
                "user_id": batch.column("user_id"),
                "is_purchase": is_purchase,
                "is_error": is_error,
                "value": batch.column("value"),
            }
        )
        return _partial(
            t,
            ["user_id"],
            [
                ("is_purchase", "n_purchases"),
                ("is_error", "n_errors"),
                ("value", "sum_value"),
            ],
            "n_events",
        )

    agg = exchange_sum_by_key(
        _read(sf_dir, "events", ["user_id", "event_type", "value"]).map_batches(
            prep, batch_format="pyarrow"
        ),
        "user_id",
        nbuck=4,
    )
    tbl = collect_table(agg)
    tbl = tbl.take(
        pa.array(
            np.argsort(np.asarray(tbl.column("user_id"), dtype=np.int64)),
            pa.int64(),
        )
    )
    return pa.table(
        {
            "user_id": tbl.column("user_id"),
            "n_events": pc.cast(tbl.column("n_events"), pa.int64()),
            "n_purchases": pc.cast(tbl.column("n_purchases"), pa.int64()),
            "n_errors": pc.cast(tbl.column("n_errors"), pa.int64()),
            "sum_value": pa.array(
                _round_col(tbl.column("sum_value").to_numpy(zero_copy_only=False), 1000.0),
                pa.float64(),
            ),
        }
    )


@empty_guard("part", p_brand=pa.string(), n_parts=pa.int64(), sum_size=pa.int64(), avg_price=pa.float64())
def brand_part_stats(sf_dir: str) -> pa.Table:
    """Part-catalog profile per brand: batch-local combine to 25 partial
    rows per block, then ONE reduce merges the partials (no AllToAll);
    rounded average retail price computed as round(sum/count) so Ray and
    SQL divide the same two numbers."""
    from ..stages.util import exchange_group_agg

    def prep(batch: pa.Table) -> pa.Table:
        return _partial(
            batch,
            ["p_brand"],
            [("p_size", "sum_size"), ("p_retailprice", "sum_price")],
            "n_parts",
        )

    agg = exchange_group_agg(
        _read(sf_dir, "part", ["p_brand", "p_size", "p_retailprice"]).map_batches(
            prep, batch_format="pyarrow"
        ),
        ["p_brand"],
        [("n_parts", "sum"), ("sum_size", "sum"), ("sum_price", "sum")],
        nbuck=1,
    )
    tbl = collect_table(agg)
    n = tbl.column("n_parts").to_numpy(zero_copy_only=False).astype(np.float64)
    avg = tbl.column("sum_price").to_numpy(zero_copy_only=False) / n
    return pa.table(
        {
            "p_brand": tbl.column("p_brand"),
            "n_parts": pc.cast(tbl.column("n_parts"), pa.int64()),
            "sum_size": pc.cast(tbl.column("sum_size"), pa.int64()),
            "avg_price": pa.array(_round_col(avg, 100.0), pa.float64()),
        }
    )


SESSION_GAP_US = 30 * 60 * 1_000_000  # 30-minute session gap (µs)
_ASOF_BUCKETS = 64


@empty_guard("events", user_id=pa.int64(), session_start=pa.timestamp("us"), session_end=pa.timestamp("us"), n_events=pa.int64(), sum_value=pa.float64())
def events_sessions(sf_dir: str) -> "ray.data.Dataset":
    """Session-window aggregate (streaming-window custom operator): per
    user, events sorted by (ts, event_id) split into sessions at >30-min
    gaps; one output row per session. ONE manual hash exchange on
    user-hash co-locates a key's events; the per-bucket kernel is fully
    segmented — one lexsort per bucket, session breaks at user change OR
    gap, reduceat sums — no per-user Python. Deterministic tie order
    (ts, event_id) matches the SQL window ORDER BY."""

    def sessions(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "session_start": pa.array([], pa.timestamp("us")),
                    "session_end": pa.array([], pa.timestamp("us")),
                    "n_events": pa.array([], pa.int64()),
                    "sum_value": pa.array([], pa.float64()),
                }
            )
        uid = tbl.column("user_id").to_numpy(zero_copy_only=False)
        ts = tbl.column("ts").to_numpy(zero_copy_only=False)
        eid = tbl.column("event_id").to_numpy(zero_copy_only=False)
        val = tbl.column("value").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        u, ts, val = uid[order], ts[order], val[order]
        t_us = ts.astype("datetime64[us]").astype(np.int64)
        brk = np.ones(len(t_us), dtype=bool)
        brk[1:] = (u[1:] != u[:-1]) | (np.diff(t_us) > SESSION_GAP_US)
        starts = np.flatnonzero(brk)
        ends = np.append(starts[1:], len(t_us))
        n_ev = ends - starts
        sum_v = np.add.reduceat(val, starts)
        return pa.table(
            {
                "user_id": pa.array(u[starts], pa.int64()),
                "session_start": pa.array(ts[starts]).cast(pa.timestamp("us")),
                "session_end": pa.array(ts[ends - 1]).cast(pa.timestamp("us")),
                "n_events": pa.array(n_ev, pa.int64()),
                "sum_value": pa.array(_round_col(sum_v, 1000.0), pa.float64()),
            }
        )

    def add_bucket(b: pa.Table) -> pa.Table:
        k = b.column("user_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (k * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)
        return b.append_column(
            "sbucket",
            pa.array((h % np.uint64(_ASOF_BUCKETS)).astype(np.int32), pa.int32()),
        )

    from ..stages.util import bucket_exchange

    return bucket_exchange(
        _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
        .map_batches(add_bucket, batch_format="pyarrow")
        .materialize(),
        "sbucket",
        _ASOF_BUCKETS,
        sessions,
    )


@empty_guard("events", event_id=pa.int64(), user_id=pa.int64(), asof_orderkey=pa.int64(), asof_totalprice=pa.float64())
def events_orders_asof(sf_dir: str) -> "ray.data.Dataset":
    """As-of join (custom operator): for every event, the user's most
    recent order with o_orderdate <= ts (ties: max o_orderkey); -1 / 0.0
    when none. Implemented as the scalable shuffle pattern — both sides
    union into one dataset bucketed by key hash, each bucket group sorts
    its order rows once and answers its event rows with np.searchsorted —
    so neither side broadcasts and skewed keys split across at most one
    bucket. (At this table size a ray.put broadcast of orders would also
    work; the shuffle form is the 100 TB path.)"""

    def tag_events(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {
                "k": b.column("user_id"),
                "is_order": pa.array(np.zeros(n, bool), pa.bool_()),
                "t_us": pc.cast(b.column("ts"), pa.int64()),
                "event_id": b.column("event_id"),
                "okey": pa.array(np.full(n, -1, np.int64), pa.int64()),
                "price": pa.array(np.zeros(n), pa.float64()),
            }
        )

    def tag_orders(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {
                "k": b.column("o_custkey"),
                "is_order": pa.array(np.ones(n, bool), pa.bool_()),
                "t_us": pc.cast(b.column("o_orderdate"), pa.int64()),
                "event_id": pa.array(np.full(n, -1, np.int64), pa.int64()),
                "okey": b.column("o_orderkey"),
                "price": b.column("o_totalprice"),
            }
        )

    def bucket(b: pa.Table) -> pa.Table:
        # Fibonacci-mix of the int key — vectorized, no Python loop; same
        # routing role as a string hash (results are bucket-invariant)
        k = b.column("k").to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (k * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)
        return b.append_column(
            "bucket",
            pa.array((h % np.uint64(_ASOF_BUCKETS)).astype(np.int32), pa.int32()),
        )

    def asof(group: pa.Table) -> pa.Table:
        k = group.column("k").to_numpy(zero_copy_only=False)
        is_o = group.column("is_order").to_numpy(zero_copy_only=False).astype(bool)
        t = group.column("t_us").to_numpy(zero_copy_only=False)
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        okey = group.column("okey").to_numpy(zero_copy_only=False)
        price = group.column("price").to_numpy(zero_copy_only=False)
        if not len(k):
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "asof_orderkey": pa.array([], pa.int64()),
                    "asof_totalprice": pa.array([], pa.float64()),
                }
            )

        # One sort-merge pass, no per-user loop: rows sorted by
        # (k, t, orders-before-events, okey) — at an equal (k, t) the
        # order row precedes the event (o_orderdate <= ts matches) and
        # equal-date orders sort ascending by okey so the LAST preceding
        # order row is the max-orderkey tie-break. A cummax forward-fill
        # then hands every event the position of its last preceding order;
        # a key-equality check voids fills that leaked across users.
        srt = np.lexsort((okey, ~is_o, t, k))
        ks, is_os, ts = k[srt], is_o[srt], t[srt]
        pos = np.arange(len(srt), dtype=np.int64)
        marker = np.where(is_os, pos, np.int64(-1))
        last_order = np.maximum.accumulate(marker)
        ev = np.flatnonzero(~is_os)
        lo = last_order[ev]
        found = (lo >= 0) & (ks[np.maximum(lo, 0)] == ks[ev])
        res_key = np.full(len(ev), -1, np.int64)
        res_price = np.zeros(len(ev))
        src = np.maximum(lo, 0)
        okey_s, price_s, eid_s = okey[srt], price[srt], eid[srt]
        res_key[found] = okey_s[src[found]]
        res_price[found] = price_s[src[found]]
        return pa.table(
            {
                "event_id": pa.array(eid_s[ev], pa.int64()),
                "user_id": pa.array(ks[ev], pa.int64()),
                "asof_orderkey": pa.array(res_key, pa.int64()),
                "asof_totalprice": pa.array(res_price, pa.float64()),
            }
        )

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id"]).map_batches(
        tag_events, batch_format="pyarrow"
    )
    od = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]
    ).map_batches(tag_orders, batch_format="pyarrow")
    from ..stages.util import bucket_exchange

    return bucket_exchange(
        ev.union(od).map_batches(bucket, batch_format="pyarrow").materialize(),
        "bucket",
        _ASOF_BUCKETS,
        asof,
    )


ATTRIB_WINDOW_US = 3_600_000_000  # 1 hour


@empty_guard(
    "events",
    event_id=pa.int64(),
    user_id=pa.int64(),
    n_prior_1h=pa.int64(),
    sum_value_milli=pa.int64(),
)
def purchase_attribution(
    sf_dir: str, window_us: int = ATTRIB_WINDOW_US
) -> "ray.data.Dataset":
    """Range join (custom operator — the interval sibling of the as-of
    join): for every purchase event, the count and milli-value sum of the
    SAME user's events in the preceding attribution window
    ``[ts - window, ts)`` (end-exclusive, so the purchase itself and any
    same-microsecond event are out; start-inclusive).

    Algorithm — prefix-rank sort-merge, one exchange, no per-row loops:
    count(user, [s, e)) = #(t < e) − #(t < s), so each anchor becomes TWO
    rank queries. Events and queries union into one array lexsorted by
    (user, t, is_event) — queries sort BEFORE events at an equal (user,
    t), which makes the exclusive prefix sum exactly #(t < x) — and the
    per-user prefix base cancels in the end−start difference, so no
    segment bookkeeping is needed. Rows route on a user-hash bucket
    exchange (the same partitioning the as-of join uses); skew splits at
    most one bucket. NULL event values count as 0 milli, matching the
    oracle's NULL-skipping SUM."""

    def prep(b: pa.Table) -> pa.Table:
        vals = pc.fill_null(pc.cast(b.column("value"), pa.float64()), 0.0)
        milli = np.floor(
            np.asarray(vals, dtype=np.float64) * 1000.0 + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "user_id": b.column("user_id"),
                "event_id": b.column("event_id"),
                "t_us": pc.cast(b.column("ts"), pa.int64()),
                "milli": pa.array(milli, pa.int64()),
                "is_anchor": pc.equal(b.column("event_type"), pa.scalar("purchase")),
            }
        )

    def bucket(b: pa.Table) -> pa.Table:
        k = b.column("user_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (k * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)
        return b.append_column(
            "bucket",
            pa.array((h % np.uint64(_ASOF_BUCKETS)).astype(np.int32), pa.int32()),
        )

    def attrib(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "event_id": pa.array([], pa.int64()),
                "user_id": pa.array([], pa.int64()),
                "n_prior_1h": pa.array([], pa.int64()),
                "sum_value_milli": pa.array([], pa.int64()),
            }
        )
        if group.num_rows == 0:
            return empty
        u = group.column("user_id").to_numpy(zero_copy_only=False)
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        t = group.column("t_us").to_numpy(zero_copy_only=False)
        v = group.column("milli").to_numpy(zero_copy_only=False)
        anc = group.column("is_anchor").to_numpy(zero_copy_only=False).astype(bool)
        qi = np.flatnonzero(anc)
        nq, ne = len(qi), len(u)
        if nq == 0:
            return empty
        # union: every event once + two rank queries per anchor
        K = np.concatenate([u, u[qi], u[qi]])
        T = np.concatenate([t, t[qi] - np.int64(window_us), t[qi]])
        IS_EV = np.zeros(ne + 2 * nq, bool)
        IS_EV[:ne] = True
        CNT = IS_EV.astype(np.int64)
        VAL = np.concatenate([v, np.zeros(2 * nq, np.int64)])
        QID = np.concatenate(
            [np.full(ne, -1, np.int64), np.arange(nq), np.arange(nq)]
        )
        QROLE = np.concatenate(
            [np.zeros(ne, np.int64), np.zeros(nq, np.int64), np.ones(nq, np.int64)]
        )
        srt = np.lexsort((IS_EV, T, K))
        cnt_s, val_s = CNT[srt], VAL[srt]
        pre_cnt = np.cumsum(cnt_s) - cnt_s  # exclusive prefix = #(t < x)
        pre_val = np.cumsum(val_s) - val_s
        qrows = np.flatnonzero(QID[srt] >= 0)
        qid_s, qrole_s = QID[srt][qrows], QROLE[srt][qrows]
        rc = np.zeros((nq, 2), np.int64)
        rv = np.zeros((nq, 2), np.int64)
        rc[qid_s, qrole_s] = pre_cnt[qrows]
        rv[qid_s, qrole_s] = pre_val[qrows]
        return pa.table(
            {
                "event_id": pa.array(eid[qi], pa.int64()),
                "user_id": pa.array(u[qi], pa.int64()),
                "n_prior_1h": pa.array(rc[:, 1] - rc[:, 0], pa.int64()),
                "sum_value_milli": pa.array(rv[:, 1] - rv[:, 0], pa.int64()),
            }
        )

    from ..stages.util import bucket_exchange

    return bucket_exchange(
        _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type", "value"])
        .map_batches(prep, batch_format="pyarrow")
        .map_batches(bucket, batch_format="pyarrow")
        .materialize(),
        "bucket",
        _ASOF_BUCKETS,
        attrib,
    )


ROLL_WINDOW = 5  # current event + 4 preceding


@empty_guard("events", event_id=pa.int64(), user_id=pa.int64(), prev_gap_us=pa.int64(), roll_sum_milli=pa.int64())
def events_rolling(sf_dir: str) -> "ray.data.Dataset":
    """Sliding-window operator (lag + rolling aggregate): per user, events
    ordered by (ts, event_id); each event gets the µs gap to the user's
    previous event (-1 for the first) and the rolling sum of the last
    ``ROLL_WINDOW`` values. The per-key shuffle is ``groupby(user_id)``;
    inside a group everything is numpy (lexsort + cumsum-difference), and
    values sum as exact integer milli units so Ray and the SQL window
    frame (ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) agree bit-for-bit.

    Scale note: one group = one user's events, which is the natural
    window-partition bound; a pathological single hot key would need
    range-splitting by time plus a carry of ROLL_WINDOW-1 edge rows — not
    required for user-keyed streams."""

    def roll(group: pa.Table) -> pa.Table:
        ts = group.column("ts").to_numpy(zero_copy_only=False)
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        val = group.column("value").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        ts, eid, val = ts[order], eid[order], val[order]
        t_us = ts.astype("datetime64[us]").astype(np.int64)
        gaps = np.full(len(t_us), -1, np.int64)
        gaps[1:] = np.diff(t_us)
        vm = np.floor(val * 1000.0 + 0.5).astype(np.int64)
        cs = np.concatenate(([0], np.cumsum(vm)))
        lo = np.maximum(np.arange(len(vm)) - (ROLL_WINDOW - 1), 0)
        roll_sum = cs[1:] - cs[lo]
        uid = group.column("user_id")[0].as_py()
        return pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "user_id": pa.array(np.full(len(eid), uid, np.int64), pa.int64()),
                "prev_gap_us": pa.array(gaps, pa.int64()),
                "roll_sum_milli": pa.array(roll_sum, pa.int64()),
            }
        )

    return (
        _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
        .groupby("user_id")
        .map_groups(roll, batch_format="pyarrow")
    )


# --- Shipping-priority: distributed hash join (big ⨝ big) --------------------

Q3_SEGMENT = "BUILDING"
Q3_CUTOFF = "1998-06-01"
Q3_TOPN = 10


@empty_guard("customer", "orders", "lineitem", l_orderkey=pa.int64(), revenue_e4=pa.int64(), o_orderdate=pa.timestamp("us"), o_orderpriority=pa.string())
def shipping_priority(sf_dir: str) -> pa.Table:
    """TPC-H Q3-shaped top-N: revenue of not-yet-shipped lineitems for
    orders of one market segment. Exercises the co-partitioned distributed
    hash join (stages/join.py) — orders ⨝ lineitem where NEITHER side
    broadcasts — plus a broadcast semi-join for the small customer
    dimension and an exact integer revenue unit (l_extendedprice and
    l_discount carry 2 decimals, so revenue in 10⁻⁴ units is an exact
    int64 sum both here and in the SQL oracle; no float-ordering ties).
    """
    from ..stages.join import hash_join

    cutoff = np.datetime64(Q3_CUTOFF, "us")

    import pyarrow.parquet as pq

    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_mktsegment"],
    )
    seg_keys = np.unique(
        cust.filter(pc.equal(cust.column("c_mktsegment"), pa.scalar(Q3_SEGMENT)))
        .column("c_custkey")
        .to_numpy(zero_copy_only=False)
    )
    seg_ref = ray.put(seg_keys)

    def orders_side(batch: pa.Table) -> pa.Table:
        keys = ray.get(seg_ref)
        b = batch.filter(
            pc.less(
                batch.column("o_orderdate"),
                pa.scalar(cutoff, batch.column("o_orderdate").type),
            )
        )
        ck = b.column("o_custkey").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(keys, ck)
        hit = (pos < len(keys)) & (keys[np.minimum(pos, len(keys) - 1)] == ck)
        b = b.filter(pa.array(hit))
        return pa.table(
            {
                "o_orderkey": b.column("o_orderkey"),
                "o_orderdate": b.column("o_orderdate"),
                "o_orderpriority": b.column("o_orderpriority"),
            }
        )

    def lineitem_side(batch: pa.Table) -> pa.Table:
        b = batch.filter(
            pc.greater(
                batch.column("l_shipdate"),
                pa.scalar(cutoff, batch.column("l_shipdate").type),
            )
        )
        ext_c = np.floor(
            b.column("l_extendedprice").to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        disc_c = np.floor(
            b.column("l_discount").to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "l_orderkey": b.column("l_orderkey"),
                "revenue_e4": pa.array(ext_c * (100 - disc_c), pa.int64()),
            }
        )

    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"]
    ).map_batches(orders_side, batch_format="pyarrow")
    items = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"]
    ).map_batches(lineitem_side, batch_format="pyarrow")

    def bucket_topn(joined: pa.Table) -> pa.Table:
        """Per-bucket COMPLETE aggregate (an orderkey's joined rows live in
        exactly one bucket) + local top-N prune, so no second all-to-all:
        the driver only merges num_buckets × Q3_TOPN candidate rows."""
        g = joined.group_by(
            ["l_orderkey", "o_orderdate", "o_orderpriority"]
        ).aggregate([("revenue_e4", "sum")])
        rev = g.column("revenue_e4_sum").to_numpy(zero_copy_only=False)
        okey = g.column("l_orderkey").to_numpy(zero_copy_only=False)
        order = np.lexsort((okey, -rev))[:Q3_TOPN]
        t = g.take(pa.array(order, pa.int64()))
        return pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "o_orderdate": t.column("o_orderdate"),
                "o_orderpriority": t.column("o_orderpriority"),
                "revenue_e4": t.column("revenue_e4_sum"),
            }
        )

    top = hash_join(
        items,
        orders,
        left_on="l_orderkey",
        right_on="o_orderkey",
        left_schema=pa.schema(
            [("l_orderkey", pa.int64()), ("revenue_e4", pa.int64())]
        ),
        right_schema=pa.schema(
            [
                ("o_orderkey", pa.int64()),
                ("o_orderdate", pa.timestamp("us")),
                ("o_orderpriority", pa.string()),
            ]
        ),
        bucket_post=bucket_topn,
    )
    cand = collect_table(top)
    rev = cand.column("revenue_e4").to_numpy(zero_copy_only=False)
    okey = cand.column("l_orderkey").to_numpy(zero_copy_only=False)
    order = np.lexsort((okey, -rev))[:Q3_TOPN]
    tbl = cand.take(pa.array(order, pa.int64()))
    return pa.table(
        {
            "l_orderkey": pc.cast(tbl.column("l_orderkey"), pa.int64()),
            "revenue_e4": pc.cast(tbl.column("revenue_e4"), pa.int64()),
            "o_orderdate": pc.cast(tbl.column("o_orderdate"), pa.timestamp("us")),
            "o_orderpriority": tbl.column("o_orderpriority"),
        }
    )


# --- Banded interval (range) join --------------------------------------------

RANGE_WINDOW_DAYS = 3
RANGE_BAND_DAYS = 16  # band >> window so each order window spans <= 2 bands


@empty_guard("orders", o_orderkey=pa.int64(), n_shipped_3d=pa.int64(), sum_qty_milli_3d=pa.int64())
def order_shipments_window(sf_dir: str) -> "ray.data.Dataset":
    """Range join (non-equi, time-interval): for every order, count and
    sum the quantity of ALL lineitems shipped in (o_orderdate,
    o_orderdate + 3 days] — no key equality, pure interval containment.

    Ray Data lacks a range join, so this is the banded-shuffle custom
    operator: time is cut into fixed bands much wider than the probe
    window; each lineitem goes to exactly ONE band (its shipdate band),
    each order is replicated to every band its window overlaps (<= 2
    here), and a ``groupby(band)`` co-locates them. Inside a band the
    count is a sorted-array searchsorted difference, and per-band partial
    counts sum in a final narrow ``groupby(o_orderkey)`` — so partials
    from a window straddling a band edge combine exactly once. The
    partitioning assumption: window length <= band length (else the
    replication factor grows as ceil(window/band)+1).

    Quantities sum as exact integer milli units (l_quantity has <= 2
    decimals), so the SQL oracle matches bit-for-bit."""
    from ray.data.aggregate import Sum

    win_us = RANGE_WINDOW_DAYS * 86_400_000_000
    band_us = RANGE_BAND_DAYS * 86_400_000_000

    def orders_side(b: pa.Table) -> pa.Table:
        t = pc.cast(b.column("o_orderdate"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        okey = b.column("o_orderkey").to_numpy(zero_copy_only=False)
        lo_band = (t + 1) // band_us  # window is (t, t+win]: open left edge
        hi_band = (t + win_us) // band_us
        reps = (hi_band - lo_band + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(t), dtype=np.int64), reps)
        # band of each replicated row: lo_band[i] + offset within the run
        starts = np.repeat(np.cumsum(reps) - reps, reps)
        band = np.repeat(lo_band, reps) + (np.arange(reps.sum()) - starts)
        n = len(idx)
        return pa.table(
            {
                "band": pa.array(band, pa.int64()),
                "is_order": pa.array(np.ones(n, bool), pa.bool_()),
                "t_us": pa.array(t[idx], pa.int64()),
                "o_orderkey": pa.array(okey[idx], pa.int64()),
                "qty_milli": pa.array(np.zeros(n, np.int64), pa.int64()),
            }
        )

    def items_side(b: pa.Table) -> pa.Table:
        t = pc.cast(b.column("l_shipdate"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        qty = np.floor(
            b.column("l_quantity").to_numpy(zero_copy_only=False) * 1000.0 + 0.5
        ).astype(np.int64)
        n = len(t)
        return pa.table(
            {
                "band": pa.array(t // band_us, pa.int64()),
                "is_order": pa.array(np.zeros(n, bool), pa.bool_()),
                "t_us": pa.array(t, pa.int64()),
                "o_orderkey": pa.array(np.full(n, -1, np.int64), pa.int64()),
                "qty_milli": pa.array(qty, pa.int64()),
            }
        )

    def band_probe(group: pa.Table) -> pa.Table:
        is_o = group.column("is_order").to_numpy(zero_copy_only=False).astype(bool)
        t = group.column("t_us").to_numpy(zero_copy_only=False)
        band = group.column("band").to_numpy(zero_copy_only=False)
        okey = group.column("o_orderkey").to_numpy(zero_copy_only=False)
        qty = group.column("qty_milli").to_numpy(zero_copy_only=False)
        oi = np.flatnonzero(is_o)
        if len(oi) == 0:
            return pa.table(
                {
                    "o_orderkey": pa.array([], pa.int64()),
                    "n_shipped": pa.array([], pa.int64()),
                    "qty_milli": pa.array([], pa.int64()),
                }
            )
        li = np.flatnonzero(~is_o)
        st = t[li]
        order = np.argsort(st, kind="stable")
        st_sorted = st[order]
        qcs = np.concatenate(([0], np.cumsum(qty[li][order])))
        # clamp the probe window to THIS band so a straddling window
        # counts each band's items exactly once
        b0 = band[oi] * band_us
        b1 = b0 + band_us
        lo_t = np.maximum(t[oi], b0 - 1)  # (t, t+win] ∩ band
        hi_t = np.minimum(t[oi] + win_us, b1 - 1)
        lo = np.searchsorted(st_sorted, lo_t, side="right")
        hi = np.searchsorted(st_sorted, hi_t, side="right")
        return pa.table(
            {
                "o_orderkey": pa.array(okey[oi], pa.int64()),
                "n_shipped": pa.array((hi - lo).astype(np.int64), pa.int64()),
                "qty_milli": pa.array(qcs[hi] - qcs[lo], pa.int64()),
            }
        )

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"]).map_batches(
        orders_side, batch_format="pyarrow"
    )
    items = _read(sf_dir, "lineitem", ["l_shipdate", "l_quantity"]).map_batches(
        items_side, batch_format="pyarrow"
    )

    # Manual exchange instead of two sort AllToAlls: bands hash into a
    # fixed bucket grid (band_probe is already bucket-safe — each order's
    # probe window clamps to its own band, so items of OTHER bands that
    # share a bucket fall outside every searchsorted window), then the
    # per-band partials sum per order key via a second narrow exchange.
    from ..stages.util import bucket_exchange, exchange_sum_by_key

    nbk = 32

    def add_bucket(b: pa.Table) -> pa.Table:
        band = b.column("band").to_numpy(zero_copy_only=False)
        return b.append_column("bband", pa.array(band % nbk, pa.int64()))

    partials = bucket_exchange(
        orders.union(items)
        .map_batches(add_bucket, batch_format="pyarrow")
        .materialize(),
        "bband",
        nbk,
        band_probe,
    )

    def rename(b: pa.Table) -> pa.Table:
        return b.rename_columns(["o_orderkey", "n_shipped_3d", "sum_qty_milli_3d"])

    return exchange_sum_by_key(
        partials.map_batches(rename, batch_format="pyarrow"), "o_orderkey", nbk
    )


# --- Bloom-filter semi-join --------------------------------------------------

BLOOM_M = 65536  # bits
BLOOM_K = 2  # hash functions: mix32(key, BLOOM_SALT + i) % m
BLOOM_SALT = 5005
BLOOM_PRICE_CUT = 400000.0


@empty_guard("orders", "lineitem", l_returnflag=pa.string(), n_candidates=pa.int64(), n_matched=pa.int64(), sum_qty_milli=pa.int64())
def lineitem_bloom_semijoin(sf_dir: str) -> pa.Table:
    """Semi-join lineitem against high-value orders through a broadcast
    Bloom filter, the classic shuffle-avoidance pattern for big⋈small at
    100 TB: the big side never shuffles — a 2-hash / 64 Ki-bit filter
    (8 KiB packed; ~10 bits/key vs 8 bytes/key for the exact key set at
    10⁹ keys) rides to every task via ``ray.put`` and drops ~99% of
    non-matching rows before the exact verify. Here the exact verify is a
    sorted-key searchsorted against the same broadcast small side; on a
    bigger small side it would be the hash-partitioned join over the
    bloom survivors only.

    Output per return flag: rows passing the bloom (candidates, i.e.
    matches + false positives), exactly-matched rows, and their quantity
    sum — the candidate column makes the filter's false-positive behavior
    part of the driver-checked contract (the oracle replays bit
    construction and probes in SQL)."""
    from .sketch import mix32_batch

    def hi_keys(batch: pa.Table) -> pa.Table:
        mask = pc.greater(batch.column("o_totalprice"), pa.scalar(BLOOM_PRICE_CUT))
        return batch.filter(mask).select(["o_orderkey"])

    hi = collect_table(
        _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"]).map_batches(
            hi_keys, batch_format="pyarrow"
        )
    )
    keys = np.unique(hi.column("o_orderkey").to_numpy(zero_copy_only=False))
    bits = np.zeros(BLOOM_M, np.bool_)
    for i in range(BLOOM_K):
        bits[(mix32_batch(keys, BLOOM_SALT + i) % np.uint64(BLOOM_M)).astype(np.int64)] = True
    bits_ref = ray.put(bits)
    keys_ref = ray.put(keys)

    def probe(batch: pa.Table) -> pa.Table:
        b = ray.get(bits_ref)
        k = ray.get(keys_ref)
        ok = batch.column("l_orderkey").to_numpy(zero_copy_only=False)
        cand = np.ones(len(ok), np.bool_)
        for i in range(BLOOM_K):
            cand &= b[(mix32_batch(ok, BLOOM_SALT + i) % np.uint64(BLOOM_M)).astype(np.int64)]
        t = batch.filter(pa.array(cand))
        cok = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(k, cok)
        matched = (pos < len(k)) & (k[np.minimum(pos, len(k) - 1)] == cok)
        qty = t.column("l_quantity").to_numpy(zero_copy_only=False)
        part = pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "one": pa.array(np.ones(t.num_rows, np.int64), pa.int64()),
                "m": pa.array(matched.astype(np.int64), pa.int64()),
                "q": pa.array(np.where(matched, qty, 0.0), pa.float64()),
            }
        )
        g = part.group_by(["l_returnflag"]).aggregate(
            [("one", "sum"), ("m", "sum"), ("q", "sum")]
        )
        return pa.table(
            {
                "l_returnflag": g.column("l_returnflag"),
                "n_candidates": g.column("one_sum"),
                "n_matched": g.column("m_sum"),
                "q": g.column("q_sum"),
            }
        )

    # each probe batch emits ≤|returnflags| partial rows (3 here), so the
    # final combine is a driver-side group_by over a few hundred rows —
    # no AllToAll for a 3-key aggregate
    partials = collect_table(
        _read(sf_dir, "lineitem", ["l_orderkey", "l_returnflag", "l_quantity"])
        .map_batches(probe, batch_format="pyarrow")
    )
    g = partials.group_by(["l_returnflag"]).aggregate(
        [("n_candidates", "sum"), ("n_matched", "sum"), ("q", "sum")]
    )
    agg = pa.table(
        {
            "l_returnflag": g.column("l_returnflag"),
            "n_candidates": pc.cast(g.column("n_candidates_sum"), pa.int64()),
            "n_matched": pc.cast(g.column("n_matched_sum"), pa.int64()),
            "q": g.column("q_sum"),
        }
    )
    order = np.argsort(
        np.asarray(agg.column("l_returnflag").to_pylist(), dtype=object)
    )
    q = agg.column("q").to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "l_returnflag": pa.array(
                [agg.column("l_returnflag").to_pylist()[i] for i in order], pa.string()
            ),
            "n_candidates": pa.array(
                agg.column("n_candidates").to_numpy(zero_copy_only=False)[order],
                pa.int64(),
            ),
            "n_matched": pa.array(
                agg.column("n_matched").to_numpy(zero_copy_only=False)[order],
                pa.int64(),
            ),
            "sum_qty_milli": pa.array(
                np.floor(q[order] * 1000.0 + 0.5).astype(np.int64), pa.int64()
            ),
        }
    )


_FUNNEL_STAGES = ("view", "click", "purchase")
_FUNNEL_BUCKETS = 64


@empty_guard("events", stage=pa.int64(), n_users=pa.int64())
def events_funnel(sf_dir: str) -> pa.Table:
    """Conversion-funnel analysis (view → click → purchase): per user, the
    furthest stage reached with STRICTLY increasing timestamps between
    stages (t_click > first t_view, t_purchase > that t_click); output =
    users per furthest stage.

    Shape: one pruned streaming map keeps only funnel-stage rows as
    (user, stage-code, ts_us) ints; ONE manual hash exchange on
    user-hash; the per-bucket kernel is segmented numpy (reduceat mins
    per user, no per-event Python). Each bucket emits ≤3 histogram rows,
    so the final stage rollup is a driver-side sum over ≤3·buckets
    rows — no second shuffle."""

    def prep(batch: pa.Table) -> pa.Table:
        # dictionary-encode event_type against the 3 funnel stages in one
        # Arrow kernel — rows outside the funnel get null and drop
        code_all = pc.index_in(
            batch.column("event_type"), value_set=pa.array(_FUNNEL_STAGES)
        )
        b = batch.append_column("code", code_all).filter(
            pc.is_valid(code_all)
        )
        ts_us = (
            b.column("ts")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        uid = b.column("user_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": pa.array(uid, pa.int64()),
                "code": pc.cast(b.column("code"), pa.int64()),
                "ts_us": pa.array(ts_us, pa.int64()),
                "ubucket": pa.array(
                    (uid % _FUNNEL_BUCKETS).astype(np.int32), pa.int32()
                ),
            }
        )

    BIG = np.iinfo(np.int64).max

    def funnel(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return pa.table(
                {
                    "stage": pa.array([], pa.int64()),
                    "n_users": pa.array([], pa.int64()),
                }
            )
        uid = tbl.column("user_id").to_numpy(zero_copy_only=False)
        code = tbl.column("code").to_numpy(zero_copy_only=False)
        ts = tbl.column("ts_us").to_numpy(zero_copy_only=False)
        order = np.lexsort((ts, uid))
        u, c, t = uid[order], code[order], ts[order]
        seg = np.concatenate(([True], u[1:] != u[:-1]))
        starts = np.flatnonzero(seg)
        seg_id = np.cumsum(seg) - 1
        # stage 1: first view per user
        t1 = np.minimum.reduceat(np.where(c == 0, t, BIG), starts)
        # stage 2: first click strictly after t1
        m2 = (c == 1) & (t > t1[seg_id])
        t2 = np.minimum.reduceat(np.where(m2, t, BIG), starts)
        # stage 3: first purchase strictly after t2
        m3 = (c == 2) & (t > t2[seg_id])
        t3 = np.minimum.reduceat(np.where(m3, t, BIG), starts)
        stage = np.where(
            t1 == BIG, 0, np.where(t2 == BIG, 1, np.where(t3 == BIG, 2, 3))
        )
        out_stage, out_n = np.unique(stage[stage > 0], return_counts=True)
        return pa.table(
            {
                "stage": pa.array(out_stage.astype(np.int64), pa.int64()),
                "n_users": pa.array(out_n.astype(np.int64), pa.int64()),
            }
        )

    from ..stages.util import bucket_exchange
    from .corpus import collect_table

    per_bucket = collect_table(
        bucket_exchange(
            _read(sf_dir, "events", ["user_id", "event_type", "ts"])
            .map_batches(prep, batch_format="pyarrow")
            .materialize(),
            "ubucket",
            _FUNNEL_BUCKETS,
            funnel,
        )
    )
    # ≤3 rows per bucket: roll the histogram up driver-side
    st = per_bucket.column("stage").to_numpy(zero_copy_only=False)
    nu = per_bucket.column("n_users").to_numpy(zero_copy_only=False)
    stages = np.unique(st)
    return pa.table(
        {
            "stage": pa.array(stages, pa.int64()),
            "n_users": pa.array(
                [int(nu[st == s].sum()) for s in stages], pa.int64()
            ),
        }
    )


_ANTI_BUCKETS = 64


@empty_guard("orders", o_orderkey=pa.int64(), o_custkey=pa.int64())
def orders_no_returns(sf_dir: str) -> "ray.data.Dataset":
    """Distributed ANTI-join: orders with NO returned ('R') lineitem —
    the left-anti member of the join family (inner = shipping_priority's
    hash_join, semi = bloom_semijoin, as-of = events_orders_asof).

    Shape: both sides are pruned scans tagged with a side flag and an
    orderkey-hash bucket; ONE union + manual hash exchange co-locates an
    orderkey's rows; the per-bucket kernel is a sorted-array membership
    probe (np.isin over int64 keys) — neither side broadcasts, neither
    side is assumed small."""

    def orders_prep(batch: pa.Table) -> pa.Table:
        k = batch.column("o_orderkey").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "okey": pa.array(k, pa.int64()),
                "o_custkey": batch.column("o_custkey"),
                "side": pa.array(np.zeros(len(k), np.int8), pa.int8()),
                "jbucket": pa.array(
                    (k % _ANTI_BUCKETS).astype(np.int32), pa.int32()
                ),
            }
        )

    def rlines_prep(batch: pa.Table) -> pa.Table:
        mask = pc.equal(batch.column("l_returnflag"), "R")
        k = np.unique(
            batch.filter(mask).column("l_orderkey").to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                "okey": pa.array(k, pa.int64()),
                "o_custkey": pa.array(np.zeros(len(k), np.int64), pa.int64()),
                "side": pa.array(np.ones(len(k), np.int8), pa.int8()),
                "jbucket": pa.array(
                    (k % _ANTI_BUCKETS).astype(np.int32), pa.int32()
                ),
            }
        )

    def anti(tbl: pa.Table) -> pa.Table:
        side = tbl.column("side").to_numpy(zero_copy_only=False)
        keys = tbl.column("okey").to_numpy(zero_copy_only=False)
        probe = np.unique(keys[side == 1])
        left = side == 0
        keep = left & ~np.isin(keys, probe)
        out = tbl.filter(pa.array(keep))
        return pa.table(
            {
                "o_orderkey": out.column("okey"),
                "o_custkey": out.column("o_custkey"),
            }
        )

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).map_batches(
        orders_prep, batch_format="pyarrow"
    )
    rlines = _read(sf_dir, "lineitem", ["l_orderkey", "l_returnflag"]).map_batches(
        rlines_prep, batch_format="pyarrow"
    )
    from ..stages.util import bucket_exchange

    return bucket_exchange(
        orders.union(rlines).materialize(), "jbucket", _ANTI_BUCKETS, anti
    )


# ROLLUP emits its grand-total cell even over zero rows (SQL semantics)
@empty_guard(
    "lineitem",
    _rows=[
        {"l_returnflag": "ALL", "l_linestatus": "ALL", "sum_qty_milli": None, "n_rows": 0}
    ],
    l_returnflag=pa.string(),
    l_linestatus=pa.string(),
    sum_qty_milli=pa.int64(),
    n_rows=pa.int64(),
)
def pricing_rollup(sf_dir: str) -> pa.Table:
    """ROLLUP / grouping-sets aggregate: quantity and row counts at three
    levels — (returnflag, linestatus), (returnflag, ALL), (ALL, ALL) —
    with 'ALL' as the subtotal marker (hash-stable vs SQL NULLs).

    Scale shape: quantities quantize to exact milli ints in the map pass;
    ONE reduce merges the FINEST-grouping partials (6 rows per block — no
    AllToAll); coarser levels roll up from those few cells driver-side —
    the standard cube optimization (never re-scan per level)."""
    from ..stages.util import exchange_group_agg

    def prep(batch: pa.Table) -> pa.Table:
        q = batch.column("l_quantity").to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "l_linestatus": batch.column("l_linestatus"),
                "q_milli": pa.array(
                    np.floor(q * 1000.0 + 0.5).astype(np.int64), pa.int64()
                ),
            }
        )
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("q_milli", "sum"), ([], "count_all")]
        )
        return pa.table(
            {
                "l_returnflag": g.column("l_returnflag"),
                "l_linestatus": g.column("l_linestatus"),
                "sum_qty_milli": pc.cast(g.column("q_milli_sum"), pa.int64()),
                "n_rows": pc.cast(g.column("count_all"), pa.int64()),
            }
        )

    fine = collect_table(
        exchange_group_agg(
            _read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity"])
            .map_batches(prep, batch_format="pyarrow"),
            ["l_returnflag", "l_linestatus"],
            [("sum_qty_milli", "sum"), ("n_rows", "sum")],
            nbuck=1,
        )
    )
    flags = fine.column("l_returnflag").to_pylist()
    stats = fine.column("l_linestatus").to_pylist()
    qs = fine.column("sum_qty_milli").to_numpy(zero_copy_only=False)
    ns = fine.column("n_rows").to_numpy(zero_copy_only=False)
    rows = list(zip(flags, stats, qs.tolist(), ns.tolist()))
    # roll up: per-flag subtotals, then the grand total (cells, not rows)
    from collections import defaultdict

    sub = defaultdict(lambda: [0, 0])
    for f, _, q, c in rows:
        sub[f][0] += q
        sub[f][1] += c
    rows += [(f, "ALL", v[0], v[1]) for f, v in sub.items()]
    rows.append(("ALL", "ALL", int(qs.sum()), int(ns.sum())))
    return pa.table(
        {
            "l_returnflag": pa.array([r[0] for r in rows], pa.string()),
            "l_linestatus": pa.array([r[1] for r in rows], pa.string()),
            "sum_qty_milli": pa.array([r[2] for r in rows], pa.int64()),
            "n_rows": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


@empty_guard("events", prev_type=pa.string(), next_type=pa.string(), n_transitions=pa.int64())
def event_transitions(sf_dir: str) -> pa.Table:
    """Markov transition counts over the event stream: for each user, the
    (previous event_type → next event_type) bigram along (ts, event_id)
    order, counted corpus-wide — the session-behavior profile a funnel
    analysis starts from (the windowed custom operator family, SQL
    ``lag() OVER (PARTITION BY user ORDER BY ts)``).

    Scale shape: ONE manual hash exchange on user-hash co-locates each
    user's events (same route as events_sessions); the per-bucket kernel
    is one Arrow multi-key sort + vectorized same-user shift, emitting
    per-bucket PARTIAL (prev, next, n) counts — at most |types|² rows per
    bucket — merged by a width-1 exchange. No per-event Python, no
    driver-side state proportional to users."""
    import pyarrow.compute as pc

    from ..stages.util import bucket_exchange, exchange_group_agg

    nbuck = _ASOF_BUCKETS

    def add_bucket(b: pa.Table) -> pa.Table:
        k = b.column("user_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (k * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)
        return b.append_column(
            "tbucket",
            pa.array((h % np.uint64(nbuck)).astype(np.int64), pa.int64()),
        )

    def partial_counts(tbl: pa.Table) -> pa.Table:
        out_schema = pa.schema(
            [
                ("prev_type", pa.string()),
                ("next_type", pa.string()),
                ("n_transitions", pa.int64()),
            ]
        )
        if tbl.num_rows < 2:
            return out_schema.empty_table()
        s = tbl.sort_by(
            [
                ("user_id", "ascending"),
                ("ts", "ascending"),
                ("event_id", "ascending"),
            ]
        )
        u = s.column("user_id").to_numpy(zero_copy_only=False)
        enc = pc.dictionary_encode(s.column("event_type").combine_chunks())
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ntypes = len(enc.dictionary)
        same = u[1:] == u[:-1]
        pair = codes[:-1][same] * ntypes + codes[1:][same]
        if not len(pair):
            return out_schema.empty_table()
        cnt = np.bincount(pair, minlength=ntypes * ntypes)
        nz = np.flatnonzero(cnt)
        dic = enc.dictionary
        return pa.table(
            {
                "prev_type": dic.take(pa.array(nz // ntypes, pa.int64())),
                "next_type": dic.take(pa.array(nz % ntypes, pa.int64())),
                "n_transitions": pa.array(cnt[nz], pa.int64()),
            }
        )

    per_bucket = bucket_exchange(
        _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
        .map_batches(add_bucket, batch_format="pyarrow")
        .materialize(),
        "tbucket",
        nbuck,
        partial_counts,
    )
    merged = exchange_group_agg(
        per_bucket, ["prev_type", "next_type"], [("n_transitions", "sum")], nbuck=1
    )
    return collect_table(merged)


EVENT_TYPES = ("click", "view", "purchase", "signup", "error")


@empty_guard(
    "events",
    user_id=pa.int64(),
    n_events=pa.int64(),
    n_click=pa.int64(),
    n_view=pa.int64(),
    n_purchase=pa.int64(),
    n_signup=pa.int64(),
    n_error=pa.int64(),
    purchase_value_c=pa.int64(),
)
def events_pivot(sf_dir: str) -> "ray.data.Dataset":
    """Pivot: per-user event counts widened to one column per event type
    plus purchase value in exact cents (the classic long->wide reshape
    Ray Data has no native operator for). Each type's indicator is a
    vectorized Arrow mask; a batch-local group_by collapses the batch to
    one partial row per user seen in it, and ONE integer-keyed exchange
    sums the partials — the wire carries (users-per-batch) x 8 ints, no
    sort AllToAll, nothing driver-side. The cents column uses the shared
    floor(x*100 + 0.5) fixed-point expression so the oracle's SUM is
    bit-identical."""

    def prep(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type")
        # fill_null(0.0): a NULL value must contribute 0 to the sum, like
        # the oracle's NULL-skipping SUM ... FILTER — without it NaN*100
        # floors to INT64_MIN garbage.
        vals = pc.fill_null(pc.cast(batch.column("value"), pa.float64()), 0.0)
        cents = np.floor(
            np.asarray(vals, dtype=np.float64) * 100.0 + 0.5
        ).astype(np.int64)
        cols = {"user_id": batch.column("user_id")}
        for t in EVENT_TYPES:
            cols[f"is_{t}"] = pc.cast(pc.equal(et, pa.scalar(t)), pa.int64())
        is_purchase = np.asarray(cols["is_purchase"], dtype=np.int64)
        cols["purchase_value_c"] = pa.array(cents * is_purchase, pa.int64())
        t = pa.table(cols)
        return _partial(
            t,
            ["user_id"],
            [(f"is_{ty}", f"n_{ty}") for ty in EVENT_TYPES]
            + [("purchase_value_c", "purchase_value_c")],
            "n_events",
        )

    from ..stages.util import exchange_sum_by_key

    return exchange_sum_by_key(
        _read(sf_dir, "events", ["user_id", "event_type", "value"]).map_batches(
            prep, batch_format="pyarrow"
        ),
        "user_id",
        nbuck=4,
    )
