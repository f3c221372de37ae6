"""Relational pipelines over the TPC-H-ish testdata tables.

These exercise the engine's generic dataflow primitives (scan with column
pruning, vectorized Arrow expressions, multi-key groupby aggregation,
broadcast hash join, sort/limit, temporal bucketing) against DuckDB
oracles. Float sums are rounded only at the output edge (shared
``floor(x*K+0.5)`` fixed-point formula), and every ranking key is either
integral or separated by orders of magnitude more than float-sum error.
"""

from __future__ import annotations

import os
from typing import List

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .corpus import collect_table

PRICING_CUTOFF = "1998-09-02"


def _read(sf_dir: str, table: str, columns: List[str]) -> "ray.data.Dataset":
    return ray.data.read_parquet(
        os.path.join(sf_dir, f"{table}.parquet"), columns=columns
    )


def _round_col(arr: np.ndarray, scale: float) -> np.ndarray:
    return np.floor(arr * scale + 0.5) / scale


def pricing_summary(sf_dir: str) -> pa.Table:
    """TPC-H Q1-shaped pricing summary: filter on ship date, two-key
    groupby with four running sums + a count, rounded at the edge."""
    from ray.data.aggregate import Count, Sum

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
        return pa.table(
            {
                "l_returnflag": b.column("l_returnflag"),
                "l_linestatus": b.column("l_linestatus"),
                "l_quantity": b.column("l_quantity"),
                "l_extendedprice": ext,
                "disc_price": disc_price,
                "charge": charge,
            }
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
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Sum("l_extendedprice", alias_name="sum_base_price"),
            Sum("disc_price", alias_name="sum_disc_price"),
            Sum("charge", alias_name="sum_charge"),
            Count(alias_name="count_order"),
        )
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


def top_customers(sf_dir: str) -> pa.Table:
    """Top-10 customers by total order value: shuffle-aggregate the big
    side (orders) by custkey, then broadcast-join the small customer
    catalog (ray.put once) — no all-to-all join."""
    from ray.data.aggregate import Count, Sum

    revenue = (
        _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
        .groupby("o_custkey")
        .aggregate(
            Sum("o_totalprice", alias_name="revenue"),
            Count(alias_name="n_orders"),
        )
    )
    import pyarrow.parquet as pq

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

    def join_names(batch: pa.Table) -> pa.Table:
        lookup = ray.get(names_ref)
        keys = np.asarray(batch.column("o_custkey"), dtype=np.int64)
        return pa.table(
            {
                "c_custkey": pa.array(keys, pa.int64()),
                "c_name": pa.array([lookup.get(int(k), "") for k in keys], pa.string()),
                "revenue": batch.column("revenue"),
                "n_orders": pc.cast(batch.column("n_orders"), pa.int64()),
            }
        )

    top = (
        revenue.map_batches(join_names, batch_format="pyarrow")
        .sort(["revenue", "c_custkey"], descending=[True, False])
        .limit(10)
    )
    tbl = collect_table(top)
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


def events_hourly(sf_dir: str) -> pa.Table:
    """Tumbling-window (hourly) aggregate of the events stream table:
    temporal floor inside map_batches, then a two-key groupby."""
    from ray.data.aggregate import Count, Sum

    def bucket(batch: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(batch.column("ts"), unit="hour")
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "hour": hour,
                "value": batch.column("value"),
            }
        )

    agg = (
        _read(sf_dir, "events", ["ts", "event_type", "value"])
        .map_batches(bucket, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .aggregate(
            Count(alias_name="n_events"),
            Sum("value", alias_name="sum_value"),
        )
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


def events_user_stats(sf_dir: str) -> pa.Table:
    """Per-user event profile: conditional aggregation expressed as
    vectorized masks inside map_batches feeding partial sums."""
    from ray.data.aggregate import Sum

    def prep(batch: pa.Table) -> pa.Table:
        is_purchase = pc.cast(
            pc.equal(batch.column("event_type"), pa.scalar("purchase")), pa.int64()
        )
        is_error = pc.cast(
            pc.equal(batch.column("event_type"), pa.scalar("error")), pa.int64()
        )
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "one": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
                "is_purchase": is_purchase,
                "is_error": is_error,
                "value": batch.column("value"),
            }
        )

    agg = (
        _read(sf_dir, "events", ["user_id", "event_type", "value"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(
            Sum("one", alias_name="n_events"),
            Sum("is_purchase", alias_name="n_purchases"),
            Sum("is_error", alias_name="n_errors"),
            Sum("value", alias_name="sum_value"),
        )
    )
    tbl = collect_table(agg)
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


def brand_part_stats(sf_dir: str) -> pa.Table:
    """Part-catalog profile per brand: count, size sum, rounded average
    retail price computed as round(sum/count) so Ray and SQL divide the
    same two exact-ish numbers."""
    from ray.data.aggregate import Count, Sum

    agg = (
        _read(sf_dir, "part", ["p_brand", "p_size", "p_retailprice"])
        .groupby("p_brand")
        .aggregate(
            Count(alias_name="n_parts"),
            Sum("p_size", alias_name="sum_size"),
            Sum("p_retailprice", alias_name="sum_price"),
        )
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
