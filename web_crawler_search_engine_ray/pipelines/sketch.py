"""Sampling & sketch operators: deterministic hash sampling, exact
distributed percentiles via bounded-domain histograms, grouped top-k with
map-side pruning, and a HyperLogLog approximate-distinct sketch.

These are the scale-side primitives a 100 TB training-data pipeline leans
on when exact global answers are too expensive:

- ``sample_lineitem``: Bernoulli sampling keyed on a deterministic 32-bit
  integer mix (LCG multipliers + xor-shift avalanche) — a pure streaming
  filter with ZERO shuffles; the same row set comes back on every run and
  on any cluster size, which is what makes sampled pipelines resumable.
- ``value_percentiles``: exact discrete percentiles computed from a
  fixed-point histogram. The shuffle carries only (group, quantized-value)
  partial counts — histogram cardinality, not row count — and the final
  quantile selection runs over the collected (small) histogram. At 100 TB
  the quantization step is the knob: coarser buckets bound histogram size,
  and a second pass over one bucket refines to exact if needed.
- ``supplier_topk``: top-k per group with batch-local top-k pruning before
  the shuffle, so the groupby moves at most k rows per (group, batch)
  instead of the full table.
- ``distinct_users_hll``: HyperLogLog registers (m=64) built as max-rho
  partials inside map_batches — the shuffle carries <= groups x 64 x
  batches tiny rows, and registers merge associatively (the property that
  makes the sketch work on any partitioning). The exact count runs
  alongside for comparison via a distinct-pair shuffle.

All four have DuckDB oracles replaying the identical integer/bit
arithmetic (see __ray_entry__.py), so the driver hash-checks them.
No counterpart in the reference (SURVEY.md §2.8 beyond-reference family);
the HLL construction follows Flajolet et al. 2007.
"""

from __future__ import annotations

import math
import os
from typing import List

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..functions.hashing import mix32_batch
from .corpus import collect_table

__all__ = [
    "mix32_batch",
    "sample_lineitem",
    "stratified_sample_events",
    "value_percentiles",
    "supplier_topk",
    "distinct_users_hll",
    "heavy_hitters_cms",
]

SAMPLE_MOD = 100
SAMPLE_KEEP = 10  # keep h % 100 < 10 -> 10% deterministic sample
HLL_M = 64  # registers (6-bit index); 26-bit rank word
HLL_SALT = 911


def _read(sf_dir: str, table: str, columns: List[str]) -> "ray.data.Dataset":
    return ray.data.read_parquet(
        os.path.join(sf_dir, f"{table}.parquet"), columns=columns
    )


# --- deterministic Bernoulli sample -----------------------------------------


def sample_lineitem(sf_dir: str) -> "ray.data.Dataset":
    """~10% deterministic sample of lineitem keyed on (orderkey, linenumber).

    Streaming filter, no shuffle, no materialization: the sample decision
    is a pure function of the row key, so re-runs (and resumed runs) pick
    the exact same rows on any cluster size."""

    def keep(batch: pa.Table) -> pa.Table:
        h = mix32_batch(
            batch.column("l_orderkey").to_numpy(zero_copy_only=False),
            batch.column("l_linenumber").to_numpy(zero_copy_only=False),
        )
        mask = (h % np.uint64(SAMPLE_MOD)) < np.uint64(SAMPLE_KEEP)
        return batch.filter(pa.array(mask))

    return _read(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"],
    ).map_batches(keep, batch_format="pyarrow")


STRATA_KEEP = {"purchase": 50, "error": 100}  # percent kept per stratum
STRATA_DEFAULT_KEEP = 5
STRATA_SALT = 424242


def stratified_sample_events(sf_dir: str) -> "ray.data.Dataset":
    """Stratified deterministic sample of events: rare/valuable strata
    (purchases, errors) keep a high rate, the bulk keeps 5%. Same
    zero-shuffle streaming-filter shape as sample_lineitem — the
    stratum only changes the keep threshold, so skewed strata never
    route through a shuffle."""

    def keep(batch: pa.Table) -> pa.Table:
        h = mix32_batch(
            batch.column("event_id").to_numpy(zero_copy_only=False), STRATA_SALT
        )
        et = batch.column("event_type").to_pylist()
        thresh = np.fromiter(
            (STRATA_KEEP.get(t, STRATA_DEFAULT_KEEP) for t in et),
            dtype=np.uint64,
            count=len(et),
        )
        return batch.filter(pa.array((h % np.uint64(100)) < thresh))

    return _read(
        sf_dir, "events", ["event_id", "event_type", "user_id", "value"]
    ).map_batches(keep, batch_format="pyarrow")


# --- exact percentiles from a fixed-point histogram -------------------------

_QUANTILES = ((1, 2, "p50_milli"), (9, 10, "p90_milli"), (99, 100, "p99_milli"))


def value_percentiles(sf_dir: str) -> pa.Table:
    """Exact discrete p50/p90/p99 of events.value per event_type.

    Values quantize to milli fixed-point; map_batches emits per-batch
    (event_type, v_milli) partial counts so the shuffle carries histogram
    cardinality, not rows. Quantile = smallest v with cumulative count >=
    ceil(q*n), all in integer arithmetic (identical to the SQL oracle)."""

    def hist_partial(batch: pa.Table) -> pa.Table:
        v = batch.column("value").to_numpy(zero_copy_only=False)
        v_milli = np.floor(v * 1000.0 + 0.5).astype(np.int64)
        t = pa.table(
            {
                "event_type": batch.column("event_type"),
                "v_milli": pa.array(v_milli, pa.int64()),
            }
        )
        g = t.group_by(["event_type", "v_milli"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "event_type": g.column("event_type"),
                "v_milli": g.column("v_milli"),
                "c": pc.cast(g.column("count_all"), pa.int64()),
            }
        )

    def add_bucket(batch: pa.Table) -> pa.Table:
        # int32 bucket of (type, value): the shuffle sorts 64 small
        # buckets instead of sort-aggregating a composite (string, int64)
        # key over every partial row (measured 14 s -> ~2 s at sf0.1)
        from ..functions.urls import hash64_batch

        h = hash64_batch(batch.column("event_type").to_pylist())
        v = batch.column("v_milli").to_numpy(zero_copy_only=False)
        b = ((h ^ v.astype(np.uint64)) % np.uint64(64)).astype(np.int32)
        return batch.append_column("hbucket", pa.array(b, pa.int32()))

    def combine(tbl: pa.Table) -> pa.Table:
        g = tbl.group_by(["event_type", "v_milli"]).aggregate([("c", "sum")])
        return pa.table(
            {
                "event_type": g.column("event_type"),
                "v_milli": g.column("v_milli"),
                "c": pc.cast(g.column("c_sum"), pa.int64()),
            }
        )

    hist = collect_table(
        _read(sf_dir, "events", ["event_type", "value"])
        .map_batches(hist_partial, batch_format="pyarrow")
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("hbucket")
        .map_groups(combine, batch_format="pyarrow")
    )

    types = hist.column("event_type").to_numpy(zero_copy_only=False)
    vals = hist.column("v_milli").to_numpy(zero_copy_only=False)
    cnts = hist.column("c").to_numpy(zero_copy_only=False)
    out = {
        "event_type": [],
        "n_events": [],
        "p50_milli": [],
        "p90_milli": [],
        "p99_milli": [],
    }
    for et in sorted(set(types.tolist())):
        sel = types == et
        order = np.argsort(vals[sel], kind="stable")
        v_sorted = vals[sel][order]
        cum = np.cumsum(cnts[sel][order])
        n = int(cum[-1])
        out["event_type"].append(et)
        out["n_events"].append(n)
        for num, den, col in _QUANTILES:
            target = (num * n + den - 1) // den  # ceil(q*n), integer math
            out[col].append(int(v_sorted[np.searchsorted(cum, target)]))
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "n_events": pa.array(out["n_events"], pa.int64()),
            "p50_milli": pa.array(out["p50_milli"], pa.int64()),
            "p90_milli": pa.array(out["p90_milli"], pa.int64()),
            "p99_milli": pa.array(out["p99_milli"], pa.int64()),
        }
    )


# --- grouped top-k with map-side pruning ------------------------------------

TOPK_K = 3


def _topk_rows(t: pa.Table, k: int, emit_rank: bool) -> pa.Table:
    """Rows with rank < k per l_suppkey, ordered by (price desc, orderkey,
    linenumber) — vectorized lexsort + grouped-rank via run starts."""
    supp = t.column("l_suppkey").to_numpy(zero_copy_only=False)
    okey = t.column("l_orderkey").to_numpy(zero_copy_only=False)
    lnum = t.column("l_linenumber").to_numpy(zero_copy_only=False)
    price = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
    if len(supp) == 0:
        cols = {
            "l_suppkey": pa.array([], pa.int64()),
            "l_orderkey": pa.array([], pa.int64()),
            "l_linenumber": pa.array([], pa.int32()),
            "l_extendedprice": pa.array([], pa.float64()),
        }
        if emit_rank:
            cols["rk"] = pa.array([], pa.int64())
        return pa.table(cols)
    order = np.lexsort((lnum, okey, -price, supp))
    s = supp[order]
    new = np.empty(len(s), dtype=bool)
    new[0] = True
    new[1:] = s[1:] != s[:-1]
    starts = np.flatnonzero(new)
    rank = np.arange(len(s)) - np.repeat(starts, np.diff(np.append(starts, len(s))))
    keep = order[rank < k]
    cols = {
        "l_suppkey": pa.array(supp[keep], pa.int64()),
        "l_orderkey": pa.array(okey[keep], pa.int64()),
        "l_linenumber": pa.array(lnum[keep].astype(np.int32), pa.int32()),
        "l_extendedprice": pa.array(price[keep], pa.float64()),
    }
    if emit_rank:
        cols["rk"] = pa.array(rank[rank < k] + 1, pa.int64())
    return pa.table(cols)


def supplier_topk(sf_dir: str) -> "ray.data.Dataset":
    """Top-3 lineitems by extended price per supplier (ties broken by
    (orderkey, linenumber) — the SQL row_number order). Batch-local top-k
    prunes to <= k rows per (supplier, batch) BEFORE the shuffle."""

    def partial(batch: pa.Table) -> pa.Table:
        return _topk_rows(batch, TOPK_K, emit_rank=False)

    def final(group: pa.Table) -> pa.Table:
        return _topk_rows(group, TOPK_K, emit_rank=True)

    return (
        _read(
            sf_dir,
            "lineitem",
            ["l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("l_suppkey")
        .map_groups(final, batch_format="pyarrow")
    )


# --- Count-Min sketch heavy hitters -----------------------------------------

CMS_D = 3  # hash rows
CMS_W = 256  # buckets per row
CMS_SALT = 7707  # row-d hash = mix32(key, CMS_SALT + d)
CMS_THRESHOLD = 620  # report keys whose CMS estimate >= threshold


def heavy_hitters_cms(sf_dir: str) -> pa.Table:
    """Count-Min-sketch heavy hitters over ``lineitem.l_suppkey``.

    Map side: per-batch exact (key, count) groupby, then each distinct key
    folds its batch count into d=3 hashed buckets, so the shuffle carries
    at most d*w = 768 (d, bucket) partial rows per batch — constant in BOTH
    row count and key cardinality. That constant-size property is what
    makes CMS the 100 TB heavy-hitter tool: an exact groupby shuffles one
    row per distinct key, a CMS always moves 768 counters. Estimate for a
    key = min over d of its bucket counts (Cormode & Muthukrishnan 2005);
    it only ever over-counts, so ``est >= threshold`` cannot miss a true
    heavy hitter. Exact counts ride alongside to expose the overestimate;
    the DuckDB oracle replays the identical bucket arithmetic via _mix_sql.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["l_suppkey"]).aggregate([([], "count_all")])
        keys = g.column("l_suppkey").to_numpy(zero_copy_only=False)
        cnt = pc.cast(g.column("count_all"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        ds, bs, cs = [], [], []
        for d in range(CMS_D):
            b = (mix32_batch(keys, CMS_SALT + d) % np.uint64(CMS_W)).astype(
                np.int64
            )
            order = np.argsort(b, kind="stable")
            bb, start = np.unique(b[order], return_index=True)
            ds.append(np.full(len(bb), d, np.int64))
            bs.append(bb)
            cs.append(np.add.reduceat(cnt[order], start))
        return pa.table(
            {
                "d": pa.array(np.concatenate(ds), pa.int64()),
                "b": pa.array(np.concatenate(bs), pa.int64()),
                "c": pa.array(np.concatenate(cs), pa.int64()),
            }
        )

    src = _read(sf_dir, "lineitem", ["l_suppkey"])
    sketch = collect_table(
        src.map_batches(partial, batch_format="pyarrow")
        .groupby(["d", "b"])
        .aggregate(Sum("c", alias_name="c"))
    )

    # exact per-key counts (the driver-gate comparison column; also the
    # distinct-key enumeration — at 100 TB you would instead probe the
    # sketch with a candidate set, e.g. the batch-local top keys)
    def exact_partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["l_suppkey"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "l_suppkey": g.column("l_suppkey"),
                "n_exact": pc.cast(g.column("count_all"), pa.int64()),
            }
        )

    exact = collect_table(
        src.map_batches(exact_partial, batch_format="pyarrow")
        .groupby("l_suppkey")
        .aggregate(Sum("n_exact", alias_name="n_exact"))
    )

    counts = np.zeros((CMS_D, CMS_W), np.int64)
    counts[
        sketch.column("d").to_numpy(zero_copy_only=False),
        sketch.column("b").to_numpy(zero_copy_only=False),
    ] = sketch.column("c").to_numpy(zero_copy_only=False)

    keys = exact.column("l_suppkey").to_numpy(zero_copy_only=False)
    n_exact = exact.column("n_exact").to_numpy(zero_copy_only=False)
    est = np.min(
        np.stack(
            [
                counts[
                    d, (mix32_batch(keys, CMS_SALT + d) % np.uint64(CMS_W)).astype(np.int64)
                ]
                for d in range(CMS_D)
            ]
        ),
        axis=0,
    )
    keep = est >= CMS_THRESHOLD
    order = np.argsort(keys[keep], kind="stable")
    return pa.table(
        {
            "l_suppkey": pa.array(keys[keep][order], pa.int64()),
            "n_exact": pa.array(n_exact[keep][order], pa.int64()),
            "n_cms": pa.array(est[keep][order], pa.int64()),
        }
    )


# --- HyperLogLog approximate distinct ---------------------------------------


def _hll_rho(h: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(register, rho) per hash: low 6 bits index, rho = 1 + leading zeros
    of the remaining 26-bit word (27 when the word is 0)."""
    reg = (h % np.uint64(HLL_M)).astype(np.int64)
    w = (h // np.uint64(HLL_M)).astype(np.int64)
    # bit length via frexp: for integer w>0, frexp exponent == floor(log2)+1
    _, exp = np.frexp(w.astype(np.float64))
    rho = np.where(w > 0, 27 - exp, 27).astype(np.int64)
    return reg, rho


def hll_estimate(s_scaled: int, n_zero_regs: int) -> int:
    """Flajolet HLL estimate from integer register state: s_scaled =
    sum(2^(27-rho_j)) over all m registers (empty register -> 2^27),
    computed identically (same double-op order) in the SQL oracle."""
    e = ((0.7213 / (1.0 + 1.079 / 64.0)) * 4096.0) * 134217728.0 / float(s_scaled)
    if n_zero_regs > 0 and e <= 160.0:  # 2.5 * m small-range correction
        e = 64.0 * math.log(64.0 / float(n_zero_regs))
    return int(math.floor(e + 0.5))


def distinct_users_hll(sf_dir: str) -> pa.Table:
    """Exact vs HyperLogLog distinct user_id per event_type.

    Registers build as map-side (event_type, reg) max-rho partials — the
    merge is an associative max, so the shuffle carries only tiny partial
    rows and the same code runs on any partitioning. Exact count ships
    batch-distinct pairs through a (event_type, user_id) shuffle."""
    from ray.data.aggregate import Max, Sum

    def reg_partial(batch: pa.Table) -> pa.Table:
        h = mix32_batch(
            batch.column("user_id").to_numpy(zero_copy_only=False), HLL_SALT
        )
        reg, rho = _hll_rho(h)
        t = pa.table(
            {
                "event_type": batch.column("event_type"),
                "reg": pa.array(reg, pa.int64()),
                "rho": pa.array(rho, pa.int64()),
            }
        )
        g = t.group_by(["event_type", "reg"]).aggregate([("rho", "max")])
        return pa.table(
            {
                "event_type": g.column("event_type"),
                "reg": g.column("reg"),
                "rho": g.column("rho_max"),
            }
        )

    regs = collect_table(
        _read(sf_dir, "events", ["event_type", "user_id"])
        .map_batches(reg_partial, batch_format="pyarrow")
        .groupby(["event_type", "reg"])
        .aggregate(Max("rho", alias_name="rho"))
    )

    def pair_partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["event_type", "user_id"]).aggregate([([], "count_all")])
        return g.select(["event_type", "user_id"]).append_column(
            "one", pa.array(np.ones(g.num_rows, np.int64), pa.int64())
        )

    pairs = (
        _read(sf_dir, "events", ["event_type", "user_id"])
        .map_batches(pair_partial, batch_format="pyarrow")
        .groupby(["event_type", "user_id"])
        .aggregate(Sum("one", alias_name="one"))
    )

    def count_partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["event_type"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "event_type": g.column("event_type"),
                "n_exact": pc.cast(g.column("count_all"), pa.int64()),
            }
        )

    exact = collect_table(
        pairs.map_batches(count_partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("n_exact", alias_name="n_exact"))
    )

    r_types = regs.column("event_type").to_numpy(zero_copy_only=False)
    r_rho = regs.column("rho").to_numpy(zero_copy_only=False)
    est: dict[str, int] = {}
    for et in sorted(set(r_types.tolist())):
        rho = r_rho[r_types == et]
        s_scaled = int((np.int64(1) << (27 - rho)).sum()) + (HLL_M - len(rho)) * (
            1 << 27
        )
        est[et] = hll_estimate(s_scaled, HLL_M - len(rho))

    e_types = exact.column("event_type").to_pylist()
    e_n = exact.column("n_exact").to_pylist()
    order = np.argsort(np.asarray(e_types, dtype=object))
    return pa.table(
        {
            "event_type": pa.array([e_types[i] for i in order], pa.string()),
            "n_exact": pa.array([int(e_n[i]) for i in order], pa.int64()),
            "n_hll": pa.array([est[e_types[i]] for i in order], pa.int64()),
        }
    )
