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

from ..stages.util import empty_guard
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


def _table_rows(sf_dir: str, table: str) -> int:
    """Row count from the parquet footer — free, known before any read."""
    import pyarrow.parquet as _pq

    return _pq.ParquetFile(
        os.path.join(sf_dir, f"{table}.parquet")
    ).metadata.num_rows


# --- deterministic Bernoulli sample -----------------------------------------


@empty_guard("lineitem", l_orderkey=pa.int64(), l_linenumber=pa.int32(), l_quantity=pa.float64(), l_extendedprice=pa.float64())
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


@empty_guard("events", event_id=pa.int64(), event_type=pa.string(), user_id=pa.int64(), value=pa.float64())
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


@empty_guard("events", event_type=pa.string(), n_events=pa.int64(), p50_milli=pa.int64(), p90_milli=pa.int64(), p99_milli=pa.int64())
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
        # int32 bucket of (type, value): the exchange moves 64 small
        # buckets instead of sort-aggregating a composite (string, int64)
        # key over every partial row (measured 14 s -> ~2 s at sf0.1).
        # Hash only the dictionary of uniques (~#event types), not rows.
        from ..functions.urls import hash64_batch

        enc = pc.dictionary_encode(
            batch.column("event_type").combine_chunks()
        )
        hu = hash64_batch(enc.dictionary.to_pylist())
        h = hu[enc.indices.to_numpy(zero_copy_only=False)]
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

    from ..stages.util import bucket_exchange

    hist = collect_table(
        bucket_exchange(
            _read(sf_dir, "events", ["event_type", "value"])
            .map_batches(hist_partial, batch_format="pyarrow")
            .map_batches(add_bucket, batch_format="pyarrow")
            .materialize(),
            "hbucket",
            64,
            combine,
        )
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


@empty_guard("lineitem", l_suppkey=pa.int64(), l_orderkey=pa.int64(), l_linenumber=pa.int32(), l_extendedprice=pa.float64(), rk=pa.int64())
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


@empty_guard("lineitem", l_suppkey=pa.int64(), n_exact=pa.int64(), n_cms=pa.int64())
def heavy_hitters_cms(sf_dir: str) -> pa.Table:
    """Count-Min-sketch heavy hitters over ``lineitem.l_suppkey``.

    Map side: per-batch exact (key, count) groupby, then each distinct key
    folds its batch count into d=3 hashed buckets, so the sketch partial
    is at most d*w = 768 (d, bucket) rows per batch — constant in BOTH
    row count and key cardinality. That constant-size property is what
    makes CMS the 100 TB heavy-hitter tool: an exact groupby shuffles one
    row per distinct key, a CMS always moves 768 counters. Estimate for a
    key = min over d of its bucket counts (Cormode & Muthukrishnan 2005);
    it only ever over-counts, so ``est >= threshold`` cannot miss a true
    heavy hitter. Exact counts ride alongside to expose the overestimate;
    the DuckDB oracle replays the identical bucket arithmetic via
    _mix_sql.

    ONE pass + ONE manual exchange: sketch partials (kind 0, routed by
    d*w+b) and exact per-key partials (kind 1, routed by key hash — at
    100 TB you would instead probe the sketch with a candidate set, e.g.
    batch-local top keys) share the shuffle; the reduce sums each group
    exactly because its rows are bucket-local.
    """
    from ..stages.util import bucket_exchange

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["l_suppkey"]).aggregate([([], "count_all")])
        keys = g.column("l_suppkey").to_numpy(zero_copy_only=False)
        cnt = pc.cast(g.column("count_all"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        ks, bs, cs, rk = [], [], [], []
        for d in range(CMS_D):
            b = (mix32_batch(keys, CMS_SALT + d) % np.uint64(CMS_W)).astype(
                np.int64
            )
            order = np.argsort(b, kind="stable")
            bb, start = np.unique(b[order], return_index=True)
            ks.append(np.full(len(bb), d, np.int64))
            bs.append(bb)
            cs.append(np.add.reduceat(cnt[order], start))
            rk.append(d * CMS_W + bb)
        n0 = sum(len(x) for x in ks)
        return pa.table(
            {
                "kind": pa.array(
                    np.concatenate(
                        [np.zeros(n0, np.int8), np.ones(len(keys), np.int8)]
                    ),
                    pa.int8(),
                ),
                "k1": pa.array(
                    np.concatenate(ks + [keys.astype(np.int64)]), pa.int64()
                ),
                "k2": pa.array(
                    np.concatenate(bs + [np.zeros(len(keys), np.int64)]),
                    pa.int64(),
                ),
                "c": pa.array(np.concatenate(cs + [cnt]), pa.int64()),
                "bucket": pa.array(
                    np.concatenate(
                        rk + [mix32_batch(keys, CMS_SALT + 7).astype(np.int64)]
                    )
                    % nbuck,
                    pa.int64(),
                ),
            }
        )

    # exchange width from the parquet footer row count — no extra pass
    nbuck = int(
        max(1, min(64, _table_rows(sf_dir, "lineitem") // 250_000 + 1))
    )
    mat = (
        _read(sf_dir, "lineitem", ["l_suppkey"])
        .map_batches(partial, batch_format="pyarrow")
        .materialize()
    )

    def reduce(tbl: pa.Table) -> pa.Table:
        kind = tbl.column("kind").to_numpy(zero_copy_only=False)
        k1 = tbl.column("k1").to_numpy(zero_copy_only=False)
        k2 = tbl.column("k2").to_numpy(zero_copy_only=False)
        c = tbl.column("c").to_numpy(zero_copy_only=False)
        okind, ok1, ok2, oc = [], [], [], []
        for kk in (0, 1):
            m = kind == kk
            if not m.any():
                continue
            a, b, v = k1[m], k2[m], c[m]
            order = np.lexsort((b, a))
            a, b, v = a[order], b[order], v[order]
            first = np.concatenate(([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])))
            start = np.flatnonzero(first)
            okind.append(np.full(len(start), kk, np.int8))
            ok1.append(a[first])
            ok2.append(b[first])
            oc.append(np.add.reduceat(v, start))
        if not okind:
            return pa.table(
                {
                    "kind": pa.array([], pa.int8()),
                    "k1": pa.array([], pa.int64()),
                    "k2": pa.array([], pa.int64()),
                    "c": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "kind": pa.array(np.concatenate(okind), pa.int8()),
                "k1": pa.array(np.concatenate(ok1), pa.int64()),
                "k2": pa.array(np.concatenate(ok2), pa.int64()),
                "c": pa.array(np.concatenate(oc), pa.int64()),
            }
        )

    merged = collect_table(bucket_exchange(mat, "bucket", nbuck, reduce))

    kind = merged.column("kind").to_numpy(zero_copy_only=False)
    k1 = merged.column("k1").to_numpy(zero_copy_only=False)
    k2 = merged.column("k2").to_numpy(zero_copy_only=False)
    c = merged.column("c").to_numpy(zero_copy_only=False)
    sk = kind == 0
    counts = np.zeros((CMS_D, CMS_W), np.int64)
    counts[k1[sk], k2[sk]] = c[sk]

    ex = kind == 1
    keys = k1[ex]
    n_exact = c[ex]
    est = np.min(
        np.stack(
            [
                counts[
                    d,
                    (mix32_batch(keys, CMS_SALT + d) % np.uint64(CMS_W)).astype(
                        np.int64
                    ),
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


@empty_guard("events", event_type=pa.string(), n_exact=pa.int64(), n_hll=pa.int64())
def distinct_users_hll(sf_dir: str) -> pa.Table:
    """Exact vs HyperLogLog distinct user_id per event_type.

    ONE pass + ONE manual exchange: each batch emits both its register
    partials ((event_type, reg) max-rho rows — associative merge, so the
    exchange carries tiny partials regardless of partitioning) and its
    distinct (event_type, user) rows, tagged by kind. Routing key: reg
    for register rows, user hash for distinct rows — each guarantees its
    group is bucket-local, so the reduce task finishes its merge exactly
    (max per register / distinct-count per event_type) and the driver
    collects only final registers + per-bucket count partials. (The
    former two-branch groupby chain paid four Dataset executions and two
    sort AllToAlls on data this narrow.)"""
    from ..stages.util import bucket_exchange

    def partial(batch: pa.Table) -> pa.Table:
        et = np.asarray(batch.column("event_type"))
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        h = mix32_batch(uid, HLL_SALT)
        reg, rho = _hll_rho(h)
        # register partials: block-local (et, reg) max rho
        order = np.lexsort((-rho, reg, et))
        e2, r2, o2 = et[order], reg[order], rho[order]
        first = (
            np.concatenate(([True], (e2[1:] != e2[:-1]) | (r2[1:] != r2[:-1])))
            if len(e2)
            else np.empty(0, bool)
        )
        # distinct (et, user) partial rows
        order_u = np.lexsort((uid, et))
        eu, uu = et[order_u], uid[order_u]
        uf = (
            np.concatenate(([True], (eu[1:] != eu[:-1]) | (uu[1:] != uu[:-1])))
            if len(eu)
            else np.empty(0, bool)
        )
        n0, n1 = int(first.sum()), int(uf.sum())
        ub = mix32_batch(uu[uf], HLL_SALT + 1).astype(np.int64)
        rkey = np.concatenate([r2[first].astype(np.int64), ub]) % nbuck
        return pa.table(
            {
                "kind": pa.array(
                    np.concatenate([np.zeros(n0, np.int8), np.ones(n1, np.int8)]),
                    pa.int8(),
                ),
                "et": pa.array(
                    np.concatenate([e2[first], eu[uf]]).astype(object), pa.string()
                ),
                "k": pa.array(
                    np.concatenate([r2[first], uu[uf]]).astype(np.int64),
                    pa.int64(),
                ),
                "v": pa.array(
                    np.concatenate([o2[first], np.ones(n1, np.int64)]), pa.int64()
                ),
                "bucket": pa.array(rkey, pa.int64()),
            }
        )

    # exchange width from the parquet footer row count — no extra pass
    nbuck = int(max(1, min(64, _table_rows(sf_dir, "events") // 250_000 + 1)))
    mat = (
        _read(sf_dir, "events", ["event_type", "user_id"])
        .map_batches(partial, batch_format="pyarrow")
        .materialize()
    )

    def reduce(tbl: pa.Table) -> pa.Table:
        kind = tbl.column("kind").to_numpy(zero_copy_only=False)
        et = np.asarray(tbl.column("et"))
        k = tbl.column("k").to_numpy(zero_copy_only=False)
        v = tbl.column("v").to_numpy(zero_copy_only=False)
        out_kind, out_et, out_k, out_v = [], [], [], []
        r = kind == 0
        if r.any():
            e2, k2, v2 = et[r], k[r], v[r]
            order = np.lexsort((-v2, k2, e2))
            e2, k2, v2 = e2[order], k2[order], v2[order]
            first = np.concatenate(
                ([True], (e2[1:] != e2[:-1]) | (k2[1:] != k2[:-1]))
            )
            out_kind.append(np.zeros(int(first.sum()), np.int8))
            out_et.append(e2[first])
            out_k.append(k2[first])
            out_v.append(v2[first])
        u = kind == 1
        if u.any():
            e2, k2 = et[u], k[u]
            order = np.lexsort((k2, e2))
            e2, k2 = e2[order], k2[order]
            first = np.concatenate(
                ([True], (e2[1:] != e2[:-1]) | (k2[1:] != k2[:-1]))
            )
            ue, cnt = np.unique(e2[first], return_counts=True)
            out_kind.append(np.ones(len(ue), np.int8))
            out_et.append(ue)
            out_k.append(np.zeros(len(ue), np.int64))
            out_v.append(cnt.astype(np.int64))
        if not out_kind:
            return pa.table(
                {
                    "kind": pa.array([], pa.int8()),
                    "et": pa.array([], pa.string()),
                    "k": pa.array([], pa.int64()),
                    "v": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "kind": pa.array(np.concatenate(out_kind), pa.int8()),
                "et": pa.array(
                    np.concatenate(out_et).astype(object), pa.string()
                ),
                "k": pa.array(np.concatenate(out_k), pa.int64()),
                "v": pa.array(np.concatenate(out_v), pa.int64()),
            }
        )

    merged = collect_table(bucket_exchange(mat, "bucket", nbuck, reduce))

    kind = merged.column("kind").to_numpy(zero_copy_only=False)
    m_et = np.asarray(merged.column("et"))
    m_k = merged.column("k").to_numpy(zero_copy_only=False)
    m_v = merged.column("v").to_numpy(zero_copy_only=False)
    # registers: global max per (et, reg) is exact — each (et, reg) lives
    # in exactly one bucket, so the reduce rows are final
    r = kind == 0
    est: dict[str, int] = {}
    for e in sorted(set(m_et[r].tolist())):
        rho = m_v[r][m_et[r] == e]
        s_scaled = int((np.int64(1) << (27 - rho)).sum()) + (HLL_M - len(rho)) * (
            1 << 27
        )
        est[e] = hll_estimate(s_scaled, HLL_M - len(rho))
    # exact: per-bucket partial counts sum per event_type
    u = kind == 1
    ue, inv = np.unique(m_et[u], return_inverse=True)
    n_ex = np.bincount(inv, weights=m_v[u].astype(np.float64)).astype(np.int64)
    return pa.table(
        {
            "event_type": pa.array(list(ue), pa.string()),
            "n_exact": pa.array(n_ex, pa.int64()),
            "n_hll": pa.array([est[e] for e in ue], pa.int64()),
        }
    )
