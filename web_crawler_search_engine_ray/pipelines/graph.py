"""Distributed link-graph analytics over the crawl's URL graph.

The reference crawler treats every frontier URL as equally urgent (FIFO
queue, `web_crawler/crawler/frontier.py:20`); at 10^10-frontier scale a
crawler must PRIORITIZE — the standard signal is link-graph PageRank over
the pages crawled so far.  This module implements PageRank as a
Ray-Data-native power iteration:

- the graph lives as distributed ``(src, dst, outdeg)`` edge buckets,
  partitioned by ``src % B`` exactly once — never on the driver, never
  re-shuffled;
- one iteration = B send tasks (rank[src] attached to the bucket's edges
  by a sorted searchsorted — ranks share the same ``% B`` partition)
  emitting per-dst-bucket contribution slices point-to-point, then B sum
  tasks (bincount per node) — the minimum traffic a power iteration
  admits, with raw-task latency instead of Dataset AllToAll latency;
- arithmetic is FIXED-POINT int64 (ranks scaled by 10^12, per-edge
  contribution ``(85 * rank) // (100 * outdeg)``, floor division), so the
  result is bit-identical on any cluster size / block layout AND exactly
  replayable by the DuckDB oracle's integer arithmetic — no float
  summation-order hazard;
- the driver never sees per-node state, only the final (query-result)
  table.

Dangling nodes (outdeg 0) contribute nothing — their mass leaks, the
plain power-iteration convention; documented here because the oracle
replays exactly that.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..stages.util import empty_guard
from .corpus import _PAIR_BUCKETS, collect_table

# fixed-point scale for ranks: 10^12 keeps 85*rank well inside int64 even
# if all mass concentrates on one node (85 * 10^12 << 2^63)
PR_SCALE = 10**12
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100  # damping 0.85 as an exact ratio
PR_ITERS = 3  # fixed unrolled depth — keeps the SQL oracle finite


@ray.remote
def _pr_part_edges(tbl: pa.Table, nbuck: int):
    """Map side of the one-time edge partition: route rows to
    ``src % nbuck`` slices (modulo, not hash — srcs are dense doc ids and
    the rank tables are partitioned by the same rule)."""
    if nbuck == 1:
        return tbl  # num_returns=1: Ray expects the bare value
    s = tbl.column("src").to_numpy(zero_copy_only=False)
    b = (s % nbuck).astype(np.int64)
    order = np.argsort(b, kind="stable")
    t = tbl.take(pa.array(order, pa.int64()))
    bounds = np.searchsorted(b[order], np.arange(nbuck + 1))
    return tuple(
        t.slice(int(bounds[i]), int(bounds[i + 1] - bounds[i]))
        for i in range(nbuck)
    )


@ray.remote
def _pr_part_nodes(tbl: pa.Table, nbuck: int):
    if nbuck == 1:
        return tbl  # num_returns=1: Ray expects the bare value
    n = tbl.column("node").to_numpy(zero_copy_only=False)
    b = (n % nbuck).astype(np.int64)
    order = np.argsort(b, kind="stable")
    ns = n[order]
    bounds = np.searchsorted(b[order], np.arange(nbuck + 1))
    return tuple(
        pa.table(
            {
                "node": pa.array(
                    ns[int(bounds[i]) : int(bounds[i + 1])], pa.int64()
                )
            }
        )
        for i in range(nbuck)
    )


@ray.remote
def _pr_build_bucket(*parts: pa.Table) -> pa.Table:
    """Reduce side of the edge partition: dedup (src, dst) and attach
    outdeg — global per src because every row of a src lands here."""
    tables = [p for p in parts if p.num_rows]
    if not tables:
        return pa.table(
            {
                "src": pa.array([], pa.int64()),
                "dst": pa.array([], pa.int64()),
                "outdeg": pa.array([], pa.int64()),
            }
        )
    t = pa.concat_tables(tables)
    src = t.column("src").to_numpy(zero_copy_only=False)
    dst = t.column("dst").to_numpy(zero_copy_only=False)
    order = np.lexsort((dst, src))
    s, d = src[order], dst[order]
    m = np.concatenate(([True], (s[1:] != s[:-1]) | (d[1:] != d[:-1])))
    s, d = s[m], d[m]
    uniq, counts = np.unique(s, return_counts=True)
    deg = np.repeat(counts, counts)
    return pa.table(
        {
            "src": pa.array(s, pa.int64()),
            "dst": pa.array(d, pa.int64()),
            "outdeg": pa.array(deg.astype(np.int64), pa.int64()),
        }
    )


@ray.remote
def _pr_node_union(*parts: pa.Table) -> pa.Table:
    arrs = [
        p.column("node").to_numpy(zero_copy_only=False)
        for p in parts
        if p.num_rows
    ]
    u = np.unique(np.concatenate(arrs)) if arrs else np.empty(0, np.int64)
    return pa.table({"node": pa.array(u, pa.int64())})


@ray.remote
def _pr_send(edges: pa.Table, ranks: pa.Table, nbuck: int):
    """One iteration, one src-bucket: join rank[src] onto the bucket's
    edges (sorted searchsorted — ranks and edges share the src % nbuck
    partition), emit per-dst-bucket contribution slices."""
    s = edges.column("src").to_numpy(zero_copy_only=False)
    if not len(s):
        empty = pa.table(
            {"node": pa.array([], pa.int64()), "val": pa.array([], pa.int64())}
        )
        return tuple(empty for _ in range(nbuck)) if nbuck > 1 else empty
    d = edges.column("dst").to_numpy(zero_copy_only=False)
    deg = edges.column("outdeg").to_numpy(zero_copy_only=False)
    rk = ranks.column("node").to_numpy(zero_copy_only=False)
    rv = ranks.column("rank_fp").to_numpy(zero_copy_only=False)
    pos = np.searchsorted(rk, s)  # every src has a rank row in its bucket
    contrib = (PR_DAMP_NUM * rv[pos]) // (PR_DAMP_DEN * deg)
    b = (d % nbuck).astype(np.int64)
    order = np.argsort(b, kind="stable")
    d2, c2 = d[order], contrib[order]
    bounds = np.searchsorted(b[order], np.arange(nbuck + 1))
    out = tuple(
        pa.table(
            {
                "node": pa.array(
                    d2[int(bounds[i]) : int(bounds[i + 1])], pa.int64()
                ),
                "val": pa.array(
                    c2[int(bounds[i]) : int(bounds[i + 1])], pa.int64()
                ),
            }
        )
        for i in range(nbuck)
    )
    return out if nbuck > 1 else out[0]


@ray.remote
def _pr_sum(node_tbl: pa.Table, base: int, *contribs: pa.Table) -> pa.Table:
    """One iteration, one node-bucket: rank = base + Σ contributions."""
    nodes = node_tbl.column("node").to_numpy(zero_copy_only=False)  # sorted
    acc = np.zeros(len(nodes), np.float64)  # exact: |Σ| ≤ PR_SCALE < 2^53
    for c in contribs:
        if not c.num_rows:
            continue
        idx = np.searchsorted(
            nodes, c.column("node").to_numpy(zero_copy_only=False)
        )
        acc += np.bincount(
            idx,
            weights=c.column("val").to_numpy(zero_copy_only=False),
            minlength=len(nodes),
        )
    return pa.table(
        {
            "node": pa.array(nodes, pa.int64()),
            "rank_fp": pa.array(acc.astype(np.int64) + base, pa.int64()),
        }
    )


def pagerank(
    edges: "ray.data.Dataset",
    iters: int = PR_ITERS,
    nodes: Optional["ray.data.Dataset"] = None,
    n_edges_hint: Optional[int] = None,
) -> pa.Table:
    """Fixed-point PageRank over an ``(src, dst)`` int64 edge Dataset,
    Pregel-style over raw exchange tasks:

    - the edge set is partitioned by ``src % B`` ONCE (dedup + outdeg in
      the same reduce); it never moves again — per iteration only the
      contribution messages travel, point-to-point (B send tasks × B
      return slices → B sum tasks), the minimum traffic a power
      iteration admits. The former Dataset-op loop re-shipped every edge
      through two AllToAlls per iteration and paid ~1 s of executor
      latency per op — dominating wall time on query-scale graphs.
    - ranks stay co-partitioned with edges (same ``% B`` rule), so the
      rank[src] join is a sorted searchsorted inside the bucket.

    ``nodes`` (a single ``node`` int64 column) may be passed when the
    caller already knows the vertex set — skips a distinct-union
    exchange; default derives it from the partitioned edge buckets.
    ``n_edges_hint`` (pre-dedup upper bound) sizes B without an extra
    count. Returns the final rank table ``(doc_id, rank_fp)`` sorted by
    doc_id (the query result itself — small per node; at 10^10 nodes the
    caller would write the per-bucket rank refs instead of collecting).
    """
    edges_mat = edges.materialize()
    if n_edges_hint is None:
        n_edges = int(edges_mat.count())
    else:
        n_edges = n_edges_hint
    nbuck = int(max(1, min(_PAIR_BUCKETS, n_edges // 16384 + 1)))

    from ..stages.util import refs_and_counts

    erefs, _ = refs_and_counts(edges_mat)
    if not erefs:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()), "rank_fp": pa.array([], pa.int64())}
        )
    eparts = [
        _pr_part_edges.options(num_returns=nbuck).remote(r, nbuck)
        for r in erefs
    ]
    if nbuck == 1:
        eparts = [[p] for p in eparts]
    E = [
        _pr_build_bucket.remote(*[pl[b] for pl in eparts])
        for b in range(nbuck)
    ]

    if nodes is not None:
        nodes_mat = nodes.materialize()
        nrefs, _ = refs_and_counts(nodes_mat)
        nparts = [
            _pr_part_nodes.options(num_returns=nbuck).remote(r, nbuck)
            for r in nrefs
        ]
        if nbuck == 1:
            nparts = [[p] for p in nparts]
        N = [
            _pr_node_union.remote(*[pl[b] for pl in nparts])
            for b in range(nbuck)
        ]
        n = int(nodes_mat.count())
    else:
        # derive the vertex set from the edge buckets: srcs live in their
        # own bucket; dsts are re-routed by the same % rule
        dparts = [
            _pr_part_nodes.options(num_returns=nbuck).remote(
                _pr_dst_nodes.remote(e), nbuck
            )
            for e in E
        ]
        if nbuck == 1:
            dparts = [[p] for p in dparts]
        N = [
            _pr_node_union.remote(
                _pr_src_nodes.remote(E[b]), *[pl[b] for pl in dparts]
            )
            for b in range(nbuck)
        ]
        n = int(sum(ray.get([_pr_count.remote(t) for t in N])))
    if n == 0:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()), "rank_fp": pa.array([], pa.int64())}
        )
    base = (PR_SCALE // n) * (PR_DAMP_DEN - PR_DAMP_NUM) // PR_DAMP_DEN
    init = PR_SCALE // n

    R = [_pr_init.remote(N[b], init) for b in range(nbuck)]
    for _ in range(iters):
        sends = [
            _pr_send.options(num_returns=nbuck).remote(E[b], R[b], nbuck)
            for b in range(nbuck)
        ]
        if nbuck == 1:
            sends = [[s] for s in sends]
        R = [
            _pr_sum.remote(N[b], base, *[sl[b] for sl in sends])
            for b in range(nbuck)
        ]

    tbl = pa.concat_tables(ray.get(R))
    node = tbl.column("node").to_numpy(zero_copy_only=False)
    rank = tbl.column("rank_fp").to_numpy(zero_copy_only=False)
    order = np.argsort(node, kind="stable")
    return pa.table(
        {
            "doc_id": pa.array(node[order], pa.int64()),
            "rank_fp": pa.array(rank[order], pa.int64()),
        }
    )


@ray.remote
def _pr_src_nodes(edges: pa.Table) -> pa.Table:
    u = np.unique(edges.column("src").to_numpy(zero_copy_only=False))
    return pa.table({"node": pa.array(u, pa.int64())})


@ray.remote
def _pr_dst_nodes(edges: pa.Table) -> pa.Table:
    u = np.unique(edges.column("dst").to_numpy(zero_copy_only=False))
    return pa.table({"node": pa.array(u, pa.int64())})


@ray.remote
def _pr_count(tbl: pa.Table) -> int:
    return tbl.num_rows


@ray.remote
def _pr_init(node_tbl: pa.Table, init: int) -> pa.Table:
    return pa.table(
        {
            "node": node_tbl.column("node"),
            "rank_fp": pa.array(
                np.full(node_tbl.num_rows, init, np.int64), pa.int64()
            ),
        }
    )


def _doc_link_edges(sf_dir: str) -> "ray.data.Dataset":
    """Deterministic link graph over the documents table (the synthetic
    stand-in for crawl-extracted links, same arithmetic family as
    `sources.conformance_web.conf_links`): doc d links to 3d+1, 3d+2,
    3d+3 (when < N) and (7d+3) mod N.  N = documents row count."""
    from .corpus import _docs

    docs = _docs(sf_dir, ["doc_id"])
    n = int(docs.count())

    def gen(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy(zero_copy_only=False)
        srcs, dsts = [], []
        for mul_off in ((3, 1), (3, 2), (3, 3)):
            t = mul_off[0] * d + mul_off[1]
            m = t < n
            srcs.append(d[m])
            dsts.append(t[m])
        srcs.append(d)
        dsts.append((7 * d + 3) % n)
        return pa.table(
            {
                "src": pa.array(np.concatenate(srcs), pa.int64()),
                "dst": pa.array(np.concatenate(dsts), pa.int64()),
            }
        )

    return docs.map_batches(gen, batch_format="pyarrow")


@empty_guard("documents", doc_id=pa.int64(), token=pa.string(), anchor_tf=pa.int64())
def anchor_texts(sf_dir: str) -> "ray.data.Dataset":
    """Anchor-text aggregation over the documents link graph — the
    classic in-link relevance signal an indexer folds into a target
    page's postings (absent from the reference, which indexes only the
    page's own text; standard in web-scale search and LLM-corpus URL
    labeling).

    The j-th out-link of doc d (same `_doc_link_edges` arithmetic,
    duplicates kept in link order) carries tokens[3j:3j+3] of d's T1
    token stream as its anchor text.  Counts aggregate per
    (target doc_id, token): an in-batch Counter combiner first, then ONE
    groupby(doc_id, token) shuffle — the map-side-combine + single
    exchange shape that holds at 10^10 edges (anchor rows are bounded by
    3 tokens x out-degree, never by page length)."""
    from collections import Counter

    from ray.data.aggregate import Sum

    from ..functions.text import tokenize
    from .corpus import _docs

    docs = _docs(sf_dir, ["doc_id", "text"])
    n = int(docs.count())

    def emit(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        combine: Counter = Counter()
        for d, text in zip(ids, texts):
            toks = tokenize(text)
            targets = [t for t in (3 * d + 1, 3 * d + 2, 3 * d + 3) if t < n]
            targets.append((7 * d + 3) % n)
            for j, t in enumerate(targets):
                for tok in toks[3 * j : 3 * j + 3]:
                    combine[(t, tok)] += 1
        if not combine:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "token": pa.array([], pa.string()),
                    "c": pa.array([], pa.int64()),
                }
            )
        keys, cnts = zip(*combine.items())
        return pa.table(
            {
                "doc_id": pa.array([k[0] for k in keys], pa.int64()),
                "token": pa.array([k[1] for k in keys], pa.string()),
                "c": pa.array(cnts, pa.int64()),
            }
        )

    return (
        docs.map_batches(emit, batch_format="pyarrow")
        .groupby(["doc_id", "token"])
        .aggregate(Sum("c", alias_name="anchor_tf"))
    )


@empty_guard("documents", doc_id=pa.int64(), rank_fp=pa.int64())
def link_pagerank(sf_dir: str) -> pa.Table:
    """PageRank over the documents link graph: 3 fixed-point iterations,
    damping 85/100, scale 10^12.  Returns (doc_id, rank_fp) per doc."""
    from .corpus import _docs

    docs = _docs(sf_dir, ["doc_id"])
    n = int(docs.count())
    nodes = docs.map_batches(
        lambda b: pa.table({"node": b.column("doc_id")}), batch_format="pyarrow"
    )
    return pagerank(
        _doc_link_edges(sf_dir), iters=PR_ITERS, nodes=nodes, n_edges_hint=4 * n
    )


_TRI_BUCKETS = 64


@empty_guard("documents", node=pa.int64(), n_triangles=pa.int64())
def link_triangles(sf_dir: str, n_buckets: int = 0) -> "ray.data.Dataset":
    """Per-node triangle counts over the (undirected) documents link graph
    — the classic 2-round MapReduce triangle algorithm (Suri & Vassilvitskii
    2011 "Counting Triangles and the Curse of the Last Reducer"):

      1. canonical edges (u < v), DISTINCT via one bucketed shuffle;
      2. wedge generation: edges grouped by their LOW endpoint; each node
         emits its neighbor pairs (bounded by C(deg, 2) — id-orientation
         caps wedge fan-out the way degree-orientation does at web scale);
      3. closure probe: wedges and edges co-shuffled by the (v, w) pair
         key; a wedge closed by an existing edge is a triangle, counted
         once per corner.

    All shuffles carry narrow int64 rows; kernels are numpy. The SQL
    oracle replays the same 3-way self-join exactly."""
    from .corpus import _docs

    docs = _docs(sf_dir, ["doc_id"])
    n = int(docs.count())
    # data-proportional width: ~4n pre-dedup edges; kilobyte graphs must
    # not pay a 64-wide grid of near-empty buckets. n_buckets > 0
    # overrides (tests pin the multi-bucket path on small graphs —
    # a width-1 exchange never exercises the routing keys).
    nb = int(n_buckets) if n_buckets else int(
        max(1, min(_TRI_BUCKETS, (4 * n) // 16384 + 1))
    )

    def edges_canon(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy(zero_copy_only=False)
        srcs, dsts = [], []
        for mul, off in ((3, 1), (3, 2), (3, 3)):
            t = mul * d + off
            m = t < n
            srcs.append(d[m])
            dsts.append(t[m])
        srcs.append(d)
        dsts.append((7 * d + 3) % n)
        s = np.concatenate(srcs)
        t = np.concatenate(dsts)
        keep = s != t  # drop self-loops
        u = np.minimum(s[keep], t[keep])
        v = np.maximum(s[keep], t[keep])
        key = u * n + v
        key = np.unique(key)  # in-batch dedup partial
        return pa.table(
            {
                "ekey": pa.array(key, pa.int64()),
                "bucket": pa.array(
                    (key % nb).astype(np.int32), pa.int32()
                ),
            }
        )

    def dedup_edges(tbl: pa.Table) -> pa.Table:
        key = np.unique(tbl.column("ekey").to_numpy(zero_copy_only=False))
        u = key // n
        return pa.table(
            {
                "ekey": pa.array(key, pa.int64()),
                "ubucket": pa.array((u % nb).astype(np.int32), pa.int32()),
            }
        )

    from ..stages.util import bucket_exchange, exchange_sum_by_key

    edges = bucket_exchange(
        docs.map_batches(edges_canon, batch_format="pyarrow").materialize(),
        "bucket",
        nb,
        dedup_edges,
    ).materialize()

    def wedges(tbl: pa.Table) -> pa.Table:
        key = np.sort(tbl.column("ekey").to_numpy(zero_copy_only=False))
        u = key // n
        v = key % n
        starts = np.flatnonzero(np.concatenate(([True], u[1:] != u[:-1])))
        ends = np.append(starts[1:], len(u))
        w_key, w_u = [], []
        for s, e in zip(starts, ends):  # loop over NODES (deg <= ~8 here)
            nbrs = v[s:e]  # NOT 'nb' — that's the closure bucket width
            if len(nbrs) < 2:
                continue
            ia, ib = np.triu_indices(len(nbrs), 1)
            w_key.append(nbrs[ia] * n + nbrs[ib])
            w_u.append(np.full(len(ia), u[s], np.int64))
        if not w_key:
            return pa.table(
                {
                    "pkey": pa.array([], pa.int64()),
                    "corner": pa.array([], pa.int64()),
                    "side": pa.array([], pa.int8()),
                    "bucket": pa.array([], pa.int32()),
                }
            )
        pk = np.concatenate(w_key)
        return pa.table(
            {
                "pkey": pa.array(pk, pa.int64()),
                "corner": pa.array(np.concatenate(w_u), pa.int64()),
                "side": pa.array(np.ones(len(pk), np.int8), pa.int8()),
                "bucket": pa.array((pk % nb).astype(np.int32), pa.int32()),
            }
        )

    def edges_probe_rows(batch: pa.Table) -> pa.Table:
        key = batch.column("ekey").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "pkey": pa.array(key, pa.int64()),
                "corner": pa.array(np.full(len(key), -1, np.int64), pa.int64()),
                "side": pa.array(np.zeros(len(key), np.int8), pa.int8()),
                "bucket": pa.array((key % nb).astype(np.int32), pa.int32()),
            }
        )

    wedge_rows = bucket_exchange(
        edges, "ubucket", nb, wedges
    ).materialize()
    edge_rows = edges.map_batches(
        edges_probe_rows, batch_format="pyarrow"
    ).materialize()

    def close(tbl: pa.Table) -> pa.Table:
        side = tbl.column("side").to_numpy(zero_copy_only=False)
        pk = tbl.column("pkey").to_numpy(zero_copy_only=False)
        corner = tbl.column("corner").to_numpy(zero_copy_only=False)
        eset = np.sort(pk[side == 0])
        if not len(eset):
            # wedge rows but no edge rows in this bucket (tiny graphs):
            # nothing can close — and eset[...] below would index empty
            return pa.table({"node": pa.array([], pa.int64())})
        wsel = side == 1
        wk, wc = pk[wsel], corner[wsel]
        pos = np.searchsorted(eset, wk)
        closed = (pos < len(eset)) & (eset[np.minimum(pos, len(eset) - 1)] == wk)
        # a closed wedge (corner u, pair v-w) is one triangle; emit all
        # three corner rows so the final count is per node
        tri_k = wk[closed]
        tri_u = wc[closed]
        nodes = np.concatenate((tri_u, tri_k // n, tri_k % n))
        # per-bucket PARTIAL counts — far fewer rows than per-corner,
        # and the final per-node sum is one tiny keyed exchange
        un, cnt = np.unique(nodes, return_counts=True)
        return pa.table(
            {
                "node": pa.array(un, pa.int64()),
                "n_triangles": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    both = wedge_rows.union(edge_rows).materialize()
    partials = bucket_exchange(both, "bucket", nb, close)
    return exchange_sum_by_key(partials, "node", nbuck=4)


# --- HITS (hubs & authorities) ------------------------------------------------

HITS_SCALE = 10**6  # max-normalized each half-step, so sums stay < 2^53
HITS_ITERS = 3


@ray.remote
def _hits_part_by(tbl: pa.Table, col: str, nbuck: int):
    """Route (already-deduped) edge rows to ``col % nbuck`` slices."""
    if nbuck == 1:
        return tbl
    k = tbl.column(col).to_numpy(zero_copy_only=False)
    b = (k % nbuck).astype(np.int64)
    order = np.argsort(b, kind="stable")
    t = tbl.take(pa.array(order, pa.int64()))
    bounds = np.searchsorted(b[order], np.arange(nbuck + 1))
    return tuple(
        t.slice(int(bounds[i]), int(bounds[i + 1] - bounds[i]))
        for i in range(nbuck)
    )


@ray.remote
def _hits_concat(*parts: pa.Table) -> pa.Table:
    tables = [p for p in parts if p.num_rows]
    if not tables:
        return pa.table(
            {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
        )
    return pa.concat_tables([t.select(["src", "dst"]) for t in tables])


@ray.remote
def _hits_send(edges: pa.Table, vals: pa.Table, join_col: str, emit_col: str, nbuck: int):
    """Half-iteration send: join vals[join_col] (co-partitioned by the
    same % rule, nodes sorted) onto the bucket's edges, emit per-emit_col
    -bucket (node, val) slices."""
    j = edges.column(join_col).to_numpy(zero_copy_only=False)
    if not len(j):
        empty = pa.table(
            {"node": pa.array([], pa.int64()), "val": pa.array([], pa.int64())}
        )
        return tuple(empty for _ in range(nbuck)) if nbuck > 1 else empty
    e = edges.column(emit_col).to_numpy(zero_copy_only=False)
    nk = vals.column("node").to_numpy(zero_copy_only=False)
    nv = vals.column("v").to_numpy(zero_copy_only=False)
    contrib = nv[np.searchsorted(nk, j)]
    b = (e % nbuck).astype(np.int64)
    order = np.argsort(b, kind="stable")
    e2, c2 = e[order], contrib[order]
    bounds = np.searchsorted(b[order], np.arange(nbuck + 1))
    out = tuple(
        pa.table(
            {
                "node": pa.array(e2[int(bounds[i]) : int(bounds[i + 1])], pa.int64()),
                "val": pa.array(c2[int(bounds[i]) : int(bounds[i + 1])], pa.int64()),
            }
        )
        for i in range(nbuck)
    )
    return out if nbuck > 1 else out[0]


@ray.remote
def _hits_sum(node_tbl: pa.Table, *contribs: pa.Table) -> pa.Table:
    nodes = node_tbl.column("node").to_numpy(zero_copy_only=False)  # sorted
    acc = np.zeros(len(nodes), np.float64)  # exact: values < 2^53
    for c in contribs:
        if not c.num_rows:
            continue
        idx = np.searchsorted(nodes, c.column("node").to_numpy(zero_copy_only=False))
        acc += np.bincount(
            idx,
            weights=c.column("val").to_numpy(zero_copy_only=False),
            minlength=len(nodes),
        )
    return pa.table(
        {
            "node": pa.array(nodes, pa.int64()),
            "v": pa.array(acc.astype(np.int64), pa.int64()),
        }
    )


@ray.remote
def _hits_bucket_max(tbl: pa.Table) -> int:
    v = tbl.column("v").to_numpy(zero_copy_only=False)
    return int(v.max()) if len(v) else 0


@ray.remote
def _hits_rescale(tbl: pa.Table, gmax: int) -> pa.Table:
    v = tbl.column("v").to_numpy(zero_copy_only=False)
    if gmax <= 0:
        out = np.zeros(len(v), np.int64)
    elif gmax < (1 << 62) // HITS_SCALE:
        out = (v * HITS_SCALE) // gmax  # vectorized fast path, no overflow
    else:
        # giant-degree regime (a node with ≳9e6 in-links pushes v·SCALE
        # past int64): exact python-int arithmetic per node — bounded by
        # the bucket's node count, and only ever taken on such graphs.
        # The oracle stays exact too (HUGEINT multiply in _hits_sql).
        out = np.fromiter(
            ((int(x) * HITS_SCALE) // gmax for x in v),
            dtype=np.int64,
            count=len(v),
        )
    return pa.table({"node": tbl.column("node"), "v": pa.array(out, pa.int64())})


@ray.remote
def _hits_init(node_tbl: pa.Table) -> pa.Table:
    return pa.table(
        {
            "node": node_tbl.column("node"),
            "v": pa.array(
                np.full(node_tbl.num_rows, HITS_SCALE, np.int64), pa.int64()
            ),
        }
    )


@ray.remote
def _hits_zip(h: pa.Table, a: pa.Table) -> pa.Table:
    # same sorted node column in both
    return pa.table(
        {
            "node": h.column("node"),
            "hub_fp": h.column("v"),
            "auth_fp": a.column("v"),
        }
    )


def hits(
    edges: "ray.data.Dataset",
    nodes: "ray.data.Dataset",
    iters: int = HITS_ITERS,
    n_edges_hint: Optional[int] = None,
) -> pa.Table:
    """Fixed-point HITS (Kleinberg 1999) over an ``(src, dst)`` edge
    Dataset, same Pregel shape as :func:`pagerank` but with BOTH edge
    orientations partitioned once (``src % B`` for the authority send,
    ``dst % B`` for the hub send — built from the deduped forward
    buckets, so dedup happens exactly once). Per iteration:
    a = Σ_in h, max-normalize to ``HITS_SCALE``; h = Σ_out a,
    max-normalize — integer floor division everywhere, so the result is
    bit-identical on any block layout and in the unrolled SQL oracle
    (max-normalization replaces the classic L2 norm to stay in exact
    int64; the ranking it induces per step is the same). The driver sees
    one int per bucket per half-step (the max reduction) — never
    per-node state."""
    if nodes is None:
        raise ValueError("hits() requires the vertex set (nodes Dataset)")
    edges_mat = edges.materialize()
    n_edges = n_edges_hint if n_edges_hint is not None else int(edges_mat.count())
    nbuck = int(max(1, min(_PAIR_BUCKETS, n_edges // 16384 + 1)))

    from ..stages.util import refs_and_counts

    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "hub_fp": pa.array([], pa.int64()),
            "auth_fp": pa.array([], pa.int64()),
        }
    )
    erefs, _ = refs_and_counts(edges_mat)
    if not erefs:
        return empty
    eparts = [
        _pr_part_edges.options(num_returns=nbuck).remote(r, nbuck) for r in erefs
    ]
    if nbuck == 1:
        eparts = [[p] for p in eparts]
    E_src = [
        _pr_build_bucket.remote(*[pl[b] for pl in eparts]) for b in range(nbuck)
    ]
    # backward orientation from the already-deduped forward buckets
    dstparts = [
        _hits_part_by.options(num_returns=nbuck).remote(e, "dst", nbuck)
        for e in E_src
    ]
    if nbuck == 1:
        dstparts = [[p] for p in dstparts]
    E_dst = [
        _hits_concat.remote(*[pl[b] for pl in dstparts]) for b in range(nbuck)
    ]

    nodes_mat = nodes.materialize()
    nrefs, _ = refs_and_counts(nodes_mat)
    nparts = [
        _pr_part_nodes.options(num_returns=nbuck).remote(r, nbuck) for r in nrefs
    ]
    if nbuck == 1:
        nparts = [[p] for p in nparts]
    N = [_pr_node_union.remote(*[pl[b] for pl in nparts]) for b in range(nbuck)]
    if int(nodes_mat.count()) == 0:
        return empty

    H = [_hits_init.remote(N[b]) for b in range(nbuck)]
    A = H
    for _ in range(iters):
        # authority half-step: a = sum of h over in-edges
        sends = [
            _hits_send.options(num_returns=nbuck).remote(
                E_src[b], H[b], "src", "dst", nbuck
            )
            for b in range(nbuck)
        ]
        if nbuck == 1:
            sends = [[s] for s in sends]
        A_raw = [
            _hits_sum.remote(N[b], *[sl[b] for sl in sends]) for b in range(nbuck)
        ]
        amax = max(ray.get([_hits_bucket_max.remote(t) for t in A_raw]))
        A = [_hits_rescale.remote(t, amax) for t in A_raw]
        # hub half-step: h = sum of a over out-edges
        sends = [
            _hits_send.options(num_returns=nbuck).remote(
                E_dst[b], A[b], "dst", "src", nbuck
            )
            for b in range(nbuck)
        ]
        if nbuck == 1:
            sends = [[s] for s in sends]
        H_raw = [
            _hits_sum.remote(N[b], *[sl[b] for sl in sends]) for b in range(nbuck)
        ]
        hmax = max(ray.get([_hits_bucket_max.remote(t) for t in H_raw]))
        H = [_hits_rescale.remote(t, hmax) for t in H_raw]

    tbl = pa.concat_tables(ray.get([_hits_zip.remote(H[b], A[b]) for b in range(nbuck)]))
    node = tbl.column("node").to_numpy(zero_copy_only=False)
    order = np.argsort(node, kind="stable")
    return pa.table(
        {
            "doc_id": pa.array(node[order], pa.int64()),
            "hub_fp": pa.array(
                tbl.column("hub_fp").to_numpy(zero_copy_only=False)[order],
                pa.int64(),
            ),
            "auth_fp": pa.array(
                tbl.column("auth_fp").to_numpy(zero_copy_only=False)[order],
                pa.int64(),
            ),
        }
    )


@empty_guard("documents", doc_id=pa.int64(), hub_fp=pa.int64(), auth_fp=pa.int64())
def link_hits(sf_dir: str) -> pa.Table:
    """HITS hubs & authorities over the documents link graph: 3
    max-normalized fixed-point iterations, scale 10^6.  Returns
    (doc_id, hub_fp, auth_fp) per doc."""
    from .corpus import _docs

    docs = _docs(sf_dir, ["doc_id"])
    n = int(docs.count())
    nodes = docs.map_batches(
        lambda b: pa.table({"node": b.column("doc_id")}), batch_format="pyarrow"
    )
    return hits(
        _doc_link_edges(sf_dir), iters=HITS_ITERS, nodes=nodes, n_edges_hint=4 * n
    )
