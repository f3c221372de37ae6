"""The crawl: a driver-side BFS wave loop over Ray Data stages.

Ray Data has no cyclic dataflow, so the frontier loop is driver iteration
(SURVEY.md §4 decision 2) — but the DATA never loops through the driver:
each wave is a bounded Dataset flowing

    frontier (read from wave K-1 checkpoint parquet) ─ groupby(host)
        politeness schedule ──┐
        ├─ blocked → seen.mark_complete             │
        ├─ carryover ── frontier-block write ─────► wave K checkpoint
        └─ dispatched ─ sort(virtual_ts,host,seq) ─ zip_with_index
             └─ map_batches(fetch join over docs store)
                  ├─ pages sink (wave-partitioned parquet)
                  ├─ lineage sink
                  ├─ analytics (crawl tokenize → token partials, lengths)
                  └─ link extraction → validity → normalize
                       └─ groupby(url) within-wave first-wins dedup
                            └─ seen-shard test_and_add (batched RPC)
                                 └─ sort(parent_seq, offset) → discovery_seq
                                      └─ frontier-block write ► wave K ckpt

The next frontier is handed between waves as OBJECT-STORE REFS (filtered
carry blocks + fresh blocks, coalesced to a data-proportional width); the
driver only ever sees per-block (host, count) partials (the host set is
orders of magnitude smaller than the frontier; it seeds the per-wave
robots/politeness metadata broadcast). The same refs are written ASYNC as
per-block parquet into ``checkpoints/wave=K/frontier`` — disk serves
resume, not the hot path — and wave K is atomically published during wave
K+1 (one extra re-run wave worst case on a crash). Seen-set state
checkpoints as per-shard incremental deltas written by the shard actors
themselves at the wave boundary (state/checkpoint.py). Kill/resume replays
exactly (state restored from deltas; outputs beyond the resume wave
cleared; frontier read back from the published checkpoint).

Determinism: dispatch order is (virtual_ts, host, discovery_seq);
discovery order is (parent dispatch seq, span offset) — both reproduced by
the oracle (oracle.py) and asserted equal in tests. Block order of the
frontier parquet is irrelevant: every ordered quantity is re-derived from
sorts on those keys.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data

from ..functions import urls as U
from ..sources.synthetic_web import CrawlConfig
from ..stages import schedule as SCH
from ..stages.extract import analyze_batch, explode_token_partials, extract_links_batch
from ..stages.fetch import make_fetch_fn, filter_scrapeable
from ..stages.util import (
    arrow_schema_of,
    coalesce_ref_list,
    dataset_from_known_refs,
    refs_and_counts,
    resplit_ref,
    split_prefix_zip,
    zip_with_index_counted,
)
from ..state.checkpoint import (
    begin_checkpoint,
    check_hash_impl,
    clear_wave_outputs,
    finalize_checkpoint,
    frontier_dir,
    gc_checkpoints,
    gc_frontiers,
    latest_checkpoint,
    read_meta,
    seen_delta_files,
)
from ..state.robots import RobotsCache
from ..state.seen import SeenSet


@dataclass
class CrawlOutputs:
    workdir: str
    waves: int
    pages_fetched: int
    urls_discovered: int
    metrics: Optional[dict] = None

    def _sink(self, name: str, schema: pa.Schema):
        """Read a sink dir, or a TYPED empty dataset when the dir is
        missing or holds no parquet parts (nothing dispatched, nothing
        scrapeable, or sink_mode='discard') — accessors must not crash
        on degenerate crawls."""
        d = os.path.join(self.workdir, name)
        has_parts = os.path.isdir(d) and any(
            f.endswith(".parquet")
            for _, _, files in os.walk(d)
            for f in files
        )
        if not has_parts:
            return ray.data.from_arrow(schema.empty_table())
        return ray.data.read_parquet(d)

    def lineage(self) -> "ray.data.Dataset":
        schema = pa.schema(
            [
                ("seq", pa.int64()),
                ("url", pa.string()),
                ("host", pa.string()),
                ("virtual_ts", pa.float64()),
                ("status", pa.int32()),
                ("wave", pa.int32()),
            ]
        )
        return self._sink("lineage", schema).sort("seq")

    def pages(self) -> "ray.data.Dataset":
        from ..schema import SPAN_STRUCT

        schema = pa.schema(
            [
                ("url", pa.string()),
                ("host", pa.string()),
                ("discovery_seq", pa.int64()),
                ("depth", pa.int32()),
                ("virtual_ts", pa.float64()),
                ("seq", pa.int64()),
                ("status", pa.int32()),
                ("content_bytes", pa.int64()),
                ("is_html", pa.bool_()),
                ("spans", pa.list_(SPAN_STRUCT)),
                ("page_hash", pa.int64()),
            ]
        )
        return self._sink("pages", schema)

    def frequencies(self) -> "ray.data.Dataset":
        from ray.data.aggregate import Sum

        ds = self._sink(
            "tokens",
            pa.schema([("token", pa.string()), ("count", pa.int64())]),
        )
        return ds.groupby("token").aggregate(Sum("count", alias_name="count"))

    def page_lengths(self) -> "ray.data.Dataset":
        # select the contract columns: the wave=K dir layout otherwise
        # surfaces as an inferred hive-partition column
        return self._sink(
            "page_lengths",
            pa.schema(
                [("url", pa.string()), ("seq", pa.int64()), ("length", pa.int64())]
            ),
        ).select_columns(["url", "seq", "length"])

    def seen(self) -> pa.Table:
        # per-shard files written by the shard actors (distributed sink)
        return pq.read_table(os.path.join(self.workdir, "seen_final"))


_FRONTIER_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("discovery_seq", pa.int64()),
        ("depth", pa.int32()),
    ]
)

_FRONTIER_COLS = ["url", "host", "discovery_seq", "depth"]

# candidate-link rows leaving the fetch task (builtin or custom
# link_extractor) — _add_ubucket casts to this at the hook boundary
_CAND_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("parent_seq", pa.int64()),
        ("offset", pa.int32()),
        ("depth", pa.int32()),
    ]
)

_HOSTS_SCHEMA = pa.schema([("host", pa.string()), ("n", pa.int64())])

# schedule output + dispatch seq (fast-path metadata; blocks carry their
# own schema — this mirrors schedule.make_schedule_fn's column order)
_DISPATCH_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("discovery_seq", pa.int64()),
        ("depth", pa.int32()),
        ("action", pa.int8()),
        ("virtual_ts", pa.float64()),
        ("seq", pa.int64()),
    ]
)


@ray.remote(num_returns=2)
def _frontier_block(table: pa.Table, action: Optional[int]):
    """Project one next-frontier block: CARRY-filter scheduled blocks
    (``action`` set) or pass fresh-link blocks through (``None``), select
    the frontier columns, and return ``(per-host counts, frontier table)``.
    Only the tiny counts table is ever ``ray.get`` by the driver; the
    frontier table stays in the object store and feeds BOTH the async
    checkpoint write and the next wave's schedule execution (in-memory
    wave handoff — disk is for resume, not for the hot path)."""
    if action is not None:
        if table.num_rows == 0 or "action" not in table.column_names:
            empty = pa.Table.from_pylist([], schema=_FRONTIER_SCHEMA)
            return pa.Table.from_pylist([], schema=_HOSTS_SCHEMA), empty
        table = table.filter(pc.equal(table.column("action"), action))
    if table.num_rows == 0:
        empty = pa.Table.from_pylist([], schema=_FRONTIER_SCHEMA)
        return pa.Table.from_pylist([], schema=_HOSTS_SCHEMA), empty
    table = table.select(_FRONTIER_COLS).combine_chunks()
    agg = table.group_by("host").aggregate([("discovery_seq", "count")])
    counts = pa.table(
        {
            "host": agg.column("host"),
            "n": pc.cast(agg.column("discovery_seq_count"), pa.int64()),
        }
    )
    return counts, table


@ray.remote
def _concat_frontier(*tables: pa.Table) -> pa.Table:
    return pa.concat_tables(tables).combine_chunks()


# Waves at or below this many frontier rows run the schedule / link-dedup
# chains as ONE task each (adaptive local execution, the same move Spark
# AQE makes for sub-block shuffles): a kilobyte-scale wave must not pay
# two AllToAll barriers + an executor startup (~0.5 s/wave measured at 32
# cpus) for work a single core finishes in milliseconds. Above it — the
# 10^10-frontier regime, waves of 10^6+ rows — the distributed path runs,
# and a conformance config pins both paths to identical output.
SMALL_WAVE_ROWS = 65536


@ray.remote(num_returns=3)
def _schedule_small_wave(
    robots_fn, schedule_fn, blocked_fn, priority_fn, seq_start: int, *blocks
):
    """Small-wave fast path for the schedule phase: politeness grouping,
    robots marks, the global dispatch sort and the seq stamp in one task.
    Same kernels as the distributed path (schedule_fn per host slice, the
    identical sort key), so dispatch order is bit-identical."""
    tbl = pa.concat_tables(blocks).combine_chunks()
    if priority_fn is not None:
        tbl = priority_fn(tbl)
    tbl = robots_fn(tbl)
    hosts = np.asarray(tbl.column("host").to_pylist(), dtype=object)
    horder = np.argsort(hosts.astype(str), kind="stable")
    srt = tbl.take(pa.array(horder, pa.int64()))
    hs = hosts[horder].astype(str)
    starts = np.nonzero(np.concatenate(([True], hs[1:] != hs[:-1])))[0]
    bounds = list(starts) + [len(hs)]
    groups = [
        schedule_fn(srt.slice(bounds[i], bounds[i + 1] - bounds[i]))
        for i in range(len(bounds) - 1)
    ]
    sched = pa.concat_tables(groups).combine_chunks()
    sched = blocked_fn(sched)
    act = sched.column("action").to_numpy(zero_copy_only=False)
    vts = sched.column("virtual_ts").to_numpy(zero_copy_only=False)
    hstr = np.asarray(sched.column("host").to_pylist(), dtype=str)
    dsq = sched.column("discovery_seq").to_numpy(zero_copy_only=False)
    # same key tuple as the distributed Dataset.sort; rows past the FETCH
    # prefix have NaN virtual_ts, but their relative order is irrelevant
    # (every ordered quantity downstream re-derives from sorts)
    order = np.lexsort((dsq, hstr, vts, act))
    plen = int(np.searchsorted(act[order], SCH.ACTION_CARRY, side="left"))
    prefix = sched.take(pa.array(order[:plen], pa.int64())).append_column(
        "seq", pa.array(range(seq_start, seq_start + plen), pa.int64())
    )
    rest = sched.take(pa.array(order[plen:], pa.int64()))
    return prefix, rest, plen


@ray.remote(num_returns=3)
def _split_flag_block(table: pa.Table):
    """Split one contender-sorted block into (contenders, bypass, n_cont);
    both halves drop the flag column (zero-copy slices)."""
    cf = table.column("cflag").to_numpy(zero_copy_only=False)
    clen = int(np.searchsorted(cf, 1))
    t = table.drop_columns(["cflag"])
    return t.slice(0, clen), t.slice(clen), clen


def make_flag_contenders(slots_cap: int, has_priority: bool):
    """Per-block contender selection for the distributed schedule path
    (hot-host backlog bypass): within each block, per host, only the
    first ``slots_cap`` ALLOWED rows in dispatch order (priority, then
    discovery_seq) can possibly win a politeness slot this wave — plus
    every robots-blocked row (marked complete without burning a slot).
    Everything else is pure carryover and BYPASSES the groupby(host)
    shuffle entirely. Per-block top-k is a superset of global top-k, so
    the schedule kernel's output is unchanged; what changes is shuffle
    volume: a host with a 10^7-row backlog ships O(blocks x slots_cap)
    rows through the AllToAll instead of the whole backlog (the north
    rule's hot-host skew clause)."""

    def flag(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if not n:
            return batch.append_column("cflag", pa.array([], pa.int8()))
        hosts = (
            pc.dictionary_encode(batch.column("host").combine_chunks())
            .indices.to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        dseq = batch.column("discovery_seq").to_numpy(zero_copy_only=False)
        allowed = batch.column("allowed").to_numpy(zero_copy_only=False).astype(bool)
        if has_priority:
            prio = batch.column("priority").to_numpy(zero_copy_only=False)
            order = np.lexsort((dseq, prio, hosts))
        else:
            order = np.lexsort((dseq, hosts))
        hs = hosts[order]
        al = allowed[order]
        seg_start = np.concatenate(([True], hs[1:] != hs[:-1]))
        # rank among allowed rows within the host segment (1-based)
        cum = np.cumsum(al)
        starts = np.nonzero(seg_start)[0]
        offsets = np.where(starts > 0, cum[np.maximum(starts - 1, 0)], 0)
        seg_id = np.cumsum(seg_start) - 1
        rank = cum - offsets[seg_id]
        contender = (~al) | (rank <= slots_cap)
        part = np.concatenate((order[contender], order[~contender]))
        flags = np.concatenate(
            (
                np.zeros(int(contender.sum()), dtype=np.int8),
                np.ones(int((~contender).sum()), dtype=np.int8),
            )
        )
        return batch.take(pa.array(part, pa.int64())).append_column(
            "cflag", pa.array(flags, pa.int8())
        )

    return flag


@ray.remote(num_returns=2)
def _links_small_wave(first_wins_fn, seen_filter_fn, seq_start: int, *blocks):
    """Small-wave fast path for the candidate chain: within-wave
    first-wins dedup, the seen-shard filter RPC, the (parent_seq, offset)
    discovery sort and the discovery_seq stamp in one task. Kernels shared
    with the distributed path."""
    tbl = pa.concat_tables(blocks).combine_chunks()
    if tbl.num_rows:
        tbl = first_wins_fn(tbl)
        tbl = seen_filter_fn(tbl)
    if tbl.num_rows:
        ps = tbl.column("parent_seq").to_numpy(zero_copy_only=False)
        off = tbl.column("offset").to_numpy(zero_copy_only=False)
        # url tiebreak: the builtin extractor never produces equal
        # (parent_seq, offset) pairs (one span = one link), but a custom
        # link_extractor may — without a total key the distributed path's
        # unstable sort would order ties nondeterministically and diverge
        # from this path
        urls = np.asarray(tbl.column("url").to_pylist(), dtype=object)
        order = np.lexsort((urls, off, ps))
        tbl = tbl.take(pa.array(order, pa.int64()))
    n = tbl.num_rows
    tbl = tbl.append_column(
        "discovery_seq", pa.array(range(seq_start, seq_start + n), pa.int64())
    )
    return tbl, n


@ray.remote
def _write_frontier_group(table: pa.Table, out_dir: str) -> int:
    """Async checkpoint write of one coalesced frontier block. Part names
    key on the block's min discovery_seq — globally unique (disjoint
    unique int sets), so task retries overwrite their own file
    (idempotent)."""
    if table.num_rows == 0:
        return 0
    part = f"part-{pc.min(table.column('discovery_seq')).as_py():012d}.parquet"
    pq.write_table(table, os.path.join(out_dir, part))
    return table.num_rows


def _wave_dir(workdir: str, sub: str, wave: int) -> str:
    d = os.path.join(workdir, sub, f"wave={wave:05d}")
    os.makedirs(d, exist_ok=True)
    return d


def run_crawl(
    docs_path: Optional[str],
    robots_bodies: Dict[str, str],
    seed_urls: List[str],
    config: CrawlConfig,
    workdir: str,
    resume: bool = False,
    max_waves: int = 100_000,
    link_extractor=None,
    priority_fn=None,
    compact_every: int = 16,
    sink_mode: str = "parquet",
    fetch_transport: str = "store",
    http_options: Optional[dict] = None,
) -> CrawlOutputs:
    """Run the crawl to frontier exhaustion. Ray must already be initialised
    by the caller.

    User-extension surface (SURVEY §2.11, mirroring the reference's
    pluggable ``scraper(url, resp)`` hook and frontier/worker factories,
    web_crawler/README.md:58-204):

    - ``link_extractor(batch, root_domains) -> candidate table`` replaces
      the default span scanner (stages/extract.extract_links_batch); it
      must emit columns (url, host, parent_seq, offset, depth) — the
      validity chain is the hook's responsibility, exactly like the
      reference's scraper.
    - ``priority_fn(batch) -> batch + 'priority' column`` runs over the
      frontier before politeness scheduling; lower values dispatch first
      within a host's wave budget, discovery order breaks ties (absent →
      reference FIFO).
    - ``fetch_transport="http"`` swaps the synthetic-store fetch join for
      the real-network adapter (stages/http_fetch.py: requests.get with the
      reference download.py semantics, wall-clock same-host politeness,
      robots.txt fetched once per host inside the robots shards when absent
      from ``robots_bodies``). ``docs_path`` is ignored in http mode;
      ``http_options`` passes {timeout, politeness, max_threads}. Default
      stays "store" — this sandbox has no outbound network (loopback test
      coverage only).
    """
    os.makedirs(workdir, exist_ok=True)

    ckpt_wave = latest_checkpoint(workdir) if resume else None
    if ckpt_wave is not None:
        meta = read_meta(workdir, ckpt_wave)
        # refuse a checkpoint hashed under a different hash64 impl: its
        # seen-shard routing/fingerprints would silently mis-route here
        check_hash_impl(meta, source=f"checkpoint wave={ckpt_wave}")
        seen = SeenSet(num_shards=meta["num_seen_shards"])
        seen.restore_from_deltas(seen_delta_files(workdir, ckpt_wave))
        clear_wave_outputs(workdir, ckpt_wave)
        frontier_count = meta["frontier_count"]
        frontier = None
        frontier_refs: Optional[list] = None
        if frontier_count:
            frontier = ray.data.read_parquet(
                frontier_dir(workdir, ckpt_wave)
            ).materialize()
            frontier_refs, _ = refs_and_counts(frontier)
        frontier_hosts = list(meta["frontier_hosts"])
        wave = ckpt_wave + 1
        lineage_counter = meta["lineage_counter"]
        discovery_counter = meta["discovery_counter"]
        seen_hosts = set(meta["seen_hosts"])
    else:
        seen = SeenSet(num_shards=config.num_seen_shards)
        # seed registration mirrors Frontier.__init__ restart path
        # (frontier.py:33-36): normalize + first-wins dedup, discovery
        # order = seed order.
        normd = U.normalize_batch(seed_urls)
        uniq, seen_set = [], set()
        for u in normd:
            if u not in seen_set:
                seen_set.add(u)
                uniq.append(u)
        # wave=-1 sentinel: the retry-idempotency rule in
        # SeenShard.test_and_add answers True again for a url registered
        # in the SAME wave — seeds registered with wave=0 would collide
        # with the wave-0 link phase (a carried-over seed re-extracted
        # from a wave-0 page would be re-added and fetched twice, unlike
        # the oracle's add_url). No link phase ever runs with wave=-1.
        seen.test_and_add(uniq, wave=-1)
        rows = [
            {"url": u, "host": U.host_of(u), "discovery_seq": i, "depth": 0}
            for i, u in enumerate(uniq)
        ]
        seed_tbl = pa.Table.from_pylist(rows, schema=_FRONTIER_SCHEMA)
        frontier_refs = [ray.put(seed_tbl)]
        frontier = dataset_from_known_refs(
            frontier_refs, [len(rows)], _FRONTIER_SCHEMA
        )
        frontier_count = len(rows)
        frontier_hosts = sorted({r["host"] for r in rows})
        wave = 0
        lineage_counter = 0
        discovery_counter = len(rows)
        seen_hosts: set = set()

    http_mode = fetch_transport == "http"
    robots = RobotsCache(
        robots_bodies,
        num_shards=max(2, config.num_seen_shards // 2),
        fetch_http=http_mode,
        timeout=float((http_options or {}).get("timeout", 5.0)),
    )
    root_domains = tuple(config.root_domains)
    user_agent = config.user_agent
    docs_ref = docs_bucket_dir = None
    if not http_mode:
        # broadcast the docs store once (shared-memory object store) — every
        # fetch worker maps it zero-copy instead of materializing its own copy
        from ..stages.fetch import broadcast_docs_ref, ensure_bucketed_store

        docs_ref = broadcast_docs_ref(docs_path)
        # over-broadcast-bound store: one-time hash-bucket rewrite (resumable,
        # _COMPLETE-gated) so per-wave fetch batches read only their buckets'
        # hit row groups — never a whole-store predicate scan per batch
        docs_bucket_dir = (
            ensure_bucketed_store(docs_path, os.path.join(workdir, "docs_buckets"))
            if docs_ref is None
            else None
        )

    import time as _time

    phase_s: Dict[str, float] = {}

    def _tick():
        return _time.time()

    def _tock(name: str, t0: float) -> None:
        phase_s[name] = phase_s.get(name, 0.0) + (_time.time() - t0)

    target_blocks = max(2, int(ray.cluster_resources().get("CPU", 8)))

    def _shuffle_blocks(n_rows: int) -> int:
        """Shuffle width for a wave-bounded row set: DATA-proportional
        (~64k frontier rows ≈ 6 MB per block), capped at 4 blocks/core.
        An AllToAll's cost grows ~quadratically in its block count, so a
        kilobyte-scale wave must not shuffle at cluster width — while a
        10^8-row wave still fans out to every core."""
        return min(max(1, n_rows // 65536), 4 * target_blocks)

    def split_refs_dataset(refs, rows) -> "ray.data.Dataset":
        return dataset_from_known_refs(refs, rows, _FRONTIER_SCHEMA)

    # deferred checkpoint publication: (wave, write_futs, meta, seen_full).
    # Wave K's frontier parquet writes run async during wave K+1; K is
    # atomically published once they're done (next checkpoint phase).
    pending: Optional[tuple] = None

    def _drain_pending() -> None:
        nonlocal pending
        if pending is None:
            return
        pwave, futs, pmeta, pfull = pending
        if futs:
            ray.get(futs)
        finalize_checkpoint(workdir, pwave, pmeta)
        if pfull:
            # everything before the full seen snapshot is dead state
            gc_checkpoints(workdir, pwave)
        else:
            # earlier frontier payloads are consumed (resume reads only the
            # latest complete wave); their seen deltas must survive until
            # the next full snapshot
            gc_frontiers(workdir, pwave)
        pending = None

    while frontier_count > 0 and wave < max_waves:
        wave_start = wave * config.wave_span

        # --- schedule (politeness + robots) ---
        hosts = frontier_hosts
        delays = robots.check_hosts(hosts, user_agent)
        host_meta = {h: (delays[h], h not in seen_hosts) for h in hosts}
        seen_hosts.update(hosts)
        meta_ref = ray.put(host_meta)
        robots_fn = SCH.make_robots_fn(robots.shards, robots.num_shards, user_agent)
        schedule_fn = SCH.make_schedule_fn(
            meta_ref,
            wave_start,
            config.wave_span,
            config.politeness,
        )
        # robots-blocked URLs are marked complete INSIDE the schedule
        # execution (passthrough side effect) — no separate pass.
        def _mark_blocked_passthrough(batch: pa.Table) -> pa.Table:
            mask = pc.equal(batch.column("action"), SCH.ACTION_BLOCKED)
            blocked_urls = batch.filter(mask).column("url").to_pylist()
            if blocked_urls:
                seen.mark_complete(blocked_urls)
            return batch

        _t = _tick()
        if frontier_refs is not None and frontier_count <= SMALL_WAVE_ROWS:
            # adaptive fast path: the whole schedule phase as one task
            pref_ref, rest_ref, plen_ref = _schedule_small_wave.remote(
                robots_fn,
                schedule_fn,
                _mark_blocked_passthrough,
                priority_fn,
                lineage_counter,
                *frontier_refs,
            )
            n_dispatched = int(ray.get(plen_ref))
            rest_refs = [rest_ref]
            bypass_refs: list = []
            _tock("schedule", _t)
            _t = _tick()
            ordered = None
            if n_dispatched:
                o_refs, o_counts = resplit_ref(
                    pref_ref, n_dispatched, 2 * target_blocks
                )
                ordered = dataset_from_known_refs(
                    o_refs, o_counts, _DISPATCH_SCHEMA
                )
            _tock("dispatch_sort", _t)
        else:
            pre = frontier
            if priority_fn is not None:
                pre = pre.map_batches(priority_fn, batch_format="pyarrow")
            # hot-host backlog bypass: robots marks + per-block contender
            # selection in one streaming pass, then a driver-side split —
            # only rows that can possibly win a politeness slot this wave
            # (per host: slots_cap allowed + all blocked) enter the
            # groupby(host) AllToAll; the backlog goes straight to the
            # frontier writer as carryover.
            slots_cap = max(1, int(config.wave_span / config.politeness))
            flag_fn = make_flag_contenders(slots_cap, priority_fn is not None)
            pre_mat = (
                pre.map_batches(robots_fn, batch_format="pyarrow")
                .map_batches(flag_fn, batch_format="pyarrow")
                .materialize()
            )
            prefs, pcounts = refs_and_counts(pre_mat)
            trips = [_split_flag_block.remote(r) for r in prefs]
            clens = ray.get([t[2] for t in trips])
            bypass_refs = [
                t[1] for t, n, c in zip(trips, pcounts, clens) if n - c
            ]
            pre_schema = arrow_schema_of(pre_mat)
            if pre_schema is not None and "cflag" in pre_schema.names:
                pre_schema = pre_schema.remove(
                    pre_schema.get_field_index("cflag")
                )
            cont = dataset_from_known_refs(
                [t[0] for t, c in zip(trips, clens) if c],
                [c for c in clens if c],
                pre_schema,
            )
            # ONE fused execution over the contenders: politeness groupby
            # + the global dispatch sort. ACTION_FETCH (=0) leads the sort
            # key, so dispatched rows form a contiguous global prefix in
            # dispatch order and split_prefix_zip below peels them off the
            # materialized blocks with zero-copy slices.
            scheduled = (
                cont.groupby("host")
                .map_groups(schedule_fn, batch_format="pyarrow")
                .map_batches(_mark_blocked_passthrough, batch_format="pyarrow")
                .sort(["action", "virtual_ts", "host", "discovery_seq"])
                .materialize()
            )
            _tock("schedule", _t)

            _t = _tick()
            # stamp re-splits toward ~2 blocks/core so the fetch/tokenize
            # join fans out fully; rest_refs carry the CARRY/BLOCKED
            # remainder for the frontier writer
            ordered, n_dispatched, rest_refs = split_prefix_zip(
                scheduled,
                "action",
                SCH.ACTION_CARRY,
                "seq",
                lineage_counter,
                target_splits=2 * target_blocks,
            )
            _tock("dispatch_sort", _t)
        n_fresh = 0
        fresh_refs: list = []
        if n_dispatched:
            lineage_counter += n_dispatched

            # One fused execution: fetch-join, pages + lineage sinks (side
            # effect per batch, retry-stable filenames keyed by first seq),
            # seen-ledger completion with lengths, the A1/A2 analytics
            # sinks, AND link extraction — the task RETURNS the candidate
            # link rows, so the full page payload (spans) never
            # round-trips through the object store a second time and the
            # extract stage pays no extra execution/materialize per wave.
            # Hot-host skew is spread by the dispatch sort (hosts
            # interleave by virtual_ts), so equal blocks ≈ host-balanced
            # fetch tasks (north_rule salting).
            pages_dir = _wave_dir(workdir, "pages", wave)
            lineage_dir = _wave_dir(workdir, "lineage", wave)
            tokens_dir = _wave_dir(workdir, "tokens", wave)
            lengths_dir = _wave_dir(workdir, "page_lengths", wave)
            if http_mode:
                from ..stages.http_fetch import make_http_fetch_fn

                ho = http_options or {}
                fetch_fn = make_http_fetch_fn(
                    timeout=float(ho.get("timeout", 5.0)),
                    politeness=float(ho.get("politeness", config.politeness)),
                    max_threads=int(ho.get("max_threads", 8)),
                )
            else:
                fetch_fn = make_fetch_fn(docs_path, docs_ref, docs_bucket_dir)
            wv = wave

            # sink_mode="discard" is the BENCH-ONLY isolation leg: all
            # compute (fetch join, page hash, token partials, seen RPCs)
            # runs, but nothing is written to the page/lineage/token sinks
            # — separating the single-box disk-bandwidth share of the wave
            # loop from the parts that scale with CPUs. Frontier/checkpoint
            # writes stay on (the wave handoff reads them).
            write_sinks = sink_mode != "discard"

            def _fetch_write(batch: pa.Table) -> pa.Table:
                from ..stages.index import add_page_hash

                out = fetch_fn(batch)
                part = f"part-{out.column('seq')[0].as_py():012d}.parquet"
                # page_hash stored with the page so the indexer's dedup
                # pass reads two pruned columns instead of re-hashing spans
                hashed = add_page_hash(out)
                if write_sinks:
                    pq.write_table(hashed, os.path.join(pages_dir, part))
                lineage = out.select(
                    ["seq", "url", "host", "virtual_ts", "status"]
                ).append_column(
                    "wave", pa.array(np.full(out.num_rows, wv, dtype=np.int32))
                )
                if write_sinks:
                    pq.write_table(lineage, os.path.join(lineage_dir, part))

                scrapeable = filter_scrapeable(out)
                analyzed = analyze_batch(scrapeable)
                if analyzed.num_rows:
                    token_partials = explode_token_partials(analyzed)
                    if write_sinks:
                        pq.write_table(
                            token_partials, os.path.join(tokens_dir, part)
                        )
                        pq.write_table(
                            analyzed.select(["url", "seq", "length"]),
                            os.path.join(lengths_dir, part),
                        )
                # one completion RPC round: scrapeable pages carry their
                # token length, everything else length 0
                lengths = {
                    u: l
                    for u, l in zip(
                        analyzed.column("url").to_pylist(),
                        analyzed.column("length").to_pylist(),
                    )
                }
                urls = out.column("url").to_pylist()
                seen.mark_complete(urls, [lengths.get(u, 0) for u in urls])
                # link extraction fused into the fetch task: return the
                # candidate rows with the dedup bucket stamped — the page
                # payload never leaves this task
                return _add_ubucket(extract(scrapeable, root_domains))

            extract = link_extractor if link_extractor is not None else extract_links_batch

            # within-wave first-wins dedup: keep min (parent_seq, offset)
            # per url. Bucketed on url-hash (256 groups, int32 shuffle key)
            # with a vectorized run-selection kernel — never one Python
            # call per unique URL.
            def _add_ubucket(batch: pa.Table) -> pa.Table:
                # dtype boundary for custom link_extractors: the hook
                # contract names the columns but not the dtypes — a hook
                # emitting e.g. depth as int64 would mix schemas with
                # carry blocks and break frontier concat / checkpoint
                # parquet on resume
                if batch.schema != _CAND_SCHEMA:
                    batch = batch.select(_CAND_SCHEMA.names).cast(_CAND_SCHEMA)
                h = U.hash64_batch(batch.column("url").to_pylist())
                return batch.append_column(
                    "ubucket",
                    pa.array((h % np.uint64(256)).astype(np.int32), pa.int32()),
                )

            _t = _tick()
            links_mat = (
                ordered.drop_columns(["action"])
                .map_batches(_fetch_write, batch_format="pyarrow", num_cpus=1)
                .materialize()
            )
            _tock("fetch_write", _t)

            def _first_wins_bucket(tbl: pa.Table) -> pa.Table:
                codes = (
                    pc.dictionary_encode(tbl.column("url").combine_chunks())
                    .indices.to_numpy(zero_copy_only=False)
                )
                pseq = tbl.column("parent_seq").to_numpy(zero_copy_only=False)
                off = tbl.column("offset").to_numpy(zero_copy_only=False)
                order = np.lexsort((off, pseq, codes))
                cs = codes[order]
                first = (
                    np.concatenate(([True], cs[1:] != cs[:-1]))
                    if len(cs)
                    else np.empty(0, bool)
                )
                return tbl.take(
                    pa.array(order[first], pa.int64())
                ).drop_columns(["ubucket"])

            # cross-wave dedup via seen shards (batched, idempotent)
            wv_ = wave

            def _seen_filter(batch: pa.Table) -> pa.Table:
                urls = batch.column("url").to_pylist()
                if not urls:
                    return batch
                mask = seen.test_and_add(urls, wave=wv_)
                return batch.filter(pa.array(mask))

            _t = _tick()
            cand_refs, cand_counts = refs_and_counts(links_mat)
            n_cand = sum(cand_counts)
            if not n_cand:
                n_fresh, fresh_refs = 0, []
            elif n_cand <= SMALL_WAVE_ROWS:
                # adaptive fast path: dedup + seen filter + discovery sort
                # + stamp as one task
                fresh_ref, nf_ref = _links_small_wave.remote(
                    _first_wins_bucket,
                    _seen_filter,
                    discovery_counter,
                    *cand_refs,
                )
                n_fresh = int(ray.get(nf_ref))
                fresh_refs = [fresh_ref] if n_fresh else []
            else:
                # coalesce the tiny candidate blocks (links ≈ a few rows
                # per fetched page) to a data-proportional width BEFORE
                # the dedup shuffle — the groupby/sort AllToAlls pay per
                # block. Driver-side concat tasks, no repartition barrier.
                links = coalesce_ref_list(
                    cand_refs,
                    cand_counts,
                    arrow_schema_of(links_mat),
                    _shuffle_blocks(4 * n_dispatched),
                )
                deduped = links.groupby("ubucket").map_groups(
                    _first_wins_bucket, batch_format="pyarrow"
                )
                fresh = deduped.map_batches(_seen_filter, batch_format="pyarrow")
                ordered_fresh, n_fresh = zip_with_index_counted(
                    # url is the total-order tiebreak (see the small-wave
                    # lexsort): builtin extraction never ties on
                    # (parent_seq, offset); custom extractors may
                    fresh.sort(["parent_seq", "offset", "url"]),
                    "discovery_seq",
                    discovery_counter,
                )
                fresh_refs = ordered_fresh.to_arrow_refs() if n_fresh else []
            _tock("links", _t)
            discovery_counter += n_fresh

        # --- wave checkpoint + handoff: carry blocks are filtered from the
        # scheduled refs and fresh blocks projected by distributed tasks;
        # only (host, count) partials reach the driver. The next wave's
        # frontier is the SAME object-store refs (coalesced to a
        # data-proportional width) — the parquet checkpoint write happens
        # ASYNC off the critical path and wave K is finalized (atomically
        # published) during wave K+1's checkpoint phase, once its writes
        # have long finished. A crash therefore costs at most one extra
        # re-run wave on resume (the not-yet-published one). Per-shard seen
        # deltas are still flushed synchronously at the wave boundary — the
        # delta files must contain exactly this wave's entries. ---
        _t = _tick()
        tmp_dir = begin_checkpoint(workdir, wave)
        fdir = os.path.join(tmp_dir, "frontier")
        pairs = [_frontier_block.remote(r, SCH.ACTION_CARRY) for r in rest_refs]
        # backlog-bypass blocks (distributed path) are pure carryover:
        # they skipped the schedule shuffle and re-contend next wave
        pairs += [_frontier_block.remote(r, None) for r in bypass_refs]
        if n_fresh:
            pairs += [_frontier_block.remote(r, None) for r in fresh_refs]
        count_tbls = ray.get([c for c, _ in pairs])
        block_rows = [
            int(pc.sum(t.column("n")).as_py()) if t.num_rows else 0
            for t in count_tbls
        ]
        nonzero = [t for t in count_tbls if t.num_rows]
        if nonzero:
            hc = pa.concat_tables(nonzero)
            hc = hc.group_by("host").aggregate([("n", "sum")])
            frontier_hosts = sorted(hc.column("host").to_pylist())
            frontier_count = sum(block_rows)
        else:
            frontier_hosts = []
            frontier_count = 0

        # coalesce the non-empty frontier refs into ~_shuffle_blocks groups
        # (greedy by row count) — the schedule AllToAlls pay per block, and
        # each group becomes one checkpoint parquet part
        write_futs: list = []
        grp_refs: list = []
        grp_rows: list = []
        if frontier_count:
            target_rows = -(-frontier_count // _shuffle_blocks(frontier_count))
            cur_refs: list = []
            cur_rows = 0
            for (c, tref), n in zip(pairs, block_rows):
                if not n:
                    continue
                cur_refs.append(tref)
                cur_rows += n
                if cur_rows >= target_rows:
                    grp_refs.append(
                        _concat_frontier.remote(*cur_refs)
                        if len(cur_refs) > 1
                        else cur_refs[0]
                    )
                    grp_rows.append(cur_rows)
                    cur_refs, cur_rows = [], 0
            if cur_refs:
                grp_refs.append(
                    _concat_frontier.remote(*cur_refs)
                    if len(cur_refs) > 1
                    else cur_refs[0]
                )
                grp_rows.append(cur_rows)
            write_futs = [
                _write_frontier_group.remote(g, fdir) for g in grp_refs
            ]
        _tock("frontier_write", _t)

        # all mark_complete/test_and_add RPCs have settled (each execution
        # above is a barrier and the RPCs are awaited inside the tasks), so
        # the shard deltas are wave-complete.
        _t = _tick()
        # compaction cadence: every compact_every waves the shards write a
        # FULL ledger snapshot instead of a delta, so the replay chain (and
        # checkpoint storage) stays bounded at O(compact_every) waves no
        # matter how long the crawl runs. Each shard still writes only its
        # own file — nothing funnels through the driver.
        seen_full = compact_every > 0 and wave > 0 and wave % compact_every == 0
        if seen_full:
            seen.flush_full(os.path.join(tmp_dir, "seen"))
        else:
            seen.flush_deltas(os.path.join(tmp_dir, "seen"))
        meta = {
            "wave": wave,
            "lineage_counter": lineage_counter,
            "discovery_counter": discovery_counter,
            "frontier_count": frontier_count,
            "frontier_hosts": frontier_hosts,
            "seen_hosts": sorted(seen_hosts),
            "num_seen_shards": seen.num_shards,
            "seen_full": seen_full,
        }
        # publish wave-1 (its writes finished during this wave's compute),
        # then queue this wave's publication behind its async writes
        _drain_pending()
        pending = (wave, write_futs, meta, seen_full)
        _tock("checkpoint", _t)

        if frontier_count:
            frontier = split_refs_dataset(grp_refs, grp_rows)
            frontier_refs = grp_refs
        wave += 1

    _drain_pending()

    seen.write_final(os.path.join(workdir, "seen_final"))
    metrics = {
        "phase_seconds": {k: round(v, 2) for k, v in phase_s.items()},
        "waves": wave,
        "pages_fetched": lineage_counter,
        "urls_discovered": discovery_counter,
    }
    import json as _json

    with open(os.path.join(workdir, "metrics.json"), "w") as f:
        _json.dump(metrics, f, indent=1)
    return CrawlOutputs(
        workdir=workdir,
        waves=wave,
        pages_fetched=lineage_counter,
        urls_discovered=discovery_counter,
        metrics=metrics,
    )
