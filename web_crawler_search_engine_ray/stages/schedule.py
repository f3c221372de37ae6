"""Politeness wave scheduler: groupby(host) + per-group virtual-time slots.

Re-expression of Frontier.get_tbd_url's politeness/robots gate
(web_crawler/crawler/frontier.py:84-135) under the virtual-time wave model
(SURVEY.md §7.4, same spec as oracle.oracle_crawl):

- the ``groupby("host")`` hash shuffle is the per-host serialization the
  reference got from its shared clock dict — each host's pending URLs land
  in one group, ordered by discovery_seq (FIFO);
- effective delay d = max(robots crawl_delay, politeness)
  (frontier.py:128); slots per wave = max(1, ⌊Δ/d⌋); slot i dispatches at
  virtual_ts = wave_start + i·d; a host's first-ever wave spends slot 0 on
  the robots fetch (create_robot clock stamp, frontier.py:75-77);
- robots-disallowed URLs are marked complete without burning a slot
  (frontier.py:112-114);
- unscheduled URLs carry over with preserved discovery order (the
  reference's requeue-to-tail busy-rotation becomes explicit carryover —
  no spinning).

ACTION_FETCH rows then sort globally by (virtual_ts, host, discovery_seq)
— the deterministic total dispatch order.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import pyarrow as pa

import ray

ACTION_FETCH = 0
ACTION_CARRY = 1
ACTION_BLOCKED = 2


def make_robots_fn(robots_shards, num_robot_shards: int, user_agent: str):
    """Batch pre-pass appending an ``allowed`` column: group the batch's
    URLs by robots shard, issue ONE can_fetch_multi RPC per shard (in
    flight concurrently), scatter results back — RPC count scales with
    batches × shards, not host groups."""
    import pyarrow as pa

    from ..functions.urls import hash64_batch

    def robots_batch(batch: "pa.Table") -> "pa.Table":
        urls = batch.column("url").to_pylist()
        hosts = batch.column("host").to_pylist()
        if not urls:
            return batch.append_column("allowed", pa.array([], pa.bool_()))
        shard_ids = (
            hash64_batch(hosts) % np.uint64(num_robot_shards)
        ).astype(np.int64)
        allowed = np.ones(len(urls), dtype=bool)
        futs = []
        for s in np.unique(shard_ids):
            idx = np.nonzero(shard_ids == s)[0]
            futs.append(
                (
                    idx,
                    robots_shards[int(s)].can_fetch_multi.remote(
                        [hosts[i] for i in idx], user_agent, [urls[i] for i in idx]
                    ),
                )
            )
        for idx, fut in futs:
            allowed[idx] = ray.get(fut)
        return batch.append_column("allowed", pa.array(allowed, pa.bool_()))

    return robots_batch


def make_schedule_fn(
    host_meta_ref,
    wave_start: float,
    wave_span: float,
    politeness: float,
):
    """Build the per-host map_groups callable. host_meta_ref is a ray.put
    broadcast of {host: (crawl_delay, is_first_wave)} computed once per wave
    on the driver; per-URL robots permission arrives precomputed in the
    ``allowed`` column (make_robots_fn pre-pass)."""

    def schedule_group(tbl: "pa.Table") -> "pa.Table":
        # Arrow in/out (zero-copy from the shuffle; the hottest per-wave
        # stage never round-trips through pandas). The kernel itself is
        # numpy over zero-copy column views.
        host_meta: Dict[str, tuple] = ray.get(host_meta_ref)
        dseq = tbl.column("discovery_seq").to_numpy(zero_copy_only=False)
        if "priority" in tbl.column_names:
            # user priority hook (SURVEY §2.11): lower value dispatches
            # first; FIFO (discovery order) breaks ties — the reference's
            # queue order is the all-equal-priority case
            prio = tbl.column("priority").to_numpy(zero_copy_only=False)
            order = np.lexsort((dseq, prio))
            tbl = tbl.drop_columns(["priority"])
        else:
            order = np.argsort(dseq, kind="stable")
        tbl = tbl.take(pa.array(order, pa.int64()))
        host = tbl.column("host")[0].as_py()
        crawl_delay, first_wave = host_meta[host]
        allowed = (
            tbl.column("allowed").to_numpy(zero_copy_only=False).astype(bool)
        )

        delay = max(crawl_delay, politeness)
        slots = max(1, int(wave_span / delay))
        slot_start = 1 if first_wave else 0

        # vectorized slot assignment: blocked URLs never burn a slot
        # (frontier.py:112-114); allowed URLs take slots in FIFO order until
        # the wave budget is spent, the rest carry over.
        n = tbl.num_rows
        action = np.full(n, ACTION_CARRY, dtype=np.int8)
        vts = np.full(n, np.nan, dtype=np.float64)
        action[~allowed] = ACTION_BLOCKED
        slot_idx = np.cumsum(allowed) - 1 + slot_start
        fetch = allowed & (slot_idx < slots)
        action[fetch] = ACTION_FETCH
        vts[fetch] = wave_start + slot_idx[fetch] * delay
        return (
            tbl.drop_columns(["allowed"])
            .append_column("action", pa.array(action, pa.int8()))
            .append_column("virtual_ts", pa.array(vts, pa.float64()))
        )

    return schedule_group
