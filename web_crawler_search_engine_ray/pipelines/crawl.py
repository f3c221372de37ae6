"""The crawl: a driver-side BFS wave loop over Ray Data stages.

Ray Data has no cyclic dataflow, so the frontier loop is driver iteration
(SURVEY.md §4 decision 2): each wave is a bounded Dataset flowing

    frontier ── groupby(host) politeness schedule ──┐
        ├─ blocked → seen.mark_complete             │
        ├─ carryover ─────────────────────────────► next wave
        └─ dispatched ─ sort(virtual_ts,host,seq) ─ zip_with_index
             └─ map_batches(FetchStage actor pool)  [the docs-table join]
                  ├─ pages sink (wave-partitioned parquet)
                  ├─ lineage sink
                  ├─ analytics (crawl tokenize → token partials, lengths)
                  └─ link extraction → validity → normalize
                       └─ groupby(url) within-wave first-wins dedup
                            └─ seen-shard test_and_add (batched RPC)
                                 └─ sort(parent_seq, offset) → discovery_seq
                                      └─ union carryover → next frontier

Every per-wave artifact is written under ``workdir`` partitioned by wave
(resumable output); the seen/frontier/counters checkpoint after each wave
enables kill/resume with exact replay (state/checkpoint.py).
Determinism: dispatch order is (virtual_ts, host, discovery_seq);
discovery order is (parent dispatch seq, span offset) — both reproduced by
the oracle (oracle.py) and asserted equal in tests.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

from ..functions import urls as U
from ..sources.synthetic_web import CrawlConfig
from ..stages import schedule as SCH
from ..stages.extract import analyze_batch, explode_token_partials, extract_links_batch
from ..stages.fetch import make_fetch_fn, filter_scrapeable
from ..stages.util import zip_with_index_counted
from ..state.checkpoint import (
    clear_wave_outputs,
    latest_checkpoint,
    read_checkpoint,
    write_checkpoint,
)
from ..state.robots import RobotsCache
from ..state.seen import SeenSet


@dataclass
class CrawlOutputs:
    workdir: str
    waves: int
    pages_fetched: int
    urls_discovered: int

    def lineage(self) -> "ray.data.Dataset":
        return ray.data.read_parquet(os.path.join(self.workdir, "lineage")).sort("seq")

    def pages(self) -> "ray.data.Dataset":
        return ray.data.read_parquet(os.path.join(self.workdir, "pages"))

    def frequencies(self) -> "ray.data.Dataset":
        from ray.data.aggregate import Sum

        ds = ray.data.read_parquet(os.path.join(self.workdir, "tokens"))
        return ds.groupby("token").aggregate(Sum("count", alias_name="count"))

    def page_lengths(self) -> "ray.data.Dataset":
        return ray.data.read_parquet(os.path.join(self.workdir, "page_lengths"))

    def seen(self) -> pa.Table:
        return pq.read_table(os.path.join(self.workdir, "seen_final.parquet"))


def _wave_dir(workdir: str, sub: str, wave: int) -> str:
    d = os.path.join(workdir, sub, f"wave={wave:05d}")
    os.makedirs(d, exist_ok=True)
    return d


def _frontier_dataset(rows: List[dict]) -> "ray.data.Dataset":
    tbl = pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [
                ("url", pa.string()),
                ("host", pa.string()),
                ("discovery_seq", pa.int64()),
                ("depth", pa.int32()),
            ]
        ),
    )
    return ray.data.from_arrow(tbl)


def run_crawl(
    docs_path: str,
    robots_bodies: Dict[str, str],
    seed_urls: List[str],
    config: CrawlConfig,
    workdir: str,
    resume: bool = False,
    fetch_concurrency: int = 2,
    max_waves: int = 100_000,
) -> CrawlOutputs:
    """Run the crawl to frontier exhaustion. Ray must already be initialised
    by the caller."""
    os.makedirs(workdir, exist_ok=True)
    seen = SeenSet(num_shards=config.num_seen_shards)
    robots = RobotsCache(robots_bodies, num_shards=max(2, config.num_seen_shards // 2))

    ckpt_wave = latest_checkpoint(workdir) if resume else None
    if ckpt_wave is not None:
        frontier_tbl, seen_tbl, meta = read_checkpoint(workdir, ckpt_wave)
        seen.restore(seen_tbl)
        clear_wave_outputs(workdir, ckpt_wave)
        frontier = ray.data.from_arrow(frontier_tbl)
        frontier_count = frontier_tbl.num_rows
        wave = ckpt_wave + 1
        lineage_counter = meta["lineage_counter"]
        discovery_counter = meta["discovery_counter"]
        seen_hosts = set(meta["seen_hosts"])
    else:
        # seed registration mirrors Frontier.__init__ restart path
        # (frontier.py:33-36): normalize + first-wins dedup, discovery
        # order = seed order.
        normd = U.normalize_batch(seed_urls)
        uniq, seen_set = [], set()
        for u in normd:
            if u not in seen_set:
                seen_set.add(u)
                uniq.append(u)
        seen.test_and_add(uniq, wave=0)
        rows = [
            {"url": u, "host": U.host_of(u), "discovery_seq": i, "depth": 0}
            for i, u in enumerate(uniq)
        ]
        frontier = _frontier_dataset(rows)
        frontier_count = len(rows)
        wave = 0
        lineage_counter = 0
        discovery_counter = len(rows)
        seen_hosts: set = set()

    root_domains = tuple(config.root_domains)
    user_agent = config.user_agent

    frontier_hosts: Optional[List[str]] = None  # derived from checkpoint tbl

    while frontier_count > 0 and wave < max_waves:
        wave_start = wave * config.wave_span

        # --- schedule (politeness + robots) ---
        if frontier_hosts is None:
            frontier_hosts = frontier.unique("host")
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
        scheduled = (
            frontier.map_batches(robots_fn, batch_format="pyarrow")
            .groupby("host")
            .map_groups(schedule_fn, batch_format="pandas")
            .materialize()
        )

        # --- robots-blocked: marked complete, never fetched ---
        def _mark_blocked(batch: pa.Table) -> pa.Table:
            seen.mark_complete(batch.column("url").to_pylist())
            return batch.select(["url"])

        scheduled.filter(
            expr=f"action == {SCH.ACTION_BLOCKED}"
        ).map_batches(_mark_blocked, batch_format="pyarrow").count()

        # --- dispatched, in deterministic dispatch order ---
        dispatched = scheduled.filter(expr=f"action == {SCH.ACTION_FETCH}")
        ordered, n_dispatched = zip_with_index_counted(
            dispatched.sort(["virtual_ts", "host", "discovery_seq"]),
            "seq",
            lineage_counter,
        )
        if n_dispatched:
            lineage_counter += n_dispatched

            fetched = (
                ordered.drop_columns(["action"])
                .map_batches(
                    make_fetch_fn(docs_path),
                    batch_format="pyarrow",
                    num_cpus=1,
                )
                .materialize()
            )

            # pages sink (S2 save_page analogue), wave-partitioned
            fetched.write_parquet(_wave_dir(workdir, "pages", wave))

            # lineage sink; dispatched URLs also marked complete here
            # (lengths for scrapeable pages backfilled below)
            wv = wave

            def _lineage(batch: pa.Table) -> pa.Table:
                seen.mark_complete(batch.column("url").to_pylist())
                out = batch.select(["seq", "url", "host", "virtual_ts", "status"])
                return out.append_column(
                    "wave", pa.array(np.full(batch.num_rows, wv, dtype=np.int32))
                )

            fetched.map_batches(_lineage, batch_format="pyarrow").write_parquet(
                _wave_dir(workdir, "lineage", wave)
            )

            # --- analytics over scrapeable pages (A1/A2) ---
            scrapeable = fetched.map_batches(filter_scrapeable, batch_format="pyarrow")
            analyzed = scrapeable.map_batches(
                analyze_batch, batch_format="pyarrow"
            ).materialize()

            analyzed.map_batches(
                explode_token_partials, batch_format="pyarrow"
            ).write_parquet(_wave_dir(workdir, "tokens", wave))

            # page-length sink doubles as the ledger length backfill
            def _mark_lengths(batch: pa.Table) -> pa.Table:
                seen.mark_complete(
                    batch.column("url").to_pylist(),
                    batch.column("length").to_pylist(),
                )
                return batch.select(["url", "seq", "length"])

            analyzed.map_batches(_mark_lengths, batch_format="pyarrow").write_parquet(
                _wave_dir(workdir, "page_lengths", wave)
            )

            # --- link extraction → candidates ---
            links = scrapeable.map_batches(
                lambda b: extract_links_batch(b, root_domains),
                batch_format="pyarrow",
            )

            # within-wave first-wins dedup: keep min (parent_seq, offset)
            def _first_wins(df):
                return df.sort_values(["parent_seq", "offset"], kind="stable").head(1)

            deduped = links.groupby("url").map_groups(
                _first_wins, batch_format="pandas"
            )

            # cross-wave dedup via seen shards (batched, idempotent)
            wv_ = wave

            def _seen_filter(batch: pa.Table) -> pa.Table:
                urls = batch.column("url").to_pylist()
                if not urls:
                    return batch
                mask = seen.test_and_add(urls, wave=wv_)
                return batch.filter(pa.array(mask))

            fresh = deduped.map_batches(_seen_filter, batch_format="pyarrow")
        else:
            fresh = None

        # --- assemble next frontier ---
        carry = scheduled.filter(expr=f"action == {SCH.ACTION_CARRY}").drop_columns(
            ["action", "virtual_ts"]
        )
        carry, n_carry = zip_with_index_counted(carry, "_c", 0)

        parts = []
        if n_carry:
            parts.append(carry.select_columns(["url", "host", "discovery_seq", "depth"]))
        n_fresh = 0
        if fresh is not None:
            ordered_fresh, n_fresh = zip_with_index_counted(
                fresh.sort(["parent_seq", "offset"]),
                "discovery_seq",
                discovery_counter,
            )
            discovery_counter += n_fresh
            if n_fresh:
                parts.append(
                    ordered_fresh.select_columns(
                        ["url", "host", "discovery_seq", "depth"]
                    )
                )
        if len(parts) == 2:
            frontier = parts[0].union(parts[1]).materialize()
        elif parts:
            frontier = parts[0].materialize()
        else:
            frontier = None
        frontier_count = n_carry + n_fresh

        # --- checkpoint ---
        frontier_tbl = (
            pa.concat_tables(ray.get(frontier.to_arrow_refs()))
            if frontier is not None
            else pa.Table.from_pylist([], schema=pa.schema(
                [("url", pa.string()), ("host", pa.string()),
                 ("discovery_seq", pa.int64()), ("depth", pa.int32())]))
        )
        # next wave's host set, from the already-collected checkpoint table
        # (saves a unique() shuffle execution per wave)
        frontier_hosts = pa.compute.unique(frontier_tbl.column("host")).to_pylist()
        write_checkpoint(
            workdir,
            wave,
            frontier_tbl,
            seen.snapshot(),
            {
                "lineage_counter": lineage_counter,
                "discovery_counter": discovery_counter,
                "seen_hosts": sorted(seen_hosts),
                "wave": wave,
            },
        )
        wave += 1

    seen_final = seen.snapshot()
    pq.write_table(seen_final, os.path.join(workdir, "seen_final.parquet"))
    return CrawlOutputs(
        workdir=workdir,
        waves=wave,
        pages_fetched=lineage_counter,
        urls_discovered=discovery_counter,
    )
