"""Per-wave crawl checkpoints: seen-set snapshot, frontier (queue cursor),
counters — written atomically (tmp dir + rename + _COMPLETE marker) so a
killed run resumes from the last complete wave with exact replay
(north_rule resumability; reference analogue: frontier.json written only on
clean join, web_crawler/crawler/__init__.py:38-46 — the engine is strictly
stronger, checkpointing EVERY wave).

Layout under <workdir>/checkpoints/wave=K/:
    frontier/*.parquet   pending queue with discovery order
    seen/*.parquet       per-shard ledger snapshot (concatenated)
    meta.json            counters + first-seen host set
    _COMPLETE            atomicity marker
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Optional

import pyarrow as pa
import pyarrow.parquet as pq


def _ckpt_dir(workdir: str, wave: int) -> str:
    return os.path.join(workdir, "checkpoints", f"wave={wave:05d}")


def write_checkpoint(
    workdir: str,
    wave: int,
    frontier_table: pa.Table,
    seen_table: pa.Table,
    meta: dict,
) -> None:
    final = _ckpt_dir(workdir, wave)
    tmp = final + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(os.path.join(tmp, "frontier"))
    os.makedirs(os.path.join(tmp, "seen"))
    pq.write_table(frontier_table, os.path.join(tmp, "frontier", "part-0.parquet"))
    pq.write_table(seen_table, os.path.join(tmp, "seen", "part-0.parquet"))
    with open(os.path.join(tmp, "meta.json"), "w") as f:
        json.dump(meta, f)
    open(os.path.join(tmp, "_COMPLETE"), "w").close()
    if os.path.exists(final):
        shutil.rmtree(final)
    os.rename(tmp, final)


def latest_checkpoint(workdir: str) -> Optional[int]:
    root = os.path.join(workdir, "checkpoints")
    if not os.path.isdir(root):
        return None
    waves = []
    for name in os.listdir(root):
        if name.startswith("wave=") and os.path.exists(
            os.path.join(root, name, "_COMPLETE")
        ):
            waves.append(int(name.split("=")[1]))
    return max(waves) if waves else None


def read_checkpoint(workdir: str, wave: int) -> tuple:
    d = _ckpt_dir(workdir, wave)
    frontier = pq.read_table(os.path.join(d, "frontier", "part-0.parquet"))
    seen = pq.read_table(os.path.join(d, "seen", "part-0.parquet"))
    with open(os.path.join(d, "meta.json")) as f:
        meta = json.load(f)
    return frontier, seen, meta


def clear_wave_outputs(workdir: str, after_wave: int) -> None:
    """Drop per-wave output partitions beyond the resume point so re-run
    waves don't double-write (write_parquet appends uniquely-named files)."""
    for sub in ("pages", "lineage", "tokens", "page_lengths"):
        root = os.path.join(workdir, sub)
        if not os.path.isdir(root):
            continue
        for name in os.listdir(root):
            if name.startswith("wave=") and int(name.split("=")[1]) > after_wave:
                shutil.rmtree(os.path.join(root, name))
