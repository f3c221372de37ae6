"""Per-wave crawl checkpoints — PER-PARTITION and INCREMENTAL.

North-rule resumability ("every partition checkpoints its cuckoo-filter
state, queue cursor, and fetch lineage"): nothing whole-crawl-sized ever
funnels through the driver.

- **Queue cursor (frontier)**: the next wave's pending queue is written as
  per-block parquet by distributed tasks (pipelines/crawl.py
  ``_write_frontier_group``) straight into the wave's checkpoint dir; the
  next wave ``read_parquet``s it back. The checkpoint IS the wave handoff —
  one write, zero driver materialization.
- **Seen/cuckoo state**: each ``SeenShard`` actor appends an incremental
  DELTA parquet (only entries touched since its last flush) under
  ``seen/shard=S.parquet`` in the wave dir. Resume replays the per-shard
  delta chain in wave order (last-wins per URL); the cuckoo filter is
  rebuilt from the replayed ledger (state/seen.py). At 10^10 URLs a wave's
  delta is O(wave traffic), not O(total seen).
- **Fetch lineage** is already partition-checkpointed by the pages/lineage
  sinks (``workdir/lineage/wave=K/part-*.parquet``).

Atomicity: everything for wave K is written under ``wave=K.tmp/`` by tasks
and actors (shared filesystem assumption — the same one the pages/lineage
sinks already make on a multi-node cluster), then the driver stamps
``_COMPLETE`` and renames to ``wave=K/``. A torn wave leaves only a
``.tmp`` dir, ignored and cleared on resume.

Reference analogue: frontier.json written only on clean join
(web_crawler/crawler/__init__.py:38-46) — the engine is strictly stronger,
checkpointing every wave, and sharded where the reference is monolithic.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import List, Optional, Tuple


def ckpt_dir(workdir: str, wave: int) -> str:
    return os.path.join(workdir, "checkpoints", f"wave={wave:05d}")


def begin_checkpoint(workdir: str, wave: int) -> str:
    """Create the staging dir tasks/actors write into; returns its path."""
    tmp = ckpt_dir(workdir, wave) + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(os.path.join(tmp, "frontier"))
    os.makedirs(os.path.join(tmp, "seen"))
    return tmp


class HashImplMismatch(RuntimeError):
    """A checkpoint was written under a different URL-hash implementation.

    Seen-set shard routing, cuckoo fingerprints and doc-store bucket ids
    are all keyed on ``functions.urls.hash64_batch``; resuming state hashed
    by a different implementation would silently mis-route every lookup.
    Refusing is the only safe behavior — re-crawl or migrate offline.
    """


def check_hash_impl(meta: dict, source: str = "checkpoint") -> None:
    """Refuse to consume persisted hash-keyed state under a different
    hash implementation than the one that wrote it. Metas written before
    the stamp existed (round ≤3, polars-seeded era) are also refused: the
    current FNV-1a impl provably differs from the seeded xxhash they used.
    """
    from ..functions.urls import HASH_IMPL

    written = meta.get("url_hash_impl")
    if written != HASH_IMPL:
        raise HashImplMismatch(
            f"{source} was written with url_hash_impl={written!r} but this "
            f"build uses {HASH_IMPL!r}; refusing to resume (seen-set shard "
            "keys / bucket routing would mis-route). Start a fresh workdir "
            "or migrate the state offline."
        )


def finalize_checkpoint(workdir: str, wave: int, meta: dict) -> str:
    """Stamp meta + _COMPLETE and atomically publish wave=K.tmp → wave=K."""
    from ..functions.urls import HASH_IMPL

    final = ckpt_dir(workdir, wave)
    tmp = final + ".tmp"
    meta = dict(meta)
    meta.setdefault("url_hash_impl", HASH_IMPL)
    with open(os.path.join(tmp, "meta.json"), "w") as f:
        json.dump(meta, f)
    open(os.path.join(tmp, "_COMPLETE"), "w").close()
    if os.path.exists(final):
        shutil.rmtree(final)
    os.rename(tmp, final)
    return final


def latest_checkpoint(workdir: str) -> Optional[int]:
    root = os.path.join(workdir, "checkpoints")
    if not os.path.isdir(root):
        return None
    waves = []
    for name in os.listdir(root):
        if name.startswith("wave=") and not name.endswith(".tmp") and os.path.exists(
            os.path.join(root, name, "_COMPLETE")
        ):
            waves.append(int(name.split("=")[1]))
    return max(waves) if waves else None


def read_meta(workdir: str, wave: int) -> dict:
    with open(os.path.join(ckpt_dir(workdir, wave), "meta.json")) as f:
        return json.load(f)


def frontier_dir(workdir: str, wave: int) -> str:
    return os.path.join(ckpt_dir(workdir, wave), "frontier")


def seen_delta_files(workdir: str, upto_wave: int) -> List[Tuple[int, str]]:
    """All (shard_id, path) seen files needed to rebuild state as of
    ``upto_wave``, in replay order: from the most recent FULL snapshot
    wave (meta ``seen_full``) through ``upto_wave``'s deltas. Each shard
    filters to its own id."""
    start = 0
    for w in range(upto_wave, -1, -1):
        meta_path = os.path.join(ckpt_dir(workdir, w), "meta.json")
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                if json.load(f).get("seen_full"):
                    start = w
                    break
    out: List[Tuple[int, str]] = []
    for w in range(start, upto_wave + 1):
        d = os.path.join(ckpt_dir(workdir, w), "seen")
        if not os.path.isdir(d):
            continue
        for name in sorted(os.listdir(d)):
            if name.startswith("shard=") and name.endswith(".parquet"):
                out.append((int(name[len("shard="):-len(".parquet")]), os.path.join(d, name)))
    return out


def gc_frontiers(workdir: str, before_wave: int) -> int:
    """Drop consumed frontier payloads of waves < before_wave (resume only
    ever reads the LATEST complete wave's frontier; seen deltas stay until
    the next full-snapshot compaction)."""
    root = os.path.join(workdir, "checkpoints")
    if not os.path.isdir(root):
        return 0
    n = 0
    for name in os.listdir(root):
        if not name.startswith("wave=") or name.endswith(".tmp"):
            continue
        if int(name.split("=")[1]) < before_wave:
            f = os.path.join(root, name, "frontier")
            if os.path.isdir(f) and os.listdir(f):
                shutil.rmtree(f)
                os.makedirs(f)
                n += 1
    return n


def gc_checkpoints(workdir: str, before_wave: int) -> int:
    """Drop whole checkpoint dirs for waves < before_wave (safe once wave
    ``before_wave`` holds a FULL seen snapshot: resume never reads
    earlier state, and old frontiers are obsolete by construction).
    Bounds checkpoint storage and replay length at any crawl length."""
    root = os.path.join(workdir, "checkpoints")
    if not os.path.isdir(root):
        return 0
    n = 0
    for name in os.listdir(root):
        if not name.startswith("wave=") or name.endswith(".tmp"):
            continue
        if int(name.split("=")[1]) < before_wave:
            shutil.rmtree(os.path.join(root, name))
            n += 1
    return n


def clear_wave_outputs(workdir: str, after_wave: int) -> None:
    """Drop per-wave output partitions and torn checkpoints beyond the
    resume point so re-run waves don't double-write."""
    for sub in ("pages", "lineage", "tokens", "page_lengths"):
        root = os.path.join(workdir, sub)
        if not os.path.isdir(root):
            continue
        for name in os.listdir(root):
            if name.startswith("wave=") and int(name.split("=")[1]) > after_wave:
                shutil.rmtree(os.path.join(root, name))
    croot = os.path.join(workdir, "checkpoints")
    if os.path.isdir(croot):
        for name in os.listdir(croot):
            if not name.startswith("wave="):
                continue
            if name.endswith(".tmp"):
                shutil.rmtree(os.path.join(croot, name))
                continue
            if int(name.split("=")[1]) > after_wave:
                shutil.rmtree(os.path.join(croot, name))
