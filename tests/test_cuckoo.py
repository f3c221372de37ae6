"""Cuckoo-filter contract tests: a 'no' must be authoritative (zero false
negatives) even past capacity; false-positive rate sane; state round-trip."""

from __future__ import annotations

import numpy as np

from web_crawler_search_engine_ray.state.cuckoo import CuckooFilter


def _hashes(n, seed):
    rng = np.random.RandomState(seed)
    return rng.randint(1, 2**63, size=n, dtype=np.int64).astype(np.uint64)


def test_no_false_negatives_under_overflow():
    f = CuckooFilter(capacity=256)
    keys = _hashes(2000, 1)  # way past capacity -> forced evictions/stash
    f.add_batch(keys)
    assert f.contains_batch(keys).all()


def test_false_positive_rate_reasonable():
    f = CuckooFilter(capacity=1 << 14)
    keys = _hashes(10_000, 2)
    f.add_batch(keys)
    probe = _hashes(20_000, 3)
    inserted = set(int(k) for k in keys)
    fresh = np.array([k for k in probe if int(k) not in inserted], dtype=np.uint64)
    fp_rate = f.contains_batch(fresh).mean()
    assert fp_rate < 0.02, fp_rate


def test_state_round_trip():
    f = CuckooFilter(capacity=128)
    keys = _hashes(600, 4)
    f.add_batch(keys)
    g = CuckooFilter.from_state(f.state())
    assert g.contains_batch(keys).all()
    assert g.count == f.count


def test_seen_shard_filter_autogrow(ray_session):
    """SeenSet stays exact while its cuckoo filters grow past their initial
    capacity (rebuild-from-ledger path)."""
    from web_crawler_search_engine_ray.state.seen import SeenSet

    seen = SeenSet(num_shards=2, capacity_per_shard=128)
    urls = [f"https://h{i % 7}.example.org/p{i}" for i in range(3000)]
    first = seen.test_and_add(urls, wave=0)
    assert first.all()
    seen.mark_complete(urls)
    again = seen.test_and_add(urls, wave=1)
    assert not again.any()
    stats = seen.stats()
    assert sum(s["keys"] for s in stats) == 3000
