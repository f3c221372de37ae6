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


def test_seed_registration_does_not_collide_with_wave0_links(ray_session):
    """The retry-idempotency rule (a url registered in the SAME wave and
    not downloaded answers True again) must not re-admit seeds during the
    wave-0 link phase: run_crawl registers seeds with wave=-1, so a
    carried-over seed re-extracted from a wave-0 page is NOT re-added
    (matching the oracle's add_url, which never re-adds a seen url)."""
    from web_crawler_search_engine_ray.state.seen import SeenSet

    seen = SeenSet(num_shards=2, capacity_per_shard=128)
    seed = "https://h0.example.org/seed"
    assert seen.test_and_add([seed], wave=-1).all()  # seed registration
    # wave-0 link phase rediscovers the (not yet fetched) seed
    assert not seen.test_and_add([seed], wave=0).any()
    # genuine retry idempotency still holds: a url registered by the
    # wave-0 link phase answers True again within wave 0
    fresh = "https://h0.example.org/new"
    assert seen.test_and_add([fresh], wave=0).all()
    assert seen.test_and_add([fresh], wave=0).all()
    assert not seen.test_and_add([fresh], wave=1).any()


def test_mark_complete_unregistered_keeps_filter_invariant(ray_session):
    """mark_complete on a never-registered url must insert the url's
    fingerprint into the cuckoo filter — otherwise a later test_and_add
    gets filter-no, declares the url NEW, and erases the downloaded mark
    (the filter's no-false-negatives invariant)."""
    from web_crawler_search_engine_ray.state.seen import SeenSet

    seen = SeenSet(num_shards=2, capacity_per_shard=128)
    url = "https://h1.example.org/direct-complete"
    seen.mark_complete([url], [42])
    assert not seen.test_and_add([url], wave=3).any()  # not NEW
    snap = {r["url"]: (r["downloaded"], r["length"]) for r in seen.snapshot().to_pylist()}
    assert snap[url] == (True, 42)  # the downloaded mark survived
