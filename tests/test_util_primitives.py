"""Unit tests for the wave-loop / exchange primitives in stages/util.py."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from web_crawler_search_engine_ray.stages.util import (
    bucket_exchange,
    coalesce_ref_list,
    dataset_from_known_refs,
    even_chunk,
    refs_and_counts,
    resplit_ref,
)


def test_even_chunk_properties():
    # large totals: task count is an exact multiple of width
    for total, width, floor in [(6300, 32, 128), (100_000, 64, 128), (8192, 16, 128)]:
        chunk = even_chunk(total, width, floor)
        ntasks = -(-total // chunk)
        rounds = -(-ntasks // width)
        assert ntasks <= rounds * width
        assert chunk >= 32
        # no ragged final round bigger than one task's slack
        assert rounds * width - ntasks < width
    # small totals spread across the full width (down to the 32-row floor)
    assert even_chunk(640, 32, 128) == 32
    # degenerate inputs
    assert even_chunk(0, 32, 128) == 128
    assert even_chunk(100, 0, 128) == 128


def test_known_refs_roundtrip_and_resplit(ray_session):
    import ray

    tbl = pa.table({"x": pa.array(range(1000), pa.int64())})
    ref = ray.put(tbl)
    ds = dataset_from_known_refs([ref], [1000], tbl.schema)
    assert ds.count() == 1000
    assert sorted(r["x"] for r in ds.take_all()) == list(range(1000))

    refs, counts = resplit_ref(ref, 1000, 8)
    assert sum(counts) == 1000
    ds2 = dataset_from_known_refs(refs, counts, tbl.schema)
    assert sorted(r["x"] for r in ds2.take_all()) == list(range(1000))


def test_coalesce_ref_list_preserves_rows(ray_session):
    import ray

    tables = [
        pa.table({"x": pa.array(range(i * 10, i * 10 + 10), pa.int64())})
        for i in range(20)
    ]
    refs = [ray.put(t) for t in tables]
    ds = coalesce_ref_list(refs, [10] * 20, tables[0].schema, 4)
    mat = ds.materialize()
    out_refs, out_counts = refs_and_counts(mat)
    assert len(out_refs) <= 5  # ~4 target blocks (+1 remainder)
    assert sorted(r["x"] for r in mat.take_all()) == list(range(200))


def test_bucket_exchange_equals_groupby(ray_session):
    """bucket_exchange(fn) over int buckets must equal
    groupby(bucket).map_groups(fn) row-for-row."""
    import ray
    import ray.data

    rng = np.random.RandomState(7)
    n = 20_000
    tbl = pa.table(
        {
            "k": pa.array(rng.randint(0, 1_000, n), pa.int64()),
            "v": pa.array(rng.randint(0, 100, n), pa.int64()),
            "bucket": pa.array(rng.randint(0, 16, n).astype(np.int32), pa.int32()),
        }
    )
    # split into uneven blocks
    ds = ray.data.from_arrow([tbl.slice(0, 7000), tbl.slice(7000, 5000), tbl.slice(12000)])

    def agg(t: pa.Table) -> pa.Table:
        g = t.group_by("k").aggregate([("v", "sum")])
        return pa.table({"k": g.column("k"), "s": g.column("v_sum")})

    mat = ds.materialize()
    got = (
        bucket_exchange(mat, "bucket", 16, agg)
        .to_pandas()
        .groupby("k")["s"]
        .sum()
        .sort_index()
    )

    def agg_drop(t: pa.Table) -> pa.Table:
        return agg(t.drop_columns(["bucket"]))

    want = (
        ds.groupby("bucket")
        .map_groups(agg_drop, batch_format="pyarrow")
        .to_pandas()
        .groupby("k")["s"]
        .sum()
        .sort_index()
    )
    assert got.equals(want)


def test_exchange_sum_by_key_property(ray_session):
    """Property sweep: exchange_sum_by_key == pandas groupby-sum across
    randomized shapes — empty blocks, single rows, negative values,
    key counts around/below/above the bucket width, many dtype layouts."""
    import ray
    import ray.data

    from web_crawler_search_engine_ray.stages.util import exchange_sum_by_key

    rng = np.random.RandomState(13)
    for trial in range(12):
        n = int(rng.choice([1, 2, 7, 100, 3_000]))
        nkeys = int(rng.choice([1, 2, 5, 50, 700]))
        nbuck = int(rng.choice([1, 2, 4, 16]))
        tbl = pa.table(
            {
                "key": pa.array(rng.randint(0, nkeys, n), pa.int64()),
                "a": pa.array(rng.randint(-1000, 1000, n), pa.int64()),
                "b": pa.array(rng.randint(0, 10, n), pa.int64()),
            }
        )
        cuts = sorted(rng.randint(0, n + 1, 2))
        blocks = [
            tbl.slice(0, cuts[0]),
            tbl.slice(cuts[0], cuts[1] - cuts[0]),  # possibly empty
            tbl.slice(cuts[1]),
        ]
        ds = ray.data.from_arrow(blocks).materialize()
        got = (
            exchange_sum_by_key(ds, "key", nbuck)
            .to_pandas()
            .set_index("key")
            .sort_index()
        )
        want = tbl.to_pandas().groupby("key")[["a", "b"]].sum().sort_index()
        assert got["a"].equals(want["a"]) and got["b"].equals(want["b"]), (
            f"trial {trial}: n={n} nkeys={nkeys} nbuck={nbuck}"
        )


def test_bucket_exchange_all_empty_buckets_schema(ray_session):
    """Regression (ADVICE r2): when every part of a bucket is empty the
    reduce must still return fn's OUTPUT schema, not the input schema."""
    import ray
    import ray.data

    tbl = pa.table(
        {
            "k": pa.array([1, 2, 3], pa.int64()),
            "bucket": pa.array([0, 0, 0], pa.int32()),  # bucket 1..7 empty
        }
    )

    def fn(t: pa.Table) -> pa.Table:
        return pa.table({"out": pa.array([t.num_rows], pa.int64())})

    ds = ray.data.from_arrow([tbl]).materialize()
    out = bucket_exchange(ds, "bucket", 8, fn)
    got = out.to_pandas()
    assert list(got.columns) == ["out"]
    assert sorted(got["out"].tolist()) == [0] * 7 + [3]
