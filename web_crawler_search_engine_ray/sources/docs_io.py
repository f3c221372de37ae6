"""Docs-store I/O gate: Lance when importable, Parquet fallback.

The north-rule input is "Lance tables of interleaved text + media
documents" (BASELINE.json input_hint). Lance is not installed in this
environment, so every pipeline runs on the Parquet fallback — but the
format choice is isolated HERE: callers say ``write_docs`` / ``read_docs``
and get the same ``ray.data.Dataset`` / schema either way (schema.py
DOCS_SCHEMA). When the ``lance`` wheel is present, writes produce a Lance
dataset and reads use ``ray.data.read_lance`` (which supports the same
column pruning the Parquet path relies on); the fetch stage's keyed
``take`` maps to Lance ``take`` row access.
"""

from __future__ import annotations

import os
from typing import List, Optional

import pyarrow as pa

try:  # pragma: no cover - exercised only where the wheel exists
    import lance  # noqa: F401

    HAVE_LANCE = True
except ImportError:
    HAVE_LANCE = False


def docs_format() -> str:
    return "lance" if HAVE_LANCE else "parquet"


def write_docs(table: pa.Table, out_dir: str, name: str = "docs") -> str:
    """Write a docs table; returns the path readers should use."""
    os.makedirs(out_dir, exist_ok=True)
    if HAVE_LANCE:
        path = os.path.join(out_dir, f"{name}.lance")
        lance.write_dataset(table, path, mode="overwrite")
        return path
    import pyarrow.parquet as pq

    path = os.path.join(out_dir, f"{name}.parquet")
    pq.write_table(table, path)
    return path


def read_docs(path: str, columns: Optional[List[str]] = None):
    """Lazy Ray Dataset over a docs store (column-pruned scan)."""
    import ray.data

    if path.endswith(".lance"):
        ds = ray.data.read_lance(path, columns=columns)
        return ds
    return ray.data.read_parquet(path, columns=columns)


def read_docs_table(path: str, columns: Optional[List[str]] = None) -> pa.Table:
    """Eager Arrow read (driver-side small stores / tests)."""
    if path.endswith(".lance"):
        return lance.dataset(path).to_table(columns=columns)
    import pyarrow.parquet as pq

    return pq.read_table(path, columns=columns)


def take_docs(
    path: str, indices: List[int], columns: Optional[List[str]] = None
) -> pa.Table:
    """Random row access by position — the fetch join's keyed read.

    On Lance this is the native ``dataset.take(indices, columns=...)``
    (O(rows requested), the 100 TB path); the Parquet fallback reads the
    pruned columns and takes in memory (small-store/test path only — the
    production Parquet equivalent is the bucketed store in stages/fetch.py,
    which prunes by row-group instead)."""
    idx = list(indices)
    if path.endswith(".lance"):
        return lance.dataset(path).take(idx, columns=columns)
    import pyarrow.parquet as pq

    return pq.read_table(path, columns=columns).take(idx)
