"""Oracle-parity gate for the TAIL of the driver registry.

The driver's correctness gate samples only the first 50 queries() entries,
so every rotation demotes some queries out of driver coverage (ADVICE r4:
"coverage loss is bounded" only if something else checks them). This test
IS that something: every tail entry (positions 51+) runs against its
DuckDB oracle at sf0.001 on every pytest run — same canonicalization as
the driver (columns sorted by name, rows sorted by values, dtype-exact) —
so a kernel regression in a demoted query fails CI even though the driver
never samples it.
"""

from __future__ import annotations

import hashlib
import importlib.util
import os

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

_spec = importlib.util.spec_from_file_location(
    "__wcse_entry_tail__",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "__ray_entry__.py",
    ),
)
_entry = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_entry)

_ALL = list(_entry.queries())
TAIL = _ALL[50:]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _vhash(df: pd.DataFrame) -> str:
    return hashlib.sha256(
        pd.util.hash_pandas_object(df, index=False).values.tobytes()
    ).hexdigest()


def test_tail_is_the_expected_set():
    """The head is exactly 50 and the tail holds no never-driver-checked
    query: every tail entry must also carry an oracle (no silent
    rows-only demotions)."""
    assert len(_ALL) >= 51
    oracles = _entry.oracle_sql()
    assert all(n in oracles for n in TAIL), [n for n in TAIL if n not in oracles]


@pytest.mark.parametrize("name", TAIL)
def test_tail_query_matches_oracle(name, ray_session, duck):
    res = _entry.queries()[name](SF)
    if isinstance(res, pd.DataFrame):
        rdf = res
    elif isinstance(res, pa.Table):
        rdf = res.to_pandas()
    else:
        rdf = res.to_pandas()
    odf = duck.execute(_entry.oracle_sql()[name]).df()
    assert sorted(rdf.columns) == sorted(odf.columns)
    assert len(rdf) == len(odf)
    a, b = _canon(rdf), _canon(odf)
    dt = [
        (c, str(a[c].dtype), str(b[c].dtype))
        for c in a.columns
        if str(a[c].dtype) != str(b[c].dtype)
    ]
    assert not dt, f"dtype divergence (driver hash is dtype-sensitive): {dt}"
    assert _vhash(a) == _vhash(b), f"value hash mismatch for {name}"
