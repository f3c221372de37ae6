"""Empty-partition robustness gate: every sf-table-reading queries() entry
must handle ZERO-ROW input tables (with the real testdata schemas) the way
its own DuckDB oracle does — same columns, same row count, same values.

At 100 TB an empty partition/table slice is a normal execution state
(skewed filters, resumed runs, fresh shards); an operator that crashes on
it crashes the job — and some aggregates legitimately return a zeros ROW
on empty input (e.g. a global funnel count), which only the oracle
comparison pins down. The conformance-web queries (crawl/index/search/
multimodal) synthesize their own input and are exercised elsewhere.
"""

from __future__ import annotations

import os
import sys

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF_SRC = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# conformance-web / multimodal queries don't read the sf tables
NON_SF = {
    "crawl_lineage",
    "crawl_frequencies",
    "crawl_page_lengths",
    "index_postings",
    "search_results",
    "search_contexts",
    "multimodal_features",
    "multimodal_resize",
    "multimodal_frames",
    "multimodal_phash_pairs",
}


@pytest.fixture(scope="session")
def empty_sf_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        schema = pq.read_schema(os.path.join(SF_SRC, f"{t}.parquet"))
        pq.write_table(schema.empty_table(), os.path.join(out, f"{t}.parquet"))
    return str(out)


@pytest.fixture(scope="session")
def empty_duck(empty_sf_dir):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{empty_sf_dir}/{t}.parquet')"
        )
    return con


def _query_names():
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E

    return sorted(set(E.queries()) - NON_SF)


def _to_df(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray.data.Dataset


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", _query_names())
def test_query_on_empty_tables(ray_session, empty_sf_dir, empty_duck, name):
    import __ray_entry__ as E

    rdf = _to_df(E.queries()[name](empty_sf_dir))  # must not raise
    oracle = E.oracle_sql().get(name)
    if oracle is None:
        return
    odf = empty_duck.execute(oracle).df()
    assert sorted(rdf.columns) == sorted(odf.columns)
    assert len(rdf) == len(odf)
    if len(odf):
        a, b = _canon(rdf), _canon(odf)
        for c in a.columns:
            if pd.api.types.is_float_dtype(a[c]) or pd.api.types.is_float_dtype(
                b[c]
            ):
                import numpy as np

                assert np.allclose(
                    a[c].astype(float),
                    b[c].astype(float),
                    rtol=1e-9,
                    atol=1e-9,
                    equal_nan=True,
                ), c
            else:
                assert (a[c].astype(str).values == b[c].astype(str).values).all(), c
