"""Mimic the driver's correctness gate: run queries() vs oracle_sql() at sf0.01."""
import hashlib
import sys
import time

import duckdb
import pandas as pd
import pyarrow as pa
import ray

sys.path.insert(0, "/root/repo")

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = [n for a in sys.argv[2:] for n in a.split(",") if n] or None

ray.init(address="local", num_cpus=16, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

import __ray_entry__ as E

con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

qs = E.queries()
oracles = E.oracle_sql()


def to_df(x):
    if isinstance(x, pd.DataFrame):
        return x
    if isinstance(x, pa.Table):
        return x.to_pandas()
    return x.to_pandas()  # ray Dataset


def canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def vhash(df):
    return hashlib.sha256(pd.util.hash_pandas_object(df, index=False).values.tobytes()).hexdigest()[:12]


fail = 0
for name, fn in qs.items():
    if ONLY and name not in ONLY:
        continue
    t0 = time.time()
    try:
        rdf = to_df(fn(SF))
    except Exception as e:
        print(f"{name}: RAY-ERROR {type(e).__name__}: {e}")
        fail += 1
        continue
    rt = time.time() - t0
    if name not in oracles:
        print(f"{name}: rows-only, {len(rdf)} rows, {rt:.1f}s")
        continue
    try:
        odf = con.execute(oracles[name]).df()
    except Exception as e:
        print(f"{name}: SQL-ERROR {e}")
        fail += 1
        continue
    rc, oc = sorted(rdf.columns), sorted(odf.columns)
    if rc != oc:
        print(f"{name}: SCHEMA-MISMATCH ray={rc} oracle={oc}")
        fail += 1
        continue
    if len(rdf) != len(odf):
        print(f"{name}: ROWCOUNT-MISMATCH ray={len(rdf)} oracle={len(odf)}")
        fail += 1
        continue
    a, b = canon(rdf), canon(odf)
    # numeric tolerance compare
    ok = True
    for c in a.columns:
        if pd.api.types.is_float_dtype(a[c]) or pd.api.types.is_float_dtype(b[c]):
            import numpy as np

            if not np.allclose(a[c].astype(float), b[c].astype(float), rtol=1e-9, atol=1e-9, equal_nan=True):
                ok = False
                break
        else:
            if not (a[c].astype(str).values == b[c].astype(str).values).all():
                ok = False
                break
    # the driver's hash is dtype-sensitive: surface any dtype divergence
    dtm = [
        (c, str(a[c].dtype), str(b[c].dtype))
        for c in a.columns
        if str(a[c].dtype) != str(b[c].dtype)
    ]
    h = "HASH-OK" if vhash(a) == vhash(b) and not dtm else ("VAL-OK" if ok else "VALUE-MISMATCH")
    if dtm and h != "VALUE-MISMATCH":
        print(f"{name}: DTYPE-DIVERGENCE {dtm}")
    if h == "VALUE-MISMATCH":
        fail += 1
        print(f"{name}: {h} col={c} rows={len(rdf)} {rt:.1f}s")
        print(a.head(3))
        print(b.head(3))
    else:
        print(f"{name}: {h} rows={len(rdf)} {rt:.1f}s")

print(f"\nFAILURES: {fail}")
ray.shutdown()
