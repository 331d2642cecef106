"""Mirrors the driver's correctness gate: every ``queries()`` entry runs
on Spark at sf0.01 and must match its ``oracle_sql()`` run by DuckDB on
the same parquet — row count, column names, and values (order-insensitive).
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as E

from .conftest import SF_ORACLE

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_ORACLE}/{t}.parquet'")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Fully string-canonical form: floats rounded to 9 dp, nulls of any
    dtype → '<NULL>', so dtype differences (e.g. DuckDB NULL column read
    as float64) can't cause spurious mismatches."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(9)
        df[c] = df[c].map(lambda v: "<NULL>" if pd.isna(v) else str(v))
    return df.sort_values(by=list(df.columns), kind="mergesort") \
             .reset_index(drop=True)


QUERY_NAMES = sorted(E.queries().keys())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(name, spark, ddb):
    if name not in E.oracle_sql():
        # deliberately oracle-less (iterative, non-SQL-expressible):
        # the driver applies a rows-only check; mirror that here
        sdf = E.queries()[name](spark, SF_ORACLE)
        assert sdf.count() >= 0
        return
    sdf = E.queries()[name](spark, SF_ORACLE).toPandas()
    odf = ddb.sql(E.oracle_sql()[name]).df()
    assert sorted(sdf.columns) == sorted(odf.columns), (
        f"column mismatch: {sorted(sdf.columns)} vs {sorted(odf.columns)}")
    assert len(sdf) == len(odf), f"row count {len(sdf)} vs {len(odf)}"
    a, b = _canon(sdf), _canon(odf)
    mism = []
    for c in a.columns:
        if np.issubdtype(a[c].dtype, np.floating):
            ok = np.allclose(a[c].fillna(math.nan), b[c].fillna(math.nan),
                             rtol=0, atol=0, equal_nan=True)
        else:
            ok = a[c].equals(b[c])
        if not ok:
            diff_idx = (a[c] != b[c])
            mism.append((c, a[c][diff_idx].head(3).tolist(),
                         b[c][diff_idx].head(3).tolist()))
    assert not mism, f"value mismatches: {mism}"
