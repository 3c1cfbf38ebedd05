"""Local replica of the driver's correctness gate (SURVEY.md §5.4):
every queries()[name] with an oracle must match duckdb on row count,
column-name set, and order-insensitive values at sf0.01 — so the
driver-side CORRECTNESS run holds no surprises."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from ocr_tool_spark.plans import driver_queries
from ocr_tool_spark.sources.tables import ORACLE_TABLES

QUERIES = driver_queries.queries()
ORACLE = driver_queries.oracle_sql()


@pytest.fixture(scope="module")
def duck(sf_dir_mid):
    con = duckdb.connect()
    for t in ORACLE_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir_mid}/{t}.parquet'"
        )
    yield con
    con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonical cell form: NULL marker, exact float repr, second-precision ts
    def cell(v):
        if v is None or (isinstance(v, float) and np.isnan(v)) or v is pd.NaT:
            return "\0NULL"
        if isinstance(v, (np.floating, float)):
            return repr(float(v))
        if isinstance(v, (np.integer, int)):
            return str(int(v))
        if isinstance(v, pd.Timestamp):
            return v.isoformat()
        return str(v)

    # astype(object): empty frames otherwise keep their source dtypes
    # and .equals() fails on dtype alone with zero rows
    out = df.apply(lambda col: col.map(cell)).astype(object)
    return out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_query_matches_oracle(spark, sf_dir_mid, duck, name):
    ours = _normalize(QUERIES[name](spark, sf_dir_mid).toPandas())
    ref = _normalize(duck.sql(ORACLE[name]).df())
    assert list(ours.columns) == list(ref.columns), name
    assert len(ours) == len(ref), f"{name}: {len(ours)} vs {len(ref)} rows"
    diff = ours.compare(ref) if ours.shape == ref.shape else None
    assert ours.equals(ref), f"{name} value mismatch:\n{diff.head(10) if diff is not None else ''}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLE)))
def test_rows_only_queries_run(spark, sf_dir_mid, name):
    df = QUERIES[name](spark, sf_dir_mid)
    assert df.count() >= 0
    assert df.schema is not None
