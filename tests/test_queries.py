"""Replicates the driver's correctness gate: every oracle-backed entry in
__ray_entry__.queries() must match its oracle_sql() on the same parquet
tables (row count, column names, order-insensitive values)."""

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def _to_df(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


ORACLE_KEYS = sorted(entrymod.oracle_sql())


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(name, con, ray_session):
    ray_df = _norm(_to_df(entrymod.queries()[name](SF_DIR)))
    sql_df = _norm(con.execute(entrymod.oracle_sql()[name]).fetchdf())
    assert list(ray_df.columns) == list(sql_df.columns), name
    assert len(ray_df) == len(sql_df), name
    pd.testing.assert_frame_equal(ray_df, sql_df, check_dtype=False,
                                  check_exact=True)


ROWS_ONLY = sorted(set(entrymod.queries()) - set(entrymod.oracle_sql()))


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(name, ray_session):
    df = _to_df(entrymod.queries()[name](SF_DIR))
    assert df is not None
    assert len(df.columns) > 0


def test_entry_smoke(ray_session):
    result = entrymod.entry()
    df = _to_df(result)
    assert len(df) > 0
