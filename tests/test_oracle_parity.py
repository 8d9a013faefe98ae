"""Local replica of the driver's correctness gate: run every
``queries()`` entry and its ``oracle_sql()`` on the same sf dir and
compare row-count + schema + order-insensitive values."""

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entrymod

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    for t in TABLES:
        c.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    return c


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def _to_pandas(res):
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    raise TypeError(type(res))


SQL_QUERIES = sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", SQL_QUERIES)
def test_query_matches_oracle(name, con, sf_dir, ray_session):
    q = entrymod.queries()[name]
    ray_df = _normalize(_to_pandas(q(sf_dir)))
    sql_df = _normalize(con.sql(entrymod.oracle_sql()[name]).df())
    assert len(ray_df) == len(sql_df), (
        f"{name}: rows {len(ray_df)} != {len(sql_df)}"
    )
    assert list(ray_df.columns) == list(sql_df.columns), (
        f"{name}: cols {list(ray_df.columns)} != {list(sql_df.columns)}"
    )
    pd.testing.assert_frame_equal(
        ray_df, sql_df, check_dtype=False, check_exact=False, rtol=1e-6, atol=1e-6
    )


ROWS_ONLY = sorted(set(entrymod.queries()) - set(SQL_QUERIES))


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(name, sf_dir, ray_session):
    res = _to_pandas(entrymod.queries()[name](sf_dir))
    assert len(res) >= 0
    assert len(res.columns) > 0


def test_entry_runs(ray_session):
    res = entrymod.entry()
    df = _to_pandas(res)
    assert len(df) > 0
    assert set(df.columns) == {"doc_id", "cluster_id"}
