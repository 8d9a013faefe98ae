"""Standalone oracle-parity checker mirroring the driver's compare:
run a query's Ray pipeline and its DuckDB oracle on the same sf dir,
sort columns by name, sort rows, and compare values exactly.

Usage: python tests/oracle_check.py [sf_dir] [query ...]
(defaults: /root/testdata/sf0.01, all queries that have an oracle)
"""

from __future__ import annotations

import sys

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df):
    import pandas as pd

    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype) == "object":
            # decimals / dates -> canonical strings
            df[c] = df[c].astype(str)
        if "datetime" in str(df[c].dtype) or str(df[c].dtype) == "date32[day][pyarrow]":
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def compare(name, got_df, exp_df) -> tuple[bool, str]:
    import pandas as pd

    if sorted(got_df.columns) != sorted(exp_df.columns):
        return False, f"schema {sorted(got_df.columns)} vs {sorted(exp_df.columns)}"
    if len(got_df) != len(exp_df):
        return False, f"rows {len(got_df)} vs {len(exp_df)}"
    g = normalize(got_df.copy())
    e = normalize(exp_df.copy())
    try:
        # dtype-lenient (the driver hashes values; DuckDB float32 vs
        # our float64 passed its hash in round 1), value-strict
        pd.testing.assert_frame_equal(
            g, e, check_dtype=False, check_exact=False, rtol=1e-6, atol=1e-9
        )
    except AssertionError as exc:
        return False, str(exc).splitlines()[-1][:200]
    return True, "ok"


def main():
    import duckdb
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=8, include_dashboard=False,
            ignore_reinit_error=True, logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    qs = entry.queries()
    oracles = entry.oracle_sql()
    names = sys.argv[2:] or list(oracles)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )

    n_fail = 0
    for name in names:
        if name not in oracles:
            print(f"{name}: NO ORACLE (skipped)")
            continue
        res = qs[name](sf)
        got = res.to_pandas() if hasattr(res, "to_pandas") else res
        exp = con.execute(oracles[name]).df()
        ok, msg = compare(name, got, exp)
        print(f"{name}: {'PASS' if ok else 'FAIL — ' + msg}")
        n_fail += 0 if ok else 1
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
