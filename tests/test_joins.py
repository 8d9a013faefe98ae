"""broadcast_attach == join_ds on randomized inputs (both join types,
unique and duplicate right keys, int64 and string keys, gate fallback).
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from stack_trace_deduplication_ray.config import DedupConfig
from stack_trace_deduplication_ray.stages.joins import (
    broadcast_attach,
    join_ds,
    should_broadcast,
)

CFG = DedupConfig(num_partitions=4)


def _sorted_df(ds, cols):
    df = ds.to_pandas()
    return (
        df.sort_values(cols, kind="stable")
        .reset_index(drop=True)
        .reindex(sorted(df.columns), axis=1)
    )


def _mk(ray_session, rows):
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pydict(rows))


@pytest.mark.parametrize("join_type", ["inner", "left_outer"])
@pytest.mark.parametrize("key_kind", ["int", "str"])
def test_broadcast_matches_partitioned(ray_session, join_type, key_kind):
    rng = np.random.default_rng(7)
    n_l, n_r = 300, 40
    lk = rng.integers(0, 60, n_l)
    rk = rng.choice(60, n_r, replace=False)
    if key_kind == "int":
        lkey, rkey = lk.astype(np.int64), rk.astype(np.int64)
        ltyp = pa.int64()
    else:
        lkey = np.array([f"id{v:03d}" for v in lk], dtype=object)
        rkey = np.array([f"id{v:03d}" for v in rk], dtype=object)
        ltyp = pa.string()
    left = _mk(ray_session, {
        "k": pa.array(lkey, type=ltyp),
        "payload": pa.array(rng.integers(0, 1000, n_l)),
    })
    right = _mk(ray_session, {
        "__rk": pa.array(rkey, type=ltyp),
        "feat": pa.array(rng.normal(size=n_r)),
    })
    a = broadcast_attach(
        left, right, "k", "__rk", CFG,
        join_type=join_type, right_rows=n_r,
    )
    b = join_ds(left, right, "k", "__rk", CFG, join_type=join_type)
    cols = ["k", "payload"]
    pd.testing.assert_frame_equal(_sorted_df(a, cols), _sorted_df(b, cols))


def test_broadcast_duplicate_right_keys(ray_session):
    # duplicate right keys -> pandas-merge fallback, still broadcast
    left = _mk(ray_session, {
        "k": pa.array([1, 2, 3, 4], type=pa.int64()),
        "v": pa.array([10, 20, 30, 40]),
    })
    right = _mk(ray_session, {
        "__rk": pa.array([1, 1, 3], type=pa.int64()),
        "w": pa.array([100, 101, 300]),
    })
    a = broadcast_attach(left, right, "k", "__rk", CFG, right_rows=3)
    b = join_ds(left, right, "k", "__rk", CFG)
    cols = ["k", "v", "w"]
    pd.testing.assert_frame_equal(_sorted_df(a, cols), _sorted_df(b, cols))


def test_broadcast_empty_sides(ray_session):
    left = _mk(ray_session, {
        "k": pa.array([1, 2], type=pa.int64()),
        "v": pa.array([10, 20]),
    })
    right = _mk(ray_session, {
        "__rk": pa.array([], type=pa.int64()),
        "w": pa.array([], type=pa.int64()),
    })
    inner = broadcast_attach(left, right, "k", "__rk", CFG, right_rows=0)
    assert inner.count() == 0
    louter = broadcast_attach(
        left, right, "k", "__rk", CFG, join_type="left_outer", right_rows=0
    )
    df = louter.to_pandas().sort_values("k").reset_index(drop=True)
    assert list(df["k"]) == [1, 2]
    assert df["w"].isna().all()


def test_gate_falls_back(ray_session):
    assert not should_broadcast(CFG, None)
    assert should_broadcast(CFG, 10)
    assert not should_broadcast(CFG, 10, max_rows=5)
    # above-gate call must still produce correct (partitioned) results
    left = _mk(ray_session, {
        "k": pa.array([1, 2, 3], type=pa.int64()),
        "v": pa.array([1, 2, 3]),
    })
    right = _mk(ray_session, {
        "__rk": pa.array([2, 3], type=pa.int64()),
        "w": pa.array([20, 30]),
    })
    out = broadcast_attach(
        left, right, "k", "__rk", CFG, right_rows=2, max_rows=1
    )
    df = out.to_pandas().sort_values("k").reset_index(drop=True)
    assert list(df["k"]) == [2, 3] and list(df["w"]) == [20, 30]


def test_broadcast_duplicate_right_left_outer_types(ray_session):
    """left_outer + duplicate right keys + misses must keep int64
    (Arrow nulls), not degrade to float64 via pandas NaN."""
    left = _mk(ray_session, {
        "k": pa.array([1, 2, 9], type=pa.int64()),
        "v": pa.array([10, 20, 90]),
    })
    right = _mk(ray_session, {
        "__rk": pa.array([1, 1], type=pa.int64()),
        "w": pa.array([100, 101], type=pa.int64()),
    })
    out = broadcast_attach(
        left, right, "k", "__rk", CFG,
        join_type="left_outer", right_rows=2,
    )
    sch = dict(zip(out.schema().names, out.schema().types))
    assert str(sch["w"]) == "int64"
    df = out.to_pandas().sort_values(["k", "w"]).reset_index(drop=True)
    assert df[df.k == 9]["w"].isna().all()
    assert sorted(df[df.k == 1]["w"].dropna()) == [100, 101]
