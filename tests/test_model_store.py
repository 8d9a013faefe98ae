"""Trained-model checkpoint store (state/model_store.py): bit-exact
parquet roundtrip, fingerprint gating, and the cached-training
short-circuit with a real trainer."""

import os

import numpy as np
import pytest

from stack_trace_deduplication_ray.state.model_store import (
    load_params,
    params_fingerprint,
    run_or_load,
    save_params,
    train_cached,
)

SF = "/root/testdata/sf0.001"


def _params(rng):
    return {
        "E": rng.standard_normal((7, 3)),
        "W": rng.standard_normal((3, 4)),
        "b": rng.standard_normal(4),
    }


def test_roundtrip_bit_exact(tmp_path):
    p = _params(np.random.default_rng(1))
    path = str(tmp_path / "m.parquet")
    save_params(path, p, "fp123")
    back, fp, _ = load_params(path)
    assert fp == "fp123"
    assert set(back) == set(p)
    for k in p:
        assert back[k].shape == p[k].shape
        assert np.array_equal(back[k], p[k])  # bit-exact float64


def test_run_or_load_hit_and_miss(tmp_path):
    path = str(tmp_path / "m.parquet")
    calls = []

    def thunk():
        calls.append(1)
        return _params(np.random.default_rng(2))

    p1, hit1, _ = run_or_load(path, "fpA", thunk)
    p2, hit2, _ = run_or_load(path, "fpA", thunk)
    assert (hit1, hit2) == (False, True)
    assert len(calls) == 1
    for k in p1:
        assert np.array_equal(p1[k], p2[k])
    # different fingerprint -> retrain and overwrite
    _, hit3, _ = run_or_load(path, "fpB", thunk)
    assert not hit3
    assert len(calls) == 2
    _, fp, _ = load_params(path)
    assert fp == "fpB"


def test_fingerprint_sensitive_to_knobs_and_input():
    a = params_fingerprint("t", {"steps": 5}, "sfX")
    assert a == params_fingerprint("t", {"steps": 5}, "sfX")
    assert a != params_fingerprint("t", {"steps": 6}, "sfX")
    assert a != params_fingerprint("t", {"steps": 5}, "sfY")
    assert a != params_fingerprint("u", {"steps": 5}, "sfX")


def test_corrupt_checkpoint_falls_back_to_retrain(tmp_path):
    path = str(tmp_path / "m.parquet")
    with open(path, "w") as f:
        f.write("not parquet")
    p, hit, _ = run_or_load(
        path, "fp", lambda: _params(np.random.default_rng(3))
    )
    assert not hit
    back, fp, _ = load_params(path)  # overwritten with a valid file
    assert fp == "fp"


def test_train_cached_short_circuits_real_trainer(ray_session, tmp_path):
    from stack_trace_deduplication_ray.pipelines.training import (
        train_bi_encoder,
    )

    d = str(tmp_path)
    r1 = train_cached(
        train_bi_encoder, SF, d, "bi_encoder", steps=3, lr=0.02
    )
    assert not r1["checkpoint_hit"]
    assert r1["metrics"] is not None
    r2 = train_cached(
        train_bi_encoder, SF, d, "bi_encoder", steps=3, lr=0.02
    )
    assert r2["checkpoint_hit"]
    # metrics survive the checkpoint hit via the manifest
    assert r2["metrics"] is not None
    assert r2["metrics"]["steps"] == r1["metrics"]["steps"]
    for k in r1["params"]:
        assert np.array_equal(r1["params"][k], r2["params"][k])
    # a knob change invalidates
    r3 = train_cached(
        train_bi_encoder, SF, d, "bi_encoder", steps=4, lr=0.02
    )
    assert not r3["checkpoint_hit"]
