"""Trained-model checkpoint store — the reference's
``trainer.save_checkpoint(path_to_save)`` role
(/root/reference/ea/sim/dev/scripts/training/training/
train_model.py:163-165) for the from-scratch trainers.

A trained parameter set (a dict of named float64 arrays) persists as
ONE parquet file: rows (name, shape, float64 data list) plus a
manifest row carrying the training fingerprint — a hash of the
(trainer name, config knobs, input id) that produced it, mirroring
`state/checkpoint.stage_fingerprint`. `load_params` returns the dict
bit-exactly (pinned in tests); `run_or_load` skips a training run
entirely when a checkpoint with the same fingerprint exists, the same
contract StageCheckpoint gives dataset stages.

Parquet (not pickle): the store stays language-neutral, inspectable
with any parquet reader, and safe to load from untrusted paths.
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_MANIFEST_KEY = "__manifest__"


def params_fingerprint(trainer: str, knobs: dict, input_id: str = "") -> str:
    """Deterministic fingerprint of (trainer, sorted knobs, input)."""
    blob = json.dumps(
        {"trainer": trainer, "knobs": knobs, "input": input_id},
        sort_keys=True,
        default=str,
    )
    return hashlib.sha256(blob.encode()).hexdigest()[:16]


def save_params(
    path: str,
    params: dict[str, np.ndarray],
    fingerprint: str = "",
    metrics: dict | None = None,
) -> None:
    """Write a named-parameter dict as one parquet file (atomic via
    tmp+rename so a crashed writer never leaves a readable half).
    `metrics` (a flat float dict, e.g. the training run's eval
    numbers) rides in the manifest so a checkpoint hit can report the
    original run's quality."""
    names, shapes, datas = [], [], []
    for k in sorted(params):
        a = np.asarray(params[k], dtype=np.float64)
        names.append(k)
        shapes.append(json.dumps(list(a.shape)))
        datas.append(a.reshape(-1))
    names.append(_MANIFEST_KEY)
    shapes.append(
        json.dumps({"fingerprint": fingerprint, "metrics": metrics})
    )
    datas.append(np.empty(0, dtype=np.float64))
    t = pa.table(
        {
            "name": pa.array(names, type=pa.string()),
            "shape": pa.array(shapes, type=pa.string()),
            "data": pa.array([d.tolist() for d in datas], type=pa.list_(pa.float64())),
        }
    )
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(t, tmp)
    os.replace(tmp, path)


def load_params(
    path: str,
) -> tuple[dict[str, np.ndarray], str, dict | None]:
    """Read back (params dict, stored fingerprint, stored metrics).
    Bit-exact for the float64 training dtype."""
    t = pq.read_table(path)
    params: dict[str, np.ndarray] = {}
    fingerprint = ""
    metrics = None
    for name, shape, data in zip(
        t.column("name").to_pylist(),
        t.column("shape").to_pylist(),
        t.column("data").to_pylist(),
    ):
        if name == _MANIFEST_KEY:
            man = json.loads(shape)
            fingerprint = man.get("fingerprint", "")
            metrics = man.get("metrics")
            continue
        params[name] = np.asarray(data, dtype=np.float64).reshape(
            json.loads(shape)
        )
    return params, fingerprint, metrics


def train_cached(
    trainer_fn,
    sf_dir: str,
    checkpoint_dir: str,
    trainer_name: str,
    extra: str = "",
    **knobs,
):
    """Checkpointed training: ``trainer_fn(sf_dir, **knobs)`` must
    return ``{"params": dict[str, ndarray], "metrics": ...}`` (the
    contract of train_s3m_full / train_rerank_encoder /
    train_bi_encoder). A prior checkpoint with the same
    (trainer_name, knobs, extra, sf_dir) fingerprint short-circuits
    the whole training run; the returned dict carries
    ``checkpoint_hit`` and the training metrics (from the manifest on
    a hit). `extra` rides only in the fingerprint — callers pass a
    code hash there so edits to the training code invalidate."""
    fp = params_fingerprint(
        trainer_name, {**knobs, "__extra": extra}, input_id=sf_dir
    )
    path = os.path.join(checkpoint_dir, f"{trainer_name}.parquet")
    fresh: dict = {}

    def thunk():
        res = trainer_fn(sf_dir, **knobs)
        fresh["metrics"] = res.get("metrics")
        return res["params"]

    params, hit, stored_metrics = run_or_load(
        path, fp, thunk, metrics_of=lambda: fresh.get("metrics")
    )
    return {
        "params": params,
        "checkpoint_hit": hit,
        "metrics": fresh.get("metrics") if not hit else stored_metrics,
    }


def run_or_load(
    path: str,
    fingerprint: str,
    thunk,
    metrics_of=None,
) -> tuple[dict[str, np.ndarray], bool, dict | None]:
    """Load `path` when it exists with a matching fingerprint, else
    run `thunk() -> params dict`, persist (with `metrics_of()` if
    given), and return it. Returns (params, hit, stored metrics)."""
    if os.path.exists(path):
        try:
            params, fp, metrics = load_params(path)
            if fp == fingerprint:
                return params, True, metrics
        except (OSError, pa.ArrowInvalid, json.JSONDecodeError, KeyError):
            pass  # unreadable/foreign file -> retrain and overwrite
    params = thunk()
    save_params(
        path, params, fingerprint,
        metrics=metrics_of() if metrics_of else None,
    )
    return params, False, None
