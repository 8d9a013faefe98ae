"""Candidate-pair generation from bucket keys, with explicit skew salting.

The generic shape shared by the exact / MinHash-LSH / SimHash /
substring stages: an *expanded* Dataset of ``(bucket: int64,
image_id: string)`` rows is grouped by bucket and each bucket emits
duplicate-candidate edges.

Skew handling (SURVEY.md §4.2, north_rule "explicit salting for skewed
LSH buckets") is two-phase:

  phase A: ``groupby(bucket).count()`` -> hot-key table (only buckets
           with > cap members; tiny by construction), collected to the
           driver and broadcast via ``ray.put``.
  phase B: the expansion re-keys hot rows to ``(bucket, salt)``
           sub-buckets of ~``salt_target`` members each; sub-buckets
           emit all-pairs edges internally, and a second tiny shuffle
           chains the per-sub-bucket min ids so the salted bucket
           stays one connected component (salted == unsalted
           clustering, proven in tests/test_candidates.py).

Group processing runs at PARTITION granularity (joins.partitioned_groups):
one pandas call per shuffle partition, with an in-process loop over the
partition's buckets — not one Python task per bucket.

Capped/salted buckets are recorded in the returned stats dict — never
silently dropped (reference precedent for explicit caps:
/root/reference/ea/sim/dev/scripts/training/datasets/triplet.py:46-62).

Edges only need to make each duplicate group *connected* (the final
clustering is connected components, SURVEY.md §2.6 E4), so per-bucket
all-pairs for small buckets + chain linking for salted buckets is
semantically complete.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from stack_trace_deduplication_ray.config import DedupConfig
from stack_trace_deduplication_ray.functions import hashing as H
from stack_trace_deduplication_ray.stages.joins import (
    partitioned_groups,
    partitioned_groups_arrow,
)

logger = logging.getLogger(__name__)

U64 = np.uint64

EDGE_SCHEMA = pa.schema(
    [
        ("src", pa.string()),
        ("dst", pa.string()),
        ("stage", pa.string()),
        ("score", pa.float64()),
    ]
)


def _edges_table(src, dst, stage: str) -> pa.Table:
    """Canonical edges Arrow table with the declared schema (explicit
    types even when empty — empty pandas object columns would degrade
    to Arrow null type and poison downstream schema unification)."""
    n = len(src)
    return pa.table(
        {
            "src": pa.array(list(src), type=pa.string()),
            "dst": pa.array(list(dst), type=pa.string()),
            "stage": pa.array([stage] * n, type=pa.string()),
            "score": pa.array(np.zeros(n), type=pa.float64()),
        }
    )


def _group_bounds(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Start/end indices of equal-key runs in a sorted key array."""
    n = len(keys)
    if n == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    change = np.nonzero(keys[1:] != keys[:-1])[0] + 1
    starts = np.concatenate([[0], change])
    ends = np.concatenate([change, [n]])
    return starts, ends


def _find_hot_buckets(expanded, cap: int, stage: str):
    counts = expanded.groupby("bucket").count()
    hot_tbl = counts.filter(lambda row: row["count()"] > cap).to_pandas()
    if len(hot_tbl) and "bucket" in hot_tbl.columns:
        hot = dict(
            zip(
                hot_tbl["bucket"].astype(np.int64),
                hot_tbl["count()"].astype(np.int64),
            )
        )
    else:  # empty filter results drop their columns
        hot = {}
    stats = {
        "stage": stage,
        "hot_buckets": len(hot),
        "max_bucket": int(hot_tbl["count()"].max()) if len(hot) else 0,
    }
    if hot:
        logger.warning(
            "stage %s: salting %d hot buckets (max size %d, cap %d)",
            stage, len(hot), stats["max_bucket"], cap,
        )
    return hot, stats


def _salt_fn(hot_ref, target: int, extra_cols: tuple[str, ...] = ()):
    def salt_batch(batch: pa.Table) -> pa.Table:
        hot_local = ray.get(hot_ref)
        buckets = (
            batch.column("bucket").to_numpy(zero_copy_only=False).astype(np.int64)
        )
        ids = batch.column("image_id").to_pylist()
        if hot_local:
            id_hash = H.hash_bytes_arrays(ids, seed=777)
            hk = np.fromiter(hot_local.keys(), dtype=np.int64, count=len(hot_local))
            hc = np.fromiter(
                hot_local.values(), dtype=np.int64, count=len(hot_local)
            )
            order = np.argsort(hk)
            hk, hc = hk[order], hc[order]
            pos = np.clip(np.searchsorted(hk, buckets), 0, len(hk) - 1)
            hot_mask = hk[pos] == buckets
            n_sub = np.ones(len(ids), dtype=np.uint64)
            n_sub[hot_mask] = np.maximum(1, -(-hc[pos[hot_mask]] // target))
            salt = (id_hash % n_sub).astype(U64)
            with np.errstate(over="ignore"):
                salted = np.where(
                    hot_mask,
                    H.splitmix64(
                        buckets.view(U64) ^ H.splitmix64(salt + U64(1))
                    ).view(np.int64),
                    buckets,
                )
        else:
            salted = buckets
            hot_mask = np.zeros(len(ids), dtype=bool)
        cols = {
            "bucket": pa.array(salted.astype(np.int64)),
            "obucket": batch.column("bucket"),
            "image_id": batch.column("image_id"),
            "is_hot": pa.array(hot_mask),
        }
        for c in extra_cols:
            cols[c] = batch.column(c)
        return pa.table(cols)

    return salt_batch


def pairs_from_buckets(
    expanded, stage: str, cfg: DedupConfig
) -> tuple["ray.data.Dataset", dict]:
    """(bucket, image_id) Dataset -> canonical candidate edges Dataset.

    Returns (edges, stats). Edges carry src < dst; `score` is filled by
    the verify stage.
    """
    cap = cfg.bucket_cap
    hot, stats = _find_hot_buckets(expanded, cap, stage)
    hot_ref = ray.put(hot)
    salted = expanded.map_batches(
        _salt_fn(hot_ref, cfg.salt_target), batch_format="pyarrow"
    )

    def emit_partition(part: pd.DataFrame) -> pd.DataFrame:
        keys = part["bucket"].to_numpy()
        ids = part["image_id"].to_numpy()
        starts, ends = _group_bounds(keys)
        src_all, dst_all = [], []
        for s, e in zip(starts, ends):
            n = e - s
            if n < 2:
                continue
            g = np.sort(ids[s:e])
            if n > cap:  # extreme collision inside a sub-bucket: chain
                src_all.append(g[:-1])
                dst_all.append(g[1:])
            else:
                i, j = np.triu_indices(n, k=1)
                src_all.append(g[i])
                dst_all.append(g[j])
        if not src_all:
            return _edges_table([], [], stage)
        return _edges_table(
            np.concatenate(src_all), np.concatenate(dst_all), stage
        )

    edges = partitioned_groups(
        salted.select_columns(["bucket", "image_id"]), "bucket",
        emit_partition, cfg,
    )

    # ---- bridge the sub-buckets of each hot bucket -------------------
    if hot:
        hot_rows = salted.filter(lambda row: row["is_hot"])
        from ray.data.aggregate import Min

        reps = hot_rows.groupby(["obucket", "bucket"]).aggregate(
            Min("image_id", alias_name="rep")
        )

        def bridge(part: pd.DataFrame) -> pd.DataFrame:
            keys = part["obucket"].to_numpy()
            ids = part["rep"].to_numpy()
            starts, ends = _group_bounds(keys)
            src_all, dst_all = [], []
            for s, e in zip(starts, ends):
                if e - s < 2:
                    continue
                g = np.sort(ids[s:e])
                src_all.append(g[:-1])
                dst_all.append(g[1:])
            if not src_all:
                return _edges_table([], [], stage)
            return _edges_table(
                np.concatenate(src_all), np.concatenate(dst_all), stage
            )

        bridges = partitioned_groups(
            reps.select_columns(["obucket", "rep"]), "obucket", bridge, cfg
        )
        edges = edges.union(bridges)

    return edges, stats


def simhash_pairs_from_buckets(expanded, stage: str, cfg: DedupConfig):
    """Candidate pairs for chunk-probed SimHash buckets with the
    Hamming(<= radius) test applied INSIDE the bucket (the expansion
    carries the simhash payload), so no feature-attachment join and no
    over-emission: output pairs already satisfy the Hamming criterion.

    Hot buckets are salted like pairs_from_buckets; within a salted or
    still-hot sub-bucket members are sorted by (simhash, id) so
    identical hashes sit adjacent and chain links still verify.
    """
    cap = cfg.bucket_cap
    r = cfg.hamming_radius
    hot, stats = _find_hot_buckets(expanded, cap, stage)
    hot_ref = ray.put(hot)
    salted = expanded.map_batches(
        _salt_fn(hot_ref, cfg.salt_target, extra_cols=("simhash",)),
        batch_format="pyarrow",
    )

    def emit_partition(part: pd.DataFrame) -> pd.DataFrame:
        keys = part["bucket"].to_numpy()
        ids = part["image_id"].to_numpy()
        sh = part["simhash"].to_numpy().astype(np.int64).view(U64)
        starts, ends = _group_bounds(keys)
        src_all, dst_all = [], []
        for s, e in zip(starts, ends):
            n = e - s
            if n < 2:
                continue
            order = np.lexsort((ids[s:e], sh[s:e]))
            g_ids = ids[s:e][order]
            g_sh = sh[s:e][order]
            if n > cap:
                i = np.arange(n - 1)
                j = i + 1
            else:
                i, j = np.triu_indices(n, k=1)
            d = H.hamming64(g_sh[i], g_sh[j])
            keep = d <= r
            if not keep.any():
                continue
            a, b = g_ids[i[keep]], g_ids[j[keep]]
            src_all.append(np.minimum(a, b))
            dst_all.append(np.maximum(a, b))
        if not src_all:
            return _edges_table([], [], stage)
        return _edges_table(
            np.concatenate(src_all), np.concatenate(dst_all), stage
        )

    edges = partitioned_groups(
        salted.select_columns(["bucket", "image_id", "simhash"]), "bucket",
        emit_partition, cfg,
    )
    return edges, stats


def dedup_edges(edges, cfg: DedupConfig | None = None):
    """Canonical edge dedup: keep-first per (src, dst) pair
    (SURVEY.md §2.6 E5). Partitioned on src (so any given pair lands
    in one partition), vectorized drop_duplicates per partition."""
    if cfg is None:
        cfg = DedupConfig()

    def drop(part: pd.DataFrame) -> pd.DataFrame:
        return part.drop_duplicates(["src", "dst"], keep="first")

    return partitioned_groups(edges, "src", drop, cfg)


def collapse_by(sigs, key_col: str, stage: str, cfg: DedupConfig | None = None):
    """Representative collapse: group rows by `key_col` (a content
    hash); every group's rep = min image_id. Returns (rep_edges,
    rep_sigs):

    - rep_edges: (src=rep, dst=member, stage, score=1.0) for non-rep
      members — exact-dup edges needing no verification (identical
      content always passes any verify criterion).
    - rep_sigs: signature rows of representatives only — the sketch
      stages then run on UNIQUE content, which removes
      identical-content skew at the root (the boilerplate caption
      becomes ONE rep) and cuts candidate volume by the duplication
      factor.

    Reference analog: hash-unique member lists per issue,
    ea/sim/main/data/buckets/stack_state_model.py:25-47.
    """
    if cfg is None:
        cfg = DedupConfig()

    def annotate(part: pa.Table) -> pa.Table:
        # part is sorted by key_col; vectorized per-group min image_id
        keys = part.column(key_col).to_numpy(zero_copy_only=False)
        ids = np.asarray(part.column("image_id").to_pylist(), dtype=object)
        starts, ends = _group_bounds(keys)
        if len(starts) == 0:
            return part.append_column("rep", pa.array([], type=pa.string()))
        gidx = np.repeat(np.arange(len(starts)), ends - starts)
        rep_per_group = np.minimum.reduceat(ids, starts)
        rep = rep_per_group[gidx]
        return part.append_column("rep", pa.array(rep, type=pa.string()))

    annotated = partitioned_groups_arrow(sigs, key_col, annotate, cfg).materialize()

    def edges(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.not_equal(batch.column("image_id"), batch.column("rep"))
        t = batch.filter(keep)
        return pa.table(
            {
                "src": t.column("rep"),
                "dst": t.column("image_id"),
                "stage": pa.array([stage] * len(t), type=pa.string()),
                "score": pa.array(np.ones(len(t)), type=pa.float64()),
            }
        )

    def reps(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = batch.filter(pc.equal(batch.column("image_id"), batch.column("rep")))
        return t.drop_columns(["rep"])

    return (
        annotated.map_batches(edges, batch_format="pyarrow"),
        annotated.map_batches(reps, batch_format="pyarrow"),
    )
