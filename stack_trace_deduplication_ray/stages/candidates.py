"""Candidate-pair generation from bucket keys, with explicit skew salting.

The generic shape shared by the exact / MinHash-LSH / SimHash /
substring stages: an *expanded* Dataset of ``(bucket: uint64,
image_id: string)`` rows is grouped by bucket and each bucket emits
duplicate-candidate edges.

Skew handling (SURVEY.md §4.2, north_rule "explicit salting for skewed
LSH buckets"): a bucket larger than ``cfg.bucket_cap`` would (a) blow
up b^2 pair enumeration and (b) concentrate one group in one task. So
candidate generation is two-phase:

  phase A: ``groupby(bucket).count()`` (map-side partial aggregation)
           -> hot-key table, collected to the driver (it is tiny by
           construction: only buckets with > cap members) and
           broadcast via ``ray.put``.
  phase B: the expansion re-keys hot rows to ``(bucket, salt)``
           sub-buckets of ~``salt_target`` members each; sub-buckets
           emit all-pairs edges internally, and a second tiny shuffle
           chains the per-sub-bucket min ids so the salted bucket
           stays one connected component (salted == unsalted
           clustering, proven in tests/test_candidates.py).

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


def _empty_edges() -> pa.Table:
    return pa.table(
        {
            "src": pa.array([], type=pa.string()),
            "dst": pa.array([], type=pa.string()),
            "stage": pa.array([], type=pa.string()),
            "score": pa.array([], type=pa.float64()),
        }
    )


def _pairs_table(ids: np.ndarray, stage: str, chain: bool) -> pa.Table:
    """Edges for one bucket: all-pairs (small) or sorted chain (salted)."""
    ids = np.sort(ids)
    n = len(ids)
    if n < 2:
        return _empty_edges()
    if chain:
        src, dst = ids[:-1], ids[1:]
    else:
        i, j = np.triu_indices(n, k=1)
        src, dst = ids[i], ids[j]
    return pa.table(
        {
            "src": pa.array(src, type=pa.string()),
            "dst": pa.array(dst, type=pa.string()),
            "stage": pa.array([stage] * len(src), type=pa.string()),
            "score": pa.array(np.zeros(len(src)), type=pa.float64()),
        }
    )


def pairs_from_buckets(
    expanded, stage: str, cfg: DedupConfig
) -> tuple["ray.data.Dataset", dict]:
    """(bucket, image_id) Dataset -> canonical candidate edges Dataset.

    Returns (edges, stats). Edges carry src < dst; `score` is filled by
    the verify stage.
    """
    cap = cfg.bucket_cap
    target = cfg.salt_target

    # ---- phase A: find hot buckets (partial-agg groupby, small out) --
    counts = expanded.groupby("bucket").count()
    hot_tbl = counts.filter(
        lambda r: r["count()"] > cap
    ).to_pandas()  # tiny by construction
    if len(hot_tbl) and "bucket" in hot_tbl.columns:
        hot = dict(
            zip(hot_tbl["bucket"].astype(np.int64), hot_tbl["count()"].astype(np.int64))
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
    hot_ref = ray.put(hot)

    # ---- phase B: salt hot rows before the shuffle -------------------
    def salt_batch(batch: pa.Table) -> pa.Table:
        hot_local = ray.get(hot_ref)
        buckets = batch.column("bucket").to_numpy(zero_copy_only=False).astype(np.int64)
        ids = batch.column("image_id").to_pylist()
        if hot_local:
            id_hash = H.hash_bytes_arrays(ids, seed=777)
            hk = np.fromiter(hot_local.keys(), dtype=np.int64, count=len(hot_local))
            hc = np.fromiter(hot_local.values(), dtype=np.int64, count=len(hot_local))
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
                    H.splitmix64(buckets.view(U64) ^ H.splitmix64(salt + U64(1))).view(
                        np.int64
                    ),
                    buckets,
                )
        else:
            salted = buckets
            hot_mask = np.zeros(len(ids), dtype=bool)
        return pa.table(
            {
                "bucket": pa.array(salted.astype(np.int64)),
                "obucket": batch.column("bucket"),
                "image_id": batch.column("image_id"),
                "is_hot": pa.array(hot_mask),
            }
        )

    salted = expanded.map_batches(salt_batch, batch_format="pyarrow")

    def emit(group: pa.Table) -> pa.Table:
        ids = np.asarray(group.column("image_id").to_pylist(), dtype=object)
        n = len(ids)
        if n < 2:
            return _empty_edges()
        # salted sub-buckets target ~salt_target members; anything still
        # above cap (extreme collision) degrades to a chain.
        return _pairs_table(ids, stage, chain=n > cap)

    edges = salted.groupby("bucket").map_groups(emit, batch_format="pyarrow")

    # ---- bridge the sub-buckets of each hot bucket -------------------
    if hot:
        hot_rows = salted.filter(lambda r: r["is_hot"])
        from ray.data.aggregate import Min

        reps = hot_rows.groupby(["obucket", "bucket"]).aggregate(
            Min("image_id", alias_name="rep")
        )

        def bridge(group: pa.Table) -> pa.Table:
            ids = np.asarray(group.column("rep").to_pylist(), dtype=object)
            return _pairs_table(ids, stage, chain=True)

        bridges = reps.groupby("obucket").map_groups(bridge, batch_format="pyarrow")
        edges = edges.union(bridges)

    return edges, stats


def dedup_edges(edges):
    """Canonical edge dedup: groupby (src, dst) keep-first
    (SURVEY.md §2.6 E5; reference memoized candidate lists,
    ea/sim/main/methods/retrieval_model.py:33-37)."""

    def first(group: pa.Table) -> pa.Table:
        return group.slice(0, 1)

    return edges.groupby(["src", "dst"]).map_groups(first, batch_format="pyarrow")
