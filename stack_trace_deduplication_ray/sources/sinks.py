"""Prediction / artifact sinks.

Reference analogs: the top-10-truncated predictions.json writer
(/root/reference/ea/sim/dev/scripts/training/evaluating/eval_fast.py:94-103)
and the timestamped artifact Writer (common/writer.py:11-51) — recast
as partitioned-parquet writes (resumable, never one giant file) plus a
JSON manifest with row counts and lineage fields.
"""

from __future__ import annotations

import json
import os
import time


def write_ranked_predictions(
    predictions, path: str, k: int = 10, cfg=None, lineage: dict | None = None
) -> dict:
    """predictions(query_id, candidate_id, score) -> partitioned
    parquet of the per-query top-k (score desc, candidate_id asc — the
    deterministic K5 order) + manifest.json.

    Returns the manifest dict. The truncation runs at partition
    granularity (one vectorized pandas pass per hash partition of
    query_id), the write streams — no driver materialization.
    """
    import pandas as pd

    from stack_trace_deduplication_ray.config import DedupConfig
    from stack_trace_deduplication_ray.stages.joins import partitioned_groups

    cfg = cfg or DedupConfig()

    def topk(part: pd.DataFrame) -> pd.DataFrame:
        g = part.sort_values(
            ["query_id", "score", "candidate_id"],
            ascending=[True, False, True],
            kind="stable",
        )
        return g.groupby("query_id", sort=False).head(k)

    # materialize once: write_parquet and the manifest row count would
    # otherwise each EXECUTE the lazy top-k exchange (2x the shuffle);
    # the truncated output is small (n_queries x k rows) by construction
    out = partitioned_groups(predictions, "query_id", topk, cfg).materialize()
    os.makedirs(path, exist_ok=True)
    out.write_parquet(path)
    manifest = {
        "rows": out.count(),
        "top_k": k,
        "written_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
        **(lineage or {}),
    }
    with open(os.path.join(path, "_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest
