"""Two-stage retrieve-then-rerank pipeline over the `embeddings`
table — the reference's serving architecture end-to-end: an index
retrieval stage produces top-N candidates per query, the candidate
table is CHECKPOINTED (T9 retrieval cache), a re-scoring stage
re-ranks each (query, candidate) pair with the exact model, the
ranked per-query predictions are written through the prediction sink,
and the evaluator battery runs on the written output.

Reference analog: RetrievalStage chains index top-N retrieval into
cached candidate lists
(/root/reference/ea/sim/main/methods/base.py retrieval/scoring stage
split; ea/sim/dev/scripts/training/training/retrieval_stage.py:119-136)
and ScoringStage re-scores those candidates with the cross-encoder
(scoring_stage.py:127-135); predictions then feed the evaluator
(ea/sim/dev/evaluation/evaluator.py:11-50).

Stage shapes (all distributed, nothing corpus-sized on the driver):
1. RETRIEVE — hyperplane-LSH buckets (actor pool), directed
   within-bucket pairs at partition granularity, then a query-keyed
   exchange where the number of TABLE COLLISIONS per (query, cand)
   is the index score (more colliding tables ~ higher cosine — the
   standard LSH collision estimator); per-query top-N cut by
   (collisions desc, cand_id asc).
2. CHECKPOINT — the narrow candidate table persists via
   StageCheckpoint; a resumed run with the same config skips stage 1.
3. RERANK — embeddings attach to both pair sides via two partitioned
   hash joins (int64 keys), exact cosine re-scores every pair
   (the cross-encoder analog), and write_ranked_predictions emits the
   per-query top-k parquet + manifest (deterministic K5 order).
4. EVAL — labels attach by join; Accuracy@{1,3,5,10} + MRR@10 reduce
   via per-batch partial sums (one row meets the driver).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from stack_trace_deduplication_ray.config import DedupConfig
from stack_trace_deduplication_ray.pipelines.util import sized_cfg
from stack_trace_deduplication_ray.sources.tables import read_table


def _retrieve_candidates(
    sf_dir: str, top_n: int, n_bits: int | None, n_tables: int, cfg: DedupConfig
):
    """Stage 1: per-query top-N candidates from the LSH index.

    Output (query_id, candidate_id, n_collisions) — directed: every
    vector is a query against the rest of the corpus (the reference
    evaluates every incoming report as a query, event_model shape).
    """
    from stack_trace_deduplication_ray.pipelines.similarity import HyperplaneLSH
    from stack_trace_deduplication_ray.stages.joins import partitioned_groups

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    first = next(
        iter(ds.limit(1).iter_batches(batch_size=1, batch_format="pyarrow"))
    )
    dim = len(first.column("embedding")[0])
    if n_bits is None:
        n_vec = ds.count()
        n_bits = max(4, int(np.ceil(np.log2(max(2, n_vec / 64)))))

    buckets = ds.map_batches(
        HyperplaneLSH,
        fn_constructor_args=(dim, n_bits, n_tables),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 4),
        num_cpus=1,
    )

    def directed_pairs(part: pd.DataFrame) -> pd.DataFrame:
        keys = part["bucket"].to_numpy()
        ids = part["vec_id"].to_numpy()
        change = np.nonzero(keys[1:] != keys[:-1])[0] + 1
        starts = np.concatenate([[0], change]) if len(keys) else np.empty(0, int)
        ends = np.concatenate([change, [len(keys)]]) if len(keys) else starts
        q_all, c_all = [], []
        for s, e in zip(starts, ends):
            g = np.unique(ids[s:e])
            if len(g) < 2:
                continue
            i, j = np.triu_indices(len(g), k=1)
            # both directions: each member is a query seeing the other
            q_all.append(np.concatenate([g[i], g[j]]))
            c_all.append(np.concatenate([g[j], g[i]]))
        if not q_all:
            return pd.DataFrame(
                {"query_id": pd.Series(dtype="int64"),
                 "candidate_id": pd.Series(dtype="int64")}
            )
        return pd.DataFrame(
            {
                "query_id": np.concatenate(q_all).astype(np.int64),
                "candidate_id": np.concatenate(c_all).astype(np.int64),
            }
        )

    pairs = partitioned_groups(buckets, "bucket", directed_pairs, cfg)

    def topn(part: pd.DataFrame) -> pd.DataFrame:
        # collisions across tables = duplicate (q, c) rows in this
        # query-keyed partition; count them, cut per query
        g = (
            part.groupby(["query_id", "candidate_id"], sort=False)
            .size()
            .reset_index(name="n_collisions")
        )
        g = g.sort_values(
            ["query_id", "n_collisions", "candidate_id"],
            ascending=[True, False, True],
            kind="stable",
        )
        out = g.groupby("query_id", sort=False).head(top_n)
        out["n_collisions"] = out["n_collisions"].astype(np.int64)
        return out

    return partitioned_groups(pairs, "query_id", topn, cfg)


def _mock_predictions(candidates, cfg: DedupConfig, out_dir: str, k: int):
    """P10 mock scorer: re-rank the cached candidates with a SEEDED
    hash score instead of the exact model — measures the
    retrieval->sink->eval plumbing latency with zero model cost, and
    is deterministic so tests can pin its output (reference
    S3MMockRetrievalModel, ea/sim/main/methods/S3M_mock_retrival.py:7-54,
    which swaps random embeddings in for the trained ones for latency
    measurement)."""
    from stack_trace_deduplication_ray.functions import hashing as H
    from stack_trace_deduplication_ray.sources.sinks import write_ranked_predictions

    def score(batch: pa.Table) -> pa.Table:
        q = batch.column("query_id").to_numpy(zero_copy_only=False).astype(np.int64)
        c = batch.column("candidate_id").to_numpy(zero_copy_only=False).astype(np.int64)
        h = H.splitmix64(
            H.hash_ids(q, seed=0x5C03E) ^ H.hash_ids(c, seed=0xCAFE)
        )
        s = h.astype(np.float64) / float(2**64)
        return pa.table(
            {
                "query_id": pa.array(q),
                "candidate_id": pa.array(c),
                "score": pa.array(np.round(s, 6)),
            }
        )

    scored = candidates.map_batches(score, batch_format="pyarrow")
    pred_dir = os.path.join(out_dir, "predictions_mock")
    if os.path.isdir(pred_dir):
        import shutil

        shutil.rmtree(pred_dir)
    write_ranked_predictions(
        scored, pred_dir, k=k, cfg=cfg,
        lineage={"stage": "mock_rerank"},
    )
    return pred_dir


def _rerank_predictions(candidates, sf_dir: str, cfg: DedupConfig, out_dir: str, k: int):
    """Stage 3: exact-cosine re-score of the cached candidates, then
    the ranked prediction sink. Returns the written-predictions path."""
    from stack_trace_deduplication_ray.sources.sinks import write_ranked_predictions
    from stack_trace_deduplication_ray.stages.joins import (
        broadcast_attach,
        join_ds,
        should_broadcast,
    )

    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    # parquet-metadata count gates the broadcast path; embeddings are
    # WIDE rows, so the gate is tightened 8x (~64 MB at 128-dim f32)
    n_emb = emb.count()
    emb_gate = max(1, cfg.broadcast_join_max_rows // 8)

    def ren(suffix):
        def fn(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "__vid" + suffix: batch.column("vec_id").cast(pa.int64()),
                    "emb" + suffix: batch.column("embedding"),
                }
            )

        return fn

    if should_broadcast(cfg, n_emb, emb_gate):
        # zero-exchange attach for both pair sides; candidates are
        # structurally unique on (query_id, candidate_id) — the top-N
        # cut partitions by query — so the defensive dedup the
        # partitioned path folds into its first join is not needed
        j1 = broadcast_attach(
            candidates, emb.map_batches(ren("_q"), batch_format="pyarrow"),
            "query_id", "__vid_q", cfg, right_rows=n_emb, max_rows=emb_gate,
        )
        j2 = broadcast_attach(
            j1, emb.map_batches(ren("_c"), batch_format="pyarrow"),
            "candidate_id", "__vid_c", cfg, right_rows=n_emb, max_rows=emb_gate,
        )
    else:
        j1 = join_ds(
            candidates,
            emb.map_batches(ren("_q"), batch_format="pyarrow"),
            "query_id", "__vid_q", cfg,
            dedup_left=["query_id", "candidate_id"],
        ).materialize()
        j2 = join_ds(
            j1,
            emb.map_batches(ren("_c"), batch_format="pyarrow"),
            "candidate_id", "__vid_c", cfg,
        )

    def score(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {"query_id": pa.array([], type=pa.int64()),
                 "candidate_id": pa.array([], type=pa.int64()),
                 "score": pa.array([], type=pa.float64())}
            )
        a = np.stack(
            batch.column("emb_q").to_numpy(zero_copy_only=False)
        ).astype(np.float64)
        b = np.stack(
            batch.column("emb_c").to_numpy(zero_copy_only=False)
        ).astype(np.float64)
        a = a / np.maximum(np.linalg.norm(a, axis=1, keepdims=True), 1e-12)
        b = b / np.maximum(np.linalg.norm(b, axis=1, keepdims=True), 1e-12)
        cos = np.round(np.sum(a * b, axis=1), 4)
        return pa.table(
            {
                "query_id": batch.column("query_id").cast(pa.int64()),
                "candidate_id": batch.column("candidate_id").cast(pa.int64()),
                "score": pa.array(cos),
            }
        )

    scored = j2.map_batches(score, batch_format="pyarrow")
    pred_dir = os.path.join(out_dir, "predictions")
    if os.path.isdir(pred_dir):  # re-run: parquet writes APPEND files
        import shutil

        shutil.rmtree(pred_dir)
    write_ranked_predictions(
        scored, pred_dir, k=k, cfg=cfg,
        lineage={"stage": "rerank", "source": sf_dir},
    )
    return pred_dir


def _rank_metrics(pred_dir: str, sf_dir: str, cfg: DedupConfig, k: int) -> pa.Table:
    """Stage 4: evaluator battery over the WRITTEN predictions (the
    sink output is the eval input, as in the reference's
    predictions.json -> Evaluator flow)."""
    import ray.data as rd

    from stack_trace_deduplication_ray.stages.joins import (
        broadcast_attach,
        partitioned_groups,
    )

    preds = rd.read_parquet(pred_dir)
    labels = read_table(sf_dir, "embeddings", columns=["vec_id", "label"])
    # labels are 16 B/row: broadcastable up to the default gate, with
    # the partitioned join as the above-gate fallback
    n_lab = labels.count()

    def lab(name_id, name_lab):
        def fn(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    name_id: batch.column("vec_id").cast(pa.int64()),
                    name_lab: batch.column("label").cast(pa.int64()),
                }
            )

        return fn

    j1 = broadcast_attach(
        preds, labels.map_batches(lab("__qid", "q_label"), batch_format="pyarrow"),
        "query_id", "__qid", cfg, right_rows=n_lab,
    )
    j2 = broadcast_attach(
        j1, labels.map_batches(lab("__cid", "c_label"), batch_format="pyarrow"),
        "candidate_id", "__cid", cfg, right_rows=n_lab,
    )

    def ranks(part: pd.DataFrame) -> pd.DataFrame:
        g = part.sort_values(
            ["query_id", "score", "candidate_id"],
            ascending=[True, False, True],
            kind="stable",
        )
        g["pos"] = g.groupby("query_id", sort=False).cumcount() + 1
        g = g[g["pos"] <= k]
        g["match"] = (g["q_label"] == g["c_label"]).astype(np.int64)
        hit = g[g["match"] == 1].groupby("query_id", sort=False)["pos"].min()
        nq = g["query_id"].nunique()
        r = hit.to_numpy()
        row = {"n": np.int64(nq)}
        for kk in (1, 3, 5, 10):
            row[f"h{kk}"] = np.int64((r <= kk).sum())
        row["rr"] = float((1.0 / r).sum())
        return pd.DataFrame([row])

    parts = partitioned_groups(j2, "query_id", ranks, cfg).to_pandas().sum()
    n = int(parts["n"])
    cols = {"n_queries": pa.array([n], type=pa.int64())}
    for kk in (1, 3, 5, 10):
        cols[f"acc{kk}"] = pa.array(
            [round(float(parts[f"h{kk}"]) / n, 4)], type=pa.float64()
        )
    cols["mrr10"] = pa.array([round(float(parts["rr"]) / n, 4)], type=pa.float64())
    return pa.table(cols)


def retrieve_rerank_metrics(
    sf_dir: str,
    top_n: int = 50,
    k: int = 10,
    n_bits: int | None = None,
    n_tables: int = 16,
    run_dir: str | None = None,
    mock_scorer: bool = False,
):
    """The full two-stage pipeline as one driver query: LSH retrieval
    top-N -> checkpointed candidate table -> exact-cosine rerank ->
    ranked prediction sink -> Accuracy@k / MRR battery on the sink
    output. Hash-checked end-to-end against
    eval/sql_oracle.retrieve_rerank_metrics_sql: the SRP-LSH
    retrieval is exact integer arithmetic, re-ranking happens on the
    ROUNDED score with candidate-id tie-break, so the whole serving
    chain is engine-independent; the metrics row quantifies
    end-to-end quality.

    top_n=50 mirrors the reference's index cut
    (ea/sim/dev/scripts/training/arg_parsers.py:12 top-50 default).
    mock_scorer=True swaps the exact model for the P10 seeded hash
    scorer (plumbing-latency measurement; see _mock_predictions).

    Output: one row (n_queries, acc1, acc3, acc5, acc10, mrr10).
    """
    from stack_trace_deduplication_ray.state.checkpoint import (
        StageCheckpoint,
        config_fingerprint,
    )

    # Exchange coalescing stays ON regardless of corpus size: every
    # intermediate here (bucket pairs, top-N candidates, join unions)
    # is a P-block table feeding the next exchange, so the per-block
    # sort cost dominates even at 2k vectors (measured ~32 s gated-off
    # vs ~21 s coalesced at sf0.1).
    import dataclasses

    cfg = dataclasses.replace(
        sized_cfg(sf_dir, "embeddings"), coalesce_exchanges=True
    )
    root = run_dir or os.path.join(
        "/tmp/stack_dedup_runs",
        "rerank_" + config_fingerprint(
            cfg, extra=f"{sf_dir}|{top_n}|{n_bits}|{n_tables}"
        ),
    )
    ckpt = StageCheckpoint(
        root, config_fingerprint(cfg, extra=f"{sf_dir}|{top_n}|{n_bits}|{n_tables}")
    )
    candidates, _resumed = ckpt.run_or_load(
        "retrieval_candidates",
        lambda: _retrieve_candidates(sf_dir, top_n, n_bits, n_tables, cfg),
    )
    if mock_scorer:
        pred_dir = _mock_predictions(candidates, cfg, root, k)
    else:
        pred_dir = _rerank_predictions(candidates, sf_dir, cfg, root, k)
    return _rank_metrics(pred_dir, sf_dir, cfg, k)


def mock_rerank_metrics(sf_dir: str):
    """P10 as a driver query: the retrieve->sink->eval pipeline with
    the seeded hash scorer (latency-only mock; hash-checked against
    eval/sql_oracle.mock_rerank_metrics_sql)."""
    return retrieve_rerank_metrics(sf_dir, mock_scorer=True)
