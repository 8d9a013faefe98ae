"""P4/P5 neural cross-encoder pipelines (seeded numpy inference).

Two pipelines mirror how the reference deploys its cross-encoders:

* ``s3m_pair_scores`` — S3M scores the SAME candidate set the classic
  rankers (Lerch/FaST) score: within-source pairs sharing >= 1 token
  (DummyRetrievalModel retrieval,
  /root/reference/ea/sim/main/methods/retrieval_model.py:50-58), cut
  to top-k per query doc. Reuses the exactly-once grid join of
  ranking._ranked_pairs_query; the model rides as a process-wide
  seeded singleton with the reference's per-document hidden cache
  (s3m.py:65-81) — each distinct doc in a grid cell's pair set is
  biLSTM-encoded once.

* ``cross_encoder_rerank`` — the reference's two-stage serving shape
  for text (retrieval_stage.py:119-136 -> scoring_stage.py:127-135):
  a cheap first-stage ranker (Lerch) produces top-k candidates per
  query doc, texts attach to both pair sides, and an ACTOR-POOL
  stage re-scores every (query, candidate) pair with the token-level
  LSTM cross-encoder (rnn.py:63-103) — weights built once per actor
  in __init__, pair batches scored vectorized in __call__ (the P6
  pair-batch layout, cross_encoders/base.py:22-42). Per-query re-rank
  cut closes the chain.

Neither is SQL-expressible (a seeded LSTM forward pass), so both are
rows-only queries; determinism and full-vs-batched equivalence are
pinned in tests/test_neural.py.

SCALE NOTE: the rerank stage's pair count is |queries| x k (candidate
cut), independent of corpus pair density — the property that makes
cross-encoders servable at all. Text attachment reuses the size-gated
broadcast/partitioned joins; the actor pool sizes with `concurrency`,
and nothing model-sized crosses the object store (weights derive from
an integer seed inside each actor).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from stack_trace_deduplication_ray.pipelines.ranking import (
    PAIR_SCHEMA,
    _ranked_pairs_query,
)
from stack_trace_deduplication_ray.pipelines.util import ensure_schema, sized_cfg
from stack_trace_deduplication_ray.sources.tables import read_table

S3M_SEED = 0x53334D
CROSS_SEED = 0xCE11


def s3m_pair_scores(sf_dir: str, k: int = 5):
    """S3M pair scores over same-source token-sharing candidates,
    top-k per query doc. Output (src, dst, score rounded 4) — the
    PAIR_SCHEMA contract shared with lerch/fast_pair_scores."""

    def builder(n_docs, fit):
        # the DF fit rides along for the shared grid interface; S3M
        # scores from its own seeded weights
        from stack_trace_deduplication_ray.functions.neural import shared_s3m

        model = shared_s3m(S3M_SEED)
        return model.score_pairs_indexed

    builder.indexed_pairs = True
    return _ranked_pairs_query(sf_dir, builder, k)


class CrossEncoderStage:
    """Actor-pool pair scorer: seeded LSTM cross-encoder built once
    per actor (T5 fit-once shape), batches of (src, dst, text_src,
    text_dst) scored per __call__."""

    def __init__(self, seed: int = CROSS_SEED):
        from stack_trace_deduplication_ray.functions.neural import (
            LSTMCrossEncoderNumpy,
        )

        self.model = LSTMCrossEncoderNumpy(seed=seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {
                    "src": pa.array([], type=pa.int64()),
                    "dst": pa.array([], type=pa.int64()),
                    "score": pa.array([], type=pa.float64()),
                }
            )
        ta = batch.column("text_src").to_pylist()
        tb = batch.column("text_dst").to_pylist()
        s = np.round(self.model.score_pairs(ta, tb), 4)
        return pa.table(
            {
                "src": batch.column("src").cast(pa.int64()),
                "dst": batch.column("dst").cast(pa.int64()),
                "score": pa.array(s),
            }
        )


def cross_encoder_rerank(sf_dir: str, k: int = 3, retrieve_k: int = 5):
    """Two-stage text rerank: Lerch top-`retrieve_k` candidates per
    query doc -> text attach -> LSTM cross-encoder actor pool ->
    per-query top-`k` re-rank. Output (src, dst, score rounded 4),
    deterministic order fields only (the final cut sorts by
    score desc, dst asc within src)."""
    from stack_trace_deduplication_ray.pipelines.ranking import lerch_pair_scores
    from stack_trace_deduplication_ray.stages.joins import (
        broadcast_attach,
        join_ds,
        partitioned_groups,
        should_broadcast,
    )

    cfg = sized_cfg(sf_dir, "documents")
    candidates = lerch_pair_scores(sf_dir, k=retrieve_k).drop_columns(["score"])

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    n_docs = docs.count()

    def ren(suffix):
        def fn(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "__did" + suffix: batch.column("doc_id").cast(pa.int64()),
                    "text" + suffix: batch.column("text"),
                }
            )

        return fn

    # text rows are wide; tighten the broadcast gate the same way the
    # embedding rerank does (rerank.py _rerank_predictions)
    gate = max(1, cfg.broadcast_join_max_rows // 8)
    if should_broadcast(cfg, n_docs, gate):
        j1 = broadcast_attach(
            candidates, docs.map_batches(ren("_src"), batch_format="pyarrow"),
            "src", "__did_src", cfg, right_rows=n_docs, max_rows=gate,
        )
        j2 = broadcast_attach(
            j1, docs.map_batches(ren("_dst"), batch_format="pyarrow"),
            "dst", "__did_dst", cfg, right_rows=n_docs, max_rows=gate,
        )
    else:
        j1 = join_ds(
            candidates, docs.map_batches(ren("_src"), batch_format="pyarrow"),
            "src", "__did_src", cfg,
        ).materialize()
        j2 = join_ds(
            j1, docs.map_batches(ren("_dst"), batch_format="pyarrow"),
            "dst", "__did_dst", cfg,
        )

    # FIXED pool size (autoscaling ramp measured ~25% slower on the
    # ~12-batch sf0.1 pair set), sized to the expected pair count
    # (~n_docs x retrieve_k) so tiny corpora don't pay 8 actor starts
    n_conc = int(max(1, min(8, (n_docs * retrieve_k) // 2048 + 1)))
    scored = j2.map_batches(
        CrossEncoderStage,
        batch_format="pyarrow",
        batch_size=2048,
        concurrency=n_conc,
        num_cpus=1,
    )

    def topk(part: pd.DataFrame) -> pd.DataFrame:
        out = part.sort_values(
            ["src", "score", "dst"], ascending=[True, False, True],
            kind="stable",
        )
        return out.groupby("src", sort=False).head(k)

    out_ds = partitioned_groups(scored, "src", topk, cfg)
    return ensure_schema(out_ds, PAIR_SCHEMA)
