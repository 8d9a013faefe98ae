"""Two-stage retrieve-then-rerank pipeline (pipelines/rerank.py)."""

import json
import os

import numpy as np
import pytest


SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def run_dir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("rerank_run"))


def test_retrieve_rerank_end_to_end(ray_session, run_dir):
    """Full chain: retrieval -> checkpoint -> rerank -> sink -> eval.
    The reranked metrics must sit in the same regime as the exact
    brute-force evaluation path (the LSH retrieval's only loss is
    candidate recall; reranking is exact cosine)."""
    from stack_trace_deduplication_ray.pipelines.evaluation import (
        retrieval_rank_metrics,
    )
    from stack_trace_deduplication_ray.pipelines.rerank import (
        retrieve_rerank_metrics,
    )

    got = retrieve_rerank_metrics(SF, run_dir=run_dir).to_pandas()
    exact = retrieval_rank_metrics(SF).to_pandas()
    assert int(got["n_queries"][0]) == int(exact["n_queries"][0])
    # approximate retrieval + exact rerank tracks the exact evaluator
    assert abs(float(got["mrr10"][0]) - float(exact["mrr10"][0])) < 0.05
    assert abs(float(got["acc1"][0]) - float(exact["acc1"][0])) < 0.05

    # artifacts of every stage exist: checkpointed candidates, ranked
    # predictions parquet + manifest
    assert os.path.isdir(os.path.join(run_dir, "retrieval_candidates"))
    man = json.load(open(os.path.join(run_dir, "predictions", "_manifest.json")))
    assert man["top_k"] == 10 and man["rows"] > 0


def test_retrieve_rerank_resumes_from_checkpoint(ray_session, run_dir):
    """A second run with the same config must LOAD the candidate
    checkpoint (manifest row unchanged) and reproduce the metrics."""
    from stack_trace_deduplication_ray.pipelines.rerank import (
        retrieve_rerank_metrics,
    )

    man_path = os.path.join(run_dir, "manifest.json")
    before = json.load(open(man_path))["retrieval_candidates"]["completed_at"]
    t1 = retrieve_rerank_metrics(SF, run_dir=run_dir).to_pandas()
    after = json.load(open(man_path))["retrieval_candidates"]["completed_at"]
    assert before == after  # stage 1 was skipped, not re-run
    t2 = retrieve_rerank_metrics(SF, run_dir=run_dir).to_pandas()
    assert t1.equals(t2)


def test_ranked_predictions_are_topk_sorted(ray_session, run_dir):
    """The sink output respects the K5 deterministic order: per query
    <= k rows, scores non-increasing, candidate ties ascending."""
    import ray.data as rd

    preds = rd.read_parquet(os.path.join(run_dir, "predictions")).to_pandas()
    for _, g in preds.groupby("query_id"):
        assert len(g) <= 10
        s = g.sort_values(
            ["score", "candidate_id"], ascending=[False, True], kind="stable"
        )
        assert np.array_equal(
            s["candidate_id"].to_numpy(), g["candidate_id"].to_numpy()
        )


def test_mock_scorer_deterministic(ray_session, run_dir):
    """P10: the seeded hash scorer produces identical metrics across
    runs and exercises the same sink/eval plumbing."""
    from stack_trace_deduplication_ray.pipelines.rerank import (
        retrieve_rerank_metrics,
    )

    a = retrieve_rerank_metrics(
        "/root/testdata/sf0.001", run_dir=str(run_dir), mock_scorer=True
    ).to_pydict()
    b = retrieve_rerank_metrics(
        "/root/testdata/sf0.001", run_dir=str(run_dir), mock_scorer=True
    ).to_pydict()
    assert a == b
    assert a["n_queries"][0] > 0
    assert 0.0 <= a["acc10"][0] <= 1.0 and 0.0 <= a["mrr10"][0] <= 1.0
