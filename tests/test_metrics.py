import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from stack_trace_deduplication_ray.eval.metrics import (
    bootstrap_ci,
    dup_pair_metrics,
    metrics_table,
    ranking_metrics,
)


def test_dup_pair_metrics_perfect():
    truth = pd.DataFrame(
        {"image_id": ["a", "b", "c", "d"],
         "cluster_id": ["a", "a", "c", "c"],
         "dup_class": ["base", "exact", "base", "near_caption"]}
    )
    pred = truth[["image_id", "cluster_id"]]
    m = dup_pair_metrics(pred, truth)
    assert m["recall"] == 1.0 and m["precision"] == 1.0
    assert m["truth_pairs"] == 2


def test_dup_pair_metrics_partial():
    truth = pd.DataFrame(
        {"image_id": ["a", "b", "c"], "cluster_id": ["a", "a", "a"],
         "dup_class": ["base", "exact", "exact"]}
    )
    pred = pd.DataFrame(
        {"image_id": ["a", "b", "c"], "cluster_id": ["a", "a", "c"]}
    )
    m = dup_pair_metrics(pred, truth)
    assert abs(m["recall"] - 1 / 3) < 1e-9
    assert m["precision"] == 1.0


def test_dup_pair_metrics_false_merge_hits_precision():
    truth = pd.DataFrame(
        {"image_id": ["a", "b"], "cluster_id": ["a", "b"],
         "dup_class": ["base", "distractor"]}
    )
    pred = pd.DataFrame({"image_id": ["a", "b"], "cluster_id": ["a", "a"]})
    m = dup_pair_metrics(pred, truth)
    assert m["precision"] == 0.0


def test_ranking_metrics(ray_session):
    import ray.data as rd

    preds = rd.from_arrow(
        pa.table(
            {
                "query_id": ["q1"] * 3 + ["q2"] * 3,
                "candidate_id": ["x", "y", "z", "x", "y", "z"],
                "score": [0.9, 0.8, 0.1, 0.5, 0.9, 0.2],
            }
        )
    )
    truth = rd.from_arrow(
        pa.table({"query_id": ["q1", "q2"], "target_id": ["x", "z"]})
    )
    m = ranking_metrics(preds, truth, ks=(1, 3))
    assert m["acc@1"] == 0.5  # q1 hits at rank 1, q2 target ranks 3rd
    assert m["acc@3"] == 1.0
    assert abs(m["mrr"] - (1.0 + 1 / 3) / 2) < 1e-9


def test_bootstrap_ci_brackets_mean():
    rng = np.random.default_rng(0)
    s = rng.normal(5.0, 1.0, 500)
    mean, lo, hi = bootstrap_ci(s)
    assert lo <= mean <= hi
    assert hi - lo < 0.5


def test_metrics_table_flattens():
    t = metrics_table({"recall": 0.99, "per_class_recall": {"exact": 1.0}})
    d = dict(zip(t.column("metric").to_pylist(), t.column("value").to_pylist()))
    assert d == {"recall": 0.99, "per_class_recall/exact": 1.0}


def test_f_beta_sweep_perfect_separation():
    from stack_trace_deduplication_ray.eval.metrics import f_beta_sweep

    scores = np.array([0.9, 0.8, 0.2, 0.1])
    labels = np.array([1, 1, 0, 0])
    out = f_beta_sweep(scores, labels, betas=(1.0,))
    assert out["f1.0"] == 1.0
    assert out["f1.0_threshold"] == 0.8


def test_f_beta_sweep_matches_bruteforce():
    from stack_trace_deduplication_ray.eval.metrics import f_beta_sweep

    rng = np.random.default_rng(1)
    scores = rng.random(200)
    labels = (scores + rng.normal(0, 0.3, 200) > 0.5).astype(int)
    out = f_beta_sweep(scores, labels, betas=(1.0,))
    best = 0.0
    for t in np.unique(scores):
        pred = scores >= t
        tp = int((pred & (labels == 1)).sum())
        fp = int((pred & (labels == 0)).sum())
        fn = int((~pred & (labels == 1)).sum())
        denom = 2 * tp + fp + fn
        best = max(best, 2 * tp / denom if denom else 0.0)
    assert abs(out["f1.0"] - best) < 1e-12


def test_roc_auc_against_known_values():
    from stack_trace_deduplication_ray.eval.metrics import roc_auc

    assert roc_auc(np.array([0.1, 0.9]), np.array([0, 1])) == 1.0
    assert roc_auc(np.array([0.9, 0.1]), np.array([0, 1])) == 0.0
    assert roc_auc(np.array([0.5, 0.5]), np.array([0, 1])) == 0.5
    rng = np.random.default_rng(2)
    s = rng.random(500)
    y = rng.integers(0, 2, 500)
    # random scores -> AUC near 0.5
    assert 0.4 < roc_auc(s, y) < 0.6


def test_pair_recall_fast_matches_slow():
    import pandas as pd

    from stack_trace_deduplication_ray.eval.metrics import (
        dup_pair_metrics,
        pair_recall_fast,
    )

    rng = __import__("numpy").random.default_rng(2)
    ids = [f"i{k}" for k in range(200)]
    truth = pd.DataFrame(
        {"image_id": ids, "cluster_id": rng.integers(0, 60, 200)}
    )
    pred = pd.DataFrame(
        {"image_id": ids, "cluster_id": rng.integers(0, 70, 200)}
    )
    slow = dup_pair_metrics(pred, truth)
    fast = pair_recall_fast(pred, truth)
    assert abs(slow["recall"] - fast["recall"]) < 1e-12
    assert abs(slow["precision"] - fast["precision"]) < 1e-12
    assert slow["truth_pairs"] == fast["truth_pairs"]


def test_ivf_knn_full_probe_equals_brute_force(ray_session):
    """IVF with n_probe == n_centroids scans everything -> must equal
    the exact brute-force kNN bit for bit (same rounding and order)."""
    from stack_trace_deduplication_ray.pipelines.similarity import (
        ivf_knn,
        knn_brute_force,
    )

    sf = "/root/testdata/sf0.001"
    exact = knn_brute_force(sf).to_pandas().reset_index(drop=True)
    full = ivf_knn(sf, n_centroids=8, n_probe=8).to_pandas().reset_index(drop=True)
    assert full.equals(exact)


def test_ivf_knn_partial_probe_recall(ray_session):
    from stack_trace_deduplication_ray.pipelines.similarity import (
        ivf_knn,
        knn_brute_force,
    )

    sf = "/root/testdata/sf0.001"
    exact = set(knn_brute_force(sf).to_pandas().vec_id)
    approx = ivf_knn(sf, n_centroids=8, n_probe=4).to_pandas()
    assert len(approx) == 10
    # deterministic across runs
    approx2 = ivf_knn(sf, n_centroids=8, n_probe=4).to_pandas()
    assert approx.equals(approx2)
    # probing half the lists keeps a useful share of the true top-10
    assert len(set(approx.vec_id) & exact) >= 3


def test_ivf_recall_full_probe_is_one(ray_session):
    """The sampled recall@k measurement itself: full probing must
    report recall exactly 1.0 (ivf top-k == exact top-k per query),
    partial probing lands in (0, 1] and is deterministic."""
    from stack_trace_deduplication_ray.pipelines.similarity import ivf_recall

    sf = "/root/testdata/sf0.001"
    full = ivf_recall(sf, n_centroids=8, n_probe=8).to_pandas()
    assert float(full.recall.iloc[0]) == 1.0
    part = ivf_recall(sf, n_centroids=8, n_probe=4).to_pandas()
    r = float(part.recall.iloc[0])
    assert 0.0 < r <= 1.0
    part2 = ivf_recall(sf, n_centroids=8, n_probe=4).to_pandas()
    assert part.equals(part2)


def test_sampled_eval_path_activates_and_matches_full(ray_session):
    """Forcing max_broadcast_rows below the corpus size must activate
    the sampled-query transposed path (the scale gate of verdict r2
    finding #3). At sf0.001 the default probe sample covers EVERY row
    (mod == 1), so the sampled path is exhaustive and its aggregate
    metrics must EQUAL the full-broadcast path's."""
    from stack_trace_deduplication_ray.pipelines.evaluation import (
        _first_correct_ranks,
    )

    sf = "/root/testdata/sf0.001"
    full = _first_correct_ranks(sf).to_pandas()
    sampled = _first_correct_ranks(sf, max_broadcast_rows=10).to_pandas()
    # activation: sampled path emits one row per probe and covered all
    assert len(sampled) == len(full)
    f = full.sort_values(["rank", "top_score"]).reset_index(drop=True)
    s = sampled.sort_values(["rank", "top_score"]).reset_index(drop=True)
    assert np.array_equal(f["rank"].to_numpy(), s["rank"].to_numpy())
    assert np.allclose(
        f["top_score"].to_numpy(), s["top_score"].to_numpy(), atol=1e-9
    )
    assert f["top1_match"].sum() == s["top1_match"].sum()


def test_sampled_eval_path_bounds_probe_count(ray_session):
    """With n_queries << corpus the sampled path emits one row per
    PROBE (bounded output, bounded Q x d broadcast) — never one row
    per corpus row like the full path."""
    from stack_trace_deduplication_ray.pipelines.evaluation import (
        _sampled_first_correct_ranks,
    )

    sf = "/root/testdata/sf0.001"
    out = _sampled_first_correct_ranks(sf, n_queries=32).to_pandas()
    # hash sampling targets ~32 of 500; exact count is seeded-stable
    assert 0 < len(out) < 200
    out2 = _sampled_first_correct_ranks(sf, n_queries=32).to_pandas()
    assert out.equals(out2)


def test_sampled_knn_label_accuracy_matches_full(ray_session):
    from stack_trace_deduplication_ray.pipelines.similarity import (
        knn_label_accuracy,
    )

    sf = "/root/testdata/sf0.001"
    full = knn_label_accuracy(sf).to_pandas()
    sampled = knn_label_accuracy(sf, max_broadcast_rows=10).to_pandas()
    assert int(sampled["n"][0]) == int(full["n"][0])
    assert float(sampled["accuracy"][0]) == float(full["accuracy"][0])


def test_lehmer2_deterministic_and_spread():
    from stack_trace_deduplication_ray.pipelines.evaluation import _lehmer2

    x = np.arange(10_000, dtype=np.int64)
    a = _lehmer2(x)
    b = _lehmer2(x)
    assert np.array_equal(a, b)
    assert a.min() >= 1 and a.max() < 2147483647
    # picks over a 100-slot target should be near-uniform
    picks = a % 100
    counts = np.bincount(picks, minlength=100)
    assert counts.min() > 50 and counts.max() < 160


def test_bootstrap_acc1_ci_schema_and_order(ray_session):
    from stack_trace_deduplication_ray.pipelines.evaluation import (
        bootstrap_acc1_ci,
    )

    t = bootstrap_acc1_ci("/root/testdata/sf0.001").to_pandas()
    d = dict(zip(t["metric"], t["value"]))
    assert set(d) == {"acc1_mean", "acc1_ci_lo", "acc1_ci_hi"}
    assert d["acc1_ci_lo"] <= d["acc1_mean"] <= d["acc1_ci_hi"]
