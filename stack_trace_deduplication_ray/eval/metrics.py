"""Evaluation harness: dup-pair recall/precision + ranking metrics.

Mirrors the reference's evaluator battery
(/root/reference/ea/sim/dev/evaluation/evaluator.py:11-50):

- dup-pair recall/precision vs ground-truth clusters (the recall>=0.99
  gate of BASELINE.json) with per-injection-class breakdown — the
  analog of the retrieval-quality harness the reference runs against
  state.csv labels.
- Accuracy@k (ea/sim/dev/evaluation/metrics/base/per_instance/
  accuracy.py:6-27) and MRR (per_instance/mrr.py:7-26) over a ranked
  predictions table, computed as a Ray groupby + global mean.
- bootstrap confidence intervals (ea/common/evaluation/intervals.py:
  17-33) over per-query scores.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def dup_pair_metrics(clusters_df: pd.DataFrame, truth_df: pd.DataFrame) -> dict:
    """Pair-level recall/precision of a predicted clustering vs truth.

    Recall counts a truth pair as found when both members share a
    predicted cluster (transitive closure counts — the deliverable is
    cluster assignments). Returns overall metrics + per-dup_class
    recall breakdown.
    """
    m = truth_df.merge(clusters_df, on="image_id", suffixes=("_t", "_p"))
    pred = dict(zip(m.image_id, m.cluster_id_p))
    true = dict(zip(m.image_id, m.cluster_id_t))
    tp = tot = 0
    class_tot: dict[str, int] = {}
    class_tp: dict[str, int] = {}
    cls = dict(zip(m.image_id, m.dup_class)) if "dup_class" in m else {}
    for _, g in m.groupby("cluster_id_t"):
        ids = list(g.image_id)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                tot += 1
                hit = pred[ids[i]] == pred[ids[j]]
                tp += hit
                for x in (ids[i], ids[j]):
                    c = cls.get(x, "?")
                    class_tot[c] = class_tot.get(c, 0) + 1
                    class_tp[c] = class_tp.get(c, 0) + hit
    fp = pp = 0
    for _, g in m.groupby("cluster_id_p"):
        ids = list(g.image_id)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pp += 1
                fp += true[ids[i]] != true[ids[j]]
    return {
        "recall": tp / tot if tot else 1.0,
        "precision": 1 - fp / pp if pp else 1.0,
        "truth_pairs": tot,
        "predicted_pairs": pp,
        "per_class_recall": {
            c: class_tp.get(c, 0) / n for c, n in sorted(class_tot.items())
        },
    }


def ranking_metrics(predictions, truth, ks=(1, 3, 5, 10)):
    """Accuracy@k and MRR from a ranked-predictions Dataset.

    predictions: Dataset (query_id, candidate_id, score)
    truth:       Dataset (query_id, target_id)
    Rank = 1 + number of candidates with (score, candidate_id) strictly
    greater under (score desc, id asc) — deterministic total order
    (SURVEY.md §2.7 K5: no tie nudging).
    Distributed shape: per-query rank via groupby, metrics via means.
    """
    import ray

    tmap = dict(
        zip(*(truth.to_pandas()[c] for c in ["query_id", "target_id"]))
    )
    ref = ray.put(tmap)

    def rank_of_target(group: pd.DataFrame) -> pd.DataFrame:
        t = ray.get(ref)
        qid = group["query_id"].iloc[0]
        target = t.get(qid)
        g = group.sort_values(["score", "candidate_id"], ascending=[False, True])
        cand = g["candidate_id"].tolist()
        try:
            rank = cand.index(target) + 1
        except ValueError:
            rank = 0  # target never retrieved
        return pd.DataFrame({"query_id": [qid], "rank": [rank]})

    ranks = predictions.groupby("query_id").map_groups(
        rank_of_target, batch_format="pandas"
    ).to_pandas()
    r = ranks["rank"].to_numpy()
    out = {f"acc@{k}": float(((r > 0) & (r <= k)).mean()) for k in ks}
    rr = np.where(r > 0, 1.0 / np.maximum(r, 1), 0.0)
    out["mrr"] = float(rr.mean())
    out["n_queries"] = int(len(r))
    return out


def bootstrap_ci(
    scores: np.ndarray, n_iter: int = 100, alpha: float = 0.05, seed: int = 42
) -> tuple[float, float, float]:
    """Percentile bootstrap CI of the mean (reference: 100 resamples,
    intervals.py:17-33). Returns (mean, lo, hi)."""
    rng = np.random.default_rng(seed)
    scores = np.asarray(scores, dtype=np.float64)
    means = np.array(
        [rng.choice(scores, size=len(scores), replace=True).mean()
         for _ in range(n_iter)]
    )
    return (
        float(scores.mean()),
        float(np.quantile(means, alpha / 2)),
        float(np.quantile(means, 1 - alpha / 2)),
    )


def metrics_table(d: dict) -> pa.Table:
    """Flatten a metrics dict to the METRICS schema table."""
    rows = []
    for k, v in d.items():
        if isinstance(v, dict):
            rows += [(f"{k}/{kk}", float(vv)) for kk, vv in v.items()]
        elif isinstance(v, (int, float)):
            rows.append((k, float(v)))
    return pa.table(
        {
            "metric": pa.array([r[0] for r in rows], type=pa.string()),
            "value": pa.array([r[1] for r in rows], type=pa.float64()),
        }
    )


def f_beta_sweep(
    scores: np.ndarray, labels: np.ndarray, betas=(0.25, 0.5, 1.0, 2.0, 3.0)
) -> dict:
    """Best F-beta over every score threshold (reference: threshold
    sweep with a running confusion matrix,
    ea/sim/dev/evaluation/metrics/wrappers/f_beta/helpers.py:86-117).

    labels: 1 = positive. Vectorized prefix scan over scores sorted
    descending; threshold t predicts positive for score >= t.
    Returns {f{beta}: best_f, f{beta}_threshold: t}.
    """
    scores = np.asarray(scores, dtype=np.float64)
    labels = np.asarray(labels, dtype=np.int64)
    order = np.argsort(-scores, kind="stable")
    s = scores[order]
    y = labels[order]
    tp = np.cumsum(y)
    fp = np.cumsum(1 - y)
    fn = y.sum() - tp
    out = {}
    # only evaluate at the last index of each distinct score (the
    # threshold boundary)
    boundary = np.concatenate([s[1:] != s[:-1], [True]])
    for beta in betas:
        b2 = beta * beta
        denom = (1 + b2) * tp + fp + b2 * fn
        f = np.where(denom > 0, (1 + b2) * tp / np.maximum(denom, 1), 0.0)
        f_at = f[boundary]
        best = int(np.argmax(f_at))
        out[f"f{beta}"] = float(f_at[best])
        out[f"f{beta}_threshold"] = float(s[boundary][best])
    return out


def roc_auc(scores: np.ndarray, labels: np.ndarray) -> float:
    """ROC-AUC via the rank-sum (Mann-Whitney U) formulation — the
    reference uses sklearn's roc_auc_score
    (ea/sim/dev/evaluation/metrics/base/aggregate/roc_auc.py:7-16);
    this is the same statistic without the dependency. Ties get
    average ranks."""
    scores = np.asarray(scores, dtype=np.float64)
    labels = np.asarray(labels, dtype=np.int64)
    n_pos = int(labels.sum())
    n_neg = len(labels) - n_pos
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    order = np.argsort(scores, kind="stable")
    ranks = np.empty(len(scores), dtype=np.float64)
    ranks[order] = np.arange(1, len(scores) + 1)
    # average ranks for ties
    s_sorted = scores[order]
    starts = np.concatenate([[0], np.nonzero(s_sorted[1:] != s_sorted[:-1])[0] + 1])
    ends = np.concatenate([starts[1:], [len(scores)]])
    for a, b in zip(starts, ends):  # loop over tie groups only
        if b - a > 1:
            ranks[order[a:b]] = (a + 1 + b) / 2.0
    r_pos = ranks[labels == 1].sum()
    u = r_pos - n_pos * (n_pos + 1) / 2.0
    return float(u / (n_pos * n_neg))


def pair_recall_fast(clusters_df: pd.DataFrame, truth_df: pd.DataFrame) -> dict:
    """Vectorized dup-pair recall/precision (no per-pair loops):
    truth pairs = sum C(size,2) over truth clusters; found pairs =
    sum C(k,2) over (truth_cluster x predicted_cluster) intersections;
    predicted pairs analogously. Exactly dup_pair_metrics' recall and
    precision, O(n) — usable at bench scale (500k+ rows)."""

    def pairs_of(sizes: pd.Series) -> float:
        s = sizes.to_numpy(dtype=np.float64)
        return float((s * (s - 1) / 2).sum())

    m = truth_df.merge(clusters_df, on="image_id", suffixes=("_t", "_p"))
    truth_pairs = pairs_of(m.groupby("cluster_id_t").size())
    pred_pairs = pairs_of(m.groupby("cluster_id_p").size())
    joint_pairs = pairs_of(m.groupby(["cluster_id_t", "cluster_id_p"]).size())
    return {
        "recall": joint_pairs / truth_pairs if truth_pairs else 1.0,
        "precision": joint_pairs / pred_pairs if pred_pairs else 1.0,
        "truth_pairs": int(truth_pairs),
        "predicted_pairs": int(pred_pairs),
    }
