"""End-to-end golden run: synthetic fixture -> full dedup pipeline ->
dup-pair recall >= 0.99 vs ground truth (the BASELINE.json gate),
precision guard, determinism."""

import collections

import pandas as pd
import pyarrow.parquet as pq
import pytest

from stack_trace_deduplication_ray.config import DedupConfig


def _recall_precision(clusters_df: pd.DataFrame, truth_df: pd.DataFrame):
    m = truth_df.merge(clusters_df, on="image_id", suffixes=("_t", "_p"))
    pred = dict(zip(m.image_id, m.cluster_id_p))
    true = dict(zip(m.image_id, m.cluster_id_t))
    tp = tot = 0
    for _, g in m.groupby("cluster_id_t"):
        ids = list(g.image_id)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                tot += 1
                if pred[ids[i]] == pred[ids[j]]:
                    tp += 1
    fp = pp = 0
    for _, g in m.groupby("cluster_id_p"):
        ids = list(g.image_id)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pp += 1
                if true[ids[i]] != true[ids[j]]:
                    fp += 1
    recall = tp / tot if tot else 1.0
    precision = 1 - fp / pp if pp else 1.0
    return recall, precision


@pytest.fixture(scope="module")
def dedup_result(ray_session, small_fixture_dir):
    import ray.data as rd

    from stack_trace_deduplication_ray.pipelines.dedup import run_dedup

    images = rd.read_parquet(f"{small_fixture_dir}/images.parquet")
    res = run_dedup(images, DedupConfig())
    clusters = res["clusters"].to_pandas()
    truth = pq.read_table(f"{small_fixture_dir}/truth_clusters.parquet").to_pandas()
    return res, clusters, truth


def test_recall_gate(dedup_result):
    """BASELINE.json: dup-pair recall >= 0.99 at the same
    shingle/signature config as the oracle (ground truth)."""
    _, clusters, truth = dedup_result
    recall, precision = _recall_precision(clusters, truth)
    assert recall >= 0.99, f"recall {recall}"
    assert precision >= 0.97, f"precision {precision}"


def test_every_row_assigned_exactly_once(dedup_result):
    _, clusters, truth = dedup_result
    assert len(clusters) == len(truth)
    assert clusters.image_id.is_unique


def test_cluster_id_is_min_member(dedup_result):
    _, clusters, _ = dedup_result
    mins = clusters.groupby("cluster_id")["image_id"].min()
    for cid, mn in mins.items():
        assert cid == mn


def test_skew_bucket_salted_and_clustered(dedup_result):
    """The boilerplate-caption rows collapse to one representative
    (identical captions) and must come out as ONE cluster."""
    res, clusters, truth = dedup_result
    skew_ids = truth[truth.dup_class == "skew"].image_id
    assert len(skew_ids) > 2
    got = clusters[clusters.image_id.isin(skew_ids)].cluster_id.nunique()
    assert got == 1


def test_edges_canonical(dedup_result):
    res, _, _ = dedup_result
    e = res["edges"].to_pandas()
    assert (e.src < e.dst).all()
    assert not e.duplicated(["src", "dst"]).any()
    assert set(e.stage.unique()) <= {
        "exact_caption", "exact_image", "minhash", "simhash", "substring"
    }


def test_distractors_stay_singletons(dedup_result):
    _, clusters, truth = dedup_result
    m = truth.merge(clusters, on="image_id", suffixes=("_t", "_p"))
    d = m[m.dup_class == "distractor"]
    sizes = clusters.groupby("cluster_id").size()
    # distractors are singleton truth clusters; allow rare phash
    # near-collisions of procedural images but the bulk must be alone
    alone = sum(1 for cid in d.cluster_id_p if sizes[cid] == 1)
    assert alone >= 0.9 * len(d)
