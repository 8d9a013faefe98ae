"""Connected components: union-find vs distributed label propagation
agree; singleton handling; chain/transitive merge semantics (the
reference's issue-merge chains, merge_issues_duplicates.py:28-67)."""

import pyarrow as pa
import pytest

from stack_trace_deduplication_ray.config import DedupConfig
from stack_trace_deduplication_ray.stages import cc as cc_mod


def _edges_ds(pairs):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, _ in pairs], type=pa.string()),
                "dst": pa.array([b for _, b in pairs], type=pa.string()),
            }
        )
    )


def _ids_ds(ids):
    import ray.data as rd

    return rd.from_arrow(pa.table({"image_id": pa.array(ids, type=pa.string())}))


CHAIN = [("b", "c"), ("a", "b"), ("c", "d"), ("x", "y")]
IDS = ["a", "b", "c", "d", "x", "y", "z"]
EXPECTED = {
    "a": "a", "b": "a", "c": "a", "d": "a", "x": "x", "y": "x", "z": "z",
}


def test_driver_union_find_chain(ray_session):
    labels = cc_mod.driver_union_find(_edges_ds(CHAIN))
    for k, v in EXPECTED.items():
        assert labels.get(k, k) == v


def test_assign_clusters_driver_path(ray_session):
    cfg = DedupConfig()
    out = cc_mod.assign_clusters(_ids_ds(IDS), _edges_ds(CHAIN), cfg).to_pandas()
    got = dict(zip(out.image_id, out.cluster_id))
    assert got == EXPECTED


def test_assign_clusters_distributed_path_matches(ray_session):
    """Force the label-propagation path; must agree with union-find."""
    cfg = DedupConfig(driver_cc_max_edges=0)
    out = cc_mod.assign_clusters(_ids_ds(IDS), _edges_ds(CHAIN), cfg).to_pandas()
    got = dict(zip(out.image_id, out.cluster_id))
    assert got == EXPECTED


def test_label_propagation_long_chain_converges(ray_session):
    """Chain of 12 nodes: pointer doubling must converge in
    O(log n) rounds (not one hop per round)."""
    n = 12
    pairs = [(f"n{i:02d}", f"n{i+1:02d}") for i in range(n - 1)]
    cfg = DedupConfig(driver_cc_max_edges=0)
    ids = [f"n{i:02d}" for i in range(n)]
    out = cc_mod.assign_clusters(_ids_ds(ids), _edges_ds(pairs), cfg).to_pandas()
    assert set(out.cluster_id) == {"n00"}


def test_random_graph_distributed_equals_driver(ray_session):
    """Randomized 5k-edge graph (mixed components, chains, stars):
    the distributed label-propagation path must produce EXACTLY the
    driver union-find clustering."""
    import numpy as np

    rng = np.random.default_rng(13)
    n = 2000
    ids = [f"v{i:05d}" for i in range(n)]
    # random edges within blocks of 40 (many medium components) plus
    # some long chain links
    pairs = []
    for _ in range(4500):
        b = int(rng.integers(0, n // 40)) * 40
        i, j = rng.integers(0, 40, 2)
        if i != j:
            pairs.append((ids[b + int(i)], ids[b + int(j)]))
    for i in range(0, n - 50, 50):
        pairs.append((ids[i], ids[i + 50]))  # cross-block chain

    edges = _edges_ds(pairs)
    drv = cc_mod.assign_clusters(
        _ids_ds(ids), edges, DedupConfig()
    ).to_pandas()
    dist = cc_mod.assign_clusters(
        _ids_ds(ids), edges, DedupConfig(driver_cc_max_edges=0)
    ).to_pandas()
    a = dict(zip(drv.image_id, drv.cluster_id))
    b = dict(zip(dist.image_id, dist.cluster_id))
    assert a == b
    # representative is the min member everywhere
    import pandas as pd

    mins = drv.groupby("cluster_id")["image_id"].min()
    assert (mins.index == mins.values).all()


def test_contracted_components_driver_finish(ray_session):
    """Force the contraction tier with a mid-size gate: one local
    round must shrink the random graph under the gate, and the driver
    finish + star composition must equal plain driver union-find."""
    import numpy as np

    rng = np.random.default_rng(7)
    n = 1500
    ids = [f"w{i:05d}" for i in range(n)]
    pairs = []
    for _ in range(4000):
        b = int(rng.integers(0, n // 30)) * 30
        i, j = rng.integers(0, 30, 2)
        if i != j:
            pairs.append((ids[b + int(i)], ids[b + int(j)]))
    for i in range(0, n - 60, 60):
        pairs.append((ids[i], ids[i + 60]))
    edges = _edges_ds(pairs)
    exp = cc_mod.assign_clusters(_ids_ds(ids), edges, DedupConfig()).to_pandas()
    # gate far below the edge count but far above the contracted size
    got = cc_mod.assign_clusters(
        _ids_ds(ids), edges, DedupConfig(driver_cc_max_edges=400)
    ).to_pandas()
    assert dict(zip(exp.image_id, exp.cluster_id)) == dict(
        zip(got.image_id, got.cluster_id)
    )


def test_label_propagation_direct_equals_driver(ray_session):
    """label_propagation stays covered directly (contraction defers to
    it when stalled): same randomized graph, same clustering."""
    import numpy as np

    rng = np.random.default_rng(29)
    n = 800
    ids = [f"u{i:05d}" for i in range(n)]
    pairs = []
    for _ in range(2000):
        b = int(rng.integers(0, n // 25)) * 25
        i, j = rng.integers(0, 25, 2)
        if i != j:
            pairs.append((ids[b + int(i)], ids[b + int(j)]))
    edges = _edges_ds(pairs)
    exp = cc_mod.driver_union_find(edges)
    lp = cc_mod.label_propagation(edges, DedupConfig()).to_pandas()
    got = dict(zip(lp.image_id, lp.cluster_id))
    for k, v in got.items():
        assert exp[k] == v
