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
