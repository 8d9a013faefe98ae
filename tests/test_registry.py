"""Extension registry: built-ins resolve; a custom expansion family
runs through the fused pipeline by name (SURVEY.md §2.10)."""

import numpy as np
import pyarrow as pa
import pytest

from stack_trace_deduplication_ray import registry
from stack_trace_deduplication_ray.config import DedupConfig


def test_builtins_registered():
    assert registry.names("expansion") == ["minhash", "simhash", "substring"]
    assert set(registry.names("pair_scorer")) == {"fast", "lerch"}
    assert "roc_auc" in registry.names("metric")
    with pytest.raises(KeyError):
        registry.get("expansion", "nope")


def test_custom_expansion_family_runs_by_name(ray_session):
    """Register a trivial 'firstword' family (bucket = hash of the
    first caption word) and run the engine with it via cfg.stages."""
    import ray.data as rd

    from stack_trace_deduplication_ray.functions import hashing as H
    from stack_trace_deduplication_ray.pipelines.dedup import run_dedup

    def expand_firstword(reps, cfg):
        def fn(batch: pa.Table) -> pa.Table:
            caps = batch.column("caption_norm").to_pylist()
            first = [c.split(" ")[0] if c else "" for c in caps]
            b = H.hash_bytes_arrays(first, seed=99).view(np.int64)
            return pa.table(
                {"bucket": pa.array(b), "image_id": batch.column("image_id")}
            )

        return reps.select_columns(["image_id", "caption_norm"]).map_batches(
            fn, batch_format="pyarrow"
        )

    try:
        registry.register(
            "expansion", "firstword",
            registry.ExpansionSpec("caption", expand_firstword),
        )
    except ValueError:
        pass  # already registered by a previous test run in-process

    docs = rd.from_items(
        [
            {"image_id": "a", "caption": "hello world one"},
            {"image_id": "b", "caption": "hello there two"},
            {"image_id": "c", "caption": "goodbye now"},
        ]
    )
    cfg = DedupConfig(
        stages=("exact", "firstword"), jaccard_threshold=0.05, shingle_k=3
    )
    res = run_dedup(docs, cfg, has_image=False)
    cl = res["clusters"].to_pandas().set_index("image_id").cluster_id
    # a and b share the first word AND pass the low Jaccard bar -> merged
    assert cl["a"] == cl["b"]
    assert cl["c"] != cl["a"]
    edges = res["edges"].to_pandas()
    assert (edges.stage == "firstword").any()
