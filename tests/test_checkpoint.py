"""Checkpoint/resume: per-stage manifests, fingerprint invalidation,
byte-identical resumed output (SURVEY.md §5.2 resume test)."""

import json
import os
import shutil

import pytest

from stack_trace_deduplication_ray.config import DedupConfig
from stack_trace_deduplication_ray.state.checkpoint import (
    StageCheckpoint,
    config_fingerprint,
)


def test_fingerprint_changes_with_config_and_input():
    a = config_fingerprint(DedupConfig(), "in1")
    b = config_fingerprint(DedupConfig(), "in2")
    c = config_fingerprint(DedupConfig(shingle_k=7), "in1")
    assert a != b and a != c
    assert a == config_fingerprint(DedupConfig(), "in1")


def test_run_or_load_roundtrip(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data as rd

    ck = StageCheckpoint(str(tmp_path), "fp1")
    calls = []

    def thunk():
        calls.append(1)
        return rd.from_arrow(pa.table({"src": ["a"], "dst": ["b"]}))

    ds1, loaded1 = ck.run_or_load("stage_x", thunk)
    ds2, loaded2 = ck.run_or_load("stage_x", thunk)
    assert not loaded1 and loaded2
    assert len(calls) == 1
    assert ds2.to_pandas().equals(ds1.to_pandas())
    # manifest recorded
    man = json.load(open(os.path.join(tmp_path, "manifest.json")))
    assert man["stage_x"]["fingerprint"] == "fp1"
    assert man["stage_x"]["rows"] == 1


def test_fingerprint_mismatch_invalidates(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data as rd

    ck1 = StageCheckpoint(str(tmp_path), "fpA")
    ck1.run_or_load(
        "s", lambda: rd.from_arrow(pa.table({"v": [1]}))
    )
    ck2 = StageCheckpoint(str(tmp_path), "fpB")
    assert not ck2.has("s")
    _, loaded = ck2.run_or_load(
        "s", lambda: rd.from_arrow(pa.table({"v": [2]}))
    )
    assert not loaded
    assert ck2.load("s").to_pandas()["v"].tolist() == [2]


def test_pipeline_resume_identical_clusters(ray_session, small_fixture_dir, tmp_path):
    """Run the flagship with checkpoints; rerun; clusters identical and
    stage tables loaded (not recomputed)."""
    import ray.data as rd

    from stack_trace_deduplication_ray.pipelines.dedup import run_dedup

    images = rd.read_parquet(f"{small_fixture_dir}/images.parquet")
    cfg = DedupConfig()
    ckdir = str(tmp_path / "ck")
    r1 = run_dedup(images, cfg, checkpoint_dir=ckdir, input_id="fix1k")
    c1 = r1["clusters"].to_pandas().sort_values("image_id").reset_index(drop=True)
    man1 = json.load(open(os.path.join(ckdir, "manifest.json")))
    assert set(man1) >= {"exact_edges", "verified_edges"}
    r2 = run_dedup(images, cfg, checkpoint_dir=ckdir, input_id="fix1k")
    c2 = r2["clusters"].to_pandas().sort_values("image_id").reset_index(drop=True)
    assert c1.equals(c2)
    man2 = json.load(open(os.path.join(ckdir, "manifest.json")))
    # completed_at unchanged -> stages were loaded, not re-run
    for k in man1:
        assert man2[k]["completed_at"] == man1[k]["completed_at"]


def test_verify_only_knob_warm_resume(ray_session, small_fixture_dir, tmp_path):
    """Dependency-precise warmup (reference nearest-earlier analog,
    bucket_data.py:49-69): changing a verify-only threshold must keep
    the signature, exact-edge and candidate checkpoints warm (loaded,
    manifest rows untouched) and recompute ONLY the verify stage."""
    import ray.data as rd

    from stack_trace_deduplication_ray.pipelines.dedup import run_dedup

    images = rd.read_parquet(f"{small_fixture_dir}/images.parquet")
    ckdir = str(tmp_path / "ck")
    r1 = run_dedup(images, DedupConfig(), checkpoint_dir=ckdir, input_id="warm")
    c1 = r1["clusters"].to_pandas().sort_values("image_id").reset_index(drop=True)
    man1 = json.load(open(os.path.join(ckdir, "manifest.json")))
    assert set(man1) >= {
        "signatures", "exact_edges", "candidate_edges", "verified_edges"
    }

    # verify-only knob: PSNR threshold (same accept set on this
    # fixture, so clusters must also be identical)
    cfg2 = DedupConfig(psnr_threshold_db=39.5)
    r2 = run_dedup(images, cfg2, checkpoint_dir=ckdir, input_id="warm")
    c2 = r2["clusters"].to_pandas().sort_values("image_id").reset_index(drop=True)
    assert c1.equals(c2)
    man2 = json.load(open(os.path.join(ckdir, "manifest.json")))
    for stage in ("signatures", "exact_edges", "candidate_edges"):
        assert man2[stage]["completed_at"] == man1[stage]["completed_at"], stage
        assert man2[stage]["fingerprint"] == man1[stage]["fingerprint"], stage
    # verify re-ran under its own (changed) dependency fingerprint
    assert (
        man2["verified_edges"]["fingerprint"]
        != man1["verified_edges"]["fingerprint"]
    )


def test_partial_crash_resume(ray_session, small_fixture_dir, tmp_path):
    """Crash simulation: after a full run, invalidate ONLY the
    verified_edges stage (as if the job died mid-verify on a retry);
    the rerun must reload exact_edges untouched, recompute
    verified_edges, and produce identical clusters."""
    import ray.data as rd

    from stack_trace_deduplication_ray.pipelines.dedup import run_dedup

    images = rd.read_parquet(f"{small_fixture_dir}/images.parquet")
    cfg = DedupConfig()
    ckdir = str(tmp_path / "ck")
    r1 = run_dedup(images, cfg, checkpoint_dir=ckdir, input_id="crash")
    c1 = r1["clusters"].to_pandas().sort_values("image_id").reset_index(drop=True)
    man1 = json.load(open(os.path.join(ckdir, "manifest.json")))

    # simulate the crash: drop the verified stage's table
    shutil.rmtree(os.path.join(ckdir, "verified_edges"))

    r2 = run_dedup(images, cfg, checkpoint_dir=ckdir, input_id="crash")
    c2 = r2["clusters"].to_pandas().sort_values("image_id").reset_index(drop=True)
    assert c1.equals(c2)
    man2 = json.load(open(os.path.join(ckdir, "manifest.json")))
    # exact stage untouched (loaded), verify stage recomputed
    assert man2["exact_edges"]["completed_at"] == man1["exact_edges"]["completed_at"]
    assert man2["verified_edges"]["completed_at"] >= man1["verified_edges"]["completed_at"]


def test_save_executes_plan_exactly_once(ray_session, tmp_path):
    """StageCheckpoint.save must not re-execute the stage's lazy plan
    for the manifest row count (at 2M rows a second execution doubles
    the stage cost; the count comes from the written parquet footers)."""
    import pyarrow as pa
    import ray
    import ray.data as rd

    @ray.remote
    class Counter:
        def __init__(self):
            self.n = 0

        def incr(self, k):
            self.n += k
            return self.n

        def get(self):
            return self.n

    counter = Counter.remote()

    def bump(batch: pa.Table) -> pa.Table:
        ray.get(counter.incr.remote(len(batch)))
        return batch

    n_rows = 100
    ds = rd.range(n_rows).map_batches(bump, batch_format="pyarrow")
    ck = StageCheckpoint(str(tmp_path), "fp-once")
    ck.save("stage_once", ds)
    man = json.load(open(os.path.join(str(tmp_path), "manifest.json")))
    assert man["stage_once"]["rows"] == n_rows
    # every input row mapped exactly once: write executed the plan,
    # the manifest count did NOT
    assert ray.get(counter.get.remote()) == n_rows
