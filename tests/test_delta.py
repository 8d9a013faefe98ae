"""Delta (incremental) dedup: full-run(A ∪ B) == delta-run(B | ckpt(A))
byte-identical clusters, chaining, merged-state validity, and the
touched-working-set bound (SURVEY.md §2.3 T10/T11 accumulated-state
attach; reference event_state_model.py:106-121)."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _split_interleaved(src_parquet: str, out_dir: str, mod: int = 4):
    """Deterministic interleaved split: every `mod`-th row is the
    delta (B), the rest the base (A) — guarantees many duplicate
    groups straddle the boundary."""
    t = pq.read_table(src_parquet)
    idx = list(range(len(t)))
    b_idx = [i for i in idx if i % mod == 0]
    a_idx = [i for i in idx if i % mod != 0]
    a_path = os.path.join(out_dir, "a.parquet")
    b_path = os.path.join(out_dir, "b.parquet")
    pq.write_table(t.take(a_idx), a_path)
    pq.write_table(t.take(b_idx), b_path)
    return a_path, b_path


def _clusters(res):
    df = res["clusters"].to_pandas()
    return df.sort_values("image_id").reset_index(drop=True)


@pytest.fixture(scope="module")
def split_fixture(ray_session, tmp_path_factory):
    from stack_trace_deduplication_ray.fixtures.images import (
        materialize_fixture,
    )

    d = materialize_fixture(800, seed=7)
    out = str(tmp_path_factory.mktemp("delta_split"))
    a, b = _split_interleaved(os.path.join(d, "images.parquet"), out)
    return {"full": os.path.join(d, "images.parquet"), "a": a, "b": b,
            "tmp": out}


def test_delta_equals_full(split_fixture, tmp_path):
    """The headline contract: attaching B to checkpoint(A) yields the
    SAME clusters table as one full run over A ∪ B."""
    import ray.data as rd

    from stack_trace_deduplication_ray.config import DedupConfig
    from stack_trace_deduplication_ray.pipelines.dedup import run_dedup
    from stack_trace_deduplication_ray.pipelines.delta import run_dedup_delta

    cfg = DedupConfig()
    full = _clusters(
        run_dedup(rd.read_parquet(split_fixture["full"]), cfg)
    )

    ckdir = str(tmp_path / "ck_a")
    run_dedup(
        rd.read_parquet(split_fixture["a"]), cfg,
        checkpoint_dir=ckdir, input_id="A",
    )["clusters"].materialize()

    res = run_dedup_delta(
        rd.read_parquet(split_fixture["b"]), ckdir, cfg
    )
    delta = _clusters(res)
    assert delta.equals(full)

    # the working set is delta-sized, not corpus-sized
    att = next(s for s in res["stats"] if s.get("stage") == "delta_attach")
    assert att["delta_rows"] == 200
    assert att["prior_rows"] == 600
    assert att["touched_prior_rows"] < att["prior_rows"]


def test_delta_cfg_defaults_from_prior_checkpoint(split_fixture, tmp_path):
    """run_config.json written by the full run supplies the delta
    cfg when none is passed (the sketch parameters MUST match the
    stored signatures)."""
    import ray.data as rd

    from stack_trace_deduplication_ray.config import DedupConfig
    from stack_trace_deduplication_ray.pipelines.dedup import run_dedup
    from stack_trace_deduplication_ray.pipelines.delta import run_dedup_delta
    from stack_trace_deduplication_ray.state.checkpoint import load_run_config

    cfg = DedupConfig(shingle_k=4)
    ckdir = str(tmp_path / "ck_a")
    run_dedup(
        rd.read_parquet(split_fixture["a"]), cfg,
        checkpoint_dir=ckdir, input_id="A",
    )["clusters"].materialize()
    stored, input_id = load_run_config(ckdir)
    assert stored == cfg and input_id == "A"

    full = _clusters(
        run_dedup(rd.read_parquet(split_fixture["full"]), cfg)
    )
    delta = _clusters(
        run_dedup_delta(rd.read_parquet(split_fixture["b"]), ckdir)
    )
    assert delta.equals(full)


def test_delta_chain_and_merged_state(split_fixture, tmp_path):
    """((A)+B1)+B2 == full(A ∪ B1 ∪ B2): the merged-state checkpoint
    written by one delta run warm-starts the next."""
    import ray.data as rd

    from stack_trace_deduplication_ray.config import DedupConfig
    from stack_trace_deduplication_ray.pipelines.dedup import run_dedup
    from stack_trace_deduplication_ray.pipelines.delta import run_dedup_delta

    # split B again: B1 = odd half, B2 = even half
    t = pq.read_table(split_fixture["b"])
    b1 = os.path.join(str(tmp_path), "b1.parquet")
    b2 = os.path.join(str(tmp_path), "b2.parquet")
    pq.write_table(t.take(list(range(0, len(t), 2))), b1)
    pq.write_table(t.take(list(range(1, len(t), 2))), b2)

    cfg = DedupConfig()
    full = _clusters(
        run_dedup(rd.read_parquet(split_fixture["full"]), cfg)
    )

    ck_a = str(tmp_path / "ck_a")
    ck_ab1 = str(tmp_path / "ck_ab1")
    run_dedup(
        rd.read_parquet(split_fixture["a"]), cfg,
        checkpoint_dir=ck_a, input_id="A",
    )["clusters"].materialize()
    run_dedup_delta(
        rd.read_parquet(b1), ck_a, cfg, output_checkpoint_dir=ck_ab1
    )["clusters"].materialize()

    # merged state is a complete, row-count-consistent checkpoint
    man = json.load(open(os.path.join(ck_ab1, "manifest.json")))
    assert {"signatures", "exact_edges", "verified_edges"} <= set(man)
    assert man["signatures"]["rows"] == 700  # 600 prior + 100 delta

    chained = _clusters(
        run_dedup_delta(rd.read_parquet(b2), ck_ab1, cfg)
    )
    assert chained.equals(full)


def test_delta_empty(split_fixture, tmp_path):
    """A zero-row delta reproduces the prior clustering exactly."""
    import ray.data as rd

    from stack_trace_deduplication_ray.config import DedupConfig
    from stack_trace_deduplication_ray.pipelines.dedup import run_dedup
    from stack_trace_deduplication_ray.pipelines.delta import run_dedup_delta

    cfg = DedupConfig()
    ckdir = str(tmp_path / "ck_a")
    base = _clusters(
        run_dedup(
            rd.read_parquet(split_fixture["a"]), cfg,
            checkpoint_dir=ckdir, input_id="A",
        )
    )
    empty_p = os.path.join(str(tmp_path), "empty.parquet")
    pq.write_table(pq.read_table(split_fixture["b"]).slice(0, 0), empty_p)
    delta = _clusters(run_dedup_delta(rd.read_parquet(empty_p), ckdir, cfg))
    assert delta.equals(base)


def test_delta_rejects_in_place_output(split_fixture, tmp_path):
    import ray.data as rd

    from stack_trace_deduplication_ray.config import DedupConfig
    from stack_trace_deduplication_ray.pipelines.dedup import run_dedup
    from stack_trace_deduplication_ray.pipelines.delta import run_dedup_delta

    ckdir = str(tmp_path / "ck_a")
    run_dedup(
        rd.read_parquet(split_fixture["a"]), DedupConfig(),
        checkpoint_dir=ckdir, input_id="A",
    )["clusters"].materialize()
    with pytest.raises(ValueError, match="in-place"):
        run_dedup_delta(
            rd.read_parquet(split_fixture["b"]), ckdir,
            output_checkpoint_dir=ckdir,
        )


def test_delta_text_corpus(ray_session, tmp_path):
    """has_image=False path: caption-only corpora attach the same way
    (minhash + substring families; no simhash / image axis)."""
    import ray.data as rd

    from stack_trace_deduplication_ray.config import DedupConfig
    from stack_trace_deduplication_ray.pipelines.dedup import run_dedup
    from stack_trace_deduplication_ray.pipelines.delta import run_dedup_delta

    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    rows = []
    for i in range(300):
        base = " ".join(words[(i + j) % 6] for j in range(8))
        rows.append((f"d{i:04d}", base))
        if i % 3 == 0:  # near-dup pair straddling the split below
            rows.append((f"d{i:04d}x", base + " extra"))
    t = pa.table(
        {
            "image_id": pa.array([r[0] for r in rows]),
            "caption": pa.array([r[1] for r in rows]),
        }
    )
    full_p = os.path.join(str(tmp_path), "docs.parquet")
    pq.write_table(t, full_p)
    a, b = _split_interleaved(full_p, str(tmp_path), mod=5)

    cfg = DedupConfig(stages=("exact", "minhash", "substring"))
    full = _clusters(
        run_dedup(rd.read_parquet(full_p), cfg, has_image=False)
    )
    ckdir = str(tmp_path / "ck_a")
    run_dedup(
        rd.read_parquet(a), cfg, has_image=False,
        checkpoint_dir=ckdir, input_id="A",
    )["clusters"].materialize()
    delta = _clusters(
        run_dedup_delta(rd.read_parquet(b), ckdir, cfg, has_image=False)
    )
    assert delta.equals(full)


def test_delta_minhash_query_matches_full_run(ray_session):
    """The queries() entry delta_minhash_dedup_clusters (incremental
    attach over the documents table) must equal minhash_dedup_clusters
    (one full run) row-for-row — the same equivalence its shared
    pure-SQL DuckDB oracle checks in the driver."""
    from stack_trace_deduplication_ray.pipelines.delta import (
        delta_minhash_dedup_clusters,
    )
    from stack_trace_deduplication_ray.pipelines.text import (
        minhash_dedup_clusters,
    )

    sf = os.environ.get("GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    delta_df = (
        delta_minhash_dedup_clusters(sf).to_pandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    full_df = (
        minhash_dedup_clusters(sf).to_pandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    assert len(delta_df) > 0
    assert delta_df.equals(full_df)


def test_checkpoint_empty_stage_roundtrip(ray_session, tmp_path):
    """StageCheckpoint.save of an EMPTY dataset must still produce a
    loadable checkpoint (Ray's parquet sink writes no files for zero
    rows; a corpus slice with zero edges in some family is
    legitimate)."""
    import ray.data as rd

    from stack_trace_deduplication_ray.state.checkpoint import (
        StageCheckpoint,
    )

    st = StageCheckpoint(str(tmp_path / "ck"), "fp0")
    empty = rd.from_arrow(
        pa.table({"src": pa.array([], pa.int64()),
                  "dst": pa.array([], pa.int64())})
    )
    st.save("edges", empty)
    assert st.has("edges")
    back = st.load("edges")
    assert back.count() == 0
    assert set(back.schema().names) == {"src", "dst"}
