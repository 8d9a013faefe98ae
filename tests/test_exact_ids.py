"""Collision-exact string-id mode (cfg.exact_string_ids): detection +
deterministic remap of 64-bit internal-id collisions, proven end to
end by shrinking the hash space until collisions are guaranteed
(birthday at 12 bits) and checking the clustering is unaffected —
while the flag-off run at the same width demonstrably merges rows."""

import numpy as np
import pyarrow as pa
import pytest

from stack_trace_deduplication_ray.config import DedupConfig
from stack_trace_deduplication_ray.stages.signatures import (
    REMAP_ID_BASE,
    iid_bits,
    internal_ids,
    remap_colliding_ids,
)


def test_iid_bits_and_masking():
    assert iid_bits(DedupConfig()) == 64
    assert iid_bits(DedupConfig(exact_string_ids=True)) == 63
    assert iid_bits(DedupConfig(iid_hash_bits=12)) == 12
    ids = pa.array([f"row{i}" for i in range(1000)])
    wide, was_str = internal_ids(ids)
    assert was_str
    narrow, _ = internal_ids(ids, bits=12)
    nv = narrow.to_numpy(zero_copy_only=False)
    assert nv.min() >= 0 and nv.max() < (1 << 12)
    # masking = top bits of the same hash
    wv = wide.to_numpy(zero_copy_only=False).view(np.uint64)
    assert (nv == (wv >> np.uint64(52)).astype(np.int64)).all()


def test_remap_unit(ray_session):
    import ray.data as rd

    sigs = rd.from_arrow(
        pa.table(
            {
                "image_id": pa.array([5, 5, 7, 7], type=pa.int64()),
                "orig_id": pa.array(["b", "a", "x", "x2"]),
                "payload": pa.array([1.0, 2.0, 3.0, 4.0]),
            }
        )
    )
    # iid 5 holds two DISTINCT originals (true collision); iid 7 also
    # does — both remap; determinism = lexicographic rank over ALL
    # colliding originals
    out, stats = remap_colliding_ids(sigs, DedupConfig(exact_string_ids=True))
    df = out.to_pandas().sort_values("orig_id").reset_index(drop=True)
    assert stats["colliding_ids"] == 2 and stats["colliding_rows"] == 4
    assert df["image_id"].tolist() == [
        REMAP_ID_BASE + 0,  # "a"
        REMAP_ID_BASE + 1,  # "b"
        REMAP_ID_BASE + 2,  # "x"
        REMAP_ID_BASE + 3,  # "x2"
    ]
    # non-id columns ride along untouched
    assert df["payload"].tolist() == [2.0, 1.0, 3.0, 4.0]


def test_remap_noop_without_collisions(ray_session):
    import ray.data as rd

    sigs = rd.from_arrow(
        pa.table(
            {
                "image_id": pa.array([1, 2, 3], type=pa.int64()),
                "orig_id": pa.array(["a", "b", "c"]),
            }
        )
    )
    out, stats = remap_colliding_ids(sigs, DedupConfig(exact_string_ids=True))
    assert stats["colliding_ids"] == 0
    assert sorted(out.to_pandas()["image_id"]) == [1, 2, 3]


def _clusters(res):
    return (
        res["clusters"].to_pandas().sort_values("image_id")
        .reset_index(drop=True)
    )


def test_birthday_collisions_corrected_e2e(ray_session, tmp_path):
    """At 12 hash bits a 500-row corpus collides by birthday (~30
    pairs). exact_string_ids=True must reproduce the full-width
    clustering exactly; the flag-off run at the same width must NOT
    (it silently merges distinct rows — the failure mode the flag
    removes)."""
    import ray.data as rd

    from stack_trace_deduplication_ray.fixtures.images import (
        materialize_fixture,
    )
    from stack_trace_deduplication_ray.pipelines.dedup import run_dedup

    d = materialize_fixture(500, seed=42)
    images = rd.read_parquet(f"{d}/images.parquet")

    base = _clusters(run_dedup(images, DedupConfig()))
    exact12 = run_dedup(
        images, DedupConfig(exact_string_ids=True, iid_hash_bits=12)
    )
    assert _clusters(exact12).equals(base)
    coll = next(
        s for s in exact12["stats"] if s.get("stage") == "exact_string_ids"
    )
    assert coll["colliding_ids"] > 0  # the space really collided

    merged = _clusters(run_dedup(images, DedupConfig(iid_hash_bits=12)))
    assert not merged.equals(base)

    # full-width exact mode (63 bits): no collisions at this size,
    # same clustering as the default 64-bit run
    exact = _clusters(run_dedup(images, DedupConfig(exact_string_ids=True)))
    assert exact.equals(base)


def test_delta_rejects_exact_mode(ray_session, tmp_path):
    import ray.data as rd

    from stack_trace_deduplication_ray.fixtures.images import (
        materialize_fixture,
    )
    from stack_trace_deduplication_ray.pipelines.dedup import run_dedup
    from stack_trace_deduplication_ray.pipelines.delta import run_dedup_delta

    d = materialize_fixture(500, seed=42)
    images = rd.read_parquet(f"{d}/images.parquet")
    ck = str(tmp_path / "ck")
    run_dedup(images, DedupConfig(), checkpoint_dir=ck, input_id="A")
    with pytest.raises(NotImplementedError, match="exact_string_ids"):
        run_dedup_delta(
            images, ck, DedupConfig(exact_string_ids=True)
        )
