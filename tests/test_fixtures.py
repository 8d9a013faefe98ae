import collections

import numpy as np
import pyarrow.parquet as pq

from stack_trace_deduplication_ray import schemas
from stack_trace_deduplication_ray.fixtures.images import (
    BOILERPLATE_CAPTION,
    make_images,
    materialize_fixture,
)
from stack_trace_deduplication_ray.functions.codecs import decode_image, phash64


def test_fixture_schema_and_determinism():
    a_imgs, a_truth = make_images(300, seed=42)
    b_imgs, b_truth = make_images(300, seed=42)
    assert a_imgs.schema.equals(schemas.IMAGES)
    assert a_truth.schema.equals(schemas.TRUTH_CLUSTERS)
    assert a_imgs.equals(b_imgs)
    assert a_truth.equals(b_truth)
    assert a_imgs.num_rows == 300


def test_fixture_classes_present():
    _, truth = make_images(800, seed=42)
    counts = collections.Counter(truth.column("dup_class").to_pylist())
    for cls in ["base", "exact", "reencode", "near_caption", "near_image",
                "substring", "distractor", "skew"]:
        assert counts[cls] > 0, cls


def test_cluster_id_is_min_member():
    _, truth = make_images(500, seed=42)
    groups = collections.defaultdict(list)
    for r in truth.to_pylist():
        groups[r["cluster_id"]].append(r["image_id"])
    for cid, members in groups.items():
        assert cid == min(members)


def test_stored_phash_matches_decoded_pixels():
    """Per-row invariant: the phash column equals phash64 of the
    decoded payload (decoded-pixel parity per input_hint)."""
    imgs, _ = make_images(60, seed=42)
    for r in imgs.to_pylist()[:30]:
        px = decode_image(r["bytes"], r["fmt"])
        assert phash64(px) == r["phash"]
        assert px.shape == (r["h"], r["w"], 3)


def test_skew_bucket_shares_one_caption_and_cluster():
    imgs, truth = make_images(1000, seed=42)
    caps = imgs.column("caption").to_pylist()
    cls = truth.column("dup_class").to_pylist()
    cids = truth.column("cluster_id").to_pylist()
    skew_cids = {c for c, k in zip(cids, cls) if k == "skew"}
    assert len(skew_cids) == 1
    for cap, k in zip(caps, cls):
        if k == "skew":
            assert cap == BOILERPLATE_CAPTION


def test_materialize_fixture_cached(tmp_path):
    d1 = materialize_fixture(100, seed=42, root=str(tmp_path))
    d2 = materialize_fixture(100, seed=42, root=str(tmp_path))
    assert d1 == d2
    t = pq.read_table(f"{d1}/images.parquet")
    assert t.num_rows == 100


def test_shuffled_loader(ray_session):
    """K7 shuffled-loader analog: seeded random_shuffle preserves the
    row multiset and is deterministic for a fixed seed + layout."""
    import ray.data as rd

    ds = rd.range(1000)
    s1 = [r["id"] for r in ds.random_shuffle(seed=42).take_all()]
    s2 = [r["id"] for r in ds.random_shuffle(seed=42).take_all()]
    assert sorted(s1) == list(range(1000))
    assert s1 == s2
    assert s1 != list(range(1000))
