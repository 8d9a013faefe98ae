"""Candidate generation: salting correctness (salted == unsalted
clustering), bucket caps, edge dedup."""

import numpy as np
import pyarrow as pa
import pytest

from stack_trace_deduplication_ray.config import DedupConfig
from stack_trace_deduplication_ray.stages import candidates as cand
from stack_trace_deduplication_ray.stages import cc as cc_mod


def _expanded_ds(pairs):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "bucket": pa.array([b for b, _ in pairs], type=pa.int64()),
                "image_id": pa.array([i for _, i in pairs], type=pa.string()),
            }
        )
    )


def _components(edges_ds):
    labels = cc_mod.driver_union_find(edges_ds)
    return labels


def test_small_buckets_all_pairs(ray_session):
    rows = [(1, "a"), (1, "b"), (1, "c"), (2, "x"), (3, "y")]
    cfg = DedupConfig()
    edges, stats = cand.pairs_from_buckets(_expanded_ds(rows), "t", cfg)
    df = edges.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    assert [tuple(r) for r in df[["src", "dst"]].values] == [
        ("a", "b"), ("a", "c"), ("b", "c")
    ]
    assert stats["hot_buckets"] == 0


def test_hot_bucket_salted_same_component(ray_session):
    """A bucket far above the cap must be salted, yet all members must
    land in one connected component (bridge edges)."""
    n = 500
    cfg = DedupConfig(bucket_cap=64, salt_target=32, hot_sample_mod=1)
    rows = [(7, f"m{i:04d}") for i in range(n)]
    edges, stats = cand.pairs_from_buckets(_expanded_ds(rows), "t", cfg)
    assert stats["hot_buckets"] == 1
    assert stats["max_bucket"] == n
    labels = _components(edges)
    ids = [f"m{i:04d}" for i in range(n)]
    roots = {labels.get(i, i) for i in ids}
    assert len(roots) == 1
    # salted: pair count must be FAR below n^2/2
    assert edges.count() < n * 40


def test_salted_equals_unsalted_components(ray_session):
    """Same clustering with a cap that triggers salting vs one that
    doesn't (the salting-correctness requirement, SURVEY.md §7.4)."""
    rng = np.random.default_rng(5)
    rows = []
    for b in range(8):
        size = int(rng.integers(2, 120))
        rows += [(b, f"b{b}_{i:03d}") for i in range(size)]
    salted_cfg = DedupConfig(bucket_cap=16, salt_target=8, hot_sample_mod=1)
    plain_cfg = DedupConfig(bucket_cap=100_000, salt_target=8)
    e1, _ = cand.pairs_from_buckets(_expanded_ds(rows), "t", salted_cfg)
    e2, _ = cand.pairs_from_buckets(_expanded_ds(rows), "t", plain_cfg)
    l1 = _components(e1)
    l2 = _components(e2)
    all_ids = [i for _, i in rows]
    c1 = {}
    c2 = {}
    for i in all_ids:
        c1.setdefault(l1.get(i, i), set()).add(i)
        c2.setdefault(l2.get(i, i), set()).add(i)
    assert sorted(map(sorted, c1.values())) == sorted(map(sorted, c2.values()))


def test_sampled_hot_detection_finds_large_bucket(ray_session):
    """Default sampled detection (mod=16, no count shuffle) must find a
    genuinely hot bucket, salt it, and keep it one component."""
    n = 2000
    cfg = DedupConfig(bucket_cap=64, salt_target=32)  # hot_sample_mod=0 -> 16
    rows = [(9, f"s{i:05d}") for i in range(n)]
    edges, stats = cand.pairs_from_buckets(_expanded_ds(rows), "t", cfg)
    assert stats["hot_buckets"] == 1
    # estimate is within a factor ~2 of the true size
    assert n // 2 <= stats["max_bucket"] <= 2 * n
    labels = _components(edges)
    roots = {labels.get(f"s{i:05d}", f"s{i:05d}") for i in range(n)}
    assert len(roots) == 1
    assert edges.count() < n * 40


def test_single_sample_hit_never_flags_hot():
    """Once the auto modulus exceeds cap/2 (rows >= ~3.3M at the
    defaults), a single sampled row's estimate (1 x mod) clears the
    cap/2 threshold — without the >= 2-hits floor EVERY sampled bucket
    is flagged hot (measured: 4.5M hot buckets at 4M rows vs 63k at
    2M, an extra full re-key + bridge pass over the expansion)."""
    import pandas as pd

    parts = pd.DataFrame(
        {"bucket": list(range(1000)) + [5000] * 3,
         "c": [1] * 1000 + [1, 1, 1]}
    )
    hot, stats = cand._hot_from_partials(parts, cap=64, stage="t", mod=40)
    # singletons (est 40 > cap/2=32 but only 1 hit) stay cold; the
    # 3-hit bucket (est 120) is hot
    assert hot == {5000: 120}
    assert stats["hot_buckets"] == 1
    # exact mode (mod=1) still salts strictly above cap
    hot1, _ = cand._hot_from_partials(
        pd.DataFrame({"bucket": [1, 2], "c": [64, 65]}),
        cap=64, stage="t", mod=1,
    )
    assert hot1 == {2: 65}


def test_simhash_hot_bucket_bridged_same_component(ray_session):
    """Salted simhash buckets must emit bridge edges: identical
    simhashes split across salt sub-buckets still form one component."""
    import ray.data as rd

    n = 300
    cfg = DedupConfig(bucket_cap=32, salt_target=16, hot_sample_mod=1)
    t = pa.table(
        {
            "bucket": pa.array([5] * n, type=pa.int64()),
            "image_id": pa.array([f"q{i:04d}" for i in range(n)]),
            "simhash": pa.array([12345] * n, type=pa.int64()),
        }
    )
    edges, stats = cand.simhash_pairs_from_buckets(rd.from_arrow(t), "sh", cfg)
    assert stats["hot_buckets"] == 1
    labels = _components(edges)
    roots = {labels.get(f"q{i:04d}", f"q{i:04d}") for i in range(n)}
    assert len(roots) == 1


def test_dedup_edges_keeps_one_per_pair(ray_session):
    import ray.data as rd

    t = pa.table(
        {
            "src": ["a", "a", "b"],
            "dst": ["b", "b", "c"],
            "stage": ["minhash", "exact", "exact"],
            "score": [0.9, 1.0, 1.0],
        }
    )
    out = cand.dedup_edges(rd.from_arrow(t)).to_pandas()
    assert len(out) == 2
    assert set(zip(out.src, out.dst)) == {("a", "b"), ("b", "c")}


def test_simhash_combo_keys_complete_radius3():
    """Combination keys (6 sub-chunks choose 3) must guarantee a
    shared key for EVERY pair within Hamming distance 3 (pigeonhole:
    d <= n_sub - r). Beyond the radius sharing may or may not happen."""
    from stack_trace_deduplication_ray.functions import hashing as H

    rng = np.random.default_rng(0)
    x = rng.integers(0, 2**63, 300, dtype=np.int64).view(np.uint64)
    for d in range(4):
        y = x.copy()
        for i in range(len(y)):
            for b in rng.choice(64, size=d, replace=False):
                y[i] ^= np.uint64(1) << np.uint64(b)
        for sub, r in ((6, 3), (8, 5)):  # base and wide auto tiers
            kx = H.simhash_combo_keys(x, sub, r)
            ky = H.simhash_combo_keys(y, sub, r)
            assert all(
                np.intersect1d(kx[i], ky[i]).size > 0 for i in range(len(x))
            ), f"missed a pair at distance {d} for ({sub}, {r})"
    assert H.simhash_combo_keys(x).shape == (300, 20)
    assert H.simhash_combo_keys(x, 8, 5).shape == (300, 56)


def test_simhash_combo_mode_clusters_equal_chunks(ray_session):
    """combo and chunks key schemes both generate a superset of all
    radius-3 pairs; the in-bucket Hamming test filters exactly, so the
    final clustering must be IDENTICAL — and the auto threshold picks
    combo for large corpora without changing results."""
    import dataclasses

    import ray.data as rd

    from stack_trace_deduplication_ray.config import DedupConfig
    from stack_trace_deduplication_ray.fixtures.images import materialize_fixture
    from stack_trace_deduplication_ray.pipelines.dedup import run_dedup

    d = materialize_fixture(1000, seed=42)
    images = rd.read_parquet(f"{d}/images.parquet")
    base = DedupConfig(simhash_mode="chunks")
    combo = DedupConfig(simhash_mode="combo")
    auto_wide = dataclasses.replace(
        DedupConfig(), simhash_wide_threshold_rows=10
    )  # auto resolves to combo at 1000 rows
    combo_wide = DedupConfig(
        simhash_mode="combo", simhash_combo_sub=8, simhash_combo_r=5
    )  # the (8, 5) wide tier forced directly
    auto_widest = dataclasses.replace(
        DedupConfig(),
        simhash_wide_threshold_rows=10,
        simhash_combo_widen_rows=100,
    )  # auto resolves to the WIDE combo tier at 1000 rows
    out = {}
    for name, cfg in (
        ("chunks", base),
        ("combo", combo),
        ("auto", auto_wide),
        ("combo-wide", combo_wide),
        ("auto-widest", auto_widest),
    ):
        c = run_dedup(images, cfg)["clusters"].to_pandas()
        out[name] = c.sort_values("image_id").reset_index(drop=True)
    for name in ("combo", "auto", "combo-wide", "auto-widest"):
        assert out["chunks"].equals(out[name]), name
