"""Flagship pipeline: images (or caption-only docs) -> dedup clusters.

Lifecycle (SURVEY.md §3.4, restructured for scale):

    read -> signatures (actor map_batches; bytes projected away)
         -> representative collapse: identical captions / identical
            payloads shrink to one rep each (one groupby per axis);
            the collapse edges are exact-dup edges needing no verify,
            and ALL sketch stages then run on unique content only —
            this removes identical-content skew at the root (the
            boilerplate caption becomes one rep) and cuts candidate
            volume by the duplication factor
         -> per-family bucket expansion on reps (minhash / simhash /
            substring), salted groupby -> candidate edges
         -> per-stage candidate dedup (bands/chunks emit the same pair
            many times) -> verify (exact Jaccard / PSNR / L-gram)
         -> union -> canonical edge dedup
         -> connected components -> clusters (+ stats)

Semantic note: collapsing by identical caption (resp. identical
payload bytes) is equivalent to running the sketch stages on every
row, because identical captions always pass the Jaccard verify (J=1)
and identical bytes always pass Hamming+PSNR (d=0, PSNR=inf); the
collapse edges encode exactly those guaranteed-verified pairs.

Every intermediate is a streaming ``ray.data.Dataset``; only edge sets
(small relative to the corpus) are materialized (checkpoint
boundaries).
"""

from __future__ import annotations

import logging

import pyarrow as pa

from stack_trace_deduplication_ray.config import DEFAULT_CONFIG, DedupConfig
from stack_trace_deduplication_ray.stages import candidates as cand
from stack_trace_deduplication_ray.stages import cc as cc_mod
from stack_trace_deduplication_ray.stages import expand as ex
from stack_trace_deduplication_ray.stages import verify as ver
from stack_trace_deduplication_ray.stages.signatures import (
    signature_stage,
    text_signature_stage,
)

logger = logging.getLogger(__name__)


def build_edges(images_ds, sigs, cfg: DedupConfig, has_image: bool, ckpt=None):
    """Run the enabled candidate+verify stages, union the edges.

    Returns (edges, stats). `sigs` must be materialized. `ckpt` is an
    optional state.checkpoint.StageCheckpoint: each stage's verified
    edge set is persisted and a resumed run skips completed stages.
    """
    edge_sets = []
    stats = []
    stages = cfg.stages if has_image else tuple(
        s for s in cfg.stages if s != "simhash"
    )

    def checkpointed(name, thunk):
        if ckpt is None:
            return thunk()
        ds, loaded = ckpt.run_or_load(name, thunk)
        if loaded:
            logger.info("stage %s: loaded from checkpoint", name)
        return ds

    # ---- representative collapse (exact dedup per axis) --------------
    cap_edges, cap_reps = cand.collapse_by(sigs, "caption_hash", "exact_caption")
    edge_sets.append(
        checkpointed("exact_caption", lambda: cap_edges.materialize())
    )
    cap_reps = cap_reps.materialize()
    if has_image:
        img_edges, img_reps = cand.collapse_by(sigs, "image_hash", "exact_image")
        edge_sets.append(
            checkpointed("exact_image", lambda: img_edges.materialize())
        )
        img_reps = img_reps.materialize()

    # ---- sketch stages over unique content ---------------------------
    # Candidate-pair dedup (bands/chunks emit the same pair many
    # times) is folded into each verify's first feature join
    # (dedup_pairs=True). The three independent stage chains execute
    # CONCURRENTLY in driver threads — each chain is a sequence of
    # barriers, and overlapping them hides the fixed per-op latency.
    from concurrent.futures import ThreadPoolExecutor

    def run_minhash():
        def thunk():
            e, st = cand.pairs_from_buckets(
                ex.expand_minhash(cap_reps, cfg), "minhash", cfg
            )
            run_minhash.stats = st
            return ver.verify_minhash(e.materialize(), cap_reps, cfg).materialize()

        return checkpointed("minhash", thunk), getattr(run_minhash, "stats", {"stage": "minhash"})

    def run_simhash():
        def thunk():
            e, st = cand.simhash_pairs_from_buckets(
                ex.expand_simhash(img_reps, cfg), "simhash", cfg
            )
            run_simhash.stats = st
            return ver.verify_simhash_psnr(e.materialize(), img_reps, cfg).materialize()

        return checkpointed("simhash", thunk), getattr(run_simhash, "stats", {"stage": "simhash"})

    def run_substring():
        def thunk():
            e, st = cand.pairs_from_buckets(
                ex.expand_substring(cap_reps, cfg), "substring", cfg
            )
            run_substring.stats = st
            return ver.verify_substring(e.materialize(), cap_reps, cfg).materialize()

        return checkpointed("substring", thunk), getattr(run_substring, "stats", {"stage": "substring"})

    chains = []
    if "minhash" in stages:
        chains.append(run_minhash)
    if "simhash" in stages and has_image:
        chains.append(run_simhash)
    if "substring" in stages:
        chains.append(run_substring)
    if chains:
        with ThreadPoolExecutor(max_workers=len(chains)) as pool:
            for edges_i, st in pool.map(lambda f: f(), chains):
                edge_sets.append(edges_i)
                stats.append(st)

    edges = edge_sets[0]
    for e in edge_sets[1:]:
        edges = edges.union(e)
    return cand.dedup_edges(edges), stats


def run_dedup(
    images_ds,
    cfg: DedupConfig = DEFAULT_CONFIG,
    has_image: bool = True,
    checkpoint_dir: str | None = None,
    input_id: str = "",
):
    """Full pipeline. Returns dict with 'clusters', 'edges', 'stats'.

    `images_ds` needs columns (image_id, caption) plus — when
    has_image — (bytes, fmt, phash).

    `checkpoint_dir` enables per-stage resume: each stage's verified
    edge set is written as partitioned parquet with a lineage manifest
    keyed by fingerprint(config, input_id); a rerun with the same
    fingerprint skips completed stages (SURVEY.md §4.3).
    """
    ckpt = None
    if checkpoint_dir is not None:
        from stack_trace_deduplication_ray.state.checkpoint import (
            StageCheckpoint,
            config_fingerprint,
        )

        ckpt = StageCheckpoint(
            checkpoint_dir, config_fingerprint(cfg, input_id)
        )
    sigs = (
        signature_stage(images_ds, cfg)
        if has_image
        else text_signature_stage(images_ds, cfg)
    )
    # signatures are re-read by several stages — materialize once
    # (bytes are NOT in this table).
    sigs = sigs.materialize()
    edges, stats = build_edges(images_ds, sigs, cfg, has_image, ckpt=ckpt)
    edges = edges.materialize()
    clusters = cc_mod.assign_clusters(sigs, edges, cfg)
    return {"clusters": clusters, "edges": edges, "stats": stats}


def cluster_summary(clusters) -> pa.Table:
    """Small summary table (driver-side safe): cluster size histogram.

    Reference analog: per-issue report histograms,
    /root/reference/helpers/print_dataset_sizes.py:11-60.
    """
    sizes = clusters.groupby("cluster_id").count()
    hist = sizes.groupby("count()").count()
    t = hist.to_pandas()
    t.columns = ["cluster_size", "n_clusters"][: len(t.columns)]
    return pa.Table.from_pandas(t.sort_values("cluster_size"), preserve_index=False)


def _fixture_rows_for_sf(sf_dir: str) -> int:
    """Deterministic synthetic-images size per test scale factor."""
    if "0.001" in sf_dir:
        return 500
    if "0.01" in sf_dir:
        return 2000
    return 8000


def image_dedup_clusters(sf_dir: str):
    """Flagship image+caption dedup over the deterministic synthetic
    fixture sized by sf (queries() entry; rows-only driver check —
    LSH/union-find is not SQL-expressible)."""
    import ray.data as rd

    from stack_trace_deduplication_ray.fixtures.images import materialize_fixture

    d = materialize_fixture(_fixture_rows_for_sf(sf_dir), seed=42)
    images = rd.read_parquet(f"{d}/images.parquet")
    return run_dedup(images, DEFAULT_CONFIG)["clusters"]


def image_dedup_recall(sf_dir: str):
    """The recall gate as a queryable metrics table: flagship clusters
    vs ground truth (BASELINE.json: dup-pair recall >= 0.99)."""
    import pyarrow.parquet as pq

    from stack_trace_deduplication_ray.eval.metrics import (
        dup_pair_metrics,
        metrics_table,
    )
    from stack_trace_deduplication_ray.fixtures.images import materialize_fixture

    d = materialize_fixture(_fixture_rows_for_sf(sf_dir), seed=42)
    clusters = image_dedup_clusters(sf_dir).to_pandas()
    truth = pq.read_table(f"{d}/truth_clusters.parquet").to_pandas()
    return metrics_table(dup_pair_metrics(clusters, truth))


def image_feature_table(sf_dir: str):
    """Multimodal image feature extraction (decode/resize/feature) over
    the synthetic fixture (actor-pool stage; rows-only check)."""
    import ray.data as rd

    from stack_trace_deduplication_ray.fixtures.images import materialize_fixture
    from stack_trace_deduplication_ray.stages.multimodal import image_features

    d = materialize_fixture(_fixture_rows_for_sf(sf_dir), seed=42)
    images = rd.read_parquet(f"{d}/images.parquet")
    return image_features(images).drop_columns(["thumb"])
