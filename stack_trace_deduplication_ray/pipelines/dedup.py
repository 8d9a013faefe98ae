"""Flagship pipeline: images (or caption-only docs) -> dedup clusters.

Lifecycle (SURVEY.md §3.4):

    read -> signatures (actor map_batches, bytes projected away)
         -> per-family bucket expansion (exact / minhash / simhash /
            substring)
         -> salted groupby -> candidate edges
         -> verify (exact Jaccard / Hamming+PSNR / shared L-gram)
         -> union -> canonical edge dedup
         -> connected components -> clusters (+ stats)

Every intermediate is a streaming ``ray.data.Dataset``; only the edge
set (small relative to the corpus) and per-stage stats are ever
collected.
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


def build_edges(images_ds, sigs, cfg: DedupConfig, has_image: bool):
    """Run the enabled candidate+verify stages, union the edges."""
    edge_sets = []
    stats = []
    stages = cfg.stages if has_image else tuple(
        s for s in cfg.stages if s != "simhash"
    )

    # Each stage's verified edge set is materialized before the union:
    # edges are tiny relative to the corpus, this bounds the number of
    # concurrent join aggregator pools (two per stage), and the
    # materialized edge sets are the natural checkpoint boundary.
    # Candidate edge sets are materialized before verify and verified
    # sets before the union: a lazy input to a join would re-execute
    # its whole shuffle pipeline once for schema inference and again
    # for the join itself, and the materialized edge sets are the
    # natural checkpoint boundary (edges are tiny vs the corpus).
    if "exact" in stages:
        e, st = cand.pairs_from_buckets(ex.expand_exact(sigs), "exact", cfg)
        edge_sets.append(ver.finalize_exact(e.materialize()).materialize())
        stats.append(st)
    if "minhash" in stages:
        e, st = cand.pairs_from_buckets(
            ex.expand_minhash(sigs, cfg), "minhash", cfg
        )
        edge_sets.append(ver.verify_minhash(e.materialize(), sigs, cfg).materialize())
        stats.append(st)
    if "simhash" in stages and has_image:
        e, st = cand.pairs_from_buckets(
            ex.expand_simhash(sigs, cfg), "simhash", cfg
        )
        edge_sets.append(
            ver.verify_simhash(e.materialize(), sigs, images_ds, cfg).materialize()
        )
        stats.append(st)
    if "substring" in stages:
        e, st = cand.pairs_from_buckets(
            ex.expand_substring(sigs, cfg), "substring", cfg
        )
        edge_sets.append(
            ver.verify_substring(e.materialize(), sigs, cfg).materialize()
        )
        stats.append(st)

    edges = edge_sets[0]
    for e in edge_sets[1:]:
        edges = edges.union(e)
    return cand.dedup_edges(edges), stats


def run_dedup(images_ds, cfg: DedupConfig = DEFAULT_CONFIG, has_image: bool = True):
    """Full pipeline. Returns dict with 'clusters', 'edges', 'stats'.

    `images_ds` needs columns (image_id, caption) plus — when
    has_image — (bytes, fmt, phash).
    """
    sigs = (
        signature_stage(images_ds, cfg)
        if has_image
        else text_signature_stage(images_ds, cfg)
    )
    # signatures are re-read by several stages and the verify joins —
    # materialize once (bytes are NOT in this table).
    sigs = sigs.materialize()
    edges, stats = build_edges(images_ds, sigs, cfg, has_image)
    edges = edges.materialize()
    clusters = cc_mod.assign_clusters(sigs, edges, cfg)
    return {"clusters": clusters, "edges": edges, "stats": stats}


def cluster_summary(clusters) -> pa.Table:
    """Small summary table (driver-side safe): cluster size histogram.

    Reference analog: per-issue report histograms,
    /root/reference/helpers/print_dataset_sizes.py:11-60.
    """
    from ray.data.aggregate import Count

    sizes = clusters.groupby("cluster_id").count()
    hist = sizes.groupby("count()").count()
    t = hist.to_pandas().rename(
        columns={"count()": "cluster_size", "count()_2": "n_clusters"}
    )
    # ray names the second count col 'count()' too if no collision;
    # normalize defensively
    t.columns = ["cluster_size", "n_clusters"][: len(t.columns)]
    return pa.Table.from_pandas(t.sort_values("cluster_size"), preserve_index=False)
