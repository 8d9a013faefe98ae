#!/usr/bin/env python
"""Per-phase profiler for the flagship image+caption dedup pipeline.

Mirrors pipelines.dedup.run_dedup stage by stage (same helpers, same
config resolution), timing each phase's materialization and — with
--volumes — counting the rows every candidate-stage expansion feeds
into the fused exchange, so superlinear growth across scales can be
ATTRIBUTED (exchange volume vs salting vs kernel work) instead of
guessed. The round-4 analysis (BASELINE.md "4M-row pair") is based on
exactly this decomposition; the script lives in-repo now so the
evidence is reproducible.

Usage:
    python tools/profile_phases.py --rows 2000000 --cpus 32 --volumes

Prints ONE JSON line:
    {"rows":..., "cpus":..., "phases": {...sec...},
     "volumes": {stage: expansion_rows, "candidate_pairs": n, ...},
     "exchange_bytes": {...analytic rows x width...},
     "salting": {...}, "host": {...probe...}}

Counting a lazy expansion executes its map chain once more (cheap
vectorized hashing over the materialized signature table — no extra
shuffle, no decode); skip --volumes for pure timing runs.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=500_000)
    p.add_argument("--cpus", type=int, default=32)
    p.add_argument("--volumes", action="store_true")
    a = p.parse_args()

    import ray

    ray.init(
        address="local", num_cpus=a.cpus, include_dashboard=False,
        ignore_reinit_error=True, logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import ray.data as rd

    from bench import host_calibration
    from stack_trace_deduplication_ray import registry
    from stack_trace_deduplication_ray.config import (
        DedupConfig,
        coalesce_for_table,
    )
    from stack_trace_deduplication_ray.fixtures.images import (
        materialize_fixture,
        materialize_fixture_sharded,
    )
    from stack_trace_deduplication_ray.pipelines import dedup as dd
    from stack_trace_deduplication_ray.sources.tables import tune_data_context
    from stack_trace_deduplication_ray.stages import candidates as cand
    from stack_trace_deduplication_ray.stages import verify as ver
    from stack_trace_deduplication_ray.stages.signatures import signature_stage

    tune_data_context()
    if a.rows > 50_000:
        d = materialize_fixture_sharded(a.rows, seed=42)
        files = [
            f"{d}/{f}" for f in sorted(os.listdir(d))
            if f.startswith("images_")
        ]
        images = rd.read_parquet(files)
    else:
        d = materialize_fixture(a.rows, seed=42)
        images = rd.read_parquet(f"{d}/images.parquet")

    out: dict = {
        "rows": a.rows, "cpus": a.cpus,
        "phases": {}, "volumes": {}, "exchange_bytes": {},
        "host_pre": host_calibration(),
    }
    cfg = DedupConfig()

    t0 = time.time()
    sigs = signature_stage(images, cfg).materialize()
    out["phases"]["signatures"] = round(time.time() - t0, 1)

    n_rows = sigs.count()
    cfg = coalesce_for_table(cfg, n_rows, sigs.num_blocks())
    cfg, scheme = dd.resolve_simhash_mode(cfg, n_rows)
    if scheme:
        out["key_scheme"] = scheme

    # ---- collapse (the annotated exchange materializes inside) ------
    axes = [
        ("caption_hash", "exact_caption",
         ["caption_norm", "bands", "n_shingles"]),
        ("image_hash", "exact_image", ["simhash"]),
    ]
    t0 = time.time()
    exact_edges, reps = cand.collapse_dual(sigs, axes, cfg)
    exact_edges = exact_edges.materialize()
    out["phases"]["collapse"] = round(time.time() - t0, 1)
    cap_reps, img_reps = reps["exact_caption"], reps["exact_image"]

    expansions = []
    for stage_name in cfg.stages:
        if stage_name == "exact":
            continue
        spec = registry.get("expansion", stage_name)
        src = cap_reps if spec.source == "caption" else img_reps
        expansions.append(
            (src, (lambda sp: lambda s: sp.build(s, cfg))(spec), stage_name)
        )

    if a.volumes:
        # exchange width per expansion row in the fused shuffle:
        # bucket 8 + image_id 8 + simhash 8 + stage 1 (+ obucket 8
        # when anything salts — counted separately below)
        width = 25
        t0 = time.time()
        for src, fn, stage_name in expansions:
            n = fn(src).count()
            out["volumes"][stage_name] = int(n)
            out["exchange_bytes"][stage_name] = int(n) * width
        out["volumes"]["reps_caption"] = cap_reps.count()
        out["volumes"]["reps_image"] = img_reps.count()
        out["phases"]["volume_count_overhead"] = round(time.time() - t0, 1)

    t0 = time.time()
    cand_edges, st = cand.fused_pairs_from_buckets(
        expansions, cfg, approx_rows=n_rows
    )
    cand_edges = cand_edges.materialize()
    out["phases"]["candidates"] = round(time.time() - t0, 1)
    out["salting"] = st
    out["volumes"]["candidate_pairs"] = cand_edges.count()
    if a.volumes:
        # per-stage pair counts: which family's pairs grow with scale
        import pyarrow as pa

        def partial(batch: pa.Table) -> pa.Table:
            import numpy as np

            codes = batch.column("stage").to_numpy(zero_copy_only=False)
            vals, cnts = np.unique(codes, return_counts=True)
            return pa.table(
                {"stage": pa.array(vals.astype(np.int64)),
                 "c": pa.array(cnts.astype(np.int64))}
            )

        pc_df = cand_edges.map_batches(
            partial, batch_format="pyarrow"
        ).to_pandas()
        names = [s for _, _, s in expansions]
        out["pairs_by_stage"] = {
            names[int(k)]: int(v)
            for k, v in pc_df.groupby("stage")["c"].sum().items()
        }

    t0 = time.time()
    verified = ver.verify_fused(
        cand_edges, sigs, cfg, True,
        stage_names=[st for _, _, st in expansions],
    ).materialize()
    out["phases"]["verify"] = round(time.time() - t0, 1)
    out["volumes"]["verified_pairs"] = verified.count()

    t0 = time.time()
    edges = exact_edges.union(verified).materialize()
    out["phases"]["edge_union"] = round(time.time() - t0, 1)
    out["volumes"]["edges"] = edges.count()

    t0 = time.time()
    id_map = sigs.select_columns(["image_id", "orig_id"])
    if a.volumes and edges.count() <= cfg.driver_cc_max_edges:
        # decomposed fast path (mirrors finish_clusters' driver-CC
        # branch): separate the edge pull + union-find from the
        # label-apply map wave
        from stack_trace_deduplication_ray.pipelines.dedup import (
            _apply_labels_with_names,
        )
        from stack_trace_deduplication_ray.stages import cc as cc_mod

        labels = cc_mod.driver_union_find_arrays(edges)
        out["phases"]["cc_pull_uf"] = round(time.time() - t0, 1)
        out["volumes"]["touched_nodes"] = int(len(labels[0]))
        t0 = time.time()
        clusters = _apply_labels_with_names(id_map, labels, cfg)
        out["volumes"]["clusters"] = clusters.count()
        out["phases"]["cc_emit"] = round(time.time() - t0, 1)
    else:
        clusters = dd.finish_clusters(id_map, edges, cfg, True)
        out["volumes"]["clusters"] = clusters.count()
        out["phases"]["cc_apply"] = round(time.time() - t0, 1)

    out["total_sec"] = round(
        sum(v for k, v in out["phases"].items()
            if k != "volume_count_overhead"), 1,
    )
    out["host_post"] = host_calibration()
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
