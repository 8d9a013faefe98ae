"""Production job entry point: ``ray job submit -- python -m
stack_trace_deduplication_ray.job --input ... --output ...``.

The north-star launch shape (BASELINE.json: "launched via ray job
submit on fixed-size clusters"). Connects to the running cluster
(RAY_ADDRESS; local fallback), runs the flagship dedup over a parquet
or Lance images table, and writes a resumable run directory:

    <output>/clusters/part-*.parquet     (image_id, cluster_id)
    <output>/edges/part-*.parquet        (src, dst, stage, score)
    <output>/_run_manifest.json          config, stats, counts, lineage

``--checkpoint-dir`` enables the per-stage resume path (a re-submitted
job with the same config + input fingerprint skips completed stages,
state/checkpoint.py).
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True,
                    help="images table: parquet file/dir or Lance dataset")
    ap.add_argument("--output", required=True, help="run output directory")
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--text-only", action="store_true",
                    help="caption-only corpus (no image payloads)")
    ap.add_argument("--stages", default=None,
                    help="comma-separated stage names (default: config)")
    ap.add_argument("--num-partitions", type=int, default=0)
    args = ap.parse_args(argv)

    # surface the library's per-stage lineage logs (auto key-scheme
    # resolution, CC contraction progress, hot-bucket salting) in the
    # job driver's output; the library itself never touches handlers
    import logging

    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(name)s %(levelname)s %(message)s",
    )

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "auto"),
                 ignore_reinit_error=True)

    from stack_trace_deduplication_ray.config import DedupConfig
    from stack_trace_deduplication_ray.pipelines.dedup import run_dedup
    from stack_trace_deduplication_ray.sources.tables import read_images

    kwargs = {}
    if args.stages:
        kwargs["stages"] = tuple(args.stages.split(","))
    cfg = DedupConfig(num_partitions=args.num_partitions, **kwargs)

    images = read_images(args.input)
    t0 = time.time()
    res = run_dedup(
        images, cfg,
        has_image=not args.text_only,
        checkpoint_dir=args.checkpoint_dir,
        input_id=os.path.abspath(args.input),
    )
    os.makedirs(args.output, exist_ok=True)
    import shutil

    from stack_trace_deduplication_ray.state.checkpoint import parquet_rows

    # Ray writes uniquely-named files per run: clear each subdir first
    # so a rerun into the same --output never mixes stale parquet from
    # a previous run into the footer counts below (mirrors
    # StageCheckpoint.save).
    for sub in ("clusters", "edges"):
        p = os.path.join(args.output, sub)
        if os.path.isdir(p):
            shutil.rmtree(p)
    res["clusters"].write_parquet(os.path.join(args.output, "clusters"))
    res["edges"].write_parquet(os.path.join(args.output, "edges"))
    manifest = {
        "input": os.path.abspath(args.input),
        # counts from the written footers — .count() on the lazy
        # clusters dataset would re-execute the apply stage
        "rows": parquet_rows(os.path.join(args.output, "clusters")),
        "edges": parquet_rows(os.path.join(args.output, "edges")),
        "stats": res["stats"],
        "config": {k: (list(v) if isinstance(v, tuple) else v)
                   for k, v in vars(cfg).items()},
        "wall_sec": round(time.time() - t0, 3),
        "finished_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
    with open(os.path.join(args.output, "_run_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    print(json.dumps({k: manifest[k] for k in ("rows", "edges", "wall_sec")}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
