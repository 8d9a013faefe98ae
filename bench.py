#!/usr/bin/env python
"""Bench harness: headline pipelines over $GRAFT_SF_DIR.

Default mode prints ONE JSON line:
    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": ..., "num_cpus": N,
     "throughput": {...rows/sec...}}

--scaling runs the flagship dedup pipeline twice in FRESH processes
(num_cpus=8 then num_cpus=32) on the same input and reports both
throughputs plus scaling efficiency = (T_lo/T_hi) / (32/8); with
--record it also updates the "Measured results" section of
BASELINE.md. This is the sandbox substitute for the N vs 4N node
criterion (SURVEY.md §4.3).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
IMAGE_BENCH_ROWS = int(os.environ.get("GRAFT_IMAGE_ROWS", "8000"))


def _init_ray(num_cpus: int):
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False


def _consume(res) -> int:
    """Consume a query result, returning its row count."""
    if hasattr(res, "count") and not hasattr(res, "num_rows"):  # Dataset
        return res.count()
    if hasattr(res, "num_rows"):  # pyarrow.Table
        return res.num_rows
    return len(res)


def headline_queries():
    from stack_trace_deduplication_ray.pipelines import (
        analysis,
        evaluation,
        neural,
        ranking,
        relational,
        rerank,
        similarity,
        text,
        training,
    )

    return {
        "dedup_documents_e2e": text.minhash_dedup_clusters,
        "exact_dedup_keep_first": text.exact_dedup_keep_first,
        "token_document_frequency": analysis.token_document_frequency,
        "quality_scores": analysis.quality_scores,
        "lineitem_pricing_summary": relational.lineitem_pricing_summary,
        "top_orders_by_revenue": relational.top_orders_by_revenue,
        "events_daily_user_agg": relational.events_daily_user_agg,
        "events_replay_attach": relational.events_replay_attach,
        "knn_brute_force": similarity.knn_brute_force,
        "lsh_near_pairs": similarity.lsh_near_pairs,
        "ann_recall": similarity.ann_recall,
        "lerch_pair_scores": ranking.lerch_pair_scores,
        # round-5 additions: neural pair scorers (P4/P5, seeded numpy
        # inference) and the embedding-client actor pool (T13) —
        # totals before round 5 exclude these three entries
        "s3m_pair_scores": neural.s3m_pair_scores,
        "cross_encoder_rerank": neural.cross_encoder_rerank,
        "embed_client_vectors": analysis.embed_client_vectors,
        # round-5 addition: head training (distributed feature pass +
        # full-batch Adam) — totals before it exclude this entry
        "train_cross_encoder": training.train_cross_encoder_metrics,
        "retrieval_rank_metrics": evaluation.retrieval_rank_metrics,
    }


def bench_image_dedup(n_rows: int) -> tuple[float, int]:
    """Flagship image+caption dedup over the synthetic fixture
    (generated once, cached under /tmp; parallel sharded generation
    above 50k rows)."""
    import ray.data as rd

    from stack_trace_deduplication_ray.config import DedupConfig
    from stack_trace_deduplication_ray.fixtures.images import (
        materialize_fixture,
        materialize_fixture_sharded,
    )
    from stack_trace_deduplication_ray.pipelines.dedup import run_dedup
    from stack_trace_deduplication_ray.sources.tables import tune_data_context

    tune_data_context()

    import ray

    if n_rows > 50_000:
        d = materialize_fixture_sharded(n_rows, seed=42)
        images = rd.read_parquet([f"{d}/{f}" for f in sorted(__import__("os").listdir(d)) if f.startswith("images_")])
        # fused pipeline: 1x-CPU shuffle partitions measured faster
        # than 2x at 500k rows (158 s vs 194 s @32 CPUs) — fewer,
        # larger exchanges since the stage fusion
        cfg = DedupConfig()
    else:
        d = materialize_fixture(n_rows, seed=42)
        images = rd.read_parquet(f"{d}/images.parquet")
        cfg = DedupConfig()
    t0 = time.time()
    res = run_dedup(images, cfg)
    n = res["clusters"].count()
    elapsed = time.time() - t0

    # recall gate at bench scale (excluded from the timed section)
    import glob

    import pyarrow.parquet as pq

    from stack_trace_deduplication_ray.eval.metrics import pair_recall_fast

    truth_files = sorted(glob.glob(f"{d}/truth*.parquet"))
    recall = None
    if truth_files:
        import pandas as pd

        truth = pd.concat(
            [pq.read_table(f).to_pandas() for f in truth_files],
            ignore_index=True,
        )
        m = pair_recall_fast(res["clusters"].to_pandas(), truth)
        recall = round(m["recall"], 4)
        bench_image_dedup.last_metrics = m
    bench_image_dedup.last_recall = recall
    return elapsed, n


def run_bench() -> dict:
    _init_ray(NUM_CPUS)
    times: dict[str, float] = {}
    rows: dict[str, int] = {}

    calib_pre = host_calibration()

    # delta-attach setup (fixture split + prior full run w/ checkpoint)
    # is UNTIMED: it happens before the headline clock starts and is
    # resume-cached under /tmp across bench runs
    from stack_trace_deduplication_ray.config import DEFAULT_CONFIG
    from stack_trace_deduplication_ray.pipelines import delta as delta_mod

    delta_split = delta_mod._fixture_split(SF_DIR)
    delta_ck = delta_mod._prepare_prior(delta_split, DEFAULT_CONFIG)

    s0 = _proc_stat()
    t0 = time.time()
    t_img, n_img = bench_image_dedup(IMAGE_BENCH_ROWS)
    times["dedup_images_e2e"] = round(t_img, 3)
    rows["dedup_images_e2e"] = n_img

    for name, fn in headline_queries().items():
        t1 = time.time()
        n = _consume(fn(SF_DIR))
        times[name] = round(time.time() - t1, 3)
        rows[name] = n

    # incremental attach: prior full run over 3/4 of the fixture is
    # UNTIMED setup (resume-cached across bench runs); the timed part
    # is attaching the remaining 1/4 against the prior checkpoints —
    # delta cost should track the delta+touched working set, not the
    # corpus (compare against dedup_images_e2e over the same fixture)
    import ray.data as rd

    t1 = time.time()
    dres = delta_mod.run_dedup_delta(
        rd.read_parquet(os.path.join(delta_split, "b.parquet")), delta_ck,
        DEFAULT_CONFIG,
    )
    n = dres["clusters"].count()
    times["dedup_images_delta"] = round(time.time() - t1, 3)
    rows["dedup_images_delta"] = n

    # two-stage rerank, COLD vs WARM: a fresh run dir forces stage-1
    # retrieval to execute; the second invocation resumes from the T9
    # candidate checkpoint — the delta is what the checkpoint buys
    import shutil
    import tempfile

    from stack_trace_deduplication_ray.pipelines import rerank

    rr_dir = tempfile.mkdtemp(prefix="bench_rerank_")
    try:
        t1 = time.time()
        n = _consume(rerank.retrieve_rerank_metrics(SF_DIR, run_dir=rr_dir))
        times["retrieve_rerank_metrics"] = round(time.time() - t1, 3)
        rows["retrieve_rerank_metrics"] = n
        t1 = time.time()
        n = _consume(rerank.retrieve_rerank_metrics(SF_DIR, run_dir=rr_dir))
        times["retrieve_rerank_warm"] = round(time.time() - t1, 3)
        rows["retrieve_rerank_warm"] = n
    finally:
        shutil.rmtree(rr_dir, ignore_errors=True)
    total = round(time.time() - t0, 3)

    throughput = {
        "images_per_sec": round(IMAGE_BENCH_ROWS / t_img, 1),
    }
    # host-window stamp: identical code measures up to ~2.5x apart on
    # this shared host depending on bus weather (BASELINE.md); the
    # probe + steal let a reader judge THIS run's window quality
    s1 = _proc_stat()
    host = {"calib_pre": calib_pre, "calib_post": host_calibration()}
    if s0 and s1:
        d = [b - a for a, b in zip(s0, s1)]
        tot = max(1, sum(d))
        if len(d) > 7:
            host["steal_pct"] = round(100.0 * d[7] / tot, 2)
        if len(d) > 4:
            host["iowait_pct"] = round(100.0 * d[4] / tot, 2)
    return {
        "metric": "headline_pipelines_total",
        "value": total,
        "unit": "sec",
        "queries": times,
        "rows": rows,
        "throughput": throughput,
        "host": host,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
    }


def run_delta_bench() -> dict:
    """Delta-attach cost demonstration: full run over N rows vs delta
    attach of the LAST shard (~1/9 of rows) against a prior run over
    the rest — the daily-delta shape. All three runs measured in one
    session on the sharded fixture (shard boundaries are the natural
    ingestion deltas). The headline number is t_delta / t_full against
    the delta fraction: equivalence of the outputs is pinned by
    tests/test_delta.py; this measures that the attach cost tracks the
    delta working set, not the corpus. Override rows with
    GRAFT_DELTA_ROWS."""
    import shutil

    import ray.data as rd

    from stack_trace_deduplication_ray.config import DedupConfig
    from stack_trace_deduplication_ray.fixtures.images import (
        materialize_fixture_sharded,
    )
    from stack_trace_deduplication_ray.pipelines.dedup import run_dedup
    from stack_trace_deduplication_ray.pipelines.delta import run_dedup_delta
    from stack_trace_deduplication_ray.sources.tables import tune_data_context

    _init_ray(NUM_CPUS)
    tune_data_context()
    rows = int(os.environ.get("GRAFT_DELTA_ROWS", "225000"))
    # always >=9 shards so the last-shard delta is ~1/9 of the corpus
    # at any row count (25k shards would leave one shard below 225k)
    d = materialize_fixture_sharded(
        rows, seed=42, shard_rows=min(25_000, max(1, rows // 9))
    )
    files = sorted(
        f"{d}/{f}" for f in os.listdir(d) if f.startswith("images_")
    )
    prior_files, delta_files = files[:-1], files[-1:]
    cfg = DedupConfig()
    calib = host_calibration()

    t0 = time.time()
    full = run_dedup(rd.read_parquet(files), cfg)
    n_full = full["clusters"].count()
    t_full = round(time.time() - t0, 3)

    ck = "/tmp/bench_delta_ck"
    shutil.rmtree(ck, ignore_errors=True)
    t0 = time.time()
    run_dedup(
        rd.read_parquet(prior_files), cfg,
        checkpoint_dir=ck, input_id="bench_prior",
    )
    t_prior = round(time.time() - t0, 3)

    t0 = time.time()
    dres = run_dedup_delta(rd.read_parquet(delta_files), ck, cfg)
    n_delta_clusters = dres["clusters"].count()
    t_delta = round(time.time() - t0, 3)
    att = next(
        s for s in dres["stats"] if s.get("stage") == "delta_attach"
    )
    # phase attribution: the eager phases are timed inside
    # run_dedup_delta; the remainder of t_delta is the LAZY cluster
    # emit over the merged corpus — corpus-sized by contract (the
    # output IS the full clustering) — plus checkpoint load
    phases = dict(att.get("phase_sec", {}))
    phases["cluster_emit_and_load"] = round(
        t_delta - sum(phases.values()), 3
    )
    return {
        "metric": "delta_attach_cost",
        "value": round(t_delta / t_full, 3),
        "unit": "t_delta/t_full ratio",
        "rows_total": rows,
        "delta_rows": att["delta_rows"],
        "delta_fraction": round(att["delta_rows"] / rows, 3),
        "touched_prior_rows": att["touched_prior_rows"],
        "t_full_sec": t_full,
        "t_prior_sec": t_prior,
        "t_delta_sec": t_delta,
        "delta_phase_sec": phases,
        "clusters_full": n_full,
        "clusters_after_delta": n_delta_clusters,
        "host_calib": calib,
        "num_cpus": NUM_CPUS,
    }


def run_scaling(record: bool) -> dict:
    """Same flagship job at 8 and 32 CPUs in fresh processes.

    Defaults to 2M rows — the scale of the recorded BASELINE.md pair:
    the criterion needs an input where compute dominates fixed
    per-exchange latency (at the 8k quick-bench size the job is
    overhead-bound at both levels; 500k leaves the exchange floor
    visible; 4M pushes the combo-key random-collision term into the
    shared memory bus — see BASELINE.md). Override with
    GRAFT_SCALING_ROWS."""
    results = {}
    for cpus in (8, 32):
        env = dict(os.environ)
        env["RAY_GRAFT_CPUS"] = str(cpus)
        env["GRAFT_SF_DIR"] = SF_DIR
        env.setdefault("GRAFT_SCALING_ROWS", "2000000")
        out = subprocess.run(
            [sys.executable, __file__, "--flagship-only"],
            capture_output=True, text=True, env=env,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        line = out.stdout.strip().splitlines()[-1]
        results[cpus] = json.loads(line)
    t8 = results[8]["flagship_sec"]
    t32 = results[32]["flagship_sec"]
    eff = (t8 / t32) / (32 / 8)
    summary = {
        "metric": "scaling_efficiency_8_to_32",
        "value": round(eff, 3),
        "unit": "ratio",
        "t_num_cpus_8_sec": t8,
        "t_num_cpus_32_sec": t32,
        "throughput_8": results[8]["images_per_sec"],
        "throughput_32": results[32]["images_per_sec"],
        "recall_8": results[8].get("dup_pair_recall"),
        "recall_32": results[32].get("dup_pair_recall"),
        "host_calib_8": [results[8].get("host_calib_pre"),
                         results[8].get("host_calib_post")],
        "host_calib_32": [results[32].get("host_calib_pre"),
                          results[32].get("host_calib_post")],
        "steal_pct_8": results[8].get("steal_pct"),
        "steal_pct_32": results[32].get("steal_pct"),
        "iowait_pct_8": results[8].get("iowait_pct"),
        "iowait_pct_32": results[32].get("iowait_pct"),
        "rows": results[32]["rows"],
        "sf": SF_DIR,
    }
    if record:
        _record_baseline(summary)
    return summary


def _record_baseline(summary: dict) -> None:
    """Rewrite ONLY the latest-run sub-block of BASELINE.md (the
    narrative section above the sub-marker is preserved)."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE.md")
    marker = "\n### Latest bench.py --scaling --record run\n"
    with open(path) as f:
        content = f.read()
    if marker in content:
        content = content[: content.index(marker)]
    block = (
        f"{marker}\n"
        f"| quantity | value |\n|---|---|\n"
        f"| flagship image-dedup rows | {summary['rows']} |\n"
        f"| wall time @ num_cpus=8 | {summary['t_num_cpus_8_sec']} s |\n"
        f"| wall time @ num_cpus=32 | {summary['t_num_cpus_32_sec']} s |\n"
        f"| throughput @ 8 | {summary['throughput_8']} images/s |\n"
        f"| throughput @ 32 | {summary['throughput_32']} images/s |\n"
        f"| scaling efficiency (8 -> 32 CPUs, = (T8/T32)/4) | "
        f"{summary['value']} |\n"
    )
    with open(path, "w") as f:
        f.write(content + block)


_MC_PROBE_SNIPPET = (
    "import numpy as np\n"
    "a = np.arange(64 * 1024 * 1024, dtype=np.uint8)\n"
    "for _ in range(3):\n"
    "    int(a.sum())\n"
)


def host_calibration() -> dict:
    """Host-weather probe recorded beside each scaling leg, so the
    window quality of a pair is measured in-run instead of asserted.

    Two numbers, because the two failure modes differ:
    - sc_sec: single-core pass (3x sum over 64 MB + 16 MB blake2b).
      Inflates under CPU steal / frequency throttling. ~0.14 s idle.
    - mc_gbps: AGGREGATE bandwidth of 8 concurrent worker processes
      doing the same sum pass. One core cannot saturate the memory
      bus, so a noisy neighbor hammering the shared bus leaves sc_sec
      at idle level while mc_gbps collapses — measured on the seventh
      2M pair, whose exchange phases ran 2.5x slow (candidates 541.7 s
      vs ~217 s, verify 295.3 s vs ~100 s at 8 CPUs) under idle-level
      sc probes and 0.6% steal: the bandwidth-bound phases are exactly
      the ones a saturated bus starves."""
    import hashlib

    import numpy as np

    a = np.arange(64 * 1024 * 1024, dtype=np.uint8)  # deterministic fill
    t0 = time.time()
    for _ in range(3):
        int(a.sum())
    hashlib.blake2b(a[: 16 * 1024 * 1024].tobytes()).digest()
    sc = time.time() - t0

    # plain subprocesses (no fork of a Ray-initialized driver, no
    # multiprocessing spawn re-import); numpy import time is excluded
    # by having each worker time ONLY the sum loop is not possible
    # cheaply, so the ~0.2 s interpreter+numpy startup is a constant
    # additive bias — identical across windows, harmless to compare
    nw = 8
    samples = []
    for round_i in range(4):  # round 0 warms page cache + numpy import
        t0 = time.time()
        procs = [
            subprocess.Popen([sys.executable, "-c", _MC_PROBE_SNIPPET])
            for _ in range(nw)
        ]
        for p in procs:
            p.wait()
        wall = time.time() - t0
        if round_i:
            samples.append((nw * 3 * 64 / 1024.0) / wall)  # GiB / sec
    samples.sort()
    # median + min of 3: the bus weather itself moves 2x second to
    # second, so a single snapshot under-determines the window
    return {
        "sc_sec": round(sc, 3),
        "mc_gbps": round(samples[1], 2),
        "mc_gbps_min": round(samples[0], 2),
    }


def _proc_stat() -> list[int] | None:
    """Aggregate cpu line of /proc/stat (user nice system idle iowait
    irq softirq steal ...), or None off-Linux."""
    try:
        with open("/proc/stat") as f:
            return [int(x) for x in f.readline().split()[1:]]
    except (OSError, ValueError):
        return None


def run_flagship_only() -> dict:
    """One flagship image-dedup run; used by --scaling subprocesses."""
    _init_ray(NUM_CPUS)
    n_rows = int(os.environ.get("GRAFT_SCALING_ROWS", str(IMAGE_BENCH_ROWS)))
    calib_pre = host_calibration()
    s0 = _proc_stat()
    t, n = bench_image_dedup(n_rows)
    s1 = _proc_stat()
    stat = {}
    if s0 and s1:
        d = [b - a for a, b in zip(s0, s1)]
        tot = max(1, sum(d))
        # steal = ticks the host ran someone else while this guest was
        # runnable — external contention measured exactly over the
        # flagship interval, with zero probe load
        stat = {
            "steal_pct": round(100.0 * d[7] / tot, 2) if len(d) > 7 else None,
            "iowait_pct": round(100.0 * d[4] / tot, 2) if len(d) > 4 else None,
        }
    return {
        "flagship_sec": round(t, 3),
        "images_per_sec": round(n_rows / t, 1),
        "rows": n_rows,
        "num_cpus": NUM_CPUS,
        "dup_pair_recall": getattr(bench_image_dedup, "last_recall", None),
        "host_calib_pre": calib_pre,
        "host_calib_post": host_calibration(),
        **stat,
    }


if __name__ == "__main__":
    import ray

    mode = sys.argv[1] if len(sys.argv) > 1 else ""
    if mode == "--scaling":
        out = run_scaling(record="--record" in sys.argv)
    elif mode == "--delta":
        out = run_delta_bench()
    elif mode == "--flagship-only":
        out = run_flagship_only()
    else:
        out = run_bench()
    print(json.dumps(out))
    ray.shutdown()
