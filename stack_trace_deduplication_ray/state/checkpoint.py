"""Per-stage checkpointing with lineage manifest (resumable execution).

Reference analog: day-indexed state pickles with nearest-earlier warmup
(/root/reference/ea/sim/main/data/buckets/bucket_data.py:49-69) and the
id->hash JSON persistence of HashStorage (ea/sim/main/data/duplicates.py:39-58)
— recast as: each completed stage writes its (small) output table as
partitioned parquet plus a manifest entry keyed by a FINGERPRINT of
(config, stage, input). A resumed run with the same fingerprint skips
the stage and reads the table; any config or input change invalidates
exactly the affected stages.

The checkpointed tables are the per-stage edge sets and the final
clusters — tiny relative to the corpus, so checkpointing costs little
and a crash never re-runs a finished candidate/verify stage.
"""

from __future__ import annotations

import json
import os
import threading
import time
from dataclasses import asdict

from stack_trace_deduplication_ray.config import DedupConfig


def parquet_rows(path: str) -> int:
    """Row count of a written parquet directory from file FOOTERS only
    (no data scan, no plan execution). Public: the job CLI uses it for
    manifest counts."""
    return sum(_parquet_partition_rows(path).values())


def _parquet_partition_rows(path: str) -> dict[str, int]:
    """Per-partition (per written file) row counts from parquet
    footers — the per-partition lineage record for stage manifests."""
    import pyarrow.parquet as pq

    out: dict[str, int] = {}
    for root, _, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(root, f)
                out[os.path.relpath(p, path)] = pq.read_metadata(p).num_rows
    return out


RUN_CONFIG_FILE = "run_config.json"


def write_run_config(root: str, cfg: DedupConfig, input_id: str = "") -> None:
    """Persist the run's ORIGINAL config (pre-tuning, auto modes
    unresolved) + input id next to the stage checkpoints, so a later
    delta run (pipelines/delta.py) can warm-start with exactly the
    sketch configuration the stored signatures/edges were built under."""
    os.makedirs(root, exist_ok=True)
    tmp = os.path.join(root, RUN_CONFIG_FILE + ".tmp")
    with open(tmp, "w") as f:
        json.dump(
            {"config": asdict(cfg), "input_id": input_id},
            f, indent=1, sort_keys=True, default=str,
        )
    os.replace(tmp, os.path.join(root, RUN_CONFIG_FILE))


def load_run_config(root: str) -> tuple[DedupConfig, str] | None:
    """(config, input_id) stored by write_run_config, or None."""
    p = os.path.join(root, RUN_CONFIG_FILE)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        d = json.load(f)
    raw = dict(d["config"])
    if isinstance(raw.get("stages"), list):
        raw["stages"] = tuple(raw["stages"])
    return DedupConfig(**raw), d.get("input_id", "")


def config_fingerprint(cfg: DedupConfig, extra: str = "") -> str:
    """Deterministic fingerprint of the dedup configuration (+ an
    input identifier supplied by the caller)."""
    import hashlib

    # _EDGE_SPACE_VERSION invalidates checkpoints written under an
    # older edge-table id encoding (v3: int64 internal-id domain)
    payload = (
        json.dumps(asdict(cfg), sort_keys=True, default=str)
        + "|" + _EDGE_SPACE_VERSION + "|" + extra
    )
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


# v4: fused candidate-edge checkpoints carry (src, dst, stage int8
# code) — no score column, no string label (see candidates._pair_table)
_EDGE_SPACE_VERSION = "idspace-v4-int64-stagecode"


# Config fields each checkpointed stage's OUTPUT depends on. Execution
# knobs (batch sizes, partition counts, coalesce gates, broadcast
# limits, driver_cc_max_edges) never appear: they change HOW a stage
# runs, not WHAT it produces. This is the engine's answer to the
# reference's nearest-earlier checkpoint warmup (bucket_data.py:49-69):
# instead of replaying forward from the closest compatible snapshot, a
# config change invalidates exactly the stages whose dependency set it
# touches — changing a verify-only threshold reuses the signature,
# exact-edge and candidate checkpoints and recomputes verify alone.
_CAND_FIELDS = (
    "exact_string_ids", "iid_hash_bits",
    "lowercase", "shingle_k", "num_perm", "minhash_seed", "bands",
    "rows_per_band", "simhash_mode", "simhash_chunks",
    "simhash_combo_sub", "simhash_combo_r",
    "simhash_wide_threshold_rows", "simhash_combo_wide_sub",
    "simhash_combo_wide_r", "simhash_combo_widen_rows",
    "substring_min_len", "winnow_window",
    "bucket_cap", "salt_target", "hot_sample_mod", "stages",
)
STAGE_DEPENDS: dict[str, tuple[str, ...]] = {
    "signatures": (
        "exact_string_ids", "iid_hash_bits",
        "lowercase", "shingle_k", "num_perm", "minhash_seed",
        "bands", "rows_per_band",
    ),
    "exact_edges": ("exact_string_ids", "iid_hash_bits", "lowercase", "stages"),
    "candidate_edges": _CAND_FIELDS,
    "verified_edges": _CAND_FIELDS
    + ("jaccard_threshold", "hamming_radius", "psnr_threshold_db"),
}


def stage_fingerprint(cfg: DedupConfig, stage: str, extra: str = "") -> str:
    """Fingerprint of only the config fields `stage`'s output depends
    on (STAGE_DEPENDS) + the input identifier. Stages without a
    declared dependency set fall back to the full-config fingerprint
    (conservative)."""
    import hashlib

    fields = STAGE_DEPENDS.get(stage)
    if fields is None:
        return config_fingerprint(cfg, extra)
    sub = {f: getattr(cfg, f) for f in fields}
    payload = (
        json.dumps(sub, sort_keys=True, default=str)
        + "|" + _EDGE_SPACE_VERSION + "|" + stage + "|" + extra
    )
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


def stage_fingerprints(cfg: DedupConfig, extra: str = "") -> dict[str, str]:
    """Per-stage fingerprints for every declared stage."""
    return {s: stage_fingerprint(cfg, s, extra) for s in STAGE_DEPENDS}


class StageCheckpoint:
    """Directory-backed stage checkpoint store.

    Layout:
        <root>/manifest.json             {stage: {fingerprint, rows, ...}}
        <root>/<stage>/part-*.parquet    the stage's output table
    """

    def __init__(
        self,
        root: str,
        fingerprint: str,
        stage_fps: dict[str, str] | None = None,
    ):
        self.root = root
        self.fingerprint = fingerprint
        # per-stage fingerprints (stage_fingerprints(cfg, input)): a
        # stage listed here validates against ITS dependency-set
        # fingerprint instead of the global one, so unrelated config
        # changes keep its checkpoint warm
        self.stage_fps = stage_fps or {}
        os.makedirs(root, exist_ok=True)
        self._manifest_path = os.path.join(root, "manifest.json")
        self._manifest = self._load_manifest()
        # save() is called from concurrent stage-chain threads
        # (pipelines/dedup.build_edges); guard manifest mutation +
        # serialization so a dump never races a concurrent insert.
        self._lock = threading.Lock()

    def _load_manifest(self) -> dict:
        if os.path.exists(self._manifest_path):
            with open(self._manifest_path) as f:
                return json.load(f)
        return {}

    def _store_manifest(self) -> None:
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self._manifest, f, indent=1, sort_keys=True)
        os.replace(tmp, self._manifest_path)

    def _fp(self, stage: str) -> str:
        return self.stage_fps.get(stage, self.fingerprint)

    def has(self, stage: str) -> bool:
        entry = self._manifest.get(stage)
        return (
            entry is not None
            and entry.get("fingerprint") == self._fp(stage)
            and os.path.isdir(os.path.join(self.root, stage))
        )

    def load(self, stage: str):
        import ray.data as rd

        assert self.has(stage), f"no valid checkpoint for stage {stage!r}"
        return rd.read_parquet(os.path.join(self.root, stage))

    def save(self, stage: str, ds) -> None:
        """Write the stage output (partitioned parquet) + manifest row.

        The manifest row is written only after the parquet write
        completes, so a crash mid-write leaves `has()` false and the
        stage re-runs (at-least-once, idempotent)."""
        path = os.path.join(self.root, stage)
        if os.path.isdir(path):  # stale attempt from a crashed run
            import shutil

            shutil.rmtree(path)
        ds.write_parquet(path)
        if not os.path.isdir(path):
            # Ray's parquet sink writes NO files (and no directory) for
            # an empty dataset, which would make has() false and load()
            # impossible — but an empty stage is a legitimate result
            # (e.g. a corpus slice with zero exact-dup edges that a
            # delta attach later unions with). Persist the schema as an
            # empty parquet file so the checkpoint round-trips.
            import pyarrow.parquet as pq

            os.makedirs(path, exist_ok=True)
            pq.write_table(
                ds.schema().base_schema.empty_table(),
                os.path.join(path, "empty.parquet"),
            )
        # counts from the WRITTEN files' parquet footers: calling
        # ds.count() here would re-execute the stage's whole lazy plan
        # (measured: the rerank retrieval stage ran twice per cold run).
        # The per-file map is the per-partition lineage record — a
        # resumed or audited run can check each partition's row count
        # against the manifest without scanning data.
        parts = _parquet_partition_rows(path)
        with self._lock:
            self._manifest[stage] = {
                "fingerprint": self._fp(stage),
                "rows": sum(parts.values()),
                "partitions": dict(sorted(parts.items())),
                "completed_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
            }
            self._store_manifest()

    def run_or_load(self, stage: str, thunk):
        """Execute `thunk()` (returning a Dataset) unless a valid
        checkpoint exists; either way return a Dataset and record
        lineage."""
        if self.has(stage):
            return self.load(stage), True
        ds = thunk()
        self.save(stage, ds)
        return self.load(stage), False
