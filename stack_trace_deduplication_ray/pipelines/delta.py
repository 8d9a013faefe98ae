"""Incremental (delta) dedup: attach NEW rows to a prior run's state.

This is the reference's core execution model — a new report arrives and
is matched against the accumulated index
(/root/reference/ea/sim/main/methods/base.py attach loop via
ea/sim/main/data/buckets/event_state_model.py:106-121) with
nearest-earlier checkpoint warmup
(ea/sim/main/data/buckets/bucket_data.py:49-69) — recast as the
daily-delta batch shape a 100-TB production pipeline actually runs:

    full_run(A, checkpoint_dir=D)          # once
    run_dedup_delta(B, prior_dir=D)        # every day: cost ~ O(|B|)
    == run_dedup(A ∪ B)                    # byte-identical clusters

Design (all existing machinery reused, nothing re-implemented):

1. Signatures are computed for the DELTA only (the expensive
   decode/sketch pass never re-runs over prior rows — their signature
   table is already checkpointed).
2. The delta's bucket keys for EVERY candidate family (exact caption /
   exact image hashes, LSH band keys, simhash probe keys, winnowed
   substring fingerprints) are collected into per-family sorted
   arrays and broadcast once (`ray.put`).
3. One shuffle-free filter pass over the prior signature table keeps
   only rows whose content shares at least one key with the delta —
   the TOUCHED working set. Everything a full run over A ∪ B could
   ever pair with a delta row is in it:
   - the key families cover every bucket space the candidate stages
     probe, so any (new, prior) candidate pair shares a key by
     construction;
   - touched sets are closed under exact duplication (identical
     content ⇒ identical keys), so exact-collapse groups are never
     split.
   Families are tested cheapest-first with per-batch short-circuit
   (the winnowing recompute only runs on rows nothing else matched).
4. The EXISTING full pipeline (collapse → fused candidates → verify,
   pipelines/dedup.build_edges) runs on (delta ∪ touched) — a working
   set sized by the delta and its bucket neighborhoods, not the
   corpus. Its edges are folded into the prior edge checkpoints and
   connected components run over the merged edge set (prior edges
   carry the accumulated connectivity; union-find is
   duplicate-tolerant, so re-found prior pairs are harmless).
5. Optionally the MERGED state (signatures, exact/verified edges) is
   written to a new checkpoint dir, so deltas chain:
   ((A)+B)+C == full(A ∪ B ∪ C).

Equivalence argument (full(A∪B) == delta(B | ckpt(A))): bucket keys
are pure functions of row content, so two rows share a bucket in the
full run iff they share one in whichever sub-run contains both; every
cross (new, prior) bucket co-residency lands in the union-run via the
touched filter, every prior-prior one is already decided in the prior
edge set, and verify kernels compare content, not run context.
Collapse representatives may DIFFER between runs (min id over a
different subset) but identical content yields identical keys and
identical verify outcomes, so the verified pairs connect the same
components either way. Proven byte-identical in
tests/test_delta.py.

ONE PRECISE CARVE-OUT — hot-bucket chain truncation: inside a bucket
over `bucket_cap`, candidate generation is position-dependent (CHAIN
pairs of consecutive members in iid-sort order), so a prior-prior
pair that was consecutive in run A may stop being a full-run
candidate when delta rows interleave — full(A∪B) relies on the
replacement links (P1,D),(D,P2) instead, and if verify rejects both
AND no other band/family pairs P1,P2, the from-scratch run loses a
connection the delta run keeps. In that divergence the delta side is
the better answer: the retained edge was VERIFIED true near-dup
content; what differs is the full run's cap sampling, not the
verdict. This is exactly the reference's accumulated-state semantics
(event_state_model attach never re-litigates prior conclusions):
delta connectivity ⊇ full connectivity, with every extra edge
verify-passed. Equality is exact whenever no over-cap bucket has
delta rows interleaving a previously-consecutive verified pair — in
particular everywhere candidate generation is position-independent
(all buckets ≤ bucket_cap).

SCALE NOTES:
- The delta key sets are driver-merged: O(|delta| x keys/row) int64
  values (a 1M-row delta at ~40 keys/row is ~320 MB — fine). For
  deltas approaching corpus size, run a full dedup instead; the
  crossover is measured in bench.py's delta entry. For deltas too big
  to broadcast but still corpus-small (e.g. 100M rows against 1e10),
  CHAIN the attach over delta shards (((A)+B1)+B2...; chaining is
  equivalence-tested) — each leg's broadcast is shard-sized, and the
  per-leg O(|A|) scan is the term the persisted key->partition index
  below would remove.
- The prior-signature filter pass is a SCAN of the prior signature
  table (column-pruned parquet read + vectorized hashing +
  searchsorted, no shuffle, no decode) — the unavoidable O(|A|) term.
  A production deployment amortizing many deltas per day would keep a
  persisted bucket-key -> partition index to skip even this; the scan
  is the honest single-pass form.
- The merged-state write copies the prior signature parquet into the
  new checkpoint dir (self-contained state). A deployment would
  reference prior partitions instead of rewriting them; row counts
  and layout are preserved either way.
"""

from __future__ import annotations

import logging
import os
import time

import numpy as np
import pyarrow as pa

from stack_trace_deduplication_ray.config import (
    DedupConfig,
    coalesce_for_rows,
    coalesce_for_table,
)
from stack_trace_deduplication_ray.functions import hashing as H
from stack_trace_deduplication_ray.stages import candidates as cand
from stack_trace_deduplication_ray.stages.expand import winnow_fingerprints
from stack_trace_deduplication_ray.stages.signatures import (
    signature_stage,
    text_signature_stage,
)

logger = logging.getLogger(__name__)

U64 = np.uint64

#: stages a prior checkpoint must hold to warm-start a delta run
PRIOR_STAGES = ("signatures", "exact_edges", "verified_edges")

#: stage labels of collapse (exact) edges — everything else is a
#: verified sketch edge (see candidates.collapse_dual / verify)
EXACT_STAGE_LABELS = ("exact_caption", "exact_image")


def load_prior_state(checkpoint_dir: str) -> dict:
    """Open a prior run's checkpoint dir for delta attach.

    Returns {"signatures", "exact_edges", "verified_edges"} as lazy
    Datasets plus {"rows": {stage: n}} from the manifest (footer
    counts — no scan) and the stored run config (or None)."""
    import json

    import ray.data as rd

    from stack_trace_deduplication_ray.state.checkpoint import load_run_config

    mpath = os.path.join(checkpoint_dir, "manifest.json")
    if not os.path.exists(mpath):
        raise FileNotFoundError(
            f"no checkpoint manifest at {mpath}; delta attach needs a "
            f"completed run_dedup(checkpoint_dir=...) state"
        )
    with open(mpath) as f:
        manifest = json.load(f)
    out: dict = {"rows": {}, "manifest": manifest}
    for stage in PRIOR_STAGES:
        d = os.path.join(checkpoint_dir, stage)
        if stage not in manifest or not os.path.isdir(d):
            raise FileNotFoundError(
                f"prior checkpoint at {checkpoint_dir} is missing stage "
                f"{stage!r} (found: {sorted(manifest)})"
            )
        out[stage] = rd.read_parquet(d)
        out["rows"][stage] = int(manifest[stage]["rows"])
    cfg_in = load_run_config(checkpoint_dir)
    out["config"], out["input_id"] = cfg_in if cfg_in else (None, "")
    return out


def _family_extractors(cfg: DedupConfig, has_image: bool, sig_names):
    """Per-candidate-family key extractors over a signature batch.

    Each entry is (name, fn) with fn(batch) -> (row_idx int64[],
    keys int64[]) — the flattened (row, key) incidence the family's
    expansion would emit, in the SAME key domain the expansion uses
    (pre stage-seed mixing; families are matched set-against-set so
    the seed mix cancels). Ordered cheapest-first: the touched filter
    short-circuits rows already matched before the winnowing
    recompute.

    DRIFT GUARD: these derivations must stay bit-identical to
    stages/expand.py (expand_minhash's empty-caption drop,
    expand_simhash's chunk/combo key scheme, expand_substring's
    winnowing) — the touched-set completeness proof depends on it.
    Any key-scheme change there MUST be mirrored here (and
    stages/expand.py carries the reciprocal notice); the
    full==delta equality tests in tests/test_delta.py exercise every
    family and fail on divergence at fixture scale."""
    fams: list[tuple[str, object]] = []

    def one_per_row(col: str):
        def fn(batch: pa.Table):
            k = batch.column(col).to_numpy(zero_copy_only=False)
            return np.arange(len(k), dtype=np.int64), k.astype(np.int64)

        return fn

    fams.append(("exact_caption", one_per_row("caption_hash")))
    if has_image and "image_hash" in sig_names:
        fams.append(("exact_image", one_per_row("image_hash")))

    if "minhash" in cfg.stages and "bands" in sig_names:
        def bands_fn(batch: pa.Table):
            keys = H.fixed_from_binary(
                batch.column("bands"), cfg.bands * 8
            ).view(U64)
            # empty captions carry the all-MAX sentinel signature; the
            # expansion drops them (expand_minhash) — so must the
            # filter, or every empty caption matches every other
            ne = (
                batch.column("n_shingles").to_numpy(zero_copy_only=False) > 0
            )
            rows = np.repeat(
                np.nonzero(ne)[0].astype(np.int64), cfg.bands
            )
            return rows, keys[ne].reshape(-1).view(np.int64)

        fams.append(("minhash", bands_fn))

    if has_image and "simhash" in cfg.stages and "simhash" in sig_names:
        def sim_fn(batch: pa.Table):
            sh = (
                batch.column("simhash")
                .to_numpy(zero_copy_only=False)
                .view(U64)
            )
            if cfg.simhash_mode == "combo":
                keys = H.simhash_combo_keys(
                    sh, cfg.simhash_combo_sub, cfg.simhash_combo_r
                )
            else:
                keys = H.simhash_chunk_keys(sh, cfg.simhash_chunks)
            n, k = keys.shape
            rows = np.repeat(np.arange(n, dtype=np.int64), k)
            return rows, keys.reshape(-1).view(np.int64)

        fams.append(("simhash", sim_fn))

    if "substring" in cfg.stages and "caption_norm" in sig_names:
        def sub_fn(batch: pa.Table):
            caps = batch.column("caption_norm").to_pylist()
            fp, offs = winnow_fingerprints(
                caps, cfg.substring_min_len, cfg.winnow_window
            )
            counts = np.diff(offs)
            rows = np.repeat(
                np.arange(len(caps), dtype=np.int64), counts
            )
            return rows, fp.view(np.int64)

        fams.append(("substring", sub_fn))
    return fams


def _delta_key_sets(sigs_delta, fams) -> dict[str, np.ndarray]:
    """Per-family sorted unique key arrays of the delta corpus.

    One map pass emits per-batch-unique (family code, key) rows; the
    driver merges — O(|delta| x keys/row) total, the broadcast small
    side of the touched filter."""

    def fn(batch: pa.Table) -> pa.Table:
        fs, ks = [], []
        for i, (_, ex) in enumerate(fams):
            _, keys = ex(batch)
            u = np.unique(keys)
            fs.append(np.full(len(u), i, dtype=np.int8))
            ks.append(u)
        return pa.table(
            {
                "fam": pa.array(np.concatenate(fs) if fs else
                                np.empty(0, np.int8)),
                "key": pa.array(np.concatenate(ks) if ks else
                                np.empty(0, np.int64)),
            }
        )

    t = sigs_delta.map_batches(fn, batch_format="pyarrow").to_pandas()
    out = {}
    for i, (name, _) in enumerate(fams):
        out[name] = np.unique(t["key"][t["fam"] == i].to_numpy())
    return out


def _delta_simhash_nn(sigs_delta, cfg: DedupConfig):
    """(sorted unique simhash keys, group offsets, delta simhashes) —
    the broadcast side of the HAMMING-REFINED simhash touch filter.

    Key-set membership alone is far too coarse for the simhash family:
    chunk keys are only 64/chunks bits wide, so a day-sized delta
    claims a large fraction of the key space and key-touches most of
    the corpus (measured 95% of prior rows at 225k rows) — yet the
    in-bucket emitter (candidates.py) drops every pair beyond
    hamming_radius, so a key-sharing prior row whose simhash is far
    from EVERY delta row in that bucket can never produce a new edge.
    The refined filter replays exactly that test: touched iff some
    key-sharing delta simhash is within the radius."""

    def fn(batch: pa.Table) -> pa.Table:
        sh = (
            batch.column("simhash").to_numpy(zero_copy_only=False).view(U64)
        )
        if cfg.simhash_mode == "combo":
            keys = H.simhash_combo_keys(
                sh, cfg.simhash_combo_sub, cfg.simhash_combo_r
            )
        else:
            keys = H.simhash_chunk_keys(sh, cfg.simhash_chunks)
        n, k = keys.shape
        return pa.table(
            {
                "key": pa.array(keys.reshape(-1).view(np.int64)),
                "sh": pa.array(np.repeat(sh.view(np.int64), k)),
            }
        )

    t = (
        sigs_delta.select_columns(["simhash"])
        .map_batches(fn, batch_format="pyarrow")
        .to_pandas()
    )
    t = t.drop_duplicates(["key", "sh"]).sort_values("key", kind="stable")
    keys = np.ascontiguousarray(t["key"].to_numpy())
    sh = np.ascontiguousarray(t["sh"].to_numpy()).view(U64)
    uk, start = np.unique(keys, return_index=True)
    offs = np.concatenate([start, [len(keys)]]).astype(np.int64)
    return uk, offs, sh


def _sorted_member(keys: np.ndarray, arr: np.ndarray) -> np.ndarray:
    """Vectorized membership of `keys` in sorted `arr`."""
    if len(arr) == 0 or len(keys) == 0:
        return np.zeros(len(keys), dtype=bool)
    pos = np.searchsorted(arr, keys)
    pos = np.minimum(pos, len(arr) - 1)
    return arr[pos] == keys


def touched_prior_rows(prior_sigs, fams, key_sets_ref, radius: int = 0):
    """Filter the prior signature table to rows that could CO-PAIR
    with a delta row (shuffle-free map pass; broadcast key sets).

    Families run cheapest-first and each one only examines rows not
    yet touched (batch.take on the remainder), so the winnowing
    recompute — the only non-trivial extractor — runs on the residue
    that no hash family matched. When the broadcast carries the
    ``__simhash_nn`` structure (_delta_simhash_nn), the simhash family
    additionally requires Hamming(prior, some key-sharing delta row)
    <= `radius` — replaying the in-bucket emitter's test, since
    key-only membership touches most of the corpus (chunk keys are
    narrow)."""
    import ray

    def fn(batch: pa.Table) -> pa.Table:
        sets = ray.get(key_sets_ref)
        n = len(batch)
        touched = np.zeros(n, dtype=bool)
        for name, ex in fams:
            nn = sets.get("__simhash_nn") if name == "simhash" else None
            arr = sets.get(name)
            if nn is None and (arr is None or len(arr) == 0):
                continue
            rem = np.nonzero(~touched)[0]
            if len(rem) == 0:
                break
            sub = batch.take(pa.array(rem)) if len(rem) < n else batch
            rows, keys = ex(sub)
            if len(keys) == 0:
                continue
            if nn is not None:
                uk, offs, dsh = nn
                if len(uk) == 0:
                    continue
                pos = np.minimum(np.searchsorted(uk, keys), len(uk) - 1)
                idx = np.nonzero(uk[pos] == keys)[0]
                if len(idx) == 0:
                    continue
                st = offs[pos[idx]]
                cnt = offs[pos[idx] + 1] - st
                tot = int(cnt.sum())
                # flatten each hit's delta-simhash group: gather index
                gather = (
                    np.repeat(st, cnt)
                    + np.arange(tot, dtype=np.int64)
                    - np.repeat(np.cumsum(cnt) - cnt, cnt)
                )
                row_ids = np.repeat(rows[idx], cnt)
                sh_rows = (
                    sub.column("simhash")
                    .to_numpy(zero_copy_only=False)
                    .view(U64)
                )
                near = H.hamming64(sh_rows[row_ids], dsh[gather]) <= radius
                hit_rows = np.unique(row_ids[near])
            else:
                hit_rows = np.unique(rows[_sorted_member(keys, arr)])
            touched[rem[hit_rows]] = True
        return batch.filter(pa.array(touched))

    return prior_sigs.map_batches(fn, batch_format="pyarrow")


def _split_edges_by_kind(edges_new):
    """(exact collapse edges, verified sketch edges) of a union-run
    edge table, by stage label (one cheap map each; consumed for the
    merged-state write only)."""

    def keep(want_exact: bool):
        def fn(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            m = pc.is_in(
                batch.column("stage"),
                value_set=pa.array(list(EXACT_STAGE_LABELS)),
            )
            if not want_exact:
                m = pc.invert(m)
            return batch.filter(m)

        return fn

    return (
        edges_new.map_batches(keep(True), batch_format="pyarrow"),
        edges_new.map_batches(keep(False), batch_format="pyarrow"),
    )


def run_dedup_delta(
    new_ds,
    prior_checkpoint_dir: str,
    cfg: DedupConfig | None = None,
    has_image: bool = True,
    output_checkpoint_dir: str | None = None,
):
    """Attach `new_ds` (same schema as the prior run's input) to the
    accumulated state at `prior_checkpoint_dir`.

    Returns {"clusters", "edges", "stats"} over the MERGED corpus —
    byte-identical to run_dedup(prior_input ∪ new_ds) (see module
    docstring) at a cost that scales with the delta, not the corpus.

    `cfg` defaults to the prior run's stored config (run_config.json);
    passing a cfg whose sketch parameters differ from the prior run's
    breaks the equivalence (the stored signatures were built under the
    prior parameters) — don't. New ids must not collide with prior ids
    (append semantics).

    `output_checkpoint_dir` (must differ from the prior dir) writes
    the merged state so deltas chain day over day."""
    import ray
    import ray.data as rd

    from stack_trace_deduplication_ray.pipelines.dedup import (
        build_edges,
        finish_clusters,
        resolve_simhash_mode,
    )
    from stack_trace_deduplication_ray.sources.tables import tune_data_context

    tune_data_context()
    if output_checkpoint_dir is not None and (
        os.path.abspath(output_checkpoint_dir)
        == os.path.abspath(prior_checkpoint_dir)
    ):
        raise ValueError(
            "output_checkpoint_dir must differ from prior_checkpoint_dir "
            "(in-place merge would clobber the state a crashed run "
            "needs to retry)"
        )
    prior = load_prior_state(prior_checkpoint_dir)
    if cfg is None:
        cfg = prior["config"] or DedupConfig()
    if cfg.exact_string_ids:
        raise NotImplementedError(
            "exact_string_ids + delta attach: a NEW row's hash id could "
            "collide with an UNTOUCHED prior row's, and detecting that "
            "exactly needs the full prior id set. Corpora large enough "
            "to need exact ids should ship native int64 ids "
            "(passthrough, zero risk) for incremental runs."
        )
    cfg_orig = cfg  # persisted into chained state (auto modes intact)
    stats: list[dict] = []
    # per-phase wall clocks (delta-sized vs corpus-sized attribution;
    # the final cluster emit is LAZY — its cost lands on the caller's
    # consume and is by construction corpus-sized, the output being
    # the full merged clustering)
    phase_sec: dict[str, float] = {}
    t0 = time.time()

    # --- 1. delta signatures (the only decode/sketch pass) -----------
    sigs_delta = (
        signature_stage(new_ds, cfg)
        if has_image
        else text_signature_stage(new_ds, cfg)
    ).materialize()
    n_delta = sigs_delta.count()
    phase_sec["delta_signatures"] = round(time.time() - t0, 3)
    n_prior = prior["rows"]["signatures"]
    # the simhash key scheme must match what a full run over the
    # MERGED corpus would resolve (bucket spaces must line up between
    # the delta filter, the union-run and a hypothetical full run);
    # same gate as build_edges
    if has_image and "simhash" in cfg.stages:
        cfg, scheme_stats = resolve_simhash_mode(cfg, n_prior + n_delta)
        if scheme_stats is not None:
            stats.append(scheme_stats)

    prior_sigs = prior["signatures"]
    sig_names = list(
        (sigs_delta if n_delta else prior_sigs).schema().names
    )
    id_is_str = "orig_id" in sig_names

    if n_delta == 0:
        edges_new = None
        union_sigs = None
        n_touched = 0
    else:
        # --- 2+3. broadcast delta key sets; filter prior rows --------
        t0 = time.time()
        fams = _family_extractors(cfg, has_image, sig_names)
        key_sets = _delta_key_sets(sigs_delta, fams)
        if has_image and "simhash" in cfg.stages and "simhash" in sig_names:
            key_sets["__simhash_nn"] = _delta_simhash_nn(sigs_delta, cfg)
        key_sets_ref = ray.put(key_sets)
        # select_columns aligns the prior table's column ORDER with the
        # delta signatures (union requires identical schemas)
        touched = touched_prior_rows(
            prior_sigs, fams, key_sets_ref, radius=cfg.hamming_radius
        ).select_columns(sig_names).materialize()
        n_touched = touched.count()
        phase_sec["touch_filter"] = round(time.time() - t0, 3)
        t0 = time.time()

        # --- 4. full machinery over the union working set, candidate
        # generation restricted to DELTA-CLAIMED buckets: a bucket no
        # delta row claims holds only prior rows, and every prior x
        # prior pair was decided by the prior run (keys are pure
        # content functions, so the bucket existed there with the same
        # membership) — its edges are already in the prior edge set.
        union_sigs = sigs_delta.union(touched).materialize()
        cfg_work = coalesce_for_table(
            cfg, union_sigs.count(), union_sigs.num_blocks()
        )
        expansion_filters = {
            name: ray.put(arr)
            for name, arr in key_sets.items()
            if name in ("minhash", "simhash", "substring")
        }
        edges_new, build_stats = build_edges(
            union_sigs, cfg_work, has_image,
            expansion_filters=expansion_filters,
        )
        edges_new = edges_new.materialize()
        stats.extend(build_stats)
        phase_sec["build_edges_working_set"] = round(time.time() - t0, 3)

    t0 = time.time()
    prior_edges = prior["exact_edges"].union(prior["verified_edges"])
    edges_all = (
        prior_edges.union(edges_new) if edges_new is not None else prior_edges
    ).materialize()
    phase_sec["edge_fold_in"] = round(time.time() - t0, 3)
    stats.append(
        {
            "stage": "delta_attach",
            "phase_sec": phase_sec,
            "prior_rows": int(n_prior),
            "delta_rows": int(n_delta),
            "touched_prior_rows": int(n_touched),
            "new_edge_rows": int(edges_new.count()) if edges_new is not None else 0,
            "prior_edge_rows": int(
                prior["rows"]["exact_edges"] + prior["rows"]["verified_edges"]
            ),
        }
    )

    # --- clusters over the merged corpus -----------------------------
    id_cols = ["image_id"] + (["orig_id"] if id_is_str else [])
    id_map = prior_sigs.select_columns(id_cols)
    if n_delta:
        id_map = id_map.union(sigs_delta.select_columns(id_cols))
    cfg_cluster = coalesce_for_rows(cfg, n_prior + n_delta)
    clusters = finish_clusters(id_map, edges_all, cfg_cluster, id_is_str)

    # --- 5. merged state for the NEXT delta --------------------------
    if output_checkpoint_dir is not None:
        _write_merged_state(
            output_checkpoint_dir, cfg_orig, prior, sigs_delta, edges_new,
            cfg_cluster,
        )

    return {
        "clusters": clusters,
        "edges": cand.dedup_edges(edges_all, cfg_cluster),
        "stats": stats,
    }


def _fixture_split(sf_dir: str, mod: int = 4):
    """Deterministic interleaved split of the synthetic image fixture
    into base A (rows with idx % mod != 0) and delta B (idx % mod ==
    0) — many duplicate groups straddle the boundary, the shape that
    exercises cross-side attach. Cached under /tmp with the prior
    run's checkpoint beside it."""
    import pyarrow.parquet as pq

    from stack_trace_deduplication_ray.fixtures.images import (
        materialize_fixture,
    )
    from stack_trace_deduplication_ray.pipelines.dedup import (
        _fixture_rows_for_sf,
    )

    n = _fixture_rows_for_sf(sf_dir)
    d = materialize_fixture(n, seed=42)
    out = f"/tmp/stack_dedup_fixtures/delta_split_n{n}_s42_m{mod}"
    done = os.path.join(out, "_DONE")
    if not os.path.exists(done):
        os.makedirs(out, exist_ok=True)
        t = pq.read_table(os.path.join(d, "images.parquet"))
        b_idx = list(range(0, len(t), mod))
        a_idx = [i for i in range(len(t)) if i % mod != 0]
        pq.write_table(t.take(a_idx), os.path.join(out, "a.parquet"))
        pq.write_table(t.take(b_idx), os.path.join(out, "b.parquet"))
        with open(done, "w") as f:
            f.write("ok")
    return out


def _prepare_prior(split_dir: str, cfg: DedupConfig) -> str:
    """Full run over the A side with a checkpoint (resume-cached: a
    second call validates fingerprints and loads instead of running)."""
    import ray.data as rd

    from stack_trace_deduplication_ray.pipelines.dedup import run_dedup

    ck = os.path.join(split_dir, "ck_a")
    # checkpoints are written EAGERLY inside run_dedup (stage saves
    # execute their plans); nothing further to consume here
    run_dedup(
        rd.read_parquet(os.path.join(split_dir, "a.parquet")), cfg,
        checkpoint_dir=ck, input_id=os.path.join(split_dir, "a.parquet"),
    )
    return ck


def delta_dedup_clusters(sf_dir: str):
    """Incremental attach over the synthetic image fixture: full run
    on 3/4 of the rows (checkpointed), delta attach of the remaining
    1/4. Returns the merged clusters — identical to
    image_dedup_clusters over the whole fixture (queries() entry;
    rows-only driver check — union-find is not SQL-expressible; the
    equality proxy is delta_dedup_equivalence)."""
    import ray.data as rd

    from stack_trace_deduplication_ray.config import DEFAULT_CONFIG

    split = _fixture_split(sf_dir)
    ck = _prepare_prior(split, DEFAULT_CONFIG)
    return run_dedup_delta(
        rd.read_parquet(os.path.join(split, "b.parquet")), ck,
        DEFAULT_CONFIG,
    )["clusters"]


def delta_minhash_dedup_clusters(sf_dir: str):
    """Incremental attach over the documents table, hash-checked
    against a FULL-RUN pure-SQL oracle: a full text-dedup run on
    doc_id % 4 != 0 (checkpointed under /tmp, fingerprint-resume-
    cached), then delta attach of doc_id % 4 == 0. Returns
    (doc_id, cluster_id) over the merged corpus — byte-identical to
    ``minhash_dedup_clusters``, so it shares that query's
    machine-generated DuckDB oracle (eval/sql_oracle.py): the
    incremental path is verified bit-for-bit against a from-scratch
    SQL rederivation of the whole clustering, not just against the
    engine's own full run. Interleaved-by-id split: ~3/4 of the
    near-dup groups straddle the prior/delta boundary, the shape that
    exercises cross-side attach."""
    import hashlib

    import pyarrow.compute as pc

    from stack_trace_deduplication_ray.pipelines.dedup import run_dedup
    from stack_trace_deduplication_ray.pipelines.text import (
        TEXT_DEDUP_CONFIG,
        _docs_as_engine_input,
    )

    def side(keep_delta: bool):
        def f(batch: pa.Table) -> pa.Table:
            # mod-4 via bitmask (pyarrow ships no modulo kernel;
            # doc_id is non-negative so the mask is exact)
            m = pc.equal(pc.bit_wise_and(batch.column("image_id"), 3), 0)
            return batch.filter(m if keep_delta else pc.invert(m))

        return f

    docs = _docs_as_engine_input(sf_dir)
    tag = hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    ck = os.path.join(
        "/tmp/stack_dedup_fixtures", f"delta_docs_{tag}", "ck_a"
    )
    run_dedup(
        docs.map_batches(side(False), batch_format="pyarrow"),
        TEXT_DEDUP_CONFIG, has_image=False,
        checkpoint_dir=ck, input_id=f"{sf_dir}:documents:mod4a",
    )
    res = run_dedup_delta(
        docs.map_batches(side(True), batch_format="pyarrow"),
        ck, TEXT_DEDUP_CONFIG, has_image=False,
    )

    def conv(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("image_id"),
                "cluster_id": batch.column("cluster_id"),
            }
        )

    return res["clusters"].map_batches(conv, batch_format="pyarrow")


def delta_dedup_equivalence(sf_dir: str):
    """Quality proxy for the delta path: metrics table asserting the
    delta-attached clustering equals the one full run over the whole
    fixture (clusters_identical 1.0), plus the working-set sizes."""
    import ray.data as rd

    from stack_trace_deduplication_ray.config import DEFAULT_CONFIG
    from stack_trace_deduplication_ray.eval.metrics import metrics_table
    from stack_trace_deduplication_ray.pipelines.dedup import (
        image_dedup_clusters,
    )

    split = _fixture_split(sf_dir)
    ck = _prepare_prior(split, DEFAULT_CONFIG)
    res = run_dedup_delta(
        rd.read_parquet(os.path.join(split, "b.parquet")), ck,
        DEFAULT_CONFIG,
    )
    delta_df = (
        res["clusters"].to_pandas().sort_values("image_id")
        .reset_index(drop=True)
    )
    full_df = (
        image_dedup_clusters(sf_dir).to_pandas().sort_values("image_id")
        .reset_index(drop=True)
    )
    att = next(
        s for s in res["stats"] if s.get("stage") == "delta_attach"
    )
    return metrics_table(
        {
            "clusters_identical": float(delta_df.equals(full_df)),
            "rows_equal": float(len(delta_df) == len(full_df)),
            "delta_rows": float(att["delta_rows"]),
            "prior_rows": float(att["prior_rows"]),
            "touched_prior_rows": float(att["touched_prior_rows"]),
        }
    )


def _write_merged_state(
    out_dir: str, cfg: DedupConfig, prior: dict, sigs_delta, edges_new,
    cfg_exchange: DedupConfig,
):
    """Write the merged (prior + delta) signatures and edge sets as a
    checkpoint the next delta run can warm-start from. Edge tables are
    canonically deduped on (src, dst) so re-found prior pairs never
    accumulate across chained deltas."""
    from stack_trace_deduplication_ray.state.checkpoint import (
        StageCheckpoint,
        config_fingerprint,
        stage_fingerprints,
        write_run_config,
    )

    merged_id = f"{prior.get('input_id', '')}+delta"
    st = StageCheckpoint(
        out_dir,
        config_fingerprint(cfg, merged_id),
        stage_fps=stage_fingerprints(cfg, merged_id),
    )
    write_run_config(out_dir, cfg, merged_id)
    sigs = prior["signatures"]
    if sigs_delta is not None and edges_new is not None:
        sigs = sigs.union(sigs_delta)
        new_exact, new_verified = _split_edges_by_kind(edges_new)
        exact = cand.dedup_edges(
            prior["exact_edges"].union(new_exact), cfg_exchange
        )
        verified = cand.dedup_edges(
            prior["verified_edges"].union(new_verified), cfg_exchange
        )
    else:
        exact = prior["exact_edges"]
        verified = prior["verified_edges"]
    st.save("signatures", sigs)
    st.save("exact_edges", exact)
    st.save("verified_edges", verified)
