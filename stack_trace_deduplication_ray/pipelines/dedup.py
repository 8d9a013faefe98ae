"""Flagship pipeline: images (or caption-only docs) -> dedup clusters.

Lifecycle (SURVEY.md §3.4, restructured for scale):

    read -> signatures (actor map_batches; bytes projected away)
         -> DUAL-AXIS representative collapse in ONE shuffle
            (candidates.collapse_dual): identical captions / identical
            payloads shrink to one rep each; the collapse edges are
            exact-dup edges needing no verify, and ALL sketch stages
            then run on unique content only — this removes
            identical-content skew at the root (the boilerplate
            caption becomes one rep) and cuts candidate volume by the
            duplication factor
         -> FUSED candidate generation in ONE shuffle
            (candidates.fused_pairs_from_buckets): minhash / simhash /
            substring expansions tagged into disjoint key spaces,
            sampled hot-bucket detection (no count shuffle), salted
            groupby emitting per-stage pair semantics
         -> FUSED verify (verify.verify_fused): one feature-attachment
            join pair for all stages, per-batch kernel dispatch
            (exact Jaccard / PSNR / L-gram); candidate dedup on
            (src, dst, stage) folded into the first join
         -> union with exact edges -> canonical edge dedup
         -> connected components -> clusters (+ stats)

The fusion matters because concurrent Dataset executions SERIALIZE in
Ray's streaming executor (measured: three chains in driver threads run
exactly as long as sequentially) — so per-stage chains each paying
their own shuffles cost 3x the exchanges of one fused pass. Total
all-to-all count per run: collapse 1, candidates 1, verify 2, edge
dedup 1 = 5 (was ~12).

Semantic note: collapsing by identical caption (resp. identical
payload bytes) is equivalent to running the sketch stages on every
row, because identical captions always pass the Jaccard verify (J=1)
and identical bytes always pass Hamming+PSNR (d=0, PSNR=inf); the
collapse edges encode exactly those guaranteed-verified pairs.

Every intermediate is a streaming ``ray.data.Dataset``; only the
annotated collapse table, the verified edge set and the final edges
(all small relative to the corpus) are materialized.
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa

from stack_trace_deduplication_ray.config import DEFAULT_CONFIG, DedupConfig
from stack_trace_deduplication_ray.stages import candidates as cand
from stack_trace_deduplication_ray.stages import cc as cc_mod
from stack_trace_deduplication_ray.stages import expand as ex
from stack_trace_deduplication_ray.stages import verify as ver
from stack_trace_deduplication_ray.stages.signatures import (
    internal_ids,
    signature_stage,
    text_signature_stage,
)

logger = logging.getLogger(__name__)


def _id_map(images_ds, cfg: DedupConfig):
    """(image_id int64[, orig_id string]) for every input row — the
    internal-id domain every exchange runs in (string ids are hashed
    once here / in the signature stage; int ids pass through)."""
    from stack_trace_deduplication_ray.stages.signatures import iid_bits

    bits = iid_bits(cfg)

    def fn(batch: pa.Table) -> pa.Table:
        iid, was_str = internal_ids(batch.column("image_id"), bits=bits)
        cols = {"image_id": iid}
        if was_str:
            cols["orig_id"] = batch.column("image_id")
        return pa.table(cols)

    return images_ds.select_columns(["image_id"]).map_batches(
        fn, batch_format="pyarrow"
    )


def _apply_labels_with_names(id_map, labels, cfg: DedupConfig):
    """Driver-CC fast path: cluster assignment AND original-name
    restore in ONE shuffle-free map pass over the id map.

    `labels`: (iids, root_iids) int64 array pair, one entry per node
    with >= 1 edge (driver_union_find_arrays output — arrays end to
    end, no boxed-int dict). The single pass emits
    (image_id=orig, cluster_id=orig) directly for singletons (they
    name themselves) and side-channels the TOUCHED rows' (iid, orig)
    to a driver-owned collector actor — touched volume is bounded by
    the non-singleton node count, the same driver-sized regime that
    made driver CC applicable (`labels` already holds one entry per
    touched node). The driver then computes each component's name
    (MIN original id over its members) and emits the touched rows as
    a small from_arrow table unioned with the streamed output.

    This replaces the round-3 two-pass shape (partial-name scan, then
    emit scan): the parallelism-independent cost of scheduling a full
    per-block task wave over the id map is paid once, not twice —
    that fixed cost is what pins the single-box scaling efficiency
    (BASELINE.md per-phase table). No joins, no exchanges.
    """
    import ray
    import ray.data as rd

    keys, roots = labels
    if not len(keys):
        def identity(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "image_id": batch.column("orig_id"),
                    "cluster_id": batch.column("orig_id"),
                }
            )

        return id_map.map_batches(identity, batch_format="pyarrow")

    order = np.argsort(keys)
    keys, roots = keys[order], roots[order]
    ref = ray.put((keys, roots))

    # One tagged map wave, no side channel: every row emits
    # (image_id=orig, cluster_id=orig, __iid, __touched). A boolean
    # tag — NOT an in-band iid sentinel: internal ids span the full
    # int64 space in non-exact mode, so no id value is safe to
    # reserve. The materialized tagged table then splits by filter —
    # the touched rows (driver-sized by construction: one per labels
    # entry) pull to the driver as Arrow, the singleton stream drops
    # the tag columns.
    # This replaces the round-4 collector-actor side channel: rows
    # ride Ray's own task outputs, so delivery is exactly the
    # dataset's fault-tolerance story (no fire-and-forget message to
    # lose, no completion barrier to poll); the orig side stays an
    # ARROW string array end to end (the boxed to_pylist + pandas
    # object-min path measured 10-23 s of driver time at 2M vs ~0.3 s
    # for the Arrow kernels).
    def tag_touched(batch: pa.Table) -> pa.Table:
        k, _ = ray.get(ref)
        iids = batch.column("image_id").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(k, iids)
        pos_c = np.minimum(pos, len(k) - 1)
        hit = k[pos_c] == iids
        orig = batch.column("orig_id")
        return pa.table(
            {
                "image_id": orig,
                "cluster_id": orig,
                "__iid": pa.array(iids),
                "__touched": pa.array(hit),
            }
        )

    tagged = id_map.map_batches(
        tag_touched, batch_format="pyarrow"
    ).materialize()

    def only_singles(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        m = pc.invert(batch.column("__touched").combine_chunks())
        return batch.filter(m).drop_columns(["__iid", "__touched"])

    def only_touched(batch: pa.Table) -> pa.Table:
        return batch.filter(
            batch.column("__touched").combine_chunks()
        ).select(["__iid", "image_id"])

    singles = tagged.map_batches(only_singles, batch_format="pyarrow")

    ii_parts, oo_parts = [], []
    for b in tagged.map_batches(
        only_touched, batch_format="pyarrow"
    ).iter_batches(batch_size=262_144, batch_format="pyarrow"):
        ii_parts.append(b.column("__iid").to_numpy(zero_copy_only=False))
        oo_parts.append(b.column("image_id").combine_chunks())
    if ii_parts:
        ii = np.concatenate(ii_parts)
        oo = pa.concat_arrays(
            [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
             for a in oo_parts]
        )
    else:
        ii = np.empty(0, np.int64)
        oo = pa.array([], type=pa.string())
    root_of = roots[np.searchsorted(keys, ii)]  # exact hits by construction
    # component name = MIN original id over members: Arrow hash-min on
    # the string column (C++), then an Arrow take per member row
    g = (
        pa.table({"root": pa.array(root_of), "name": oo})
        .group_by("root")
        .aggregate([("name", "min")])
        .sort_by("root")
    )
    nroot = g.column("root").to_numpy()
    pos = np.searchsorted(nroot, root_of)
    cluster = g.column("name_min").combine_chunks().take(pa.array(pos))
    touched = pa.table(
        {
            "image_id": oo.cast(pa.string()),
            "cluster_id": cluster.cast(pa.string()),
        }
    )
    # chunk the driver-built table so no single block is outsized
    step = 262_144
    chunks = [touched.slice(i, step) for i in range(0, max(len(touched), 1), step)]
    return singles.union(rd.from_arrow(chunks))


def _restore_names(clusters_int, id_map, cfg: DedupConfig):
    """(image_id:int64, cluster_id:int64) -> (image_id:string original,
    cluster_id:string = MIN original id of the component) — the
    keep-first representative rule on the user-visible ids. Three
    narrow exchanges over (8 B + id-string) rows; the heavy phases all
    ran in the int64 domain."""
    from ray.data.aggregate import Min

    from stack_trace_deduplication_ray.stages.joins import join_ds

    def ren(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "__mid": batch.column("image_id"),
                "orig_id": batch.column("orig_id"),
            }
        )

    named = join_ds(
        clusters_int,
        id_map.map_batches(ren, batch_format="pyarrow"),
        "image_id", "__mid", cfg,
    ).materialize()
    minname = named.groupby("cluster_id").aggregate(
        Min("orig_id", alias_name="cluster_name")
    )

    def ren2(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "__cid": batch.column("cluster_id"),
                "cluster_name": batch.column("cluster_name"),
            }
        )

    def trim(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "orig_id": batch.column("orig_id"),
                "cluster_id": batch.column("cluster_id"),
            }
        )

    j = join_ds(
        named.map_batches(trim, batch_format="pyarrow"),
        minname.map_batches(ren2, batch_format="pyarrow"),
        "cluster_id", "__cid", cfg,
    )

    def out(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "image_id": batch.column("orig_id"),
                "cluster_id": batch.column("cluster_name"),
            }
        )

    return j.map_batches(out, batch_format="pyarrow")


def resolve_simhash_mode(
    cfg: DedupConfig, n_rows: int
) -> tuple[DedupConfig, dict | None]:
    """Resolve simhash_mode == "auto" by corpus size: exact 16-bit
    chunks below the birthday knee, wide combination keys above it
    (config.py SCALE NOTE). Returns (resolved cfg, stats entry) — the
    stats entry records the per-run lineage of the auto decision.
    Shared by the full run (build_edges) and the delta run
    (delta.run_dedup_delta, which must resolve on the MERGED corpus
    size so delta buckets match what a full run over prior+delta
    would use). No-op for explicit modes."""
    import dataclasses

    if cfg.simhash_mode != "auto":
        return cfg, None
    mode = "combo" if n_rows > cfg.simhash_wide_threshold_rows else "chunks"
    repl = {"simhash_mode": mode}
    if mode == "combo":
        if n_rows > cfg.simhash_combo_widen_rows:
            # second tier: wider sub-chunks kill the quadratic
            # random-collision term (config.py SCALE NOTE)
            repl["simhash_combo_sub"] = cfg.simhash_combo_wide_sub
            repl["simhash_combo_r"] = cfg.simhash_combo_wide_r
        logger.info(
            "simhash auto mode: %d rows > %d -> combination keys "
            "(sub=%d, r=%d)",
            n_rows, cfg.simhash_wide_threshold_rows,
            repl.get("simhash_combo_sub", cfg.simhash_combo_sub),
            repl.get("simhash_combo_r", cfg.simhash_combo_r),
        )
    cfg = dataclasses.replace(cfg, **repl)
    return cfg, {
        "stage": "simhash_key_scheme",
        "mode": cfg.simhash_mode,
        "combo_sub": cfg.simhash_combo_sub,
        "combo_r": cfg.simhash_combo_r,
        "rows": int(n_rows),
    }


def _filtered_expansion(build_fn, allow_ref):
    """Wrap an expansion: keep only rows whose bucket key is in the
    broadcast sorted allow-array (delta attach: buckets no delta row
    claims can only produce prior x prior pairs, which the prior run
    already decided — see pipelines/delta.py)."""
    import ray

    def wrapped(src_ds):
        def keep(batch: pa.Table) -> pa.Table:
            arr = ray.get(allow_ref)
            if len(arr) == 0:
                return batch.slice(0, 0)
            b = batch.column("bucket").to_numpy(zero_copy_only=False)
            pos = np.clip(np.searchsorted(arr, b), 0, len(arr) - 1)
            return batch.filter(pa.array(arr[pos] == b))

        return build_fn(src_ds).map_batches(keep, batch_format="pyarrow")

    return wrapped


def build_edges(
    sigs, cfg: DedupConfig, has_image: bool, ckpt=None,
    expansion_filters: dict | None = None,
):
    """Run the fused collapse + candidate + verify phases, union the
    edges.

    Returns (edges, stats). `sigs` must be materialized. `ckpt` is an
    optional state.checkpoint.StageCheckpoint persisting the exact and
    verified edge sets; run_dedup short-circuits the whole build
    (including signature computation) when both are valid.
    `expansion_filters` maps stage name -> ObjectRef of a sorted int64
    bucket-key allow-array (delta attach restricts candidate
    generation to delta-claimed buckets).
    """
    stats = []
    stages = cfg.stages if has_image else tuple(
        s for s in cfg.stages if s != "simhash"
    )
    if cfg.simhash_mode == "auto" and "simhash" in stages:
        # sigs is materialized so count() is metadata-cheap; same
        # verified edges under either resolved scheme (tested)
        cfg, scheme_stats = resolve_simhash_mode(cfg, sigs.count())
        if scheme_stats is not None:
            stats.append(scheme_stats)

    def checkpointed(name, thunk):
        if ckpt is None:
            return thunk()
        ds, loaded = ckpt.run_or_load(name, thunk)
        if loaded:
            logger.info("stage %s: loaded from checkpoint", name)
        return ds

    # ---- dual-axis representative collapse (one shuffle) -------------
    axes = [
        ("caption_hash", "exact_caption",
         ["caption_norm", "bands", "n_shingles"]),
    ]
    if has_image:
        axes.append(("image_hash", "exact_image", ["simhash"]))
    exact_edges, reps = cand.collapse_dual(sigs, axes, cfg)
    exact_edges = checkpointed("exact_edges", lambda: exact_edges)
    cap_reps = reps["exact_caption"]
    img_reps = reps.get("exact_image")

    # ---- fused sketch stages over unique content (one candidate
    # shuffle + one verify join pair for ALL stages) -------------------
    # sketch families resolve through the extension registry
    # (registry.ExpansionSpec): a registered family runs by name via
    # cfg.stages with salting / fused emission / verify plumbing
    # inherited
    from stack_trace_deduplication_ray import registry

    expansions = []
    for stage_name in stages:
        if stage_name == "exact":
            continue  # the collapse above IS the exact family
        spec = registry.get("expansion", stage_name)
        src = cap_reps if spec.source == "caption" else img_reps
        if src is None:
            continue
        fn = (lambda sp: lambda s: sp.build(s, cfg))(spec)
        if expansion_filters and stage_name in expansion_filters:
            fn = _filtered_expansion(fn, expansion_filters[stage_name])
        expansions.append((src, fn, stage_name))

    if expansions:
        def cand_thunk():
            # sigs is materialized -> count() is metadata-cheap; drives
            # the hot-detect sampling modulus (rows/1e5 auto-scale)
            ce, st = cand.fused_pairs_from_buckets(
                expansions, cfg, approx_rows=sigs.count()
            )
            cand_thunk.stats = st
            # candidate edges are small (pairs, not rows) — materialize
            # so the verify graph does not re-execute the expansion +
            # pair shuffle lineage
            return ce.materialize()

        # candidate edges are checkpointed under their OWN dependency
        # fingerprint (state.checkpoint.STAGE_DEPENDS): a verify-only
        # threshold change resumes from them and re-runs verify alone
        cand_edges = checkpointed("candidate_edges", cand_thunk)
        stats.append(getattr(cand_thunk, "stats", {"stage": "fused"}))

        stage_names = [st for _, _, st in expansions]
        verified = checkpointed(
            "verified_edges",
            lambda: ver.verify_fused(
                cand_edges, sigs, cfg, has_image, stage_names=stage_names
            ).materialize(),
        )
        edges = exact_edges.union(verified)
    else:
        edges = exact_edges
    # RAW union (multi-stage confirmations may duplicate a pair):
    # run_dedup's cluster path consumes it directly — union-find and
    # min-label propagation are duplicate-tolerant, so the canonical
    # (src, dst) dedup exchange is applied LAZILY only on the
    # user-visible edges output
    return edges, stats


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
    from stack_trace_deduplication_ray.sources.tables import tune_data_context

    tune_data_context()
    ckpt = None
    if checkpoint_dir is not None:
        from stack_trace_deduplication_ray.state.checkpoint import (
            StageCheckpoint,
            config_fingerprint,
            stage_fingerprints,
            write_run_config,
        )

        ckpt = StageCheckpoint(
            checkpoint_dir,
            config_fingerprint(cfg, input_id),
            stage_fps=stage_fingerprints(cfg, input_id),
        )
        # original config (auto modes unresolved) -> run_config.json:
        # the contract a later delta run warm-starts from
        write_run_config(checkpoint_dir, cfg, input_id)
    sch = images_ds.schema()
    input_id_type = dict(zip(sch.names, sch.types))["image_id"]
    id_is_str = not pa.types.is_integer(input_id_type)
    exact_ids = cfg.exact_string_ids and id_is_str
    if (
        ckpt is not None
        and ckpt.has("exact_edges")
        and ckpt.has("verified_edges")
    ):
        # full resume: every edge set is checkpointed — skip signature
        # computation entirely (cluster ids come from the input table)
        logger.info("resume: loading all edge sets from checkpoint")
        edges = ckpt.load("exact_edges").union(
            ckpt.load("verified_edges")
        ).materialize()
        stats = []
        sigs = None
    else:
        def sig_thunk():
            s = (
                signature_stage(images_ds, cfg)
                if has_image
                else text_signature_stage(images_ds, cfg)
            )
            return s.materialize()

        # signatures are re-read by several stages — materialize once
        # (bytes are NOT in this table). With a checkpoint dir they are
        # also persisted (the T7/T8 columnar-cache pattern): a config
        # change that only touches later stages resumes from the
        # signature parquet instead of re-decoding the corpus.
        if ckpt is not None:
            sigs, loaded = ckpt.run_or_load("signatures", sig_thunk)
            if loaded:
                logger.info("stage signatures: loaded from checkpoint")
            sigs = sigs.materialize()
        else:
            sigs = sig_thunk()
        extra_stats = []
        if exact_ids:
            # collision-exact id mode: one narrow exchange detects
            # equal internal hashes on distinct originals; colliding
            # rows are deterministically remapped into the reserved
            # negative id space BEFORE any stage keys on the id
            from stack_trace_deduplication_ray.stages.signatures import (
                remap_colliding_ids,
            )

            sigs, coll_stats = remap_colliding_ids(sigs, cfg)
            sigs = sigs.materialize()
            extra_stats.append(coll_stats)
        # corpus size AND block count are now metadata-cheap: gate the
        # exchange coalesce for everything downstream on both (the
        # signature actor pool fans small corpora out over many blocks
        # and every downstream exchange pays per-block —
        # config.coalesce_for_table)
        from stack_trace_deduplication_ray.config import coalesce_for_table

        cfg = coalesce_for_table(cfg, sigs.count(), sigs.num_blocks())
        edges, stats = build_edges(sigs, cfg, has_image, ckpt=ckpt)
        edges = edges.materialize()
        stats = extra_stats + stats
    # id map source: the MATERIALIZED signature table when available
    # (column-plucks from the object store; the wide input `bytes`
    # column is never re-read), else a narrow pass over the input
    # (full-resume path, where signatures were skipped; the exact-id
    # remap is re-derived there — deterministic over the same id set,
    # so it matches the ids inside the checkpointed edges)
    id_cols = ["image_id"] + (["orig_id"] if id_is_str else [])
    if sigs is not None:
        id_map = sigs.select_columns(id_cols)
    else:
        id_map = _id_map(images_ds, cfg)
        if exact_ids:
            from stack_trace_deduplication_ray.stages.signatures import (
                remap_colliding_ids,
            )

            id_map, _ = remap_colliding_ids(id_map, cfg)
        id_map = id_map.materialize()
    clusters = finish_clusters(id_map, edges, cfg, id_is_str)
    # the user-visible edge table keeps the canonical one-row-per-pair
    # contract (E5); the dedup exchange executes only when a consumer
    # actually reads it — the clusters path above never pays it
    return {
        "clusters": clusters,
        "edges": cand.dedup_edges(edges, cfg),
        "stats": stats,
    }


def finish_clusters(id_map, edges, cfg: DedupConfig, id_is_str: bool):
    """Edges + id map -> the final clusters table (shared tail of the
    full and delta runs). `edges` may be the RAW stage union: duplicate
    pair rows (a pair confirmed by several stages) inflate the count
    slightly, which only makes the driver-CC gate CONSERVATIVE;
    union-find itself is duplicate-tolerant."""
    if id_is_str and edges.count() <= cfg.driver_cc_max_edges:
        # fast path: driver union-find + broadcast name restore —
        # zero exchanges after the edge table
        labels = cc_mod.driver_union_find_arrays(edges)
        return _apply_labels_with_names(id_map, labels, cfg)
    clusters = cc_mod.assign_clusters(
        id_map.select_columns(["image_id"]), edges, cfg
    )
    if id_is_str:
        clusters = _restore_names(clusters, id_map, cfg)
    return clusters


def cluster_summary(clusters) -> pa.Table:
    """Small summary table (driver-side safe): cluster size histogram.

    Reference analog: per-issue report histograms,
    /root/reference/helpers/print_dataset_sizes.py:11-60.
    """
    from ray.data.aggregate import Count

    sizes = clusters.groupby("cluster_id").aggregate(
        Count(alias_name="cluster_size")
    )
    hist = sizes.groupby("cluster_size").aggregate(
        Count(alias_name="n_clusters")
    )
    t = hist.to_pandas().sort_values("cluster_size")
    return pa.Table.from_pandas(t, preserve_index=False)


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


def video_frame_table(sf_dir: str, every_n: int = 5):
    """Multimodal video frame sampling over the deterministic synthetic
    AVI fixture: one row per sampled frame (video_id, frame_idx,
    frame_phash, decode_ok), real uncompressed-RGB24 AVI decode in the
    actor pool (rows-only check; frame extraction is not
    SQL-expressible)."""
    import ray.data as rd

    from stack_trace_deduplication_ray.config import DedupConfig
    from stack_trace_deduplication_ray.fixtures.videos import (
        materialize_video_fixture,
    )
    from stack_trace_deduplication_ray.stages.joins import resolve_actors
    from stack_trace_deduplication_ray.stages.multimodal import VideoFrameSampler

    d = materialize_video_fixture(
        max(20, _fixture_rows_for_sf(sf_dir) // 10), seed=42
    )
    videos = rd.read_parquet(f"{d}/videos.parquet")
    return videos.select_columns(["video_id", "bytes"]).map_batches(
        VideoFrameSampler,
        fn_constructor_kwargs={"every_n": every_n},
        batch_format="pyarrow",
        batch_size=32,  # payload-heavy rows -> small batches
        concurrency=(1, resolve_actors(DedupConfig())),
        num_cpus=1,
    )
