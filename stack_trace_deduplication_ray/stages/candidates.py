"""Candidate-pair generation from bucket keys, with explicit skew salting.

The generic shape shared by the exact / MinHash-LSH / SimHash /
substring stages: an *expanded* Dataset of ``(bucket: int64,
image_id: string)`` rows is grouped by bucket and each bucket emits
duplicate-candidate edges.

Skew handling (SURVEY.md §4.2, north_rule "explicit salting for skewed
LSH buckets") is two-phase:

  phase A: SAMPLED hot-bucket detection — a shuffle-free map pass
           hash-samples rows at rate 1/hot_sample_mod, counts sampled
           buckets per batch (vectorized np.unique), and the driver
           merges the small partial-count tables; estimated count =
           sampled x mod. No full ``groupby(bucket).count()`` exchange
           (that pass doubled each stage's shuffle volume). Buckets
           whose estimate clears cap/2 are salted (the halved
           threshold absorbs Poisson sampling error — a bucket must be
           under-sampled 2x to slip through; a missed one degrades to
           the in-partition chain fallback of phase B — connectivity
           identical, just fewer redundant edges). The modulus
           auto-scales with corpus size (mod ~ rows/1e5, _auto_mod) so
           the driver-side merge stays O(#hot + noise).
  phase B: the expansion re-keys hot rows to ``(bucket, salt)``
           sub-buckets of ~``salt_target`` members each; sub-buckets
           emit all-pairs edges internally, and a second tiny shuffle
           chains the per-sub-bucket min ids so the salted bucket
           stays one connected component (salted == unsalted
           clustering, proven in tests/test_candidates.py).

Group processing runs at PARTITION granularity (joins.partitioned_groups):
one pandas call per shuffle partition, with an in-process loop over the
partition's buckets — not one Python task per bucket.

Capped/salted buckets are recorded in the returned stats dict — never
silently dropped (reference precedent for explicit caps:
/root/reference/ea/sim/dev/scripts/training/datasets/triplet.py:46-62).

Edges only need to make each duplicate group *connected* (the final
clustering is connected components, SURVEY.md §2.6 E4), so per-bucket
all-pairs for small buckets + chain linking for salted buckets is
semantically complete.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from stack_trace_deduplication_ray.config import DedupConfig
from stack_trace_deduplication_ray.functions import hashing as H
from stack_trace_deduplication_ray.stages.joins import (
    partitioned_groups,
    partitioned_groups_arrow,
)

logger = logging.getLogger(__name__)

U64 = np.uint64

EDGE_SCHEMA = pa.schema(
    [
        ("src", pa.string()),
        ("dst", pa.string()),
        ("stage", pa.string()),
        ("score", pa.float64()),
    ]
)


def _id_pa_type(arr) -> pa.DataType:
    """Arrow type for an id array: int64 for integer ids (the
    exchange fast path — every flagship id is int64 after the
    signature stage), string otherwise."""
    return (
        pa.int64()
        if np.asarray(arr).dtype.kind in "iu"
        else pa.string()
    )


def _edges_table(src, dst, stage, id_type: pa.DataType | None = None) -> pa.Table:
    """Canonical edges Arrow table (explicit types even when empty —
    empty pandas object columns would degrade to Arrow null type and
    poison downstream schema unification). `stage` is one label for
    all rows or a per-row array; int stage values produce an int8
    column (the fused path's exchange code; verify_fused maps codes
    back to public string labels via its stage_names list); `id_type`
    pins the src/dst type (inferred from `src` when omitted;
    empty-and-unknown -> string)."""
    n = len(src)
    if id_type is None:
        id_type = _id_pa_type(src) if n else pa.string()
    if isinstance(stage, (int, np.integer)):
        stage_arr = pa.array(np.full(n, stage, dtype=np.int8))
    elif isinstance(stage, str):
        stage_arr = pa.array([stage] * n, type=pa.string())
    else:
        st = np.asarray(stage)
        if st.dtype.kind in "iu":
            stage_arr = pa.array(st.astype(np.int8))
        else:
            stage_arr = pa.array(list(stage), type=pa.string())
    if pa.types.is_integer(id_type):
        src_arr = pa.array(np.asarray(src, dtype=np.int64), type=id_type)
        dst_arr = pa.array(np.asarray(dst, dtype=np.int64), type=id_type)
    else:
        src_arr = pa.array(list(src), type=id_type)
        dst_arr = pa.array(list(dst), type=id_type)
    return pa.table(
        {
            "src": src_arr,
            "dst": dst_arr,
            "stage": stage_arr,
            "score": pa.array(np.zeros(n), type=pa.float64()),
        }
    )


def _pair_table(
    src, dst, stage_codes, id_type: pa.DataType
) -> pa.Table:
    """Narrow candidate-pair table of the FUSED path: (src, dst,
    stage int8) — no score column (all-zeros anyway; verify appends
    the real one) and no string label (decoded in the verify output).
    The pair table is materialized once and shuffled twice by the
    verify feature joins, so every byte per row is paid three times:
    vs the legacy 4-column layout this saves 8 B zeros + ~15 B string
    cells per pair row on each pass."""
    n = len(src)
    if pa.types.is_integer(id_type):
        src_arr = pa.array(np.asarray(src, dtype=np.int64), type=id_type)
        dst_arr = pa.array(np.asarray(dst, dtype=np.int64), type=id_type)
    else:
        src_arr = pa.array(list(src), type=id_type)
        dst_arr = pa.array(list(dst), type=id_type)
    return pa.table(
        {
            "src": src_arr,
            "dst": dst_arr,
            "stage": pa.array(
                np.asarray(stage_codes, dtype=np.int8)
                if n
                else np.empty(0, np.int8)
            ),
        }
    )


def _group_bounds(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Start/end indices of equal-key runs in a sorted key array."""
    n = len(keys)
    if n == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    change = np.nonzero(keys[1:] != keys[:-1])[0] + 1
    starts = np.concatenate([[0], change])
    ends = np.concatenate([change, [n]])
    return starts, ends


def _auto_mod(cfg: DedupConfig, approx_rows: int | None) -> int:
    """Sampling modulus: cfg override, else derived from the corpus
    size (~rows/1e5, floor 4) so the driver-side merge stays O(sample)
    at any scale, else the legacy 16."""
    if cfg.hot_sample_mod:
        return cfg.hot_sample_mod
    if approx_rows:
        return max(4, approx_rows // 100_000)
    return 16


def _find_hot_buckets(
    expanded, cap: int, stage: str, cfg: DedupConfig,
    approx_rows: int | None = None,
):
    """Sampled hot-bucket detection (no shuffle, no per-row Python).

    One map pass over the expansion: each batch hash-samples its rows
    at rate 1/mod (deterministic on image_id), counts the sampled
    buckets with np.unique, and the driver merges the partial tables.
    Estimated bucket size = total sampled count x mod. The result is
    independent of batching/parallelism (same sample -> same sums), so
    8-CPU and 32-CPU runs salt identically. The driver-side merge is
    bounded by the sample size; `mod` auto-scales with the corpus size
    (_auto_mod) to keep it that way. mod=1 degenerates to the exact
    count (used by tests asserting salted == unsalted).

    Sampling error: a bucket of true size S yields ~Poisson(S/mod)
    sampled rows, so when mod > 1 the salting threshold is cap/2 —
    a bucket must be missed by a 2x estimation error to stay unsalted
    (e.g. a 128-row bucket at cap=64, mod=16 is salted unless the
    sample sees <= 2 of its rows, p < 1e-2; the old threshold=cap
    missed it ~10% of the time). Over-salting is only a small constant
    overhead (salted semantics == unsalted, tested).
    """
    mod = _auto_mod(cfg, approx_rows)

    def partial_counts(batch: pa.Table) -> pa.Table:
        b = batch.column("bucket").to_numpy(zero_copy_only=False)
        if mod > 1:
            ids = H.ids_np(batch.column("image_id").combine_chunks())
            mask = H.hash_ids(ids, seed=0xA11CE) % U64(mod) == 0
            b = b[mask]
        vals, cnts = np.unique(b, return_counts=True)
        return pa.table(
            {
                "bucket": pa.array(vals.astype(np.int64)),
                "c": pa.array(cnts.astype(np.int64)),
            }
        )

    parts = expanded.map_batches(
        partial_counts, batch_format="pyarrow"
    ).to_pandas()
    return _hot_from_partials(parts, cap, stage, mod)


def _find_hot_buckets_presampled(sampled, cap: int, stage: str, mod: int):
    """Hot detection over an ALREADY row-sampled expansion (the fused
    path samples the expansion SOURCES so the detection pass only
    expands 1/mod of the rows)."""

    def partial_counts(batch: pa.Table) -> pa.Table:
        b = batch.column("bucket").to_numpy(zero_copy_only=False)
        vals, cnts = np.unique(b, return_counts=True)
        return pa.table(
            {
                "bucket": pa.array(vals.astype(np.int64)),
                "c": pa.array(cnts.astype(np.int64)),
            }
        )

    parts = sampled.map_batches(
        partial_counts, batch_format="pyarrow"
    ).to_pandas()
    return _hot_from_partials(parts, cap, stage, mod)


def _hot_from_partials(parts: pd.DataFrame, cap: int, stage: str, mod: int):
    hot = {}
    max_est = 0
    # sampled estimates (mod > 1) salt from cap/2 up — the margin that
    # absorbs Poisson sampling error (see _find_hot_buckets); the exact
    # count (mod == 1) salts strictly above cap. The max(..., mod)
    # term requires >= 2 sampled hits: once _auto_mod crosses cap/2
    # (rows >= ~3.3M at the defaults), a single sampled row would
    # otherwise estimate > cap/2 and flag EVERY sampled bucket hot —
    # measured at 4M rows as 4.5M "hot" buckets (vs 63k at 2M), a
    # full extra re-key + bridge chain over the whole expansion. A
    # true bucket of size > 2*mod >= cap still yields >= 2 sampled
    # rows in expectation, and under-salting only costs bounded
    # in-partition all-pairs (never correctness).
    thresh = cap if mod == 1 else max(cap // 2, mod)
    if len(parts):
        est = parts.groupby("bucket")["c"].sum() * mod
        est = est[est > thresh]
        hot = {int(k): int(v) for k, v in est.items()}
        max_est = int(est.max()) if len(est) else 0
    stats = {
        "stage": stage,
        "hot_buckets": len(hot),
        "max_bucket": max_est,
    }
    if hot:
        logger.warning(
            "stage %s: salting %d hot buckets (max est size %d, cap %d)",
            stage, len(hot), stats["max_bucket"], cap,
        )
    return hot, stats


def _hot_arrays_ref(hot: dict[int, int]):
    """Sorted (keys, counts) int64 arrays for the hot-bucket map,
    `ray.put` ONCE — workers get them zero-copy from plasma. The dict
    form was rebuilt + argsorted inside every salt batch, which is
    O(|hot| log |hot|) per batch and dominated the candidates phase
    whenever the hot set was large."""
    hk = np.fromiter(hot.keys(), dtype=np.int64, count=len(hot))
    hc = np.fromiter(hot.values(), dtype=np.int64, count=len(hot))
    order = np.argsort(hk)
    return ray.put((hk[order], hc[order]))


def _salt_fn(hot_ref, target: int, extra_cols: tuple[str, ...] = ()):
    def salt_batch(batch: pa.Table) -> pa.Table:
        hk, hc = ray.get(hot_ref)
        buckets = (
            batch.column("bucket").to_numpy(zero_copy_only=False).astype(np.int64)
        )
        ids = H.ids_np(batch.column("image_id").combine_chunks())
        if len(hk):
            id_hash = H.hash_ids(ids, seed=777)
            pos = np.clip(np.searchsorted(hk, buckets), 0, len(hk) - 1)
            hot_mask = hk[pos] == buckets
            n_sub = np.ones(len(ids), dtype=np.uint64)
            n_sub[hot_mask] = np.maximum(1, -(-hc[pos[hot_mask]] // target))
            salt = (id_hash % n_sub).astype(U64)
            with np.errstate(over="ignore"):
                salted = np.where(
                    hot_mask,
                    H.splitmix64(
                        buckets.view(U64) ^ H.splitmix64(salt + U64(1))
                    ).view(np.int64),
                    buckets,
                )
        else:
            salted = buckets
            hot_mask = np.zeros(len(ids), dtype=bool)
        cols = {
            "bucket": pa.array(salted.astype(np.int64)),
            "obucket": batch.column("bucket"),
            "image_id": batch.column("image_id"),
            "is_hot": pa.array(hot_mask),
        }
        for c in extra_cols:
            cols[c] = batch.column(c)
        return pa.table(cols)

    return salt_batch


def _with_pivots(part, src, dst, stage, idt, ids, keys):
    """Append per-sub-bucket pivot sentinel rows to a pair-emission
    output: for every hot row group (obucket != salted key, all rows
    co-located in this partition) one row with src = dst = min
    image_id and bridge_key = obucket. Non-hot emissions get
    bridge_key = 0. One vectorized lexsort pass — this is what lets
    the bridge ride the main candidate exchange instead of
    re-executing the expansion chain (see fused_pairs_from_buckets)."""
    piv_rep = piv_ob = None
    if "obucket" in part.columns:
        ob = part["obucket"].to_numpy()
        hot_mask = ob != keys
        if hot_mask.any():
            hb, hk, hi = ob[hot_mask], keys[hot_mask], ids[hot_mask]
            o = np.lexsort((hi, hk, hb))
            hb, hk, hi = hb[o], hk[o], hi[o]
            first = np.ones(len(hb), dtype=bool)
            first[1:] = (hb[1:] != hb[:-1]) | (hk[1:] != hk[:-1])
            piv_rep, piv_ob = hi[first], hb[first]
    src = np.asarray(src)
    dst = np.asarray(dst)
    n_pairs = len(src)
    bk = np.zeros(n_pairs, dtype=np.int64)
    ib = np.zeros(n_pairs, dtype=np.int8)
    if piv_rep is not None:
        src = np.concatenate([src, piv_rep]) if len(src) else piv_rep
        dst = np.concatenate([dst, piv_rep]) if len(dst) else piv_rep
        bk = np.concatenate([bk, piv_ob.astype(np.int64)])
        ib = np.concatenate([ib, np.ones(len(piv_rep), dtype=np.int8)])
    t = _edges_table(src, dst, stage, idt)
    # explicit marker — 0 is a legitimate obucket value in the
    # single-stage paths (raw caller-provided bucket ids), so the
    # pivot rows cannot be distinguished by bridge_key alone
    t = t.append_column("bridge_key", pa.array(bk))
    return t.append_column("is_bridge", pa.array(ib))


def _assemble_with_bridge(out, stage: str, hot, cfg: DedupConfig):
    """Split a pair+pivot emission into final edges: real pairs pass
    through; pivot sentinels (bridge_key != 0) chain per original
    bucket in one NARROW exchange. `stage` is the scalar stage label
    of the single-stage (legacy) paths."""

    def drop_bk(batch: pa.Table) -> pa.Table:
        return batch.drop_columns(["bridge_key", "is_bridge"])

    if not hot:
        return out.map_batches(drop_bk, batch_format="pyarrow")
    # consumed twice (pairs + pivots): materialize the exchange output
    out = out.materialize()

    def pairs_only(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        m = pc.equal(batch.column("is_bridge"), pa.scalar(0, type=pa.int8()))
        return batch.filter(m).drop_columns(["bridge_key", "is_bridge"])

    def pivots_only(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        m = pc.equal(batch.column("is_bridge"), pa.scalar(1, type=pa.int8()))
        t = batch.filter(m)
        return pa.table(
            {"obk": t.column("bridge_key"), "rep": t.column("src")}
        )

    def chain(p: pd.DataFrame) -> pd.DataFrame:
        keys2 = p["obk"].to_numpy()
        reps2 = p["rep"].to_numpy()
        idt = _id_pa_type(reps2)
        starts2, ends2 = _group_bounds(keys2)
        s_all, d_all = [], []
        for s, e in zip(starts2, ends2):
            if e - s < 2:
                continue
            g = np.sort(reps2[s:e])
            s_all.append(g[:-1])
            d_all.append(g[1:])
        if not s_all:
            return _edges_table([], [], stage, idt)
        return _edges_table(
            np.concatenate(s_all), np.concatenate(d_all), stage, idt
        )

    edges = out.map_batches(pairs_only, batch_format="pyarrow")
    pivots = out.map_batches(pivots_only, batch_format="pyarrow")
    bridge = partitioned_groups(pivots, "obk", chain, cfg)
    return edges.union(bridge)


def pairs_from_buckets(
    expanded, stage: str, cfg: DedupConfig
) -> tuple["ray.data.Dataset", dict]:
    """(bucket, image_id) Dataset -> canonical candidate edges Dataset.

    Returns (edges, stats). Edges carry src < dst; `score` is filled by
    the verify stage.
    """
    cap = cfg.bucket_cap
    hot, stats = _find_hot_buckets(expanded, cap, stage, cfg)
    if hot:
        hot_ref = _hot_arrays_ref(hot)
        salted = expanded.map_batches(
            _salt_fn(hot_ref, cfg.salt_target), batch_format="pyarrow"
        )
    else:  # nothing hot: skip the salt map entirely
        salted = expanded

    def emit_partition(part: pd.DataFrame) -> pd.DataFrame:
        keys = part["bucket"].to_numpy()
        ids = part["image_id"].to_numpy()
        idt = _id_pa_type(ids)
        starts, ends = _group_bounds(keys)
        src_all, dst_all = [], []
        for s, e in zip(starts, ends):
            n = e - s
            if n < 2:
                continue
            g = np.sort(ids[s:e])
            if n > cap:  # extreme collision inside a sub-bucket: chain
                src_all.append(g[:-1])
                dst_all.append(g[1:])
            else:
                i, j = np.triu_indices(n, k=1)
                src_all.append(g[i])
                dst_all.append(g[j])
        src = np.concatenate(src_all) if src_all else np.empty(0, np.int64)
        dst = np.concatenate(dst_all) if src_all else np.empty(0, np.int64)
        return _with_pivots(part, src, dst, stage, idt, ids, keys)

    cols = ["bucket", "image_id"] + (["obucket"] if hot else [])
    edges = _assemble_with_bridge(
        partitioned_groups(
            salted.select_columns(cols), "bucket", emit_partition, cfg
        ),
        stage, hot, cfg,
    )
    return edges, stats


def simhash_pairs_from_buckets(expanded, stage: str, cfg: DedupConfig):
    """Candidate pairs for chunk-probed SimHash buckets with the
    Hamming(<= radius) test applied INSIDE the bucket (the expansion
    carries the simhash payload), so no feature-attachment join and no
    over-emission: output pairs already satisfy the Hamming criterion.

    Hot buckets are salted like pairs_from_buckets, including the
    bridge edges between sub-bucket representatives (without them,
    near-dup pairs split across salt sub-buckets would be lost); the
    bridges skip the in-bucket Hamming pre-test but every emitted pair
    is re-checked by verify_simhash_psnr, so precision is unaffected.
    Within a salted or still-hot sub-bucket members are sorted by
    (simhash, id) so identical hashes sit adjacent and chain links
    still verify.
    """
    cap = cfg.bucket_cap
    r = cfg.hamming_radius
    hot, stats = _find_hot_buckets(expanded, cap, stage, cfg)
    if hot:
        hot_ref = _hot_arrays_ref(hot)
        salted = expanded.map_batches(
            _salt_fn(hot_ref, cfg.salt_target, extra_cols=("simhash",)),
            batch_format="pyarrow",
        )
    else:
        salted = expanded

    def emit_partition(part: pd.DataFrame) -> pd.DataFrame:
        keys = part["bucket"].to_numpy()
        ids = part["image_id"].to_numpy()
        idt = _id_pa_type(ids)
        sh = part["simhash"].to_numpy().astype(np.int64).view(U64)
        starts, ends = _group_bounds(keys)
        src_all, dst_all = [], []
        for s, e in zip(starts, ends):
            n = e - s
            if n < 2:
                continue
            order = np.lexsort((ids[s:e], sh[s:e]))
            g_ids = ids[s:e][order]
            g_sh = sh[s:e][order]
            if n > cap:
                i = np.arange(n - 1)
                j = i + 1
            else:
                i, j = np.triu_indices(n, k=1)
            d = H.hamming64(g_sh[i], g_sh[j])
            keep = d <= r
            if not keep.any():
                continue
            a, b = g_ids[i[keep]], g_ids[j[keep]]
            src_all.append(np.minimum(a, b))
            dst_all.append(np.maximum(a, b))
        src = np.concatenate(src_all) if src_all else np.empty(0, np.int64)
        dst = np.concatenate(dst_all) if src_all else np.empty(0, np.int64)
        return _with_pivots(part, src, dst, stage, idt, ids, keys)

    cols = ["bucket", "image_id", "simhash"] + (["obucket"] if hot else [])
    edges = _assemble_with_bridge(
        partitioned_groups(
            salted.select_columns(cols), "bucket", emit_partition, cfg
        ),
        stage, hot, cfg,
    )
    return edges, stats


# Per-stage key-space seeds: mixed into bucket keys so the fused
# union of all expansions never collides across stages (each stage's
# buckets live in a disjoint hashed key space).
_STAGE_SEEDS = {
    "minhash": U64(0x51AE_0001),
    "simhash": U64(0x51AE_0002),
    "substring": U64(0x51AE_0003),
    "exact_caption": U64(0x51AE_0004),
    "exact_image": U64(0x51AE_0005),
}


def _stage_seed(stage: str) -> U64:
    """Key-space seed for a stage; registry-added custom families get
    a deterministic seed derived from their name."""
    s = _STAGE_SEEDS.get(stage)
    if s is None:
        s = U64(H.hash_bytes_arrays([stage], seed=0x57A6)[0])
    return s


def _mix_keys(keys_i64: np.ndarray, seed: U64) -> np.ndarray:
    with np.errstate(over="ignore"):
        return H.splitmix64(keys_i64.view(U64) ^ seed).view(np.int64)


def fused_pairs_from_buckets(
    expansions: list[tuple["ray.data.Dataset", object, str]],
    cfg: DedupConfig,
    approx_rows: int | None = None,
) -> tuple["ray.data.Dataset", dict]:
    """ONE candidate-generation shuffle for every sketch stage.

    Concurrent Dataset executions serialize in Ray's streaming
    executor, so running the minhash / simhash / substring chains in
    driver threads buys nothing — instead their expansions are tagged
    with a stage label, bucket keys are re-mixed into per-stage key
    spaces (no cross-stage collisions), and a single sampled
    hot-detect + salted partitioned-groups pass emits every stage's
    pairs with per-stage semantics:

      - set stages (minhash / substring): all-pairs under the cap,
        chain above it;
      - simhash: in-bucket Hamming(<= radius) test on the carried
        simhash payload.

    `expansions`: (source_ds, expand_fn, stage) triples —
    expand_fn(source_ds) yields the (bucket, image_id[, simhash])
    expansion. Hot-bucket detection expands only a 1/hot_sample_mod
    hash-sample of each SOURCE (not the full expansion), so the
    detection pass costs ~1/mod of one expansion and no shuffle.

    Returns (edges, stats). Edge rows are NARROW (src, dst,
    stage int8 code indexing the input stage order — _pair_table);
    verify_fused dispatches on the codes and decodes the public
    string label in its output.
    """

    stage_names = [st for _, _, st in expansions]
    code_of = {st: i for i, st in enumerate(stage_names)}
    ham_code = code_of.get("simhash", -1)

    def tag(stage: str, has_simhash: bool):
        seed = _stage_seed(stage)
        code = code_of[stage]

        def fn(batch: pa.Table) -> pa.Table:
            b = batch.column("bucket").to_numpy(zero_copy_only=False)
            n = len(batch)
            return pa.table(
                {
                    "bucket": pa.array(_mix_keys(b, seed)),
                    "image_id": batch.column("image_id"),
                    "simhash": (
                        batch.column("simhash")
                        if has_simhash
                        else pa.array(np.zeros(n, dtype=np.int64))
                    ),
                    # 1-byte exchange code, not the ~11-byte label:
                    # the candidate shuffle is the largest exchange in
                    # the flagship (verify_fused restores the labels)
                    "stage": pa.array(np.full(n, code, dtype=np.int8)),
                }
            )

        return fn

    mod = _auto_mod(cfg, approx_rows)

    def sample_rows(batch: pa.Table) -> pa.Table:
        ids = H.ids_np(batch.column("image_id").combine_chunks())
        mask = H.hash_ids(ids, seed=0xA11CE) % U64(mod) == 0
        return batch.filter(pa.array(mask))

    tagged = None
    sampled = None
    for src_ds, expand_fn, stage in expansions:
        t = expand_fn(src_ds).map_batches(
            tag(stage, stage == "simhash"), batch_format="pyarrow"
        )
        tagged = t if tagged is None else tagged.union(t)
        src_s = (
            src_ds.map_batches(sample_rows, batch_format="pyarrow")
            if mod > 1
            else src_ds
        )
        s = expand_fn(src_s).map_batches(
            tag(stage, stage == "simhash"), batch_format="pyarrow"
        )
        sampled = s if sampled is None else sampled.union(s)
    assert tagged is not None, "no expansions enabled"

    cap = cfg.bucket_cap
    r = cfg.hamming_radius
    hot, stats = _find_hot_buckets_presampled(sampled, cap, "fused", mod)
    if hot:
        hot_ref = _hot_arrays_ref(hot)
        salted = tagged.map_batches(
            _salt_fn(hot_ref, cfg.salt_target, extra_cols=("simhash", "stage")),
            batch_format="pyarrow",
        )
        # The expansion chain executes exactly ONCE: bridge pivots are
        # folded into the main candidate exchange below (emit_partition
        # outputs them as sentinel rows; a tiny follow-up exchange
        # chains them per original bucket). The expansion itself stays
        # lazy and is never materialized — rows x keys was measured 5x
        # more expensive to materialize than to stream (170 s vs ~30 s
        # at 1M rows): cheap compute, heavy bytes.
    else:
        salted = tagged

    def emit_partition(part: pd.DataFrame) -> pd.DataFrame:
        keys = part["bucket"].to_numpy()
        ids = part["image_id"].to_numpy()
        idt = _id_pa_type(ids)
        sh = part["simhash"].to_numpy().astype(np.int64).view(U64)
        st = part["stage"].to_numpy()
        has_ob = "obucket" in part.columns
        starts, ends = _group_bounds(keys)
        src_all, dst_all, st_all = [], [], []
        for s, e in zip(starts, ends):
            n = e - s
            if n < 2:
                continue
            g_stage = st[s]
            if g_stage == ham_code:
                order = np.lexsort((ids[s:e], sh[s:e]))
                g_ids = ids[s:e][order]
                g_sh = sh[s:e][order]
                if n > cap:
                    i = np.arange(n - 1)
                    j = i + 1
                else:
                    i, j = np.triu_indices(n, k=1)
                d = H.hamming64(g_sh[i], g_sh[j])
                keep = d <= r
                if not keep.any():
                    continue
                a, b = g_ids[i[keep]], g_ids[j[keep]]
                src = np.minimum(a, b)
                dst = np.maximum(a, b)
            else:
                g = np.sort(ids[s:e])
                if n > cap:  # collision inside a sub-bucket: chain
                    src, dst = g[:-1], g[1:]
                else:
                    i, j = np.triu_indices(n, k=1)
                    src, dst = g[i], g[j]
            src_all.append(src)
            dst_all.append(dst)
            st_all.append(np.full(len(src), g_stage, dtype=np.int8))
        n_pairs = sum(len(a) for a in src_all)
        piv_rep = piv_ob = piv_st = None
        if has_ob:
            # pivot rows for HOT rows (salted key != original bucket):
            # min image_id per (obucket, salted key) — the sub-bucket
            # representatives the bridge pass used to recompute by
            # re-executing the whole expansion chain. One vectorized
            # pass; singleton sub-buckets included (their member must
            # still link into the component).
            ob = part["obucket"].to_numpy()
            hot_mask = ob != keys
            if hot_mask.any():
                hb, hk = ob[hot_mask], keys[hot_mask]
                hi, hst = ids[hot_mask], st[hot_mask]
                o = np.lexsort((hi, hk, hb))
                hb, hk, hi, hst = hb[o], hk[o], hi[o], hst[o]
                first = np.ones(len(hb), dtype=bool)
                first[1:] = (hb[1:] != hb[:-1]) | (hk[1:] != hk[:-1])
                piv_rep, piv_ob, piv_st = hi[first], hb[first], hst[first]
        if n_pairs == 0 and piv_rep is None:
            t = _pair_table([], [], [], idt)
            t = t.append_column(
                "bridge_key", pa.array(np.empty(0, np.int64))
            )
            return t.append_column(
                "is_bridge", pa.array(np.empty(0, np.int8))
            )
        src = np.concatenate(src_all) if src_all else np.empty(0, np.int64)
        dst = np.concatenate(dst_all) if src_all else np.empty(0, np.int64)
        stc = (
            np.concatenate(st_all) if src_all else np.empty(0, np.int8)
        )
        bk = np.zeros(n_pairs, dtype=np.int64)
        ib = np.zeros(n_pairs, dtype=np.int8)
        if piv_rep is not None:
            # pivot rows ride the same output table: src = rep,
            # dst = rep (placeholder), bridge_key = obucket,
            # is_bridge = 1 (explicit marker — see _with_pivots)
            src = np.concatenate([src, piv_rep])
            dst = np.concatenate([dst, piv_rep])
            stc = np.concatenate([stc, piv_st.astype(np.int8)])
            bk = np.concatenate([bk, piv_ob.astype(np.int64)])
            ib = np.concatenate([ib, np.ones(len(piv_rep), dtype=np.int8)])
        t = _pair_table(src, dst, stc, idt)
        t = t.append_column("bridge_key", pa.array(bk))
        return t.append_column("is_bridge", pa.array(ib))

    exch_cols = ["bucket", "image_id", "simhash", "stage"]
    if hot:
        # +8 B/row on the exchange buys the bridge WITHOUT re-running
        # the expansion chain: hotness is derivable per row as
        # obucket != bucket (cold rows keep bucket == obucket)
        exch_cols.append("obucket")
    out = partitioned_groups(
        salted.select_columns(exch_cols), "bucket", emit_partition, cfg
    )
    if hot:
        # consumed twice (pairs + pivots) -> materialize the exchange
        # output once; the caller's cand_edges.materialize() then only
        # pays the small bridge-chain exchange on top
        out = out.materialize()

        def pairs_only(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            m = pc.equal(
                batch.column("is_bridge"), pa.scalar(0, type=pa.int8())
            )
            return batch.filter(m).drop_columns(["bridge_key", "is_bridge"])

        def pivots_only(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            m = pc.equal(
                batch.column("is_bridge"), pa.scalar(1, type=pa.int8())
            )
            t = batch.filter(m)
            return pa.table(
                {
                    "obk": t.column("bridge_key"),
                    "rep": t.column("src"),
                    "stage": t.column("stage"),
                }
            )

        def chain(p: pd.DataFrame) -> pd.DataFrame:
            keys2 = p["obk"].to_numpy()
            reps2 = p["rep"].to_numpy()
            st2 = p["stage"].to_numpy()
            starts2, ends2 = _group_bounds(keys2)
            s_all, d_all, t_all = [], [], []
            for s, e in zip(starts2, ends2):
                if e - s < 2:
                    continue
                g = np.sort(reps2[s:e])
                s_all.append(g[:-1])
                d_all.append(g[1:])
                t_all.append(np.full(e - s - 1, st2[s], dtype=np.int8))
            if not s_all:
                return _pair_table([], [], [], _id_pa_type(reps2))
            return _pair_table(
                np.concatenate(s_all),
                np.concatenate(d_all),
                np.concatenate(t_all),
                _id_pa_type(reps2),
            )

        edges = out.map_batches(pairs_only, batch_format="pyarrow")
        pivots = out.map_batches(pivots_only, batch_format="pyarrow")
        bridge = partitioned_groups(pivots, "obk", chain, cfg)
        edges = edges.union(bridge)
    else:
        def drop_bk(batch: pa.Table) -> pa.Table:
            return batch.drop_columns(["bridge_key", "is_bridge"])

        edges = out.map_batches(drop_bk, batch_format="pyarrow")
    # pair rows stay NARROW (src, dst, stage int8 — _pair_table): the
    # table is materialized once and exchanged twice more by the
    # verify feature joins; the string label and the real score are
    # appended by verify_fused's OUTPUT (verified pairs are a small
    # fraction of candidates)
    return edges, stats


def collapse_dual(sigs, axes, cfg: DedupConfig):
    """Representative collapse for SEVERAL hash axes in ONE shuffle.

    `axes`: list of (key_col, stage_name, rep_cols). The signature
    table is tagged once per axis — key re-mixed into the axis's key
    space, only that axis's `rep_cols` carried (the other axis's
    columns are nulls, so e.g. thumbnails never ride the caption
    axis) — unioned, and annotated with rep = min image_id per key
    group in a single partitioned-groups pass.

    Returns (edges_ds, {stage_name: reps_ds}): exact-dup edges for all
    axes (per-row stage label, score=1.0) and one rep table per axis
    (image_id + rep_cols of representatives only). Semantics are
    identical to running collapse_by per axis; see collapse_by for the
    correctness argument.
    """
    all_rep_cols: list[str] = []
    for _, _, rep_cols in axes:
        for c in rep_cols:
            if c not in all_rep_cols:
                all_rep_cols.append(c)
    sch = sigs.schema()
    col_types = dict(zip(sch.names, sch.types))

    axis_names = [a[1] for a in axes]
    axis_code = {nm: i for i, nm in enumerate(axis_names)}

    def tagger(key_col: str, stage_name: str, rep_cols: list[str]):
        seed = _stage_seed(stage_name)
        code = axis_code[stage_name]

        def fn(batch: pa.Table) -> pa.Table:
            n = len(batch)
            k = batch.column(key_col).to_numpy(zero_copy_only=False)
            cols = {
                "key": pa.array(_mix_keys(k, seed)),
                # int8 axis code through the exchange (decoded to the
                # public label in the edges pass below)
                "stage": pa.array(np.full(n, code, dtype=np.int8)),
                "image_id": batch.column("image_id"),
            }
            for c in all_rep_cols:
                cols[c] = (
                    batch.column(c)
                    if c in rep_cols
                    else pa.nulls(n, col_types[c])
                )
            return pa.table(cols)

        return fn

    tagged = None
    for key_col, stage_name, rep_cols in axes:
        t = sigs.map_batches(
            tagger(key_col, stage_name, rep_cols), batch_format="pyarrow"
        )
        tagged = t if tagged is None else tagged.union(t)

    def annotate(part: pa.Table) -> pa.Table:
        keys = part.column("key").to_numpy(zero_copy_only=False)
        ids = H.ids_np(part.column("image_id").combine_chunks())
        idt = part.schema.field("image_id").type
        starts, ends = _group_bounds(keys)
        if len(starts) == 0:
            return part.append_column("rep", pa.array([], type=idt))
        gidx = np.repeat(np.arange(len(starts)), ends - starts)
        rep = np.minimum.reduceat(ids, starts)[gidx]
        return part.append_column("rep", pa.array(rep, type=idt))

    annotated = partitioned_groups_arrow(tagged, "key", annotate, cfg).materialize()

    lookup = np.asarray(axis_names, dtype=object)

    def edges(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.not_equal(batch.column("image_id"), batch.column("rep"))
        t = batch.filter(keep)
        codes = t.column("stage").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "src": t.column("rep"),
                "dst": t.column("image_id"),
                "stage": pa.array(
                    lookup[codes.astype(np.int64)], type=pa.string()
                ),
                "score": pa.array(np.ones(len(t)), type=pa.float64()),
            }
        )

    def reps_for(stage_name: str, rep_cols: list[str]):
        def fn(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            keep = pc.and_(
                pc.equal(
                    batch.column("stage"),
                    pa.scalar(axis_code[stage_name], type=pa.int8()),
                ),
                pc.equal(batch.column("image_id"), batch.column("rep")),
            )
            t = batch.filter(keep)
            return t.select(["image_id", *rep_cols])

        return fn

    edges_ds = annotated.map_batches(edges, batch_format="pyarrow")
    reps = {
        stage_name: annotated.map_batches(
            reps_for(stage_name, rep_cols), batch_format="pyarrow"
        )
        for _, stage_name, rep_cols in axes
    }
    return edges_ds, reps


def dedup_edges(edges, cfg: DedupConfig | None = None):
    """Canonical edge dedup: keep one row per (src, dst) pair
    (SURVEY.md §2.6 E5). Partitioned on src (so any given pair lands
    in one partition); rows are pre-sorted by (src, dst, stage, score)
    so the kept row is DETERMINISTIC when the same pair arrives from
    several stages (arrival order from upstream unions is not)."""
    if cfg is None:
        cfg = DedupConfig()

    def drop(part: pd.DataFrame) -> pd.DataFrame:
        return part.sort_values(
            ["src", "dst", "stage", "score"], kind="stable"
        ).drop_duplicates(["src", "dst"], keep="first")

    return partitioned_groups(edges, "src", drop, cfg)


def collapse_by(sigs, key_col: str, stage: str, cfg: DedupConfig | None = None):
    """Representative collapse: group rows by `key_col` (a content
    hash); every group's rep = min image_id. Returns (rep_edges,
    rep_sigs):

    - rep_edges: (src=rep, dst=member, stage, score=1.0) for non-rep
      members — exact-dup edges needing no verification (identical
      content always passes any verify criterion).
    - rep_sigs: signature rows of representatives only — the sketch
      stages then run on UNIQUE content, which removes
      identical-content skew at the root (the boilerplate caption
      becomes ONE rep) and cuts candidate volume by the duplication
      factor.

    Reference analog: hash-unique member lists per issue,
    ea/sim/main/data/buckets/stack_state_model.py:25-47.
    """
    if cfg is None:
        cfg = DedupConfig()

    def annotate(part: pa.Table) -> pa.Table:
        # part is sorted by key_col; vectorized per-group min image_id
        keys = part.column(key_col).to_numpy(zero_copy_only=False)
        ids = H.ids_np(part.column("image_id").combine_chunks())
        idt = part.schema.field("image_id").type
        starts, ends = _group_bounds(keys)
        if len(starts) == 0:
            return part.append_column("rep", pa.array([], type=idt))
        gidx = np.repeat(np.arange(len(starts)), ends - starts)
        rep_per_group = np.minimum.reduceat(ids, starts)
        rep = rep_per_group[gidx]
        return part.append_column("rep", pa.array(rep, type=idt))

    annotated = partitioned_groups_arrow(sigs, key_col, annotate, cfg).materialize()

    def edges(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.not_equal(batch.column("image_id"), batch.column("rep"))
        t = batch.filter(keep)
        return pa.table(
            {
                "src": t.column("rep"),
                "dst": t.column("image_id"),
                "stage": pa.array([stage] * len(t), type=pa.string()),
                "score": pa.array(np.ones(len(t)), type=pa.float64()),
            }
        )

    def reps(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = batch.filter(pc.equal(batch.column("image_id"), batch.column("rep")))
        return t.drop_columns(["rep"])

    return (
        annotated.map_batches(edges, batch_format="pyarrow"),
        annotated.map_batches(reps, batch_format="pyarrow"),
    )
