"""Verify stage: candidate edges -> confirmed edges with scores.

Candidates from LSH banding / chunk probing are *probabilistic*; this
stage recomputes the exact similarity for every candidate pair and
keeps only true near-dups (precision guard against distractors).

Reference analog: the scoring stage of the retrieve-then-rerank
two-stage design (retrieval top-50 then pairwise scoring,
/root/reference/ea/sim/main/methods/ranking_model.py:45-88 and
cross-encoder re-scoring, scoring_stage.py) — our retrieval is the
bucket groupby, our scorers are exact Jaccard (Lerch-style set
intersection, ea/sim/main/methods/neural/cross_encoders/lerch.py:36-52),
Hamming + PSNR (image side), and shared-L-gram (substring side).

Feature attachment is a hash-partitioned ``Dataset.join`` on each
endpoint (src then dst). Only the columns each verifier needs are
joined: heavy ``bytes`` only for simhash pairs that already passed the
cheap Hamming test.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from stack_trace_deduplication_ray.config import DedupConfig
from stack_trace_deduplication_ray.functions import codecs as C
from stack_trace_deduplication_ray.functions import hashing as H
from stack_trace_deduplication_ray.stages.joins import join_ds

U64 = np.uint64


def attach_pair_features(
    edges, feats, cfg: DedupConfig, suffixes=("_src", "_dst"),
    dedup_pairs: bool = False, dedup_cols: list[str] | None = None,
    stage_boundary: bool = True, feat_size_bytes: int | None = None,
):
    """edges(src, dst, ...) x feats(image_id, f...) -> one row per edge
    with f_src / f_dst columns (two partitioned hash joins; feature
    columns are pre-renamed per side so names never collide).

    dedup_pairs=True folds global candidate dedup (on `dedup_cols`,
    default (src, dst)) into the first join (partitioned on src),
    saving a dedicated shuffle.

    stage_boundary=True materializes between the two joins: Ray's
    streaming executor was measured 2-3x slower running chained
    AllToAll exchanges as one graph than staged (verify at 100k rows:
    9.5 s streamed vs 5.7 s staged).

    feat_size_bytes: caller-known feature-table size (a materialized
    signature table's size_bytes() is metadata-free; a projection's
    parent size over-estimates, which only errs toward the fallback).
    Under cfg.broadcast_feats_max_bytes BOTH attaches become
    zero-exchange broadcast lookups and the requested pair dedup runs
    as its own NARROW exchange (pairs only, no feature payload):
    measured 14.3-17.6 s -> 9.1-9.4 s for the 500k verify phase with
    identical output. The win is size-dependent — at 8k rows (~4 MB
    features) it is neutral — so the gate is in BYTES; above it the
    partitioned shape runs unchanged (the 100-TB path)."""
    feat_cols = [c for c in feats.schema().names if c != "image_id"]

    def renamer(suffix):
        def fn(batch: pa.Table) -> pa.Table:
            cols = {"__fid" + suffix: batch.column("image_id")}
            for c in feat_cols:
                cols[c + suffix] = batch.column(c)
            return pa.table(cols)

        return fn

    f_src = feats.map_batches(renamer(suffixes[0]), batch_format="pyarrow")
    f_dst = feats.map_batches(renamer(suffixes[1]), batch_format="pyarrow")
    if (
        feat_size_bytes is not None
        and feat_size_bytes <= cfg.broadcast_feats_max_bytes
    ):
        from stack_trace_deduplication_ray.stages.joins import (
            broadcast_attach,
            partitioned_groups,
        )

        if dedup_pairs:
            cols = dedup_cols or ["src", "dst"]

            def drop(part: pd.DataFrame) -> pd.DataFrame:
                return part.drop_duplicates(cols, keep="first")

            edges = partitioned_groups(edges, "src", drop, cfg)
        # the gate decision was made here, by BYTES — force past the
        # rows gate inside broadcast_attach
        j1 = broadcast_attach(
            edges, f_src, "src", "__fid" + suffixes[0], cfg, force=True,
        )
        return broadcast_attach(
            j1, f_dst, "dst", "__fid" + suffixes[1], cfg, force=True,
        )
    j1 = join_ds(
        edges, f_src, "src", "__fid" + suffixes[0], cfg,
        dedup_left=(dedup_cols or ["src", "dst"]) if dedup_pairs else None,
    )
    if stage_boundary:
        j1 = j1.materialize()
    return join_ds(j1, f_dst, "dst", "__fid" + suffixes[1], cfg)


def _unique_shingle_sets(
    caps: list[str], k: int
) -> tuple[np.ndarray, list[np.ndarray]]:
    """Factorize captions and hash each DISTINCT caption exactly once.

    Returns (codes, sets): codes[i] is caption i's distinct-code, and
    sets[c] the SORTED UNIQUE shingle-hash array of distinct caption
    c. Verify batches are partitioned by src, so the same caption
    appears in many pairs of a batch — re-hashing it per pair made
    the score kernel the flagship's dominant (and memory-bandwidth
    anti-scaling) phase at 2M rows: 132 s at 8 CPUs but 197 s at 32
    (32 concurrent re-hash loops saturate one box's DRAM). Hashing
    per DISTINCT caption cuts the traffic by the pair multiplicity.
    """
    import pandas as pd

    codes, uniques = pd.factorize(np.asarray(caps, dtype=object))
    h, offs = H.shingle_hashes(list(uniques), k)
    sets = [np.unique(h[offs[i] : offs[i + 1]]) for i in range(len(uniques))]
    return codes, sets


def _jaccard_batch(cap_a: list[str], cap_b: list[str], k: int) -> np.ndarray:
    """Exact Jaccard over char-k-shingle sets, per pair (distinct
    captions hashed once; repeated (a, b) code pairs memoized)."""
    n = len(cap_a)
    codes, sets = _unique_shingle_sets(list(cap_a) + list(cap_b), k)
    ca, cb = codes[:n], codes[n:]
    out = np.zeros(n, dtype=np.float64)
    cache: dict[tuple[int, int], float] = {}
    for i in range(n):  # candidate pairs only — small relative to corpus
        key = (int(ca[i]), int(cb[i]))
        v = cache.get(key)
        if v is None:
            sa, sb = sets[ca[i]], sets[cb[i]]
            if len(sa) == 0 and len(sb) == 0:
                v = 1.0
            else:
                inter = np.intersect1d(sa, sb, assume_unique=True).size
                union = sa.size + sb.size - inter
                v = float(inter) / float(union) if union else 1.0
            cache[key] = v
        out[i] = v
    return out


def _substring_batch(
    cap_a: list[str], cap_b: list[str], L: int
) -> tuple[np.ndarray, np.ndarray]:
    """Shared >=L-char-window test per pair, hashing BATCHED.

    One shingle_hashes call per side (in-row L-gram windows, the same
    rolling-hash values the winnowing expansion buckets on); the only
    per-pair work left is the sorted-set intersection. Rows shorter
    than L cannot share an L-char substring and are masked out (the
    batched hasher would otherwise give them a whole-row fallback
    hash).

    Returns (keep mask, score) arrays.
    """
    n = len(cap_a)
    codes, sets = _unique_shingle_sets(list(cap_a) + list(cap_b), L)
    ca, cb = codes[:n], codes[n:]
    keep = np.zeros(n, dtype=bool)
    score = np.zeros(n, dtype=np.float64)
    cache: dict[tuple[int, int], int] = {}
    for i in range(n):  # candidate pairs only — small relative to corpus
        la, lb = len(cap_a[i]), len(cap_b[i])
        if la < L or lb < L:
            continue
        key = (int(ca[i]), int(cb[i]))
        inter = cache.get(key)
        if inter is None:
            inter = int(
                np.intersect1d(
                    sets[ca[i]], sets[cb[i]], assume_unique=True
                ).size
            )
            cache[key] = inter
        if inter > 0:
            keep[i] = True
            # score = length of longest shared run, approximated by
            # (#shared L-grams + L - 1) normalized by the shorter len
            score[i] = min(1.0, (inter + L - 1) / max(1, min(la, lb)))
    return keep, score


def verify_substring(edges, sigs, cfg: DedupConfig):
    """Keep pairs sharing an exact >=L-char substring (rolling-hash
    L-gram set intersection; 64-bit collisions are negligible and the
    downstream clustering treats edges as candidates for CC only)."""
    feats = sigs.select_columns(["image_id", "caption_norm"])
    paired = attach_pair_features(edges, feats, cfg, dedup_pairs=True)
    L = cfg.substring_min_len

    def score(batch: pa.Table) -> pa.Table:
        a = batch.column("caption_norm_src").to_pylist()
        b = batch.column("caption_norm_dst").to_pylist()
        keep, score_v = _substring_batch(a, b, L)
        out = batch.select(["src", "dst", "stage"]).filter(pa.array(keep))
        return out.append_column("score", pa.array(score_v[keep], type=pa.float64()))

    return paired.map_batches(score, batch_format="pyarrow")


def verify_simhash_psnr(edges, sigs, cfg: DedupConfig):
    """PSNR verify for simhash candidate pairs whose Hamming test
    already ran inside the bucket emitter
    (candidates.simhash_pairs_from_buckets).

    Compares the 16x16 decoded-gray thumbnails computed once per row
    by the signature stage — the payload `bytes` never enter a
    shuffle, and the PSNR is a single vectorized numpy pass per batch
    (no per-pair decode). Rows whose payload failed to decode
    (decode_ok=false -> zero thumb) never pass against a real image
    and only pair with other undecodable rows at PSNR=inf; those are
    filtered by decode_ok."""
    feats = sigs.select_columns(["image_id", "thumb", "decode_ok"])
    paired = attach_pair_features(edges, feats, cfg, dedup_pairs=True)

    def psnr_check(batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            return batch.select(["src", "dst", "stage"]).append_column(
                "score", pa.array([], type=pa.float64())
            )
        ta = H.fixed_from_binary(batch.column("thumb_src"), 256).astype(np.float64)
        tb = H.fixed_from_binary(batch.column("thumb_dst"), 256).astype(np.float64)
        ok = np.logical_and(
            batch.column("decode_ok_src").to_numpy(zero_copy_only=False),
            batch.column("decode_ok_dst").to_numpy(zero_copy_only=False),
        )
        mse = np.mean((ta - tb) ** 2, axis=1)
        with np.errstate(divide="ignore"):
            p = 10.0 * np.log10(255.0 * 255.0 / np.maximum(mse, 1e-300))
        keep = ok & (p >= cfg.psnr_threshold_db)
        score = np.where(np.isinf(p) | (p > 100.0), 1.0, p / 100.0)
        out = batch.select(["src", "dst", "stage"]).filter(pa.array(keep))
        return out.append_column(
            "score", pa.array(score[keep], type=pa.float64())
        )

    return paired.map_batches(psnr_check, batch_format="pyarrow")


def verify_fused(
    edges, sigs, cfg: DedupConfig, has_image: bool,
    stage_names: list[str] | None = None,
):
    """ONE verify pass for every sketch stage's candidates.

    `edges` may carry the stage as the fused path's int8 EXCHANGE CODE
    (candidates._pair_table — index into `stage_names`) or as the
    public string label; kernels dispatch on either, and the OUTPUT
    stage column is always the decoded string (verified pairs are a
    small fraction of candidates, so the label is paid only where the
    user sees it).

    The fused candidate edges carry per-row stage labels; a single
    feature-attachment join (2 shuffles total, vs 2 per stage) brings
    caption_norm (+ thumb/decode_ok when images are present) to every
    pair, and each batch dispatches rows to the stage's exact kernel:

      - minhash  -> exact char-shingle Jaccard >= jaccard_threshold
      - substring-> shared >= L-char window (rolling-hash L-grams)
      - simhash  -> thumbnail PSNR >= psnr_threshold_db (Hamming test
                    already ran inside the bucket emitter)

    Candidate dedup happens inside the first join on (src, dst, stage)
    — every stage-variant of a pair is verified by ITS OWN criterion,
    so a pair failing one stage can still be confirmed by another
    (identical to the per-stage chains it replaces); the final
    dedup_edges collapses multi-stage confirmations deterministically.

    Features come from the full signature table (one row per id, all
    feature columns) because caption-axis and image-axis reps are
    different id sets.
    """
    cols = ["image_id", "caption_norm"]
    if has_image:
        cols += ["thumb", "decode_ok"]
    feats = sigs.select_columns(cols)
    # stage_boundary=False: the post-join1 table is the WIDEST
    # intermediate of the whole pipeline (pairs x thumbnails);
    # materializing it helps small corpora but costs more than the
    # streamed re-plan at 500k rows on 8 CPUs (measured +60 s)
    # sigs is materialized by run_dedup -> size_bytes() is metadata-
    # free; the parent-table size over-estimates the projected feats,
    # which only errs toward the partitioned fallback
    try:
        feat_bytes = sigs.size_bytes()
    except Exception:
        feat_bytes = None
    paired = attach_pair_features(
        edges, feats, cfg, dedup_pairs=True,
        dedup_cols=["src", "dst", "stage"], stage_boundary=False,
        feat_size_bytes=feat_bytes,
    )
    L = cfg.substring_min_len

    name_lookup = (
        np.asarray(stage_names, dtype=object)
        if stage_names is not None
        else None
    )

    def score(batch: pa.Table) -> pa.Table:
        n = len(batch)
        stage_col = batch.column("stage")
        coded = pa.types.is_integer(stage_col.type)
        if n == 0:
            return pa.table(
                {
                    "src": batch.column("src"),
                    "dst": batch.column("dst"),
                    "stage": pa.array([], type=pa.string()),
                    "score": pa.array([], type=pa.float64()),
                }
            )
        if coded:
            assert name_lookup is not None, (
                "int8 stage codes need stage_names for dispatch"
            )
            st = name_lookup[
                stage_col.to_numpy(zero_copy_only=False).astype(np.int64)
            ]
        else:
            st = np.asarray(stage_col.to_pylist(), dtype=object)
        keep = np.zeros(n, dtype=bool)
        sc = np.zeros(n, dtype=np.float64)

        # registry-added custom families default to the conservative
        # set-similarity criterion (exact caption Jaccard), same as
        # minhash
        mh_idx = np.nonzero((st != "substring") & (st != "simhash"))[0]
        ss_idx = np.nonzero(st == "substring")[0]
        if len(mh_idx) or len(ss_idx):
            cap_a = batch.column("caption_norm_src").to_pylist()
            cap_b = batch.column("caption_norm_dst").to_pylist()
            if len(mh_idx):
                jac = _jaccard_batch(
                    [cap_a[i] for i in mh_idx],
                    [cap_b[i] for i in mh_idx],
                    cfg.shingle_k,
                )
                ok = jac >= cfg.jaccard_threshold
                keep[mh_idx] = ok
                sc[mh_idx] = np.where(ok, jac, 0.0)
            if len(ss_idx):
                ss_keep, ss_sc = _substring_batch(
                    [cap_a[i] for i in ss_idx],
                    [cap_b[i] for i in ss_idx],
                    L,
                )
                keep[ss_idx] = ss_keep
                sc[ss_idx] = ss_sc

        sh_idx = np.nonzero(st == "simhash")[0]
        if len(sh_idx):
            ta = H.fixed_from_binary(
                batch.column("thumb_src").take(pa.array(sh_idx)), 256
            ).astype(np.float64)
            tb = H.fixed_from_binary(
                batch.column("thumb_dst").take(pa.array(sh_idx)), 256
            ).astype(np.float64)
            ok_dec = np.logical_and(
                batch.column("decode_ok_src").to_numpy(zero_copy_only=False)[sh_idx],
                batch.column("decode_ok_dst").to_numpy(zero_copy_only=False)[sh_idx],
            )
            mse = np.mean((ta - tb) ** 2, axis=1)
            with np.errstate(divide="ignore"):
                p = 10.0 * np.log10(255.0 * 255.0 / np.maximum(mse, 1e-300))
            ok = ok_dec & (p >= cfg.psnr_threshold_db)
            keep[sh_idx] = ok
            sc[sh_idx] = np.where(
                ok, np.where(np.isinf(p) | (p > 100.0), 1.0, p / 100.0), 0.0
            )

        out = batch.select(["src", "dst"]).filter(pa.array(keep))
        out = out.append_column(
            "stage", pa.array(list(st[keep]), type=pa.string())
        )
        return out.append_column(
            "score", pa.array(sc[keep], type=pa.float64())
        )

    return paired.map_batches(score, batch_format="pyarrow")
