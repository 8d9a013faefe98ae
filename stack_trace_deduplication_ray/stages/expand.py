"""Bucket-key expansion stages: signatures -> (bucket, image_id) rows.

Each near-dup family contributes one expansion; all feed the shared
``pairs_from_buckets`` candidate generator (stages/candidates.py).

- exact:    bucket = exact_hash                       (SURVEY §2.6 E1)
- minhash:  bucket = each of `bands` LSH band keys    (SURVEY §7.1 step 3)
- simhash:  bucket = each of `chunks` Hamming chunk keys (§7.1 step 4)
- substring: bucket = winnowed rolling-hash fingerprints of L-char
  caption windows (§7.1 step 5 — the scalable distributed form of the
  suffix-array repeated-substring pass; within-partition suffix
  arrays live in stages/substring.py)

DRIFT GUARD: pipelines/delta._family_extractors re-derives these key
incidences for the incremental touch filter and must stay
bit-identical — mirror any key-scheme change there (the full==delta
equality tests in tests/test_delta.py fail on divergence).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from stack_trace_deduplication_ray.config import DedupConfig
from stack_trace_deduplication_ray.functions import hashing as H

U64 = np.uint64


def _id_type(ids: np.ndarray) -> pa.DataType:
    return pa.int64() if ids.dtype.kind in "iu" else pa.string()


def _expand_table(ids: np.ndarray, buckets_2d: np.ndarray) -> pa.Table:
    """ids[n] x buckets_2d[n, k] -> flat (bucket, image_id) table."""
    n, k = buckets_2d.shape
    return pa.table(
        {
            # int64 bit-cast: shuffle keys must stay in int64 range
            "bucket": pa.array(buckets_2d.reshape(-1).view(np.int64)),
            "image_id": pa.array(np.repeat(ids, k), type=_id_type(ids)),
        }
    )


def expand_minhash(sigs_ds, cfg: DedupConfig):
    def fn(batch: pa.Table) -> pa.Table:
        keys = H.fixed_from_binary(
            batch.column("bands"), cfg.bands * 8
        ).view(U64)
        # rows with no shingles carry all-MAX signatures (identical
        # band keys); drop them so empty captions never collide
        nonempty = (
            batch.column("n_shingles").to_numpy(zero_copy_only=False) > 0
        )
        ids = H.ids_np(batch.column("image_id").combine_chunks())
        return _expand_table(ids[nonempty], keys[nonempty])

    return sigs_ds.select_columns(
        ["image_id", "bands", "n_shingles"]
    ).map_batches(fn, batch_format="pyarrow")


def expand_simhash(sigs_ds, cfg: DedupConfig):
    """Expansion carries the simhash payload so the bucket emitter can
    apply the Hamming(<=radius) test in-group (no attachment join).

    Key scheme per cfg.simhash_mode: exact chunk keys below the
    birthday-saturation knee, combination keys (wide space) above it;
    "auto" is resolved by the caller (pipelines/dedup.build_edges) from
    the corpus row count and falls back to chunks here."""

    def fn(batch: pa.Table) -> pa.Table:
        sh = batch.column("simhash").to_numpy(zero_copy_only=False).view(U64)
        if cfg.simhash_mode == "combo":
            keys = H.simhash_combo_keys(
                sh, cfg.simhash_combo_sub, cfg.simhash_combo_r
            )
        else:
            keys = H.simhash_chunk_keys(sh, cfg.simhash_chunks)
        n, k = keys.shape
        ids = H.ids_np(batch.column("image_id").combine_chunks())
        return pa.table(
            {
                "bucket": pa.array(keys.reshape(-1).view(np.int64)),
                "image_id": pa.array(np.repeat(ids, k), type=_id_type(ids)),
                "simhash": pa.array(
                    np.repeat(sh.view(np.int64), k)
                ),
            }
        )

    return sigs_ds.select_columns(["image_id", "simhash"]).map_batches(
        fn, batch_format="pyarrow"
    )


def winnow_fingerprints(
    norm_captions: list[str], L: int, window: int
) -> tuple[np.ndarray, np.ndarray]:
    """Winnowed fingerprints of all L-char windows per caption.

    Standard winnowing (Schleimer/Wilkerson/Aiken, SIGMOD'03): over the
    rolling-hash sequence of L-grams, keep the minimum of each
    `window`-length run. Guarantee: two strings sharing a substring of
    length >= L + window - 1 share >= 1 fingerprint.

    Returns (fingerprints, offsets) segmented per row.
    """
    flat, offs = H.concat_utf8(norm_captions)
    n = len(offs) - 1
    lens = np.diff(offs)
    wh_all = H.window_hashes(flat, L) if len(flat) >= L else np.empty(0, dtype=U64)
    # Fully vectorized across the batch (the per-row loop here was the
    # single most expensive map of the flagship at 500k rows: 93 s ->
    # sub-second). Pack every row's L-gram hash run into one array,
    # take ONE global sliding-window min, and keep only windows that
    # lie fully inside a row.
    h = np.maximum(lens - L + 1, 0)  # L-gram hashes per row
    total = int(h.sum())
    empty_offsets = np.zeros(n + 1, dtype=np.int64)
    if total == 0:
        return np.empty(0, dtype=U64), empty_offsets
    rows_with = np.nonzero(h > 0)[0]
    c = h[rows_with]
    seg_end = np.cumsum(c)
    seg_start = seg_end - c
    ar = np.arange(total, dtype=np.int64) - np.repeat(seg_start, c)
    gather = np.repeat(offs[rows_with], c) + ar
    seq = wh_all[gather]  # packed per-row hash runs, row-contiguous
    row_of = np.repeat(rows_with, c)

    if total >= window:
        wmin = np.lib.stride_tricks.sliding_window_view(seq, window).min(axis=1)
        wrow = row_of[: total - window + 1]
        keep = row_of[window - 1 :] == wrow  # window start/end in same row
        mins = wmin[keep]
        mrows = wrow[keep]
    else:
        mins = np.empty(0, dtype=U64)
        mrows = np.empty(0, dtype=np.int64)
    # rows with fewer than `window` hashes keep one fingerprint: the
    # min of the whole run (same semantics as the per-row version)
    seg_min = np.minimum.reduceat(seq, seg_start)
    short = c < window
    if short.any():
        mins = np.concatenate([mins, seg_min[short]])
        mrows = np.concatenate([mrows, rows_with[short]])

    # per-row unique, ascending within each row (== np.unique per row)
    order = np.lexsort((mins, mrows))
    mr = mrows[order]
    mv = mins[order]
    first = np.ones(len(mv), dtype=bool)
    first[1:] = (mr[1:] != mr[:-1]) | (mv[1:] != mv[:-1])
    mr = mr[first]
    mv = mv[first]
    counts = np.bincount(mr, minlength=n)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    return mv.astype(U64), offsets


def expand_substring(sigs_ds, cfg: DedupConfig):
    def fn(batch: pa.Table) -> pa.Table:
        caps = batch.column("caption_norm").to_pylist()
        fp, offs = winnow_fingerprints(caps, cfg.substring_min_len, cfg.winnow_window)
        ids = H.ids_np(batch.column("image_id").combine_chunks())
        counts = np.diff(offs)
        return pa.table(
            {
                "bucket": pa.array(fp.view(np.int64)),
                "image_id": pa.array(np.repeat(ids, counts), type=_id_type(ids)),
            }
        )

    return sigs_ds.select_columns(["image_id", "caption_norm"]).map_batches(
        fn, batch_format="pyarrow"
    )
