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


def expand_exact(sigs_ds):
    def fn(batch: pa.Table) -> pa.Table:
        b = batch.column("exact_hash").to_numpy(zero_copy_only=False).view(U64)
        return _expand_table(H.ids_np(batch.column("image_id").combine_chunks()), b[:, None])

    return sigs_ds.select_columns(["image_id", "exact_hash"]).map_batches(
        fn, batch_format="pyarrow"
    )


def expand_minhash(sigs_ds, cfg: DedupConfig):
    def fn(batch: pa.Table) -> pa.Table:
        band_col = batch.column("bands")
        flat = band_col.combine_chunks().flatten().to_numpy(
            zero_copy_only=False
        )
        n = len(batch)
        keys = flat.reshape(n, cfg.bands).view(U64)
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
    apply the Hamming(<=radius) test in-group (no attachment join)."""

    def fn(batch: pa.Table) -> pa.Table:
        sh = batch.column("simhash").to_numpy(zero_copy_only=False).view(U64)
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
    out_fps: list[np.ndarray] = []
    counts = np.zeros(n, dtype=np.int64)
    wh_all = H.window_hashes(flat, L) if len(flat) >= L else np.empty(0, dtype=U64)
    for i in range(n):  # per-row slicing; inner ops vectorized
        s, e = offs[i], offs[i + 1]
        if e - s < L:
            counts[i] = 0
            continue
        wh = wh_all[s : e - L + 1]
        if len(wh) <= window:
            fps = np.array([wh.min()], dtype=U64)
        else:
            sw = np.lib.stride_tricks.sliding_window_view(wh, window)
            fps = np.unique(sw.min(axis=1))
        out_fps.append(fps)
        counts[i] = len(fps)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    fp = (
        np.concatenate(out_fps) if out_fps else np.empty(0, dtype=U64)
    )
    return fp, offsets


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
