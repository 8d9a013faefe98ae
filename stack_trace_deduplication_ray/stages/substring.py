"""Per-partition suffix-array pass for exact repeated-substring dedup.

Two complementary candidate generators cover the repeated-substring
family (SURVEY.md §7.1 step 5):

- ``expand_substring`` (stages/expand.py): winnowed rolling-hash
  fingerprints — global coverage via one groupby shuffle; guarantee:
  any shared run >= L + winnow_window - 1 chars is caught regardless
  of partition placement. The default path.
- THIS module: a real suffix array built per partition over the
  concatenated caption text, reporting doc pairs whose suffixes are
  adjacent in suffix order with a common prefix >= L. Within a
  partition it is exhaustive down to exactly L characters (no
  winnowing slack). PARTITIONING ASSUMPTION: only pairs co-located in
  a partition are found — callers either route suspected groups into
  one partition (e.g. by fingerprint bucket) or accept the winnowing
  pass as the cross-partition safety net.

The suffix array uses prefix-doubling (O(n log n), fully vectorized
numpy — Manber-Myers); adjacency + common-prefix checks are vectorized
gathers. Per-partition text size is memory-budgeted by the caller
(SURVEY.md §7.4 "suffix-array state").
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from stack_trace_deduplication_ray.config import DedupConfig
from stack_trace_deduplication_ray.stages.joins import partitioned_groups


def build_suffix_array(data: np.ndarray) -> np.ndarray:
    """Suffix array of an integer sequence via prefix doubling.

    data: int array (any non-negative alphabet). Returns int64 sa
    with sa[i] = start of the i-th smallest suffix.
    """
    n = len(data)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    rank = np.asarray(data, dtype=np.int64)
    # normalize ranks to 0..n-1
    order = np.argsort(rank, kind="stable")
    r = np.empty(n, dtype=np.int64)
    prev = np.concatenate([[False], rank[order][1:] != rank[order][:-1]])
    r[order] = np.cumsum(prev)
    rank = r
    k = 1
    while k < n:
        key2 = np.full(n, -1, dtype=np.int64)
        key2[: n - k] = rank[k:]
        order = np.lexsort((key2, rank))
        changed = np.concatenate(
            [
                [False],
                (rank[order][1:] != rank[order][:-1])
                | (key2[order][1:] != key2[order][:-1]),
            ]
        )
        r = np.empty(n, dtype=np.int64)
        r[order] = np.cumsum(changed)
        rank = r
        if rank[order[-1]] == n - 1:
            break
        k *= 2
    return order.astype(np.int64)


def _suffix_edges_for_texts(
    ids: np.ndarray, texts: list[str], L: int
) -> tuple[np.ndarray, np.ndarray]:
    """Doc pairs sharing an exact >=L-char substring, via one suffix
    array over the concatenated texts (unique per-doc sentinels stop
    cross-doc runs)."""
    if len(texts) < 2:
        return np.empty(0, dtype=object), np.empty(0, dtype=object)
    enc = [np.frombuffer(t.encode("utf-8"), dtype=np.uint8) for t in texts]
    lens = np.fromiter((len(e) for e in enc), dtype=np.int64, count=len(enc))
    # int32 alphabet: bytes 0..255, sentinels 256+doc_idx (unique -> no
    # match can span a sentinel)
    parts = []
    for i, e in enumerate(enc):
        parts.append(e.astype(np.int32))
        parts.append(np.array([256 + i], dtype=np.int32))
    data = np.concatenate(parts)
    n = len(data)
    starts = np.zeros(len(enc), dtype=np.int64)
    np.cumsum(lens[:-1] + 1, out=starts[1:])
    doc_of = np.searchsorted(starts, np.arange(n), side="right") - 1

    sa = build_suffix_array(data)
    a, b = sa[:-1], sa[1:]
    # common prefix >= L: compare L gathered chars (vectorized)
    max_idx = n - 1
    off = np.arange(L, dtype=np.int64)
    ga = data[np.minimum(a[:, None] + off, max_idx)]
    gb = data[np.minimum(b[:, None] + off, max_idx)]
    in_a = a[:, None] + off <= max_idx
    in_b = b[:, None] + off <= max_idx
    eq = ((ga == gb) & in_a & in_b).all(axis=1)
    # sentinels are unique so any L-run of equality is within-doc text
    da, db = doc_of[a], doc_of[b]
    keep = eq & (da != db)
    if not keep.any():
        return np.empty(0, dtype=object), np.empty(0, dtype=object)
    ia, ib = da[keep], db[keep]
    src = np.minimum(ids[ia], ids[ib])
    dst = np.maximum(ids[ia], ids[ib])
    # unique pairs
    key = np.char.add(np.char.add(src.astype(str), "\x00"), dst.astype(str))
    _, first_idx = np.unique(key, return_index=True)
    return src[first_idx], dst[first_idx]


def suffix_array_substring_edges(sigs, cfg: DedupConfig):
    """Per-partition suffix-array repeated-substring candidate edges.

    Rows are routed by their MINIMIZER — the minimum L-window rolling
    hash of the caption — so two docs sharing a long run land in the
    same partition whenever the run contains both docs' global
    minimizer (the standard minimizer co-location argument; the
    winnowing pass remains the cross-partition guarantee). Each
    partition builds one suffix array over its captions.
    """
    from stack_trace_deduplication_ray.functions import hashing as H

    L = cfg.substring_min_len

    def add_minimizer(batch: pa.Table) -> pa.Table:
        texts = batch.column("caption_norm").to_pylist()
        flat, offs = H.concat_utf8(texts)
        wh = H.window_hashes(flat, L) if len(flat) >= L else np.empty(0, np.uint64)
        mins = np.zeros(len(texts), dtype=np.int64)
        for i in range(len(texts)):
            s, e = offs[i], offs[i + 1]
            if e - s >= L:
                mins[i] = np.int64(wh[s : e - L + 1].min().astype(np.int64))
            else:
                mins[i] = -1  # too short for any L-run: isolated
        return batch.append_column("minimizer", pa.array(mins))

    keyed = sigs.select_columns(["image_id", "caption_norm"]).map_batches(
        add_minimizer, batch_format="pyarrow"
    )

    def emit(part: pd.DataFrame) -> pa.Table:
        part = part[part["minimizer"] != -1]
        ids = part["image_id"].to_numpy()
        texts = part["caption_norm"].tolist()
        src, dst = _suffix_edges_for_texts(ids, texts, L)
        return pa.table(
            {
                "src": pa.array(list(src), type=pa.string()),
                "dst": pa.array(list(dst), type=pa.string()),
                "stage": pa.array(["suffix_array"] * len(src), type=pa.string()),
                "score": pa.array(np.ones(len(src)), type=pa.float64()),
            }
        )

    return partitioned_groups(keyed, "minimizer", emit, cfg)
