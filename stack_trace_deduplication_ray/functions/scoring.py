"""Classic pairwise scoring kernels: Lerch TF-IDF and FaST alignment.

Reference analogs (re-implemented from the published algorithm
descriptions, not ported):

- Lerch: score(a, b) = sum over the token-set intersection of
  idf(t)^2, idf(t) = 1 + ln(N / (df_t + 1))
  (/root/reference/ea/sim/main/methods/neural/cross_encoders/lerch.py:22-52;
  Lerch & Mezini 2013).
- FaST: linear-merge alignment over id-sorted token lists with
  position-decay weights, from the FaST paper
  (irving-muller.github.io/papers/FaST.pdf;
  /root/reference/ea/sim/main/methods/classic/fast.py:39-126).
  A match adds (w(x1) + w(x2)) * exp(-gamma * |pos1 - pos2|), a gap
  subtracts w(x); the sum is normalized by the total weights; weight
  w(x) = pos^-alpha * exp(-beta * df/N).

Both kernels consume the SAME document-frequency fit the engine
already computes (SURVEY.md §2.3 T2-T4) — the DF table finally has
scorer consumers.
"""

from __future__ import annotations

import numpy as np

from stack_trace_deduplication_ray.functions import hashing as H


def idf_lerch(df: np.ndarray, n_docs: int) -> np.ndarray:
    """Lerch IDF: 1 + ln(N / (df + 1)) (vectorized)."""
    return 1.0 + np.log(n_docs / (df.astype(np.float64) + 1.0))


def df_lookup(ids: np.ndarray, keys: np.ndarray, vals: np.ndarray) -> np.ndarray:
    """Vectorized lookup in a (sorted keys, vals) array-pair table —
    the broadcast representation of the DF fit (a dict of boxed ints
    is ~10x the memory and a hashtable probe per row). Missing ids
    map to 0. `ids` and `keys` must share one dtype/sort domain."""
    out = np.zeros(len(ids), dtype=np.float64)
    if len(keys) == 0 or len(ids) == 0:
        return out
    pos = np.searchsorted(keys, ids)
    pos = np.minimum(pos, len(keys) - 1)
    hit = keys[pos] == ids
    out[hit] = vals[pos[hit]]
    return out


def token_hash_sets(texts: list[str]) -> list[np.ndarray]:
    """Per-doc sorted unique word-token hash arrays (stateless 64-bit
    hashing replaces the reference's mutable vocab)."""
    out = []
    for t in texts:
        toks = t.split(" ")
        h = H.hash_bytes_arrays(toks) if toks else np.empty(0, dtype=np.uint64)
        out.append(np.unique(h))
    return out


def lerch_score(
    set_a: np.ndarray, set_b: np.ndarray, idf_of: dict[int, float]
) -> float:
    """Sigma idf(t)^2 over the intersection of two sorted unique
    token-hash arrays."""
    inter = np.intersect1d(set_a, set_b, assume_unique=True)
    return float(sum(idf_of[int(t)] ** 2 for t in inter))


def fast_token_views(
    text: str,
    df_of: "dict[int, int] | tuple[np.ndarray, np.ndarray]",
    n_docs: int,
    alpha: float = 1.0, beta: float = 1.0,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Tokenize one document for FaST alignment.

    Tokens are REVERSED (the reference scores deepest frame first),
    positions assigned 1..n over the reversed stream, then sorted by
    token id (stable, so duplicate tokens keep reversed-position
    order). Returns (ids, pos, weights) with
    weight = pos^-alpha * exp(-beta * df/N).

    `df_of` is either a {token_hash: df} dict or the broadcast
    (sorted uint64 keys, int64 counts) array pair from the DF fit
    (vectorized searchsorted lookup — the hot path).
    """
    toks = text.split(" ")[::-1]
    if not toks:
        z = np.empty(0, dtype=np.uint64)
        return z, np.empty(0, np.int64), np.empty(0, np.float64)
    ids = H.hash_bytes_arrays(toks)
    pos = np.arange(1, len(toks) + 1, dtype=np.int64)
    order = np.argsort(ids, kind="stable")
    ids, pos = ids[order], pos[order]
    if isinstance(df_of, tuple):
        df = df_lookup(ids, df_of[0], df_of[1])
    else:
        df = np.fromiter(
            (df_of.get(int(i), 0) for i in ids),
            dtype=np.float64, count=len(ids),
        )
    w = pos.astype(np.float64) ** (-alpha) * np.exp(-beta * df / n_docs)
    return ids, pos, w


def fast_align(
    ids_a: np.ndarray, pos_a: np.ndarray, w_a: np.ndarray,
    ids_b: np.ndarray, pos_b: np.ndarray, w_b: np.ndarray,
    gamma: float = 1.0,
) -> float:
    """FaST alignment score for one pair (linear merge over id-sorted
    lists; candidate pairs only — the corpus never sees this loop)."""
    i = j = 0
    na, nb = len(ids_a), len(ids_b)
    if na == 0 and nb == 0:
        return 1.0
    sim = 0.0
    while i < na and j < nb:
        if ids_a[i] == ids_b[j]:
            diff = np.exp(-gamma * abs(int(pos_a[i]) - int(pos_b[j])))
            sim += (w_a[i] + w_b[j]) * diff
            i += 1
            j += 1
        elif ids_a[i] < ids_b[j]:
            sim -= w_a[i]
            i += 1
        else:
            sim -= w_b[j]
            j += 1
    sim -= w_a[i:].sum() + w_b[j:].sum()
    norm = w_a.sum() + w_b.sum()
    if norm == 0:
        return 1.0
    return float(sim / norm)
