"""Skip-gram with negative sampling (SGNS), from scratch.

The reference pretrains token embeddings with gensim
``Word2Vec(..., sg=1, min_count=1, window=w)`` over the unsupervised
corpus and freezes them as the bi-encoder's token table
(/root/reference/ea/sim/main/methods/neural/encoders/tokens/
skip_gram_BOW.py:23-45 initialize, wired at train_model.py:146-148).
No gensim here, so this module implements the same estimator —
Mikolov et al. 2013's skip-gram objective with k negative samples
drawn from the unigram^(3/4) noise distribution — with exact analytic
gradients and DETERMINISTIC negatives: negative j for pair row i is
indexed into the precomputed noise CDF by a splitmix64 hash of
(center, context, j, seed), so the sample set is a pure function of
the pair — independent of batch boundaries, partitioning, and step —
and distributed partial gradients sum to the driver result exactly.

SUM-form losses/gradients (same contract as neural_train): per-batch
partials add across a distributed pass. Verified against finite
differences in tests/test_word2vec.py.
"""

from __future__ import annotations

import numpy as np

from stack_trace_deduplication_ray.functions import hashing as H


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))


def skipgram_pairs(seqs: list[np.ndarray], window: int) -> tuple[np.ndarray, np.ndarray]:
    """(center, context) id pairs within `window` of each other, both
    directions, per sequence — vectorized per offset (no per-token
    Python loop)."""
    cs, os_ = [], []
    for d in range(1, window + 1):
        for s in seqs:
            if len(s) <= d:
                continue
            a, b = s[:-d], s[d:]
            cs.append(a)
            os_.append(b)
            cs.append(b)
            os_.append(a)
    if not cs:
        return (
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=np.int64),
        )
    return np.concatenate(cs), np.concatenate(os_)


def noise_cdf(counts: np.ndarray) -> np.ndarray:
    """Unigram^(3/4) noise distribution as a cumulative table
    (word2vec's negative-sampling distribution)."""
    p = counts.astype(np.float64) ** 0.75
    t = p.sum()
    if t <= 0:
        p = np.ones_like(p)
        t = p.sum()
    return np.cumsum(p / t)


def draw_negatives(
    centers: np.ndarray,
    contexts: np.ndarray,
    cdf: np.ndarray,
    k: int,
    seed: int,
) -> np.ndarray:
    """(P, k) deterministic negative ids: uniform variates from
    splitmix64(center, context, j, seed) inverted through the noise
    CDF. A negative colliding with the pair's own context is nudged
    to the next vocab id (gensim resamples; the deterministic nudge
    keeps the function batch-independent)."""
    P = len(centers)
    if P == 0:
        return np.empty((0, k), dtype=np.int64)
    base = (
        centers.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        ^ contexts.astype(np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F)
        ^ np.uint64(seed)
    )
    js = np.arange(k, dtype=np.uint64)[None, :]
    hv = H.splitmix64(base[:, None] + js * np.uint64(0xD6E8FEB86659FD93))
    u = (hv >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    neg = np.searchsorted(cdf, u, side="right").astype(np.int64)
    neg = np.minimum(neg, len(cdf) - 1)
    clash = neg == contexts[:, None]
    neg[clash] = (neg[clash] + 1) % len(cdf)
    return neg


def sgns_loss_and_grads(
    centers: np.ndarray,
    contexts: np.ndarray,
    negatives: np.ndarray,
    Vin: np.ndarray,
    Vout: np.ndarray,
) -> tuple[float, np.ndarray, np.ndarray]:
    """SUM SGNS loss over pair rows and dense gradients (dVin,
    dVout). Loss per row = softplus(-u_o.v_c) + sum_k
    softplus(u_nk.v_c)."""
    dVin = np.zeros_like(Vin)
    dVout = np.zeros_like(Vout)
    if len(centers) == 0:
        return 0.0, dVin, dVout
    vc = Vin[centers]          # (P, d)
    uo = Vout[contexts]        # (P, d)
    un = Vout[negatives]       # (P, k, d)

    s_pos = (vc * uo).sum(axis=1)                 # (P,)
    s_neg = np.einsum("pd,pkd->pk", vc, un)       # (P, k)
    # softplus, stable
    loss = float(
        (np.maximum(-s_pos, 0.0) + np.log1p(np.exp(-np.abs(s_pos)))).sum()
        + (np.maximum(s_neg, 0.0) + np.log1p(np.exp(-np.abs(s_neg)))).sum()
    )
    g_pos = (_sigmoid(s_pos) - 1.0)[:, None]      # (P,1)
    g_neg = _sigmoid(s_neg)                       # (P,k)

    dvc = g_pos * uo + np.einsum("pk,pkd->pd", g_neg, un)
    np.add.at(dVin, centers, dvc)
    np.add.at(dVout, contexts, g_pos * vc)
    np.add.at(
        dVout,
        negatives.reshape(-1),
        (g_neg[:, :, None] * vc[:, None, :]).reshape(-1, Vin.shape[1]),
    )
    return loss, dVin, dVout


def init_embeddings(
    vocab_size: int, dim: int, seed: int = 0x5697
) -> tuple[np.ndarray, np.ndarray]:
    """word2vec-style init: input vectors U(-0.5/d, 0.5/d), output
    vectors zero."""
    rng = np.random.default_rng(np.random.PCG64(seed))
    Vin = rng.uniform(-0.5 / dim, 0.5 / dim, (vocab_size, dim))
    Vout = np.zeros((vocab_size, dim))
    return Vin, Vout
