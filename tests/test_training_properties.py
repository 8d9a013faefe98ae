"""Hypothesis property tests for the from-scratch trainers' pure
functions: invariants that must hold over arbitrary shapes/inputs,
complementing the fixed-seed finite-difference checks. All pure
numpy — no Ray session needed."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from stack_trace_deduplication_ray.functions.neural import (
    head_logits,
    head_loss_and_grads,
)
from stack_trace_deduplication_ray.functions.neural_train import (
    S3MTrainable,
    dedup_sides,
)
from stack_trace_deduplication_ray.functions.word2vec import (
    draw_negatives,
    noise_cdf,
    sgns_loss_and_grads,
    skipgram_pairs,
)


def _rng(seed):
    return np.random.default_rng(seed)


@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    n=st.integers(1, 24),
    d=st.integers(1, 8),
    h=st.integers(1, 6),
)
def test_head_loss_grads_split_additivity(seed, n, d, h):
    """SUM-form contract: loss/grads over a batch equal the sum over
    any 2-way split — the exactness the distributed harness relies
    on."""
    rng = _rng(seed)
    params = (
        rng.standard_normal((d, h)),
        rng.standard_normal(h),
        rng.standard_normal((h, 1)),
        rng.standard_normal(1),
    )
    x = rng.standard_normal((n, d))
    y = (rng.random(n) < 0.5).astype(np.float64)
    cut = n // 2
    l_all, g_all = head_loss_and_grads(x, y, params)
    l_a, g_a = head_loss_and_grads(x[:cut], y[:cut], params)
    l_b, g_b = head_loss_and_grads(x[cut:], y[cut:], params)
    assert np.isclose(l_all, l_a + l_b, rtol=1e-10, atol=1e-12)
    for ga, gb, g in zip(g_a, g_b, g_all):
        assert np.allclose(ga + gb, g, rtol=1e-9, atol=1e-12)


@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    n=st.integers(1, 16),
    d=st.integers(1, 6),
    h=st.integers(1, 5),
)
def test_head_loss_nonnegative_and_logit_finite(seed, n, d, h):
    rng = _rng(seed)
    params = (
        rng.standard_normal((d, h)) * 2,
        rng.standard_normal(h),
        rng.standard_normal((h, 1)) * 2,
        rng.standard_normal(1),
    )
    x = rng.standard_normal((n, d)) * 5
    y = (rng.random(n) < 0.5).astype(np.float64)
    loss, grads = head_loss_and_grads(x, y, params)
    assert loss >= 0.0
    assert np.isfinite(loss)
    assert np.isfinite(head_logits(x, params)).all()
    for g in grads:
        assert np.isfinite(g).all()


@settings(max_examples=20, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    n_pairs=st.integers(1, 10),
    vocab=st.integers(6, 16),
)
def test_s3m_pad_invariance_random_shapes(seed, n_pairs, vocab):
    """Widening the padded matrix never changes loss or gradients,
    for arbitrary batch shapes (pack-padded masking, both passes)."""
    rng = _rng(seed)
    m = S3MTrainable(vocab_size=vocab, emb_dim=3, hidden=2, max_len=6, seed=5)
    T = 4

    def side():
        lens = rng.integers(1, T + 1, n_pairs)
        ids = np.zeros((n_pairs, T), dtype=np.int64)
        for i in range(n_pairs):
            ids[i, : lens[i]] = rng.integers(4, vocab, lens[i])
        return ids, lens

    ia, la = side()
    ib, lb = side()
    y = (rng.random(n_pairs) < 0.5).astype(np.float64)
    l1, g1 = m.loss_and_grads(ia, la, ib, lb, y)
    wide = np.concatenate(
        [ia, np.zeros((n_pairs, 3), dtype=np.int64)], axis=1
    )
    l2, g2 = m.loss_and_grads(wide, la, ib, lb, y)
    assert np.isclose(l1, l2, rtol=1e-12)
    for k in g1:
        assert np.allclose(g1[k], g2[k], atol=1e-12), k


@settings(max_examples=30, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    n_seqs=st.integers(0, 6),
    window=st.integers(1, 4),
)
def test_skipgram_pair_symmetry_and_distance(seed, n_seqs, window):
    """Every emitted pair appears in both directions and spans at
    most `window` positions."""
    rng = _rng(seed)
    seqs = [
        rng.integers(4, 50, rng.integers(1, 10)).astype(np.int64)
        for _ in range(n_seqs)
    ]
    c, o = skipgram_pairs(seqs, window)
    pairs = set(zip(c.tolist(), o.tolist()))
    for a, b in pairs:
        assert (b, a) in pairs
    # count check: per sequence, sum over d<=window of 2*max(len-d,0)
    want = sum(
        2 * max(len(s) - d, 0)
        for s in seqs
        for d in range(1, window + 1)
    )
    assert len(c) == want


@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    vocab=st.integers(3, 40),
    n=st.integers(1, 30),
    k=st.integers(1, 6),
)
def test_negatives_in_range_and_never_context(seed, vocab, n, k):
    rng = _rng(seed)
    c = rng.integers(0, vocab, n)
    o = rng.integers(0, vocab, n)
    cdf = noise_cdf(rng.integers(0, 20, vocab).astype(float))
    neg = draw_negatives(c, o, cdf, k, seed)
    assert neg.shape == (n, k)
    assert (neg >= 0).all() and (neg < vocab).all()
    assert not (neg == o[:, None]).any()


@settings(max_examples=20, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    vocab=st.integers(4, 20),
    d=st.integers(1, 6),
    n=st.integers(1, 12),
    k=st.integers(1, 4),
)
def test_sgns_split_additivity(seed, vocab, d, n, k):
    """SGNS SUM-form: loss/grads over a pair batch equal the sum over
    any split (given the same per-pair negatives — which the hash
    draw guarantees)."""
    rng = _rng(seed)
    Vin = rng.standard_normal((vocab, d)) * 0.5
    Vout = rng.standard_normal((vocab, d)) * 0.5
    c = rng.integers(0, vocab, n)
    o = rng.integers(0, vocab, n)
    neg = rng.integers(0, vocab, (n, k))
    cut = n // 2
    l_all, gi, go = sgns_loss_and_grads(c, o, neg, Vin, Vout)
    l_a, gia, goa = sgns_loss_and_grads(c[:cut], o[:cut], neg[:cut], Vin, Vout)
    l_b, gib, gob = sgns_loss_and_grads(c[cut:], o[cut:], neg[cut:], Vin, Vout)
    assert np.isclose(l_all, l_a + l_b, rtol=1e-10, atol=1e-12)
    assert np.allclose(gia + gib, gi, rtol=1e-9, atol=1e-12)
    assert np.allclose(goa + gob, go, rtol=1e-9, atol=1e-12)


@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    n=st.integers(1, 20),
)
def test_dedup_sides_reconstructs_pairs(seed, n):
    """dedup_sides is a pure reindexing: gathering the unique rows by
    (ia, ib) reproduces the original sides."""
    rng = _rng(seed)
    pool = [
        rng.integers(4, 30, rng.integers(1, 8)).astype(np.int64)
        for _ in range(5)
    ]
    side_a = [pool[rng.integers(0, len(pool))] for _ in range(n)]
    side_b = [pool[rng.integers(0, len(pool))] for _ in range(n)]
    ids, lens, ia, ib = dedup_sides(side_a, side_b, max_len=8)
    assert len(ids) <= len(side_a) + len(side_b)
    for i in range(n):
        assert np.array_equal(ids[ia[i], : lens[ia[i]]], side_a[i])
        assert np.array_equal(ids[ib[i], : lens[ib[i]]], side_b[i])
