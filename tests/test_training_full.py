"""Full-model BPTT (functions/neural_train.py): the entire gradient
— embeddings, both LSTM directions, head — checked against central
finite differences, plus masking/accumulation invariants and the
end-to-end fine-tune run."""

import numpy as np
import pytest

from stack_trace_deduplication_ray.functions.neural_train import (
    PARAM_NAMES,
    S3MTrainable,
    flatten_params,
    install_params,
    unflatten_params,
)

SF = "/root/testdata/sf0.001"


def _tiny_model():
    return S3MTrainable(vocab_size=12, emb_dim=3, hidden=2, max_len=5, seed=9)


def _tiny_batch(rng, n=4, T=5, vocab=12):
    lens = rng.integers(1, T + 1, n)
    ids = np.zeros((n, T), dtype=np.int64)
    for i in range(n):
        ids[i, : lens[i]] = rng.integers(4, vocab, lens[i])
    return ids, lens


def test_full_gradients_match_finite_differences():
    m = _tiny_model()
    rng = np.random.default_rng(17)
    ids_a, lens_a = _tiny_batch(rng)
    ids_b, lens_b = _tiny_batch(rng)
    y = np.array([1.0, 0.0, 1.0, 0.0])

    loss0, grads = m.loss_and_grads(ids_a, lens_a, ids_b, lens_b, y)
    flat_g = flatten_params(grads)
    flat_p = flatten_params(m.params)
    eps = 1e-6
    # probe a deterministic spread of coordinates across ALL params
    probe = np.linspace(0, len(flat_p) - 1, 60).astype(int)
    for j in probe:
        fp = flat_p.copy()
        fp[j] += eps
        lp, _ = m.loss_and_grads(
            ids_a, lens_a, ids_b, lens_b, y,
            params=unflatten_params(fp, m.params),
        )
        fp[j] -= 2 * eps
        lm, _ = m.loss_and_grads(
            ids_a, lens_a, ids_b, lens_b, y,
            params=unflatten_params(fp, m.params),
        )
        num = (lp - lm) / (2 * eps)
        assert num == pytest.approx(flat_g[j], rel=2e-4, abs=1e-8), j


def test_pad_positions_get_no_gradient():
    """Lengthening a row with PAD must not change loss or gradient
    (pack-padded masking in both passes)."""
    m = _tiny_model()
    rng = np.random.default_rng(3)
    ids_a, lens_a = _tiny_batch(rng)
    ids_b, lens_b = _tiny_batch(rng)
    y = np.array([1.0, 0.0, 1.0, 0.0])
    l1, g1 = m.loss_and_grads(ids_a, lens_a, ids_b, lens_b, y)

    wide_a = np.concatenate([ids_a, np.zeros((4, 3), dtype=np.int64)], axis=1)
    l2, g2 = m.loss_and_grads(wide_a, lens_a, ids_b, lens_b, y)
    assert l2 == pytest.approx(l1, rel=1e-12)
    for k in PARAM_NAMES:
        assert np.allclose(g1[k], g2[k], atol=1e-12), k


def test_shared_anchor_grads_accumulate():
    """grad(batch of 2 pairs sharing a side) == grad(pair1) +
    grad(pair2) — SUM-form loss, exact accumulation."""
    m = _tiny_model()
    rng = np.random.default_rng(5)
    ids, lens = _tiny_batch(rng, n=3)
    a, p, n = ids[:1], ids[1:2], ids[2:3]
    la, lp, ln = lens[:1], lens[1:2], lens[2:3]

    l_both, g_both = m.loss_and_grads(
        np.concatenate([a, a]), np.concatenate([la, la]),
        np.concatenate([p, n]), np.concatenate([lp, ln]),
        np.array([1.0, 0.0]),
    )
    l1, g1 = m.loss_and_grads(a, la, p, lp, np.array([1.0]))
    l2, g2 = m.loss_and_grads(a, la, n, ln, np.array([0.0]))
    assert l_both == pytest.approx(l1 + l2, rel=1e-12)
    for k in PARAM_NAMES:
        assert np.allclose(g_both[k], g1[k] + g2[k], atol=1e-10), k


def test_indexed_equals_pairwise():
    """loss_and_grads_indexed over deduped documents == the pairwise
    form with anchors/negatives repeated — encode-once is exact."""
    from stack_trace_deduplication_ray.functions.neural_train import (
        dedup_sides,
    )

    m = _tiny_model()
    rng = np.random.default_rng(23)
    ids, lens = _tiny_batch(rng, n=3)
    a, p, n = ids[0, : lens[0]], ids[1, : lens[1]], ids[2, : lens[2]]
    # triplet expansion: (a,p,1) and (a,n,0) — anchor recurs
    side_a = [a, a]
    side_b = [p, n]
    y = np.array([1.0, 0.0])

    u_ids, u_lens, ia, ib = dedup_sides(side_a, side_b, m.max_len)
    assert len(u_ids) == 3  # a deduped
    li, gi = m.loss_and_grads_indexed(u_ids, u_lens, ia, ib, y)

    # pairwise form
    from stack_trace_deduplication_ray.functions.neural import pad_id_lists

    pa_ids, pa_lens = pad_id_lists(side_a, m.max_len)
    pb_ids, pb_lens = pad_id_lists(side_b, m.max_len)
    lp, gp = m.loss_and_grads(pa_ids, pa_lens, pb_ids, pb_lens, y)
    assert li == pytest.approx(lp, rel=1e-12)
    for k in PARAM_NAMES:
        assert np.allclose(gi[k], gp[k], atol=1e-12), k


def test_initial_params_match_inference_model():
    """S3MTrainable starts bit-compatible with the deployed seeded
    scorer: identical logits on the same pairs."""
    from stack_trace_deduplication_ray.functions.neural import S3MNumpy

    m = S3MTrainable()
    ref = S3MNumpy()
    texts_a = ["null pointer at Foo.bar", "index out of range baz"]
    texts_b = ["null pointer at Foo.bar qux", "totally different words here"]
    ids_a, lens_a = m.prepare(texts_a)
    ids_b, lens_b = m.prepare(texts_b)
    ours = m.logits(ids_a, lens_a, ids_b, lens_b)
    theirs = ref.score_pairs(texts_a, texts_b)
    assert np.allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_install_params_roundtrip():
    from stack_trace_deduplication_ray.functions.neural import S3MNumpy

    m = _tiny_model()
    tgt = S3MNumpy(vocab_size=12, emb_dim=3, hidden=2, max_len=5, seed=9)
    m.params["W2"] = m.params["W2"] + 1.0
    install_params(tgt, m.params)
    assert np.allclose(tgt.W2, m.params["W2"])
    assert tgt.E[0].sum() == 0.0  # PAD row stays zero


def test_full_finetune_beats_frozen_head(ray_session):
    """End-to-end: fine-tuning the whole encoder reaches at least the
    frozen-head quality on the held-out split and strictly lowers
    train loss."""
    from stack_trace_deduplication_ray.pipelines.training import (
        train_s3m_full,
        train_s3m_head,
    )

    full = train_s3m_full(SF, steps=30, lr=0.01)["metrics"]
    head = train_s3m_head(SF, steps=40, lr=0.05)["metrics"]
    assert full["loss_final"] < full["loss_initial"] / 3
    assert full["val_auc_trained"] >= head["val_auc_trained"] - 0.02
    assert full["val_auc_trained"] > full["val_auc_untrained"] + 0.3


def test_trained_retrieval_beats_untrained(ray_session):
    """Learned scoring end-to-end: the trained model ranks the true
    duplicate first for most held-out anchors; the untrained seeded
    model does not."""
    from stack_trace_deduplication_ray.pipelines.training import (
        trained_retrieval_metrics,
    )

    m = {
        r["metric"]: r["value"]
        for r in trained_retrieval_metrics(SF).to_pylist()
    }
    assert m["n_queries"] >= 20
    assert m["acc1_trained"] >= 0.7
    assert m["acc1_trained"] > m["acc1_untrained"] + 0.5
    assert m["mrr_trained"] > m["mrr_untrained"] + 0.4


def test_full_training_deterministic(ray_session):
    from stack_trace_deduplication_ray.pipelines.training import (
        train_s3m_full,
    )

    a = train_s3m_full(SF, steps=5, lr=0.01)["metrics"]
    b = train_s3m_full(SF, steps=5, lr=0.01)["metrics"]
    for k in a:
        assert a[k] == pytest.approx(b[k], rel=1e-6), k
