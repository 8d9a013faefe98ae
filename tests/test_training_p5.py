"""P5 reranker training (LSTMCrossEncoderTrainable): full-gradient
finite-difference check including the pooling (max/avg) and
`same_item` cross-feature paths, init parity with the inference
model, and the end-to-end training run."""

import numpy as np
import pytest

from stack_trace_deduplication_ray.functions.neural_train import (
    LSTMCrossEncoderTrainable,
    P5_PARAM_NAMES,
    p5_flatten,
    p5_install_params,
    p5_unflatten,
)

SF = "/root/testdata/sf0.001"


def _tiny():
    return LSTMCrossEncoderTrainable(
        vocab_size=12, d_input=3, hidden=2, out_size=3, n_ctx=5, seed=4
    )


def _tiny_side(rng, n=4, T=5, vocab=12):
    lens = rng.integers(1, T + 1, n)
    ids = np.zeros((n, T), dtype=np.int64)
    for i in range(n):
        ids[i, : lens[i]] = rng.integers(4, vocab, lens[i])
    flags = (rng.random((n, T)) < 0.4) * (
        np.arange(T)[None, :] < lens[:, None]
    ).astype(float)
    return ids, lens, flags


def test_p5_gradients_match_finite_differences():
    m = _tiny()
    rng = np.random.default_rng(31)
    ids_a, lens_a, fa = _tiny_side(rng)
    ids_b, lens_b, fb = _tiny_side(rng)
    y = np.array([1.0, 0.0, 1.0, 0.0])

    _, g = m.loss_and_grads(ids_a, lens_a, fa, ids_b, lens_b, fb, y)
    fg = p5_flatten(g)
    fp = p5_flatten(m.params)
    eps = 1e-6
    probe = np.linspace(0, len(fp) - 1, 80).astype(int)
    for j in probe:
        q = fp.copy()
        q[j] += eps
        lp, _ = m.loss_and_grads(
            ids_a, lens_a, fa, ids_b, lens_b, fb, y,
            params=p5_unflatten(q, m.params),
        )
        q[j] -= 2 * eps
        lm, _ = m.loss_and_grads(
            ids_a, lens_a, fa, ids_b, lens_b, fb, y,
            params=p5_unflatten(q, m.params),
        )
        num = (lp - lm) / (2 * eps)
        assert num == pytest.approx(fg[j], rel=3e-4, abs=1e-8), j


def test_p5_same_item_vector_gets_gradient():
    """Flagged positions must route gradient into `siv`; an all-zero
    flag batch must not."""
    m = _tiny()
    rng = np.random.default_rng(7)
    ids_a, lens_a, fa = _tiny_side(rng)
    ids_b, lens_b, fb = _tiny_side(rng)
    y = np.array([1.0, 0.0, 1.0, 0.0])
    _, g_flagged = m.loss_and_grads(ids_a, lens_a, fa, ids_b, lens_b, fb, y)
    _, g_zero = m.loss_and_grads(
        ids_a, lens_a, np.zeros_like(fa), ids_b, lens_b, np.zeros_like(fb), y
    )
    assert np.abs(g_flagged["siv"]).sum() > 0
    assert np.abs(g_zero["siv"]).sum() == 0.0


def test_p5_init_matches_inference_model():
    from stack_trace_deduplication_ray.functions.neural import (
        LSTMCrossEncoderNumpy,
    )

    m = LSTMCrossEncoderTrainable()
    ref = LSTMCrossEncoderNumpy()
    ta = ["null pointer at Foo.bar", "index out of range baz qux"]
    tb = ["null pointer at Foo.bar extra", "different words entirely here"]
    A, B = m.prepare_pairs(ta, tb)
    assert np.allclose(
        m.logits(*A, *B), ref.score_pairs(ta, tb), rtol=1e-4, atol=1e-5
    )


def test_p5_install_params_roundtrip():
    from stack_trace_deduplication_ray.functions.neural import (
        LSTMCrossEncoderNumpy,
    )

    m = _tiny()
    tgt = LSTMCrossEncoderNumpy(
        vocab_size=12, d_input=3, hidden=2, out_size=3, n_ctx=5, seed=4
    )
    m.params["siv"] = m.params["siv"] + 1.0
    p5_install_params(tgt, m.params)
    assert np.allclose(tgt.same_item_vec, m.params["siv"])
    assert tgt.E[0].sum() == 0.0


def test_p5_training_improves_heldout(ray_session):
    from stack_trace_deduplication_ray.pipelines.training import (
        train_rerank_encoder,
    )

    m = train_rerank_encoder(SF, steps=15, lr=0.02)["metrics"]
    assert m["loss_final"] < m["loss_initial"] / 4
    assert m["val_auc_trained"] >= 0.95
    assert m["val_auc_trained"] > m["val_auc_untrained"] + 0.25
    assert m["val_loss_trained"] < m["val_loss_untrained"]


def test_p5_distributed_matches_driver(ray_session):
    from stack_trace_deduplication_ray.pipelines.training import (
        train_rerank_encoder,
    )

    drv = train_rerank_encoder(SF, steps=4, lr=0.02)["metrics"]
    dst = train_rerank_encoder(SF, steps=4, lr=0.02, force_distributed=True)[
        "metrics"
    ]
    assert dst["distributed"] == 1.0
    assert dst["loss_final"] == pytest.approx(drv["loss_final"], rel=1e-6)


def test_trained_p5_rerank_beats_untrained(ray_session):
    """The trained reranker in the serving actor pool ranks the true
    duplicate first for most held-out anchors."""
    from stack_trace_deduplication_ray.pipelines.training import (
        trained_rerank_metrics,
    )

    m = {
        r["metric"]: r["value"]
        for r in trained_rerank_metrics(SF).to_pylist()
    }
    assert m["n_queries"] >= 20
    assert m["acc1_trained"] >= 0.8
    assert m["acc1_trained"] > m["acc1_untrained"] + 0.4
    assert m["mrr_trained"] > m["mrr_untrained"] + 0.3
