"""Bi-encoder InfoNCE training (BiEncoderTrainable): NT-Xent
gradient finite-difference check (through the cosine matrix,
normalization, pooling and BPTT), objective sanity, and the
end-to-end run."""

import numpy as np
import pytest

from stack_trace_deduplication_ray.functions.neural_train import (
    BiEncoderTrainable,
    bi_flatten,
    bi_unflatten,
)

SF = "/root/testdata/sf0.001"


def _tiny():
    return BiEncoderTrainable(
        vocab_size=12, d_input=3, hidden=2, out_size=3, n_ctx=5, seed=8
    )


def _tiny_batch(rng, n=4, T=5, vocab=12):
    lens = rng.integers(1, T + 1, n)
    ids = np.zeros((n, T), dtype=np.int64)
    for i in range(n):
        ids[i, : lens[i]] = rng.integers(4, vocab, lens[i])
    return ids, lens


def test_bi_gradients_match_finite_differences():
    m = _tiny()
    rng = np.random.default_rng(41)
    ids_a, lens_a = _tiny_batch(rng)
    ids_b, lens_b = _tiny_batch(rng)
    _, g = m.loss_and_grads(ids_a, lens_a, ids_b, lens_b)
    fg = bi_flatten(g)
    fp = bi_flatten(m.params)
    eps = 1e-6
    probe = np.linspace(0, len(fp) - 1, 80).astype(int)
    for j in probe:
        q = fp.copy()
        q[j] += eps
        lp, _ = m.loss_and_grads(
            ids_a, lens_a, ids_b, lens_b, params=bi_unflatten(q, m.params)
        )
        q[j] -= 2 * eps
        lm, _ = m.loss_and_grads(
            ids_a, lens_a, ids_b, lens_b, params=bi_unflatten(q, m.params)
        )
        assert (lp - lm) / (2 * eps) == pytest.approx(
            fg[j], rel=3e-4, abs=1e-8
        ), j


def test_bi_loss_prefers_aligned_pairs():
    """The NT-Xent loss is lower when each anchor's pair partner IS
    its own text (cosine 1 with itself beats every negative)."""
    m = _tiny()
    rng = np.random.default_rng(9)
    ids, lens = _tiny_batch(rng, n=4)
    aligned, _ = m.loss_and_grads(ids, lens, ids.copy(), lens.copy())
    other, other_l = _tiny_batch(rng, n=4)
    shuffled, _ = m.loss_and_grads(ids, lens, other, other_l)
    assert aligned < shuffled


def test_bi_embed_normalized():
    m = _tiny()
    rng = np.random.default_rng(11)
    ids, lens = _tiny_batch(rng, n=6)
    z = m.embed(ids, lens)
    assert np.allclose(np.linalg.norm(z, axis=1), 1.0, atol=1e-9)


def test_bi_training_improves_heldout(ray_session):
    from stack_trace_deduplication_ray.pipelines.training import (
        train_bi_encoder,
    )

    m = train_bi_encoder(SF, steps=15, lr=0.02)["metrics"]
    assert m["loss_final"] < m["loss_initial"]
    assert m["val_auc_trained"] >= 0.95
    assert m["val_auc_trained"] > m["val_auc_untrained"]
    assert m["val_margin_trained"] > m["val_margin_untrained"] + 0.2


def test_trained_embeddings_improve_nn_retrieval(ray_session):
    """Indexing payoff: 1-NN same-cluster accuracy over corpus
    embeddings rises after training."""
    from stack_trace_deduplication_ray.pipelines.training import (
        trained_embedding_ann,
    )

    m = {
        r["metric"]: r["value"]
        for r in trained_embedding_ann(SF).to_pylist()
    }
    assert m["n_queries"] >= 20
    assert m["nn_acc_trained"] >= 0.85
    assert m["nn_acc_trained"] > m["nn_acc_untrained"]


def test_bi_distributed_single_batch_matches_driver(ray_session):
    """With everything in one batch the distributed in-batch-negative
    objective IS the driver objective."""
    from stack_trace_deduplication_ray.pipelines.training import (
        train_bi_encoder,
    )

    drv = train_bi_encoder(SF, steps=3, lr=0.02)["metrics"]
    dst = train_bi_encoder(SF, steps=3, lr=0.02, force_distributed=True)[
        "metrics"
    ]
    assert dst["distributed"] == 1.0
    # sf0.001 train split (~300 pairs) fits one 1024-row grad batch
    assert dst["loss_final"] == pytest.approx(drv["loss_final"], rel=1e-6)


def test_gru_gradients_match_finite_differences():
    """The GRU cell's hand-derived BPTT (reset/update gates, r-gated
    candidate) against central finite differences."""
    from stack_trace_deduplication_ray.functions.neural_train import (
        bi_flatten,
        bi_unflatten,
    )

    m = BiEncoderTrainable(
        vocab_size=12, d_input=3, hidden=2, out_size=3, n_ctx=5, seed=8,
        rnn_type="gru",
    )
    rng = np.random.default_rng(51)

    def tb(n=4, T=5, vocab=12):
        lens = rng.integers(1, T + 1, n)
        ids = np.zeros((n, T), dtype=np.int64)
        for i in range(n):
            ids[i, : lens[i]] = rng.integers(4, vocab, lens[i])
        return ids, lens

    ids_a, lens_a = tb()
    ids_b, lens_b = tb()
    _, g = m.loss_and_grads(ids_a, lens_a, ids_b, lens_b)
    fg = bi_flatten(g)
    fp = bi_flatten(m.params)
    eps = 1e-6
    for j in np.linspace(0, len(fp) - 1, 60).astype(int):
        q = fp.copy()
        q[j] += eps
        lp, _ = m.loss_and_grads(
            ids_a, lens_a, ids_b, lens_b, params=bi_unflatten(q, m.params)
        )
        q[j] -= 2 * eps
        lm, _ = m.loss_and_grads(
            ids_a, lens_a, ids_b, lens_b, params=bi_unflatten(q, m.params)
        )
        assert (lp - lm) / (2 * eps) == pytest.approx(
            fg[j], rel=3e-4, abs=1e-8
        ), j
    # pad invariance for the GRU masking
    wide = np.concatenate([ids_a, np.zeros((4, 3), dtype=np.int64)], axis=1)
    l1, g1 = m.loss_and_grads(ids_a, lens_a, ids_b, lens_b)
    l2, g2 = m.loss_and_grads(wide, lens_a, ids_b, lens_b)
    assert l1 == pytest.approx(l2, rel=1e-12)
    for k in g1:
        assert np.allclose(g1[k], g2[k], atol=1e-12), k


def test_gru_bi_encoder_trains(ray_session):
    from stack_trace_deduplication_ray.pipelines.training import (
        train_bi_encoder,
    )

    m = train_bi_encoder(SF, steps=10, lr=0.02, rnn_type="gru")["metrics"]
    assert m["loss_final"] < m["loss_initial"]
    assert m["val_auc_trained"] > m["val_auc_untrained"]
    assert m["val_auc_trained"] >= 0.9
