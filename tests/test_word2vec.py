"""SGNS pretraining (functions/word2vec.py + pipelines/pretrain.py):
gradient finite-difference check, deterministic batch-independent
negatives, pair generation, and the end-to-end runs including the
distributed==driver gradient contract."""

import numpy as np
import pytest

from stack_trace_deduplication_ray.functions.word2vec import (
    draw_negatives,
    init_embeddings,
    noise_cdf,
    sgns_loss_and_grads,
    skipgram_pairs,
)

SF = "/root/testdata/sf0.001"


def test_sgns_gradients_match_finite_differences():
    rng = np.random.default_rng(3)
    V, d, P, k = 10, 4, 12, 3
    Vin = rng.standard_normal((V, d)) * 0.3
    Vout = rng.standard_normal((V, d)) * 0.3
    c = rng.integers(0, V, P)
    o = rng.integers(0, V, P)
    n = rng.integers(0, V, (P, k))
    _, gi, go = sgns_loss_and_grads(c, o, n, Vin, Vout)
    eps = 1e-6
    for tbl, g in ((Vin, gi), (Vout, go)):
        flat = tbl.reshape(-1)
        fg = g.reshape(-1)
        for j in range(0, flat.size, 7):
            orig = flat[j]
            flat[j] = orig + eps
            lp, _, _ = sgns_loss_and_grads(c, o, n, Vin, Vout)
            flat[j] = orig - eps
            lm, _, _ = sgns_loss_and_grads(c, o, n, Vin, Vout)
            flat[j] = orig
            assert (lp - lm) / (2 * eps) == pytest.approx(
                fg[j], rel=1e-5, abs=1e-9
            )


def test_skipgram_pairs_window():
    c, o = skipgram_pairs([np.array([1, 2, 3, 4])], window=2)
    got = set(zip(c.tolist(), o.tolist()))
    want = {
        (1, 2), (2, 3), (3, 4), (2, 1), (3, 2), (4, 3),
        (1, 3), (2, 4), (3, 1), (4, 2),
    }
    assert got == want


def test_negatives_deterministic_and_batch_independent():
    rng = np.random.default_rng(5)
    c = rng.integers(0, 50, 40)
    o = rng.integers(0, 50, 40)
    cdf = noise_cdf(np.arange(1, 51).astype(float))
    full = draw_negatives(c, o, cdf, 5, 42)
    halves = np.concatenate(
        [
            draw_negatives(c[:17], o[:17], cdf, 5, 42),
            draw_negatives(c[17:], o[17:], cdf, 5, 42),
        ]
    )
    assert np.array_equal(full, halves)
    assert not (full == o[:, None]).any()  # never the true context
    assert np.array_equal(full, draw_negatives(c, o, cdf, 5, 42))


def test_noise_cdf_follows_three_quarter_power():
    counts = np.array([16.0, 1.0, 0.0])
    cdf = noise_cdf(counts)
    p0 = cdf[0]
    # 16^0.75 = 8 vs 1 -> p0 = 8/9
    assert p0 == pytest.approx(8.0 / 9.0)
    assert cdf[-1] == pytest.approx(1.0)


def test_init_embeddings_word2vec_style():
    Vin, Vout = init_embeddings(16, 8, seed=1)
    assert np.abs(Vin).max() <= 0.5 / 8 + 1e-12
    assert (Vout == 0).all()


def test_unigram_counts_complete(ray_session):
    """The in-band sentinel scheme loses no counts: the noise counts
    equal a direct recount of every caption's tokens, and no sentinel
    leaks into the pair view."""
    from stack_trace_deduplication_ray.functions.neural import (
        token_ids_batch,
    )
    from stack_trace_deduplication_ray.pipelines.pretrain import (
        VOCAB,
        skipgram_pair_dataset,
    )
    from stack_trace_deduplication_ray.pipelines.training import (
        _fixture_labeled_captions,
    )

    ds, counts = skipgram_pair_dataset(SF)
    labeled, _ = _fixture_labeled_captions(SF)
    expect = np.zeros(VOCAB, dtype=np.int64)
    for b in labeled.iter_batches(batch_size=4096, batch_format="pyarrow"):
        for s in token_ids_batch(b.column("caption").to_pylist(), VOCAB):
            expect += np.bincount(s, minlength=VOCAB)
    assert np.array_equal(counts, expect)
    for b in ds.iter_batches(batch_size=8192, batch_format="pyarrow"):
        c = b.column("center").to_numpy()
        assert (c >= 0).all()


def test_pretrain_improves_heldout_loss(ray_session):
    from stack_trace_deduplication_ray.pipelines.pretrain import (
        pretrain_skipgram,
    )

    m = pretrain_skipgram(SF)["metrics"]
    assert m["n_pairs"] > 1000
    assert m["loss_final"] < m["loss_initial"] * 0.75
    # held-out pairs with FRESH-seed negatives: real generalization
    assert m["val_loss_trained"] < m["val_loss_untrained"] * 0.75


def test_pretrain_distributed_matches_driver(ray_session):
    """Hash-drawn negatives are batch-independent, so the distributed
    partial-gradient pass reproduces the driver loop exactly."""
    from stack_trace_deduplication_ray.pipelines.pretrain import (
        pretrain_skipgram,
    )

    drv = pretrain_skipgram(SF, steps=4)["metrics"]
    dst = pretrain_skipgram(SF, steps=4, force_distributed=True)["metrics"]
    assert dst["distributed"] == 1.0
    assert dst["loss_final"] == pytest.approx(drv["loss_final"], rel=1e-9)
    assert dst["val_loss_trained"] == pytest.approx(
        drv["val_loss_trained"], rel=1e-9
    )


def test_pretrained_init_flow_runs(ray_session):
    """The pretrain->fine-tune flow is runnable end to end; transfer
    on this corpus is documented neutral-to-negative, so only the
    mechanics are asserted."""
    from stack_trace_deduplication_ray.pipelines.pretrain import (
        pretrained_init_benefit,
    )

    m = {
        r["metric"]: r["value"]
        for r in pretrained_init_benefit(SF, steps=3).to_pylist()
    }
    assert np.isfinite(list(m.values())).all()
    assert m["auc_scratch"] > 0.5
    assert m["auc_pretrained"] > 0.5