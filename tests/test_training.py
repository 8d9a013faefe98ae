"""From-scratch head training (pipelines/training.py): analytic
gradients vs finite differences, distributed == driver gradient
equality, and the train_model.py-shaped end-to-end run — frozen
seeded encoder, BCE-with-logits triplet objective
(reference reranker_losses.py:46-54), held-out separation as the
quality gate."""

import numpy as np
import pytest

from stack_trace_deduplication_ray.functions.neural import (
    AdamState,
    head_logits,
    head_loss_and_grads,
)

SF = "/root/testdata/sf0.001"


def _tiny_params(rng, d, h):
    return (
        rng.standard_normal((d, h)) * 0.3,
        rng.standard_normal(h) * 0.1,
        rng.standard_normal((h, 1)) * 0.3,
        rng.standard_normal(1) * 0.1,
    )


def test_head_grads_match_finite_differences():
    rng = np.random.default_rng(11)
    d, h, n = 9, 5, 20
    params = _tiny_params(rng, d, h)
    feats = rng.standard_normal((n, d))
    y = (rng.random(n) < 0.5).astype(np.float64)
    loss0, grads = head_loss_and_grads(feats, y, params)
    eps = 1e-6
    for pi, (p, g) in enumerate(zip(params, grads)):
        flat_p = np.asarray(p, dtype=np.float64).reshape(-1)
        flat_g = g.reshape(-1)
        # probe a spread of coordinates, not just the first few
        for j in range(0, len(flat_p), max(1, len(flat_p) // 7)):
            bumped = [np.array(q, dtype=np.float64) for q in params]
            bumped[pi].reshape(-1)[j] += eps
            lp, _ = head_loss_and_grads(feats, y, bumped)
            bumped[pi].reshape(-1)[j] -= 2 * eps
            lm, _ = head_loss_and_grads(feats, y, bumped)
            num = (lp - lm) / (2 * eps)
            assert num == pytest.approx(flat_g[j], rel=1e-5, abs=1e-7)


def test_loss_is_bce_with_logits():
    """Hand-check the stable-form loss against the textbook form on
    safe logits."""
    rng = np.random.default_rng(3)
    params = _tiny_params(rng, 4, 3)
    feats = rng.standard_normal((16, 4))
    y = (rng.random(16) < 0.5).astype(np.float64)
    logit = head_logits(feats, params)
    p = 1.0 / (1.0 + np.exp(-logit))
    ref = -(y * np.log(p) + (1 - y) * np.log(1 - p)).sum()
    loss, _ = head_loss_and_grads(feats, y, params)
    assert loss == pytest.approx(ref, rel=1e-9)


def test_adam_descends_quadratic():
    """Adam on f(p) = ||p - target||^2 converges to the target."""
    target = np.array([1.5, -2.0, 0.25])
    p = (np.zeros(3),)
    opt = AdamState(p, lr=0.1)
    for _ in range(400):
        g = (2 * (p[0] - target),)
        p = opt.step(p, g)
    assert np.allclose(p[0], target, atol=1e-3)


def test_distributed_grads_match_driver(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from stack_trace_deduplication_ray.pipelines.training import (
        _FEAT_DIM,
        _batch_xy,
        distributed_loss_grads,
    )

    rng = np.random.default_rng(5)
    n = 300
    fp = rng.standard_normal((n, _FEAT_DIM)).astype(np.float32)
    fn = rng.standard_normal((n, _FEAT_DIM)).astype(np.float32)
    t = pa.table(
        {
            "f_pos": pa.FixedSizeListArray.from_arrays(
                pa.array(fp.reshape(-1)), _FEAT_DIM
            ),
            "f_neg": pa.FixedSizeListArray.from_arrays(
                pa.array(fn.reshape(-1)), _FEAT_DIM
            ),
            "is_val": pa.array([False] * n),
        }
    )
    params = _tiny_params(np.random.default_rng(6), _FEAT_DIM, 8)
    ds = rd.from_arrow(t).repartition(4).materialize()

    d_loss, d_grads = distributed_loss_grads(ds, params)
    x, y = _batch_xy(t)
    loss, grads = head_loss_and_grads(x, y, params)
    assert d_loss == pytest.approx(loss / len(x), rel=1e-10)
    for a, b in zip(d_grads, grads):
        assert np.allclose(a, b / len(x), rtol=1e-9, atol=1e-12)


def test_training_improves_heldout_separation(ray_session):
    from stack_trace_deduplication_ray.pipelines.training import (
        train_s3m_head,
    )

    res = train_s3m_head(SF, steps=40, lr=0.05)
    m = res["metrics"]
    assert m["loss_final"] < m["loss_initial"] / 5
    assert m["val_auc_trained"] >= 0.9
    assert m["val_auc_trained"] > m["val_auc_untrained"] + 0.3
    assert m["val_margin_trained"] > 2.0
    assert m["val_loss_trained"] < m["val_loss_untrained"]
    # trained params actually moved and are finite
    for p in res["params"]:
        assert np.isfinite(p).all()


def test_training_deterministic(ray_session):
    from stack_trace_deduplication_ray.pipelines.training import (
        train_s3m_head,
    )

    a = train_s3m_head(SF, steps=10, lr=0.05)["metrics"]
    b = train_s3m_head(SF, steps=10, lr=0.05)["metrics"]
    for k in a:
        assert a[k] == pytest.approx(b[k], rel=1e-6), k


def test_forced_distributed_path_trains(ray_session):
    """The per-step map_batches gradient path reaches the same
    final loss region as the driver loop (same data, same steps)."""
    from stack_trace_deduplication_ray.pipelines.training import (
        train_s3m_head,
    )

    drv = train_s3m_head(SF, steps=8, lr=0.05)["metrics"]
    dst = train_s3m_head(SF, steps=8, lr=0.05, force_distributed=True)[
        "metrics"
    ]
    assert dst["distributed"] == 1.0
    assert dst["loss_final"] == pytest.approx(drv["loss_final"], rel=1e-6)
    assert dst["val_auc_trained"] == pytest.approx(
        drv["val_auc_trained"], rel=1e-6
    )


def test_trained_params_install_into_scorer(ray_session):
    """set_head_params: the inference singleton scores with the
    trained head; positives separate from negatives."""
    from stack_trace_deduplication_ray.functions.neural import S3MNumpy
    from stack_trace_deduplication_ray.pipelines.training import (
        train_s3m_head,
        triplet_dataset,
    )

    res = train_s3m_head(SF, steps=40, lr=0.05)
    model = S3MNumpy()
    model.set_head_params(res["params"])
    trip = triplet_dataset(SF).take(64)
    anchors = [r["anchor"] for r in trip]
    pos = model.score_pairs(anchors, [r["positive"] for r in trip])
    neg = model.score_pairs(anchors, [r["negative"] for r in trip])
    assert np.median(pos) > np.median(neg) + 2.0
