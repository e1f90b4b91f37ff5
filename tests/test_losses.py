"""Loss function tests: focal, modulated 8-point, full loss dict."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dafne_tpu.ops.losses import (
    LossSpec,
    bce_with_logits,
    dafne_losses,
    modulated_eight_point_loss,
    sigmoid_focal_loss,
    smooth_l1,
)


def test_focal_loss_matches_manual():
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(10, 4).astype(np.float32))
    targets = jnp.asarray((rng.rand(10, 4) > 0.7).astype(np.float32))
    got = np.asarray(sigmoid_focal_loss(logits, targets, 0.25, 2.0))

    p = 1 / (1 + np.exp(-np.asarray(logits)))
    t = np.asarray(targets)
    ce = -(t * np.log(p) + (1 - t) * np.log(1 - p))
    p_t = p * t + (1 - p) * (1 - t)
    want = ce * (1 - p_t) ** 2 * (0.25 * t + 0.75 * (1 - t))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_smooth_l1_beta_branches():
    x = jnp.asarray([0.0, 0.05, 0.5])
    y = jnp.zeros(3)
    beta = 1.0 / 9.0
    got = np.asarray(smooth_l1(x, y, beta))
    np.testing.assert_allclose(
        got, [0.0, 0.5 * 0.05 ** 2 / beta, 0.5 - 0.5 * beta], atol=1e-6
    )
    # beta ~ 0 degenerates to L1
    np.testing.assert_allclose(np.asarray(smooth_l1(x, y, 0.0)), [0, 0.05, 0.5])


def test_modulated_loss_shift_tolerance():
    rng = np.random.RandomState(1)
    target = jnp.asarray(rng.randn(5, 8).astype(np.float32))
    t4 = np.asarray(target).reshape(5, 4, 2)

    # exact match -> 0
    assert np.allclose(
        np.asarray(modulated_eight_point_loss(target, target, 1 / 9, True)), 0
    )
    # cyclic shifts by 1 and 3 are forgiven (losses/smooth_l1.py:76-102)
    for shift in (1, 3):
        pred = jnp.asarray(np.roll(t4, -shift, axis=1).reshape(5, 8))
        l = np.asarray(modulated_eight_point_loss(pred, target, 1 / 9, True))
        np.testing.assert_allclose(l, 0, atol=1e-6)
    # shift by 2 is NOT in the modulation set -> non-zero
    pred2 = jnp.asarray(np.roll(t4, -2, axis=1).reshape(5, 8))
    assert np.asarray(modulated_eight_point_loss(pred2, target, 1 / 9, True)).min() > 0


def _fake_inputs(n=2, k=64, c=3, seed=0, num_pos=10):
    rng = np.random.RandomState(seed)
    logits = jnp.asarray(rng.randn(n, k, c).astype(np.float32))
    corners = jnp.asarray(rng.randn(n, k, 8).astype(np.float32))
    center = jnp.asarray(rng.randn(n, k, 2).astype(np.float32))
    ctrness = jnp.asarray(rng.randn(n, k).astype(np.float32))
    labels = np.full((n, k), c, np.int32)
    idx = rng.choice(k, num_pos, replace=False)
    labels[0, idx] = rng.randint(0, c, num_pos)
    targets = {
        "labels": jnp.asarray(labels),
        "reg_corners": jnp.asarray(rng.randn(n, k, 8).astype(np.float32)),
        "reg_ltrb": jnp.asarray(np.abs(rng.randn(n, k, 4)).astype(np.float32)),
        "reg_abcd": jnp.asarray(np.abs(rng.randn(n, k, 4)).astype(np.float32)),
        "gt_inds": jnp.zeros((n, k), jnp.int32),
    }
    return logits, corners, center, ctrness, targets


def test_dafne_losses_finite_and_weighted():
    logits, corners, center, ctrness, targets = _fake_inputs()
    spec = LossSpec(num_classes=3, lambda_cls=10.0)
    losses = dafne_losses(logits, corners, center, ctrness, targets, spec)
    for k, v in losses.items():
        assert np.isfinite(np.asarray(v)), k
    assert set(losses) == {
        "loss/cls", "loss/corners", "loss/center", "loss/ctr", "loss/total", "num_pos",
    }
    # lambda normalization: cls weight = 10/13 of the unnormalized value
    lam = spec.normalized_lambdas()
    assert lam[0] == pytest.approx(10 / 13)
    assert sum(lam) == pytest.approx(1.0)


def test_dafne_losses_no_positives():
    logits, corners, center, ctrness, targets = _fake_inputs(num_pos=0)
    spec = LossSpec(num_classes=3)
    losses = dafne_losses(logits, corners, center, ctrness, targets, spec)
    assert np.asarray(losses["num_pos"]) == 1.0  # clamped
    assert np.asarray(losses["loss/corners"]) == 0.0
    assert np.isfinite(np.asarray(losses["loss/total"]))


def test_dafne_losses_grad_flows():
    logits, corners, center, ctrness, targets = _fake_inputs()
    spec = LossSpec(num_classes=3)

    def f(lg, co, ce, ct):
        return dafne_losses(lg, co, ce, ct, targets, spec)["loss/total"]

    grads = jax.grad(f, argnums=(0, 1, 2, 3))(logits, corners, center, ctrness)
    for g in grads:
        g = np.asarray(g)
        assert np.isfinite(g).all()
        assert np.abs(g).sum() > 0


def test_centerness_none_variant():
    logits, corners, center, ctrness, targets = _fake_inputs()
    spec = LossSpec(num_classes=3, centerness="none", has_center_reg=False)
    losses = dafne_losses(logits, corners, None, ctrness, targets, spec)
    assert "loss/ctr" not in losses
    assert "loss/center" not in losses
