"""Model construction / forward smoke tests + end-to-end train step.

These mirror the reference's own debug workflow (run.py --debug ≙ overfit on
a handful of images, SURVEY.md §4.1): a couple of gradient steps on a tiny
synthetic batch must run, stay finite, and reduce the loss.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dafne_tpu.config import get_cfg
from dafne_tpu.engine.optimizer import (
    auto_scale_config,
    build_optimizer,
    warmup_multistep_schedule,
)
from dafne_tpu.engine.trainer import (
    init_state,
    make_eval_step,
    make_train_step,
)
from dafne_tpu.geometry.quads import sort_quadrilateral
from dafne_tpu.models import build_model


def tiny_cfg(**overrides):
    cfg = get_cfg()
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 16
    cfg.MODEL.RESNETS.STEM_OUT_CHANNELS = 8
    cfg.MODEL.FPN.OUT_CHANNELS = 16
    cfg.MODEL.DAFNE.NUM_CLASSES = 3
    cfg.MODEL.DAFNE.NUM_CLS_CONVS = 1
    cfg.MODEL.DAFNE.NUM_BOX_CONVS = 1
    cfg.MODEL.DAFNE.LOSS_LAMBDA.CLS = 10.0
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.SOLVER.BASE_LR = 0.01
    cfg.SOLVER.WARMUP_ITERS = 0
    cfg.SOLVER.STEPS = [1000000]
    for k, v in overrides.items():
        cfg.merge_from_list([k, str(v)])
    return cfg


def synthetic_batch(n=2, hw=128, max_inst=8, num_classes=3, seed=0):
    rng = np.random.RandomState(seed)
    image = rng.randint(0, 255, (n, hw, hw, 3)).astype(np.float32)
    corners = np.zeros((n, max_inst, 8), np.float32)
    hbox = np.zeros((n, max_inst, 4), np.float32)
    cls = np.zeros((n, max_inst), np.int32)
    area = np.zeros((n, max_inst), np.float32)
    valid = np.zeros((n, max_inst), bool)
    for i in range(n):
        for j in range(2):
            x0, y0 = rng.uniform(10, 60, 2)
            w, h = rng.uniform(20, 50, 2)
            c = np.array([x0, y0, x0 + w, y0, x0 + w, y0 + h, x0, y0 + h])
            corners[i, j] = c
            hbox[i, j] = [x0, y0, x0 + w, y0 + h]
            cls[i, j] = rng.randint(0, num_classes)
            area[i, j] = w * h
            valid[i, j] = True
    corners = np.asarray(sort_quadrilateral(jnp.asarray(corners.reshape(-1, 8)))).reshape(
        n, max_inst, 8
    )
    return {
        "image": jnp.asarray(image),
        "gt_corners": jnp.asarray(corners),
        "gt_hbox": jnp.asarray(hbox),
        "gt_classes": jnp.asarray(cls),
        "gt_area": jnp.asarray(area),
        "gt_valid": jnp.asarray(valid),
    }


def test_stem_space_to_depth_exact():
    """The space-to-depth stem lowering computes the identical function to
    the plain 7x7/2 conv (same param, both paths of SpaceToDepthStemConv)."""
    from dafne_tpu.models.resnet import SpaceToDepthStemConv

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 64, 96, 3).astype(np.float32))
    mod_s2d = SpaceToDepthStemConv(16, space_to_depth=True)
    mod_ref = SpaceToDepthStemConv(16, space_to_depth=False)
    params = mod_ref.init(jax.random.PRNGKey(0), x)["params"]
    y_ref = mod_ref.apply({"params": params}, x)
    y_s2d = mod_s2d.apply({"params": params}, x)
    assert y_ref.shape == y_s2d.shape == (2, 32, 48, 16)
    np.testing.assert_allclose(
        np.asarray(y_s2d), np.asarray(y_ref), atol=1e-4, rtol=1e-4
    )
    # odd input falls back to the plain path (shape sanity)
    x_odd = jnp.asarray(rng.randn(1, 63, 96, 3).astype(np.float32))
    y_odd = mod_s2d.apply({"params": params}, x_odd)
    assert y_odd.shape == (1, 32, 48, 16)
    # gradients flow through the folded kernel identically
    g_ref = jax.grad(
        lambda p: jnp.sum(mod_ref.apply({"params": p}, x) ** 2)
    )(params)
    g_s2d = jax.grad(
        lambda p: jnp.sum(mod_s2d.apply({"params": p}, x) ** 2)
    )(params)
    np.testing.assert_allclose(
        np.asarray(g_s2d["kernel"]), np.asarray(g_ref["kernel"]),
        atol=1e-3, rtol=1e-3,
    )


def test_forward_shapes():
    cfg = tiny_cfg()
    model = build_model(cfg)
    x = jnp.zeros((1, 128, 128, 3))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    out = model.apply({"params": params}, x)
    assert len(out["logits"]) == 5
    assert out["logits"][0].shape == (1, 16, 16, 3)
    assert out["corners"][0].shape == (1, 16, 16, 8)
    assert out["center"][0].shape == (1, 16, 16, 2)
    assert out["ctrness"][4].shape == (1, 1, 1, 1)
    # focal-loss bias init: sigmoid(logit) ~ prior at init (bias = -log(99))
    bias = np.asarray(params["head"]["cls_logits"]["bias"])
    np.testing.assert_allclose(bias, -np.log(99), rtol=1e-5)


def test_corner_strategies_forward():
    for strategy in ["direct", "iterative", "offset", "angle", "center-to-corner"]:
        cfg = tiny_cfg()
        cfg.MODEL.DAFNE.CORNER_PREDICTION = strategy
        model = build_model(cfg)
        x = jnp.zeros((1, 64, 64, 3))
        params = model.init(jax.random.PRNGKey(0), x)["params"]
        out = model.apply({"params": params}, x)
        assert out["corners"][0].shape == (1, 8, 8, 8), strategy
        if strategy == "center-to-corner":
            assert out["center"][0] is not None
        else:
            assert out["center"][0] is None


def test_schedule():
    sched = warmup_multistep_schedule(1.0, (100, 200), 0.1, 0.001, 10)
    assert float(sched(0)) == pytest.approx(0.001)
    assert float(sched(5)) == pytest.approx(0.001 * 0.5 + 0.5, rel=1e-3)
    assert float(sched(50)) == pytest.approx(1.0)
    assert float(sched(150)) == pytest.approx(0.1)
    assert float(sched(250)) == pytest.approx(0.01)


def test_auto_scale_config():
    cfg = tiny_cfg()
    cfg.SOLVER.REFERENCE_WORLD_SIZE = 4
    cfg.SOLVER.IMS_PER_BATCH = 8
    cfg.SOLVER.BASE_LR = 0.01
    cfg.SOLVER.MAX_ITER = 90000
    cfg.SOLVER.STEPS = [60000]
    scaled = auto_scale_config(cfg, 8)
    assert scaled.SOLVER.IMS_PER_BATCH == 16
    assert scaled.SOLVER.BASE_LR == pytest.approx(0.02)
    assert scaled.SOLVER.MAX_ITER == 45000
    assert scaled.SOLVER.STEPS == [30000]


def test_train_step_reduces_loss():
    cfg = tiny_cfg()
    model = build_model(cfg)
    batch = synthetic_batch()
    # build params first, then the optimizer (labels depend on the tree)
    params = model.init(jax.random.PRNGKey(0), batch["image"])["params"]
    tx, sched = build_optimizer(cfg, params)
    from dafne_tpu.engine.trainer import TrainState

    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params), tx=tx
    )
    step = jax.jit(make_train_step(model, cfg, (128, 128), tx, sched))

    state, m0 = step(state, batch)
    first = float(m0["loss/total"])
    assert bool(m0["loss_is_finite"])
    assert float(m0["num_pos"]) > 0
    for _ in range(8):
        state, m = step(state, batch)
    last = float(m["loss/total"])
    assert np.isfinite(last)
    assert last < first, (first, last)


def test_frozen_params_do_not_move():
    cfg = tiny_cfg()
    model = build_model(cfg)
    batch = synthetic_batch()
    params = model.init(jax.random.PRNGKey(0), batch["image"])["params"]
    tx, sched = build_optimizer(cfg, params)
    from dafne_tpu.engine.trainer import TrainState

    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params), tx=tx
    )
    step = jax.jit(make_train_step(model, cfg, (128, 128), tx, sched))
    new_state, _ = step(state, batch)

    # stem (freeze_at=2 covers stem+res2) and all FrozenBN params frozen
    before = params["backbone"]["stem_conv1"]["kernel"]
    after = new_state.params["backbone"]["stem_conv1"]["kernel"]
    np.testing.assert_array_equal(np.asarray(before), np.asarray(after))
    b4 = params["backbone"]["res4_0"]["conv1_norm"]["weight"]
    a4 = new_state.params["backbone"]["res4_0"]["conv1_norm"]["weight"]
    np.testing.assert_array_equal(np.asarray(b4), np.asarray(a4))
    # but res4 conv weights DO move
    bc = params["backbone"]["res4_0"]["conv1"]["kernel"]
    ac = new_state.params["backbone"]["res4_0"]["conv1"]["kernel"]
    assert np.abs(np.asarray(bc) - np.asarray(ac)).max() > 0


def test_eval_step_shapes():
    cfg = tiny_cfg()
    cfg.TPU.NMS_MAX_CANDIDATES = 256
    model = build_model(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))["params"]
    eval_step = jax.jit(make_eval_step(model, cfg, (128, 128)))
    out = eval_step(params, jnp.zeros((2, 128, 128, 3)))
    k = cfg.MODEL.DAFNE.POST_NMS_TOPK_TEST
    k = min(k, 256)
    assert out["corners"].shape == (2, k, 8)
    assert out["scores"].shape == (2, k)
    assert out["valid"].dtype == bool
