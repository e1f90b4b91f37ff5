"""Deformable conv tests: bilinear sampling exactness + head integration."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dafne_tpu.layers.deform_conv import (
    DeformConv2d,
    bilinear_sample,
    center_to_offsets,
    corners_to_offsets,
    ltrb_to_offsets,
)


def test_bilinear_sample_exact_on_grid():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 8, 10, 3).astype(np.float32))
    gy, gx = jnp.meshgrid(jnp.arange(8.0), jnp.arange(10.0), indexing="ij")
    out = bilinear_sample(x, gx[None].repeat(2, 0), gy[None].repeat(2, 0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def test_bilinear_sample_midpoint():
    x = jnp.zeros((1, 2, 2, 1)).at[0, 0, 0, 0].set(1.0).at[0, 1, 1, 0].set(3.0)
    out = bilinear_sample(x, jnp.full((1, 1, 1), 0.5), jnp.full((1, 1, 1), 0.5))
    assert float(out[0, 0, 0, 0]) == pytest.approx((1 + 0 + 0 + 3) / 4)


def test_deform_conv_zero_offsets_equals_regular_conv():
    """With zero offsets, DeformConv must equal a dense 3x3 conv with the
    same weights (taps land exactly on the regular grid)."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(1, 8, 8, 4).astype(np.float32))
    m = DeformConv2d(6, with_learned_offsets=False)
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    out = m.apply({"params": params}, x)

    # fold the [1, 1, 9C, F] kernel back to a [3, 3, C, F] dense conv
    k = np.asarray(params["weight"]["kernel"]).reshape(3, 3, 4, 6)
    dense = jax.lax.conv_general_dilated(
        x, jnp.asarray(k), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    # border differs (clamped sampling vs zero padding); compare interior
    np.testing.assert_allclose(
        np.asarray(out)[:, 1:-1, 1:-1], np.asarray(dense)[:, 1:-1, 1:-1],
        rtol=1e-4, atol=1e-5,
    )


def test_offset_generators_shapes():
    n, h, w = 2, 4, 4
    assert ltrb_to_offsets(jnp.ones((n, h, w, 4))).shape == (n, h, w, 18)
    assert center_to_offsets(jnp.ones((n, h, w, 2))).shape == (n, h, w, 18)
    assert corners_to_offsets(jnp.ones((n, h, w, 8))).shape == (n, h, w, 18)


def test_head_with_deformable_towers():
    from dafne_tpu.config import get_cfg
    from dafne_tpu.models import build_model

    cfg = get_cfg()
    cfg.MODEL.DAFNE.USE_DEFORMABLE = True
    cfg.MODEL.DAFNE.NUM_CLASSES = 2
    cfg.MODEL.DAFNE.NUM_CLS_CONVS = 2
    cfg.MODEL.DAFNE.NUM_BOX_CONVS = 2
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 16
    cfg.MODEL.RESNETS.STEM_OUT_CHANNELS = 8
    cfg.MODEL.FPN.OUT_CHANNELS = 16
    cfg.TPU.COMPUTE_DTYPE = "float32"
    model = build_model(cfg)
    x = jnp.zeros((1, 128, 128, 3))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    out = model.apply({"params": params}, x)
    assert out["logits"][0].shape == (1, 16, 16, 2)
    # deformable layers exist with offset convs
    assert "offset_conv" in params["head"]["cls_tower"]["conv1"]
