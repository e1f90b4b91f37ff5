"""Mesh/sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from dafne_tpu.config import get_cfg
from dafne_tpu.models import build_model
from dafne_tpu.parallel import (
    batch_sharding,
    create_mesh,
    image_sharding,
    replicated_sharding,
    shard_batch,
)


def tiny_model():
    cfg = get_cfg()
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 16
    cfg.MODEL.RESNETS.STEM_OUT_CHANNELS = 8
    cfg.MODEL.FPN.OUT_CHANNELS = 16
    cfg.MODEL.DAFNE.NUM_CLASSES = 2
    cfg.MODEL.DAFNE.NUM_CLS_CONVS = 1
    cfg.MODEL.DAFNE.NUM_BOX_CONVS = 1
    cfg.TPU.COMPUTE_DTYPE = "float32"
    return build_model(cfg)


def test_create_mesh_shapes():
    m = create_mesh([-1], ("data",))
    assert m.devices.shape == (8,)
    m2 = create_mesh([4, 2], ("data", "spatial"))
    assert m2.devices.shape == (4, 2)
    m3 = create_mesh([-1, 2], ("data", "spatial"))
    assert m3.devices.shape == (4, 2)


def test_shard_batch_layouts():
    mesh = create_mesh([4, 2], ("data", "spatial"))
    batch = {
        "image": np.zeros((8, 64, 64, 3), np.uint8),
        "gt_corners": np.zeros((8, 4, 8), np.float32),
    }
    out = shard_batch(batch, mesh, spatial_axis="spatial")
    assert out["image"].sharding.spec == P("data", "spatial")
    assert out["gt_corners"].sharding.spec == P("data")


def test_spatial_sharding_exactness():
    """Forward under H-sharding must equal the replicated forward bit-for-bit
    in f32 (GSPMD halo exchange for every conv window)."""
    model = tiny_model()
    rng = np.random.RandomState(0)
    x = rng.rand(2, 128, 128, 3).astype(np.float32) * 255
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))["params"]

    ref = jax.jit(lambda p, v: model.apply({"params": p}, v))(params, jnp.asarray(x))

    mesh = create_mesh([2, 4], ("data", "spatial"))
    xs = jax.device_put(jnp.asarray(x), image_sharding(mesh, "data", "spatial"))
    ps = jax.device_put(params, replicated_sharding(mesh))
    out = jax.jit(lambda p, v: model.apply({"params": p}, v))(ps, xs)

    for lvl in range(5):
        np.testing.assert_allclose(
            np.asarray(ref["logits"][lvl]), np.asarray(out["logits"][lvl]),
            rtol=1e-5, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(ref["corners"][lvl]), np.asarray(out["corners"][lvl]),
            rtol=1e-5, atol=1e-5,
        )


def test_data_parallel_loss_matches_single_device():
    """Global-batch loss under the mesh == single-device loss (the psum
    replacement for the reference's dist.all_reduce normalizers)."""
    from dafne_tpu.engine.trainer import compute_losses, make_location_tables
    from dafne_tpu.ops.losses import LossSpec
    from dafne_tpu.ops.targets import AssignmentSpec

    model = tiny_model()
    cfg = get_cfg()
    cfg.MODEL.DAFNE.NUM_CLASSES = 2
    aspec = AssignmentSpec.from_config(cfg)
    import dataclasses

    aspec = dataclasses.replace(aspec, num_classes=2, strides=(8, 16, 32, 64, 128))
    lspec = dataclasses.replace(LossSpec.from_config(cfg), num_classes=2)
    tables = make_location_tables((128, 128), aspec)

    rng = np.random.RandomState(1)
    n = 8
    batch = {
        "image": jnp.asarray(rng.rand(n, 128, 128, 3).astype(np.float32) * 255),
        "gt_corners": jnp.asarray(
            np.tile([20.0, 20, 60, 20, 60, 50, 20, 50], (n, 4, 1)).astype(np.float32)
        ),
        "gt_hbox": jnp.asarray(np.tile([20.0, 20, 60, 50], (n, 4, 1)).astype(np.float32)),
        "gt_classes": jnp.zeros((n, 4), jnp.int32),
        "gt_area": jnp.full((n, 4), 1200.0, jnp.float32),
        "gt_valid": jnp.asarray(np.tile([True, True, False, False], (n, 1))),
    }
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))["params"]

    f = jax.jit(
        lambda p, b: compute_losses(model, p, b, aspec, lspec, tables)[0][0]["loss/total"]
    )
    single = float(f(params, batch))

    mesh = create_mesh([8], ("data",))
    sharded = shard_batch(batch, mesh)
    ps = jax.device_put(params, replicated_sharding(mesh))
    multi = float(f(ps, sharded))
    assert single == pytest.approx(multi, rel=1e-5)
