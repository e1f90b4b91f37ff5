"""jax.export round-trip of the fused inference step (tools/export_model.py).

The serialized StableHLO artifact must deserialize and reproduce the live
eval step's outputs exactly — this is the serving-deployment contract.
"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_export_roundtrip_matches_live(tmp_path):
    from jax import export as jexport

    from dafne_tpu.config import get_cfg
    from dafne_tpu.engine.trainer import make_eval_step
    from dafne_tpu.models import build_model

    cfg = get_cfg()
    cfg.merge_from_file("configs/synthetic/base.yaml")
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res3", "res4", "res5"]
    cfg.MODEL.FPN.OUT_CHANNELS = 32
    cfg.MODEL.DAFNE.NUM_CLS_CONVS = 1
    cfg.MODEL.DAFNE.NUM_BOX_CONVS = 1
    cfg.MODEL.DAFNE.PRE_NMS_TOPK_TEST = 64
    cfg.MODEL.DAFNE.POST_NMS_TOPK_TEST = 32
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.NMS_MAX_CANDIDATES = 128

    model = build_model(cfg)
    pad_hw = (128, 128)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1,) + pad_hw + (3,)))[
        "params"
    ]
    eval_step = make_eval_step(model, cfg, pad_hw)
    fn = jax.jit(lambda images, scale: eval_step(params, images, scale))

    img_spec = jax.ShapeDtypeStruct((2,) + pad_hw + (3,), jnp.float32)
    scale_spec = jax.ShapeDtypeStruct((2, 2), jnp.float32)
    exported = jexport.export(fn)(img_spec, scale_spec)
    blob = exported.serialize()
    path = tmp_path / "model.stablehlo"
    path.write_bytes(blob)

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(2, *pad_hw, 3).astype(np.float32) * 255)
    scale = jnp.ones((2, 2), jnp.float32)

    live = fn(images, scale)
    replayed = jexport.deserialize(bytearray(path.read_bytes())).call(
        images, scale
    )
    assert set(live.keys()) == set(replayed.keys())
    for k in live:
        np.testing.assert_allclose(
            np.asarray(replayed[k]), np.asarray(live[k]), atol=1e-5,
            err_msg=k,
        )


def test_export_roundtrip_int8(tmp_path):
    """The quantized (w8a8) eval step must also serialize and replay —
    int8 convolutions are plain StableHLO, so the serving artifact can
    ship the quantized pipeline too (framework-only feature)."""
    from jax import export as jexport

    from dafne_tpu.config import get_cfg
    from dafne_tpu.engine.trainer import make_eval_step
    from dafne_tpu.models import build_model

    cfg = get_cfg()
    cfg.merge_from_file("configs/synthetic/base.yaml")
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res3", "res4", "res5"]
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 64
    cfg.MODEL.RESNETS.STEM_OUT_CHANNELS = 64
    cfg.MODEL.FPN.OUT_CHANNELS = 64
    cfg.MODEL.DAFNE.NUM_CLS_CONVS = 1
    cfg.MODEL.DAFNE.NUM_BOX_CONVS = 1
    cfg.MODEL.DAFNE.PRE_NMS_TOPK_TEST = 64
    cfg.MODEL.DAFNE.POST_NMS_TOPK_TEST = 32
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.NMS_MAX_CANDIDATES = 128
    cfg.TPU.EVAL_INT8 = True
    cfg.TPU.EVAL_INT8_MIN_CHANNELS = 64

    model = build_model(cfg)
    pad_hw = (128, 128)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1,) + pad_hw + (3,)))[
        "params"
    ]
    eval_step = make_eval_step(model, cfg, pad_hw)
    fn = jax.jit(lambda images, scale: eval_step(params, images, scale))

    img_spec = jax.ShapeDtypeStruct((2,) + pad_hw + (3,), jnp.float32)
    scale_spec = jax.ShapeDtypeStruct((2, 2), jnp.float32)
    exported = jexport.export(fn)(img_spec, scale_spec)
    assert "i8" in exported.mlir_module()  # quantized convs really inside
    blob = exported.serialize()

    rng = np.random.RandomState(1)
    images = jnp.asarray(rng.rand(2, *pad_hw, 3).astype(np.float32) * 255)
    scale = jnp.ones((2, 2), jnp.float32)
    live = fn(images, scale)
    replayed = jexport.deserialize(bytearray(blob)).call(images, scale)
    for k in live:
        np.testing.assert_allclose(
            np.asarray(replayed[k]), np.asarray(live[k]), atol=1e-5,
            err_msg=k,
        )
