"""Forward-shape tests for every backbone family through the full detector."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dafne_tpu.config import get_cfg
from dafne_tpu.models import build_model

BACKBONES = [
    ("build_dafne_resnet_fpn_backbone", False),
    ("build_dafne_resnet_fpn_backbone", True),  # ANTI_ALIAS -> LPF
    ("build_dafne_dla_fpn_backbone", False),
    ("build_vovnet_fpn_backbone", False),
    ("build_mnv2_backbone", False),
]


@pytest.mark.parametrize("name,anti_alias", BACKBONES)
def test_backbone_forward(name, anti_alias):
    cfg = get_cfg()
    cfg.MODEL.BACKBONE.NAME = name
    cfg.MODEL.BACKBONE.ANTI_ALIAS = anti_alias
    cfg.MODEL.RESNETS.DEPTH = 50
    cfg.MODEL.VOVNET.CONV_BODY = "V-19-eSE"
    cfg.MODEL.FPN.OUT_CHANNELS = 32
    cfg.MODEL.DAFNE.NUM_CLASSES = 2
    cfg.MODEL.DAFNE.NUM_CLS_CONVS = 1
    cfg.MODEL.DAFNE.NUM_BOX_CONVS = 1
    cfg.TPU.COMPUTE_DTYPE = "float32"
    model = build_model(cfg)
    x = jnp.zeros((1, 128, 128, 3))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    out = model.apply({"params": params}, x)
    assert len(out["logits"]) == 5
    # p3..p7 at strides 8..128
    for lvl, size in enumerate([16, 8, 4, 2, 1]):
        assert out["logits"][lvl].shape == (1, size, size, 2), (name, lvl)
        assert out["corners"][lvl].shape == (1, size, size, 8)
    assert np.isfinite(np.asarray(out["corners"][0])).all()


def test_lpf_blur_pool_shift_smoothing():
    """Blur-pool output varies less under 1px shifts than strided subsample."""
    from dafne_tpu.models.backbones import blur_pool

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 32, 32, 4).astype(np.float32))
    a = np.asarray(blur_pool(x, 2))
    assert a.shape == (1, 16, 16, 4)
    shifted = jnp.roll(x, 1, axis=1)
    b = np.asarray(blur_pool(shifted, 2))
    raw_a = np.asarray(x)[:, ::2, ::2]
    raw_b = np.asarray(shifted)[:, ::2, ::2]
    assert np.abs(a - b).mean() < np.abs(raw_a - raw_b).mean()


@pytest.mark.parametrize("body", sorted(__import__("dafne_tpu.models.backbones", fromlist=["DLA_SPECS"]).DLA_SPECS))
def test_dla_variants_forward(body):
    """Every DLA variant (dla.py:310-441) constructs and produces the
    res3/4/5 pyramid at the spec'd channel widths."""
    from dafne_tpu.models.backbones import DLA, DLA_SPECS

    trunk = DLA(body=body)
    x = jnp.zeros((1, 64, 64, 3))
    params = trunk.init(jax.random.PRNGKey(0), x)["params"]
    outs = trunk.apply({"params": params}, x)
    _, ch, _, _, _ = DLA_SPECS[body]
    assert outs["res3"].shape == (1, 8, 8, ch[3]), body
    assert outs["res4"].shape == (1, 4, 4, ch[4])
    assert outs["res5"].shape == (1, 2, 2, ch[5])


def test_dla_variant_through_full_detector():
    cfg = get_cfg()
    cfg.MODEL.BACKBONE.NAME = "build_dafne_dla_fpn_backbone"
    cfg.MODEL.DLA.CONV_BODY = "DLA60"
    cfg.MODEL.FPN.OUT_CHANNELS = 32
    cfg.MODEL.DAFNE.NUM_CLASSES = 2
    cfg.MODEL.DAFNE.NUM_CLS_CONVS = 1
    cfg.MODEL.DAFNE.NUM_BOX_CONVS = 1
    cfg.TPU.COMPUTE_DTYPE = "float32"
    model = build_model(cfg)
    x = jnp.zeros((1, 128, 128, 3))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    out = model.apply({"params": params}, x)
    assert out["logits"][0].shape == (1, 16, 16, 2)
