"""Weight importer tests with synthetic reference checkpoints."""

import pickle

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dafne_tpu.config import get_cfg
from dafne_tpu.models import build_model
from dafne_tpu.utils.weight_import import load_reference_weights


def _tiny_model():
    cfg = get_cfg()
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 16
    cfg.MODEL.RESNETS.STEM_OUT_CHANNELS = 8
    cfg.MODEL.FPN.OUT_CHANNELS = 16
    cfg.MODEL.DAFNE.NUM_CLASSES = 3
    cfg.MODEL.DAFNE.NUM_CLS_CONVS = 2
    cfg.MODEL.DAFNE.NUM_BOX_CONVS = 1
    cfg.TPU.COMPUTE_DTYPE = "float32"
    model = build_model(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))["params"]
    return cfg, model, params


def test_import_backbone_pkl(tmp_path):
    """Detectron2-style ImageNet pickle: stem + res-stage conv/norm keys."""
    cfg, model, params = _tiny_model()
    rng = np.random.RandomState(0)

    stem_w = rng.randn(8, 3, 7, 7).astype(np.float32)  # OIHW
    r2_w = rng.randn(16, 8, 3, 3).astype(np.float32)
    gamma = rng.rand(8).astype(np.float32)
    sd = {
        "stem.conv1.weight": stem_w,
        "stem.conv1.norm.weight": gamma,
        "stem.conv1.norm.bias": np.zeros(8, np.float32),
        "stem.conv1.norm.running_mean": np.zeros(8, np.float32),
        "stem.conv1.norm.running_var": np.ones(8, np.float32),
        "res2.0.conv1.weight": r2_w,
        "res2.0.conv1.norm.weight": np.ones(16, np.float32),
        "unmatched.key": np.zeros(3),
    }
    path = tmp_path / "R-tiny.pkl"
    with open(path, "wb") as f:
        pickle.dump({"model": sd}, f)

    new = load_reference_weights(str(path), params)
    np.testing.assert_allclose(
        np.asarray(new["backbone"]["stem_conv1"]["kernel"]),
        stem_w.transpose(2, 3, 1, 0),
    )
    np.testing.assert_allclose(
        np.asarray(new["backbone"]["stem_conv1_norm"]["weight"]), gamma
    )
    np.testing.assert_allclose(
        np.asarray(new["backbone"]["res2_0"]["conv1"]["kernel"]),
        r2_w.transpose(2, 3, 1, 0),
    )
    # untouched params stay identical
    np.testing.assert_allclose(
        np.asarray(new["head"]["cls_logits"]["bias"]),
        np.asarray(params["head"]["cls_logits"]["bias"]),
    )


def test_import_full_dafne_pth(tmp_path):
    """Full training checkpoint keys: fpn laterals, head towers, scales."""
    import torch

    cfg, model, params = _tiny_model()
    rng = np.random.RandomState(1)
    lat_w = rng.randn(16, 128, 1, 1).astype(np.float32)
    tower0_w = rng.randn(16, 16, 3, 3).astype(np.float32)
    gn_w = rng.rand(16).astype(np.float32)
    cls_w = rng.randn(3, 16, 3, 3).astype(np.float32)
    sd = {
        "backbone.fpn_lateral5.weight": torch.tensor(lat_w),
        "backbone.fpn_lateral5.bias": torch.zeros(16),
        "backbone.top_block.p6.weight": torch.tensor(
            rng.randn(16, 16, 3, 3).astype(np.float32)
        ),
        "proposal_generator.dafne_head.cls_tower.0.weight": torch.tensor(tower0_w),
        "proposal_generator.dafne_head.cls_tower.1.weight": torch.tensor(gn_w),
        "proposal_generator.dafne_head.cls_tower.1.bias": torch.zeros(16),
        "proposal_generator.dafne_head.cls_logits.weight": torch.tensor(cls_w),
        "proposal_generator.dafne_head.cls_logits.bias": torch.zeros(3),
        "proposal_generator.dafne_head.scales.0.scale": torch.tensor([1.5]),
        "proposal_generator.dafne_head.scales.3.scale": torch.tensor([0.5]),
    }
    path = tmp_path / "model_final.pth"
    torch.save({"model": sd}, str(path))

    new = load_reference_weights(str(path), params)
    np.testing.assert_allclose(
        np.asarray(new["fpn"]["lateral_res5"]["kernel"]),
        lat_w.transpose(2, 3, 1, 0),
    )
    np.testing.assert_allclose(
        np.asarray(new["head"]["cls_tower"]["conv0"]["kernel"]),
        tower0_w.transpose(2, 3, 1, 0),
    )
    np.testing.assert_allclose(
        np.asarray(new["head"]["cls_tower"]["norm0"]["scale"]), gn_w
    )
    np.testing.assert_allclose(
        np.asarray(new["head"]["cls_logits"]["kernel"]),
        cls_w.transpose(2, 3, 1, 0),
    )
    scales = np.asarray(new["head"]["scales"])
    assert scales[0] == pytest.approx(1.5)
    assert scales[3] == pytest.approx(0.5)
    assert scales[1] == pytest.approx(1.0)  # untouched


def test_import_shape_mismatch_is_skipped(tmp_path):
    cfg, model, params = _tiny_model()
    sd = {"stem.conv1.weight": np.zeros((64, 3, 7, 7), np.float32)}  # wrong C
    path = tmp_path / "bad.pkl"
    with open(path, "wb") as f:
        pickle.dump({"model": sd}, f)
    new = load_reference_weights(str(path), params)
    np.testing.assert_allclose(
        np.asarray(new["backbone"]["stem_conv1"]["kernel"]),
        np.asarray(params["backbone"]["stem_conv1"]["kernel"]),
    )


def test_iou_loss_option():
    import jax.numpy as jnp

    from dafne_tpu.ops.losses import rotated_iou_loss

    sq = jnp.asarray([0.0, 0, 2, 0, 2, 2, 0, 2])
    assert float(rotated_iou_loss(sq, sq, "iou")) == pytest.approx(0.0, abs=1e-6)
    assert float(rotated_iou_loss(sq, sq, "giou")) == pytest.approx(0.0, abs=1e-6)
    far = sq + 10.0
    assert float(rotated_iou_loss(sq, far, "iou")) == pytest.approx(1.0, abs=1e-6)
    assert float(rotated_iou_loss(sq, far, "giou")) > 1.0  # giou penalizes gap
    # gradients flow
    g = jax.grad(lambda p: rotated_iou_loss(p, sq, "giou"))(sq + 0.5)
    assert np.abs(np.asarray(g)).sum() > 0
