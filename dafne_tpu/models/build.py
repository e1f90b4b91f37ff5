"""Model builder: config -> flax module.

The registry equivalent of Detectron2's META_ARCH/BACKBONE registries
(one_stage_detector.py:33, fpn.py:58): config keys select the architecture;
everything is constructed functionally.
"""

from __future__ import annotations

import jax.numpy as jnp

from dafne_tpu.models.one_stage_detector import OneStageDetector

_DTYPES = {
    "bfloat16": jnp.bfloat16,
    "float32": jnp.float32,
    "float16": jnp.float16,
}


def build_model(cfg) -> OneStageDetector:
    """Build the detector module from a config (MODEL.* keys, SURVEY.md §2.3)."""
    assert cfg.MODEL.META_ARCHITECTURE == "OneStageDetector", (
        cfg.MODEL.META_ARCHITECTURE
    )
    # backbone registry (the Detectron2 BACKBONE registry names kept)
    name = cfg.MODEL.BACKBONE.NAME
    deform_interval = 0
    if name in ("build_dafne_resnet_fpn_backbone", "build_resnet_interval_backbone"):
        kind = "resnet_lpf" if cfg.MODEL.BACKBONE.ANTI_ALIAS else "resnet"
        if name == "build_resnet_interval_backbone":
            deform_interval = max(1, cfg.MODEL.RESNETS.DEFORM_INTERVAL)
    elif name in ("build_resnet_lpf_backbone",):
        kind = "resnet_lpf"
    elif name in ("build_dafne_dla_fpn_backbone", "build_dla_fpn_backbone"):
        kind = "dla"
    elif name in ("build_vovnet_fpn_backbone", "build_fcos_vovnet_fpn_backbone"):
        kind = "vovnet"
    elif name in ("build_mnv2_backbone", "build_mobilenetv2_fpn_backbone"):
        kind = "mobilenet"
    else:
        raise ValueError(f"Unknown MODEL.BACKBONE.NAME: {name}")

    # TPU.COMPUTE_DTYPE is the single source of truth for compute precision
    # (default bfloat16 — the TPU-native analog of the reference's AMP flag,
    # SOLVER.AMP, defaults.py:20). Params stay float32.
    dtype = _DTYPES[cfg.TPU.COMPUTE_DTYPE]

    d = cfg.MODEL.DAFNE
    return OneStageDetector(
        pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
        pixel_std=tuple(cfg.MODEL.PIXEL_STD),
        backbone_kind=kind,
        vovnet_spec=cfg.MODEL.VOVNET.CONV_BODY,
        dla_body=cfg.MODEL.DLA.CONV_BODY,
        depth=cfg.MODEL.RESNETS.DEPTH,
        resnet_out_features=tuple(cfg.MODEL.RESNETS.OUT_FEATURES),
        freeze_at=cfg.MODEL.BACKBONE.FREEZE_AT,
        num_groups=cfg.MODEL.RESNETS.NUM_GROUPS,
        width_per_group=cfg.MODEL.RESNETS.WIDTH_PER_GROUP,
        stem_out_channels=cfg.MODEL.RESNETS.STEM_OUT_CHANNELS,
        res2_out_channels=cfg.MODEL.RESNETS.RES2_OUT_CHANNELS,
        stride_in_1x1=cfg.MODEL.RESNETS.STRIDE_IN_1X1,
        deform_interval=deform_interval,
        stem_space_to_depth=bool(cfg.TPU.get("STEM_SPACE_TO_DEPTH", True)),
        fpn_out_channels=cfg.MODEL.FPN.OUT_CHANNELS,
        top_levels=d.TOP_LEVELS,
        num_classes=d.NUM_CLASSES,
        in_features=tuple(d.IN_FEATURES),
        fpn_strides=tuple(d.FPN_STRIDES),
        num_cls_convs=d.NUM_CLS_CONVS,
        num_box_convs=d.NUM_BOX_CONVS,
        num_share_convs=d.NUM_SHARE_CONVS,
        head_norm=d.NORM,
        use_scale=d.USE_SCALE,
        prior_prob=d.PRIOR_PROB,
        corner_prediction=d.CORNER_PREDICTION,
        corner_tower_on_center_tower=d.CORNER_TOWER_ON_CENTER_TOWER,
        merge_corner_center_pred=d.MERGE_CORNER_CENTER_PRED,
        centerness=d.CENTERNESS,
        ctr_on_reg=d.CTR_ON_REG,
        use_deformable=d.USE_DEFORMABLE,
        use_relu=d.USE_RELU,
        remat_backbone=cfg.TPU.REMAT_BACKBONE,
        top_module_dim=(cfg.MODEL.TOP_MODULE.DIM if cfg.MODEL.TOP_MODULE.NAME == "conv" else 0),
        dtype=dtype,
    )
