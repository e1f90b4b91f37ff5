"""One-stage detector meta-architecture (flax, NHWC).

Re-design of `OneStageDetector` (dafne/modeling/one_stage_detector.py:34-107):
normalize -> backbone -> FPN -> DAFNe head.  Unlike the reference (which
returns torch `Instances` and computes losses inside the module), this module
is a *pure function* from images to dense per-level predictions; target
assignment, losses (dafne_tpu/modeling/losses.py) and decoding
(dafne_tpu/modeling/postprocess.py) compose around it inside the jitted
train/eval steps.  Padding to static shapes happens in the host pipeline, so
`size_divisibility` padding (one_stage_detector.py:100-107) is a data-layer
concern here.

The optional TOP_MODULE conv (one_stage_detector.py:110-118) is supported via
`top_module_dim`.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import jax.numpy as jnp
import flax.linen as nn

from dafne_tpu.models.fpn import FPN
from dafne_tpu.models.head import DAFNeHead, compute_locations
from dafne_tpu.models.resnet import ResNet


class OneStageDetector(nn.Module):
    """images [N,H,W,3] (raw pixels) -> dense per-level head outputs."""

    # data normalization
    pixel_mean: Sequence[float] = (123.675, 116.28, 103.53)
    pixel_std: Sequence[float] = (1.0, 1.0, 1.0)
    # backbone
    backbone_kind: str = "resnet"  # resnet | resnet_lpf | dla | vovnet | mobilenet
    vovnet_spec: str = "V-39-eSE"
    dla_body: str = "DLA34"
    depth: int = 50
    resnet_out_features: Sequence[str] = ("res3", "res4", "res5")
    freeze_at: int = 2
    num_groups: int = 1
    width_per_group: int = 64
    stem_out_channels: int = 64
    res2_out_channels: int = 256
    stride_in_1x1: bool = True
    deform_interval: int = 0
    stem_space_to_depth: bool = True  # TPU.STEM_SPACE_TO_DEPTH
    # fpn
    fpn_out_channels: int = 256
    top_levels: int = 2  # 2 -> P6P7, 1 -> P6, 0 -> none
    # head
    num_classes: int = 15
    in_features: Sequence[str] = ("p3", "p4", "p5", "p6", "p7")
    fpn_strides: Sequence[int] = (8, 16, 32, 64, 128)
    num_cls_convs: int = 4
    num_box_convs: int = 4
    num_share_convs: int = 0
    head_norm: str = "GN"
    use_scale: bool = True
    prior_prob: float = 0.01
    corner_prediction: str = "center-to-corner"
    corner_tower_on_center_tower: bool = True
    merge_corner_center_pred: bool = False
    centerness: str = "oriented"
    ctr_on_reg: bool = True
    use_deformable: bool = False
    use_relu: bool = True
    remat_backbone: bool = False  # jax.checkpoint over the trunk (memory/FLOP trade)
    top_module_dim: int = 0  # >0 enables the TOP_MODULE conv
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False,
                 return_features: bool = False) -> Dict[str, Any]:
        x = images.astype(self.dtype)
        mean = jnp.asarray(self.pixel_mean, dtype=self.dtype)
        std = jnp.asarray(self.pixel_std, dtype=self.dtype)
        x = (x - mean) / std

        if self.backbone_kind == "resnet":
            cls, kwargs = ResNet, dict(
                depth=self.depth,
                out_features=self.resnet_out_features,
                freeze_at=self.freeze_at,
                num_groups=self.num_groups,
                width_per_group=self.width_per_group,
                stem_out_channels=self.stem_out_channels,
                res2_out_channels=self.res2_out_channels,
                stride_in_1x1=self.stride_in_1x1,
                deform_interval=self.deform_interval,
                stem_space_to_depth=self.stem_space_to_depth,
            )
        elif self.backbone_kind == "resnet_lpf":
            from dafne_tpu.models.backbones import ResNetLPF

            cls, kwargs = ResNetLPF, dict(
                depth=self.depth,
                out_features=self.resnet_out_features,
                freeze_at=self.freeze_at,
            )
        elif self.backbone_kind == "dla":
            from dafne_tpu.models.backbones import DLA

            cls, kwargs = DLA, dict(body=self.dla_body)
        elif self.backbone_kind == "vovnet":
            from dafne_tpu.models.backbones import VoVNet

            cls, kwargs = VoVNet, dict(spec=self.vovnet_spec)
        elif self.backbone_kind == "mobilenet":
            from dafne_tpu.models.backbones import MobileNetV2

            cls, kwargs = MobileNetV2, {}
        else:
            raise ValueError(f"Unknown backbone kind {self.backbone_kind}")
        if self.remat_backbone:
            # rematerialize trunk activations in the backward pass
            # (TPU.REMAT_BACKBONE: trade recompute FLOPs for HBM)
            cls = nn.remat(cls)
        backbone = cls(**kwargs, dtype=self.dtype, name="backbone")
        feats = backbone(x)

        top_block = {2: "p6p7", 1: "p6", 0: ""}[self.top_levels]
        fpn = FPN(
            in_features=tuple(self.resnet_out_features),
            out_channels=self.fpn_out_channels,
            top_block=top_block,
            dtype=self.dtype,
            name="fpn",
        )
        pyramid = fpn(feats)
        level_feats = [pyramid[f] for f in self.in_features]

        head = DAFNeHead(
            num_classes=self.num_classes,
            num_levels=len(self.in_features),
            in_channels=self.fpn_out_channels,
            num_cls_convs=self.num_cls_convs,
            num_box_convs=self.num_box_convs,
            num_share_convs=self.num_share_convs,
            norm=self.head_norm,
            use_scale=self.use_scale,
            prior_prob=self.prior_prob,
            corner_prediction=self.corner_prediction,
            corner_tower_on_center_tower=self.corner_tower_on_center_tower,
            merge_corner_center_pred=self.merge_corner_center_pred,
            centerness=self.centerness,
            ctr_on_reg=self.ctr_on_reg,
            use_deformable=self.use_deformable,
            use_relu=self.use_relu,
            dtype=self.dtype,
            name="head",
        )
        out = head(level_feats, train=train)

        if self.top_module_dim > 0:
            top_conv = nn.Conv(
                self.top_module_dim,
                (3, 3),
                padding=[(1, 1), (1, 1)],
                name="top_module",
                dtype=self.dtype,
            )
            out["top_feats"] = [top_conv(f) for f in level_feats]

        # float32 for the numerics downstream (losses / decode)
        for k, v in out.items():
            out[k] = [None if t is None else t.astype(jnp.float32) for t in v]

        out["hw"] = [tuple(f.shape[1:3]) for f in level_feats]
        if return_features:
            # the FPN pyramid itself (visualization tools; not part of the
            # train/eval step outputs)
            out["features"] = [
                f.astype(jnp.float32) for f in level_feats
            ]
        return out

    def locations(self, image_hw, dtype=jnp.float32) -> List[jnp.ndarray]:
        """Per-level location grids for a padded image size (static)."""
        h, w = image_hw
        locs = []
        for s in self.fpn_strides:
            lh = (h + s - 1) // s
            lw = (w + s - 1) // s
            locs.append(compute_locations(lh, lw, s, dtype))
        return locs
