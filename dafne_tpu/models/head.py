"""DAFNe dense prediction head (NHWC flax).

Re-design of the reference head (dafne/modeling/dafne/dafne.py:167-494):
per-FPN-level towers with weights *shared across levels* (cls / corners /
center / share towers, each NUM_*_CONVS x [3x3 conv -> GN -> ReLU]),
prediction convs (cls_logits C, ctrness 1, corners_pred 8, center_pred 2,
xywha_pred 5), per-level learnable Scale, focal-loss bias init
-log((1-pi)/pi) (dafne.py:282-285), and all five corner prediction
strategies (dafne.py:370-457):

  direct            corners_pred on the corners tower
  iterative         chained c0->c3 with feature concat (dafne.py:378-387)
  center-to-corner  reg = center.repeat(4) + delta (default, dafne.py:388-414)
  offset            fixed base square + delta (dafne.py:415-423)
  angle             xywha -> rotate corners by R(alpha) (dafne.py:424-455)

Outputs are NHWC level dicts; flattening to (sum_l N*Hl*Wl, ...) "level-first"
order happens in the loss/decode modules.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np


def compute_locations(h: int, w: int, stride: int, dtype=jnp.float32) -> jnp.ndarray:
    """Pixel-center location grid for one FPN level (dafne.py:37-44).

    Returns [h*w, 2] (x, y) positions: (col, row) * stride + stride // 2,
    row-major (y slow, x fast) to match the NHWC spatial flattening order.
    """
    xs = jnp.arange(w, dtype=dtype) * stride + stride // 2
    ys = jnp.arange(h, dtype=dtype) * stride + stride // 2
    x, y = jnp.meshgrid(xs, ys)  # [h, w] each
    return jnp.stack([x.reshape(-1), y.reshape(-1)], axis=1)


def mish(x):
    """Mish activation (dafne.py:31-34; defined by the reference as the
    alternative tower activation behind USE_RELU)."""
    return x * jnp.tanh(jax.nn.softplus(x))


def _head_conv(features, name, dtype):
    return nn.Conv(
        features,
        (3, 3),
        padding=[(1, 1), (1, 1)],
        use_bias=True,
        name=name,
        dtype=dtype,
        kernel_init=nn.initializers.normal(0.01),
        bias_init=nn.initializers.zeros,
    )


class Tower(nn.Module):
    """num_convs x (3x3 conv -> norm -> ReLU); weights shared across levels.

    With `use_deformable`, the LAST conv is a deformable 3x3 with learned
    offsets (dafne.py:310-348 tower construction)."""

    num_convs: int
    channels: int
    norm: str = "GN"
    use_deformable: bool = False
    use_relu: bool = True  # False -> Mish (MODEL.DAFNE.USE_RELU)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, level: int = 0, train: bool = False):
        for i in range(self.num_convs):
            if self.use_deformable and i == self.num_convs - 1:
                from dafne_tpu.layers.deform_conv import DeformConv2d

                x = DeformConv2d(
                    self.channels, dtype=self.dtype, name=f"conv{i}"
                )(x)
            else:
                x = _head_conv(self.channels, f"conv{i}", self.dtype)(x)
            if self.norm == "GN":
                x = nn.GroupNorm(
                    num_groups=self.channels // 8,
                    epsilon=1e-5,
                    name=f"norm{i}",
                    dtype=self.dtype,
                )(x)
            elif self.norm in ("BN", "SyncBN"):
                # Per-LEVEL BatchNorm instances like the reference's
                # ModuleListDial (dafne.py:56-66,330-343): convs share
                # weights across levels, norms do not. Running stats live in
                # the "batch_stats" collection (threaded through TrainState).
                # "Sync" semantics come for free: ONE SPMD program normalizes
                # over the global batch.
                x = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=0.9,
                    epsilon=1e-5,
                    name=f"norm{i}_level{level}",
                    dtype=self.dtype,
                )(x)
            elif self.norm not in ("", "none", None):
                raise ValueError(f"Unsupported head norm: {self.norm}")
            x = nn.relu(x) if self.use_relu else mish(x)
        return x


class DAFNeHead(nn.Module):
    """Dense head applied to every FPN level (shared weights, per-level Scale).

    Call with a list of NHWC level features; returns a dict of per-level
    lists: logits [N,H,W,C], corners [N,H,W,8], center [N,H,W,2] (or None),
    ctrness [N,H,W,1].
    """

    num_classes: int
    num_levels: int
    in_channels: int = 256
    num_cls_convs: int = 4
    num_box_convs: int = 4
    num_share_convs: int = 0
    norm: str = "GN"
    use_scale: bool = True
    prior_prob: float = 0.01
    corner_prediction: str = "center-to-corner"
    corner_tower_on_center_tower: bool = True
    merge_corner_center_pred: bool = False
    centerness: str = "oriented"  # none | plain | oriented
    ctr_on_reg: bool = True
    use_deformable: bool = False
    use_relu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray], train: bool = False) -> Dict[str, List[jnp.ndarray]]:
        assert self.corner_prediction in (
            "direct",
            "iterative",
            "center-to-corner",
            "offset",
            "angle",
        ), self.corner_prediction
        C = self.in_channels
        has_ctr = self.centerness != "none"
        has_center_tower = (
            self.corner_prediction == "center-to-corner"
            and not self.merge_corner_center_pred
        )

        share_tower = Tower(
            self.num_share_convs, C, self.norm, False, self.use_relu,
            self.dtype, name="share_tower",
        )
        cls_tower = Tower(
            self.num_cls_convs, C, self.norm, self.use_deformable,
            self.use_relu, self.dtype, name="cls_tower",
        )
        corners_tower = Tower(
            self.num_box_convs, C, self.norm, self.use_deformable,
            self.use_relu, self.dtype, name="corners_tower",
        )
        center_tower = (
            Tower(
                self.num_box_convs, C, self.norm, self.use_deformable,
                self.use_relu, self.dtype, name="center_tower",
            )
            if has_center_tower
            else None
        )

        bias_value = -math.log((1 - self.prior_prob) / self.prior_prob)
        cls_logits = nn.Conv(
            self.num_classes,
            (3, 3),
            padding=[(1, 1), (1, 1)],
            name="cls_logits",
            dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01),
            bias_init=nn.initializers.constant(bias_value),
        )
        ctrness = _head_conv(1, "ctrness", self.dtype) if has_ctr else None

        corners_pred = center_pred = xywha_pred = None
        iter_preds = None
        if self.corner_prediction in ("direct", "center-to-corner", "offset"):
            corners_pred = _head_conv(8, "corners_pred", self.dtype)
        if self.corner_prediction == "center-to-corner":
            center_pred = _head_conv(2, "center_pred", self.dtype)
        if self.corner_prediction == "angle":
            xywha_pred = _head_conv(5, "xywha_pred", self.dtype)
        if self.corner_prediction == "iterative":
            iter_preds = [_head_conv(2, f"c{i}_pred", self.dtype) for i in range(4)]

        if self.use_scale:
            scales = self.param(
                "scales", nn.initializers.ones, (self.num_levels,)
            )

        out = {"logits": [], "corners": [], "center": [], "ctrness": []}
        for level, feat in enumerate(features):
            feat = share_tower(feat, level, train)
            ct = cls_tower(feat, level, train)

            reg_center = None
            if self.corner_prediction == "direct":
                bt = corners_tower(feat, level, train)
                reg_corners = corners_pred(bt)
            elif self.corner_prediction == "iterative":
                bt = corners_tower(feat, level, train)
                cs = []
                inp = bt
                for p in iter_preds:
                    c = p(inp)
                    cs.append(c)
                    inp = jnp.concatenate([inp, c], axis=-1)
                reg_corners = jnp.concatenate(cs, axis=-1)
            elif self.corner_prediction == "center-to-corner":
                if self.merge_corner_center_pred:
                    bt = corners_tower(feat, level, train)
                    reg_center = center_pred(bt)
                    delta = corners_pred(bt)
                else:
                    cent = center_tower(feat, level, train)
                    bt = corners_tower(cent if self.corner_tower_on_center_tower else feat, level, train)
                    reg_center = center_pred(cent)
                    delta = corners_pred(bt)
                reg_corners = jnp.tile(reg_center, (1, 1, 1, 4)) + delta
            elif self.corner_prediction == "offset":
                bt = corners_tower(feat, level, train)
                base = jnp.asarray(
                    [-2.0, 2.0, 2.0, 2.0, 2.0, -2.0, -2.0, -2.0], dtype=self.dtype
                )
                reg_corners = base + corners_pred(bt)
            else:  # angle
                bt = corners_tower(feat, level, train)
                xywha = xywha_pred(bt)
                x0, y0, w, h, alpha = jnp.split(xywha, 5, axis=-1)
                c0 = jnp.concatenate([x0, y0], -1)
                c1 = jnp.concatenate([x0, y0 + h], -1)
                c2 = jnp.concatenate([x0 + w, y0 + h], -1)
                c3 = jnp.concatenate([x0 + w, y0], -1)
                corners = jnp.stack([c0, c1, c2, c3], axis=-2)  # [N,H,W,4,2]
                alpha = nn.sigmoid(alpha[..., 0]) * np.pi - np.pi / 2  # [N,H,W]
                sin, cos = jnp.sin(alpha), jnp.cos(alpha)
                # row-vector convention: c' = c @ R  (matches reference)
                r = jnp.stack(
                    [
                        jnp.stack([cos, sin], -1),
                        jnp.stack([-sin, cos], -1),
                    ],
                    axis=-2,
                )  # [N,H,W,2,2]
                mean = corners.mean(-2, keepdims=True)
                rot = jnp.einsum("...kc,...cd->...kd", corners - mean, r) + mean
                reg_corners = rot.reshape(rot.shape[:-2] + (8,))

            if self.use_scale:
                s = scales[level].astype(reg_corners.dtype)
                reg_corners = reg_corners * s
                if reg_center is not None:
                    reg_center = reg_center * s

            out["logits"].append(cls_logits(ct))
            out["corners"].append(reg_corners)
            out["center"].append(reg_center)
            if has_ctr:
                out["ctrness"].append(ctrness(bt if self.ctr_on_reg else ct))
            else:
                out["ctrness"].append(
                    jnp.ones(feat.shape[:3] + (1,), dtype=feat.dtype)
                )
        return out
