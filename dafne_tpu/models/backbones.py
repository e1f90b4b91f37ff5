"""Alternative backbone trunks (NHWC flax): ResNet-LPF, DLA, VoVNet, MobileNetV2.

Fresh implementations of the reference's backbone families
(dafne/modeling/backbone/resnet_lpf.py, dla.py, vovnet.py, mobilenet.py,
resnet_interval.py), normalized to a common contract: every trunk maps
images -> {"res3": s8, "res4": s16, "res5": s32} NHWC features so the same
FPN + head stack composes over any of them.

- ResNet-LPF: anti-aliased downsampling (Zhang 2019 "Making Convolutional
  Networks Shift-Invariant Again"): stride-2 ops become stride-1 + binomial
  blur-pool, selected via MODEL.BACKBONE.ANTI_ALIAS like fpn.py:67-68.
- DLA-34: Deep Layer Aggregation with hierarchical trees (dla.py:233-441).
- VoVNet V2 (+eSE): one-shot-aggregation blocks (vovnet.py:125-376).
- MobileNetV2: inverted residual trunk (mobilenet.py:70-155).
- ResNet-interval: ResNet whose 3x3 convs are deformable every
  DEFORM_INTERVAL-th block (resnet_interval.py:12-116) — composed from the
  base ResNet with the XLA deformable conv (dafne_tpu/layers/deform_conv.py).
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np


# ---------------------------------------------------------------------------
# shared bits
# ---------------------------------------------------------------------------


# Frozen-stats batchnorm affine: same params/math as the trunk's FrozenBN;
# aliased so checkpoint naming and any future fix stay in ONE place.
from dafne_tpu.models.resnet import FrozenBN as BN  # noqa: E402


def conv(ch, k, s=1, name=None, dtype=jnp.float32, groups=1, bias=False):
    return nn.Conv(
        ch, (k, k), strides=(s, s), padding=[(k // 2, k // 2)] * 2,
        feature_group_count=groups, use_bias=bias, name=name, dtype=dtype,
        kernel_init=nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
    )


def blur_pool(x, stride=2, dtype=jnp.float32):
    """Binomial [1,2,1]^T [1,2,1] depthwise blur + subsample (lpf.py:8-48).

    The reference Downsample REFLECT-pads by (1,1) before the strided
    depthwise filter (lpf.py:39 ``get_pad_layer('reflect')``) — zero padding
    would darken borders and break numeric parity (tests/test_backbones.py
    pins this against a torch re-statement)."""
    c = x.shape[-1]
    f1 = np.asarray([1.0, 2.0, 1.0])
    f2 = np.outer(f1, f1)
    f2 = f2 / f2.sum()
    kernel = jnp.asarray(f2, dtype)[:, :, None, None]  # HWIO depthwise
    kernel = jnp.tile(kernel, (1, 1, 1, c))
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    return jax.lax.conv_general_dilated(
        x.astype(dtype), kernel, (stride, stride), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )


# ---------------------------------------------------------------------------
# ResNet-LPF (anti-aliased ResNet)
# ---------------------------------------------------------------------------


class LPFBottleneck(nn.Module):
    out_channels: int
    bottleneck_channels: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        shortcut = x
        if x.shape[-1] != self.out_channels or self.stride != 1:
            s = x
            if self.stride != 1:
                s = blur_pool(s, self.stride, self.dtype)
            s = conv(self.out_channels, 1, 1, "shortcut", self.dtype)(s)
            shortcut = BN(self.out_channels, dtype=self.dtype, name="shortcut_norm")(s)
        y = conv(self.bottleneck_channels, 1, 1, "conv1", self.dtype)(x)
        y = nn.relu(BN(self.bottleneck_channels, dtype=self.dtype, name="conv1_norm")(y))
        # anti-aliased stride: 3x3 stride-1 conv then blur-pool
        y = conv(self.bottleneck_channels, 3, 1, "conv2", self.dtype)(y)
        y = nn.relu(BN(self.bottleneck_channels, dtype=self.dtype, name="conv2_norm")(y))
        if self.stride != 1:
            y = blur_pool(y, self.stride, self.dtype)
        y = conv(self.out_channels, 1, 1, "conv3", self.dtype)(y)
        y = BN(self.out_channels, dtype=self.dtype, name="conv3_norm")(y)
        return nn.relu(y + shortcut)


class ResNetLPF(nn.Module):
    """Anti-aliased ResNet-50/101 trunk (resnet_lpf.py:270+)."""

    depth: int = 50
    out_features: Sequence[str] = ("res3", "res4", "res5")
    freeze_at: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from dafne_tpu.models.resnet import RESNET_STAGES

        blocks = RESNET_STAGES[self.depth]
        y = conv(64, 7, 2, "stem_conv1", self.dtype)(x)
        y = nn.relu(BN(64, dtype=self.dtype, name="stem_conv1_norm")(y))
        # anti-aliased maxpool: the reference's pool_only stem is a 2x2
        # stride-1 VALID max (resnet_lpf.py:169 — NOT 3x3/pad-1; output is
        # H-1) followed by the reflect-pad blur-pool
        y = nn.max_pool(y, (2, 2), strides=(1, 1), padding="VALID")
        y = blur_pool(y, 2, self.dtype)
        if self.freeze_at >= 1:
            y = jax.lax.stop_gradient(y)

        outs = {}
        out_ch, bott = 256, 64
        for stage in range(2, 6):
            for b in range(blocks[stage - 2]):
                stride = 2 if (b == 0 and stage > 2) else 1
                y = LPFBottleneck(
                    out_ch, bott, stride, self.dtype, name=f"res{stage}_{b}"
                )(y)
            if self.freeze_at >= stage:
                y = jax.lax.stop_gradient(y)
            if f"res{stage}" in self.out_features:
                outs[f"res{stage}"] = y
            out_ch *= 2
            bott *= 2
        return outs


# ---------------------------------------------------------------------------
# DLA (Deep Layer Aggregation)
# ---------------------------------------------------------------------------


class DLABasic(nn.Module):
    channels: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, residual=None):
        if residual is None:
            residual = x
        y = conv(self.channels, 3, self.stride, "conv1", self.dtype)(x)
        y = nn.relu(BN(self.channels, dtype=self.dtype, name="bn1")(y))
        y = conv(self.channels, 3, 1, "conv2", self.dtype)(y)
        y = BN(self.channels, dtype=self.dtype, name="bn2")(y)
        return nn.relu(y + residual)


class DLABottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck (dla.py:69-107, expansion 2).

    The reference sizes every BN to `planes` even though conv1/conv2 emit
    `planes // expansion` channels — a latent crash in code its registry
    never instantiates (dla.py import is commented out upstream).  Here the
    norms match their conv widths, which is the only runnable reading.
    """

    channels: int
    stride: int = 1
    cardinality: int = 0  # 0 = plain bottleneck; >0 = ResNeXt grouped conv
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, residual=None):
        if residual is None:
            residual = x
        if self.cardinality:
            bottle = self.channels * self.cardinality // 32  # dla.py:119
            groups = self.cardinality
        else:
            bottle = self.channels // 2  # expansion 2, dla.py:75
            groups = 1
        y = conv(bottle, 1, 1, "conv1", self.dtype)(x)
        y = nn.relu(BN(bottle, dtype=self.dtype, name="bn1")(y))
        y = nn.Conv(
            bottle, (3, 3), (self.stride, self.stride),
            padding=[(1, 1), (1, 1)], use_bias=False,
            feature_group_count=groups, name="conv2", dtype=self.dtype,
        )(y)
        y = nn.relu(BN(bottle, dtype=self.dtype, name="bn2")(y))
        y = conv(self.channels, 1, 1, "conv3", self.dtype)(y)
        y = BN(self.channels, dtype=self.dtype, name="bn3")(y)
        return nn.relu(y + residual)


def _dla_block(block: str, channels, stride, cardinality, dtype, name):
    if block == "basic":
        return DLABasic(channels, stride, dtype, name=name)
    if block == "bottleneck":
        return DLABottleneck(channels, stride, 0, dtype, name=name)
    if block == "bottleneckx":
        return DLABottleneck(channels, stride, cardinality, dtype, name=name)
    raise ValueError(block)


class DLARoot(nn.Module):
    channels: int
    shortcut: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, children: List[jnp.ndarray]):
        x = jnp.concatenate(children, axis=-1)
        x = conv(self.channels, 1, 1, "conv", self.dtype)(x)
        x = BN(self.channels, dtype=self.dtype, name="bn")(x)
        if self.shortcut:
            x = x + children[0]
        return nn.relu(x)


class DLATree(nn.Module):
    levels: int
    channels: int
    stride: int = 1
    level_root: bool = False
    root_shortcut: bool = False
    block: str = "basic"  # basic | bottleneck | bottleneckx
    cardinality: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, children: Tuple[jnp.ndarray, ...] = ()):
        children = list(children)
        bottom = (
            nn.max_pool(x, (self.stride, self.stride), strides=(self.stride, self.stride))
            if self.stride > 1
            else x
        )
        residual = bottom
        if bottom.shape[-1] != self.channels:
            residual = conv(self.channels, 1, 1, "project", self.dtype)(bottom)
            residual = BN(self.channels, dtype=self.dtype, name="project_bn")(residual)
        if self.level_root:
            children.append(bottom)

        if self.levels == 1:
            t1 = _dla_block(
                self.block, self.channels, self.stride, self.cardinality,
                self.dtype, "tree1",
            )(x, residual)
            t2 = _dla_block(
                self.block, self.channels, 1, self.cardinality, self.dtype,
                "tree2",
            )(t1)
            return DLARoot(self.channels, self.root_shortcut, self.dtype, name="root")(
                [t2, t1] + children
            )
        t1 = DLATree(
            self.levels - 1, self.channels, self.stride,
            root_shortcut=self.root_shortcut, block=self.block,
            cardinality=self.cardinality, dtype=self.dtype, name="tree1",
        )(x)
        return DLATree(
            self.levels - 1, self.channels, 1,
            root_shortcut=self.root_shortcut, block=self.block,
            cardinality=self.cardinality, dtype=self.dtype, name="tree2",
        )(t1, tuple(children + [t1]))


# DLA family (dla.py:310-441): levels, channels, block, root residual, cardinality
DLA_SPECS = {
    "DLA34": ((1, 1, 1, 2, 2, 1), (16, 32, 64, 128, 256, 512), "basic", False, 32),
    "DLA46_C": ((1, 1, 1, 2, 2, 1), (16, 32, 64, 64, 128, 256), "bottleneck", False, 32),
    "DLA46X_C": ((1, 1, 1, 2, 2, 1), (16, 32, 64, 64, 128, 256), "bottleneckx", False, 32),
    "DLA60X_C": ((1, 1, 1, 2, 3, 1), (16, 32, 64, 64, 128, 256), "bottleneckx", False, 32),
    "DLA60": ((1, 1, 1, 2, 3, 1), (16, 32, 128, 256, 512, 1024), "bottleneck", False, 32),
    "DLA60X": ((1, 1, 1, 2, 3, 1), (16, 32, 128, 256, 512, 1024), "bottleneckx", False, 32),
    "DLA102": ((1, 1, 1, 3, 4, 1), (16, 32, 128, 256, 512, 1024), "bottleneck", True, 32),
    "DLA102X": ((1, 1, 1, 3, 4, 1), (16, 32, 128, 256, 512, 1024), "bottleneckx", True, 32),
    "DLA102X2": ((1, 1, 1, 3, 4, 1), (16, 32, 128, 256, 512, 1024), "bottleneckx", True, 64),
    "DLA169": ((1, 1, 2, 3, 5, 1), (16, 32, 128, 256, 512, 1024), "bottleneck", True, 32),
}


class DLA(nn.Module):
    """DLA trunk family (dla.py:233-441).  `body` selects the variant
    (MODEL.DLA.CONV_BODY); res3/4/5 are dla stages 3..5.  The reference's
    level0/level1 conv counts are 1 in every published variant, matched
    here with single conv layers."""

    body: str = "DLA34"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        levels, ch, block, root_res, card = DLA_SPECS[self.body.upper()]
        y = conv(ch[0], 7, 1, "base_conv", self.dtype)(x)
        y = nn.relu(BN(ch[0], dtype=self.dtype, name="base_bn")(y))
        y = conv(ch[0], 3, 1, "level0_conv", self.dtype)(y)
        y = nn.relu(BN(ch[0], dtype=self.dtype, name="level0_bn")(y))
        y = conv(ch[1], 3, 2, "level1_conv", self.dtype)(y)
        y = nn.relu(BN(ch[1], dtype=self.dtype, name="level1_bn")(y))

        def tree(lv, c, level_root, name):
            return DLATree(
                lv, c, 2, level_root, root_shortcut=root_res, block=block,
                cardinality=card, dtype=self.dtype, name=name,
            )

        y = tree(levels[2], ch[2], False, "level2")(y)
        outs = {}
        y = tree(levels[3], ch[3], True, "level3")(y)
        outs["res3"] = y  # stride 8
        y = tree(levels[4], ch[4], True, "level4")(y)
        outs["res4"] = y  # stride 16
        y = tree(levels[5], ch[5], True, "level5")(y)
        outs["res5"] = y  # stride 32
        return outs


# ---------------------------------------------------------------------------
# VoVNet V2 (+eSE)
# ---------------------------------------------------------------------------

VOVNET_SPECS = {
    # name: (stem, stage_conv_ch, stage_out_ch, per-block convs, blocks/stage)
    "V-19-eSE": ((64, 64, 128), (128, 160, 192, 224), (256, 512, 768, 1024), 3, (1, 1, 1, 1)),
    "V-39-eSE": ((64, 64, 128), (128, 160, 192, 224), (256, 512, 768, 1024), 5, (1, 1, 2, 2)),
    "V-57-eSE": ((64, 64, 128), (128, 160, 192, 224), (256, 512, 768, 1024), 5, (1, 1, 4, 3)),
    "V-99-eSE": ((64, 64, 128), (128, 160, 192, 224), (256, 512, 768, 1024), 5, (1, 3, 9, 3)),
}


class ESE(nn.Module):
    """Effective squeeze-excite (vovnet V2)."""

    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = x.mean(axis=(1, 2), keepdims=True)
        s = nn.Dense(self.channels, name="fc", dtype=self.dtype)(s)
        return x * jax.nn.hard_sigmoid(s)


class OSABlock(nn.Module):
    conv_ch: int
    out_ch: int
    num_convs: int
    identity: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        feats = [x]
        y = x
        for i in range(self.num_convs):
            y = conv(self.conv_ch, 3, 1, f"conv{i}", self.dtype)(y)
            y = nn.relu(BN(self.conv_ch, dtype=self.dtype, name=f"bn{i}")(y))
            feats.append(y)
        y = jnp.concatenate(feats, axis=-1)
        y = conv(self.out_ch, 1, 1, "concat_conv", self.dtype)(y)
        y = nn.relu(BN(self.out_ch, dtype=self.dtype, name="concat_bn")(y))
        y = ESE(self.out_ch, self.dtype, name="ese")(y)
        if self.identity:
            y = y + x
        return y


class VoVNet(nn.Module):
    """VoVNet V2 trunk (vovnet.py:125-376); res3/4/5 = stages 3..5."""

    spec: str = "V-39-eSE"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        stem_ch, conv_ch, out_ch, n_convs, n_blocks = VOVNET_SPECS[self.spec]
        y = conv(stem_ch[0], 3, 2, "stem1", self.dtype)(x)
        y = nn.relu(BN(stem_ch[0], dtype=self.dtype, name="stem1_bn")(y))
        y = conv(stem_ch[1], 3, 1, "stem2", self.dtype)(y)
        y = nn.relu(BN(stem_ch[1], dtype=self.dtype, name="stem2_bn")(y))
        y = conv(stem_ch[2], 3, 2, "stem3", self.dtype)(y)
        y = nn.relu(BN(stem_ch[2], dtype=self.dtype, name="stem3_bn")(y))  # s4

        outs = {}
        for stage in range(4):  # stages 2..5, strides 4, 8, 16, 32
            if stage > 0:
                y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
            for b in range(n_blocks[stage]):
                y = OSABlock(
                    conv_ch[stage], out_ch[stage], n_convs,
                    identity=(b > 0), dtype=self.dtype,
                    name=f"stage{stage + 2}_block{b}",
                )(y)
            if stage >= 1:
                outs[f"res{stage + 2}"] = y
        return outs


# ---------------------------------------------------------------------------
# MobileNetV2
# ---------------------------------------------------------------------------

_MBV2_CFG = [  # (expansion, out_ch, blocks, stride)
    (1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
    (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1),
]


class InvertedResidual(nn.Module):
    expansion: int
    out_ch: int
    stride: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        hidden = in_ch * self.expansion
        y = x
        if self.expansion != 1:
            y = conv(hidden, 1, 1, "expand", self.dtype)(y)
            y = nn.relu6(BN(hidden, dtype=self.dtype, name="expand_bn")(y))
        y = conv(hidden, 3, self.stride, "dw", self.dtype, groups=hidden)(y)
        y = nn.relu6(BN(hidden, dtype=self.dtype, name="dw_bn")(y))
        y = conv(self.out_ch, 1, 1, "project", self.dtype)(y)
        y = BN(self.out_ch, dtype=self.dtype, name="project_bn")(y)
        if self.stride == 1 and in_ch == self.out_ch:
            y = y + x
        return y


class MobileNetV2(nn.Module):
    """MobileNetV2 trunk (mobilenet.py:70-155); res3/4/5 at strides 8/16/32."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = conv(32, 3, 2, "stem", self.dtype)(x)
        y = nn.relu6(BN(32, dtype=self.dtype, name="stem_bn")(y))
        outs = {}
        stride = 2
        idx = 0
        for e, c, n, s in _MBV2_CFG:
            for b in range(n):
                blk_s = s if b == 0 else 1
                if blk_s == 2 and stride in (8, 16, 32):
                    outs[f"res{int(np.log2(stride))}"] = y
                stride *= blk_s
                y = InvertedResidual(e, c, blk_s, self.dtype, name=f"block{idx}")(y)
                idx += 1
        outs[f"res{int(np.log2(stride))}"] = y
        return {k: outs[k] for k in ("res3", "res4", "res5")}
