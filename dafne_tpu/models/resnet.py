"""NHWC flax ResNet backbone with Detectron2-compatible structure.

TPU-first re-design of the reference backbone stack (Detectron2 ResNet used
via dafne/modeling/backbone/fpn.py:58-91):

- NHWC layout throughout (XLA:TPU native conv layout; the reference is NCHW).
- FrozenBN is folded into a scale+bias affine op (that is *all* FrozenBN is
  at inference/training time with frozen stats) so XLA fuses it into the
  preceding conv.
- Stage freezing (MODEL.BACKBONE.FREEZE_AT, default 2 like Detectron2) is
  implemented functionally with jax.lax.stop_gradient — no mutable
  `requires_grad` state.
- bf16 compute / f32 params via an explicit dtype argument.

Parameter naming mirrors Detectron2's checkpoint keys (stem.conv1, res2.0.*,
shortcut, conv1..conv3) so the torch->JAX weight importer is a mechanical
transpose (see dafne_tpu/utils/weight_import.py).
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

# Stage specs: {depth: [blocks per stage res2..res5]}
RESNET_STAGES = {
    18: [2, 2, 2, 2],
    34: [3, 4, 6, 3],
    50: [3, 4, 6, 3],
    101: [3, 4, 23, 3],
    152: [3, 8, 36, 3],
}


class FrozenBN(nn.Module):
    """Frozen batch norm: y = (x - mean) / sqrt(var + eps) * gamma + beta.

    Stats and affine are parameters (imported from torch checkpoints), but
    never updated by the optimizer masks; mathematically it is a per-channel
    affine that XLA folds into the adjacent conv.
    """

    features: int
    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("weight", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("running_mean", nn.initializers.zeros, (self.features,))
        var = self.param("running_var", nn.initializers.ones, (self.features,))
        mul = (scale * jax.lax.rsqrt(var + self.eps)).astype(self.dtype)
        add = (bias - mean * scale * jax.lax.rsqrt(var + self.eps)).astype(self.dtype)
        return x * mul + add


class SpaceToDepthStemConv(nn.Module):
    """The 7x7/2 stem conv, lowered as space-to-depth + 4x4/1 conv.

    A direct 7x7 stride-2 conv over 3-channel input leaves the MXU's
    128-deep reduction dimension ~97% idle (C_in=3); measured on v5e it was
    the single most expensive conv of the whole network (~8 ms fwd for
    batch 8 @1024^2 — see PROFILE_TRAIN.json / README).  Folding 2x2 pixel
    blocks into channels (H,W,3) -> (H/2,W/2,12) and re-indexing the kernel
    as [4,4,12,C] (tap di = 2a+p-1: kernel zero-padded by one row/col at the
    front, then block-reshaped) yields the SAME function — every original
    tap (di,dj) appears exactly once — with 4x the reduction depth and a
    stride-1 conv.  The parameter stays "kernel" [7,7,C_in,C] so Detectron2
    checkpoint import and param trees are unchanged.
    """

    features: int
    dtype: Any = jnp.float32
    space_to_depth: bool = True

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (7, 7, c_in, self.features),
        )
        n, h, w, _ = x.shape
        x = x.astype(self.dtype)
        kernel = kernel.astype(self.dtype)
        if not self.space_to_depth or h % 2 or w % 2:
            return jax.lax.conv_general_dilated(
                x, kernel, (2, 2), ((3, 3), (3, 3)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        x2 = x.reshape(n, h // 2, 2, w // 2, 2, c_in)
        x2 = x2.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c_in)
        # di = 2a + p - 1 (a: block-space tap, p: pixel phase); pad so the
        # front row/col (di = -1) is zero, then split even/odd phases
        k = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))  # [8,8,ci,co]
        k2 = k.reshape(4, 2, 4, 2, c_in, self.features)
        k2 = k2.transpose(0, 2, 1, 3, 4, 5).reshape(
            4, 4, 4 * c_in, self.features
        )
        return jax.lax.conv_general_dilated(
            x2, k2, (1, 1), ((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


def _conv(features, kernel, stride=1, name=None, dtype=jnp.float32):
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=[(kernel // 2, kernel // 2)] * 2,
        use_bias=False,
        name=name,
        dtype=dtype,
        kernel_init=nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
    )


class BottleneckBlock(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck with optional projection shortcut.

    STRIDE_IN_1X1=True (Detectron2/Caffe2 convention, defaults.py via
    MODEL.RESNETS.STRIDE_IN_1X1) puts the stride on the first 1x1 conv.
    """

    out_channels: int
    bottleneck_channels: int
    stride: int = 1
    stride_in_1x1: bool = True
    dilation: int = 1
    deform: bool = False  # 3x3 conv -> deformable (resnet_interval.py:12-116)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        s1, s3 = (self.stride, 1) if self.stride_in_1x1 else (1, self.stride)
        shortcut = x
        if x.shape[-1] != self.out_channels or self.stride != 1:
            shortcut = _conv(
                self.out_channels, 1, self.stride, name="shortcut", dtype=self.dtype
            )(x)
            shortcut = FrozenBN(self.out_channels, dtype=self.dtype, name="shortcut_norm")(
                shortcut
            )

        y = _conv(self.bottleneck_channels, 1, s1, name="conv1", dtype=self.dtype)(x)
        y = FrozenBN(self.bottleneck_channels, dtype=self.dtype, name="conv1_norm")(y)
        y = nn.relu(y)
        if self.deform and s3 == 1 and self.dilation == 1:
            from dafne_tpu.layers.deform_conv import DeformConv2d

            y = DeformConv2d(
                self.bottleneck_channels, dtype=self.dtype, name="conv2"
            )(y)
        else:
            y = nn.Conv(
                self.bottleneck_channels,
                (3, 3),
                strides=(s3, s3),
                padding=[(self.dilation, self.dilation)] * 2,
                kernel_dilation=(self.dilation, self.dilation),
                use_bias=False,
                name="conv2",
                dtype=self.dtype,
            )(y)
        y = FrozenBN(self.bottleneck_channels, dtype=self.dtype, name="conv2_norm")(y)
        y = nn.relu(y)
        y = _conv(self.out_channels, 1, 1, name="conv3", dtype=self.dtype)(y)
        y = FrozenBN(self.out_channels, dtype=self.dtype, name="conv3_norm")(y)
        return nn.relu(y + shortcut)


class BasicBlock(nn.Module):
    """3x3 -> 3x3 residual block (ResNet-18/34)."""

    out_channels: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        shortcut = x
        if x.shape[-1] != self.out_channels or self.stride != 1:
            shortcut = _conv(
                self.out_channels, 1, self.stride, name="shortcut", dtype=self.dtype
            )(x)
            shortcut = FrozenBN(self.out_channels, dtype=self.dtype, name="shortcut_norm")(
                shortcut
            )
        y = _conv(self.out_channels, 3, self.stride, name="conv1", dtype=self.dtype)(x)
        y = FrozenBN(self.out_channels, dtype=self.dtype, name="conv1_norm")(y)
        y = nn.relu(y)
        y = _conv(self.out_channels, 3, 1, name="conv2", dtype=self.dtype)(y)
        y = FrozenBN(self.out_channels, dtype=self.dtype, name="conv2_norm")(y)
        return nn.relu(y + shortcut)


class ResNet(nn.Module):
    """Detectron2-structured ResNet trunk returning a feature pyramid dict.

    Args mirror MODEL.RESNETS.* (defaults.py). Output: {"res2": ..., "res5"}
    restricted to `out_features`, NHWC.
    """

    depth: int = 50
    out_features: Sequence[str] = ("res3", "res4", "res5")
    num_groups: int = 1
    width_per_group: int = 64
    stem_out_channels: int = 64
    res2_out_channels: int = 256
    stride_in_1x1: bool = True
    res5_dilation: int = 1
    freeze_at: int = 2
    deform_interval: int = 0  # >0: every k-th bottleneck uses a deformable 3x3
    stem_space_to_depth: bool = True  # TPU.STEM_SPACE_TO_DEPTH
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        blocks_per_stage = RESNET_STAGES[self.depth]
        use_bottleneck = self.depth >= 50

        # --- stem: 7x7/2 conv + 3x3/2 maxpool --------------------------------
        y = SpaceToDepthStemConv(
            self.stem_out_channels,
            dtype=self.dtype,
            space_to_depth=self.stem_space_to_depth,
            name="stem_conv1",
        )(x)
        y = FrozenBN(self.stem_out_channels, dtype=self.dtype, name="stem_conv1_norm")(y)
        y = nn.relu(y)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        if self.freeze_at >= 1:
            y = jax.lax.stop_gradient(y)

        outputs: Dict[str, jnp.ndarray] = {}
        out_channels = self.res2_out_channels
        bottleneck_channels = self.num_groups * self.width_per_group
        needed = set(self.out_features)
        max_stage = max(int(f[-1]) for f in needed) if needed else 5

        for stage_idx in range(2, 6):
            if stage_idx > max_stage:
                break
            name = f"res{stage_idx}"
            n_blocks = blocks_per_stage[stage_idx - 2]
            first_stride = 1 if stage_idx == 2 else 2
            dilation = self.res5_dilation if stage_idx == 5 else 1
            if dilation > 1:
                first_stride = 1
            for b in range(n_blocks):
                stride = first_stride if b == 0 else 1
                if use_bottleneck:
                    deform = (
                        self.deform_interval > 0
                        and (b % self.deform_interval == 0)
                        and stage_idx >= 3
                    )
                    y = BottleneckBlock(
                        out_channels=out_channels,
                        bottleneck_channels=bottleneck_channels,
                        stride=stride,
                        stride_in_1x1=self.stride_in_1x1,
                        dilation=dilation,
                        deform=deform,
                        dtype=self.dtype,
                        name=f"{name}_{b}",
                    )(y)
                else:
                    y = BasicBlock(
                        out_channels=out_channels,
                        stride=stride,
                        dtype=self.dtype,
                        name=f"{name}_{b}",
                    )(y)
            if self.freeze_at >= stage_idx:
                y = jax.lax.stop_gradient(y)
            if name in needed:
                outputs[name] = y
            out_channels *= 2
            bottleneck_channels *= 2
        return outputs


def resnet_feature_channels(depth: int, res2_out_channels: int = 256) -> Dict[str, int]:
    """Channel count per res-stage output."""
    return {f"res{i}": res2_out_channels * (2 ** (i - 2)) for i in range(2, 6)}


def resnet_feature_strides() -> Dict[str, int]:
    return {f"res{i}": 2 ** i for i in range(2, 6)}
