"""Feature Pyramid Network + P6/P7 extra levels (NHWC flax).

Re-designs the reference's backbone assembly (dafne/modeling/backbone/
fpn.py:16-91: Detectron2 FPN over res3-5 plus LastLevelP6P7 / LastLevelP6)
as a single flax module. Strides 8..128, shared out_channels (default 256).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn


def _init_conv(features, kernel, stride=1, name=None, dtype=jnp.float32):
    pad = kernel // 2
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=[(pad, pad)] * 2,
        use_bias=True,
        name=name,
        dtype=dtype,
        # Detectron2 FPN uses Caffe2XavierFill == glorot on fan_in
        kernel_init=nn.initializers.variance_scaling(1.0, "fan_in", "uniform"),
    )


def _upsample_nearest_2x(x):
    """Nearest-neighbor 2x upsample in NHWC without gathers (TPU-friendly)."""
    n, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)


class FPN(nn.Module):
    """Top-down FPN over `in_features` + extra P6/P7 heads.

    top_block: "p6p7" (LastLevelP6P7 on P5, fpn.py:16-37), "p6"
    (LastLevelP6, fpn.py:40-55) or "" for none.  `top_block_in` selects the
    input of the extra convs ("p5" like the reference default, or "res5").
    """

    in_features: Sequence[str] = ("res3", "res4", "res5")
    out_channels: int = 256
    top_block: str = "p6p7"
    top_block_in: str = "p5"
    fuse_type: str = "sum"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        inputs = [features[f] for f in self.in_features]  # low->high stride

        # lateral 1x1 + output 3x3, top-down pathway
        laterals = [
            _init_conv(
                self.out_channels, 1, name=f"lateral_{f}", dtype=self.dtype
            )(x)
            for f, x in zip(self.in_features, inputs)
        ]
        merged = [None] * len(laterals)
        merged[-1] = laterals[-1]
        for i in range(len(laterals) - 2, -1, -1):
            up = _upsample_nearest_2x(merged[i + 1])
            up = up[:, : laterals[i].shape[1], : laterals[i].shape[2], :]
            fused = laterals[i] + up
            if self.fuse_type == "avg":
                fused = fused / 2.0
            merged[i] = fused

        outs: Dict[str, jnp.ndarray] = {}
        for i, f in enumerate(self.in_features):
            level = int(f[-1])  # res3 -> p3
            outs[f"p{level}"] = _init_conv(
                self.out_channels, 3, name=f"output_p{level}", dtype=self.dtype
            )(merged[i])

        top_level = max(int(f[-1]) for f in self.in_features)
        if self.top_block in ("p6p7", "p6"):
            src = (
                outs[f"p{top_level}"]
                if self.top_block_in == f"p{top_level}"
                else features.get(self.top_block_in, outs[f"p{top_level}"])
            )
            p6 = _init_conv(self.out_channels, 3, 2, name="p6", dtype=self.dtype)(src)
            outs[f"p{top_level + 1}"] = p6
            if self.top_block == "p6p7":
                p7 = _init_conv(
                    self.out_channels, 3, 2, name="p7", dtype=self.dtype
                )(nn.relu(p6))
                outs[f"p{top_level + 2}"] = p7
        return outs
