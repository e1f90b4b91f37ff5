"""Deformable 3x3 convolution in pure XLA (gather-based bilinear sampling).

Replaces the reference's CUDA DeformConv/ModulatedDeformConv wrappers
(dafne/layers/deform_conv.py:198-381 around detectron2's CUDA ops, used by
the head towers when MODEL.DAFNE.USE_DEFORMABLE — OFF in every shipped
config, SURVEY.md §2.8 N4).

Formulation: a deformable KxK conv is a 1x1 conv over K*K bilinearly-sampled
feature taps.  Sampling positions are base-grid + per-location offsets
(learned from a side conv, or generated from predicted geometry via the
*_to_offsets helpers mirroring deform_conv.py:23-195).  Bilinear sampling is
4 gathers per tap over the flattened spatial axis — fine for an optional
feature; a Pallas DMA-gather kernel is the upgrade path if it ever becomes
hot.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn


def bilinear_sample(x: jnp.ndarray, px: jnp.ndarray, py: jnp.ndarray) -> jnp.ndarray:
    """Sample x [N, H, W, C] at float positions px, py [N, H', W'] (pixel
    index space, 0..W-1).  Returns [N, H', W', C].

    Semantics match the reference CUDA DeformConv: a sample fully outside
    the map contributes 0 (zero padding), and each of the 4 corner taps is
    zero-weighted when its integer coordinate falls outside — NOT clamped
    to the border, which would systematically distort activations at map
    edges for imported reference weights.

    Coordinates/weights are computed in float32 regardless of the feature
    dtype: bf16 positions quantize to ~0.5 px over most of a 128-wide map
    (8 significand bits), destroying the sub-pixel offsets this op exists
    for.
    """
    n, h, w, c = x.shape
    px = px.astype(jnp.float32)
    py = py.astype(jnp.float32)
    x0f = jnp.floor(px)
    y0f = jnp.floor(py)
    wx = px - x0f
    wy = py - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    x1 = x0 + 1
    y1 = y0 + 1

    flat = x.reshape(n, h * w, c)

    def gather(yi, xi):
        inb = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        idx = jnp.where(inb, yi * w + xi, 0).reshape(n, -1)  # [N, H'*W']
        out = jnp.take_along_axis(flat, idx[:, :, None], axis=1)
        out = out.reshape(px.shape + (c,))
        return out * inb[..., None].astype(out.dtype)

    v00 = gather(y0, x0)
    v01 = gather(y0, x1)
    v10 = gather(y1, x0)
    v11 = gather(y1, x1)
    wx = wx[..., None].astype(x.dtype)
    wy = wy[..., None].astype(x.dtype)
    return (
        v00 * (1 - wx) * (1 - wy)
        + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy
        + v11 * wx * wy
    )


class DeformConv2d(nn.Module):
    """3x3 deformable conv (stride 1): offsets [N, H, W, 18] (dy, dx per tap,
    torchvision ordering), optional modulation mask [N, H, W, 9]."""

    features: int
    dtype: Any = jnp.float32
    with_learned_offsets: bool = True

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        offsets: Optional[jnp.ndarray] = None,
        mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        n, h, w, c = x.shape
        if offsets is None:
            if self.with_learned_offsets:
                offsets = nn.Conv(
                    18, (3, 3), padding=[(1, 1)] * 2, name="offset_conv",
                    dtype=self.dtype, kernel_init=nn.initializers.zeros,
                )(x)
            else:
                offsets = jnp.zeros(x.shape[:3] + (18,), x.dtype)

        # f32 coordinates regardless of compute dtype (see bilinear_sample)
        ys = jnp.arange(h, dtype=jnp.float32)
        xs = jnp.arange(w, dtype=jnp.float32)
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")  # [H, W]

        taps = []
        k = 0
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                oy = offsets[..., 2 * k].astype(jnp.float32)
                ox = offsets[..., 2 * k + 1].astype(jnp.float32)
                py = gy[None] + dy + oy
                px = gx[None] + dx + ox
                t = bilinear_sample(x, px, py)
                if mask is not None:
                    t = t * mask[..., k : k + 1]
                taps.append(t)
                k += 1
        stacked = jnp.concatenate(taps, axis=-1)  # [N, H, W, 9C]
        return nn.Conv(
            self.features, (1, 1), use_bias=False, name="weight",
            dtype=self.dtype, kernel_init=nn.initializers.normal(0.01),
        )(stacked)


# ---------------------------------------------------------------------------
# geometry -> offset generators (deform_conv.py:23-195 equivalents)
# ---------------------------------------------------------------------------


def _grid_offsets(py, px, h, w, dtype):
    """Convert absolute 3x3 target positions [N, H, W, 3, 3] into offsets
    relative to each LOCATION (not the full conv grid), interleaved
    (dy, dx) x 9.

    NOTE: the reference's generators (deform_conv.py:23-195) all emit
    location-relative points and let the CUDA op add its base kernel
    offsets ON TOP, so the effective sample is point + base(+-1, +-1).
    DeformConv2d here mirrors that (py = grid + base + offset), so the
    offsets must NOT remove the base term — weight parity over geometric
    prettiness (previously only corners_to_offsets matched).
    """
    gy = jnp.arange(h, dtype=dtype)[None, :, None, None, None]
    gx = jnp.arange(w, dtype=dtype)[None, None, :, None, None]
    oy = py - gy
    ox = px - gx
    inter = jnp.stack([oy, ox], axis=-1)  # [N, H, W, 3, 3, 2]
    return inter.reshape(inter.shape[:3] + (18,))


def ltrb_to_offsets(ltrb: jnp.ndarray, stride: float = 1.0) -> jnp.ndarray:
    """Sampling grid spanning the predicted (l, t, r, b) box around each
    location (ltrb_to_offset_mask, deform_conv.py:23-76).  ltrb [N,H,W,4]
    in feature-map units."""
    n, h, w, _ = ltrb.shape
    dtype = ltrb.dtype
    gy = jnp.arange(h, dtype=dtype)[None, :, None]
    gx = jnp.arange(w, dtype=dtype)[None, None, :]
    l, t, r, b = [ltrb[..., i] / stride for i in range(4)]
    x0, x1 = gx - l, gx + r
    y0, y1 = gy - t, gy + b
    fr = jnp.asarray([0.0, 0.5, 1.0], dtype)
    py = y0[..., None, None] + (y1 - y0)[..., None, None] * fr.reshape(1, 1, 1, 3, 1)
    px = x0[..., None, None] + (x1 - x0)[..., None, None] * fr.reshape(1, 1, 1, 1, 3)
    py = jnp.broadcast_to(py, (n, h, w, 3, 3))
    px = jnp.broadcast_to(px, (n, h, w, 3, 3))
    return _grid_offsets(py, px, h, w, dtype)


def hbox_to_offsets(hbox: jnp.ndarray, stride: float = 1.0) -> jnp.ndarray:
    """Grid over an absolute hbox (x0, y0, x1, y1) per location
    (hbox_to_offset_mask, deform_conv.py:78-130)."""
    n, h, w, _ = hbox.shape
    dtype = hbox.dtype
    x0, y0, x1, y1 = [hbox[..., i] / stride for i in range(4)]
    fr = jnp.asarray([0.0, 0.5, 1.0], dtype)
    py = y0[..., None, None] + (y1 - y0)[..., None, None] * fr.reshape(1, 1, 1, 3, 1)
    px = x0[..., None, None] + (x1 - x0)[..., None, None] * fr.reshape(1, 1, 1, 1, 3)
    py = jnp.broadcast_to(py, (n, h, w, 3, 3))
    px = jnp.broadcast_to(px, (n, h, w, 3, 3))
    return _grid_offsets(py, px, h, w, dtype)


def center_to_offsets(center: jnp.ndarray, stride: float = 1.0) -> jnp.ndarray:
    """Shift the whole 3x3 grid to the predicted center offset
    (center_to_offset_mask, deform_conv.py:133-147). center [N,H,W,2]."""
    cy = center[..., 1] / stride
    cx = center[..., 0] / stride
    off = jnp.stack([cy, cx], -1)  # (dy, dx)
    return jnp.tile(off, (1, 1, 1, 9))


def corners_to_offsets(corners: jnp.ndarray, stride: float = 1.0) -> jnp.ndarray:
    """Sample at the 4 predicted corners + their midpoints + center
    (corners_to_offset_mask, deform_conv.py:150-195). corners [N,H,W,8]
    relative to each location."""
    c = corners / stride
    cs = c.reshape(c.shape[:3] + (4, 2))  # (x, y) per corner
    mids = 0.5 * (cs + jnp.roll(cs, -1, axis=-2))
    center = cs.mean(-2, keepdims=True)
    pts = jnp.concatenate([cs, mids, center], axis=-2)  # 9 points (x, y)
    off = jnp.stack([pts[..., 1], pts[..., 0]], -1)  # (dy, dx)
    return off.reshape(off.shape[:3] + (18,))
