"""On-device separable image warps for TTA (north-star preprocessing stage).

The host TTA path warps every augmented copy with cv2 and ships the full
canvas to the device — ~15 canvases per image through a slow host->device
link (engine/tta.py; the reference does the same on host,
dafne/modeling/tta.py:173-262).  Every aug in the DAFNe TTA set
({multi-scale resize} x {identity, hflip, vflip, rot90-multiples}) is a
SEPARABLE affine — its linear part is a signed (anti)diagonal — so the warp
factorizes into an optional transpose plus one independent linear resample
per axis.  That lets the device generate all copies from ONE shipped base
image:

  out = R_h @ transpose?(img) @ R_w^T        (per channel)

where R_h [canvas_h, src_h] and R_w [canvas_w, src_w] are bilinear sampling
matrices with exactly two adjacent non-zeros per row.  The matrices are
built ON DEVICE from tiny (idx, weight) vectors computed on host — a few KB
per copy instead of megabytes — via one-hot iota comparisons (this repo's
standard TPU pattern: one-hot matmuls ride the MXU; no strided reverse, no
gather permutations).  Flips and rot90s cost nothing extra: they fold into
the index vectors (and a transpose for the anti-diagonal case).

Sampling semantics match the host path's cv2 INTER_LINEAR grid exactly
(half-pixel centers, border replicate): source x of output center j is
A_inv @ (j + 0.5) - 0.5 with A the boundary-coordinate affine.  The only
deviation from cv2 is arithmetic: cv2 resamples uint8 in 11-bit fixed
point, this path in float32 (<= 1 intensity-level difference; proven
mAP-neutral by the TTA gates in tools/gen_canary.py).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

from dafne_tpu.data.transforms import AffineAug

_EPS = 1e-9


@dataclasses.dataclass
class SeparableWarp:
    """Host-computed per-copy warp parameters (all tiny 1-D arrays).

    Index/weight vectors are canvas-length: rows beyond the copy's real
    output extent carry zero weights, so the one-hot matmul writes zeros
    there — the same zero padding the eval step expects from the host path.
    """

    transpose: bool
    idx0_h: np.ndarray  # [canvas_h] int32, clamped to [0, src_h-1]
    idx1_h: np.ndarray
    w0_h: np.ndarray  # [canvas_h] float32 (0 beyond out_h)
    w1_h: np.ndarray
    idx0_w: np.ndarray
    idx1_w: np.ndarray
    w0_w: np.ndarray
    w1_w: np.ndarray
    out_h: int
    out_w: int


def _axis_params(
    scale: float, offset: float, out_n: int, src_n: int, canvas_n: int,
    replicate: bool,
):
    """Bilinear sampling vectors for one axis: src = scale*dst + offset at
    pixel centers.  `replicate` border clamps taps to the edge pixel (cv2
    resize semantics — what the host fast path uses for canonical-grid
    resizes/flips); otherwise out-of-source taps contribute ZERO (cv2
    warpAffine constant border — what the host uses for non-canonical
    grids, e.g. rot90 of a non-square image cropped into its own frame)."""
    j = np.arange(canvas_n, dtype=np.float64)
    xs = scale * j + offset
    x0 = np.floor(xs)
    w1 = (xs - x0).astype(np.float32)
    w0 = 1.0 - w1
    if not replicate:
        w0 = w0 * ((x0 >= 0) & (x0 <= src_n - 1))
        w1 = w1 * ((x0 + 1 >= 0) & (x0 + 1 <= src_n - 1))
    idx0 = np.clip(x0, 0, src_n - 1).astype(np.int32)
    idx1 = np.clip(x0 + 1, 0, src_n - 1).astype(np.int32)
    live = (j < out_n).astype(np.float32)
    return idx0, idx1, w0.astype(np.float32) * live, w1.astype(np.float32) * live


def separable_warp_params(
    aug: AffineAug, src_w: int, src_h: int, canvas_hw: Tuple[int, int]
) -> Optional[SeparableWarp]:
    """Factor `aug` into per-axis sampling vectors, or None when its linear
    part is not a signed (anti)diagonal (e.g. arbitrary-angle rotation —
    those copies fall back to the host cv2 path)."""
    lin, t = aug.matrix[:, :2], aug.matrix[:, 2]
    if abs(lin[0, 1]) < _EPS and abs(lin[1, 0]) < _EPS:
        transpose = False
        sx, sy = lin[0, 0], lin[1, 1]
    elif abs(lin[0, 0]) < _EPS and abs(lin[1, 1]) < _EPS:
        transpose = True
        sx, sy = lin[0, 1], lin[1, 0]
    else:
        return None
    if abs(sx) < _EPS or abs(sy) < _EPS:
        return None

    # Image-space affine (pixel centers): A(x) = M(x + 0.5) - 0.5, as in
    # AffineAug.apply_image.  Inverse per axis: src = (dst - b) / s where
    # dst_x = sx * src_axis + bx.  With transpose, the x output samples the
    # src ROW axis (post-transpose axis 1 is src axis 0).
    bx = sx * 0.5 + t[0] - 0.5
    by = sy * 0.5 + t[1] - 0.5
    canvas_h, canvas_w = canvas_hw
    # after an optional transpose of the source, axis 0 has length:
    a0_n = src_w if transpose else src_h
    a1_n = src_h if transpose else src_w
    # Border semantics track the host path (AffineAug._axis_aligned_fast):
    # a canonical grid — |s| * src == out exactly with the canonical flip
    # translation — renders via cv2.resize (border REPLICATE); anything
    # else falls to cv2.warpAffine (constant-ZERO border).
    canonical = (
        abs(abs(sx) * a1_n - aug.out_w) <= 1e-6 * max(aug.out_w, 1)
        and abs(abs(sy) * a0_n - aug.out_h) <= 1e-6 * max(aug.out_h, 1)
        and abs(t[0] - (aug.out_w if sx < 0 else 0.0)) <= 1e-6
        and abs(t[1] - (aug.out_h if sy < 0 else 0.0)) <= 1e-6
    )
    # output row i samples source (post-transpose) axis 0 at (i - by)/sy
    idx0_h, idx1_h, w0_h, w1_h = _axis_params(
        1.0 / sy, -by / sy, aug.out_h, a0_n, canvas_h, canonical
    )
    idx0_w, idx1_w, w0_w, w1_w = _axis_params(
        1.0 / sx, -bx / sx, aug.out_w, a1_n, canvas_w, canonical
    )
    return SeparableWarp(
        transpose, idx0_h, idx1_h, w0_h, w1_h,
        idx0_w, idx1_w, w0_w, w1_w, aug.out_h, aug.out_w,
    )


def stack_warps(warps) -> dict:
    """Batch k SeparableWarp (same transpose, same canvas) into the arrays
    `device_warp` consumes."""
    assert len({w.transpose for w in warps}) == 1
    f = lambda name: np.stack([getattr(w, name) for w in warps])
    return {
        "idx0_h": f("idx0_h"), "idx1_h": f("idx1_h"),
        "w0_h": f("w0_h"), "w1_h": f("w1_h"),
        "idx0_w": f("idx0_w"), "idx1_w": f("idx1_w"),
        "w0_w": f("w0_w"), "w1_w": f("w1_w"),
    }


def _onehot_rows(p: dict, axis: str, src_n: int):
    """[?, canvas, src] sampling matrices from (idx, weight) vectors: two
    adjacent taps per row, zero rows beyond the copy's real extent
    (w0 = w1 = 0 there)."""
    import jax.numpy as jnp

    idx0, idx1 = p[f"idx0_{axis}"], p[f"idx1_{axis}"]
    w0, w1 = p[f"w0_{axis}"], p[f"w1_{axis}"]
    ar = jnp.arange(src_n, dtype=jnp.int32)
    return (
        (idx0[..., None] == ar) * w0[..., None]
        + (idx1[..., None] == ar) * w1[..., None]
    ).astype(jnp.float32)


def device_warp(img, p: dict, transpose: bool):
    """All k copies of one base image, on device.

    img: [src_h, src_w, 3] (uint8 or float); p: stacked [k, canvas_*]
    index/weight arrays; returns [k, canvas_h, canvas_w, 3] float32.
    Jit-traceable; `transpose` is static.
    """
    import jax
    import jax.numpy as jnp

    x = jnp.asarray(img).astype(jnp.float32)
    if transpose:
        x = x.transpose(1, 0, 2)
    src0, src1 = x.shape[0], x.shape[1]

    rh = _onehot_rows(p, "h", src0)
    rw = _onehot_rows(p, "w", src1)
    # [k,Ch,S0] @ [S0,S1,3] -> [k,Ch,S1,3] -> with [k,Cw,S1] -> [k,Ch,Cw,3]
    # HIGHEST precision: the TPU default runs matmuls in bf16, whose 8-bit
    # mantissa costs ~2 intensity levels on 0-255 pixels — full f32 keeps
    # the documented <=1-level deviation vs cv2, and the warp is a
    # negligible share of the fused eval program either way
    hi = jax.lax.Precision.HIGHEST
    y = jnp.einsum("kis,sjc->kijc", rh, x, precision=hi)
    return jnp.einsum("kijc,kwj->kiwc", y, rw, precision=hi)


def device_warp_batch(imgs, p: dict):
    """One warp per image over a BATCH, on device (the train-time analog of
    `device_warp`'s per-image TTA copies — TPU.TRAIN_DEVICE_AUG).

    imgs: [B, S0, S1, 3] uint8/float base images on a static canvas, HOST
    pre-transposed when the draw's linear part is anti-diagonal (a transpose
    is a memcpy on host; per-image dynamic transposes don't exist under
    static shapes).  p: stacked [B, canvas_*] index/weight arrays from
    `separable_warp_params` (whose vectors already describe the
    post-transpose source).  Returns [B, canvas_h, canvas_w, 3] float32 with
    exact zero padding beyond each image's real output extent.
    """
    import jax
    import jax.numpy as jnp

    x = jnp.asarray(imgs).astype(jnp.float32)
    rh = _onehot_rows(p, "h", x.shape[1])  # [B, Ch, S0]
    rw = _onehot_rows(p, "w", x.shape[2])  # [B, Cw, S1]
    hi = jax.lax.Precision.HIGHEST
    y = jnp.einsum("bis,bsjc->bijc", rh, x, precision=hi)
    return jnp.einsum("bijc,bwj->biwc", y, rw, precision=hi)


def draw_color_params(rng) -> dict:
    """Host-side draw of the d2 color-jitter parameters, consuming `rng` in
    EXACTLY the order `transforms.apply_color_augmentations` does — so a
    given example seed yields the same jitter on the host and device paths.
    Returns small per-example arrays for `device_color_aug`."""
    from dafne_tpu.data.transforms import (
        _LIGHTING_EIGEN_VALS,
        _LIGHTING_EIGEN_VECS,
    )

    weights = rng.normal(scale=1.0, size=3)
    light = _LIGHTING_EIGEN_VECS.dot(weights * _LIGHTING_EIGEN_VALS)
    return {
        "color_light": light.astype(np.float32),  # additive RGB/BGR shift
        "color_w": np.asarray(
            [rng.uniform(0.5, 1.5) for _ in range(3)], np.float32
        ),  # brightness, contrast, saturation blend weights (d2 order)
    }


def device_color_aug(img, light, w, out_hw):
    """Batched on-device d2 color jitter (INPUT.USE_COLOR_AUGMENTATIONS).

    Mirrors `transforms.apply_color_augmentations` — RandomLighting(1.0),
    RandomBrightness, RandomContrast, RandomSaturation with uint8
    clip+truncate BETWEEN stages — on the warped canvas.  The host applies
    the jitter to the tight warped image before canvas placement; here the
    canvas already exists, so every stage is masked back to the live
    [out_h, out_w] region (contrast adds a constant and lighting an offset
    that would otherwise bleed into the zero padding) and the contrast mean
    normalizes by the live pixel count, not the canvas.  Deviation from the
    host path: float32 arithmetic per stage instead of numpy float64
    (<= 1 intensity level, same class of deviation as the warp itself).

    img: [B, Ch, Cw, 3] float32 warped canvases; light: [B, 3]; w: [B, 3]
    (brightness, contrast, saturation); out_hw: [B, 2] int32.
    """
    import jax
    import jax.numpy as jnp

    b, ch, cw, _ = img.shape
    oh = out_hw[:, 0][:, None, None, None]
    ow = out_hw[:, 1][:, None, None, None]
    ih = jax.lax.broadcasted_iota(jnp.int32, (1, ch, 1, 1), 1)
    iw = jax.lax.broadcasted_iota(jnp.int32, (1, 1, cw, 1), 2)
    mask = ((ih < oh) & (iw < ow)).astype(jnp.float32)
    live = (oh * ow * 3).astype(jnp.float32)

    def stage(y):  # d2 inter-stage uint8 round-trip: clip then truncate
        return jnp.floor(jnp.clip(y, 0.0, 255.0)) * mask

    x = stage(jnp.round(img))  # the host path's cv2 warp output is uint8
    x = stage(x + light[:, None, None, :])
    wb, wc, ws = w[:, 0], w[:, 1], w[:, 2]
    x = stage(wb[:, None, None, None] * x)
    mean = jnp.sum(x, axis=(1, 2, 3), keepdims=True) / live
    x = stage((1.0 - wc)[:, None, None, None] * mean
              + wc[:, None, None, None] * x)
    gray = jnp.sum(
        x * jnp.asarray([0.299, 0.587, 0.114], jnp.float32), axis=-1,
        keepdims=True,
    )
    return stage((1.0 - ws)[:, None, None, None] * gray
                 + ws[:, None, None, None] * x)
