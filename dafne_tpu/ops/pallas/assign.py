"""Pallas TPU kernel: dense target-assignment argmin.

The XLA scan version of the assignment (ops/targets.py) streams ~15
[K, chunk] f32 intermediates through HBM per chunk (~38 ms/step at batch 8,
21824 locations x 256 gt on v5e).  This kernel tiles the locations axis and
keeps the whole [TILE_K, M] pair computation in VMEM, emitting only the
per-location (min_area, argmin) pair.  Target vectors for the winning gt are
gathered afterwards in XLA ([K]-sized gathers, assignment has no gradient
path).

Semantics identical to assign_targets_single (verified in
tests/test_pallas_assign.py) up to the float-marginal in-quad boundary:
the reference's triangle-area containment test compares
sum(4 triangle areas) > quad_area + 1e-3 (dafne_outputs.py:109-119), and
for interior points the two sides are EQUAL mathematically — the 1e-3
absorbs f32 rounding, which for areas ~1e4 is itself ~1e-3.  Any two
summation orders therefore disagree on a handful (<0.1%) of exactly-
boundary locations; these are inherently ambiguous assignments (the torch
reference has the same sensitivity).  Tie-breaks (min-area, first index)
are exact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

TILE_K = 256
INF = 100000000.0


def _assign_kernel(
    xs_ref, ys_ref, st_ref, lo_ref, hi_ref,  # location operands [TILE_K, 1]
    cor_ref, hb_ref, area_ref, valid_ref,  # gt operands (transposed, [*, M])
    min_ref, arg_ref,  # outputs [TILE_K, 1]
    *, radius, center_sample, center_sample_only, combine_center_sample,
    enable_in_box_check, enable_level_filter, eps,
):
    x = xs_ref[:, :]  # [K, 1]
    y = ys_ref[:, :]
    st = st_ref[:, :]
    lo = lo_ref[:, :]
    hi = hi_ref[:, :]
    hb = [hb_ref[i : i + 1, :] for i in range(4)]  # x0, y0, x1, y1 [1, M]
    area = area_ref[0:1, :]
    valid = valid_ref[0:1, :] != 0

    l = x - hb[0]
    t = y - hb[1]
    r = hb[2] - x
    b = hb[3] - y
    max_ltrb = jnp.maximum(jnp.maximum(l, r), jnp.maximum(t, b))
    min_ltrb = jnp.minimum(jnp.minimum(l, r), jnp.minimum(t, b))

    if center_sample:
        cx = 0.5 * (hb[0] + hb[2])
        cy = 0.5 * (hb[1] + hb[3])
        rad = st * radius
        xmin = jnp.maximum(cx - rad, hb[0])
        ymin = jnp.maximum(cy - rad, hb[1])
        xmax = jnp.minimum(cx + rad, hb[2])
        ymax = jnp.minimum(cy + rad, hb[3])
        in_center = (
            jnp.minimum(
                jnp.minimum(x - xmin, xmax - x), jnp.minimum(y - ymin, ymax - y)
            )
            > 0
        )
    else:
        in_center = min_ltrb > 0

    if center_sample_only:
        is_in = in_center
    else:
        # point-in-quad via triangle areas (dafne_outputs.py:101-119)
        qx = [cor_ref[2 * k : 2 * k + 1, :] for k in range(4)]
        qy = [cor_ref[2 * k + 1 : 2 * k + 2, :] for k in range(4)]
        tri_sum = jnp.zeros_like(l)
        for k in range(4):
            ax, ay = qx[k], qy[k]
            bx, by = qx[(k + 1) % 4], qy[(k + 1) % 4]
            tri_sum += 0.5 * jnp.abs(
                (ax - x) * (by - y) - (ay - y) * (bx - x)
            )
        in_quad = ~(tri_sum > (area + eps))
        is_in = (in_center & in_quad) if combine_center_sample else in_quad

    area_mat = jnp.where(valid, jnp.broadcast_to(area, l.shape), INF)
    if enable_in_box_check:
        area_mat = jnp.where(is_in, area_mat, INF)
    if enable_level_filter:
        cared = (max_ltrb >= lo) & (max_ltrb <= hi)
        area_mat = jnp.where(cared, area_mat, INF)

    m_val = area_mat.min(axis=1, keepdims=True)
    min_ref[:, :] = m_val
    # first-index tie-break (torch .min semantics, dafne_outputs.py:474);
    # Mosaic's argmin lowering does not guarantee it
    col = jax.lax.broadcasted_iota(jnp.int32, area_mat.shape, 1)
    big = jnp.asarray(2 ** 30, jnp.int32)
    arg_ref[:, :] = jnp.min(
        jnp.where(area_mat == m_val, col, big), axis=1, keepdims=True
    )


def assign_argmin(
    locations: jnp.ndarray,  # [K, 2]
    loc_strides: jnp.ndarray,  # [K]
    size_ranges: jnp.ndarray,  # [K, 2]
    gt_corners: jnp.ndarray,  # [M, 8]
    gt_hbox: jnp.ndarray,  # [M, 4]
    gt_area: jnp.ndarray,  # [M]
    gt_valid: jnp.ndarray,  # [M] bool
    spec,
    interpret: bool = False,
):
    """(min_area [K], argmin [K]) via the Pallas kernel. K padded internally."""
    k = locations.shape[0]
    m = gt_corners.shape[0]
    pad = (-k) % TILE_K
    xs = jnp.pad(locations[:, 0], (0, pad)).reshape(-1, 1)
    ys = jnp.pad(locations[:, 1], (0, pad)).reshape(-1, 1)
    st = jnp.pad(loc_strides, (0, pad)).reshape(-1, 1)
    lo = jnp.pad(size_ranges[:, 0], (0, pad)).reshape(-1, 1)
    hi = jnp.pad(size_ranges[:, 1], (0, pad)).reshape(-1, 1)
    kp = xs.shape[0]

    kernel = functools.partial(
        _assign_kernel,
        radius=spec.pos_radius,
        center_sample=spec.center_sample,
        center_sample_only=spec.center_sample_only,
        combine_center_sample=spec.combine_center_sample,
        enable_in_box_check=spec.enable_in_box_check,
        enable_level_filter=spec.enable_level_size_filtering,
        eps=1e-3,
    )
    loc_spec = pl.BlockSpec((TILE_K, 1), lambda i: (i, 0))
    gt_specs = [
        pl.BlockSpec((8, m), lambda i: (0, 0)),
        pl.BlockSpec((4, m), lambda i: (0, 0)),
        pl.BlockSpec((1, m), lambda i: (0, 0)),
        pl.BlockSpec((1, m), lambda i: (0, 0)),
    ]
    min_area, argmin = pl.pallas_call(
        kernel,
        grid=(kp // TILE_K,),
        in_specs=[loc_spec] * 5 + gt_specs,
        out_specs=(
            pl.BlockSpec((TILE_K, 1), lambda i: (i, 0)),
            pl.BlockSpec((TILE_K, 1), lambda i: (i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((kp, 1), jnp.float32),
            jax.ShapeDtypeStruct((kp, 1), jnp.int32),
        ),
        interpret=interpret,
    )(
        xs, ys, st, lo, hi,
        gt_corners.T.astype(jnp.float32),
        gt_hbox.T.astype(jnp.float32),
        gt_area.reshape(1, m).astype(jnp.float32),
        gt_valid.reshape(1, m).astype(jnp.int8),
    )
    return min_area[:k, 0], argmin[:k, 0]
