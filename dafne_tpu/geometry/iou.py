"""Exact convex-quadrilateral IoU — pure jnp, static shapes, TPU-friendly.

The reference relies on two native implementations of exact polygon IoU:
  - `poly_gpu_nms` / `poly_overlaps` CUDA kernels (DOTA_devkit) on the
    inference hot path (dafne/modeling/nms/nms.py:6-7,91), and
  - `polyiou.iou_poly` SWIG C++ (tools/prepare_dota/polyiou.cpp:108-133)
    during evaluation and tile merging.

This module is the on-device equivalent: an exact convex-convex
intersection computed with fixed-size tensor ops only, so that it can be
vmapped into an [N, M] IoU matrix inside a jitted program (and reused from
the Pallas rotated-NMS kernel).

Algorithm (the classic candidate-point formulation used by rotated-NMS GPU
kernels): the intersection of two convex quads is a convex polygon whose
vertices are a subset of
    (a) vertices of P inside Q,
    (b) vertices of Q inside P,
    (c) pairwise edge-edge intersection points (up to 16),
i.e. at most 24 candidates of which at most 8 are active.  We collect all 24
with validity masks, sort them by angle around the centroid of the valid
ones, and take the shoelace area over the valid prefix.  Duplicate candidate
points are harmless to the shoelace sum.

A float64 host-side reference implementation (independent algorithm:
Sutherland-Hodgman clipping, like polyiou.cpp) lives in
`dafne_tpu.utils.polyiou_np` and is used to cross-check this one in tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _cross(o, a, b):
    """Cross product (a - o) x (b - o); inputs [..., 2]."""
    return (a[..., 0] - o[..., 0]) * (b[..., 1] - o[..., 1]) - (
        b[..., 0] - o[..., 0]
    ) * (a[..., 1] - o[..., 1])


def _signed_area_verts(v):
    """Signed shoelace area; v: [..., K, 2]."""
    nxt = jnp.roll(v, -1, axis=-2)
    return 0.5 * jnp.sum(
        v[..., 0] * nxt[..., 1] - nxt[..., 0] * v[..., 1], axis=-1
    )


def _as_ccw(v):
    """Return vertices in counter-clockwise order; v: [4, 2]."""
    s = _signed_area_verts(v)
    return jnp.where(s < 0.0, v[::-1], v)


def _points_in_convex_poly(pts, poly, eps):
    """pts: [P, 2], poly: [K, 2] CCW -> [P] bool (boundary inclusive)."""
    a = poly  # [K, 2]
    b = jnp.roll(poly, -1, axis=0)  # [K, 2]
    # cross(b - a, p - a) >= -eps for all edges
    cr = _cross(a[None, :, :], b[None, :, :], pts[:, None, :])  # [P, K]
    return jnp.all(cr >= -eps, axis=1)


def _segment_intersections(p, q, eps):
    """All 16 edge-edge intersection points of quads p, q ([4, 2] each).

    Returns (points [16, 2], valid [16]).
    """
    a1 = jnp.repeat(p, 4, axis=0)  # [16, 2] p-edge starts
    a2 = jnp.repeat(jnp.roll(p, -1, axis=0), 4, axis=0)
    b1 = jnp.tile(q, (4, 1))  # [16, 2] q-edge starts
    b2 = jnp.tile(jnp.roll(q, -1, axis=0), (4, 1))

    d1 = a2 - a1
    d2 = b2 - b1
    denom = d1[:, 0] * d2[:, 1] - d1[:, 1] * d2[:, 0]
    diff = b1 - a1
    t = (diff[:, 0] * d2[:, 1] - diff[:, 1] * d2[:, 0]) / denom
    u = (diff[:, 0] * d1[:, 1] - diff[:, 1] * d1[:, 0]) / denom
    valid = (
        (jnp.abs(denom) > eps)
        & (t >= 0.0)
        & (t <= 1.0)
        & (u >= 0.0)
        & (u <= 1.0)
    )
    pts = a1 + t[:, None] * d1
    pts = jnp.where(valid[:, None], pts, 0.0)
    return pts, valid


def quad_intersection_area(p, q, eps=1e-7):
    """Exact intersection area of two convex quads given as [8] corner arrays."""
    pv = _as_ccw(p.reshape(4, 2))
    qv = _as_ccw(q.reshape(4, 2))

    p_in_q = _points_in_convex_poly(pv, qv, eps)  # [4]
    q_in_p = _points_in_convex_poly(qv, pv, eps)  # [4]
    inter_pts, inter_valid = _segment_intersections(pv, qv, eps)  # [16]

    pts = jnp.concatenate([pv, qv, inter_pts], axis=0)  # [24, 2]
    valid = jnp.concatenate([p_in_q, q_in_p, inter_valid], axis=0)  # [24]

    count = valid.sum()
    denom = jnp.maximum(count, 1)
    centroid = jnp.sum(
        jnp.where(valid[:, None], pts, 0.0), axis=0
    ) / denom.astype(pts.dtype)

    ang = jnp.arctan2(pts[:, 1] - centroid[1], pts[:, 0] - centroid[0])
    ang = jnp.where(valid, ang, jnp.inf)  # invalid points sort last
    order = jnp.argsort(ang)
    sorted_pts = pts[order]  # valid prefix in CCW angular order

    idx = jnp.arange(24)
    nxt_idx = jnp.where(idx + 1 < count, idx + 1, 0)
    nxt = sorted_pts[nxt_idx]
    contrib = sorted_pts[:, 0] * nxt[:, 1] - nxt[:, 0] * sorted_pts[:, 1]
    contrib = jnp.where(idx < count, contrib, 0.0)
    area = 0.5 * jnp.abs(jnp.sum(contrib))
    return jnp.where(count >= 3, area, 0.0)


def quad_iou(p, q, eps=1e-7):
    """Exact IoU of two quads ([8] each). Degenerate union handled like
    polyiou.cpp:121-126 ((inter+1)/(union+1) when union == 0)."""
    inter = quad_intersection_area(p, q, eps)
    pa = jnp.abs(_signed_area_verts(p.reshape(4, 2)))
    qa = jnp.abs(_signed_area_verts(q.reshape(4, 2)))
    union = pa + qa - inter
    return jnp.where(union == 0.0, (inter + 1.0) / (union + 1.0), inter / union)


def quad_iou_matrix(p, q, eps=1e-7):
    """Pairwise exact IoU matrix: p [N, 8], q [M, 8] -> [N, M]."""
    f = jax.vmap(jax.vmap(quad_iou, in_axes=(None, 0, None)), in_axes=(0, None, None))
    return f(p, q, eps)
