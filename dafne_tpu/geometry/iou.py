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
    """Return vertices in counter-clockwise order; v: [4, 2].

    Static permutation instead of v[::-1] — the strided reverse crashes the
    XLA:TPU fusion emitter when fused into broadcasted programs (see
    _as_ccw_batched).
    """
    s = _signed_area_verts(v)
    rev = jnp.stack([v[3], v[2], v[1], v[0]])
    return jnp.where(s < 0.0, rev, v)


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


def _oe_sort24(keys, xs, ys):
    """Odd-even transposition sort of 24 keys + 2 payload channels.

    XLA's generic variadic sort (argsort + payload gather) lowers poorly on
    TPU for tiny minor dimensions inside huge batches (it dominated the NMS
    IoU matrix).  A fixed 24-round compare-exchange network is branch-free,
    uses only static permutations + selects, and vectorizes perfectly over
    the pair batch.  Inputs/outputs: [..., 24].
    """
    n = 24
    idx = jnp.arange(n)
    for r in range(n):
        if r % 2 == 0:
            partner = jnp.where(idx % 2 == 0, idx + 1, idx - 1)
        else:
            partner = jnp.where(idx % 2 == 1, idx + 1, idx - 1)
        partner = jnp.clip(partner, 0, n - 1)
        pk = keys[..., partner]
        px = xs[..., partner]
        py = ys[..., partner]
        is_left = partner > idx
        take_partner = jnp.where(
            partner == idx,
            False,
            jnp.where(is_left, keys > pk, keys < pk),
        )
        keys = jnp.where(take_partner, pk, keys)
        xs = jnp.where(take_partner, px, xs)
        ys = jnp.where(take_partner, py, ys)
    return keys, xs, ys


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
    big = jnp.asarray(1e30, ang.dtype)
    keys = jnp.where(valid, ang, big)  # invalid points sort last
    keys, xs, ys = _oe_sort24(keys, pts[:, 0], pts[:, 1])
    sorted_pts = jnp.stack([xs, ys], axis=-1)  # valid prefix in CCW order

    idx = jnp.arange(24)
    nxt_idx = jnp.where(idx + 1 < count, idx + 1, 0)
    nxt = sorted_pts[nxt_idx]
    contrib = sorted_pts[:, 0] * nxt[:, 1] - nxt[:, 0] * sorted_pts[:, 1]
    contrib = jnp.where(idx < count, contrib, 0.0)
    area = 0.5 * jnp.abs(jnp.sum(contrib))
    return jnp.where(count >= 3, area, 0.0)


def _as_ccw_batched(v):
    """[..., 4, 2] -> CCW order, batched.

    NOTE: uses a static permutation instead of `v[..., ::-1, :]` — the
    strided reverse triggers an XLA:TPU fusion-emitter CHECK crash
    (ReverseInput::TransformWindow pad_low==-2) when fused into the
    broadcasted IoU computation.
    """
    s = _signed_area_verts(v)
    rev = jnp.stack(
        [v[..., 3, :], v[..., 2, :], v[..., 1, :], v[..., 0, :]], axis=-2
    )
    return jnp.where(s[..., None, None] < 0.0, rev, v)


def _clipped_edge_integral(a, b, qv, eps, include_boundary):
    """Line-integral contribution of edge a->b clipped to convex CCW quad qv.

    a, b: [..., 2]; qv: [..., 4, 2].  Returns [...]:
    0.5 * cross(pa, pb) of the clipped sub-segment (Cyrus-Beck parametric
    clipping against the 4 half-planes), 0 if the edge misses the quad.
    All ops elementwise — no sorts, no gathers.

    Collinear-on-boundary handling (`include_boundary=False` for the second
    polygon's loop): a piece lying exactly on the other quad's edge belongs
    to both boundaries.  If the coincident edges point the SAME way the
    piece is real shared boundary and must be counted once (first loop
    only); if ANTI-parallel the intersection is degenerate there and the
    two opposite-direction contributions must both be kept so they cancel.
    """
    d = b - a  # [..., 2]
    e = jnp.roll(qv, -1, axis=-2) - qv  # [..., 4, 2] edge vectors
    rel = a[..., None, :] - qv  # [..., 4, 2] (a - q_k)
    # num_k = cross(e_k, a - q_k);  den_k = cross(e_k, d)
    num = e[..., 0] * rel[..., 1] - e[..., 1] * rel[..., 0]  # [..., 4]
    den = e[..., 0] * d[..., None, 1] - e[..., 1] * d[..., None, 0]  # [..., 4]

    # Scale-RELATIVE tolerances.  For exactly coincident edges `den` is 0 in
    # real arithmetic, but FMA contraction leaves O(ulp * |e||d|) residue —
    # for image-scale coords that's ~1e-2, far above any absolute epsilon.
    # Missing the parallel branch there double-counts shared boundary and
    # produces inter > union (observed as garbage self-IoU whenever XLA
    # fused this differently, e.g. under lax.map).  Tolerances proportional
    # to the term magnitudes are immune to both the coordinate scale and
    # the compiler's contraction choices.
    den_tol = eps * (
        jnp.abs(e[..., 0] * d[..., None, 1]) + jnp.abs(e[..., 1] * d[..., None, 0])
    )
    num_tol = eps * (
        jnp.abs(e[..., 0] * rel[..., 1]) + jnp.abs(e[..., 1] * rel[..., 0])
    )

    big = jnp.asarray(1e30, a.dtype)
    parallel = jnp.abs(den) <= den_tol
    ratio = -num / jnp.where(parallel, 1.0, den)
    # entering (den>0): t >= ratio ; exiting (den<0): t <= ratio
    t_low = jnp.where(den > den_tol, ratio, -big)
    t_high = jnp.where(den < -den_tol, ratio, big)
    # parallel & outside -> empty interval
    outside = parallel & (num < -num_tol)
    if not include_boundary:
        same_dir = (e[..., 0] * d[..., None, 0] + e[..., 1] * d[..., None, 1]) > 0
        on_boundary = parallel & (jnp.abs(num) <= num_tol)
        outside = outside | (on_boundary & same_dir)
    t_low = jnp.where(outside, big, t_low)
    t_high = jnp.where(outside, -big, t_high)

    t0 = jnp.maximum(t_low.max(-1), 0.0)
    t1 = jnp.minimum(t_high.min(-1), 1.0)
    pa = a + t0[..., None] * d
    pb = a + t1[..., None] * d
    contrib = 0.5 * (pa[..., 0] * pb[..., 1] - pa[..., 1] * pb[..., 0])
    return jnp.where(t0 < t1, contrib, 0.0)


def quad_intersection_area_clip(p, q, eps=1e-6):
    """Exact intersection area via boundary line integral (batched [..., 8]).

    area(P ∩ Q) = 0.5 ∮ (x dy - y dx) over the intersection boundary, which
    decomposes into P's edges clipped to Q plus Q's edges clipped to P.
    Exact for convex quads, fully elementwise (the TPU-fast formulation used
    by the rotated-NMS hot path; cross-validated against the candidate-point
    method and the float64 Sutherland-Hodgman reference in tests).
    """
    pv = _as_ccw_batched(p.reshape(p.shape[:-1] + (4, 2)))
    qv = _as_ccw_batched(q.reshape(q.shape[:-1] + (4, 2)))
    total = jnp.zeros(p.shape[:-1], p.dtype)
    for k in range(4):
        total = total + _clipped_edge_integral(
            pv[..., k, :], pv[..., (k + 1) % 4, :], qv, eps, True
        )
        total = total + _clipped_edge_integral(
            qv[..., k, :], qv[..., (k + 1) % 4, :], pv, eps, False
        )
    return jnp.maximum(total, 0.0)


def quad_iou(p, q, eps=1e-7, method: str = "clip"):
    """Exact IoU of two quads ([..., 8], broadcastable). Degenerate union
    handled like polyiou.cpp:121-126 ((inter+1)/(union+1) when union == 0)."""
    if method == "clip":
        p, q = jnp.broadcast_arrays(p, q)
        inter = quad_intersection_area_clip(p, q, eps=max(eps, 1e-6))
    else:
        inter = quad_intersection_area(p, q, eps)
    pa = jnp.abs(_signed_area_verts(p.reshape(p.shape[:-1] + (4, 2))))
    qa = jnp.abs(_signed_area_verts(q.reshape(q.shape[:-1] + (4, 2))))
    # inter <= min(pa, qa) holds in real arithmetic; enforcing it bounds
    # numerical noise so union > 0 and IoU <= 1 for any non-degenerate pair.
    inter = jnp.minimum(inter, jnp.minimum(pa, qa))
    union = pa + qa - inter
    return jnp.where(union == 0.0, (inter + 1.0) / (union + 1.0), inter / union)


def _quad_iou_matrix_dense(p, q, eps=1e-7, method="clip"):
    if method == "clip":
        return quad_iou(p[:, None, :], q[None, :, :], eps, method="clip")
    f = jax.vmap(
        jax.vmap(lambda a, b: quad_iou(a, b, eps, "points"), in_axes=(None, 0)),
        in_axes=(0, None),
    )
    return f(p, q)


def quad_iou_matrix(p, q, eps=1e-7, chunk=256, method="clip"):
    """Pairwise exact IoU matrix: p [N, 8], q [M, 8] -> [N, M].

    Row blocks are processed under `lax.map` to bound the peak memory of the
    broadcasted elementwise intermediates (~chunk*M*O(30) floats).
    """
    n = p.shape[0]
    if chunk is None or n <= chunk:
        return _quad_iou_matrix_dense(p, q, eps, method)
    pad = (-n) % chunk
    pp = jnp.pad(p, ((0, pad), (0, 0)))
    blocks = pp.reshape(-1, chunk, 8)
    out = jax.lax.map(lambda b: _quad_iou_matrix_dense(b, q, eps, method), blocks)
    return out.reshape(-1, q.shape[0])[:n]
