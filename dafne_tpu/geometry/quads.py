"""Quadrilateral geometry primitives — pure jnp, static-shape, TPU-friendly.

These are the numerics at the heart of DAFNe-style oriented detection.
Behavioral contracts mirror the reference implementation (cited per function)
but every function here is natively batched/vectorized so it can live inside
a single jitted SPMD step: no data-dependent shapes, no Python loops over
boxes or images.

Reference behavior contracts:
- corner canonicalization:  dafne/utils/sort_corners.py:26-92
- point-to-line distances:  dafne/modeling/dafne/dafne_outputs.py:53-76
- point-in-quadrilateral:   dafne/modeling/dafne/dafne_outputs.py:96-119
- centerness targets:       dafne/modeling/dafne/dafne_outputs.py:79-93
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _cross2d(a, b):
    """2D cross product over the last axis (shape [..., 2])."""
    return a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]


def quad_signed_area(corners):
    """Signed shoelace area of quads given as [..., 8] = (x0,y0,...,x3,y3).

    Positive for counter-clockwise vertex order (in a y-up frame).
    """
    c = corners.reshape(corners.shape[:-1] + (4, 2))
    nxt = jnp.roll(c, shift=-1, axis=-2)
    return 0.5 * jnp.sum(
        c[..., 0] * nxt[..., 1] - nxt[..., 0] * c[..., 1], axis=-1
    )


def quad_area(corners):
    """Absolute shoelace area of quads [..., 8]."""
    return jnp.abs(quad_signed_area(corners))


def enclosing_hbox(corners):
    """Axis-aligned enclosing box (xmin, ymin, xmax, ymax) of quads [..., 8].

    Mirrors the hbox derivation in dafne_outputs.py:884-892.
    """
    xs = corners[..., 0::2]
    ys = corners[..., 1::2]
    return jnp.stack(
        [xs.min(-1), ys.min(-1), xs.max(-1), ys.max(-1)], axis=-1
    )


def sort_quadrilateral(corners):
    """Canonical corner ordering ("Algorithm 1", Modulated Loss paper).

    Matches the vectorized reference (sort_corners.py:26-92) semantics:
      - p1 = vertex with minimal x (first index on ties, like torch.min)
      - p3 = first remaining vertex (in original order) whose line through p1
        separates the other two (i.e. the diagonal partner)
      - p2/p4 oriented by the sign of cross(p3-p1, s-p1): the candidate with
        positive cross becomes p2.  (The reference's loop degenerates to:
        p2 = sA if c(sA)>0 else (sB if c(sB)>0 else sA); we reproduce that,
        including the both-nonpositive degenerate fallback.)

    Degenerate quads where no diagonal is found fall back to the first
    remaining candidate as p3 (the reference leaves zeros there; such quads
    are filtered out upstream by the dataset degeneracy checks, so this
    differs only on inputs the reference never produces).

    Args:
      corners: [..., 8] float array.
    Returns:
      [..., 8] canonically ordered corners.
    """
    shape = corners.shape
    c = corners.reshape(-1, 4, 2)
    n = c.shape[0]

    # ---- decision phase (index computation, no gradient needed) ----------
    # Everything here is pure arithmetic over the 4-wide minor axis: no
    # sorts, no take_along_axis gathers, no dynamic one_hot.  Row-gathers /
    # tiny-minor-dim sorts over ~170k rows cost ~15 ms/step on v5e (measured
    # in PROFILE_TRAIN.json — they were the single hottest op of the whole
    # train step); the same decisions as mask-reductions are ~free.  The
    # permutation CHOICE is discrete, so it lives under stop_gradient; the
    # values are permuted at the end with a one-hot matmul whose backward is
    # another tiny matmul (a scatter-add-free gradient).
    cd = jax.lax.stop_gradient(c)
    ar4 = jnp.arange(4)
    f32 = cd.dtype

    left_idx = jnp.argmin(cd[:, :, 0], axis=1)  # first min index on ties
    oh_left = ar4[None, :] == left_idx[:, None]  # [N, 4] bool
    p1 = jnp.einsum("nj,njc->nc", oh_left.astype(f32), cd)

    v = cd - p1[:, None, :]  # [N, 4, 2]; v[left] = 0
    # cross[j, k] = cross2d(v_j, v_k) for all vertex pairs
    cross = (
        v[:, :, None, 0] * v[:, None, :, 1]
        - v[:, :, None, 1] * v[:, None, :, 0]
    )  # [N, 4, 4]

    # Diagonal detection: candidate j (j != left) is the diagonal partner if
    # the other two remaining vertices lie on opposite sides of line
    # (p1, c_j), i.e. the product of their crosses with v_j is negative.
    not_left = ~oh_left
    others = not_left[:, None, :] & ~jnp.eye(4, dtype=bool)[None]  # [N,j,k]
    pair_prod = jnp.prod(jnp.where(others, cross, 1.0), axis=2)  # [N, 4]
    cond = (pair_prod < 0.0) & not_left

    # First j in original index order (remaining vertices keep original
    # relative order, so this equals the reference's first-in-rem-order);
    # fallback when no diagonal is found: the first remaining vertex.
    first_rem = jnp.argmax(not_left, axis=1)
    idx_p3 = jnp.where(jnp.any(cond, axis=1), jnp.argmax(cond, axis=1), first_rem)
    oh_p3 = ar4[None, :] == idx_p3[:, None]

    # The two leftover candidates in original order: first True index and
    # (sum of True indices - first).
    leftover = not_left & ~oh_p3  # [N, 4], exactly two True
    idx_a = jnp.argmax(leftover, axis=1)
    idx_b = jnp.sum(ar4[None, :] * leftover, axis=1) - idx_a
    oh_a = ar4[None, :] == idx_a[:, None]
    oh_b = ar4[None, :] == idx_b[:, None]

    # ca = cross(p3 - p1, sa - p1) = cross[p3, a] (and likewise cb), read
    # from the cross matrix by mask-reduction.
    wa = (oh_p3[:, :, None] & oh_a[:, None, :]).astype(f32)
    wb = (oh_p3[:, :, None] & oh_b[:, None, :]).astype(f32)
    ca = jnp.sum(wa * cross, axis=(1, 2))
    cb = jnp.sum(wb * cross, axis=(1, 2))
    take_a = (ca > 0.0) | ((ca <= 0.0) & (cb <= 0.0))

    oh_p2 = jnp.where(take_a[:, None], oh_a, oh_b)
    oh_p4 = jnp.where(take_a[:, None], oh_b, oh_a)

    # ---- value phase: permutation as a one-hot matmul --------------------
    p = jnp.stack([oh_left, oh_p2, oh_p3, oh_p4], axis=1).astype(c.dtype)
    out = jnp.einsum("nij,njc->nic", p, c).reshape(n, 8)
    return out.reshape(shape)


def point_to_line_distance(p1, p2, x0, y0):
    """Distance from point (x0, y0) to the infinite line through p1, p2.

    p1, p2: [..., 2]; x0, y0: broadcastable to p1[..., 0].
    Mirrors dafne_outputs.py:53-64 (no epsilon guard: NaN for degenerate
    edges, handled downstream by `centerness_targets` nan flushing).
    """
    x1, y1 = p1[..., 0], p1[..., 1]
    x2, y2 = p2[..., 0], p2[..., 1]
    nom = jnp.abs((y2 - y1) * x0 - (x2 - x1) * y0 + x2 * y1 - y2 * x1)
    denom = jnp.sqrt((y2 - y1) ** 2 + (x2 - x1) ** 2)
    return nom / denom


def compute_abcd(corners, locations):
    """Oriented edge distances (a, b, c, d) from locations to quad edges.

    Args:
      corners: [..., 8] quads (canonically sorted).
      locations: [..., 2] points, broadcast-compatible with corners' batch.
    Returns:
      [..., 4] distance to each of the 4 edges (c0c1, c1c2, c2c3, c3c0).

    Mirrors compute_abcd (dafne_outputs.py:67-76), but broadcast-batched
    instead of materializing a K x N repeat.
    """
    c = corners.reshape(corners.shape[:-1] + (4, 2))
    nxt = jnp.roll(c, shift=-1, axis=-2)
    x0 = locations[..., None, 0]
    y0 = locations[..., None, 1]
    return point_to_line_distance(c, nxt, x0, y0)


def _triangle_area(a, b, c):
    """Area of triangles; a, b, c: [..., 2]. Mirrors dafne_outputs.py:101-106."""
    return 0.5 * jnp.abs(_cross2d(a - c, b - c))


def is_in_quadrilateral(corners, quad_area_val, locations, eps=1e-3):
    """Test whether locations lie inside (sorted) quads via triangle areas.

    The four triangles (edge, point) tile the quad exactly iff the point is
    inside; the reference allows an epsilon of 1e-3 (dafne_outputs.py:109-119).

    Args:
      corners: [..., 8]; quad_area_val: [...]; locations: [..., 2].
    Returns:
      [...] boolean.
    """
    c = corners.reshape(corners.shape[:-1] + (4, 2))
    nxt = jnp.roll(c, shift=-1, axis=-2)
    loc = locations[..., None, :]
    tri = _triangle_area(c, nxt, loc)  # [..., 4]
    return ~(tri.sum(-1) > (quad_area_val + eps))


def centerness_targets(reg_targets, alpha):
    """Oriented/plain centerness: ((min/max)(0,2) * (min/max)(1,3)) ** (1/alpha).

    Operates on 4-vectors that are either ltrb or abcd distances.
    NaNs (degenerate geometry) flush to 0 like dafne_outputs.py:79-93.

    Args:
      reg_targets: [..., 4]; alpha: scalar smoothing exponent.
    Returns:
      [...] centerness in [0, 1].
    """
    lr = reg_targets[..., 0::2]
    tb = reg_targets[..., 1::2]
    ctr = (lr.min(-1) / lr.max(-1)) * (tb.min(-1) / tb.max(-1))
    ctr = ctr ** (1.0 / alpha)
    return jnp.nan_to_num(ctr, nan=0.0, posinf=0.0, neginf=0.0)
