"""Unit tests for the quadrilateral geometry core.

Test strategy per SURVEY.md §4: pure-function unit tests on hand-crafted
geometry + randomized cross-validation between independent implementations
(jnp candidate-point IoU vs float64 NumPy Sutherland-Hodgman clipping, and
vectorized corner sort vs a sequential reference port).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from dafne_tpu.geometry import (
    sort_quadrilateral,
    quad_area,
    quad_signed_area,
    enclosing_hbox,
    compute_abcd,
    is_in_quadrilateral,
    centerness_targets,
    quad_iou,
    quad_iou_matrix,
)
from dafne_tpu.utils import polyiou_np


def random_convex_quads(n, rng, scale=100.0):
    """Random rotated rectangles + jitter (guaranteed convex, non-degenerate)."""
    cx = rng.uniform(0, scale, n)
    cy = rng.uniform(0, scale, n)
    w = rng.uniform(5, scale / 2, n)
    h = rng.uniform(5, scale / 2, n)
    ang = rng.uniform(0, 2 * np.pi, n)
    base = np.stack(
        [
            np.stack([-w / 2, -h / 2], -1),
            np.stack([w / 2, -h / 2], -1),
            np.stack([w / 2, h / 2], -1),
            np.stack([-w / 2, h / 2], -1),
        ],
        axis=1,
    )  # [n, 4, 2]
    c, s = np.cos(ang), np.sin(ang)
    rot = np.stack([np.stack([c, -s], -1), np.stack([s, c], -1)], -2)  # [n,2,2]
    pts = np.einsum("nij,nkj->nki", rot, base)
    pts = pts + np.stack([cx, cy], -1)[:, None, :]
    return pts.reshape(n, 8)


# ---------------------------------------------------------------------------
# Corner sorting
# ---------------------------------------------------------------------------


def _sort_sequential(box):
    """Sequential reference port of sort_corners.py:105-153 semantics."""
    s = [box[i * 2 : i * 2 + 2] for i in range(4)]

    def cross2d(a, b):
        return a[0] * b[1] - a[1] * b[0]

    leftmost = int(np.argmin([p[0] for p in s]))
    p1 = s[leftmost]
    rem = [p for i, p in enumerate(s) if i != leftmost]
    p3, others = None, None
    for j, s1 in enumerate(rem):
        o = [p for k, p in enumerate(rem) if k != j]
        l = cross2d(s1 - p1, o[0] - p1)
        r = cross2d(s1 - p1, o[1] - p1)
        if l * r < 0:
            p3, others = s1, o
            break
    if p3 is None:  # degenerate fallback mirroring the vectorized argmax(0)
        p3, others = rem[0], rem[1:]
    ca = cross2d(p3 - p1, others[0] - p1)
    cb = cross2d(p3 - p1, others[1] - p1)
    if ca > 0 or (ca <= 0 and cb <= 0):
        p2, p4 = others
    else:
        p4, p2 = others
    return np.concatenate([p1, p2, p3, p4])


def test_sort_matches_sequential_reference():
    rng = np.random.RandomState(0)
    quads = random_convex_quads(200, rng)
    # feed in shuffled corner order
    for i in range(len(quads)):
        perm = rng.permutation(4)
        quads[i] = quads[i].reshape(4, 2)[perm].reshape(8)
    got = np.asarray(sort_quadrilateral(jnp.asarray(quads)))
    want = np.stack([_sort_sequential(q) for q in quads])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_sort_properties():
    rng = np.random.RandomState(1)
    quads = random_convex_quads(100, rng)
    out = np.asarray(sort_quadrilateral(jnp.asarray(quads))).reshape(-1, 4, 2)
    # p1 is the leftmost vertex
    assert np.allclose(out[:, 0, 0], out[:, :, 0].min(1))
    # p1p3 and p2p4 are the diagonals: they must intersect
    p1, p2, p3, p4 = out[:, 0], out[:, 1], out[:, 2], out[:, 3]

    def cross(o, a, b):
        return (a[:, 0] - o[:, 0]) * (b[:, 1] - o[:, 1]) - (b[:, 0] - o[:, 0]) * (
            a[:, 1] - o[:, 1]
        )

    # p2 and p4 strictly on opposite sides of the p1p3 diagonal
    assert np.all(cross(p1, p3, p2) * cross(p1, p3, p4) < 0)
    # sorting is idempotent
    again = np.asarray(sort_quadrilateral(jnp.asarray(out.reshape(-1, 8))))
    np.testing.assert_allclose(again, out.reshape(-1, 8), atol=1e-4)


def test_sort_shape_polymorphic():
    rng = np.random.RandomState(2)
    quads = random_convex_quads(12, rng).reshape(3, 4, 8)
    out = sort_quadrilateral(jnp.asarray(quads))
    assert out.shape == (3, 4, 8)
    flat = sort_quadrilateral(jnp.asarray(quads.reshape(-1, 8)))
    np.testing.assert_allclose(np.asarray(out).reshape(-1, 8), np.asarray(flat))


# ---------------------------------------------------------------------------
# Areas, hboxes, abcd, in-quad, centerness
# ---------------------------------------------------------------------------


def test_quad_area_unit_square():
    sq = jnp.array([0.0, 0, 1, 0, 1, 1, 0, 1])
    assert float(quad_area(sq)) == pytest.approx(1.0)
    assert float(quad_signed_area(sq)) == pytest.approx(1.0)
    assert float(quad_signed_area(sq.reshape(4, 2)[::-1].reshape(8))) == pytest.approx(-1.0)


def test_enclosing_hbox():
    q = jnp.array([[2.0, 1, 5, 3, 4, 7, 0, 6]])
    hb = np.asarray(enclosing_hbox(q))
    np.testing.assert_allclose(hb, [[0, 1, 5, 7]])


def test_abcd_axis_aligned():
    # Rect [0,10]x[0,4], corners sorted from (0,0) CW in image coords
    q = jnp.array([0.0, 0, 10, 0, 10, 4, 0, 4])
    loc = jnp.array([3.0, 1.0])
    abcd = np.asarray(compute_abcd(q, loc))
    # edges: (0,0)-(10,0) top, (10,0)-(10,4) right, (10,4)-(0,4) bottom, (0,4)-(0,0) left
    np.testing.assert_allclose(abcd, [1.0, 7.0, 3.0, 3.0], atol=1e-5)


def test_is_in_quadrilateral():
    q = jnp.array([0.0, 0, 10, 0, 10, 4, 0, 4])
    area = quad_area(q)
    inside = is_in_quadrilateral(q, area, jnp.array([5.0, 2.0]))
    outside = is_in_quadrilateral(q, area, jnp.array([11.0, 2.0]))
    assert bool(inside) and not bool(outside)


def test_is_in_quadrilateral_batched():
    rng = np.random.RandomState(3)
    quads = random_convex_quads(50, rng)
    areas = quad_area(jnp.asarray(quads))
    centers = quads.reshape(-1, 4, 2).mean(1)
    res = is_in_quadrilateral(jnp.asarray(quads), areas, jnp.asarray(centers))
    assert np.all(np.asarray(res))
    far = centers + 1e4
    res2 = is_in_quadrilateral(jnp.asarray(quads), areas, jnp.asarray(far))
    assert not np.any(np.asarray(res2))


def test_centerness_targets():
    # perfectly centered -> 1; on the edge -> 0
    t = jnp.array([[2.0, 3.0, 2.0, 3.0], [0.0, 3.0, 2.0, 3.0]])
    ctr = np.asarray(centerness_targets(t, alpha=5))
    assert ctr[0] == pytest.approx(1.0)
    assert ctr[1] == pytest.approx(0.0)
    # nan flushes to 0 (degenerate)
    t2 = jnp.array([[0.0, 0.0, 0.0, 0.0]])
    assert np.asarray(centerness_targets(t2, alpha=5))[0] == 0.0


# ---------------------------------------------------------------------------
# Exact IoU: hand cases + cross-validation of independent algorithms
# ---------------------------------------------------------------------------

UNIT_SQ = np.array([0.0, 0, 1, 0, 1, 1, 0, 1])


def test_iou_identical():
    assert float(quad_iou(jnp.asarray(UNIT_SQ), jnp.asarray(UNIT_SQ))) == pytest.approx(
        1.0, abs=1e-5
    )
    assert polyiou_np.iou_poly(UNIT_SQ, UNIT_SQ) == pytest.approx(1.0)


def test_iou_disjoint():
    other = UNIT_SQ + np.array([5.0, 0] * 4)
    assert float(quad_iou(jnp.asarray(UNIT_SQ), jnp.asarray(other))) == 0.0
    assert polyiou_np.iou_poly(UNIT_SQ, other) == 0.0


def test_iou_half_overlap():
    other = UNIT_SQ + np.array([0.5, 0] * 4)
    want = 0.5 / 1.5
    assert float(quad_iou(jnp.asarray(UNIT_SQ), jnp.asarray(other))) == pytest.approx(
        want, abs=1e-5
    )
    assert polyiou_np.iou_poly(UNIT_SQ, other) == pytest.approx(want)


def test_iou_containment():
    inner = UNIT_SQ * 0.5 + 0.25
    want = 0.25
    assert float(quad_iou(jnp.asarray(UNIT_SQ), jnp.asarray(inner))) == pytest.approx(
        want, abs=1e-5
    )
    assert polyiou_np.iou_poly(UNIT_SQ, inner) == pytest.approx(want)


def test_iou_rotated_diamond():
    # 45deg-rotated square inscribed in unit square: inter = 1/2, union = 1
    diamond = np.array([0.5, 0, 1, 0.5, 0.5, 1, 0, 0.5])
    want = 0.5 / 1.0
    assert float(quad_iou(jnp.asarray(UNIT_SQ), jnp.asarray(diamond))) == pytest.approx(
        want, abs=1e-5
    )
    assert polyiou_np.iou_poly(UNIT_SQ, diamond) == pytest.approx(want)


def test_iou_orientation_invariance():
    cw = UNIT_SQ.reshape(4, 2)[::-1].reshape(8)  # clockwise winding
    other = UNIT_SQ + np.array([0.5, 0.5] * 4)
    a = float(quad_iou(jnp.asarray(UNIT_SQ), jnp.asarray(other)))
    b = float(quad_iou(jnp.asarray(cw), jnp.asarray(other)))
    assert a == pytest.approx(b, abs=1e-6)
    assert polyiou_np.iou_poly(cw, other) == pytest.approx(a, abs=1e-5)


def test_iou_cross_validation_random():
    """Both jnp methods (edge-clip integral + candidate points) vs the
    independent float64 Sutherland-Hodgman reference on random boxes."""
    rng = np.random.RandomState(7)
    p = random_convex_quads(300, rng)
    q = p + rng.uniform(-30, 30, size=(300, 1)).repeat(8, 1)  # shifted copies
    q2 = random_convex_quads(300, rng)

    for a, b in [(p, q), (p, q2)]:
        want = polyiou_np.iou_matrix(a[:50], b[:50])
        for method in ("clip", "points"):
            got = np.asarray(
                quad_iou_matrix(jnp.asarray(a[:50]), jnp.asarray(b[:50]), method=method)
            )
            np.testing.assert_allclose(got, want, atol=2e-3, err_msg=method)


def test_iou_boundary_degeneracies():
    """Identical boxes -> 1; touching edge/corner -> 0 (both methods)."""
    sq = jnp.asarray(UNIT_SQ, jnp.float32)
    side = jnp.asarray(UNIT_SQ + np.array([1.0, 0] * 4), jnp.float32)  # shares edge x=1
    corner = jnp.asarray(UNIT_SQ + np.array([1.0, 1.0] * 4), jnp.float32)
    assert float(quad_iou(sq, sq)) == pytest.approx(1.0, abs=1e-5)
    assert float(quad_iou(sq, side)) == pytest.approx(0.0, abs=1e-5)
    assert float(quad_iou(side, sq)) == pytest.approx(0.0, abs=1e-5)
    assert float(quad_iou(sq, corner)) == pytest.approx(0.0, abs=1e-5)
    # same with a clockwise-wound second box
    side_cw = side.reshape(4, 2)[::-1].reshape(8)
    assert float(quad_iou(sq, side_cw)) == pytest.approx(0.0, abs=1e-5)


def test_iou_matrix_symmetry():
    rng = np.random.RandomState(11)
    p = random_convex_quads(20, rng)
    m = np.asarray(quad_iou_matrix(jnp.asarray(p), jnp.asarray(p)))
    np.testing.assert_allclose(m, m.T, atol=1e-4)
    np.testing.assert_allclose(np.diag(m), np.ones(20), atol=1e-4)


def test_iou_matrix_chunked_matches_dense():
    """Regression: the chunked (lax.map) path must agree with the dense path,
    INCLUDING self-pairs and near-duplicates.

    The clip integral's parallel-edge detection used absolute epsilons; FMA
    contraction under lax.map left O(ulp * coord^2) residue in `den` for
    coincident edges, double-counting shared boundary and producing garbage
    self-IoU (observed: -3.56, 1141.0 at image-scale coords).  Fixed with
    scale-relative tolerances + the inter <= min(area) clamp.
    """
    rng = np.random.RandomState(7)
    # image-scale coordinates maximize the FMA residue
    p = random_convex_quads(300, rng, scale=1000.0).astype(np.float32)
    dense = np.asarray(quad_iou_matrix(jnp.asarray(p), jnp.asarray(p), chunk=None))
    chunked = np.asarray(quad_iou_matrix(jnp.asarray(p), jnp.asarray(p), chunk=64))
    np.testing.assert_allclose(chunked, dense, atol=1e-3)
    np.testing.assert_allclose(np.diag(chunked), np.ones(300), atol=1e-3)
    # near-duplicates (sub-pixel perturbation) must score IoU ~ 1, never > 1
    q = p + rng.uniform(-0.01, 0.01, p.shape).astype(np.float32)
    pairs = np.asarray(quad_iou(jnp.asarray(p), jnp.asarray(q)))
    assert pairs.min() > 0.99 and pairs.max() <= 1.0 + 1e-5


def test_nms_duplicate_boxes_suppressed():
    """Exact duplicates and near-duplicates must suppress (keep exactly 1)."""
    from dafne_tpu.ops.nms import rotated_nms

    rng = np.random.RandomState(3)
    base = random_convex_quads(8, rng, scale=1000.0).astype(np.float32)
    # 8 distinct boxes x 4 copies each (2 exact, 2 jittered)
    quads = np.concatenate(
        [
            base,
            base,
            base + rng.uniform(-0.5, 0.5, base.shape).astype(np.float32),
            base + rng.uniform(-0.5, 0.5, base.shape).astype(np.float32),
        ]
    )
    n = quads.shape[0]
    scores = jnp.asarray(rng.uniform(0.1, 1.0, n).astype(np.float32))
    classes = jnp.zeros(n, jnp.int32)
    keep = np.asarray(
        rotated_nms(
            jnp.asarray(quads), scores, classes, jnp.ones(n, bool), 0.5
        )
    )
    assert keep.sum() == 8, f"kept {keep.sum()} of {n}, expected 8 groups"


def test_polyiou_np_pairs_and_matrix_consistent():
    rng = np.random.RandomState(13)
    p = random_convex_quads(10, rng)
    q = random_convex_quads(10, rng)
    m = polyiou_np.iou_matrix(p, q)
    pairs = polyiou_np.iou_pairs(p, q)
    np.testing.assert_allclose(np.diag(m), pairs)
