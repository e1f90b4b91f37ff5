"""Golden-fixture parity tests against the reference's pure-torch math.

SURVEY.md §7 build-order step 5 / VERDICT round-1 item #2: the strongest
parity evidence obtainable inside this container is bit-comparing our jnp
implementations against independent torch re-statements of the reference's
own formulas, on large randomized fixtures including degenerate and
boundary geometry.

Each `torch_*` function below is a from-scratch torch re-statement of the
cited reference code path (identical op-for-op semantics, fresh code):

  - torch_sort_quadrilateral   -> dafne/utils/sort_corners.py:26-92
  - torch_smooth_l1            -> dafne/modeling/losses/smooth_l1.py:49-67
  - torch_modulated_8pt        -> dafne/modeling/losses/smooth_l1.py:69-112
  - torch_focal_loss           -> fvcore sigmoid_focal_loss as used at
                                  dafne/modeling/dafne/dafne_outputs.py:636-645
  - torch_compute_abcd         -> dafne_outputs.py:53-76
  - torch_ctrness_targets      -> dafne_outputs.py:79-93
  - torch_is_in_quadrilateral  -> dafne_outputs.py:96-119
  - torch_get_sample_region    -> dafne_outputs.py:297-352
  - torch_assignment           -> dafne_outputs.py:354-503 + 284-293
                                  (full single-image target assignment)

Everything runs in float32 on CPU; comparisons are exact where only
selection happens (corner sorting, labels, gt indices) and 1e-5-tight
where arithmetic differs in association order.
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from dafne_tpu.geometry.quads import (
    centerness_targets,
    compute_abcd,
    is_in_quadrilateral,
    quad_area,
    sort_quadrilateral,
)
from dafne_tpu.ops.losses import (
    modulated_eight_point_loss,
    sigmoid_focal_loss,
    smooth_l1,
)
from dafne_tpu.ops.targets import (
    INF,
    AssignmentSpec,
    assign_targets_single,
    level_metadata,
)

RNG = np.random.default_rng(1234)


# --------------------------------------------------------------------------
# torch re-statements of the reference formulas
# --------------------------------------------------------------------------


def _t_cross(a, b):
    return a[:, 0] * b[:, 1] - a[:, 1] * b[:, 0]


def _t_remove_rowwise(T, idx):
    """Drop one (per-row) point from [N, P, 2] -> [N, P-1, 2], order kept."""
    n, p = T.shape[0], T.shape[1]
    keep = torch.ones(n, p, dtype=torch.bool)
    keep[torch.arange(n), idx] = False
    return T[keep].view(n, p - 1, 2)


def torch_sort_quadrilateral(bboxes):
    """Vectorized Alg.1 corner ordering (sort_corners.py:26-92 semantics).

    Includes the reference's quirks: first-index min on x ties, first
    diagonal candidate wins, and the i=1 `~cond` overwrite in the p2/p4
    loop (which makes "both crosses <= 0" fall back to the first
    candidate-ordered pair).
    """
    n = bboxes.shape[0]
    S = bboxes.view(n, 4, 2)
    p2 = bboxes.new_zeros(n, 2)
    p3 = bboxes.new_zeros(n, 2)
    p4 = bboxes.new_zeros(n, 2)

    leftmost = S[:, :, 0].min(dim=1).indices
    p1 = S[torch.arange(n), leftmost]
    S = _t_remove_rowwise(S, leftmost)

    done = torch.zeros(n, dtype=torch.bool)
    S_new = bboxes.new_zeros(n, 2, 2)
    for i in range(3):
        s1 = S[:, i]
        rest = _t_remove_rowwise(S, torch.full((n,), i, dtype=torch.long))
        s2, s3 = rest[:, 0], rest[:, 1]
        l = _t_cross(s1 - p1, s2 - p1)
        r = _t_cross(s1 - p1, s3 - p1)
        cond = ((l * r) < 0.0) & ~done
        p3[cond] = s1[cond]
        S_new[cond] = torch.stack((s2[cond], s3[cond]), dim=1)
        done |= cond
    S = S_new

    done = torch.zeros(n, dtype=torch.bool)
    for i in range(2):
        s1 = S[:, i]
        s2 = S[:, 1 - i]
        cond = (_t_cross(p3 - p1, s1 - p1) > 0.0) & ~done
        p2[cond] = s1[cond]
        p4[cond] = s2[cond]
        p2[~cond] = s2[~cond]
        p4[~cond] = s1[~cond]
        done |= cond

    return torch.stack((p1, p2, p3, p4), dim=1).view(n, 8)


def torch_smooth_l1(inp, tgt, beta):
    """fvcore smooth_l1_loss semantics (smooth_l1.py:49-67)."""
    if beta < 1e-5:
        return torch.abs(inp - tgt)
    n = torch.abs(inp - tgt)
    return torch.where(n < beta, 0.5 * n ** 2 / beta, n - 0.5 * beta)


def torch_modulated_8pt(inp, tgt, beta, logspace):
    """Per-box modulated corner loss (smooth_l1.py:69-102), pre-weighting."""
    num = inp.shape[0]
    loss_0 = torch_smooth_l1(inp, tgt, beta)
    v = inp.view(num, 4, 2)
    loss_1 = torch_smooth_l1(v[:, [1, 2, 3, 0]].reshape(num, -1), tgt, beta)
    loss_2 = torch_smooth_l1(v[:, [3, 0, 1, 2]].reshape(num, -1), tgt, beta)
    if logspace:
        loss_0, loss_1, loss_2 = loss_0.log1p(), loss_1.log1p(), loss_2.log1p()
    stacked = torch.stack((loss_0.sum(1), loss_1.sum(1), loss_2.sum(1)), dim=-1)
    return stacked.min(dim=-1).values


def torch_focal_loss(logits, targets, alpha, gamma):
    """fvcore sigmoid_focal_loss (used at dafne_outputs.py:636-645)."""
    p = torch.sigmoid(logits)
    ce = torch.nn.functional.binary_cross_entropy_with_logits(
        logits, targets, reduction="none"
    )
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce * ((1 - p_t) ** gamma)
    if alpha >= 0:
        loss = loss * (alpha * targets + (1 - alpha) * (1 - targets))
    return loss


def _t_dist_point_to_line(p1, p2, x0, y0):
    """dafne_outputs.py:53-64."""
    x1, y1 = p1.unbind(2)
    x2, y2 = p2.unbind(2)
    nom = torch.abs((y2 - y1) * x0 - (x2 - x1) * y0 + x2 * y1 - y2 * x1)
    denom = torch.sqrt((y2 - y1) ** 2 + (x2 - x1) ** 2)
    return nom / denom


def torch_compute_abcd(corners, xs_ext, ys_ext):
    """dafne_outputs.py:67-76 (K locations x N targets x 4 edges)."""
    num_locs = xs_ext.shape[0]
    num_targets = corners.shape[0]
    rep = corners[None].repeat(num_locs, 1, 1).view(num_locs, num_targets, 4, 2)
    c0, c1, c2, c3 = rep.unbind(2)
    left = torch.stack((c0, c1, c2, c3), dim=-1)
    right = torch.stack((c1, c2, c3, c0), dim=-1)
    return _t_dist_point_to_line(left, right, xs_ext[..., None], ys_ext[..., None])


def torch_ctrness_targets(reg, alpha):
    """dafne_outputs.py:79-93."""
    lr = reg[:, [0, 2]]
    tb = reg[:, [1, 3]]
    c = (lr.min(dim=-1)[0] / lr.max(dim=-1)[0]) * (
        tb.min(dim=-1)[0] / tb.max(dim=-1)[0]
    )
    c = c ** (1.0 / alpha)
    c[torch.isnan(c)] = 0.0
    return c


def _t_area_triangle(a, b, c):
    x, y = a - c, b - c
    return 0.5 * torch.abs(x[:, :, 0] * y[:, :, 1] - x[:, :, 1] * y[:, :, 0])


def torch_is_in_quadrilateral(c0, c1, c2, c3, poly_area, loc):
    """dafne_outputs.py:109-119 (triangle tiling test, eps=1e-3)."""
    s = (
        _t_area_triangle(c0, c1, loc)
        + _t_area_triangle(c1, c2, loc)
        + _t_area_triangle(c2, c3, loc)
        + _t_area_triangle(c3, c0, loc)
    )
    return ~(s > (poly_area + 1e-3))


def torch_get_sample_region(boxes, strides, num_loc_list, loc_xs, loc_ys, radius):
    """Center sampling (dafne_outputs.py:297-352), bitmask branch omitted."""
    center_x = boxes[..., [0, 2]].sum(dim=-1) * 0.5
    center_y = boxes[..., [1, 3]].sum(dim=-1) * 0.5
    num_gts = boxes.shape[0]
    K = len(loc_xs)
    boxes = boxes[None].expand(K, num_gts, 4)
    center_x = center_x[None].expand(K, num_gts)
    center_y = center_y[None].expand(K, num_gts)
    center_gt = boxes.new_zeros(boxes.shape)
    beg = 0
    for level, num_loc in enumerate(num_loc_list):
        end = beg + num_loc
        s = strides[level] * radius
        xmin, ymin = center_x[beg:end] - s, center_y[beg:end] - s
        xmax, ymax = center_x[beg:end] + s, center_y[beg:end] + s
        center_gt[beg:end, :, 0] = torch.where(
            xmin > boxes[beg:end, :, 0], xmin, boxes[beg:end, :, 0]
        )
        center_gt[beg:end, :, 1] = torch.where(
            ymin > boxes[beg:end, :, 1], ymin, boxes[beg:end, :, 1]
        )
        center_gt[beg:end, :, 2] = torch.where(
            xmax > boxes[beg:end, :, 2], boxes[beg:end, :, 2], xmax
        )
        center_gt[beg:end, :, 3] = torch.where(
            ymax > boxes[beg:end, :, 3], boxes[beg:end, :, 3], ymax
        )
        beg = end
    left = loc_xs[:, None] - center_gt[..., 0]
    right = center_gt[..., 2] - loc_xs[:, None]
    top = loc_ys[:, None] - center_gt[..., 1]
    bottom = center_gt[..., 3] - loc_ys[:, None]
    return torch.stack((left, top, right, bottom), -1).min(-1)[0] > 0


def torch_assignment(
    locations,
    num_loc_list,
    strides,
    sizes_of_interest,
    hbox,
    corners,
    classes,
    areas,
    num_classes,
    radius,
    center_sample,
    center_sample_only,
    combine_center_sample,
    enable_in_box_check,
    enable_level_filter,
    stride_norm,
):
    """Full single-image assignment (dafne_outputs.py:354-503 + 284-293).

    Returns (labels [K], gt_inds [K], reg_corners [K,8], reg_ltrb [K,4],
    reg_abcd [K,4]) with the reference's dense gather-for-winner semantics
    (background rows carry gt[argmin]'s regression targets, argmin of an
    all-INF row being 0 — exactly like torch .min over the area matrix).
    """
    xs, ys = locations[:, 0], locations[:, 1]
    K = len(xs)

    # per-location size ranges (dafne_outputs.py:183-190, 252-261)
    soi, prev = [], -1.0
    for s in sizes_of_interest:
        soi.append([prev, float(s)])
        prev = float(s)
    soi.append([prev, INF])
    ranges = torch.cat(
        [
            torch.tensor(soi[l], dtype=torch.float32)[None].expand(n, -1)
            for l, n in enumerate(num_loc_list)
        ]
    )

    loc_to_area = areas[None].repeat(K, 1)

    xs_ext, ys_ext = xs[:, None], ys[:, None]
    l = xs_ext - hbox[:, 0][None]
    t = ys_ext - hbox[:, 1][None]
    r = hbox[:, 2][None] - xs_ext
    b = hbox[:, 3][None] - ys_ext
    ltrb = torch.stack([l, t, r, b], dim=2)
    abcd = torch_compute_abcd(corners, xs_ext, ys_ext)
    corners_centered = torch.stack(
        [
            corners[:, i][None] - (xs_ext if i % 2 == 0 else ys_ext)
            for i in range(8)
        ],
        dim=2,
    )

    if center_sample:
        in_center = torch_get_sample_region(
            hbox, strides, num_loc_list, xs, ys, radius
        )
    else:
        in_center = ltrb.min(dim=2)[0] > 0

    if center_sample_only:
        is_in = in_center
    else:
        rep = corners[None].repeat(K, 1, 1)
        in_quad = torch_is_in_quadrilateral(
            rep[..., 0:2],
            rep[..., 2:4],
            rep[..., 4:6],
            rep[..., 6:8],
            loc_to_area,
            locations[:, None],
        )
        is_in = (in_center & in_quad) if combine_center_sample else in_quad

    max_ltrb = ltrb.max(dim=2)[0]
    cared = (max_ltrb >= ranges[:, [0]]) & (max_ltrb <= ranges[:, [1]])

    if enable_in_box_check:
        loc_to_area[is_in == 0] = INF
    if enable_level_filter:
        loc_to_area[cared == 0] = INF

    min_area, inds = loc_to_area.min(dim=1)
    rows = torch.arange(K)
    out_ltrb = ltrb[rows, inds]
    out_abcd = abcd[rows, inds]
    out_corners = corners_centered[rows, inds]
    labels = classes[inds].clone()
    labels[min_area == INF] = num_classes
    gt_inds = inds.clone()
    gt_inds[min_area == INF] = -1

    if stride_norm:
        loc_strides = torch.cat(
            [
                torch.full((n,), float(strides[l]))
                for l, n in enumerate(num_loc_list)
            ]
        )[:, None]
        out_ltrb = out_ltrb / loc_strides
        out_abcd = out_abcd / loc_strides
        out_corners = out_corners / loc_strides

    return labels, gt_inds, out_corners, out_ltrb, out_abcd


# --------------------------------------------------------------------------
# fixture generators
# --------------------------------------------------------------------------


def random_rot_rect_quads(n, jitter=0.0, scale=50.0, offset=200.0, rng=RNG):
    """Random rotated rectangles (+ optional per-corner jitter), [n, 8] f32.

    These match the geometry the datasets actually produce (convex,
    positively-sized quads inside an image frame).
    """
    cx = rng.uniform(80, 2 * offset, n)
    cy = rng.uniform(80, 2 * offset, n)
    w = rng.uniform(6, scale, n)
    h = rng.uniform(6, scale, n)
    th = rng.uniform(0, 2 * np.pi, n)
    c, s = np.cos(th), np.sin(th)
    dx = np.stack([-w, w, w, -w], 1) / 2
    dy = np.stack([-h, -h, h, h], 1) / 2
    x = cx[:, None] + dx * c[:, None] - dy * s[:, None]
    y = cy[:, None] + dx * s[:, None] + dy * c[:, None]
    quads = np.stack([x, y], axis=2).reshape(n, 8)
    if jitter:
        quads = quads + rng.normal(0, jitter, quads.shape)
    return quads.astype(np.float32)


def _has_diagonal(quads):
    """True where the reference's diagonal search finds a partner (i.e. the
    vectorized sort is well-defined; others produce zero-filled corners)."""
    n = quads.shape[0]
    c = quads.reshape(n, 4, 2)
    left = np.argmin(c[:, :, 0], axis=1)
    p1 = c[np.arange(n), left]
    keep = np.arange(4)[None, :] != left[:, None]
    rem = c[keep].reshape(n, 3, 2)
    v = rem - p1[:, None]
    cr = lambda i, j: v[:, i, 0] * v[:, j, 1] - v[:, i, 1] * v[:, j, 0]
    ok = np.zeros(n, bool)
    for i, (a, b) in enumerate([(1, 2), (0, 2), (0, 1)]):
        ok |= (cr(i, a) * cr(i, b)) < 0
    return ok


# --------------------------------------------------------------------------
# tests
# --------------------------------------------------------------------------


class TestSortCornersGolden:
    def _compare(self, quads):
        ours = np.asarray(sort_quadrilateral(jnp.asarray(quads)))
        ref = torch_sort_quadrilateral(torch.from_numpy(quads)).numpy()
        np.testing.assert_array_equal(ours, ref)

    def test_rot_rects_10k(self):
        quads = random_rot_rect_quads(10000)
        ok = _has_diagonal(quads)
        assert ok.mean() > 0.999  # sanity: dataset-like quads are sortable
        self._compare(quads[ok])

    def test_jittered_quads_10k(self):
        quads = random_rot_rect_quads(10000, jitter=4.0)
        self._compare(quads[_has_diagonal(quads)])

    def test_gaussian_quads_10k(self):
        quads = RNG.normal(0, 10, (10000, 8)).astype(np.float32)
        ok = _has_diagonal(quads)
        assert ok.mean() > 0.5
        self._compare(quads[ok])

    def test_exact_x_ties(self):
        # axis-aligned rectangles: two vertices share the minimal x exactly.
        quads = random_rot_rect_quads(2000)
        c = quads.reshape(-1, 4, 2)
        c[:, :, 0] = np.round(c[:, :, 0] / 8) * 8  # force exact duplicates
        quads = c.reshape(-1, 8)
        self._compare(quads[_has_diagonal(quads)])

    def test_integer_grid_boundary(self):
        # small integer coordinates: collinear triples, touching corners.
        quads = RNG.integers(0, 5, (5000, 8)).astype(np.float32)
        self._compare(quads[_has_diagonal(quads)])

    def test_already_sorted_is_stable_under_reference(self):
        quads = random_rot_rect_quads(1000)
        ok = _has_diagonal(quads)
        ref1 = torch_sort_quadrilateral(torch.from_numpy(quads[ok])).numpy()
        ours2 = np.asarray(sort_quadrilateral(jnp.asarray(ref1)))
        np.testing.assert_array_equal(ours2, ref1)


class TestLossGolden:
    @pytest.mark.parametrize("beta", [1.0 / 9.0, 0.0, 1.0])
    def test_smooth_l1(self, beta):
        x = RNG.normal(0, 2, (5000, 8)).astype(np.float32)
        y = RNG.normal(0, 2, (5000, 8)).astype(np.float32)
        ours = np.asarray(smooth_l1(jnp.asarray(x), jnp.asarray(y), beta))
        ref = torch_smooth_l1(torch.from_numpy(x), torch.from_numpy(y), beta)
        np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-6, atol=1e-6)

    @pytest.mark.parametrize("logspace", [True, False])
    @pytest.mark.parametrize("beta", [1.0 / 9.0, 0.0])
    def test_modulated_8pt(self, beta, logspace):
        pred = RNG.normal(0, 3, (10000, 8)).astype(np.float32)
        # stride-normalized centered corner targets are small-magnitude
        tgt = (random_rot_rect_quads(10000, scale=40.0) - 200.0) / 10.0
        tgt = tgt.astype(np.float32)
        ours = np.asarray(
            modulated_eight_point_loss(
                jnp.asarray(pred), jnp.asarray(tgt), beta, logspace
            )
        )
        ref = torch_modulated_8pt(
            torch.from_numpy(pred), torch.from_numpy(tgt), beta, logspace
        )
        np.testing.assert_allclose(ours, ref.numpy(), rtol=2e-5, atol=1e-6)

    @pytest.mark.parametrize("alpha,gamma", [(0.25, 2.0), (-1.0, 2.0), (0.5, 1.0)])
    def test_focal(self, alpha, gamma):
        logits = RNG.normal(0, 4, (4000, 15)).astype(np.float32)
        labels = RNG.integers(0, 16, 4000)
        onehot = np.eye(16, dtype=np.float32)[labels][:, :15]
        ours = np.asarray(
            sigmoid_focal_loss(jnp.asarray(logits), jnp.asarray(onehot), alpha, gamma)
        )
        ref = torch_focal_loss(
            torch.from_numpy(logits), torch.from_numpy(onehot), alpha, gamma
        )
        np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-4, atol=1e-6)

    @pytest.mark.parametrize("alpha", [5.0, 1.0])
    def test_ctrness(self, alpha):
        reg = np.abs(RNG.normal(0, 3, (8000, 4))).astype(np.float32)
        # boundary rows: zeros (0/0 -> NaN -> 0) and negative distances
        reg[:100] = 0.0
        reg[100:200, 0] = 0.0
        ours = np.asarray(centerness_targets(jnp.asarray(reg), alpha))
        ref = torch_ctrness_targets(torch.from_numpy(reg), alpha)
        np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-5, atol=1e-6)


class TestGeometryGolden:
    def test_compute_abcd(self):
        quads = random_rot_rect_quads(300)
        sorted_q = torch_sort_quadrilateral(torch.from_numpy(quads)).numpy()
        locs = RNG.uniform(0, 400, (500, 2)).astype(np.float32)
        ours = np.asarray(
            compute_abcd(
                jnp.asarray(sorted_q)[None, :, :], jnp.asarray(locs)[:, None, :]
            )
        )
        ref = torch_compute_abcd(
            torch.from_numpy(sorted_q),
            torch.from_numpy(locs[:, 0:1]),
            torch.from_numpy(locs[:, 1:2]),
        )
        np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-4, atol=1e-3)

    def test_is_in_quadrilateral(self):
        quads = random_rot_rect_quads(400)
        sorted_q = torch_sort_quadrilateral(torch.from_numpy(quads)).numpy()
        area = np.array(quad_area(jnp.asarray(sorted_q)))
        locs = RNG.uniform(0, 400, (600, 2)).astype(np.float32)
        # add on-edge / on-corner boundary points
        locs[:400] = sorted_q[:400, 0:2]  # exactly corner 0
        ours = np.asarray(
            is_in_quadrilateral(
                jnp.asarray(sorted_q)[None, :, :],
                jnp.asarray(area)[None, :],
                jnp.asarray(locs)[:, None, :],
            )
        )
        rep = torch.from_numpy(sorted_q)[None].repeat(600, 1, 1)
        ref = torch_is_in_quadrilateral(
            rep[..., 0:2],
            rep[..., 2:4],
            rep[..., 4:6],
            rep[..., 6:8],
            torch.from_numpy(area)[None].repeat(600, 1),
            torch.from_numpy(locs)[:, None],
        )
        agree = (ours == ref.numpy()).mean()
        # float-order differences flip only exact-boundary cases
        assert agree > 0.9995, f"in-quad agreement {agree}"

    def test_center_sample_region(self):
        num_loc_list, locs = _make_locations((128, 128))
        hbox = _random_hboxes(40)
        strides = [8, 16, 32, 64, 128]
        ref = torch_get_sample_region(
            torch.from_numpy(hbox),
            strides,
            num_loc_list,
            torch.from_numpy(locs[:, 0]),
            torch.from_numpy(locs[:, 1]),
            radius=1.5,
        )
        from dafne_tpu.ops.targets import _center_sample_mask

        loc_strides = np.concatenate(
            [np.full((n,), float(strides[l])) for l, n in enumerate(num_loc_list)]
        ).astype(np.float32)
        ours = np.asarray(
            _center_sample_mask(
                jnp.asarray(locs), jnp.asarray(loc_strides), jnp.asarray(hbox), 1.5
            )
        )
        np.testing.assert_array_equal(ours, ref.numpy())


def _make_locations(image_hw):
    """Concatenated FPN location grids like dafne/modeling/dafne/dafne.py:37-43."""
    h, w = image_hw
    strides = [8, 16, 32, 64, 128]
    locs, num_loc_list = [], []
    for s in strides:
        lh, lw = (h + s - 1) // s, (w + s - 1) // s
        xs = np.arange(lw, dtype=np.float32) * s + s // 2
        ys = np.arange(lh, dtype=np.float32) * s + s // 2
        gx, gy = np.meshgrid(xs, ys)
        locs.append(np.stack([gx.ravel(), gy.ravel()], 1))
        num_loc_list.append(lh * lw)
    return num_loc_list, np.concatenate(locs).astype(np.float32)


def _random_hboxes(m, lim=256.0, rng=RNG):
    x0 = rng.uniform(0, lim - 20, m)
    y0 = rng.uniform(0, lim - 20, m)
    wh = rng.uniform(8, 120, (2, m))
    return np.stack(
        [x0, y0, np.minimum(x0 + wh[0], lim), np.minimum(y0 + wh[1], lim)], 1
    ).astype(np.float32)


class TestFullAssignmentGolden:
    """End-to-end single-image assignment vs the reference formulation."""

    strides = (8, 16, 32, 64, 128)
    soi = (64, 128, 256, 512)

    def _run_case(self, m, seed, **flag_overrides):
        rng = np.random.default_rng(seed)
        num_loc_list, locs = _make_locations((256, 256))
        quads = random_rot_rect_quads(m, scale=120.0, offset=96.0, rng=rng)
        quads = torch_sort_quadrilateral(torch.from_numpy(quads)).numpy()
        xs, ys = quads[:, 0::2], quads[:, 1::2]
        hbox = np.stack([xs.min(1), ys.min(1), xs.max(1), ys.max(1)], 1)
        classes = rng.integers(0, 15, m).astype(np.int32)
        area = np.asarray(quad_area(jnp.asarray(quads)))

        flags = dict(
            center_sample=True,
            center_sample_only=False,
            combine_center_sample=True,
            enable_in_box_check=True,
            enable_level_filter=True,
            stride_norm=True,
            radius=1.5,
        )
        flags.update(flag_overrides)

        ref_labels, ref_inds, ref_cor, ref_ltrb, ref_abcd = torch_assignment(
            torch.from_numpy(locs),
            num_loc_list,
            list(self.strides),
            list(self.soi),
            torch.from_numpy(hbox),
            torch.from_numpy(quads),
            torch.from_numpy(classes),
            torch.from_numpy(area.astype(np.float32)),
            num_classes=15,
            **flags,
        )

        spec = AssignmentSpec(
            strides=self.strides,
            sizes_of_interest=self.soi,
            num_classes=15,
            pos_radius=flags["radius"],
            center_sample=flags["center_sample"],
            center_sample_only=flags["center_sample_only"],
            combine_center_sample=flags["combine_center_sample"],
            enable_in_box_check=flags["enable_in_box_check"],
            enable_level_size_filtering=flags["enable_level_filter"],
            enable_fpn_stride_norm=flags["stride_norm"],
            impl="xla",
        )
        loc_strides, size_ranges = level_metadata(
            [(256 // s, 256 // s) for s in self.strides], spec
        )
        out = assign_targets_single(
            jnp.asarray(locs),
            loc_strides,
            size_ranges,
            jnp.asarray(quads),
            jnp.asarray(hbox),
            jnp.asarray(classes),
            jnp.asarray(area.astype(np.float32)),
            jnp.ones((m,), bool),
            spec,
        )

        ours_lbl = np.asarray(out["labels"])
        ours_ind = np.asarray(out["gt_inds"])
        ref_l, ref_i = ref_labels.numpy(), ref_inds.numpy()

        # The reference's in-quad test (sum of triangle areas vs area+1e-3,
        # dafne_outputs.py:109-119) is ill-conditioned in f32 once quad areas
        # exceed ~4000: the f32 quantization of the stored area alone is
        # comparable to the 1e-3 epsilon, so interior points can flip
        # inside/outside depending on the rounding order of the four triangle
        # sums.  Both torch and XLA straddle that boundary differently.  We
        # therefore allow disagreements ONLY where an f64 recomputation shows
        # the deciding gt sits inside that float-noise band.
        mism = np.nonzero(ours_ind != ref_i)[0]
        assert len(mism) <= max(3, len(ours_lbl) // 200), (
            f"too many assignment mismatches: {len(mism)}"
        )
        quads64 = quads.astype(np.float64).reshape(-1, 4, 2)
        for i in mism:
            ambiguous = False
            for g in {int(ours_ind[i]), int(ref_i[i])} - {-1}:
                c = quads64[g]
                nxt = np.roll(c, -1, 0)
                lx, ly = float(locs[i, 0]), float(locs[i, 1])
                tri = 0.5 * np.abs(
                    (c[:, 0] - lx) * (nxt[:, 1] - ly)
                    - (c[:, 1] - ly) * (nxt[:, 0] - lx)
                )
                margin = tri.sum() - (float(area[g]) + 1e-3)
                if abs(margin) <= max(2e-6 * float(area[g]), 2e-3):
                    ambiguous = True
            assert ambiguous, (
                f"non-ambiguous assignment mismatch at loc {locs[i]}: "
                f"ours {ours_ind[i]} vs ref {ref_i[i]}"
            )

        ok = ours_ind == ref_i
        np.testing.assert_array_equal(ours_lbl[ok], ref_l[ok])
        np.testing.assert_allclose(
            np.asarray(out["reg_ltrb"])[ok], ref_ltrb.numpy()[ok],
            rtol=1e-5, atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(out["reg_corners"])[ok], ref_cor.numpy()[ok],
            rtol=1e-5, atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(out["reg_abcd"])[ok], ref_abcd.numpy()[ok],
            rtol=1e-4, atol=1e-3,
        )
        # the scene must actually exercise positives
        assert (ours_lbl != 15).sum() > 0

    def test_default_flags_small(self):
        self._run_case(m=7, seed=0)

    def test_default_flags_chunked(self):
        # m > gt_chunk exercises the lax.scan chunking + padding path
        self._run_case(m=77, seed=1)

    def test_no_center_sample(self):
        self._run_case(m=12, seed=2, center_sample=False)

    def test_center_sample_only(self):
        self._run_case(m=12, seed=3, center_sample_only=True)

    def test_quad_only(self):
        self._run_case(m=12, seed=4, combine_center_sample=False)

    def test_no_level_filter(self):
        self._run_case(m=12, seed=5, enable_level_filter=False)

    def test_no_in_box_check(self):
        self._run_case(m=12, seed=6, enable_in_box_check=False)

    def test_no_stride_norm(self):
        self._run_case(m=12, seed=7, stride_norm=False)

    def test_radius_variants(self):
        self._run_case(m=12, seed=8, radius=0.75)
        self._run_case(m=12, seed=9, radius=3.0)
