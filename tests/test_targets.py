"""Target assignment tests on hand-crafted geometry (SURVEY.md §4 plan)."""

import numpy as np
import jax.numpy as jnp
import pytest

from dafne_tpu.models.head import compute_locations
from dafne_tpu.ops.targets import (
    INF,
    AssignmentSpec,
    assign_targets,
    assign_targets_single,
    level_metadata,
)

SPEC = AssignmentSpec(
    strides=(8, 16),
    sizes_of_interest=(64,),
    num_classes=3,
    pos_radius=2.0,
)


def _setup_two_levels(h=16, w=16):
    """Two levels: 16x16@8 and 8x8@16 over a 128x128 image."""
    locs = [compute_locations(h, w, 8), compute_locations(h // 2, w // 2, 16)]
    sizes = [(h, w), (h // 2, w // 2)]
    strides, ranges = level_metadata(sizes, SPEC)
    locations = jnp.concatenate(locs, axis=0)
    return locations, strides, ranges


def _gt(corners_list, classes, m=8):
    """Pad gt to m instances."""
    n = len(corners_list)
    corners = np.zeros((m, 8), np.float32)
    hbox = np.zeros((m, 4), np.float32)
    area = np.zeros((m,), np.float32)
    valid = np.zeros((m,), bool)
    cls = np.zeros((m,), np.int32)
    for i, c in enumerate(corners_list):
        c = np.asarray(c, np.float32)
        corners[i] = c
        xs, ys = c[0::2], c[1::2]
        hbox[i] = [xs.min(), ys.min(), xs.max(), ys.max()]
        x, y = c[0::2], c[1::2]
        area[i] = 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))
        valid[i] = True
        cls[i] = classes[i]
    return tuple(map(jnp.asarray, (corners, hbox, cls, area, valid)))


def _assign(corners_list, classes, spec=SPEC):
    locations, strides, ranges = _setup_two_levels()
    corners, hbox, cls, area, valid = _gt(corners_list, classes)
    out = assign_targets_single(
        locations, strides, ranges, corners, hbox, cls, area, valid, spec
    )
    return locations, {k: np.asarray(v) for k, v in out.items()}


def test_single_box_positives():
    # axis-aligned 40x40 box at [20, 60]^2: fits level-0 bucket (max ltrb <= 64)
    box = [20.0, 20, 60, 20, 60, 60, 20, 60]
    locations, out = _assign([box], [2])
    locs = np.asarray(locations)
    k0 = 16 * 16  # level-0 locations

    pos = out["labels"] != SPEC.num_classes
    assert pos.sum() > 0
    # every positive must lie inside the box and within radius*stride of center
    for i in np.where(pos)[0]:
        x, y = locs[i]
        assert 20 <= x <= 60 and 20 <= y <= 60
        stride = 8 if i < k0 else 16
        assert abs(x - 40) <= 2.0 * stride and abs(y - 40) <= 2.0 * stride
        assert out["labels"][i] == 2
        assert out["gt_inds"][i] == 0
    # location at exact center (36, 36)@8 is positive
    center_idx = np.where((locs[:, 0] == 36) & (locs[:, 1] == 36))[0][0]
    assert pos[center_idx]


def test_ltrb_and_corner_targets_values():
    box = [20.0, 20, 60, 20, 60, 60, 20, 60]
    locations, out = _assign([box], [0])
    locs = np.asarray(locations)
    i = np.where((locs[:, 0] == 36) & (locs[:, 1] == 36))[0][0]
    # stride-normalized by 8
    np.testing.assert_allclose(out["reg_ltrb"][i] * 8, [16, 16, 24, 24], atol=1e-4)
    np.testing.assert_allclose(
        out["reg_corners"][i] * 8,
        [20 - 36, 20 - 36, 60 - 36, 20 - 36, 60 - 36, 60 - 36, 20 - 36, 60 - 36],
        atol=1e-4,
    )
    # abcd == distances to the 4 edges
    np.testing.assert_allclose(out["reg_abcd"][i] * 8, [16, 24, 24, 16], atol=1e-3)


def test_min_area_tie_break():
    big = [10.0, 10, 70, 10, 70, 70, 10, 70]
    small = [28.0, 28, 52, 28, 52, 52, 28, 52]
    locations, out = _assign([big, small], [1, 2])
    locs = np.asarray(locations)
    i = np.where((locs[:, 0] == 36) & (locs[:, 1] == 36))[0][0]
    # center location is inside both; smaller area (small, idx 1) must win
    assert out["labels"][i] == 2
    assert out["gt_inds"][i] == 1


def test_level_size_filtering():
    # The bucket test is PER LOCATION on max(l,t,r,b) (dafne_outputs.py:460-470):
    # a 40x40 box has max_ltrb <= 40 everywhere -> never in level-1's
    # bucket (64, INF], so level 1 gets no positives.
    small = [20.0, 20, 60, 20, 60, 60, 20, 60]
    _, out = _assign([small], [0])
    k0 = 16 * 16
    pos = out["labels"] != SPEC.num_classes
    assert pos[:k0].any()
    assert not pos[k0:].any()

    # A 100x100 box has off-center locations with max_ltrb > 64 that stay
    # within the center-sampling radius on level 1 -> level-1 positives exist.
    big = [10.0, 10, 110, 10, 110, 110, 10, 110]
    _, out = _assign([big], [0])
    pos = out["labels"] != SPEC.num_classes
    assert pos[k0:].any()


def test_rotated_box_in_quad():
    # diamond centered at (40, 40); locations outside the diamond but inside
    # its hbox must be background
    diamond = [40.0, 20, 60, 40, 40, 60, 20, 40]
    locations, out = _assign([diamond], [1])
    locs = np.asarray(locations)
    pos = out["labels"] != SPEC.num_classes
    corner_region = (locs[:, 0] < 28) & (locs[:, 1] < 28)  # hbox corner, not in quad
    assert not (pos & corner_region).any()
    i = np.where((locs[:, 0] == 36) & (locs[:, 1] == 36))[0][0]
    assert pos[i]


def test_invalid_gt_never_assigned():
    locations, strides, ranges = _setup_two_levels()
    corners, hbox, cls, area, valid = _gt([[20.0, 20, 60, 20, 60, 60, 20, 60]], [1])
    valid = jnp.zeros_like(valid)  # mask out the only gt
    out = assign_targets_single(
        locations, strides, ranges, corners, hbox, cls, area, valid, SPEC
    )
    assert (np.asarray(out["labels"]) == SPEC.num_classes).all()
    assert (np.asarray(out["gt_inds"]) == -1).all()


def test_batched_assignment():
    locations, strides, ranges = _setup_two_levels()
    c1, h1, l1, a1, v1 = _gt([[20.0, 20, 60, 20, 60, 60, 20, 60]], [1])
    c2, h2, l2, a2, v2 = _gt([], [])
    out = assign_targets(
        locations,
        strides,
        ranges,
        jnp.stack([c1, c2]),
        jnp.stack([h1, h2]),
        jnp.stack([l1, l2]),
        jnp.stack([a1, a2]),
        jnp.stack([v1, v2]),
        SPEC,
    )
    labels = np.asarray(out["labels"])
    assert labels.shape[0] == 2
    assert (labels[0] != SPEC.num_classes).any()
    assert (labels[1] == SPEC.num_classes).all()


def test_chunking_invariance():
    """Scan chunk size must not change the result (incl. tie-breaking)."""
    boxes = [
        [20.0, 20, 60, 20, 60, 60, 20, 60],
        [22.0, 22, 58, 22, 58, 58, 22, 58],
        [30.0, 20, 70, 20, 70, 60, 30, 60],  # same area as box 0 -> tie
    ]
    outs = []
    for chunk in (1, 2, 8):
        spec = AssignmentSpec(
            strides=SPEC.strides,
            sizes_of_interest=SPEC.sizes_of_interest,
            num_classes=SPEC.num_classes,
            gt_chunk=chunk,
        )
        _, out = _assign(boxes, [0, 1, 2], spec)
        outs.append(out)
    for o in outs[1:]:
        np.testing.assert_array_equal(outs[0]["labels"], o["labels"])
        np.testing.assert_array_equal(outs[0]["gt_inds"], o["gt_inds"])
        np.testing.assert_allclose(outs[0]["reg_corners"], o["reg_corners"], atol=1e-5)
