"""Pallas assignment kernel vs the XLA scan path (interpret mode on CPU)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from dafne_tpu.models.head import compute_locations
from dafne_tpu.ops.pallas.assign import assign_argmin
from dafne_tpu.ops.targets import (
    AssignmentSpec,
    assign_targets_single,
    level_metadata,
)

SPEC = AssignmentSpec(
    strides=(8, 16), sizes_of_interest=(64,), num_classes=3, impl="xla"
)


def _setup(h=16, w=16):
    locs = [compute_locations(h, w, 8), compute_locations(h // 2, w // 2, 16)]
    strides, ranges = level_metadata([(h, w), (h // 2, w // 2)], SPEC)
    return jnp.concatenate(locs), strides, ranges


def _gt(seed, m=8, n=5):
    r = np.random.RandomState(seed)
    corners = np.zeros((m, 8), np.float32)
    hbox = np.zeros((m, 4), np.float32)
    cls = np.zeros((m,), np.int32)
    area = np.zeros((m,), np.float32)
    valid = np.zeros((m,), bool)
    x0 = r.uniform(5, 80, n)
    y0 = r.uniform(5, 80, n)
    w = r.uniform(10, 50, n)
    h = r.uniform(10, 40, n)
    corners[:n] = np.stack(
        [x0, y0, x0 + w, y0, x0 + w, y0 + h, x0, y0 + h], 1
    )
    hbox[:n] = np.stack([x0, y0, x0 + w, y0 + h], 1)
    cls[:n] = r.randint(0, 3, n)
    area[:n] = w * h
    valid[:n] = True
    return tuple(map(jnp.asarray, (corners, hbox, cls, area, valid)))


def test_pallas_assign_matches_xla():
    locations, strides, ranges = _setup()
    for seed in range(5):
        corners, hbox, cls, area, valid = _gt(seed)
        ref = assign_targets_single(
            locations, strides, ranges, corners, hbox, cls, area, valid, SPEC
        )
        min_area, argmin = assign_argmin(
            locations, strides, ranges, corners, hbox, area, valid, SPEC,
            interpret=True,
        )
        ref_bg = np.asarray(ref["gt_inds"]) < 0
        got_bg = np.asarray(min_area) >= 1e8
        # tiny float-marginal in-quad boundary disagreements allowed (<0.5%)
        mismatch = (ref_bg != got_bg).mean()
        assert mismatch < 0.005, mismatch
        agree = ~ref_bg & ~got_bg
        np.testing.assert_array_equal(
            np.asarray(argmin)[agree], np.asarray(ref["gt_inds"])[agree]
        )


def test_pallas_assign_first_index_tie():
    """Two identical-area overlapping gts -> earliest index wins."""
    locations, strides, ranges = _setup()
    corners, hbox, cls, area, valid = _gt(0, m=8, n=2)
    # make gt1 an exact copy of gt0
    corners = corners.at[1].set(corners[0])
    hbox = hbox.at[1].set(hbox[0])
    area = area.at[1].set(area[0])
    min_area, argmin = assign_argmin(
        locations, strides, ranges, corners, hbox, area, valid, SPEC,
        interpret=True,
    )
    pos = np.asarray(min_area) < 1e8
    assert pos.any()
    assert (np.asarray(argmin)[pos] == 0).all()
