"""Dense target assignment — fully batched, static shapes, scan-chunked.

Re-designs the reference assignment (dafne/modeling/dafne/dafne_outputs.py:
252-503) for TPU:

- The reference loops per image in Python and materializes [K, M, 8]
  intermediates.  Here a `lax.scan` over fixed-size gt chunks keeps a running
  (min_area, argmin) per location, so peak memory is [K, CHUNK] instead of
  [K, M, 8]; the final per-location targets are gathered once for the winning
  gt only.  The whole thing vmaps over the batch inside the jitted step.
- Ground truth arrives padded to a static MAX_INSTANCES with a validity mask
  (invalid rows get area=INF and are never selected).

Semantics preserved (verified against hand-crafted geometry in
tests/test_targets.py):
  positive := center-sampling box (radius*stride clamped to the hbox,
              dafne_outputs.py:297-352) AND point-in-quadrilateral
              (triangle-area test, :109-119,:443-458), both toggleable;
  FPN level filter by max-ltrb in SIZES_OF_INTEREST bucket (:460-470);
  ties -> min-area gt, first index on equal area (:472-474);
  targets normalized by FPN stride when ENABLE_FPN_STRIDE_NORM (:284-293).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from dafne_tpu.geometry.quads import compute_abcd, is_in_quadrilateral

INF = 100000000.0


@dataclasses.dataclass(frozen=True)
class AssignmentSpec:
    """Static assignment configuration (hashable; closed over by jit)."""

    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    sizes_of_interest: Tuple[int, ...] = (64, 128, 256, 512)
    num_classes: int = 15
    pos_radius: float = 2.0
    center_sample: bool = True
    center_sample_only: bool = False
    combine_center_sample: bool = True
    enable_in_box_check: bool = True
    enable_level_size_filtering: bool = True
    enable_fpn_stride_norm: bool = True
    gt_chunk: int = 32
    impl: str = "auto"  # "pallas" (TPU kernel), "xla" (scan), "auto"

    @classmethod
    def from_config(cls, cfg) -> "AssignmentSpec":
        d = cfg.MODEL.DAFNE
        return cls(
            impl=cfg.TPU.get("ASSIGN_IMPL", "auto"),
            strides=tuple(d.FPN_STRIDES),
            sizes_of_interest=tuple(d.SIZES_OF_INTEREST),
            num_classes=d.NUM_CLASSES,
            pos_radius=d.POS_RADIUS,
            center_sample=d.CENTER_SAMPLE,
            center_sample_only=d.CENTER_SAMPLE_ONLY,
            combine_center_sample=d.COMBINE_CENTER_SAMPLE,
            enable_in_box_check=d.ENABLE_IN_BOX_CHECK,
            enable_level_size_filtering=d.ENABLE_LEVEL_SIZE_FILTERING,
            enable_fpn_stride_norm=d.ENABLE_FPN_STRIDE_NORM,
        )


def level_metadata(level_sizes: Sequence[Tuple[int, int]], spec: AssignmentSpec):
    """Per-location stride and size-range arrays for concatenated levels.

    level_sizes: [(Hl, Wl), ...];  returns (strides [K], size_ranges [K, 2]).
    Size ranges follow dafne_outputs.py:183-190: level l covers
    (soi[l-1], soi[l]], with -1 below and INF above.
    """
    soi = []
    prev = -1.0
    for s in spec.sizes_of_interest:
        soi.append((prev, float(s)))
        prev = float(s)
    soi.append((prev, INF))

    strides = []
    ranges = []
    for lvl, (h, w) in enumerate(level_sizes):
        k = h * w
        strides.append(jnp.full((k,), spec.strides[lvl], dtype=jnp.float32))
        ranges.append(
            jnp.broadcast_to(
                jnp.asarray(soi[lvl], dtype=jnp.float32)[None, :], (k, 2)
            )
        )
    return jnp.concatenate(strides), jnp.concatenate(ranges, axis=0)


def _center_sample_mask(locations, strides, hbox, radius):
    """Center-sampling positivity (dafne_outputs.py:297-352), broadcast form.

    locations [K, 2], strides [K], hbox [C, 4] -> [K, C] bool.
    The sampling box is center +- radius*stride, clamped into the gt hbox.
    """
    cx = 0.5 * (hbox[:, 0] + hbox[:, 2])[None, :]  # [1, C]
    cy = 0.5 * (hbox[:, 1] + hbox[:, 3])[None, :]
    r = (strides * radius)[:, None]  # [K, 1]
    xmin = jnp.maximum(cx - r, hbox[None, :, 0])
    ymin = jnp.maximum(cy - r, hbox[None, :, 1])
    xmax = jnp.minimum(cx + r, hbox[None, :, 2])
    ymax = jnp.minimum(cy + r, hbox[None, :, 3])
    x = locations[:, 0:1]
    y = locations[:, 1:2]
    inside = (
        jnp.minimum(
            jnp.minimum(x - xmin, xmax - x), jnp.minimum(y - ymin, ymax - y)
        )
        > 0
    )
    return inside


def assign_targets_single(
    locations: jnp.ndarray,  # [K, 2]
    loc_strides: jnp.ndarray,  # [K]
    size_ranges: jnp.ndarray,  # [K, 2]
    gt_corners: jnp.ndarray,  # [M, 8] canonically sorted
    gt_hbox: jnp.ndarray,  # [M, 4]
    gt_classes: jnp.ndarray,  # [M] int32
    gt_area: jnp.ndarray,  # [M]
    gt_valid: jnp.ndarray,  # [M] bool
    spec: AssignmentSpec,
):
    """Assign every location of one image to a gt (or background).

    Returns dict with labels [K] (num_classes = background), gt_inds [K]
    (-1 = background), reg_corners [K,8], reg_ltrb [K,4], reg_abcd [K,4]
    (stride-normalized if enabled).
    """
    k = locations.shape[0]
    m = gt_corners.shape[0]

    impl = spec.impl
    if impl == "auto":
        try:
            impl = "pallas" if jax.devices()[0].platform == "tpu" else "xla"
        except Exception:
            impl = "xla"

    if impl == "pallas":
        from dafne_tpu.ops.pallas.assign import assign_argmin

        min_area, min_idx = assign_argmin(
            locations, loc_strides, size_ranges, gt_corners, gt_hbox,
            gt_area, gt_valid, spec,
        )
        return _finalize_assignment(
            locations, loc_strides, gt_corners, gt_hbox, gt_classes,
            min_area, min_idx, spec,
        )

    chunk = min(spec.gt_chunk, m)
    # pad gt count to a multiple of chunk
    pad = (-m) % chunk
    if pad:
        gt_corners = jnp.pad(gt_corners, ((0, pad), (0, 0)))
        gt_hbox = jnp.pad(gt_hbox, ((0, pad), (0, 0)))
        gt_area = jnp.pad(gt_area, ((0, pad),))
        gt_valid = jnp.pad(gt_valid, ((0, pad),))
    n_chunks = gt_corners.shape[0] // chunk

    x = locations[:, 0:1]  # [K, 1]
    y = locations[:, 1:2]

    def scan_body(carry, chunk_idx):
        best_area, best_idx = carry
        sl = chunk_idx * chunk
        c_corners = jax.lax.dynamic_slice_in_dim(gt_corners, sl, chunk, 0)
        c_hbox = jax.lax.dynamic_slice_in_dim(gt_hbox, sl, chunk, 0)
        c_area = jax.lax.dynamic_slice_in_dim(gt_area, sl, chunk, 0)
        c_valid = jax.lax.dynamic_slice_in_dim(gt_valid, sl, chunk, 0)

        # ltrb vs enclosing hbox -> [K, C, 4] implied, but we only need
        # min/max reductions, computed as [K, C] directly.
        l = x - c_hbox[None, :, 0]
        t = y - c_hbox[None, :, 1]
        r = c_hbox[None, :, 2] - x
        b = c_hbox[None, :, 3] - y
        max_ltrb = jnp.maximum(jnp.maximum(l, r), jnp.maximum(t, b))
        min_ltrb = jnp.minimum(jnp.minimum(l, r), jnp.minimum(t, b))

        if spec.center_sample:
            in_center = _center_sample_mask(
                locations, loc_strides, c_hbox, spec.pos_radius
            )
        else:
            in_center = min_ltrb > 0

        if spec.center_sample_only:
            is_in = in_center
        else:
            in_quad = is_in_quadrilateral(
                c_corners[None, :, :], c_area[None, :], locations[:, None, :]
            )  # [K, C]
            is_in = (in_center & in_quad) if spec.combine_center_sample else in_quad

        area_mat = jnp.broadcast_to(c_area[None, :], (k, chunk))
        area_mat = jnp.where(c_valid[None, :], area_mat, INF)
        if spec.enable_in_box_check:
            area_mat = jnp.where(is_in, area_mat, INF)
        if spec.enable_level_size_filtering:
            cared = (max_ltrb >= size_ranges[:, 0:1]) & (
                max_ltrb <= size_ranges[:, 1:2]
            )
            area_mat = jnp.where(cared, area_mat, INF)

        c_min = area_mat.min(axis=1)
        c_arg = area_mat.argmin(axis=1) + sl  # first min within chunk
        # strict < keeps the earliest gt on ties, like torch .min over full M
        update = c_min < best_area
        best_area = jnp.where(update, c_min, best_area)
        best_idx = jnp.where(update, c_arg, best_idx)
        return (best_area, best_idx), None

    init = (jnp.full((k,), INF, jnp.float32), jnp.zeros((k,), jnp.int32))
    (min_area, min_idx), _ = jax.lax.scan(
        scan_body, init, jnp.arange(n_chunks, dtype=jnp.int32)
    )
    return _finalize_assignment(
        locations, loc_strides, gt_corners, gt_hbox, gt_classes,
        min_area, min_idx, spec,
    )


def _finalize_assignment(
    locations, loc_strides, gt_corners, gt_hbox, gt_classes, min_area,
    min_idx, spec,
):
    """labels + per-location target vectors for the winning gt."""
    m = gt_classes.shape[0]
    background = min_area >= INF
    labels = jnp.where(
        background, spec.num_classes, gt_classes[jnp.clip(min_idx, 0, m - 1)]
    )
    gt_inds = jnp.where(background, -1, min_idx)

    # Gather the winning gt per location and compute its targets only.
    sel = jnp.clip(min_idx, 0, gt_corners.shape[0] - 1)
    sel_corners = gt_corners[sel]  # [K, 8]
    sel_hbox = gt_hbox[sel]  # [K, 4]

    reg_ltrb = jnp.stack(
        [
            locations[:, 0] - sel_hbox[:, 0],
            locations[:, 1] - sel_hbox[:, 1],
            sel_hbox[:, 2] - locations[:, 0],
            sel_hbox[:, 3] - locations[:, 1],
        ],
        axis=1,
    )
    reg_abcd = compute_abcd(sel_corners, locations)  # [K, 4]
    reg_corners = sel_corners - jnp.tile(locations, (1, 4))  # [K, 8]

    if spec.enable_fpn_stride_norm:
        s = loc_strides[:, None]
        reg_ltrb = reg_ltrb / s
        reg_abcd = reg_abcd / s
        reg_corners = reg_corners / s

    return {
        "labels": labels.astype(jnp.int32),
        "gt_inds": gt_inds.astype(jnp.int32),
        "reg_corners": reg_corners,
        "reg_ltrb": reg_ltrb,
        "reg_abcd": reg_abcd,
    }


def flatten_levels(per_level, channels: int):
    """[N, Hl, Wl, C] per level -> [N, K, C] with K level-major (the
    reference's "level first" flattening, dafne_outputs.py:575-606)."""
    flat = [x.reshape(x.shape[0], -1, channels) for x in per_level]
    return jnp.concatenate(flat, axis=1)


def assign_targets(
    locations, loc_strides, size_ranges, gt_corners, gt_hbox, gt_classes,
    gt_area, gt_valid, spec: AssignmentSpec,
):
    """Batched assignment: gt_* have a leading batch dim; returns [N, K, ...]."""
    return jax.vmap(
        lambda c, h, cl, a, v: assign_targets_single(
            locations, loc_strides, size_ranges, c, h, cl, a, v, spec
        )
    )(gt_corners, gt_hbox, gt_classes, gt_area, gt_valid)
