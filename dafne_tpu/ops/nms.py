"""Rotated (quadrilateral) NMS — on-device, static shapes.

Replaces the reference's external CUDA kernel path
(dafne/modeling/nms/nms.py:10-92 -> DOTA_devkit `poly_gpu_nms`):

- exact quad-IoU matrix from dafne_tpu.geometry.iou (the same math the CUDA
  kernel implements with per-thread polygon clipping)
- class-aware suppression WITHOUT the coordinate-offset hack: the reference
  shifts boxes by class_id*(max-min+1) (nms.py:74-83) purely so a
  class-agnostic kernel never sees cross-class overlap; we mask the IoU
  matrix by class equality instead — mathematically identical, numerically
  better (no giant offset coordinates in float32)
- the DOTA small-vehicle/large-vehicle merge (nms.py:77-79) becomes an
  explicit `class_merge` remap applied to the *NMS view* of the labels only
- greedy score-descending suppression as a `lax.fori_loop` over the sorted
  boxes (the XLA formulation; a fused Pallas kernel is the next optimization
  step and slots in behind the same function signature)

Everything is fixed-size: callers pass padded candidate sets with a validity
mask; suppressed or invalid slots come back with keep=False.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from dafne_tpu.geometry.iou import quad_iou_matrix


def apply_class_merge(classes: jnp.ndarray, class_merge: Sequence[Tuple[int, int]]):
    """Remap class ids for NMS grouping (e.g. DOTA large-vehicle(5)->small(4))."""
    merged = classes
    for src, dst in class_merge:
        merged = jnp.where(merged == src, dst, merged)
    return merged


def _default_impl() -> str:
    """Pallas on TPU, XLA elsewhere (CPU tests, interpret-free)."""
    try:
        plat = jax.devices()[0].platform
    except Exception:
        plat = "cpu"
    return "pallas" if plat == "tpu" else "xla"


def _as_ccw_rows(corners: jnp.ndarray) -> jnp.ndarray:
    """[N, 8] -> CCW vertex order (static permutation, no strided reverse)."""
    v = corners.reshape(-1, 4, 2)
    nxt = jnp.roll(v, -1, axis=-2)
    s = 0.5 * jnp.sum(v[..., 0] * nxt[..., 1] - nxt[..., 0] * v[..., 1], -1)
    rev = jnp.stack([v[:, 3], v[:, 2], v[:, 1], v[:, 0]], axis=1)
    return jnp.where(s[:, None, None] < 0.0, rev, v).reshape(-1, 8)


def rotated_nms(
    corners: jnp.ndarray,  # [N, 8]
    scores: jnp.ndarray,  # [N]
    classes: jnp.ndarray,  # [N] int32
    valid: jnp.ndarray,  # [N] bool
    iou_threshold: float,
    class_merge: Sequence[Tuple[int, int]] = ((5, 4),),
    impl: str = "auto",
    scores01: bool = False,
) -> jnp.ndarray:
    """Greedy class-aware rotated NMS.

    Boxes are processed in score-descending order; a box is suppressed when
    its exact quad IoU with an earlier kept box of the same (merged) class
    exceeds `iou_threshold`.  Returns keep [N] bool aligned with the input
    order.  `impl`: "pallas" (TPU kernel), "xla", or "auto".
    """
    n = corners.shape[0]
    if impl == "auto":
        impl = _default_impl()

    # CLASS-MAJOR, score-descending-within-class order (invalid last).
    # Greedy class-aware NMS decomposes exactly over classes (cross-class
    # pairs never suppress), so any order that keeps score-descending
    # WITHIN each merged class yields the identical keep-set — and making
    # classes contiguous lets the suppression kernel skip every tile pair
    # whose class ranges don't intersect (most of the matrix for
    # multi-class scenes).  Ascending sorts of negated keys avoid the
    # strided reverse (CLAUDE.md rule); stable sort keeps first-index
    # order on ties like torch's descending sort.
    merged_all = apply_class_merge(classes, class_merge)
    inf = jnp.asarray(jnp.inf, scores.dtype)
    if scores01:
        # scores are guaranteed in [0, 1] (decode: sqrt(cls*ctr)) — fuse
        # (class, -score) into ONE sort key.  Class ids are small ints, so
        # key < ~128 and the f32 ulp (~1e-5) only affects sub-1e-5 score
        # near-ties, which fall back to first-index order like exact ties.
        key = jnp.where(
            valid,
            merged_all.astype(scores.dtype) * 2.0
            + (1.0 - jnp.clip(scores, 0.0, 1.0)),
            inf,
        )
        order = jnp.argsort(key)
    else:
        big = jnp.asarray(2**30, jnp.int32)
        # two single-key stable argsorts compose the (class, -score) order —
        # a variadic lexsort lowers poorly on TPU (measured +19 ms/batch)
        order1 = jnp.argsort(jnp.where(valid, -scores, inf))  # score desc
        cls1 = jnp.where(valid[order1], merged_all[order1].astype(jnp.int32), big)
        order = order1[jnp.argsort(cls1, stable=True)]  # class-major, stable

    s_corners = corners[order]
    s_valid = valid[order]
    s_classes = apply_class_merge(classes[order], class_merge)

    if impl.startswith("pallas"):
        from dafne_tpu.ops.pallas.quad_nms import (
            TILE, greedy_scan, suppression_matrix,
        )

        pad = (-n) % TILE
        pc = jnp.pad(_as_ccw_rows(s_corners), ((0, pad), (0, 0)))
        # padded AND invalid slots get the sentinel class so the kernel's
        # class-interaction test skips their tiles outright.  Invalid slots
        # sort last (contiguous), so sparse candidate sets — the normal
        # trained-model case, where most of the 4096 budget is below
        # threshold — skip most of the matrix; semantics are unchanged
        # because greedy keep_init is already False for invalid slots
        # (measured: 28 ms of pure-invalid IoU work at batch 8 without this)
        pk = jnp.pad(
            jnp.where(s_valid, s_classes, -1), ((0, pad),), constant_values=-1
        )
        pv = jnp.pad(s_valid, ((0, pad),))
        # the class-major order established above licenses the strip kernel
        # (tight per-strip column spans); "pallas-2d" forces the tiled one
        suppress = suppression_matrix(
            pc, pk, iou_threshold, class_major=(impl != "pallas-2d")
        )
        keep_sorted = greedy_scan(suppress, pv)[:n]
    else:
        iou = quad_iou_matrix(s_corners, s_corners)  # [N, N]
        same_class = s_classes[:, None] == s_classes[None, :]
        suppress_mat = (iou > iou_threshold) & same_class
        # only earlier (higher-score) kept boxes can suppress later ones
        later = jnp.arange(n)[None, :] > jnp.arange(n)[:, None]
        suppress_mat = suppress_mat & later

        def body(i, keep):
            row = suppress_mat[i] & keep[i]
            return keep & ~row

        keep_sorted = jax.lax.fori_loop(0, n, body, s_valid)

    # scatter back to input order
    keep = jnp.zeros((n,), bool).at[order].set(keep_sorted)
    return keep


def rotated_nms_batched(corners, scores, classes, valid, iou_threshold,
                        class_merge: Sequence[Tuple[int, int]] = ((5, 4),),
                        impl: str = "auto", scores01: bool = False):
    """vmap over a batch: corners [B,N,8], scores [B,N], ... -> keep [B,N]."""
    return jax.vmap(
        lambda c, s, cl, v: rotated_nms(
            c, s, cl, v, iou_threshold, class_merge, impl, scores01
        )
    )(corners, scores, classes, valid)


def _nms_single_group(corners, scores, valid, iou_threshold, impl):
    """Greedy NMS over ONE class group, inputs already score-sorted desc.

    corners [K, 8], scores [K] (0 for padded slots), valid [K] bool.
    Returns keep [K] bool in the given (sorted) order.
    """
    k = corners.shape[0]
    if impl.startswith("pallas"):
        from dafne_tpu.ops.pallas.quad_nms import (
            TILE, greedy_scan, suppression_matrix,
        )

        pad = (-k) % TILE
        pc = jnp.pad(_as_ccw_rows(corners), ((0, pad), (0, 0)))
        # invalid slots -> sentinel class: their tiles skip in the kernel
        pk = jnp.pad(
            jnp.where(valid, 0, -1).astype(jnp.int32),
            ((0, pad),), constant_values=-1,
        )
        pv = jnp.pad(valid, ((0, pad),))
        # single class + invalid-last IS class-major -> strip kernel valid
        suppress = suppression_matrix(
            pc, pk, iou_threshold, class_major=(impl != "pallas-2d")
        )
        return greedy_scan(suppress, pv)[:k]
    iou = quad_iou_matrix(corners, corners)
    later = jnp.arange(k)[None, :] > jnp.arange(k)[:, None]
    suppress_mat = (iou > iou_threshold) & later
    s8 = suppress_mat.astype(jnp.int8)

    def step(kv):
        return valid & ~(
            jnp.matmul(
                kv.astype(jnp.int8), s8, preferred_element_type=jnp.int32
            ) > 0
        )

    def cond(state):
        kv, prev, it = state
        return jnp.any(kv != prev) & (it < k)

    def body(state):
        kv, _, it = state
        return step(kv), kv, it + 1

    kv, _, _ = jax.lax.while_loop(cond, body, (step(valid), valid, jnp.asarray(1)))
    return kv


def rotated_nms_grouped(
    corners, scores, classes, valid, iou_threshold,
    class_merge: Sequence[Tuple[int, int]] = ((5, 4),),
    num_classes: int = 15,
    group_k: int = 512,
    min_total: int = 4096,
    impl: str = "auto",
):
    """Class-aware greedy NMS decomposed into per-class-group problems.

    Cross-class pairs NEVER suppress in class-aware NMS, so the global
    greedy over N candidates decomposes EXACTLY into independent greedy
    passes over each merged-class group's candidates in score order.  Each
    group gets a static budget K of its top-scored candidates, so the
    pairwise work is G*K^2 instead of (G*K)^2 — for DOTA (14 groups, K=512)
    that is the cost of a 2048-wide global matrix while covering an
    effective 7k+ candidates, and a global score cap's failure mode
    (starving whole classes on scenes dominated by another class) cannot
    happen.  K is raised to min_total/G so few-class datasets (HRSC: 1
    group) keep at least the global-cap-equivalent budget.

    Inputs are per image: corners [N, 8], scores [N] (0 = below-threshold /
    padded), classes [N] i32, valid [N].  Returns keep [N] bool.
    Equality with rotated_nms on the same candidate set holds whenever no
    group has more than K above-threshold candidates (tests assert both
    regimes; with more, the dropped candidates are each group's lowest
    scored — the ones a global cap would drop first anyway).
    """
    n = corners.shape[0]
    if impl == "auto":
        impl = _default_impl()
    merged_away = {src for src, _ in class_merge}
    groups = [c for c in range(num_classes) if c not in merged_away]
    g = len(groups)
    k = min(n, max(group_k, -(-min_total // max(g, 1))))

    merged = apply_class_merge(classes, class_merge)
    group_ids = jnp.asarray(groups, jnp.int32)  # [G]

    # per-group top-K by score (scores are 0 for invalid; use -1 sentinel so
    # zero-score valid candidates still rank above padding)
    in_group = merged[None, :] == group_ids[:, None]  # [G, N]
    gmask = in_group & valid[None, :]
    gscores = jnp.where(gmask, scores[None, :], -1.0)
    top_scores, top_idx = jax.lax.top_k(gscores, k)  # [G, K] desc
    # validity of a slot = the gathered candidate's own valid/in-group mask
    # (NOT score > 0 — a valid candidate with score exactly 0.0 stays alive,
    # consistent with rotated_nms honoring the valid mask)
    gvalid = jnp.take_along_axis(gmask, top_idx, axis=1)
    gcorners = corners[top_idx]  # [G, K, 8] row gather

    keep_g = jax.vmap(
        lambda c, v: _nms_single_group(c, None, v, iou_threshold, impl)
    )(gcorners, gvalid)  # [G, K]

    # scatter back: each original candidate appears in at most one group
    keep = jnp.zeros((n,), bool)
    keep = keep.at[top_idx.reshape(-1)].max(keep_g.reshape(-1))
    return keep & valid


def rotated_nms_grouped_batched(
    corners, scores, classes, valid, iou_threshold,
    class_merge: Sequence[Tuple[int, int]] = ((5, 4),),
    num_classes: int = 15,
    group_k: int = 512,
    min_total: int = 4096,
    impl: str = "auto",
):
    """vmap of rotated_nms_grouped over the batch dim."""
    return jax.vmap(
        lambda c, s, cl, v: rotated_nms_grouped(
            c, s, cl, v, iou_threshold, class_merge, num_classes,
            group_k, min_total, impl,
        )
    )(corners, scores, classes, valid)
