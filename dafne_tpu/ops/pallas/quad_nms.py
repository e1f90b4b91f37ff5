"""Pallas TPU kernel: rotated-quad NMS suppression matrix.

The TPU-native replacement for the reference's `poly_gpu_nms` CUDA kernel
(dafne/modeling/nms/nms.py:6,91 -> DOTA_devkit poly_nms_gpu).  Like the CUDA
kernel, NMS is split into
  (A) a massively parallel pairwise phase — here a Pallas kernel computing
      the boolean suppression matrix S[i, j] = "higher-scored box i would
      suppress box j" over [TILE, TILE] blocks, with all intermediates kept
      in VMEM/registers (the XLA version streams ~30 [chunk, N] f32 buffers
      through HBM), and
  (B) a Jacobi fixed-point iteration over the suppression matrix
      (`greedy_scan`) that provably converges to the same keep-set the CUDA
      wrapper's sequential bitmask walk produces, in
      longest-suppression-chain iterations of one MXU mat-vec each (the
      trip count is data-dependent; typically < 10).

Exact IoU uses the same boundary line-integral formulation as
dafne_tpu.geometry.iou.quad_intersection_area_clip (Cyrus-Beck parametric
clipping; no sorts, no gathers, pure VPU) — the two implementations are
cross-checked in tests.

Layout notes: row-block operands arrive as [TILE, 8]/[TILE, 1]; column-block
operands arrive PRE-TRANSPOSED as [8, TILE]/[1, TILE] so every per-vertex
coordinate slices directly into the broadcast shape (no in-kernel
transposes).  Blocks strictly below the diagonal are skipped (only j > i can
be suppressed).  Inputs must be pre-sorted by descending score.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128


def _edge_integral_block(ax, ay, bx, by, qx, qy, eps, include_boundary):
    """Contribution of edge a->b ([TI, 1] coords) clipped to quad q (lists of
    4 [1, TJ] coords).  Returns [TI, TJ].  Broadcast math only."""
    dx = bx - ax
    dy = by - ay
    t_low = jnp.zeros_like(ax + qx[0])  # [TI, TJ]
    t_high = jnp.ones_like(t_low)
    alive = jnp.ones_like(t_low, dtype=jnp.bool_)
    for k in range(4):
        ex = qx[(k + 1) % 4] - qx[k]
        ey = qy[(k + 1) % 4] - qy[k]
        # num = cross(e, a - q_k); den = cross(e, d)
        num = ex * (ay - qy[k]) - ey * (ax - qx[k])
        den = ex * dy - ey * dx
        # scale-relative tolerances (see geometry/iou.py
        # _clipped_edge_integral): FMA residue on coincident edges is
        # O(ulp * |e||d|), so absolute thresholds miss the parallel branch
        # and double-count shared boundary
        den_tol = eps * (jnp.abs(ex * dy) + jnp.abs(ey * dx))
        num_tol = eps * (
            jnp.abs(ex * (ay - qy[k])) + jnp.abs(ey * (ax - qx[k]))
        )
        par = jnp.abs(den) <= den_tol
        ratio = -num / jnp.where(par, 1.0, den)
        t_low = jnp.where(den > den_tol, jnp.maximum(t_low, ratio), t_low)
        t_high = jnp.where(den < -den_tol, jnp.minimum(t_high, ratio), t_high)
        outside = par & (num < -num_tol)
        if not include_boundary:
            same_dir = (ex * dx + ey * dy) > 0
            outside = outside | (par & (jnp.abs(num) <= num_tol) & same_dir)
        alive = alive & ~outside
    pax = ax + t_low * dx
    pay = ay + t_low * dy
    pbx = ax + t_high * dx
    pby = ay + t_high * dy
    contrib = 0.5 * (pax * pby - pay * pbx)
    return jnp.where(alive & (t_low < t_high), contrib, 0.0)


def _shoelace4(x, y):
    s = x[0] * y[1] - x[1] * y[0]
    for k in range(1, 4):
        s = s + (x[k] * y[(k + 1) % 4] - x[(k + 1) % 4] * y[k])
    return 0.5 * jnp.abs(s)


def _suppress_block(rows, cols_t, rcls, ccls, row0, col0, iou_threshold, eps):
    """Suppression block from raw operands (shared by both kernel layouts).

    rows [R, 8] row corners, cols_t [8, C] pre-transposed column corners,
    rcls [R, 1] / ccls [1, C] class ids, row0/col0 the global index of the
    block's first row/column (for the strict j > i triangle test).
    Returns int8 [R, C].
    """
    px = [rows[:, 2 * k : 2 * k + 1] for k in range(4)]  # [R, 1]
    py = [rows[:, 2 * k + 1 : 2 * k + 2] for k in range(4)]
    qx = [cols_t[2 * k : 2 * k + 1, :] for k in range(4)]  # [1, C]
    qy = [cols_t[2 * k + 1 : 2 * k + 2, :] for k in range(4)]

    inter = jnp.zeros((rows.shape[0], cols_t.shape[1]), jnp.float32)
    for k in range(4):
        inter += _edge_integral_block(
            px[k], py[k], px[(k + 1) % 4], py[(k + 1) % 4], qx, qy, eps,
            True,
        )
        inter += _edge_integral_block(
            qx[k], qy[k], qx[(k + 1) % 4], qy[(k + 1) % 4], px, py, eps,
            False,
        )
    inter = jnp.maximum(inter, 0.0)

    pa = _shoelace4(px, py)  # [R, 1]
    qa = _shoelace4(qx, qy)  # [1, C]
    # inter <= min(pa, qa) in real arithmetic; enforce to keep union > 0
    inter = jnp.minimum(inter, jnp.minimum(pa, qa))
    union = pa + qa - inter
    iou = jnp.where(
        union == 0.0, (inter + 1.0) / (union + 1.0), inter / union
    )

    same_class = rcls == ccls  # [R, C] broadcast
    ri = jax.lax.broadcasted_iota(jnp.int32, iou.shape, 0) + row0
    cj = jax.lax.broadcasted_iota(jnp.int32, iou.shape, 1) + col0
    suppress = (iou > iou_threshold) & same_class & (cj > ri)
    return suppress.astype(jnp.int8)


def _suppress_kernel(rows_c_ref, rows_k_ref, cols_ct_ref, cols_kt_ref,
                     out_ref, *, iou_threshold, eps):
    """Grid (i_block, j_block) -> S block [TILE, TILE] (int8).

    Tiles strictly below the diagonal are skipped (only j > i suppresses),
    and — because callers order candidates CLASS-MAJOR — so is every tile
    pair whose row/column class sets don't intersect: the expensive IoU
    math runs only where a same-class pair can exist.  Row padding carries
    class -1 and column padding -2 (suppression_matrix) so padded tiles
    never interact.
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    rcls = rows_k_ref[:, :]  # [TILE, 1]
    ccls = cols_kt_ref[:, :]  # [1, TILE]
    interact = (j >= i) & jnp.any(rcls == ccls)

    @pl.when(jnp.logical_not(interact))
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    @pl.when(interact)
    def _():
        out_ref[:, :] = _suppress_block(
            rows_c_ref[:, :], cols_ct_ref[:, :], rcls, ccls,
            i * TILE, j * TILE, iou_threshold, eps,
        )


STRIP = 64  # rows per strip-kernel grid step. A/B on-chip at n=4096,
# 15 classes (8/16/32/64/128): 64 is fastest on BOTH the dense all-valid
# mix and the 25%-valid production-like mix — strips smaller than 64 pay
# more grid overhead than their tighter class spans save, and at 128 the
# span widens to ~2-3 classes (the 2-D kernel's quantization problem).


def _suppress_strip_kernel(rows_c_ref, rows_k_ref, cols_ct_ref, cols_kt_ref,
                           out_ref, *, iou_threshold, eps, n):
    """Grid (i_strip,) -> S strip [STRIP, N] (int8); columns span-bounded.

    Requires CLASS-MAJOR candidate order (class-ascending, invalid last
    with row class -1 / column class -2 sentinels) — the layout both
    callers in ops/nms.py produce.  Under it, the columns that can
    interact with this strip's rows form ONE contiguous span: columns
    whose class lies in [min, max] of the strip's valid row classes,
    intersected with the strict j > i triangle.  The kernel computes that
    span from the resident [1, N] class row (two masked reductions) and
    runs the IoU math only over its 128-wide blocks — so per-strip work
    tracks the TRUE class span instead of the 2-D kernel's 128x128 tile
    quantization (a 128-row tile mixes ~2-3 DOTA classes and drags in
    every column either one touches; a STRIP-row strip usually spans one).
    """
    i = pl.program_id(0)
    r0 = i * STRIP
    rcls = rows_k_ref[:, :]  # [STRIP, 1]
    ccls = cols_kt_ref[:, :]  # [1, N]
    big = jnp.asarray(2**30, jnp.int32)
    rmin = jnp.min(jnp.where(rcls >= 0, rcls, big))
    rmax = jnp.max(jnp.where(rcls >= 0, rcls, -1))
    colidx = jax.lax.broadcasted_iota(jnp.int32, ccls.shape, 1)  # [1, N]
    inter = (ccls >= rmin) & (ccls <= rmax) & (colidx > r0)
    lo = jnp.min(jnp.where(inter, colidx, n))
    hi = jnp.max(jnp.where(inter, colidx, -1)) + 1
    lo_b = lo // TILE
    hi_b = (hi + TILE - 1) // TILE  # exclusive; 0 when the span is empty

    out_ref[:, :] = jnp.zeros_like(out_ref)
    rows = rows_c_ref[:, :]  # [STRIP, 8]

    def body(jb, _):
        c0 = jb * TILE
        out_ref[:, pl.ds(c0, TILE)] = _suppress_block(
            rows,
            cols_ct_ref[:, pl.ds(c0, TILE)],
            rcls,
            cols_kt_ref[:, pl.ds(c0, TILE)],
            r0, c0, iou_threshold, eps,
        )
        return 0

    jax.lax.fori_loop(lo_b, hi_b, body, 0)


def suppression_matrix(
    corners: jnp.ndarray,  # [N, 8] f32, score-sorted desc, CCW order
    classes: jnp.ndarray,  # [N] i32 (already class-merged)
    iou_threshold: float,
    eps: float = 1e-6,
    interpret: bool = False,
    class_major: bool = False,
) -> jnp.ndarray:
    """S [N, N] int8; requires N % TILE == 0 (pad outside).

    `class_major=True` selects the strip kernel (tight per-strip column
    spans); it is only valid when the candidates are ordered
    class-ascending with invalid slots last — the order the callers in
    ops/nms.py construct.  The default 2-D tiled kernel accepts any
    score-descending order.
    """
    n = corners.shape[0]
    assert n % TILE == 0, n
    n_blocks = n // TILE
    corners = corners.astype(jnp.float32)
    classes = classes.astype(jnp.int32)
    # distinct padding sentinels for the row vs column views so padded
    # slots (class < 0) can never satisfy the same-class interaction test
    cls_col = jnp.where(classes < 0, -1, classes).reshape(n, 1)
    corners_t = corners.T  # [8, N]
    cls_row = jnp.where(classes < 0, -2, classes).reshape(1, n)

    if class_major:
        kernel = functools.partial(
            _suppress_strip_kernel, iou_threshold=iou_threshold, eps=eps, n=n
        )
        return pl.pallas_call(
            kernel,
            grid=(n // STRIP,),
            in_specs=[
                pl.BlockSpec((STRIP, 8), lambda i: (i, 0)),  # row corners
                pl.BlockSpec((STRIP, 1), lambda i: (i, 0)),  # row classes
                pl.BlockSpec((8, n), lambda i: (0, 0)),  # all col corners (T)
                pl.BlockSpec((1, n), lambda i: (0, 0)),  # all col classes (T)
            ],
            out_specs=pl.BlockSpec((STRIP, n), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((n, n), jnp.int8),
            interpret=interpret,
        )(corners, cls_col, corners_t, cls_row)

    kernel = functools.partial(
        _suppress_kernel, iou_threshold=iou_threshold, eps=eps
    )
    return pl.pallas_call(
        kernel,
        grid=(n_blocks, n_blocks),
        in_specs=[
            pl.BlockSpec((TILE, 8), lambda i, j: (i, 0)),  # row corners
            pl.BlockSpec((TILE, 1), lambda i, j: (i, 0)),  # row classes
            pl.BlockSpec((8, TILE), lambda i, j: (0, j)),  # col corners (T)
            pl.BlockSpec((1, TILE), lambda i, j: (0, j)),  # col classes (T)
        ],
        out_specs=pl.BlockSpec((TILE, TILE), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((n, n), jnp.int8),
        interpret=interpret,
    )(corners, cls_col, corners_t, cls_row)


def _jacobi_fixed_point(s8: jnp.ndarray, keep_init: jnp.ndarray) -> jnp.ndarray:
    """Exact greedy keep via Jacobi iteration on one (sub)matrix.

        k_{t+1}[j] = keep_init[j]  AND  NOT any_i (k_t[i] AND S[i, j])

    S is strictly upper-triangular in score order, so the dependency graph
    is a DAG: after t iterations every box whose longest suppression chain
    is <= t holds its final value and never changes again, and the greedy
    solution is the UNIQUE fixed point (the triangular system determines
    k[0], then k[1], ... uniquely).  The loop exits with the exact greedy
    keep-set as soon as an iteration is a no-op — after (longest-chain + 1)
    iterations.  int8 x int8 -> int32 mat-vec: the matrix read dominates
    each iteration (N^2 bytes), and the MXU takes int8 natively (exact:
    entries are 0/1, accumulation in int32).
    """
    n = s8.shape[0]
    k0 = keep_init

    def step(k):
        suppressed = (
            jnp.matmul(
                k.astype(jnp.int8), s8, preferred_element_type=jnp.int32
            ) > 0
        )
        return keep_init & ~suppressed

    def cond(state):
        k, prev, it = state
        return jnp.any(k != prev) & (it < n)

    def body(state):
        k, _, it = state
        return step(k), k, it + 1

    k, _, _ = jax.lax.while_loop(cond, body, (step(k0), k0, jnp.asarray(1)))
    return k


def greedy_scan(
    suppress: jnp.ndarray, keep_init: jnp.ndarray, block: int = 512
) -> jnp.ndarray:
    """Greedy keep over the score-ordered suppression matrix S[i, j].

    Blocked Gauss–Seidel over score-ordered blocks of `block` boxes: for
    each block (in order), first mask out boxes suppressed by KEPT boxes of
    earlier blocks (one rectangular mat-vec), then resolve the block's
    internal dependencies with the Jacobi fixed point (_jacobi_fixed_point)
    on its [block, block] diagonal submatrix.  Block-sequential greedy on a
    triangular system IS the greedy solution, so the keep-set stays exact
    (asserted vs the sequential XLA walk and the float64 C++ greedy by the
    cross-implementation tests and tools/tpu_checks.py on hardware).

    Why blocked: plain Jacobi over the full matrix needs (longest
    suppression chain + 1) iterations x N^2 bytes of matrix traffic.  Real
    trained detections have chains < 10, but adversarial / untrained-model
    candidate sets produce chains in the hundreds, turning NMS into the
    decode bottleneck (measured ~18 ms/batch extra at N=4096).  Blocking
    caps the per-iteration traffic at block^2 (1/64th at N=4096) while the
    rectangular already-decided propagation totals <= N^2/2 bytes ONCE —
    so pathological inputs cost ~chain * block^2 instead of ~chain * N^2,
    and well-behaved inputs pay the same as before.
    """
    n = suppress.shape[0]
    s8 = (suppress != 0).astype(jnp.int8)
    if n <= block:
        return _jacobi_fixed_point(s8, keep_init)
    # pad to a block multiple so every fori_loop iteration slices the same
    # static shapes (one compiled body, not an unrolled chain — unrolling
    # 8 while_loop-bearing blocks made XLA compile times explode)
    pad = (-n) % block
    if pad:
        s8 = jnp.pad(s8, ((0, pad), (0, pad)))
        keep_init = jnp.pad(keep_init, ((0, pad),))
    np_ = n + pad
    nb = np_ // block
    col = jnp.arange(np_)

    def body(b, keep):
        start = b * block
        # suppression from KEPT boxes of earlier (higher-score) blocks:
        # full-height mat-vec with not-yet-processed rows masked out
        ksofar = keep & (col < start)
        scol = jax.lax.dynamic_slice(s8, (0, start), (np_, block))
        ext = (
            jnp.matmul(
                ksofar.astype(jnp.int8), scol,
                preferred_element_type=jnp.int32,
            )
            > 0
        )
        kb = jax.lax.dynamic_slice(keep_init, (start,), (block,)) & ~ext
        sbb = jax.lax.dynamic_slice(s8, (start, start), (block, block))
        kb = _jacobi_fixed_point(sbb, kb)
        return jax.lax.dynamic_update_slice(keep, kb, (start,))

    keep = jax.lax.fori_loop(0, nb, body, keep_init)
    return keep[:n]
