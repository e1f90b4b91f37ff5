"""Pallas rotated-NMS kernel vs the XLA reference path (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp

from dafne_tpu.ops.nms import _as_ccw_rows, apply_class_merge, rotated_nms
from dafne_tpu.ops.pallas.quad_nms import TILE, greedy_scan, suppression_matrix


def _random_boxes(n, seed=0):
    rng = np.random.RandomState(seed)
    cx, cy = rng.uniform(0, 300, n), rng.uniform(0, 300, n)
    w, h = rng.uniform(5, 60, n), rng.uniform(5, 40, n)
    ang = rng.uniform(0, np.pi, n)
    base = np.stack(
        [np.stack([-w / 2, -h / 2], -1), np.stack([w / 2, -h / 2], -1),
         np.stack([w / 2, h / 2], -1), np.stack([-w / 2, h / 2], -1)], 1,
    )
    c, s = np.cos(ang), np.sin(ang)
    rot = np.stack([np.stack([c, s], -1), np.stack([-s, c], -1)], -2)
    quads = np.einsum("nkc,ncd->nkd", base, rot) + np.stack([cx, cy], -1)[:, None]
    return quads.reshape(n, 8).astype(np.float32)


def test_pallas_suppression_matches_xla_reference():
    n = TILE  # one tile in interpret mode keeps the test fast
    corners = jnp.asarray(_random_boxes(n, seed=3))
    rng = np.random.RandomState(4)
    scores = jnp.asarray(np.sort(rng.rand(n))[::-1].copy())  # already sorted
    classes = jnp.asarray(rng.randint(0, 4, n).astype(np.int32))
    valid = jnp.asarray(rng.rand(n) > 0.1)

    # XLA reference keep
    keep_ref = np.asarray(
        rotated_nms(corners, scores, classes, valid, 0.2, (), impl="xla")
    )

    sup = suppression_matrix(
        _as_ccw_rows(corners), classes, 0.2, interpret=True
    )
    keep_pallas = np.asarray(greedy_scan(sup, valid))
    np.testing.assert_array_equal(keep_pallas, keep_ref)


def test_pallas_multitile_diagonal_skip():
    n = 2 * TILE
    corners = jnp.asarray(_random_boxes(n, seed=7))
    classes = jnp.zeros(n, jnp.int32)
    sup = np.asarray(
        suppression_matrix(_as_ccw_rows(corners), classes, 0.3, interpret=True)
    )
    # strictly lower-triangle must be all zero (only j > i suppressible)
    assert (np.tril(sup) == 0).all()
    # symmetry of the underlying IoU: sup[i, j] implies IoU > th, so the
    # mirrored pair must also exceed the threshold when roles are swapped
    ij = np.argwhere(sup)
    from dafne_tpu.utils.polyiou import iou_poly

    c = np.asarray(corners, np.float64)
    for i, j in ij[:20]:
        assert iou_poly(c[i], c[j]) > 0.3 * 0.95


def test_strip_kernel_matches_2d_kernel_class_major():
    """The strip kernel (class-major column spans) must produce the exact
    suppression matrix of the 2-D tiled kernel on class-major inputs —
    across multiple strips/tiles, several classes, and an invalid tail."""
    n = 3 * TILE
    rng = np.random.RandomState(11)
    corners = _as_ccw_rows(jnp.asarray(_random_boxes(n, seed=11)))
    # class-major layout: ascending classes, invalid (-1) last
    n_valid = n - 70  # invalid tail spans multiple strips incl. a partial one
    classes = np.full(n, -1, np.int32)
    classes[:n_valid] = np.sort(rng.randint(0, 5, n_valid))
    classes = jnp.asarray(classes)

    s2d = np.asarray(
        suppression_matrix(corners, classes, 0.25, interpret=True)
    )
    sstrip = np.asarray(
        suppression_matrix(
            corners, classes, 0.25, interpret=True, class_major=True
        )
    )
    np.testing.assert_array_equal(sstrip, s2d)


def test_strip_kernel_single_class_and_all_invalid():
    n = 2 * TILE
    corners = _as_ccw_rows(jnp.asarray(_random_boxes(n, seed=13)))
    one = jnp.zeros(n, jnp.int32)
    np.testing.assert_array_equal(
        np.asarray(suppression_matrix(corners, one, 0.3, interpret=True,
                                      class_major=True)),
        np.asarray(suppression_matrix(corners, one, 0.3, interpret=True)),
    )
    none = jnp.full((n,), -1, jnp.int32)
    assert not np.asarray(
        suppression_matrix(corners, none, 0.3, interpret=True,
                           class_major=True)
    ).any()


def test_rotated_nms_pallas_strip_equals_xla(monkeypatch):
    """End-to-end rotated_nms keep-set: strip-kernel pallas == xla on CPU
    interpret mode (patch the TPU check so the pallas path runs here)."""
    import dafne_tpu.ops.pallas.quad_nms as qn
    import dafne_tpu.ops.nms as nms_mod

    orig = qn.suppression_matrix
    monkeypatch.setattr(
        qn, "suppression_matrix",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}),
    )
    n = 2 * TILE
    corners = jnp.asarray(_random_boxes(n, seed=17))
    rng = np.random.RandomState(18)
    scores = jnp.asarray(rng.rand(n).astype(np.float32))
    classes = jnp.asarray(rng.randint(0, 6, n).astype(np.int32))
    valid = jnp.asarray(rng.rand(n) > 0.4)
    keep_xla = np.asarray(
        nms_mod.rotated_nms(corners, scores, classes, valid, 0.2, (), "xla")
    )
    keep_strip = np.asarray(
        nms_mod.rotated_nms(corners, scores, classes, valid, 0.2, (), "pallas")
    )
    keep_2d = np.asarray(
        nms_mod.rotated_nms(
            corners, scores, classes, valid, 0.2, (), "pallas-2d"
        )
    )
    np.testing.assert_array_equal(keep_strip, keep_xla)
    np.testing.assert_array_equal(keep_2d, keep_xla)


def test_greedy_scan_blocked_equals_sequential_walk():
    """The blocked Gauss-Seidel greedy_scan (block-sequential + intra-block
    Jacobi) must equal the sequential greedy walk exactly — including deep
    suppression chains that span block boundaries and a partial last
    block."""
    rng = np.random.default_rng(0)
    n = 1280  # 2.5 blocks at block=512; also test tiny blocks below
    for block, density in [(512, 0.02), (512, 0.3), (128, 0.02), (96, 0.5)]:
        sup = (rng.uniform(size=(n, n)) < density)
        # long deterministic chain crossing every block boundary:
        # i suppresses i+1 for all i
        chain = np.arange(n - 1)
        sup[chain, chain + 1] = True
        sup = np.triu(sup, k=1)  # strictly upper triangular (score order)
        valid = rng.uniform(size=n) > 0.1

        # sequential greedy walk (ground truth)
        keep_ref = np.zeros(n, bool)
        alive = valid.copy()
        for i in range(n):
            if alive[i]:
                keep_ref[i] = True
                alive &= ~sup[i]
        got = np.asarray(
            greedy_scan(
                jnp.asarray(sup.astype(np.int8)), jnp.asarray(valid),
                block=block,
            )
        )
        np.testing.assert_array_equal(got, keep_ref, err_msg=f"{block}/{density}")
