"""Adversarial geometry cases: slivers, large coordinates, near-degenerate
rotated boxes — the IoU implementations must agree and stay finite."""

import numpy as np
import jax.numpy as jnp
import pytest

from dafne_tpu.geometry import quad_iou, quad_iou_matrix, sort_quadrilateral
from dafne_tpu.utils import polyiou, polyiou_np


def _rot_box(cx, cy, w, h, ang):
    base = np.array(
        [[-w / 2, -h / 2], [w / 2, -h / 2], [w / 2, h / 2], [-w / 2, h / 2]]
    )
    r = np.array([[np.cos(ang), np.sin(ang)], [-np.sin(ang), np.cos(ang)]])
    return ((base @ r) + [cx, cy]).reshape(8)


def test_thin_slivers():
    """Extreme aspect ratios (ICDAR text-like, ar up to 30)."""
    rng = np.random.RandomState(0)
    for _ in range(50):
        a = _rot_box(rng.uniform(0, 500), rng.uniform(0, 500),
                     rng.uniform(60, 300), rng.uniform(2, 10),
                     rng.uniform(0, np.pi))
        b = _rot_box(rng.uniform(0, 500), rng.uniform(0, 500),
                     rng.uniform(60, 300), rng.uniform(2, 10),
                     rng.uniform(0, np.pi))
        got = float(quad_iou(jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32)))
        want = polyiou_np.iou_poly(a, b)
        assert np.isfinite(got)
        assert abs(got - want) < 5e-3, (got, want)


def test_large_coordinates():
    """Gigapixel-frame coordinates (merged DOTA scenes go to ~20k px)."""
    base = _rot_box(18000, 15000, 300, 200, 0.7)
    other = _rot_box(18050, 15020, 280, 190, 0.9)
    got = float(quad_iou(jnp.asarray(base, jnp.float32), jnp.asarray(other, jnp.float32)))
    want = polyiou_np.iou_poly(base, other)
    assert abs(got - want) < 2e-2  # f32 at 2e4 coords: ~mm-scale rounding
    assert polyiou.iou_poly(base, other) == pytest.approx(want, abs=1e-9)


def test_nearly_identical_rotated():
    a = _rot_box(100, 100, 50, 30, 0.3)
    b = _rot_box(100.001, 100.001, 50, 30, 0.3000001)
    assert float(quad_iou(jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32))) > 0.99
    assert polyiou_np.iou_poly(a, b) > 0.999


def test_tiny_boxes():
    """Sub-pixel boxes (the MIN_AREA/MIN_SIDE filters exist for these, but
    the math must not produce NaN/inf if they slip through)."""
    a = _rot_box(10, 10, 0.5, 0.3, 0.2)
    b = _rot_box(10.1, 10.05, 0.4, 0.35, 1.2)
    got = float(quad_iou(jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32)))
    assert np.isfinite(got) and 0 <= got <= 1.0 + 1e-6


def test_sort_handles_collinear_points():
    # three collinear corners (degenerate) must not crash or emit NaN
    q = jnp.asarray([[0.0, 0, 1, 0, 2, 0, 1, 1]], jnp.float32)
    out = np.asarray(sort_quadrilateral(q))
    assert np.isfinite(out).all()


def test_matrix_mixed_scales():
    rng = np.random.RandomState(1)
    boxes = np.stack(
        [_rot_box(rng.uniform(0, 1000), rng.uniform(0, 1000),
                  rng.uniform(1, 500), rng.uniform(1, 300),
                  rng.uniform(0, np.pi)) for _ in range(40)]
    )
    m = np.asarray(quad_iou_matrix(jnp.asarray(boxes, jnp.float32),
                                   jnp.asarray(boxes, jnp.float32)))
    ref = polyiou_np.iou_matrix(boxes, boxes)
    assert np.isfinite(m).all()
    np.testing.assert_allclose(m, ref, atol=5e-3)


def test_resize_both_mode():
    """INPUT.RESIZE_TYPE 'both' resizes to fixed W/H regardless of aspect."""
    from dafne_tpu.config import get_cfg
    from dafne_tpu.data.mapper import DatasetMapper, pad_target_hw

    cfg = get_cfg()
    cfg.INPUT.RESIZE_TYPE = "both"
    cfg.INPUT.RESIZE_WIDTH_TEST = 256
    cfg.INPUT.RESIZE_HEIGHT_TEST = 128
    cfg.TPU.IMAGE_SIZE_DIVISIBILITY = 128
    cfg.TPU.MAX_INSTANCES = 8
    pad_hw = pad_target_hw(cfg, train=False)
    assert pad_hw == (128, 256)

    rec = {
        "image": np.zeros((400, 300, 3), np.uint8),
        "image_id": "x", "height": 400, "width": 300,
        "annotations": [
            {"corners": [30.0, 40, 90, 40, 90, 80, 30, 80], "category_id": 0,
             "difficult": False}
        ],
    }
    ex = DatasetMapper(cfg, train=False, pad_hw=pad_hw)(rec)
    assert ex["image"].shape == (128, 256, 3)
    np.testing.assert_allclose(ex["scale_xy"], [300 / 256, 400 / 128])
    c = ex["gt_corners"][0]
    # x scaled by 256/300, y by 128/400
    np.testing.assert_allclose(c[0::2].min(), 30 * 256 / 300, atol=1e-3)
    np.testing.assert_allclose(c[1::2].min(), 40 * 128 / 400, atol=1e-3)
