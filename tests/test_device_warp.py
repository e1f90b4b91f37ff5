"""On-device separable TTA warps vs the host cv2 path (ops/device_warp.py)."""

import numpy as np
import pytest

from dafne_tpu.data import transforms as T
from dafne_tpu.ops.device_warp import (
    device_warp,
    separable_warp_params,
    stack_warps,
)


def _ref_bilinear(img, scale, offset, out_n, axis):
    """Float bilinear resample along one axis at src = scale*dst + offset,
    border replicate — the exact semantics device_warp implements."""
    src_n = img.shape[axis]
    xs = scale * np.arange(out_n) + offset
    x0 = np.floor(xs)
    w1 = xs - x0
    i0 = np.clip(x0, 0, src_n - 1).astype(int)
    i1 = np.clip(x0 + 1, 0, src_n - 1).astype(int)
    a = np.take(img, i0, axis=axis).astype(np.float64)
    b = np.take(img, i1, axis=axis).astype(np.float64)
    shape = [1, 1, 1]
    shape[axis] = out_n
    return a * (1 - w1).reshape(shape) + b * w1.reshape(shape)


def _tta_like_augs(w, h):
    """The DAFNe TTA aug family: scales x {id, hflip, vflip, rot90s}."""
    augs = []
    for ms in (19, 40):
        base = T.shortest_edge_resize(w, h, ms, 64)
        augs.append(base)
        augs.append(T.hflip(w, h).compose(base))
        augs.append(T.vflip(w, h).compose(base))
        for ang in (90.0, 180.0, 270.0):
            augs.append(T.rotation(w, h, ang).compose(base))
            augs.append(
                T.rotation(w, h, ang).compose(T.hflip(w, h).compose(base))
            )
    return augs


def test_device_warp_matches_host_cv2():
    """Every separable TTA copy generated on-device matches the host cv2
    warp within fixed-point tolerance (cv2 resamples uint8 in 11-bit fixed
    point; the device path is float32), with exact zero padding outside the
    copy's extent."""
    rng = np.random.RandomState(0)
    h, w = 37, 53
    img = rng.randint(0, 256, (h, w, 3), np.uint8)
    canvas = (48, 64)
    for aug in _tta_like_augs(w, h):
        p = separable_warp_params(aug, w, h, canvas)
        assert p is not None, aug.matrix
        out = np.asarray(device_warp(img, stack_warps([p]), p.transpose))[0]
        host = aug.apply_image(img).astype(np.float32)
        assert (p.out_h, p.out_w) == host.shape[:2]
        np.testing.assert_allclose(
            out[: p.out_h, : p.out_w], host, atol=2.0,
            err_msg=str(aug.matrix),
        )
        # zero padding beyond the copy extent
        assert np.all(out[p.out_h:] == 0) and np.all(out[:, p.out_w:] == 0)


def test_device_warp_exact_vs_float_restatement():
    """Against a float bilinear re-statement of the same sampling grid the
    device path is exact to float32 rounding (the cv2 gap in the test above
    is cv2's fixed point, not our grid)."""
    rng = np.random.RandomState(1)
    h, w = 21, 33
    img = rng.randint(0, 256, (h, w, 3), np.uint8)
    aug = T.resize(w, h, 26, 14)  # plain resize: no transpose, no flip
    canvas = (16, 32)
    p = separable_warp_params(aug, w, h, canvas)
    out = np.asarray(device_warp(img, stack_warps([p]), p.transpose))[0]
    sy, sx = h / 14, w / 26
    ref = _ref_bilinear(img, sy, sy * 0.5 - 0.5, 14, 0)
    ref = _ref_bilinear(ref, sx, sx * 0.5 - 0.5, 26, 1)
    np.testing.assert_allclose(out[:14, :26], ref, rtol=1e-5, atol=1e-3)


def test_device_warp_batching_and_fallback():
    """stack_warps batches same-transpose copies; arbitrary-angle rotations
    are rejected (host cv2 fallback)."""
    rng = np.random.RandomState(2)
    h, w = 30, 30
    img = rng.randint(0, 256, (h, w, 3), np.uint8)
    canvas = (32, 32)
    augs = [
        T.resize(w, h, 20, 20),
        T.hflip(w, h).compose(T.resize(w, h, 24, 24)),
        T.vflip(w, h).compose(T.resize(w, h, 16, 16)),
    ]
    ps = [separable_warp_params(a, w, h, canvas) for a in augs]
    out = np.asarray(device_warp(img, stack_warps(ps), False))
    assert out.shape == (3, 32, 32, 3)
    for i, (a, p) in enumerate(zip(augs, ps)):
        host = a.apply_image(img).astype(np.float32)
        np.testing.assert_allclose(
            out[i, : p.out_h, : p.out_w], host, atol=2.0
        )
    # non-separable: arbitrary rotation angle
    assert separable_warp_params(
        T.rotation(w, h, 33.0), w, h, canvas
    ) is None
