"""Tests against the reference's OWN artifacts (VERDICT round-2 item #2).

tests/test_golden_torch.py compares our jnp implementations against torch
RE-STATEMENTS of the reference math written in this repo — a re-statement
can in principle share a misreading with the port.  Two reference artifacts
are directly runnable in this container and close that gap:

  1. /root/reference/tools/prepare_dota/polyiou.cpp — the exact C++ the
     reference evaluator calls through SWIG (voc_eval.py:184-187, tile merge
     ResultMerge_multi_process.py:15).  Compiled UNMODIFIED from its
     in-place path (never copied into this repo) together with the tiny
     C-ABI wrapper tests/ref_polyiou_wrapper.cpp.
  2. /root/reference/dafne/utils/sort_corners.py — pure torch, imported
     directly; the reference's actual corner canonicalization (Alg. 1).

Cross-checks (tolerances are the empirically measured agreement + margin;
measured on 1M random rotated-rect pairs: native/NumPy vs reference max
|diff| 5.1e-14, jnp float32 max 6.6e-6 with zero NMS-decision flips):

  reference iou_poly  vs  native/polyiou.cpp (ctypes)      exact (<1e-9)
                      vs  utils/polyiou_np.py (f64 NumPy)  exact (<1e-9)
                      vs  geometry/iou.py quad_iou (f32)   <1e-4, no
                                                           decision flips
  reference sort      vs  geometry/quads.sort_quadrilateral  EXACT
                      vs  the golden-test torch re-statement EXACT

Skipped wholesale when /root/reference is not present.
"""

from __future__ import annotations

import ctypes
import hashlib
import importlib.util
import os
import subprocess

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dafne_tpu.geometry.iou import quad_iou
from dafne_tpu.geometry.quads import sort_quadrilateral
from dafne_tpu.utils import polyiou, polyiou_np

REF_ROOT = "/root/reference"
REF_POLYIOU = os.path.join(REF_ROOT, "tools", "prepare_dota", "polyiou.cpp")
REF_SORT = os.path.join(REF_ROOT, "dafne", "utils", "sort_corners.py")
_WRAPPER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "ref_polyiou_wrapper.cpp")
_BUILD = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "native", "build")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_ROOT), reason="reference tree not present"
)


def build_ref_iou_batch():
    """Compile the unmodified reference polyiou.cpp + wrapper; return a
    batched callable [N,8],[N,8] -> [N] float64 (None when the reference
    source is absent).  Shared with test_reference_eval_oracles.py."""
    if not os.path.exists(REF_POLYIOU):
        return None
    tag = hashlib.sha1(
        open(REF_POLYIOU, "rb").read() + open(_WRAPPER, "rb").read()
    ).hexdigest()[:12]
    so_path = os.path.join(_BUILD, f"ref_polyiou_{tag}.so")
    if not os.path.exists(so_path):
        os.makedirs(_BUILD, exist_ok=True)
        tmp = so_path + f".tmp{os.getpid()}"
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
             REF_POLYIOU, _WRAPPER, "-o", tmp],
            check=True, capture_output=True,
        )
        os.replace(tmp, so_path)
    lib = ctypes.CDLL(so_path)
    lib.ref_iou_poly_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_longlong, ctypes.c_void_p,
    ]

    def batch(p, q):
        p = np.ascontiguousarray(p, np.float64)
        q = np.ascontiguousarray(q, np.float64)
        out = np.empty(len(p), np.float64)
        lib.ref_iou_poly_batch(
            p.ctypes.data, q.ctypes.data, len(p), out.ctypes.data
        )
        return out

    return batch


def load_ref_sort_module():
    """Import the reference's sort_corners.py directly (torch-only module);
    None when absent."""
    if not os.path.exists(REF_SORT):
        return None
    spec = importlib.util.spec_from_file_location("ref_sort_corners", REF_SORT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_iou_batch():
    batch = build_ref_iou_batch()
    if batch is None:
        pytest.skip("reference polyiou.cpp not present")
    return batch


@pytest.fixture(scope="module")
def ref_sort_module():
    pytest.importorskip("torch")
    mod = load_ref_sort_module()
    if mod is None:
        pytest.skip("reference sort_corners.py not present")
    return mod


def _rand_rects(n, rng, scale=100.0):
    """Random rotated rectangles in a [0, scale]^2 window, [N, 8]."""
    cx, cy = rng.uniform(0, scale, (2, n))
    w, h = rng.uniform(1, scale / 2, (2, n))
    a = rng.uniform(0, 2 * np.pi, n)
    ca, sa = np.cos(a), np.sin(a)
    dx = np.stack([-w / 2, w / 2, w / 2, -w / 2], 1)
    dy = np.stack([-h / 2, -h / 2, h / 2, h / 2], 1)
    x = cx[:, None] + ca[:, None] * dx - sa[:, None] * dy
    y = cy[:, None] + sa[:, None] * dx + ca[:, None] * dy
    return np.stack([x, y], 2).reshape(n, 8)


def _adversarial_pairs(rng):
    """Named adversarial pair sets (coincident edges, slivers, degenerate,
    corner-touch) — everything except the bowtie quirk, tested separately."""
    sq = np.array([0, 0, 10, 0, 10, 10, 0, 10], np.float64)
    cases = {}
    cases["identical"] = (np.tile(sq, (64, 1)), np.tile(sq, (64, 1)))
    shifts = rng.uniform(0, 10, (256, 1))
    shifted = np.tile(sq, (256, 1)).copy()
    shifted[:, 0::2] += shifts
    cases["coincident-edge-slide"] = (np.tile(sq, (256, 1)), shifted)
    abut = np.tile(sq, (64, 1)).copy()
    abut[:, 0::2] += 10.0  # exactly shared right edge
    cases["abutting"] = (np.tile(sq, (64, 1)), abut)
    t = rng.uniform(1e-6, 1e-2, (256, 1))
    z = np.zeros((256, 1))
    ten = 10 * np.ones((256, 1))
    sliver = np.concatenate([z, z, ten, z, ten, t, z, t], 1)
    cases["sliver-vs-square"] = (sliver, np.tile(sq, (256, 1)))
    cases["sliver-vs-sliver"] = (sliver, sliver)
    # all-collinear degenerate quad — the reference's own main() test case
    # (polyiou.cpp:135-146): union == 0 -> the (inter+1)/(union+1) branch
    line = np.array([686.0, 2976.0, 709.0, 2976.0, 724.0, 2976.0, 701.0, 2976.0])
    cases["collinear-line"] = (np.tile(line, (8, 1)), np.tile(line, (8, 1)))
    touch = np.tile(sq, (64, 1)).copy()
    touch[:, 0::2] += 10
    touch[:, 1::2] += 10  # single shared corner
    cases["corner-touch"] = (np.tile(sq, (64, 1)), touch)
    bow = np.array([0, 0, 10, 10, 10, 0, 0, 10], np.float64)
    cases["bowtie-vs-square"] = (np.tile(bow, (64, 1)), np.tile(sq, (64, 1)))
    return cases


def test_reference_iou_vs_native_1m_random(ref_iou_batch):
    """1M random rotated-rect pairs: reference C++ vs our native C++ and the
    f64 NumPy fallback agree to float64 noise."""
    rng = np.random.default_rng(20260817)
    n = 1_000_000
    p, q = _rand_rects(n, rng), _rand_rects(n, rng)
    ref = ref_iou_batch(p, q)
    assert (ref > 0).mean() > 0.2  # the set genuinely overlaps

    nat = polyiou.iou_poly_pairs(p, q)
    assert np.abs(ref - nat).max() < 1e-9

    # the pure-NumPy path is ~100x slower per pair; a 100k subsample keeps
    # the test fast while still being a strong sample
    sub = slice(0, 100_000)
    npv = polyiou_np.iou_pairs(p[sub], q[sub])
    assert np.abs(ref[sub] - npv).max() < 1e-9


def test_reference_iou_vs_jnp_quad_iou(ref_iou_batch):
    """200k random pairs: the f32 on-device Cyrus–Beck quad_iou tracks the
    reference within float32 noise and never flips an NMS decision at the
    shipped threshold 0.1."""
    rng = np.random.default_rng(99)
    n = 200_000
    p, q = _rand_rects(n, rng), _rand_rects(n, rng)
    ref = ref_iou_batch(p, q)
    viou = jax.jit(jax.vmap(quad_iou))
    j = np.asarray(viou(jnp.asarray(p, jnp.float32), jnp.asarray(q, jnp.float32)))
    d = np.abs(ref - j)
    assert d.max() < 1e-4  # measured 6.6e-6
    assert d.mean() < 1e-6
    flips = (ref > 0.1) != (j > 0.1)
    assert flips.sum() == 0


def test_reference_iou_adversarial_exact(ref_iou_batch):
    """Coincident edges, slivers, degenerate collinear, corner-touch: all
    f64 implementations agree with the reference exactly; jnp f32 within
    float32 noise."""
    rng = np.random.default_rng(3)
    viou = jax.jit(jax.vmap(quad_iou))
    for name, (p, q) in _adversarial_pairs(rng).items():
        ref = ref_iou_batch(p, q)
        nat = polyiou.iou_poly_pairs(p, q)
        with np.errstate(invalid="ignore"):
            npv = polyiou_np.iou_pairs(p, q)
        assert np.abs(ref - nat).max() < 1e-12, name
        assert np.abs(ref - npv).max() < 1e-12, name
        j = np.asarray(
            viou(jnp.asarray(p, jnp.float32), jnp.asarray(q, jnp.float32))
        )
        assert np.abs(ref - j).max() < 1e-5, name


def test_reference_iou_bowtie_quirk(ref_iou_batch):
    """Self-intersecting (bowtie) vs itself is the ONE divergence: the
    reference's signed triangulation returns -1.0 (inter=-A, union=0 ->
    (inter+1)/(union+1) with A=1), our implementations return +1.0.  Bowties
    cannot reach either implementation in the live pipeline (corners are
    canonically sorted upstream in mapper, loss, and decode); this test pins
    both behaviors so a silent change in either is caught."""
    bow = np.tile(np.array([0, 0, 10, 10, 10, 0, 0, 10], np.float64), (4, 1))
    ref = ref_iou_batch(bow, bow)
    np.testing.assert_allclose(ref, -1.0, atol=1e-12)
    nat = polyiou.iou_poly_pairs(bow, bow)
    np.testing.assert_allclose(nat, 1.0, atol=1e-12)


def _rand_sortable_quads(rng, n):
    """Random quads in the distribution the live pipeline produces: rotated
    rects with corner jitter, under a random cyclic shift + direction so the
    input order is arbitrary."""
    q = _rand_rects(n, rng).reshape(n, 4, 2)
    q += rng.normal(0, 0.25, q.shape)  # jitter: non-rect but convex-ish
    shift = rng.integers(0, 4, n)
    rev = rng.integers(0, 2, n).astype(bool)
    idx = (np.arange(4)[None, :] + shift[:, None]) % 4
    idx = np.where(rev[:, None], idx[:, ::-1], idx)
    return np.take_along_axis(q, idx[:, :, None], axis=1).reshape(n, 8)


def test_reference_sort_corners_exact(ref_sort_module):
    """The reference's actual sort_quadrilateral (imported from
    /root/reference/dafne/utils/sort_corners.py) agrees EXACTLY with our jnp
    implementation and with the golden-test torch re-statement on 50k random
    quads — selection-only, so equality is bitwise."""
    import torch
    import test_golden_torch as golden

    rng = np.random.default_rng(42)
    quads = _rand_sortable_quads(rng, 50_000).astype(np.float32)

    ref = ref_sort_module.sort_quadrilateral(torch.from_numpy(quads)).numpy()
    ours = np.asarray(sort_quadrilateral(jnp.asarray(quads)))
    restmt = golden.torch_sort_quadrilateral(torch.from_numpy(quads)).numpy()

    np.testing.assert_array_equal(ref, restmt)
    np.testing.assert_array_equal(ref, ours)


def test_reference_sort_corners_ties_and_collinear(ref_sort_module):
    """x-ties (axis-aligned boxes: two corners share xmin) and collinear
    triples — the reference's own TODO cases (sort_corners.py:46).

    Quads that still have a strict diagonal split match EXACTLY.  Quads
    where NO strict split exists (a corner exactly on the p1-p3 diagonal)
    hit the reference's degenerate branch: it leaves p2..p4 ZERO-filled
    (sort_corners.py:41-43,65 — `l*r < 0` never strict).  Our implementation
    deliberately returns a well-defined ordering there instead (documented
    in geometry/quads.py and tests/test_golden_torch.py::_has_diagonal);
    this test pins the reference quirk so the deviation stays visible."""
    import torch
    import test_golden_torch as golden

    rng = np.random.default_rng(5)
    n = 4096
    # axis-aligned boxes under random corner-order permutations: exact xmin tie
    x0, y0 = rng.uniform(0, 50, (2, n))
    w, h = rng.uniform(1, 20, (2, n))
    quads = np.stack(
        [x0, y0, x0 + w, y0, x0 + w, y0 + h, x0, y0 + h], axis=1
    ).astype(np.float32).reshape(n, 4, 2)
    shift = rng.integers(0, 4, n)
    idx = (np.arange(4)[None, :] + shift[:, None]) % 4
    quads = np.take_along_axis(quads, idx[:, :, None], axis=1).reshape(n, 8)
    ref = ref_sort_module.sort_quadrilateral(torch.from_numpy(quads)).numpy()
    ours = np.asarray(sort_quadrilateral(jnp.asarray(quads)))
    np.testing.assert_array_equal(ref, ours)

    # collinear: flatten one corner onto the diagonal of the other two
    coll = _rand_sortable_quads(rng, 512).astype(np.float32).reshape(-1, 4, 2)
    coll[:, 1] = 0.5 * (coll[:, 0] + coll[:, 2])
    coll = coll.reshape(-1, 8)
    ok = golden._has_diagonal(coll)
    assert (~ok).sum() > 50  # the degenerate branch is genuinely exercised

    ref = ref_sort_module.sort_quadrilateral(torch.from_numpy(coll)).numpy()
    ours = np.asarray(sort_quadrilateral(jnp.asarray(coll)))
    np.testing.assert_array_equal(ref[ok], ours[ok])
    # reference quirk on the no-diagonal rows: p1 kept, p2..p4 zero-filled
    left = np.take_along_axis(
        coll.reshape(-1, 4, 2),
        np.argmin(coll.reshape(-1, 4, 2)[:, :, 0], axis=1)[:, None, None]
        .repeat(2, axis=2),
        axis=1,
    )[:, 0]
    np.testing.assert_array_equal(ref[~ok, :2], left[~ok])
    assert np.all(ref[~ok, 2:] == 0.0)
    # ours never zero-fills: output is a permutation of the input corners
    srt = lambda a: np.sort(a.reshape(len(a), 4, 2), axis=1)
    np.testing.assert_array_equal(srt(ours[~ok]), srt(coll[~ok]))
