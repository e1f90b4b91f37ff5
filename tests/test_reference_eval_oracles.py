"""The reference's ACTUAL evaluation protocol as a test oracle.

tests/test_reference_oracles.py wired two reference artifacts (polyiou.cpp,
sort_corners.py) in as oracles; this file goes one level higher and imports
the reference's OWN evaluation-protocol code — the exact functions that
produced the README mAP numbers:

  1. /root/reference/dafne/evaluation/voc_eval.py — the complete matching
     protocol (confidence-sorted greedy matching, +1px hbb prefilter,
     strict > threshold, difficult rules, VOC-07 11-point AP), imported
     UNMODIFIED with its SWIG `polyiou` module shimmed by the compiled
     unmodified reference C++ (same .so as test_reference_oracles).
  2. /root/reference/dafne/utils/ResultMerge_multi_process.py — the DOTA
     cross-tile merge (tile-name parsing, origin shift + 1/rate rescale,
     cross-tile poly NMS via py_cpu_nms_poly_fast), imported with the same
     polyiou shim plus a stub for its unused top-level shapely import.

Both are driven end-to-end on synthetic scenes and compared against
`dafne_tpu/evaluation/voc_eval.py` and `dafne_tpu/evaluation/result_merge.py`
— the components the real-data mAP parity gate will exercise.  This closes
the remaining "torch re-statement could share a misreading with the port"
risk for the EVALUATION side: the oracle here is the reference's own code,
not a re-statement (VERDICT round-2 'missing' #2 follow-through).

Skipped wholesale when /root/reference is not present.
"""

from __future__ import annotations

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

from dafne_tpu.evaluation import voc_eval as our_voc_eval
from dafne_tpu.evaluation.result_merge import merge_by_poly

from test_reference_oracles import (
    REF_ROOT,
    _rand_rects,
    build_ref_iou_batch,
    load_ref_sort_module,
)

REF_VOC_EVAL = os.path.join(REF_ROOT, "dafne", "evaluation", "voc_eval.py")
REF_MERGE = os.path.join(
    REF_ROOT, "dafne", "utils", "ResultMerge_multi_process.py"
)
REF_UTILS_DIR = os.path.join(REF_ROOT, "dafne", "utils")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_ROOT), reason="reference tree not present"
)


def _polyiou_shim(ref_iou_batch):
    """A stand-in for the reference's SWIG `polyiou` module, backed by the
    compiled UNMODIFIED reference polyiou.cpp: VectorDouble -> float64
    array, iou_poly -> single-pair call into the reference C++."""
    shim = types.ModuleType("polyiou")
    shim.VectorDouble = lambda v: np.asarray(list(v), np.float64)
    shim.iou_poly = lambda p, q: float(
        ref_iou_batch(np.asarray(p)[None], np.asarray(q)[None])[0]
    )
    return shim


@pytest.fixture(scope="module")
def ref_eval_modules():
    """(voc_eval module, ResultMerge module) — the reference's own code,
    loaded by file path with shimmed binary deps:

      - `polyiou`  -> compiled unmodified reference C++ (iou math is REAL)
      - `dafne.utils.sort_corners` -> the real reference module (torch)
      - `shapely`  -> inert stub (dota_utils imports it at top level; none
        of the merge functions under test touch it)
    """
    pytest.importorskip("torch")
    ref_iou_batch = build_ref_iou_batch()
    ref_sort = load_ref_sort_module()
    if ref_iou_batch is None or ref_sort is None:
        pytest.skip("reference artifacts not present")
    if not (os.path.exists(REF_VOC_EVAL) and os.path.exists(REF_MERGE)):
        pytest.skip("reference eval modules not present")

    names = (
        "polyiou", "shapely", "shapely.geometry",
        "dafne", "dafne.utils", "dafne.utils.sort_corners",
        "dafne.utils.dota_utils", "dafne.utils.ResultMerge_multi_process",
        "ref_voc_eval",
    )
    saved = {k: sys.modules.get(k) for k in names}
    try:
        sys.modules["polyiou"] = _polyiou_shim(ref_iou_batch)
        shp = types.ModuleType("shapely")
        shp_geo = types.ModuleType("shapely.geometry")
        shp.geometry = shp_geo
        sys.modules["shapely"] = shp
        sys.modules["shapely.geometry"] = shp_geo
        # package scaffolding so `from dafne.utils import ...` and the
        # merge module's relative `from . import dota_utils` resolve to the
        # real reference files
        pkg = types.ModuleType("dafne")
        pkg.__path__ = [os.path.join(REF_ROOT, "dafne")]
        utils_pkg = types.ModuleType("dafne.utils")
        utils_pkg.__path__ = [REF_UTILS_DIR]
        sys.modules["dafne"] = pkg
        sys.modules["dafne.utils"] = utils_pkg
        sys.modules["dafne.utils.sort_corners"] = ref_sort

        spec = importlib.util.spec_from_file_location(
            "ref_voc_eval", REF_VOC_EVAL
        )
        voc_mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(voc_mod)

        spec = importlib.util.spec_from_file_location(
            "dafne.utils.ResultMerge_multi_process", REF_MERGE
        )
        merge_mod = importlib.util.module_from_spec(spec)
        sys.modules["dafne.utils.ResultMerge_multi_process"] = merge_mod
        spec.loader.exec_module(merge_mod)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return voc_mod, merge_mod


# ---------------------------------------------------------------------------
# voc_eval protocol
# ---------------------------------------------------------------------------


def _synth_detection_scene(rng, n_images=14, classname="ship"):
    """Synthetic GT + detections spanning every protocol branch: TPs at a
    spread of IoUs around the 0.5 threshold, duplicate detections on one gt
    (second-match-is-FP rule), matches to difficult gts (neither TP nor
    FP), background false positives, an image with zero gts, and an image
    whose gts are all difficult."""
    gt_by_image = {}
    det_ids, det_scores, det_corners = [], [], []
    for i in range(n_images):
        name = f"img{i:03d}"
        if i == 3:
            m = 0  # empty image — detections on it are all FPs
        else:
            m = int(rng.integers(1, 7))
        gts = _rand_rects(m, rng, scale=800.0)
        difficult = rng.random(m) < (1.0 if i == 5 else 0.25)
        gt_by_image[name] = (gts, difficult)
        for j in range(m):
            for _ in range(int(rng.integers(0, 3))):
                det_ids.append(name)
                det_corners.append(gts[j] + rng.normal(0, 6.0, 8))
                det_scores.append(float(rng.random()))
        for _ in range(int(rng.integers(1, 4))):
            det_ids.append(name)
            det_corners.append(_rand_rects(1, rng, scale=800.0)[0])
            det_scores.append(float(rng.random()))
    return (
        gt_by_image,
        det_ids,
        np.asarray(det_scores, np.float64),
        np.asarray(det_corners, np.float64),
        classname,
    )


def _run_reference_voc_eval(
    voc_mod, tmp_path, scene, ovthresh, use_07_metric
):
    """Drive the reference voc_eval through its real file interface."""
    gt_by_image, det_ids, det_scores, det_corners, classname = scene
    imageset = tmp_path / "imageset.txt"
    imageset.write_text("".join(f"{n}\n" for n in gt_by_image))
    detfile = tmp_path / f"Task1_{classname}.txt"
    with open(detfile, "w") as f:
        for img, s, c in zip(det_ids, det_scores, det_corners):
            coords = " ".join(repr(float(v)) for v in c)  # exact round-trip
            f.write(f"{img} {float(s)!r} {coords}\n")

    def parse_gt(imagename):  # annopath format "{}" -> the raw image name
        gts, difficult = gt_by_image[imagename]
        return [
            {"name": classname, "bbox": list(map(float, g)), "difficult": bool(d)}
            for g, d in zip(gts, difficult)
        ]

    return voc_mod.voc_eval(
        str(tmp_path / "Task1_{}.txt"),
        "{}",
        str(imageset),
        classname,
        ovthresh=ovthresh,
        use_07_metric=use_07_metric,
        parse_gt=parse_gt,
    )


@pytest.mark.parametrize("use_07_metric", [True, False])
def test_reference_voc_eval_protocol_exact(
    ref_eval_modules, tmp_path, use_07_metric
):
    """Our in-memory eval_class reproduces the reference's ACTUAL voc_eval
    bit-for-bit on synthetic scenes covering every matching branch: tp/fp
    sequences, recall/precision arrays, AP (07 and area-under-PR), and the
    per-detection (conf, overlap, tp) tuples.

    Both sides consume identical float64 inputs (repr round-trip through
    the reference's Task1 file interface); the IoU backends agree to
    <1e-12 (test_reference_oracles), so any decision difference is a
    PROTOCOL divergence — which is exactly what this test hunts."""
    voc_mod, _ = ref_eval_modules
    rng = np.random.default_rng(20260818)
    scene = _synth_detection_scene(rng)
    gt_by_image, det_ids, det_scores, det_corners, classname = scene

    ref_rec, ref_prec, ref_ap, ref_so = _run_reference_voc_eval(
        voc_mod, tmp_path, scene, 0.5, use_07_metric
    )

    rec, prec, ap, so = our_voc_eval.eval_class(
        det_ids,
        det_scores,
        det_corners,
        {k: (v[0], np.asarray(v[1], bool)) for k, v in gt_by_image.items()},
        ovthresh=0.5,
        use_07_metric=use_07_metric,
    )

    # the scene genuinely exercises the protocol
    assert len(ref_rec) > 30 and 0.0 < ref_ap < 1.0
    np.testing.assert_array_equal(np.asarray(ref_rec), rec)
    np.testing.assert_array_equal(np.asarray(ref_prec), prec)
    assert ref_ap == ap
    # per-detection (confidence, overlap, tp-flag) tuples: same DECISIONS.
    # The reference's conf column is mis-indexed (its own latent bug:
    # voc_eval.py:115-137 sorts BB and image_ids by confidence but never
    # reorders `confidence`, then reads `conf = confidence[d]` with d the
    # RANK — so its scores_overlap conf is the file-order d-th score, not
    # the ranked detection's).  AP is unaffected (conf is log-only there);
    # ours reports the true confidence.  Pin BOTH behaviors:
    assert len(ref_so) == len(so)
    order = np.argsort(-det_scores)  # the exact argsort both sides run
    rank_of_det = {int(order[r]): r for r in range(len(order))}
    for r, o in zip(ref_so, so):
        assert abs(r[1] - o[1]) < 1e-9  # exact-IoU overlap (diff backends)
        assert r[2] == o[2]  # tp(1)/duplicate-fp(0)
        assert r[3] == classname
        # ours: the ranked detection's true confidence
        det_idx = int(np.flatnonzero(det_scores == o[0])[0])
        rank = rank_of_det[det_idx]
        # reference quirk: file-order score at index `rank`
        assert r[0] == det_scores[rank]


def test_reference_voc_eval_iou_threshold_sweep(ref_eval_modules, tmp_path):
    """The strict `> ovthresh` rule and duplicate-match ordering hold at
    other operating points too (DOTA reports 0.5, but TEST.IOU_TH is a
    config knob — defaults.py:119)."""
    voc_mod, _ = ref_eval_modules
    for ovthresh in (0.25, 0.75):
        rng = np.random.default_rng(int(ovthresh * 1000))
        scene = _synth_detection_scene(rng, n_images=8)
        gt_by_image, det_ids, det_scores, det_corners, _ = scene
        sub = tmp_path / f"th{ovthresh}"
        sub.mkdir()
        ref_rec, ref_prec, ref_ap, _ = _run_reference_voc_eval(
            voc_mod, sub, scene, ovthresh, True
        )
        rec, prec, ap, _ = our_voc_eval.eval_class(
            det_ids, det_scores, det_corners,
            {k: (v[0], np.asarray(v[1], bool)) for k, v in gt_by_image.items()},
            ovthresh=ovthresh, use_07_metric=True,
        )
        np.testing.assert_array_equal(np.asarray(ref_rec), rec)
        np.testing.assert_array_equal(np.asarray(ref_prec), prec)
        assert ref_ap == ap


# ---------------------------------------------------------------------------
# cross-tile merge
# ---------------------------------------------------------------------------


def _synth_tiled_task1(rng, n_classes=3, n_images=4):
    """Per-class Task1 tile lines with overlapping detections across tile
    boundaries (the case the cross-tile NMS exists for): each original
    image is covered by 4 tiles of 1024 with 200 overlap at two rates."""
    tiles = [(1.0, 0, 0), (1.0, 824, 0), (1.0, 0, 824), (1.0, 824, 824),
             (0.5, 0, 0)]
    lines_by_class = {}
    for c in range(n_classes):
        lines = []
        for i in range(n_images):
            name = f"P{i:04d}"
            # clusters of near-duplicate detections in ORIGINAL coords,
            # re-expressed in each covering tile's frame
            objs = _rand_rects(int(rng.integers(3, 9)), rng, scale=1600.0)
            for obj in objs:
                for _ in range(int(rng.integers(1, 4))):
                    poly = obj + rng.normal(0, 2.0, 8)
                    score = float(rng.random())
                    rate, ox, oy = tiles[int(rng.integers(len(tiles)))]
                    tile_poly = poly * rate
                    tx, ty = tile_poly[0::2], tile_poly[1::2]
                    # only emit if the tile genuinely contains it
                    if (tx.min() < ox or ty.min() < oy
                            or tx.max() > ox + 1024 or ty.max() > oy + 1024):
                        rate, ox, oy = 1.0, 0, 0
                        tile_poly = poly
                        tx, ty = tile_poly[0::2], tile_poly[1::2]
                        if tx.min() < 0 or ty.min() < 0:
                            continue
                    shifted = tile_poly.copy()
                    shifted[0::2] -= ox
                    shifted[1::2] -= oy
                    rate_s = "0.5" if rate == 0.5 else "1"
                    tid = f"{name}__{rate_s}__{ox}___{oy}"
                    coords = " ".join(repr(float(v)) for v in shifted)
                    lines.append(f"{tid} {score!r} {coords}")
        lines_by_class[f"class{c}"] = lines
    return lines_by_class


def _parse_merged(path):
    """Merged Task1 file -> {(imgname): [(score, poly)]}, order-free."""
    out = {}
    if not os.path.exists(path):
        return out
    for line in open(path):
        parts = line.split()
        if len(parts) < 10:
            continue
        out.setdefault(parts[0], []).append(
            (float(parts[1]), np.asarray([float(v) for v in parts[2:10]]))
        )
    for k in out:
        out[k].sort(key=lambda t: -t[0])
    return out


def test_reference_tile_merge_exact(ref_eval_modules, tmp_path):
    """Our merge_by_poly reproduces the reference's ACTUAL mergebase +
    py_cpu_nms_poly_fast (serial path of mergebypoly — same math as the
    16-proc pool) detection-for-detection: same survivors, same original-
    frame coordinates, same scores — across tile offsets, a 0.5-rate tile
    set, and multi-tile duplicate clusters."""
    _, merge_mod = ref_eval_modules
    rng = np.random.default_rng(7)
    lines_by_class = _synth_tiled_task1(rng)

    src = tmp_path / "src"
    ref_dst = tmp_path / "ref_dst"
    our_dst = tmp_path / "our_dst"
    for d in (src, ref_dst, our_dst):
        d.mkdir()
    for cls, lines in lines_by_class.items():
        (src / f"Task1_{cls}.txt").write_text(
            "".join(l + "\n" for l in lines)
        )

    # reference: serial mergebase with the real poly-NMS (mergebypoly's
    # pool wraps exactly this per-file function)
    merge_mod.mergebase(
        str(src), str(ref_dst), merge_mod.py_cpu_nms_poly_fast
    )
    merge_by_poly(str(src), str(our_dst), nms_thresh=0.1, num_workers=1)

    for cls in lines_by_class:
        ref = _parse_merged(str(ref_dst / f"Task1_{cls}.txt"))
        ours = _parse_merged(str(our_dst / f"Task1_{cls}.txt"))
        assert ref.keys() == ours.keys(), cls
        total = 0
        for img in ref:
            r, o = ref[img], ours[img]
            assert len(r) == len(o), (cls, img)
            total += len(r)
            for (rs, rp), (os_, op) in zip(r, o):
                assert abs(rs - os_) < 6e-5, (cls, img)  # ours writes %.4f
                np.testing.assert_allclose(rp, op, atol=5e-2)  # %.2f coords
        assert total > 0, cls
    # suppression genuinely happened (duplicate clusters collapsed)
    n_in = sum(len(v) for v in lines_by_class.values())
    n_out = sum(
        len(dets)
        for cls in lines_by_class
        for dets in _parse_merged(str(ref_dst / f"Task1_{cls}.txt")).values()
    )
    assert n_out < n_in
