"""Evaluation tests: VOC AP semantics, evaluator, tile merge, native polyiou."""

import os

import numpy as np
import pytest

from dafne_tpu.evaluation.result_merge import (
    make_submission_zip,
    merge_by_poly,
    merge_class_lines,
    parse_tile_id,
)
from dafne_tpu.evaluation.evaluator import RotatedDetectionEvaluator
from dafne_tpu.evaluation.voc_eval import eval_class, voc_ap
from dafne_tpu.utils import polyiou


def _box(x0, y0, x1, y1):
    return np.asarray([x0, y0, x1, y0, x1, y1, x0, y1], np.float64)


def test_voc_ap_07_metric():
    rec = np.asarray([0.5])
    prec = np.asarray([1.0])
    # 11-point: recall >= {0, .1 ... .5} -> p=1 (6 points), rest 0
    assert voc_ap(rec, prec, True) == pytest.approx(6 / 11)
    # continuous: area = 0.5 * 1
    assert voc_ap(rec, prec, False) == pytest.approx(0.5)


def test_eval_class_perfect():
    gt = {"img1": (np.stack([_box(0, 0, 10, 10), _box(50, 50, 70, 60)]),
                   np.asarray([False, False]))}
    rec, prec, ap, so = eval_class(
        ["img1", "img1"], np.asarray([0.9, 0.8]),
        np.stack([_box(0, 0, 10, 10), _box(50, 50, 70, 60)]), gt,
    )
    assert ap == pytest.approx(1.0)


def test_eval_class_duplicate_is_fp():
    gt = {"img1": (np.stack([_box(0, 0, 10, 10)]), np.asarray([False]))}
    rec, prec, ap, so = eval_class(
        ["img1", "img1"], np.asarray([0.9, 0.8]),
        np.stack([_box(0, 0, 10, 10), _box(0.5, 0, 10.5, 10)]), gt,
    )
    # first matches, second is a duplicate -> FP; AP stays 1.0 at 07 metric? no:
    # prec drops to 0.5 after 2nd det but all recall points already at p=1
    assert rec[-1] == pytest.approx(1.0)
    assert prec[-1] == pytest.approx(0.5)


def test_eval_class_difficult_neither_tp_nor_fp():
    gt = {"img1": (np.stack([_box(0, 0, 10, 10)]), np.asarray([True]))}
    rec, prec, ap, so = eval_class(
        ["img1"], np.asarray([0.9]), np.stack([_box(0, 0, 10, 10)]), gt,
    )
    # npos == 0; match to difficult is dropped entirely
    assert ap == 0.0


def test_eval_class_low_iou_is_fp():
    gt = {"img1": (np.stack([_box(0, 0, 10, 10)]), np.asarray([False]))}
    rec, prec, ap, so = eval_class(
        ["img1"], np.asarray([0.9]), np.stack([_box(8, 8, 20, 20)]), gt,
    )
    assert ap == 0.0


def test_evaluator_end_to_end(tmp_path):
    records = [
        {
            "image_id": "im0",
            "annotations": [
                {"corners": _box(0, 0, 10, 10).tolist(), "category_id": 0,
                 "difficult": False},
                {"corners": _box(30, 30, 50, 40).tolist(), "category_id": 1,
                 "difficult": False},
            ],
        }
    ]
    ev = RotatedDetectionEvaluator(
        "test_ds", records, class_names=["a", "b"], output_dir=str(tmp_path)
    )
    ev.process_image(
        "im0",
        np.stack([_box(0, 0, 10, 10), _box(30, 30, 50, 40)]),
        np.asarray([0.9, 0.8]),
        np.asarray([0, 1]),
        np.asarray([True, True]),
    )
    res = ev.evaluate()
    assert res["mAP"] == pytest.approx(100.0)
    assert os.path.exists(tmp_path / "task1" / "Task1_a.txt")
    assert os.path.exists(tmp_path / "results.txt")


def test_render_samples_side_by_side(tmp_path):
    """Eval-time pred-vs-GT renderings (dota_evaluation.py:231-305): one
    side-by-side panel per sampled image under samples/<thresh>/, GT-less
    images skipped, sub-threshold predictions not drawn."""
    cv2 = pytest.importorskip("cv2")
    hw = 64
    records = [
        {
            "image_id": "im0",
            "image": np.zeros((hw, hw, 3), np.uint8),
            "annotations": [
                {"corners": _box(4, 4, 20, 20).tolist(), "category_id": 0,
                 "difficult": False},
            ],
        },
        {  # no annotations -> must be skipped like the reference
            "image_id": "im1",
            "image": np.zeros((hw, hw, 3), np.uint8),
            "annotations": [],
        },
    ]
    ev = RotatedDetectionEvaluator(
        "test_ds", records, class_names=["a"], output_dir=str(tmp_path)
    )
    for image_id in ("im0", "im1"):
        ev.process_image(
            image_id,
            np.stack([_box(4, 4, 20, 20), _box(30, 30, 50, 40)]),
            np.asarray([0.9, 0.1]),  # second is below the 0.3 threshold
            np.asarray([0, 0]),
            np.asarray([True, True]),
        )
    paths = ev.render_samples(num_images=5, score_thresh=0.3)
    assert paths == [str(tmp_path / "samples" / "0.3" / "im0.png")]
    panel = cv2.imread(paths[0])
    assert panel.shape == (hw, 2 * hw, 3)  # [pred | gt] concat
    # prediction panel has drawn pixels; the sub-threshold far box region
    # (right half of the pred panel, around (30..50, 30..40)) stays black
    pred_panel = panel[:, :hw]
    assert pred_panel.any()
    assert not pred_panel[28:44, 28:54].any()


def test_evaluator_duplicate_records_deduped(tmp_path):
    """Regression: *_mini splits sample records WITH replacement
    (dota.py:312-318); duplicated records must not double the ground truth
    (npos) — the reference keys gt per image name, so a perfect detection
    must still score mAP 100 on a duplicated record list."""
    rec = {
        "image_id": "im0",
        "annotations": [
            {"corners": _box(0, 0, 10, 10).tolist(), "category_id": 0,
             "difficult": False},
        ],
    }
    ev = RotatedDetectionEvaluator(
        "test_ds", [rec, dict(rec), dict(rec)], class_names=["a"],
        output_dir=str(tmp_path),
    )
    ev.process_image(
        "im0",
        np.stack([_box(0, 0, 10, 10)]),
        np.asarray([0.9]),
        np.asarray([0]),
        np.asarray([True]),
    )
    res = ev.evaluate()
    assert res["mAP"] == pytest.approx(100.0)


def test_reregistration_uses_latest_cfg(tmp_path, monkeypatch):
    """Regression: register_* calls previously kept the FIRST cfg's closure
    forever (silent skip on re-register); the latest registration must win
    so a second config in the same process sees its own filters/data root."""
    from dafne_tpu.config import get_cfg
    from dafne_tpu.data import register_all_datasets
    from dafne_tpu.data.registry import DatasetCatalog

    monkeypatch.setenv("DAFNE_DATA_DIR", str(tmp_path / "rootA"))
    cfg_a = get_cfg()
    cfg_a.DEBUG.OVERFIT_NUM_IMAGES = 0
    register_all_datasets(cfg_a)
    loader_a = DatasetCatalog._loaders["synthetic_train"]

    monkeypatch.setenv("DAFNE_DATA_DIR", str(tmp_path / "rootB"))
    cfg_b = get_cfg()
    register_all_datasets(cfg_b)
    assert DatasetCatalog._loaders["synthetic_train"] is not loader_a


def test_tile_id_parse():
    assert parse_tile_id("P0003__1__600___1200") == ("P0003", 1.0, 600.0, 1200.0)
    assert parse_tile_id("P0003__0.5__0___0") == ("P0003", 0.5, 0.0, 0.0)
    assert parse_tile_id("plainid") == ("plainid", 1.0, 0.0, 0.0)


def test_merge_class_lines():
    # same physical object seen in two overlapping tiles -> one detection
    b = _box(100, 100, 160, 130)
    t1 = (b.reshape(4, 2) - [0, 0]).reshape(8)      # tile at (0, 0)
    t2 = (b.reshape(4, 2) - [50, 50]).reshape(8)    # tile at (50, 50)
    lines = [
        "P1__1__0___0 0.9 " + " ".join(f"{v}" for v in t1),
        "P1__1__50___50 0.8 " + " ".join(f"{v}" for v in t2),
        "P1__1__0___0 0.7 " + " ".join(f"{v}" for v in _box(300, 300, 340, 330)),
    ]
    merged = merge_class_lines(lines, nms_thresh=0.1)
    assert len(merged) == 2
    scores = sorted(float(l.split()[1]) for l in merged)
    assert scores == [0.7, 0.9]


def test_merge_by_poly_files(tmp_path):
    src = tmp_path / "src"
    dst = tmp_path / "dst"
    os.makedirs(src)
    b = _box(10, 10, 60, 40)
    with open(src / "Task1_ship.txt", "w") as f:
        f.write("P1__1__0___0 0.9 " + " ".join(map(str, b)) + "\n")
        f.write("P1__1__0___0 0.8 " + " ".join(map(str, b + 1.0)) + "\n")
    merge_by_poly(str(src), str(dst), num_workers=1)
    with open(dst / "Task1_ship.txt") as f:
        lines = [l for l in f.read().splitlines() if l]
    assert len(lines) == 1 and lines[0].startswith("P1 0.9")
    zp = make_submission_zip(str(dst), str(tmp_path / "sub.zip"))
    assert os.path.exists(zp)


def test_native_polyiou_matches_numpy():
    from dafne_tpu.utils import polyiou_np

    rng = np.random.RandomState(5)
    from tests.test_geometry import random_convex_quads

    p = random_convex_quads(100, rng)
    q = random_convex_quads(100, rng)
    got = polyiou.iou_poly_pairs(p, q)
    want = polyiou_np.iou_pairs(p, q)
    np.testing.assert_allclose(got, want, atol=1e-9)
