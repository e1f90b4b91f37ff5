"""Deployment-scale generalization-gate plumbing (VERDICT r4 #4).

The expensive run itself (tools/gen_canary.py --scale 1024, real chip) is a
committed artifact (GEN_CANARY_1024.json); these tests pin the cheap parts:
the 1024² dataset family, its seed-space disjointness, the recipe, and the
gate's scale table.
"""

import os

import numpy as np

from dafne_tpu.config import load_config
from dafne_tpu.data.datasets.synthetic import GEN_CLASSES, load_synthetic_gen
from dafne_tpu.data.registry import DatasetCatalog, MetadataCatalog, register_all_datasets

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_gen1024_records_are_deployment_scale():
    recs = load_synthetic_gen("train", 2, hw=1024, max_boxes=96)
    for r in recs:
        assert r["image"].shape == (1024, 1024, 3)
        assert r["image"].dtype == np.uint8
        assert r["height"] == r["width"] == 1024
        assert 3 <= len(r["annotations"]) <= 96
        for a in r["annotations"]:
            c = np.asarray(a["corners"]).reshape(4, 2)
            assert (c >= -1).all() and (c <= 1025).all()
            assert 0 <= a["category_id"] < len(GEN_CLASSES)


def test_gen1024_seed_spaces_disjoint():
    tr = load_synthetic_gen("train", 2, hw=1024, max_boxes=96)
    va = load_synthetic_gen("val", 2, hw=1024, max_boxes=96)
    assert {r["image_id"] for r in tr}.isdisjoint({r["image_id"] for r in va})
    # val really is a different scene, not a re-render of a train seed
    assert not np.array_equal(tr[0]["image"], va[0]["image"])


def test_gen1024_recipe_and_registration():
    cfg = load_config(os.path.join(REPO, "configs", "synthetic", "gen1024.yaml"))
    register_all_datasets(cfg)
    for split in ("train", "val", "test"):
        name = f"synthetic_gen1024_{split}"
        assert name in DatasetCatalog
        assert MetadataCatalog[name]["thing_classes"] == GEN_CLASSES
    assert cfg.DATASETS.TRAIN == ["synthetic_gen1024_train"]
    assert cfg.DATASETS.TEST == ["synthetic_gen1024_val"]
    assert cfg.MODEL.DAFNE.NUM_CLASSES == len(GEN_CLASSES)
    # deployment canvas + accuracy-first NMS budget: the point of the gate
    from dafne_tpu.data.mapper import pad_target_hw, train_canvas_buckets

    assert pad_target_hw(cfg, train=True) == (1152, 1152)
    assert cfg.TPU.NMS_MAX_CANDIDATES == 4096
    assert cfg.TPU.MAX_INSTANCES == 96
    # multi-scale training runs the bucketed path: one tight canvas per
    # ladder scale, not worst-case 1152² on every step
    recs = load_synthetic_gen("train", 2, hw=1024, max_boxes=96)
    buckets = train_canvas_buckets(cfg, recs)
    assert buckets is not None
    assert buckets.canvases == [(896, 896), (1024, 1024), (1152, 1152)]


def test_gen_canary_scale_table():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "gen_canary", os.path.join(REPO, "tools", "gen_canary.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert set(mod._SCALES) == {256, 1024}
    for scale, p in mod._SCALES.items():
        cfg = load_config(os.path.join(REPO, "configs", "synthetic", p["cfg"]))
        assert p["out"].startswith("GEN_CANARY")
        assert p["calib_batches"] >= 2
        # the TTA ladder must sit (near-)inside the recipe's train-scale
        # distribution: a scratch-trained canary is scale-brittle, so an
        # out-of-distribution TTA copy measures model robustness instead of
        # the aug-inverse consistency the gate asserts (the fixed-1024
        # first cut failed exactly this way: TTA 87.6 vs plain 89.9).
        # 15% slack: the 256 gate's 192 copy vs its 224 train floor is
        # measured-safe (TTA +6.3 on held-out)
        lo, hi = min(cfg.INPUT.MIN_SIZE_TRAIN), max(cfg.INPUT.MIN_SIZE_TRAIN)
        assert all(0.85 * lo <= s <= 1.15 * hi for s in p["tta_sizes"]), (scale, p)
    assert mod._SCALES[1024]["tta_sizes"][1] == 1024
