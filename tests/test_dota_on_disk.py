"""End-to-end DOTA-on-disk pipeline: raw scene -> tiler -> COCO json ->
DAFNE_DATA_DIR registration -> loader filters -> mapper -> train batch.

This is the full offline + online data path a real DOTA training run takes
(the synthetic dataset used elsewhere skips the disk formats entirely):
reference behavior contracts from dafne/data/datasets/dota.py:226-318 and
tools/prepare_dota/split_dota.py:82-145.
"""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dafne_tpu.config import get_cfg
from dafne_tpu.data.registry import DatasetCatalog, MetadataCatalog


def _write_raw_scene(src):
    import cv2

    os.makedirs(src / "images")
    os.makedirs(src / "labelTxt")
    img = np.zeros((1200, 1500, 3), np.uint8)
    cv2.rectangle(img, (100, 100), (300, 200), (255, 255, 255), -1)
    cv2.rectangle(img, (700, 500), (900, 620), (128, 128, 255), -1)
    cv2.imwrite(str(src / "images" / "P0001.png"), img)
    lines = [
        # two real objects
        "100 100 300 100 300 200 100 200 ship 0",
        "700 500 900 500 900 620 700 620 plane 0",
        # degenerate quad (two coincident corners): loader must drop it
        "400 400 400 400 500 450 400 450 ship 0",
        # tiny sliver below MIN_SIDE/MIN_AREA: loader must drop it
        "650 650 652 650 652 651 650 651 small-vehicle 0",
    ]
    with open(src / "labelTxt" / "P0001.txt", "w") as f:
        f.write("imagesource:GoogleEarth\ngsd:0.1\n" + "\n".join(lines) + "\n")


def test_dota_disk_to_train_batch(tmp_path, monkeypatch):
    from tools.prepare_dota.split_dota import prepare

    raw = tmp_path / "dota_1"
    _write_raw_scene(raw / "train")
    _write_raw_scene(raw / "val")

    dest = tmp_path / "dota_1_split"
    prepare(str(raw), str(dest), patch_size=1024, overlap=200, workers=1)

    out = dest / "train1024"
    json_path = out / "DOTA1_train1024.json"
    assert json_path.exists() and (out / "images").is_dir()
    coco = json.loads(json_path.read_text())
    assert len(coco["images"]) == 4  # 1500x1200 -> 2x2 tile grid
    assert {c["name"] for c in coco["categories"]} >= {"ship", "plane"}

    # register under this data root (clear any prior registration first)
    monkeypatch.setenv("DAFNE_DATA_DIR", str(tmp_path))
    for name in list(DatasetCatalog._loaders):
        if name.startswith("dota_"):
            del DatasetCatalog._loaders[name]
    cfg = get_cfg()
    cfg.DATASETS.TRAIN = ["dota_1_train_1024"]
    cfg.DATASETS.TEST = ["dota_1_val_1024"]
    from dafne_tpu.data import register_all_datasets

    register_all_datasets(cfg)

    records = DatasetCatalog.get("dota_1_train_1024")
    assert len(records) == 4
    meta = MetadataCatalog["dota_1_train_1024"]
    assert meta["evaluator_type"] == "dota" and len(meta["thing_classes"]) == 15

    # the (0,0) tile fully contains both real objects; the degenerate quad
    # and the sub-MIN_SIDE sliver must have been filtered by the loader
    by_id = {r["image_id"]: r for r in records}
    r00 = by_id["P0001__1__0___0"]
    names = [meta["thing_classes"][a["category_id"]] for a in r00["annotations"]]
    assert sorted(names) == ["plane", "ship"]
    assert os.path.exists(r00["file_name"])

    # _mini twin exists and resamples (>= 10 with replacement)
    mini = DatasetCatalog.get("dota_1_train_1024_mini")
    assert len(mini) >= 10

    # mapper produces a static-shape train example from the on-disk tile
    from dafne_tpu.data.mapper import DatasetMapper

    cfg.TPU.MAX_INSTANCES = 16
    mapper = DatasetMapper(cfg, train=True, pad_hw=(1024, 1024))
    rng = np.random.RandomState(0)
    ex = mapper(r00, rng)
    assert ex["image"].shape[-1] == 3
    assert ex["gt_corners"].shape == (16, 8)
    assert int(ex["gt_valid"].sum()) == 2
    # corners of valid rows are canonically sorted (p1 leftmost)
    v = ex["gt_corners"][ex["gt_valid"]]
    assert np.all(v[:, 0] == v[:, 0::2].min(axis=1))

    # one real train batch through the loader
    from dafne_tpu.data.loader import DataLoader

    cfg.SOLVER.IMS_PER_BATCH = 2
    cfg.DATALOADER.NUM_WORKERS = 0
    loader = DataLoader(
        cfg, records, batch_size=2, train=True, seed=0, pad_hw=(1024, 1024)
    )
    batch = next(iter(loader))
    assert batch["image"].shape[0] == 2
    assert batch["gt_corners"].shape[1:] == (16, 8)
