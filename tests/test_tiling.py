"""DOTA tiling pipeline tests: splitter geometry, label rewrite, COCO io."""

import os

import numpy as np
import pytest

from tools.prepare_dota.tile_dota import (
    TileSplitter,
    best_point_order,
    clip_polygon_to_rect,
    parse_dota_label,
    poly5_to_poly4,
    polygon_area,
    rewrite_labels_for_tile,
    tile_origins,
    write_dota_label,
)
from tools.prepare_dota.dota_to_coco import DOTA10_CLASSES, dota_to_coco_train


def test_tile_origins():
    assert tile_origins(2048, 1024, 824) == [0, 824, 1024]
    assert tile_origins(1024, 1024, 824) == [0]
    assert tile_origins(500, 1024, 824) == [0]
    # last window snaps to the edge
    assert tile_origins(3000, 1024, 824)[-1] == 3000 - 1024


def test_clip_polygon():
    sq = np.asarray([0.0, 0, 10, 0, 10, 10, 0, 10])
    inside = clip_polygon_to_rect(sq, -5, -5, 20, 20)
    assert polygon_area(inside.reshape(-1)) == pytest.approx(100)
    half = clip_polygon_to_rect(sq, 5, -5, 20, 20)
    assert polygon_area(half.reshape(-1)) == pytest.approx(50)
    out = clip_polygon_to_rect(sq, 20, 20, 30, 30)
    assert len(out) == 0


def test_poly5_to_poly4():
    # pentagon with one tiny edge -> its endpoints merged
    p5 = [0.0, 0, 10, 0, 10.2, 0.2, 10, 10, 0, 10]
    p4 = np.asarray(poly5_to_poly4(p5)).reshape(4, 2)
    assert p4.shape == (4, 2)
    # merged midpoint of the short edge present
    assert np.min(np.linalg.norm(p4 - [10.1, 0.1], axis=1)) < 0.2


def test_best_point_order():
    ref = np.asarray([0.0, 0, 10, 0, 10, 10, 0, 10])
    shifted = np.asarray([10.0, 10, 0, 10, 0, 0, 10, 0])  # rolled by 2
    out = best_point_order(shifted, ref)
    np.testing.assert_allclose(out, ref)


def test_rewrite_labels():
    objs = [
        {"poly": [100, 100, 200, 100, 200, 150, 100, 150], "name": "ship",
         "difficult": "0"},  # fully inside
        {"poly": [900, 100, 1100, 100, 1100, 150, 900, 150], "name": "ship",
         "difficult": "0"},  # cut in half by right edge at 1024? no: inside
        {"poly": [980, 100, 1100, 100, 1100, 150, 980, 150], "name": "plane",
         "difficult": "0"},  # mostly outside tile [0,1024) -> ratio 44/120
        {"poly": [2000, 2000, 2100, 2000, 2100, 2050, 2000, 2050],
         "name": "ship", "difficult": "0"},  # fully outside
    ]
    out = rewrite_labels_for_tile(objs, 0, 0, 1024, thresh=0.7)
    assert len(out) == 3
    # fully-inside object unchanged
    np.testing.assert_allclose(out[0]["poly"], objs[0]["poly"])
    assert out[0]["difficult"] == "0"
    # badly-cut object tagged difficult "2"
    assert out[2]["difficult"] == "2"
    assert max(out[2]["poly"]) <= 1024


def test_full_split_and_coco(tmp_path):
    import cv2

    # synthetic "DOTA" image 1500x1200 with two ships
    src = tmp_path / "train"
    os.makedirs(src / "images")
    os.makedirs(src / "labelTxt")
    img = np.zeros((1200, 1500, 3), np.uint8)
    cv2.rectangle(img, (100, 100), (300, 200), (255, 255, 255), -1)
    cv2.imwrite(str(src / "images" / "P0001.png"), img)
    write_dota_label(
        str(src / "labelTxt" / "P0001.txt"),
        [
            {"poly": [100, 100, 300, 100, 300, 200, 100, 200],
             "name": "ship", "difficult": "0"},
            {"poly": [700, 500, 900, 500, 900, 620, 700, 620],
             "name": "plane", "difficult": "0"},
        ],
    )
    out = tmp_path / "train1024"
    n = TileSplitter(
        str(src), str(out), subsize=1024, gap=200, num_workers=1
    ).split()
    assert n == 4  # origins [0, 476] x [0, 176]
    tiles = sorted(os.listdir(out / "images"))
    assert "P0001__1.0__0___0.png" in tiles
    assert all(
        cv2.imread(str(out / "images" / t)).shape[:2] == (1024, 1024)
        for t in tiles
    )
    # tile (0,0) contains both objects fully
    objs = parse_dota_label(str(out / "labelTxt" / "P0001__1.0__0___0.txt"))
    assert len(objs) == 2

    data = dota_to_coco_train(
        str(out), str(out / "DOTA1_train1024.json"), DOTA10_CLASSES
    )
    assert len(data["images"]) == 4
    assert all(a["category_id"] in (7, 1) for a in data["annotations"])

    # and the registered-dataset loader can consume it
    from dafne_tpu.config import get_cfg
    from dafne_tpu.data.datasets.dota import load_dota_json

    cfg = get_cfg()
    records = load_dota_json(
        str(out / "DOTA1_train1024.json"), str(out / "images"), cfg
    )
    assert len(records) == 4
    rec = [r for r in records if r["image_id"] == "P0001__1.0__0___0"][0]
    assert len(rec["annotations"]) == 2
    cats = sorted(a["category_id"] for a in rec["annotations"])
    assert cats == [0, 6]  # plane, ship (0-based contiguous)
