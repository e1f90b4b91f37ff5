"""Tiles + labelTxt -> COCO-style json (DOTA2COCO.py equivalent).

Same output contract as the reference converter (DOTA2COCO.py:13-97):
polygon stored as `segmentation`, enclosing hbox as xywh `bbox`, category
ids 1-based in file (the dataset loader re-maps to contiguous 0-based), and
a `difficult` filter value ("-1" keeps everything, the shipped default).
The difficult flag is additionally stored per annotation so evaluation can
exclude difficult objects without re-parsing labelTxt.
"""

from __future__ import annotations

import json
import os
from typing import List

from tools.prepare_dota.tile_dota import parse_dota_label, polygon_area

DOTA10_CLASSES = [
    "plane", "baseball-diamond", "bridge", "ground-track-field",
    "small-vehicle", "large-vehicle", "ship", "tennis-court",
    "basketball-court", "storage-tank", "soccer-ball-field", "roundabout",
    "harbor", "swimming-pool", "helicopter",
]
DOTA15_CLASSES = DOTA10_CLASSES + ["container-crane"]


def _image_size(path: str):
    from PIL import Image

    with Image.open(path) as im:
        return im.size  # (w, h)


def dota_to_coco_train(
    src: str, dest_json: str, class_names: List[str], difficult_filter: str = "-1"
) -> dict:
    image_dir = os.path.join(src, "images")
    label_dir = os.path.join(src, "labelTxt")
    data = {
        "images": [],
        "annotations": [],
        "categories": [
            {"id": i + 1, "name": n, "supercategory": n}
            for i, n in enumerate(class_names)
        ],
    }
    inst_id, image_id = 1, 1
    for fn in sorted(os.listdir(label_dir)):
        if not fn.endswith(".txt"):
            continue
        base = os.path.splitext(fn)[0]
        img_path = os.path.join(image_dir, base + ".png")
        w, h = _image_size(img_path)
        data["images"].append(
            {"file_name": base + ".png", "id": image_id, "width": w, "height": h}
        )
        for obj in parse_dota_label(os.path.join(label_dir, fn)):
            if obj["difficult"] == difficult_filter:
                continue
            if obj["name"] not in class_names:
                continue
            poly = obj["poly"]
            xs, ys = poly[0::2], poly[1::2]
            x0, y0, x1, y1 = min(xs), min(ys), max(xs), max(ys)
            data["annotations"].append(
                {
                    "id": inst_id,
                    "image_id": image_id,
                    "category_id": class_names.index(obj["name"]) + 1,
                    "segmentation": [poly],
                    "bbox": [x0, y0, x1 - x0, y1 - y0],
                    "area": polygon_area(__import__("numpy").asarray(poly, float)),
                    "iscrowd": 0,
                    "difficult": int(obj["difficult"] not in ("0", 0)),
                }
            )
            inst_id += 1
        image_id += 1
    os.makedirs(os.path.dirname(dest_json) or ".", exist_ok=True)
    with open(dest_json, "w") as f:
        json.dump(data, f)
    return data


def dota_to_coco_test(src: str, dest_json: str, class_names: List[str]) -> dict:
    image_dir = os.path.join(src, "images")
    data = {
        "images": [],
        "annotations": [],
        "categories": [
            {"id": i + 1, "name": n, "supercategory": n}
            for i, n in enumerate(class_names)
        ],
    }
    image_id = 1
    for fn in sorted(os.listdir(image_dir)):
        if not fn.endswith(".png"):
            continue
        w, h = _image_size(os.path.join(image_dir, fn))
        data["images"].append(
            {"file_name": fn, "id": image_id, "width": w, "height": h}
        )
        image_id += 1
    os.makedirs(os.path.dirname(dest_json) or ".", exist_ok=True)
    with open(dest_json, "w") as f:
        json.dump(data, f)
    return data
