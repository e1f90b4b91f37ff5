"""Synthetic rotated-box dataset — no files on disk.

New in this framework (the reference has no data-free path): procedurally
drawn rotated rectangles on noise backgrounds, so the full train/eval loop —
including losses going to ~0 on overfit and mAP going to ~1 — can be
exercised in CI and on machines without DOTA/HRSC downloads.  Registered as
`synthetic_{train,val,test}` with 3 classes.
"""

from __future__ import annotations

from typing import List

import numpy as np

from dafne_tpu.data.registry import DatasetCatalog, MetadataCatalog

CLASSES = ["disk", "square", "stripe"]


def _make_record(seed: int, hw: int = 256, max_boxes: int = 6) -> dict:
    rng = np.random.RandomState(seed)
    img = (rng.rand(hw, hw, 3) * 60).astype(np.uint8)
    n = rng.randint(1, max_boxes + 1)
    annos = []
    for _ in range(n):
        cls = rng.randint(len(CLASSES))
        cx, cy = rng.uniform(40, hw - 40, 2)
        w = rng.uniform(20, 60)
        h = rng.uniform(12, 40)
        ang = rng.uniform(0, np.pi)
        base = np.array(
            [[-w / 2, -h / 2], [w / 2, -h / 2], [w / 2, h / 2], [-w / 2, h / 2]]
        )
        rot = np.array(
            [[np.cos(ang), -np.sin(ang)], [np.sin(ang), np.cos(ang)]]
        )
        quad = base @ rot.T + [cx, cy]
        import cv2

        color = [int(60 + 60 * cls + rng.randint(40)) % 255] * 3
        cv2.fillPoly(img, [quad.astype(np.int32)], color)
        xs, ys = quad[:, 0], quad[:, 1]
        annos.append(
            {
                "corners": quad.reshape(8).tolist(),
                "bbox": [xs.min(), ys.min(), xs.max(), ys.max()],
                "category_id": int(cls),
                "difficult": False,
                "area": float(w * h),
            }
        )
    return {
        "image": img,
        "file_name": f"synthetic_{seed}.png",
        "image_id": f"syn{seed}",
        "height": hw,
        "width": hw,
        "annotations": annos,
    }


def load_synthetic(split: str, n: int = 64, hw: int = 256) -> List[dict]:
    base = {"train": 0, "val": 10_000, "test": 20_000}[split]
    return [_make_record(base + i, hw=hw) for i in range(n)]


def register_synthetic(cfg) -> None:
    for split, n in [("train", 64), ("val", 16), ("test", 16)]:
        name = f"synthetic_{split}"
        DatasetCatalog.register(name, lambda s=split, k=n: load_synthetic(s, k))
        MetadataCatalog[name] = {
            "evaluator_type": "synthetic",
            "thing_classes": CLASSES,
            "split": split,
            "is_test": False,
        }
