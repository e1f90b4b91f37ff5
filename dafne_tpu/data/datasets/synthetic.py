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
    register_synthetic_gen(cfg)


# --------------------------------------------------------------------------
# Generalization-gate dataset (`synthetic_gen_{train,val}`) — a HARDER
# procedural family for tools/gen_canary.py (VERDICT r3 item #2).  Unlike the
# smoke set above (class = fill intensity only), class identity here is
# carried by SHAPE + aspect-ratio band + intensity band, scenes have clutter,
# per-object channel tints (so color augs matter) and touching objects, and
# the train/val seed spaces are disjoint: val scenes are never seen in
# training, so val mAP measures generalization of the whole
# aug-inverse/assignment/decode stack, not memorization.
# --------------------------------------------------------------------------

GEN_CLASSES = ["stripe", "square", "ellipse", "ring", "smallrect", "wedge"]

#: per-class (aspect_lo, aspect_hi, long_side_lo, long_side_hi, base_intensity)
_GEN_SPECS = {
    0: (3.5, 6.0, 48, 96, 205),  # stripe: long thin bar
    1: (1.0, 1.25, 26, 52, 125),  # square: near-isotropic block
    2: (1.6, 2.6, 34, 68, 170),  # ellipse: filled ellipse in the rect
    3: (1.0, 1.6, 36, 64, 150),  # ring: thick rectangular outline
    4: (1.5, 2.5, 15, 26, 235),  # smallrect: small bright rect
    5: (1.4, 2.2, 30, 60, 85),  # wedge: filled triangle (half the rect)
}


def _rot_rect(cx, cy, w, h, ang):
    base = np.array(
        [[-w / 2, -h / 2], [w / 2, -h / 2], [w / 2, h / 2], [-w / 2, h / 2]]
    )
    rot = np.array([[np.cos(ang), -np.sin(ang)], [np.sin(ang), np.cos(ang)]])
    return base @ rot.T + [cx, cy]


def _make_gen_record(seed: int, hw: int = 256, max_boxes: int = 10) -> dict:
    import cv2

    rng = np.random.RandomState(seed)
    # noise background with a random illumination gradient
    img = (rng.rand(hw, hw, 3) * 55).astype(np.float32)
    gdir = rng.uniform(0, 2 * np.pi)
    yy, xx = np.mgrid[0:hw, 0:hw].astype(np.float32) / hw
    grad = (np.cos(gdir) * xx + np.sin(gdir) * yy) * rng.uniform(0, 45)
    img += grad[..., None]

    n = rng.randint(3, max_boxes + 1)
    centers: List[np.ndarray] = []
    annos = []
    for _ in range(n):
        cls = rng.randint(len(GEN_CLASSES))
        a_lo, a_hi, s_lo, s_hi, inten = _GEN_SPECS[cls]
        w = rng.uniform(s_lo, s_hi)
        h = w / rng.uniform(a_lo, a_hi)
        margin = max(w, h) / 2 + 4
        # reject-sample a center that keeps moderate separation (touching is
        # fine; near-total occlusion would make GT ambiguous)
        for _try in range(12):
            c = rng.uniform(margin, hw - margin, 2)
            if all(np.hypot(*(c - p)) > 22 for p in centers):
                break
        centers.append(c)
        ang = rng.uniform(0, np.pi)
        quad = _rot_rect(c[0], c[1], w, h, ang)
        tint = np.clip(
            inten + rng.uniform(-22, 22) + rng.uniform(-28, 28, 3), 0, 255
        )
        ipts = quad.astype(np.int32)
        if cls == 2:  # ellipse inscribed in the rotated rect
            cv2.ellipse(
                img,
                (int(c[0]), int(c[1])),
                (int(w / 2), int(h / 2)),
                np.degrees(ang),
                0,
                360,
                tint.tolist(),
                -1,
            )
        elif cls == 3:  # rectangular ring (outline only)
            cv2.polylines(
                img, [ipts], True, tint.tolist(),
                thickness=max(3, int(min(w, h) / 4)),
            )
        elif cls == 5:  # wedge: triangle spanning half the rect
            cv2.fillPoly(img, [ipts[:3]], tint.tolist())
        else:
            cv2.fillPoly(img, [ipts], tint.tolist())
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
    # unannotated clutter: small speckles that must NOT be detected
    for _ in range(rng.randint(0, 6)):
        p = rng.uniform(4, hw - 4, 2).astype(int)
        cv2.circle(img, tuple(p), rng.randint(1, 4), rng.uniform(0, 255, 3).tolist(), -1)

    return {
        "image": np.clip(img, 0, 255).astype(np.uint8),
        "file_name": f"synthetic_gen_{seed}.png",
        "image_id": f"syngen{seed}",
        "height": hw,
        "width": hw,
        "annotations": annos,
    }


def load_synthetic_gen(
    split: str, n: int, hw: int = 256, max_boxes: int = 10
) -> List[dict]:
    # disjoint seed spaces: val/test scenes can never appear in training
    base = {"train": 0, "val": 500_000, "test": 600_000}[split]
    return [_make_gen_record(base + i, hw=hw, max_boxes=max_boxes) for i in range(n)]


def register_synthetic_gen(cfg) -> None:
    # train-set size is fixed (2048 scenes ~= "few-thousand-image");
    # DEBUG.OVERFIT_NUM_IMAGES still truncates downstream like any dataset
    for split, n in [("train", 2048), ("val", 64), ("test", 64)]:
        name = f"synthetic_gen_{split}"
        DatasetCatalog.register(name, lambda s=split, k=n: load_synthetic_gen(s, k))
        MetadataCatalog[name] = {
            "evaluator_type": "synthetic",
            "thing_classes": GEN_CLASSES,
            "split": split,
            "is_test": False,
        }
    register_synthetic_gen1024(cfg)


#: memo for the 1024² scenes (~0.45 s/scene to render): gen_canary loads the
#: train set three times (train, calib slice, train-slice eval) and the
#: pipeline treats records as read-only (the mapper only ever adds an
#: "image" cache key, which synthetic records already carry)
_GEN1024_CACHE: dict = {}


def _load_synthetic_gen1024(split: str, n: int) -> List[dict]:
    key = (split, n)
    if key not in _GEN1024_CACHE:
        _GEN1024_CACHE[key] = load_synthetic_gen(split, n, hw=1024, max_boxes=96)
    return _GEN1024_CACHE[key]


def register_synthetic_gen1024(cfg) -> None:
    """Deployment-scale (1024²) variant of the generalization set: the same
    6-class generator, but scenes rendered at the flagship eval canvas with
    up to 96 objects so the held-out gate exercises the P3-density candidate
    mix / NMS occupancy the headline bench regime actually runs (bench.py
    uses the same generator at hw=1024, max_boxes=96 for its held-out
    buffers; VERDICT r4 #4).  Train/val/test seed spaces are disjoint."""
    for split, n in [("train", 512), ("val", 64), ("test", 64)]:
        name = f"synthetic_gen1024_{split}"
        DatasetCatalog.register(
            name, lambda s=split, k=n: _load_synthetic_gen1024(s, k)
        )
        MetadataCatalog[name] = {
            "evaluator_type": "synthetic",
            "thing_classes": GEN_CLASSES,
            "split": split,
            "is_test": False,
        }
