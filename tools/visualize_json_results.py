#!/usr/bin/env python3
"""Visualize dumped detection results (Task1 files) on their images.

Equivalent of tools/visualize_json_results.py, reading the Task1 per-class
files this framework's evaluator writes:

  python tools/visualize_json_results.py --config-file ... \
      --task1-dir OUTPUT_DIR/inference/<dataset>/task1 --dataset <dataset> \
      --output-dir /tmp/vis_pred --conf-threshold 0.3
"""

import argparse
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def load_task1(task1_dir):
    per_image = defaultdict(list)
    for fn in sorted(os.listdir(task1_dir)):
        if not (fn.startswith("Task1_") and fn.endswith(".txt")):
            continue
        cls = fn[len("Task1_"):-4]
        with open(os.path.join(task1_dir, fn)) as f:
            for line in f:
                parts = line.split()
                if len(parts) < 10:
                    continue
                per_image[parts[0]].append(
                    (cls, float(parts[1]), [float(v) for v in parts[2:10]])
                )
    return per_image


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config-file", required=True)
    p.add_argument("--task1-dir", required=True)
    p.add_argument("--dataset", required=True)
    p.add_argument("--output-dir", default="vis_pred")
    p.add_argument("--conf-threshold", type=float, default=0.3)
    p.add_argument("--num-images", type=int, default=20)
    p.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    args = p.parse_args()

    from dafne_tpu.config import load_config

    cfg = load_config(args.config_file, freeze=False)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()

    import cv2

    from dafne_tpu.data import MetadataCatalog, get_dataset, register_all_datasets
    from dafne_tpu.data.mapper import read_image
    from tools.demo import PALETTE

    register_all_datasets(cfg)
    records = {str(r["image_id"]): r for r in get_dataset(args.dataset, cfg)}
    classes = MetadataCatalog.get(args.dataset, {}).get("thing_classes", [])
    cls_idx = {n: i for i, n in enumerate(classes)}
    preds = load_task1(args.task1_dir)

    os.makedirs(args.output_dir, exist_ok=True)
    for image_id, dets in list(preds.items())[: args.num_images]:
        rec = records.get(image_id)
        if rec is None:
            continue
        img = (
            rec["image"].copy()
            if "image" in rec
            else read_image(rec["file_name"], cfg.INPUT.FORMAT)
        )
        for cls, score, poly in dets:
            if score < args.conf_threshold:
                continue
            color = PALETTE[cls_idx.get(cls, 0) % len(PALETTE)]
            pts = np.asarray(poly).reshape(4, 2).astype(np.int32)
            cv2.polylines(img, [pts], True, color, 2)
            cv2.putText(
                img, f"{cls} {score:.2f}", tuple(pts[0]),
                cv2.FONT_HERSHEY_SIMPLEX, 0.5, color, 1, cv2.LINE_AA,
            )
        dst = os.path.join(args.output_dir, f"{image_id}.png")
        cv2.imwrite(dst, img)
        print(dst)


if __name__ == "__main__":
    main()
