#!/usr/bin/env python3
"""Visualize ground truth as the dataloader sees it (augmentations applied).

Equivalent of tools/visualize_data.py: renders gt polygons either from the
raw registered annotations (`--source annotation`) or after the full
train-time augmentation pipeline (`--source dataloader`).

  python tools/visualize_data.py --config-file configs/synthetic/base.yaml \
      --source dataloader --num-images 8 --output-dir /tmp/vis_gt
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from dafne_tpu.utils.platform import pin_platform_from_env
    pin_platform_from_env()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config-file", required=True)
    p.add_argument("--source", choices=["annotation", "dataloader"],
                   default="annotation")
    p.add_argument("--num-images", type=int, default=10)
    p.add_argument("--output-dir", default="vis_gt")
    p.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    args = p.parse_args()

    from dafne_tpu.config import load_config

    cfg = load_config(args.config_file, freeze=False)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()

    import cv2

    from dafne_tpu.data import MetadataCatalog, get_dataset, register_all_datasets
    from dafne_tpu.data.mapper import DatasetMapper, pad_target_hw, read_image
    from tools.demo import PALETTE

    register_all_datasets(cfg)
    name = cfg.DATASETS.TRAIN[0]
    records = get_dataset(name, cfg)[: args.num_images]
    classes = MetadataCatalog.get(name, {}).get("thing_classes", [])
    os.makedirs(args.output_dir, exist_ok=True)

    mapper = DatasetMapper(cfg, train=True, pad_hw=pad_target_hw(cfg, True))
    for i, rec in enumerate(records):
        if args.source == "dataloader":
            ex = mapper(rec, np.random.RandomState(i))
            img = ex["image"].astype(np.uint8).copy()
            quads = ex["gt_corners"][ex["gt_valid"]]
            cls = ex["gt_classes"][ex["gt_valid"]]
        else:
            img = (
                rec["image"].copy()
                if "image" in rec
                else read_image(rec["file_name"], cfg.INPUT.FORMAT)
            )
            quads = np.asarray(
                [a["corners"] for a in rec.get("annotations", [])]
            ).reshape(-1, 8)
            cls = [a["category_id"] for a in rec.get("annotations", [])]
        for q, c in zip(quads, cls):
            color = PALETTE[int(c) % len(PALETTE)]
            cv2.polylines(
                img, [q.reshape(4, 2).astype(np.int32)], True, color, 2
            )
            label = classes[int(c)] if int(c) < len(classes) else str(c)
            cv2.putText(
                img, label, tuple(q.reshape(4, 2)[0].astype(np.int32)),
                cv2.FONT_HERSHEY_SIMPLEX, 0.5, color, 1, cv2.LINE_AA,
            )
        dst = os.path.join(args.output_dir, f"{rec['image_id']}_{args.source}.png")
        cv2.imwrite(dst, img)
        print(dst)


if __name__ == "__main__":
    main()
