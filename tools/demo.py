#!/usr/bin/env python3
"""Inference + visualization on arbitrary images.

Equivalent of tools/demo/demo.py (TTADefaultPredictor + polygon rendering):

  python tools/demo.py --config-file configs/dota-1.0/1024.yaml \
      --input img1.png img2.png --output /tmp/vis \
      [--confidence-threshold 0.3] [--tta] [OPTS ...]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PALETTE = [
    (31, 119, 180), (255, 127, 14), (44, 160, 44), (214, 39, 40),
    (148, 103, 189), (140, 86, 75), (227, 119, 194), (127, 127, 127),
    (188, 189, 34), (23, 190, 207), (174, 199, 232), (255, 187, 120),
    (152, 223, 138), (255, 152, 150), (197, 176, 213), (196, 156, 148),
]


def draw_detections(img, corners, scores, classes, class_names, thresh=0.3):
    import cv2

    vis = img.copy()
    for box, s, c in zip(corners, scores, classes):
        if s < thresh:
            continue
        color = PALETTE[int(c) % len(PALETTE)]
        pts = np.asarray(box, np.float64).reshape(4, 2).astype(np.int32)
        cv2.polylines(vis, [pts], True, color, 2)
        name = class_names[int(c)] if int(c) < len(class_names) else str(int(c))
        cv2.putText(
            vis, f"{name} {s:.2f}", tuple(pts[0]), cv2.FONT_HERSHEY_SIMPLEX,
            0.5, color, 1, cv2.LINE_AA,
        )
    return vis


def main():
    from dafne_tpu.utils.platform import pin_platform_from_env
    pin_platform_from_env()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config-file", required=True)
    p.add_argument("--input", nargs="+", required=True)
    p.add_argument("--output", default="demo_out")
    p.add_argument("--confidence-threshold", type=float, default=0.3)
    p.add_argument("--weights", default="", help="checkpoint dir (OUTPUT_DIR)")
    p.add_argument("--tta", action="store_true")
    p.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    args = p.parse_args()

    from dafne_tpu.config import load_config

    cfg = load_config(args.config_file, freeze=False)
    if args.opts:
        cfg.merge_from_list(args.opts)
    if args.weights:
        cfg.OUTPUT_DIR = args.weights
    cfg.freeze()

    import cv2
    import jax
    import jax.numpy as jnp

    from dafne_tpu.data import register_all_datasets, MetadataCatalog
    from dafne_tpu.data.mapper import DatasetMapper, pad_target_hw
    from dafne_tpu.engine.checkpoint import Checkpointer
    from dafne_tpu.engine.trainer import make_eval_step
    from dafne_tpu.engine.train_loop import build_state
    from dafne_tpu.models import build_model

    register_all_datasets(cfg)
    meta = MetadataCatalog.get(cfg.DATASETS.TEST[0], {}) if cfg.DATASETS.TEST else {}
    class_names = meta.get("thing_classes", [])

    model = build_model(cfg)
    pad_hw = pad_target_hw(cfg, train=False)
    state, _, _ = build_state(cfg, model, pad_hw)
    state, step = Checkpointer(cfg.OUTPUT_DIR).resume_or_load(state, cfg, resume=True)
    print(f"loaded checkpoint step={step}")

    os.makedirs(args.output, exist_ok=True)
    mapper = DatasetMapper(cfg, train=False, pad_hw=pad_hw)

    if args.tta:
        from dafne_tpu.engine.tta import BucketedEvalSteps, tta_inference_single

        tta_steps = BucketedEvalSteps(cfg, model)
    else:
        eval_step = jax.jit(make_eval_step(model, cfg, pad_hw))

    for path in args.input:
        img = cv2.imread(path)
        if args.tta:
            det = tta_inference_single(cfg, tta_steps, state.params, img,
                                       batch_stats=state.batch_stats)
            corners, scores, classes = det["corners"], det["scores"], det["classes"]
        else:
            ex = mapper({"file_name": path, "annotations": []})
            out = eval_step(
                state.params,
                jnp.asarray(ex["image"])[None],
                jnp.asarray(ex["scale_xy"])[None],
                state.batch_stats,
            )
            v = np.asarray(out["valid"][0])
            corners = np.asarray(out["corners"][0])[v]
            scores = np.asarray(out["scores"][0])[v]
            classes = np.asarray(out["classes"][0])[v]
        vis = draw_detections(
            img, corners, scores, classes, class_names, args.confidence_threshold
        )
        dst = os.path.join(args.output, os.path.basename(path))
        cv2.imwrite(dst, vis)
        n = int((scores >= args.confidence_threshold).sum())
        print(f"{path}: {n} detections >= {args.confidence_threshold} -> {dst}")


if __name__ == "__main__":
    main()
