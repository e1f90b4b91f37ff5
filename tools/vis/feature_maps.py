#!/usr/bin/env python3
"""FPN feature-map heatmap visualization.

Equivalent of tools/vis/feature_maps.py (which depended on the external
detectron2_backbone package): renders per-level channel-mean heatmaps of the
FPN outputs side by side with the input image.

  python tools/vis/feature_maps.py --config-file configs/synthetic/base.yaml \
      --input img.png --output-dir /tmp/featmaps
"""

import argparse
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

import numpy as np


def main():
    from dafne_tpu.utils.platform import pin_platform_from_env
    pin_platform_from_env()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config-file", required=True)
    p.add_argument("--input", required=True)
    p.add_argument("--output-dir", default="featmaps")
    p.add_argument("--weights", default="", help="checkpoint dir (OUTPUT_DIR)")
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
    import flax.linen as nn

    from dafne_tpu.data.mapper import DatasetMapper, pad_target_hw
    from dafne_tpu.engine.checkpoint import Checkpointer
    from dafne_tpu.engine.train_loop import build_state
    from dafne_tpu.models import build_model

    model = build_model(cfg)
    pad_hw = pad_target_hw(cfg, train=False)
    state, _, _ = build_state(cfg, model, pad_hw)
    state, _ = Checkpointer(cfg.OUTPUT_DIR).resume_or_load(state, cfg, resume=True)

    # pull the pyramid from the REAL model (return_features) so every
    # backbone kind / stem flag / fuse type stays in sync automatically
    def pyramid_fn(params, x):
        variables = {"params": params}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
        out = model.apply(variables, x, return_features=True)
        return {
            name: feat
            for name, feat in zip(model.in_features, out["features"])
        }

    mapper = DatasetMapper(cfg, train=False, pad_hw=pad_hw)
    ex = mapper({"file_name": args.input, "annotations": []})
    pyramid = jax.jit(pyramid_fn)(state.params, jnp.asarray(ex["image"])[None])

    os.makedirs(args.output_dir, exist_ok=True)
    base = os.path.splitext(os.path.basename(args.input))[0]
    cv2.imwrite(
        os.path.join(args.output_dir, f"{base}_input.png"),
        ex["image"].astype(np.uint8),
    )
    for name, feat in sorted(pyramid.items()):
        fm = np.asarray(feat[0]).mean(-1)  # channel mean [H, W]
        fm = fm - fm.min()
        fm = fm / max(fm.max(), 1e-9)
        heat = cv2.applyColorMap((fm * 255).astype(np.uint8), cv2.COLORMAP_JET)
        heat = cv2.resize(heat, (pad_hw[1], pad_hw[0]), interpolation=cv2.INTER_NEAREST)
        overlay = (0.5 * heat + 0.5 * ex["image"]).astype(np.uint8)
        dst = os.path.join(args.output_dir, f"{base}_{name}.png")
        cv2.imwrite(dst, overlay)
        print(dst)


if __name__ == "__main__":
    main()
