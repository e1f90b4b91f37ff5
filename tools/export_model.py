#!/usr/bin/env python3
"""Export the fused inference step as a serialized StableHLO artifact.

Serving-deployment counterpart of the reference's (vestigial) deploy
examples (tools/deploy/*, SURVEY.md §2.4): the WHOLE pipeline — normalize →
backbone+FPN → head → static decode → exact rotated NMS → top-k — is one
jitted program here, so `jax.export` captures it as a single portable
StableHLO module with the trained weights baked in as constants (or kept as
arguments with --weights-as-args).  The artifact replays on any machine with
jax installed via `jax.export.deserialize` — no dafne_tpu import needed at
serving time.

Usage:
  python tools/export_model.py --config-file configs/dota-1.0/1024.yaml \
      [--output-dir OUT] [--batch N] [--weights-as-args]

Writes OUT/model.stablehlo (serialized Exported) + OUT/export_meta.json.
Smoke-check a written artifact:
  python tools/export_model.py --check OUT/model.stablehlo
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dafne_tpu.utils.platform import pin_platform_from_env


def build_exported(cfg, batch: int, weights_as_args: bool):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import export as jexport

    from dafne_tpu.data.mapper import eval_preprocess_meta, pad_target_hw
    from dafne_tpu.engine.checkpoint import Checkpointer
    from dafne_tpu.engine.train_loop import build_state
    from dafne_tpu.engine.trainer import make_eval_step
    from dafne_tpu.models import build_model

    model = build_model(cfg)
    pad_hw = pad_target_hw(cfg, train=False)
    state, _, _ = build_state(cfg, model, pad_hw)
    state, step = Checkpointer(cfg.OUTPUT_DIR).resume_or_load(
        state, cfg, resume=True
    )
    eval_step = make_eval_step(model, cfg, pad_hw)
    params, batch_stats = state.params, state.batch_stats

    img_spec = jax.ShapeDtypeStruct((batch,) + pad_hw + (3,), jnp.float32)
    scale_spec = jax.ShapeDtypeStruct((batch, 2), jnp.float32)

    if weights_as_args:
        fn = jax.jit(
            lambda p, images, scale_xy: eval_step(p, images, scale_xy, batch_stats)
        )
        param_spec = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params
        )
        exported = jexport.export(fn)(param_spec, img_spec, scale_spec)
    else:
        # weights baked in as constants: a self-contained serving artifact
        fn = jax.jit(
            lambda images, scale_xy: eval_step(params, images, scale_xy, batch_stats)
        )
        exported = jexport.export(fn)(img_spec, scale_spec)

    meta = {
        "pad_hw": list(pad_hw),
        "batch": batch,
        "checkpoint_step": int(step),
        "weights": cfg.MODEL.WEIGHTS,  # serve.py: untrained detection
        "weights_as_args": weights_as_args,
        "platforms": list(exported.platforms),
        "output_keys": ["corners", "hboxes", "scores", "classes",
                        "centerness", "locations", "valid"],
        # eval-preprocessing recipe (incl. channel order), so
        # tools/serve.py can reproduce the mapper's resize + scale_xy
        # without the config
        **eval_preprocess_meta(cfg),
    }
    return exported, meta


def check(path: str):
    """Deserialize and run the artifact on zeros — no dafne_tpu needed."""
    import jax
    import numpy as np
    from jax import export as jexport

    with open(path, "rb") as f:
        exported = jexport.deserialize(bytearray(f.read()))
    meta_path = os.path.join(os.path.dirname(path), "export_meta.json")
    meta = json.load(open(meta_path)) if os.path.exists(meta_path) else {}
    print(f"platforms: {exported.platforms}")
    print(f"in_avals:  {[str(a) for a in exported.in_avals][:3]} ...")
    if meta.get("weights_as_args"):
        print("weights-as-args artifact: skipping zero-input replay "
              "(needs the param tree)")
        return 0
    b = meta.get("batch", 1)
    hw = meta.get("pad_hw", [1024, 1024])
    images = np.zeros((b, hw[0], hw[1], 3), np.float32)
    scale = np.ones((b, 2), np.float32)
    out = exported.call(images, scale)
    shapes = jax.tree_util.tree_map(lambda o: tuple(np.asarray(o).shape), out)
    print(f"replay OK — output shapes: {shapes}")
    return 0


def main(argv=None):
    pin_platform_from_env()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config-file", default="")
    p.add_argument("--output-dir", default="")
    p.add_argument("--batch", type=int, default=0,
                   help="serving batch (default TPU.EVAL_BATCH)")
    p.add_argument("--weights-as-args", action="store_true")
    p.add_argument("--check", default="", metavar="ARTIFACT",
                   help="deserialize+replay an artifact instead of exporting")
    p.add_argument("opts", nargs=argparse.REMAINDER)
    args = p.parse_args(argv)

    if args.check:
        return check(args.check)

    from dafne_tpu.config import load_config
    from dafne_tpu.data import register_all_datasets

    assert args.config_file, "--config-file required (or use --check)"
    cfg = load_config(args.config_file)
    cfg.defrost()
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()
    register_all_datasets(cfg)
    out_dir = args.output_dir or os.path.join(cfg.OUTPUT_DIR, "export")
    os.makedirs(out_dir, exist_ok=True)
    batch = args.batch or int(cfg.TPU.EVAL_BATCH)

    exported, meta = build_exported(cfg, batch, args.weights_as_args)
    blob = exported.serialize()
    path = os.path.join(out_dir, "model.stablehlo")
    with open(path, "wb") as f:
        f.write(blob)
    with open(os.path.join(out_dir, "export_meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    print(json.dumps({"artifact": path, "bytes": len(blob), **meta}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
