#!/usr/bin/env python3
"""Calibrate static activation scales for the int8 serving mode.

Runs N eval batches from the config's first TEST dataset through the
model (full precision) with a recording interceptor (layers/quant.py
``calibrate_act_scales``: one jitted step per shape, per-conv-site abs-max
sowed into a flax collection — no eager per-op dispatch), and writes a
{site: amax} JSON.  Point ``TPU.EVAL_INT8_SCALES`` at the JSON to switch
those sites from dynamic to STATIC scales: the quantize then fuses into
the producing op (no runtime max-reduce, activation HBM traffic into the
conv halves).

Usage:
  python tools/calibrate_int8.py --config-file configs/dota-1.0/1024.yaml \
      [--num-batches 8] [--output OUTPUT_DIR/int8_scales.json] \
      [KEY VALUE ...]

Weights come from OUTPUT_DIR's latest checkpoint when one exists (scales
depend on trained weights; calibrating random weights is only useful for
tooling tests).  No reference counterpart — PTQ calibration for a
framework-only serving feature.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dafne_tpu.utils.platform import pin_platform_from_env, setup_compilation_cache

pin_platform_from_env()
setup_compilation_cache()


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config-file", required=True)
    p.add_argument("--num-batches", type=int, default=8)
    p.add_argument("--output", default="")
    p.add_argument("opts", nargs="*", default=[])
    args = p.parse_args(argv)

    from dafne_tpu.config import load_config
    from dafne_tpu.data.grain_loader import build_data_loader
    from dafne_tpu.data.mapper import eval_pad_hw, pad_target_hw
    from dafne_tpu.data.registry import get_dataset, register_all_datasets
    from dafne_tpu.engine.checkpoint import Checkpointer
    from dafne_tpu.engine.train_loop import build_state
    from dafne_tpu.layers.quant import calibrate_act_scales, save_act_scales
    from dafne_tpu.models import build_model

    cfg = load_config(args.config_file, freeze=False)
    if args.opts:
        cfg.merge_from_list(args.opts)
    # calibrate at the loosest threshold (64, the static auto-default) so
    # the table covers any serving-time EVAL_INT8_MIN_CHANNELS choice;
    # an explicit config value can restrict it further
    min_ch = int(cfg.TPU.get("EVAL_INT8_MIN_CHANNELS", 0)) or 64
    cfg.freeze()

    register_all_datasets(cfg)
    model = build_model(cfg)
    state, _, _ = build_state(cfg, model, pad_target_hw(cfg, train=True))
    state, step = Checkpointer(cfg.OUTPUT_DIR).resume_or_load(
        state, cfg, resume=True
    )
    variables = {"params": state.params}
    if state.batch_stats is not None:
        variables["batch_stats"] = state.batch_stats

    dataset_name = cfg.DATASETS.TEST[0]
    records = get_dataset(dataset_name, cfg)
    pad_hw = eval_pad_hw(cfg, records)
    loader = build_data_loader(
        cfg, records, batch_size=max(1, int(cfg.TPU.EVAL_BATCH)),
        train=False, pad_hw=pad_hw,
    )

    def batches():
        import jax.numpy as jnp

        for i, batch in enumerate(loader):
            if i >= args.num_batches:
                break
            yield jnp.asarray(batch["image"])

    scales = calibrate_act_scales(
        model, variables, batches(), min_channels=min_ch
    )
    out = args.output or os.path.join(cfg.OUTPUT_DIR, "int8_scales.json")
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    save_act_scales(out, scales)
    print(
        json.dumps(
            {
                "sites": len(scales),
                "dataset": dataset_name,
                "checkpoint_step": int(step) if step is not None else None,
                "output": out,
            }
        )
    )
    return out


if __name__ == "__main__":
    main()
