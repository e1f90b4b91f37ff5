#!/usr/bin/env python3
"""int8 canary: quantized-eval accuracy gate on REAL trained weights.

TPU.EVAL_INT8 (layers/quant.py) swaps eligible convs to w8a8 at eval time
for ~1.6x conv throughput on the v5e MXU.  Random-weight error bounds say
nothing about detection quality, so this tool trains the synthetic
overfit-32 canary on-chip, evaluates it twice with the SAME weights —
bf16 and int8 — and asserts:

  1. int8-mAP >= bf16-mAP - 1.0 on the canary set (quantization noise must
     not break detections; nonzero int8 mAP also proves the quantized path
     produced a real detection set) — for BOTH the dynamic-scale mode and
     the calibrated static-scale mode (tools/calibrate_int8.py),
  2. the bf16 eval genuinely converged (mAP > 50) so the gate is not
     vacuous.

Writes INT8_CANARY.json (committed per-round artifact).
Run:  python tools/int8_canary.py        (real chip, ~10-12 min)
Env:  CANARY_ITERS (default 800), DAFNE_PLATFORM=cpu for a slow CPU check.

No reference counterpart (the reference serves fp16/fp32 via AMP,
tools/plain_train_net.py:136-152); this gates a framework-only feature.
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dafne_tpu.utils.platform import pin_platform_from_env, setup_compilation_cache

pin_platform_from_env()
setup_compilation_cache()


def main():
    from dafne_tpu.config import load_config
    from dafne_tpu.data.registry import register_all_datasets
    from dafne_tpu.engine.train_loop import do_test, do_train, setup_logging
    from dafne_tpu.models import build_model

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def canary_cfg(eval_int8: bool, scales_path: str = ""):
        cfg = load_config(
            os.path.join(repo, "configs", "synthetic", "base.yaml"),
            freeze=False,
        )
        cfg.DEBUG.OVERFIT_NUM_IMAGES = 32
        cfg.SOLVER.MAX_ITER = int(os.environ.get("CANARY_ITERS", 800))
        cfg.SOLVER.CHECKPOINT_PERIOD = 10_000_000
        cfg.TEST.EVAL_PERIOD = 0
        cfg.DATASETS.TEST = ["synthetic_train"]  # overfit target
        cfg.TPU.EVAL_INT8 = eval_int8
        cfg.TPU.EVAL_INT8_SCALES = scales_path
        cfg.OUTPUT_DIR = tempfile.mkdtemp(
            prefix=f"int8_canary_{'q' if eval_int8 else 'f'}_"
        )
        cfg.freeze()
        return cfg

    cfg_f = canary_cfg(False)
    cfg_q = canary_cfg(True)

    setup_logging(cfg_f.OUTPUT_DIR)
    register_all_datasets(cfg_f)
    model = build_model(cfg_f)

    t0 = time.perf_counter()
    state = do_train(cfg_f, model)
    train_s = round(time.perf_counter() - t0, 1)

    def timed_test(cfg):
        t = time.perf_counter()
        r = do_test(
            cfg, model, state.params, cfg.OUTPUT_DIR,
            batch_stats=state.batch_stats,
        )
        return r["synthetic_train"], round(time.perf_counter() - t, 1)

    plain, plain_s = timed_test(cfg_f)
    quant, quant_s = timed_test(cfg_q)

    # static mode: calibrate activation scales on the train (overfit) set
    # with the trained weights, then eval with TPU.EVAL_INT8_SCALES
    from dafne_tpu.data.grain_loader import build_data_loader
    from dafne_tpu.data.mapper import eval_pad_hw
    from dafne_tpu.data.registry import get_dataset
    from dafne_tpu.layers.quant import calibrate_act_scales, save_act_scales
    import jax.numpy as jnp

    records = get_dataset("synthetic_train", cfg_f)
    pad_hw = eval_pad_hw(cfg_f, records)
    loader = build_data_loader(
        cfg_f, records, batch_size=max(1, int(cfg_f.TPU.EVAL_BATCH)),
        train=False, pad_hw=pad_hw,
    )
    variables = {"params": state.params}
    if state.batch_stats is not None:
        variables["batch_stats"] = state.batch_stats
    # calibrate at the loosest threshold (64) — the static auto-default
    scales = calibrate_act_scales(
        model, variables,
        (jnp.asarray(b["image"]) for _, b in zip(range(2), loader)),
        min_channels=64,
    )
    scales_path = os.path.join(cfg_f.OUTPUT_DIR, "int8_scales.json")
    save_act_scales(scales_path, scales)
    cfg_s = canary_cfg(True, scales_path)
    static, static_s = timed_test(cfg_s)

    results = {
        "iters": cfg_f.SOLVER.MAX_ITER,
        "train_s": train_s,
        "bf16_mAP": round(plain["mAP"], 2),
        "int8_mAP": round(quant["mAP"], 2),
        "int8_static_mAP": round(static["mAP"], 2),
        "calibrated_sites": len(scales),
        "bf16_eval_s": plain_s,  # includes compile; timing is bench.py's job
        "int8_eval_s": quant_s,
        "int8_static_eval_s": static_s,
        "device": os.environ.get("DAFNE_PLATFORM", "tpu"),
    }
    # int8_mAP > 0 implies the quantized path produced real detections
    ok = (
        quant["mAP"] >= plain["mAP"] - 1.0
        and static["mAP"] >= plain["mAP"] - 1.0
        and plain["mAP"] > 50.0
        and len(scales) > 0
    )
    results["ok"] = bool(ok)
    out = os.path.join(repo, "INT8_CANARY.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))
    if not ok:
        raise SystemExit(f"int8 canary failed: {results}")


if __name__ == "__main__":
    main()
