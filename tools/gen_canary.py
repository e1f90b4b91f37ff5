#!/usr/bin/env python3
"""Held-out generalization gate (VERDICT r3 item #2).

Every previous trained-accuracy artifact (INT8_CANARY, TTA_CANARY) trains on
32 images and evaluates the SAME 32 — memorization evidence, which a
coordinate-space sign error in an augmentation inverse would survive.  This
tool is the in-container proxy for the real-data parity gate: it trains the
flagship R-50 architecture (iter-scaled, configs/synthetic/gen.yaml) on a
2048-scene procedurally generated 6-class oriented dataset and evaluates on
64 DISJOINT held-out scenes (seed spaces never overlap —
data/datasets/synthetic.py::load_synthetic_gen), exercising
aug-inverse/assignment/decode generalization jointly.  Asserts:

  1. held-out val mAP >= 50 (the model generalizes; a systematic geometry
     error in any aug inverse/assignment/decode stage kills this while
     leaving overfit gates green),
  2. TTA mAP >= plain mAP - 0.5 on the HELD-OUT set (multi-scale/flip
     inverses are consistent beyond the train distribution),
  3. int8 (dynamic AND calibrated-static) mAP within 1.0 of plain on the
     held-out set,
  4. train-slice mAP >= val mAP - 5 sanity (eval protocol itself is not
     broken on the train distribution).

`--scale 1024` (VERDICT r4 #4) runs the same gate at the DEPLOYMENT canvas:
configs/synthetic/gen1024.yaml trains the flagship architecture at a fixed
1024² on 512 dense scenes (<=96 objects — the bench.py held-out density) and
evaluates 64 disjoint held-out 1024² scenes, so the gate exercises the P3
candidate mix / ~0.5 NMS occupancy / level-assignment distribution of the
headline regime, which the 224-320 gate never sees.

Writes GEN_CANARY.json / GEN_CANARY_1024.json (committed per-round artifacts).
Run:  python tools/gen_canary.py [--scale 1024]   (real chip, ~25-40 min)
Env:  GEN_CANARY_ITERS (default 2500 / 1200), DAFNE_PLATFORM=cpu for a slow
smoke.

Reference anchor: the debug harness this generalizes
(/root/reference/tools/run.py:312-320) and the eval protocol
(/root/reference/dafne/evaluation/voc_eval.py:41-224).
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dafne_tpu.utils.platform import pin_platform_from_env, setup_compilation_cache

pin_platform_from_env()
setup_compilation_cache()

#: per-scale gate parameters: (config, default iters, train-set size,
#: train-slice dataset, TTA ladder, TTA max size, int8 calibration batches,
#: output artifact).  The TTA ladder must sit inside the recipe's
#: MIN_SIZE_TRAIN distribution: a scratch-trained canary model is
#: scale-brittle, so an out-of-distribution TTA copy measures model
#: robustness, not the aug-inverse consistency this gate asserts (the
#: fixed-1024 first cut failed exactly that way: TTA 87.6 vs plain 89.9).
_SCALES = {
    256: dict(
        cfg="gen.yaml", iters=2500, train_images=2048,
        train_name="synthetic_gen_train", tta_sizes=[192, 256, 320],
        tta_max=512, calib_batches=2, out="GEN_CANARY.json",
    ),
    1024: dict(
        # 3000 iters: the 1200-iter first cut left the classifier
        # undiscriminated (localization + objectness converge first; every
        # class scored ~0.4 at every object, train-slice mAP == val mAP ==
        # 20) — deployment-scale dense scenes need ~2.5x the optimization
        # budget of the 224-320 gate, made affordable on a 1-core host by
        # TPU.TRAIN_DEVICE_AUG.  8 calibration batches: at 1024² the static
        # int8 activation-scale estimate off 2 batches left the gate 0.18
        # short (88.73 vs the 88.91 floor) — P3's 128x128 activation maps
        # have far heavier per-site tails than the 256 gate's.
        cfg="gen1024.yaml", iters=3000, train_images=512,
        train_name="synthetic_gen1024_train", tta_sizes=[896, 1024, 1152],
        tta_max=1280, calib_batches=8, out="GEN_CANARY_1024.json",
    ),
}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--scale", type=int, choices=sorted(_SCALES), default=256)
    ap.add_argument(
        "--resume-dir",
        help="existing OUTPUT_DIR with a finished checkpoint: skip (or "
        "finish) training via the train loop's resume path and go straight "
        "to the eval gates — salvages a run whose eval phase died",
    )
    args = ap.parse_args()
    scale = args.scale
    P = _SCALES[scale]
    from dafne_tpu.config import load_config
    from dafne_tpu.data.registry import register_all_datasets
    from dafne_tpu.engine.train_loop import do_test, do_train, setup_logging
    from dafne_tpu.engine.tta import do_test_with_tta
    from dafne_tpu.models import build_model

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def base_cfg():
        cfg = load_config(
            os.path.join(repo, "configs", "synthetic", P["cfg"]), freeze=False
        )
        cfg.SOLVER.MAX_ITER = int(os.environ.get("GEN_CANARY_ITERS", P["iters"]))
        cfg.SOLVER.STEPS = [int(0.8 * cfg.SOLVER.MAX_ITER)]
        cfg.SOLVER.CHECKPOINT_PERIOD = 10_000_000  # final save only
        cfg.OUTPUT_DIR = tempfile.mkdtemp(prefix="gen_canary_")
        return cfg

    cfg = base_cfg()
    if args.resume_dir:
        cfg.OUTPUT_DIR = args.resume_dir
    cfg.freeze()
    setup_logging(cfg.OUTPUT_DIR)
    register_all_datasets(cfg)
    model = build_model(cfg)

    t0 = time.perf_counter()
    state = do_train(cfg, model, resume=bool(args.resume_dir))
    train_s = round(time.perf_counter() - t0, 1)

    def run_eval(**overrides):
        c = base_cfg()
        for k, v in overrides.items():
            node = c
            parts = k.split(".")
            for p in parts[:-1]:
                node = node[p]
            node[parts[-1]] = v
        c.freeze()
        t = time.perf_counter()
        if c.TEST.AUG.ENABLED:
            r = do_test_with_tta(
                c, model, state.params, c.OUTPUT_DIR, batch_stats=state.batch_stats
            )
        else:
            r = do_test(
                c, model, state.params, c.OUTPUT_DIR, batch_stats=state.batch_stats
            )
        (name,) = c.DATASETS.TEST
        return r[name], round(time.perf_counter() - t, 1)

    # 1. plain eval on the DISJOINT held-out scenes
    val, val_s = run_eval()
    # 2. eval protocol sanity on a 64-scene train slice (seen in training)
    train_slice, _ = run_eval(**{
        "DATASETS.TEST": [P["train_name"]],
        "DEBUG.OVERFIT_NUM_IMAGES": 64,
    })
    # 3. TTA on the held-out set (ladder around the train scales + flips)
    tta, tta_s = run_eval(**{
        "TEST.AUG.ENABLED": True,
        "TEST.AUG.MIN_SIZES": P["tta_sizes"],
        "TEST.AUG.MAX_SIZE": P["tta_max"],
    })
    # 4. int8 dynamic on the held-out set
    int8_dyn, int8_s = run_eval(**{"TPU.EVAL_INT8": True})
    # 5. int8 static: calibrate on TRAIN images (never on val), eval on val
    from dafne_tpu.data.grain_loader import build_data_loader
    from dafne_tpu.data.mapper import eval_pad_hw
    from dafne_tpu.data.registry import get_dataset
    from dafne_tpu.layers.quant import calibrate_act_scales, save_act_scales
    import jax.numpy as jnp

    calib_cfg = base_cfg()
    calib_cfg.DEBUG.OVERFIT_NUM_IMAGES = P["calib_batches"] * int(
        calib_cfg.TPU.EVAL_BATCH
    )
    calib_cfg.freeze()
    records = get_dataset(P["train_name"], calib_cfg)
    pad_hw = eval_pad_hw(calib_cfg, records)
    loader = build_data_loader(
        calib_cfg, records, batch_size=max(1, int(calib_cfg.TPU.EVAL_BATCH)),
        train=False, pad_hw=pad_hw,
    )
    variables = {"params": state.params}
    if state.batch_stats is not None:
        variables["batch_stats"] = state.batch_stats
    scales = calibrate_act_scales(
        model, variables,
        (jnp.asarray(b["image"]) for _, b in zip(range(P["calib_batches"]), loader)),
        min_channels=64,
    )
    scales_path = os.path.join(cfg.OUTPUT_DIR, "int8_scales.json")
    save_act_scales(scales_path, scales)
    int8_sta, _ = run_eval(**{
        "TPU.EVAL_INT8": True, "TPU.EVAL_INT8_SCALES": scales_path,
    })

    results = {
        "scale": scale,
        "iters": cfg.SOLVER.MAX_ITER,
        "train_images": P["train_images"],
        "val_images": 64,
        "train_s": train_s,
        "train_mAP": round(train_slice["mAP"], 2),
        "val_mAP": round(val["mAP"], 2),
        "val_tta_mAP": round(tta["mAP"], 2),
        "val_int8_mAP": round(int8_dyn["mAP"], 2),
        "val_int8_static_mAP": round(int8_sta["mAP"], 2),
        "calibrated_sites": len(scales),
        "val_eval_s": val_s,
        "tta_eval_s": tta_s,
        "int8_eval_s": int8_s,
        "device": os.environ.get("DAFNE_PLATFORM", "tpu"),
    }
    checks = {
        "val_floor": val["mAP"] >= 50.0,
        "tta_holds_on_heldout": tta["mAP"] >= val["mAP"] - 0.5,
        "int8_dyn_within_1": int8_dyn["mAP"] >= val["mAP"] - 1.0,
        "int8_static_within_1": int8_sta["mAP"] >= val["mAP"] - 1.0,
        "train_slice_sane": train_slice["mAP"] >= val["mAP"] - 5.0,
    }
    results["checks"] = {k: bool(v) for k, v in checks.items()}
    results["ok"] = bool(all(checks.values()))
    out = os.path.join(repo, P["out"])
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))
    if not results["ok"]:
        raise SystemExit(f"generalization canary failed: {results}")


if __name__ == "__main__":
    main()
