#!/usr/bin/env python3
"""Experiment launcher: train / resume / test with schedule rescaling.

Equivalent of the reference's docker launcher (tools/run.py:450-471) minus
docker (a TPU VM runs this directly).  Keeps the same workflow verbs and the
`--iter-scale` rescaling of MAX_ITER/STEPS/WARMUP/EVAL_PERIOD
(run.py:291-308) and the `--debug` overfit shortcut (run.py:312-320).

  python tools/run.py train  --config-file configs/dota-1.0/1024.yaml --tag exp1
  python tools/run.py resume --output-dir output/exp1
  python tools/run.py test   --output-dir output/exp1 [--tta]
"""

import argparse
import datetime
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def scale_opts(scale: float, cfg) -> list:
    """--iter-scale K: divide schedule lengths by K (run.py:291-308)."""
    if scale in (0, 1):
        return []
    out = []
    out += ["SOLVER.MAX_ITER", str(int(cfg.SOLVER.MAX_ITER / scale))]
    out += ["SOLVER.STEPS", str(tuple(int(s / scale) for s in cfg.SOLVER.STEPS))]
    out += ["SOLVER.WARMUP_ITERS", str(int(cfg.SOLVER.WARMUP_ITERS / scale))]
    if cfg.TEST.EVAL_PERIOD:
        out += ["TEST.EVAL_PERIOD", str(int(cfg.TEST.EVAL_PERIOD / scale))]
    if cfg.SOLVER.CHECKPOINT_PERIOD:
        out += [
            "SOLVER.CHECKPOINT_PERIOD",
            str(int(cfg.SOLVER.CHECKPOINT_PERIOD / scale)),
        ]
    return out


def main():
    from dafne_tpu.utils.platform import pin_platform_from_env
    pin_platform_from_env()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("verb", choices=["train", "resume", "test"])
    p.add_argument("--config-file", default="")
    p.add_argument("--output-dir", default="")
    p.add_argument("--tag", default="")
    p.add_argument("--iter-scale", type=float, default=1.0)
    p.add_argument("--debug", action="store_true")
    p.add_argument("--tta", action="store_true")
    p.add_argument("--dry-run", action="store_true")
    args, opts = p.parse_known_args()
    args.opts = opts

    cmd = [sys.executable, os.path.join(REPO, "tools", "train.py")]

    if args.verb == "train":
        assert args.config_file, "train needs --config-file"
        tag = args.tag or datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
        out = args.output_dir or os.path.join("output", tag)
        cmd += ["--config-file", args.config_file]
        extra = ["OUTPUT_DIR", out]
        if args.iter_scale not in (0, 1):
            from dafne_tpu.config import load_config

            cfg = load_config(args.config_file)
            extra += scale_opts(args.iter_scale, cfg)
        if args.debug:
            cmd += ["--debug"]
        # launcher-derived overrides FIRST so explicit user KEY VALUE opts
        # win (merge_from_list applies pairs in order, later wins)
        cmd += extra + args.opts
    else:
        out = args.output_dir
        assert out, f"{args.verb} needs --output-dir"
        snapshot = os.path.join(out, "config.yaml")
        assert os.path.exists(snapshot), f"no config snapshot at {snapshot}"
        cmd += ["--config-file", snapshot, "--resume"]
        if args.verb == "test":
            cmd += ["--eval-only"]
            if args.tta:
                args.opts += ["TEST.AUG.ENABLED", "True"]
        cmd += ["OUTPUT_DIR", out] + args.opts

    print("exec:", " ".join(cmd))
    if args.dry_run:
        return 0
    return subprocess.call(cmd)


if __name__ == "__main__":
    sys.exit(main())
