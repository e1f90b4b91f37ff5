#!/usr/bin/env python3
"""Training / evaluation CLI.

The public contract mirrors the reference (tools/plain_train_net.py:660-671):

  python tools/train.py --config-file configs/hrsc/base.yaml \
      [--eval-only] [--resume] [KEY VALUE ...]

No --num-gpus / --dist-url / machine-rank plumbing: a single SPMD program
drives every chip in the mesh (TPU.MESH_SHAPE), so "distributed launch" is
just running this script.
"""

import argparse
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config-file", default="", metavar="FILE")
    p.add_argument("--eval-only", action="store_true")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--debug", action="store_true",
                   help="overfit-8 shortcut (run.py:312-320 semantics)")
    p.add_argument("opts", nargs=argparse.REMAINDER, default=[],
                   help="dotted-key config overrides")
    return p.parse_args(argv)


def setup(args):
    from dafne_tpu.config import load_config

    cfg = load_config(args.config_file or None, freeze=False)
    if args.opts:
        cfg.merge_from_list(args.opts)
    if args.debug:
        cfg.DEBUG.OVERFIT_NUM_IMAGES = 8
        cfg.SOLVER.MAX_ITER = 20
        cfg.DATALOADER.NUM_WORKERS = 0
        cfg.MODEL.WEIGHTS = ""
        cfg.SOLVER.REFERENCE_WORLD_SIZE = 0
    cfg.freeze()
    return cfg


def main(argv=None):
    from dafne_tpu.utils.platform import pin_platform_from_env
    pin_platform_from_env()
    from dafne_tpu.parallel.distributed import maybe_initialize_distributed
    maybe_initialize_distributed()  # multi-host launch (§5.8); no-op otherwise
    args = parse_args(argv)
    cfg = setup(args)

    from dafne_tpu.engine.train_loop import default_setup, do_test, do_train
    from dafne_tpu.models import build_model
    from dafne_tpu.utils.notify import notify

    try:
        # setup/build failures (bad backbone name, unwritable OUTPUT_DIR,
        # OOM at construction) must hit the same error.txt/notify contract
        # as run failures (plain_train_net.py:631-655)
        default_setup(cfg, args)
        model = build_model(cfg)
        if args.eval_only:
            from dafne_tpu.data.mapper import pad_target_hw
            from dafne_tpu.engine.checkpoint import Checkpointer
            from dafne_tpu.engine.train_loop import build_state

            state, _, _ = build_state(cfg, model, pad_target_hw(cfg, train=True))
            state, step = Checkpointer(cfg.OUTPUT_DIR).resume_or_load(
                state, cfg, resume=True
            )
            results = do_test(cfg, model, state.params, cfg.OUTPUT_DIR,
                              batch_stats=state.batch_stats)
            if cfg.TEST.AUG.ENABLED:
                from dafne_tpu.engine.tta import do_test_with_tta

                results["tta"] = do_test_with_tta(
                    cfg, model, state.params, cfg.OUTPUT_DIR,
                    batch_stats=state.batch_stats,
                )
            notify("eval_done", cfg, results)
            return results

        state = do_train(cfg, model, resume=args.resume)
        results = do_test(cfg, model, state.params, cfg.OUTPUT_DIR,
                          batch_stats=state.batch_stats)
        notify("train_done", cfg, results)
        return results
    except Exception:
        # failure report to OUTPUT_DIR/error.txt (plain_train_net.py:631-655)
        os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)
        with open(os.path.join(cfg.OUTPUT_DIR, "error.txt"), "w") as f:
            f.write(traceback.format_exc())
        notify("failed", cfg, error=traceback.format_exc())
        raise


if __name__ == "__main__":
    main()
