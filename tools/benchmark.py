#!/usr/bin/env python3
"""Benchmark harness: data / train / eval throughput.

Equivalent of the reference harness (tools/benchmark.py:44-145):

  python tools/benchmark.py --config-file configs/synthetic/base.yaml --task eval
  python tools/benchmark.py --config-file ... --task train --iters 100
  python tools/benchmark.py --config-file ... --task data

`eval` measures single-chip end-to-end inference (model + decode + rotated
NMS), `train` measures the full jitted SPMD train step on cached batches,
`data` measures host dataloader throughput.
"""

import argparse
import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config-file", required=True)
    p.add_argument("--task", choices=["data", "train", "eval"], default="eval")
    p.add_argument("--iters", type=int, default=100)
    p.add_argument("--warmup", type=int, default=5)
    p.add_argument("--batch-size", type=int, default=0, help="override IMS_PER_BATCH")
    p.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    return p.parse_args()


def main():
    from dafne_tpu.utils.platform import pin_platform_from_env
    pin_platform_from_env()
    args = parse_args()
    from dafne_tpu.config import load_config

    cfg = load_config(args.config_file, freeze=False)
    if args.opts:
        cfg.merge_from_list(args.opts)
    if args.batch_size:
        cfg.SOLVER.IMS_PER_BATCH = args.batch_size
    cfg.SOLVER.REFERENCE_WORLD_SIZE = 0
    cfg.freeze()

    import jax
    import jax.numpy as jnp

    from dafne_tpu.data import get_dataset, register_all_datasets
    from dafne_tpu.data.loader import DataLoader
    from dafne_tpu.data.mapper import pad_target_hw
    from dafne_tpu.models import build_model

    register_all_datasets(cfg)
    bs = cfg.SOLVER.IMS_PER_BATCH

    if args.task == "data":
        from dafne_tpu.data.mapper import train_canvas_buckets
        from dafne_tpu.engine.trainer import resolve_train_device_aug

        records = list(
            itertools.chain(*(get_dataset(n, cfg) for n in cfg.DATASETS.TRAIN))
        )
        # honor the recipe's bucketing + device-aug so the host cost
        # measured is the one the train loop actually pays (under
        # TPU.TRAIN_DEVICE_AUG the host skips the cv2 canvas render and
        # ships the raw base image + KB-scale warp/color vectors)
        loader = DataLoader(
            cfg, records, bs, train=True,
            buckets=train_canvas_buckets(cfg, records),
            device_aug=resolve_train_device_aug(cfg),
        )
        it = iter(loader)
        for _ in range(args.warmup):
            next(it)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            next(it)
        dt = time.perf_counter() - t0
        result = {
            "task": "data",
            "img_per_s": bs * args.iters / dt,
            "device_aug": bool(getattr(loader, "device_aug", False)),
        }

    elif args.task == "train":
        from dafne_tpu.engine.optimizer import build_optimizer
        from dafne_tpu.engine.trainer import TrainState, make_train_step
        from dafne_tpu.engine.train_loop import build_state
        from dafne_tpu.data.mapper import train_canvas_buckets

        model = build_model(cfg)
        pad_hw = pad_target_hw(cfg, train=True)
        records = list(
            itertools.chain(*(get_dataset(n, cfg) for n in cfg.DATASETS.TRAIN))
        )
        # bucketed multi-scale (TPU.BUCKETED_TRAIN): ms recipes draw one
        # scale per batch and run on that scale's ladder canvas instead of
        # the worst case — the benchmark mirrors the train loop's
        # per-canvas compiled steps so it measures the real mixed regime
        buckets = train_canvas_buckets(cfg, records)
        init_hw = buckets.canvases[0] if buckets is not None else pad_hw
        state, tx, schedule = build_state(cfg, model, init_hw)

        # TPU.TRAIN_DEVICE_AUG: mirror the train loop — the loader ships
        # base images + warp/color vectors and the step renders the
        # augmented canvas on device (engine/trainer.py::device_aug_image),
        # so the benchmark measures the step the recipe actually runs
        from dafne_tpu.engine.train_loop import _batch_canvas_hw
        from dafne_tpu.engine.trainer import (
            _AUG_KEYS,
            resolve_train_device_aug,
        )

        use_device_aug = resolve_train_device_aug(cfg)
        loader = DataLoader(
            cfg, records, bs, train=True, buckets=buckets,
            device_aug=use_device_aug,
        )
        use_device_aug = bool(getattr(loader, "device_aug", False))
        if use_device_aug:
            img_keys = ["image_base", "aug_out_hw", *_AUG_KEYS]
            if cfg.INPUT.USE_COLOR_AUGMENTATIONS:
                img_keys += ["color_light", "color_w"]
        else:
            img_keys = ["image"]
        _steps = {}

        def get_step(hw):
            if hw not in _steps:
                _steps[hw] = jax.jit(
                    make_train_step(model, cfg, hw, tx, schedule,
                                    device_aug=use_device_aug),
                    donate_argnums=(0,),
                )
            return _steps[hw]

        it = iter(loader)
        # cache a handful of batches on device (benchmark.py:91-110 style);
        # under TPU.HOST_ASSIGN stage precomputed targets with each batch,
        # mirroring the train loop's prefetch-thread producer
        from dafne_tpu.engine.trainer import resolve_host_assign

        _assigns = {}
        if resolve_host_assign(cfg):
            from dafne_tpu.engine.trainer import make_host_assign_fn

            def get_assign(hw):
                if hw not in _assigns:
                    _assigns[hw] = make_host_assign_fn(cfg, hw)
                return _assigns[hw]
        else:
            get_assign = None

        def stage(b):
            hw = _batch_canvas_hw(b)
            if get_assign is not None:
                # targets replace the gt_* arrays on device (the
                # host-targets loss branch never reads them)
                d = {k: jnp.asarray(b[k]) for k in img_keys}
                d.update({k: jnp.asarray(v)
                          for k, v in get_assign(hw)(b).items()})
                return d
            return {k: jnp.asarray(b[k]) for k in img_keys + [
                "gt_corners", "gt_hbox", "gt_classes", "gt_area",
                "gt_valid"]}

        # stage enough batches to cover the canvas ladder when bucketed
        n_stage = 8 if buckets is None else max(8, 3 * len(buckets.canvases))
        batches = [stage(b) for b in itertools.islice(it, n_stage)]
        canvases = sorted({_batch_canvas_hw(b) for b in batches})
        # state donation chains the steps (each consumes the previous
        # state); the final barrier must be a FETCH — on the axon relay
        # runtime block_until_ready can return before execution (see
        # bench.py measurement notes)
        # compile every canvas first (one step on the first batch of each),
        # then the regular warmup over the cycled schedule
        first_of = {_batch_canvas_hw(b): b for b in reversed(batches)}
        for hw, b in first_of.items():
            state, m = get_step(hw)(state, b)
        for i in range(args.warmup):
            b = batches[i % len(batches)]
            state, m = get_step(_batch_canvas_hw(b))(state, b)
        float(jax.tree_util.tree_leaves(m)[0])
        t0 = time.perf_counter()
        for i in range(args.iters):
            b = batches[i % len(batches)]
            state, m = get_step(_batch_canvas_hw(b))(state, b)
        float(jax.tree_util.tree_leaves(m)[0])
        dt = time.perf_counter() - t0
        result = {
            "task": "train",
            "img_per_s": bs * args.iters / dt,
            "step_ms": dt / args.iters * 1000,
            "bucketed": buckets is not None,
            "device_aug": use_device_aug,
            "canvases": [list(c) for c in canvases],
        }
        if buckets is not None:
            # The cycled sample above may not hit every ladder canvas with
            # its true probability; ALSO time each canvas separately and
            # report the exact scale-weighted expectation (auditable
            # steady-state step time, independent of the staged draw luck).
            # canvas probabilities under the recipe's scale distribution
            if buckets.sampling == "range":
                lo, hi = buckets.sizes
                draws = [
                    buckets.canvas_for(s) for s in range(int(lo), int(hi) + 1)
                ]
            else:
                draws = [buckets.canvas_for(s) for s in buckets.sizes]
            probs = {hw: draws.count(hw) / len(draws) for hw in set(draws)}
            # make sure every probable canvas has a staged batch (the random
            # per-batch draws above may have missed a low-probability one)
            for _ in range(100):
                if all(hw in first_of for hw in probs):
                    break
                b = stage(next(it))
                first_of.setdefault(_batch_canvas_hw(b), b)
            per_canvas = {}
            for hw, b in first_of.items():
                step = get_step(hw)
                for _ in range(2):
                    state, m = step(state, b)
                float(jax.tree_util.tree_leaves(m)[0])
                t0 = time.perf_counter()
                reps = max(10, args.iters // 4)
                for _ in range(reps):
                    state, m = step(state, b)
                float(jax.tree_util.tree_leaves(m)[0])
                per_canvas[hw] = (time.perf_counter() - t0) / reps * 1000
            result["per_canvas_ms"] = {
                f"{h}x{w}": round(v, 1) for (h, w), v in per_canvas.items()
            }
            result["expected_step_ms"] = round(
                sum(p * per_canvas[hw] for hw, p in probs.items()), 1
            ) if all(hw in per_canvas for hw in probs) else None

    else:  # eval
        from dafne_tpu.engine.trainer import make_eval_step

        model = build_model(cfg)
        pad_hw = pad_target_hw(cfg, train=False)
        variables = jax.jit(
            lambda: model.init(
                jax.random.PRNGKey(0), jnp.zeros((1,) + pad_hw + (3,))
            )
        )()
        params, batch_stats = variables["params"], variables.get("batch_stats")
        eval_step = jax.jit(make_eval_step(model, cfg, pad_hw))
        rng = np.random.RandomState(0)
        imgs = [
            jnp.asarray(rng.rand(bs, *pad_hw, 3).astype(np.float32) * 255)
            for _ in range(4)
        ]
        # Chain the steps through an on-device scalar and close with ONE
        # fetch: on the axon relay runtime un-chained dispatches overlap
        # and block_until_ready can return before execution, reporting
        # bogus near-zero latencies (see bench.py measurement notes).
        def chained(carry, params, image, batch_stats):
            out = eval_step(params, image + carry * 0.0, None, batch_stats)
            return jnp.sum(out["scores"]).astype(jnp.float32)

        chained = jax.jit(chained)
        carry = jnp.zeros((), jnp.float32)
        for i in range(args.warmup):
            carry = chained(carry, params, imgs[i % 4], batch_stats)
        float(carry)
        t0 = time.perf_counter()
        carry = jnp.zeros((), jnp.float32)
        for i in range(args.iters):
            carry = chained(carry, params, imgs[i % 4], batch_stats)
        float(carry)
        dt = time.perf_counter() - t0
        result = {
            "task": "eval",
            "img_per_s": bs * args.iters / dt,
            "latency_ms": dt / args.iters * 1000,
            "pad_hw": list(pad_hw),
        }

    result["batch_size"] = bs
    result["device"] = str(jax.devices()[0])
    print(json.dumps(result))


if __name__ == "__main__":
    main()
