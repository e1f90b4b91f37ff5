#!/usr/bin/env python3
"""Structural train-step ablations: where do the 99.8 ms go? (VERDICT r2 #6)

Times the FULL train step (batch 8, R-50 @1024², bf16) under structural
ablations; pairwise differences localize cost.  Round-3 measurements
(PROFILE_TRAIN.json "train_ablation_ms"):

  baseline             99.8   (profiler's train_step: 101.8; run noise)
  remat_backbone      117.4   remat is pure overhead here — not memory-bound
  head_norm_none       94.4   GroupNorm fwd+bwd ≈ 5.4 ms
  freeze_all_backbone  81.8   backbone backward ≈ 18 ms
  towers_0             55.1   the shared head towers ≈ 44.7 ms fwd+bwd
  no_space_to_depth   102.0   the s2d stem saves ≈ 2 ms

Conclusion: the towers' 12 shared 256->256 3x3 convs over 174k positions
are ≈7.4 TFLOP fwd+bwd per batch — 37.6 ms at v5e bf16 peak — so the
measured 44.7 ms is ~85% MFU and near the hardware floor; the whole step
sits at ~60% MFU dominated by architecture FLOPs, which is why the
fwd:fwd+bwd ratio (28.1 : 94.8) looked "heavy": the fwd runs at ~63% MFU,
not the bwd at an anomalously low one.  Remaining levers are architecture
changes (fewer tower convs — a parity deviation), not scheduling.

Run: python tools/ablate_train_step.py   (real chip, ~20 min first compile)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from dafne_tpu.config import get_cfg
from dafne_tpu.engine.optimizer import build_optimizer
from dafne_tpu.engine.trainer import TrainState, make_train_step
from dafne_tpu.models import build_model
from dafne_tpu.utils.platform import setup_compilation_cache

setup_compilation_cache()

BATCH, HW, WARMUP, ITERS = 8, 1024, 3, 15


def synthetic_batch(rng, n_gt=24):
    quads = []
    for _ in range(BATCH * n_gt):
        cx, cy = rng.uniform(100, HW - 100, 2)
        w, h = rng.uniform(16, 120, 2)
        th = rng.uniform(0, np.pi)
        c, s = np.cos(th), np.sin(th)
        dx = np.array([-w, w, w, -w]) / 2
        dy = np.array([-h, -h, h, h]) / 2
        quads.append(
            np.stack([cx + dx * c - dy * s, cy + dx * s + dy * c], 1).reshape(8)
        )
    quads = np.asarray(quads, np.float32).reshape(BATCH, n_gt, 8)
    xs, ys = quads[..., 0::2], quads[..., 1::2]
    hbox = np.stack([xs.min(-1), ys.min(-1), xs.max(-1), ys.max(-1)], -1)
    area = np.abs(
        0.5 * ((xs * np.roll(ys, -1, -1)).sum(-1) - (ys * np.roll(xs, -1, -1)).sum(-1))
    )
    return {
        "image": jnp.asarray(
            np.random.RandomState(0).randint(0, 255, (BATCH, HW, HW, 3), np.uint8)
        ),
        "gt_corners": jnp.asarray(quads),
        "gt_hbox": jnp.asarray(hbox),
        "gt_classes": jnp.asarray(
            np.random.RandomState(1).randint(0, 15, (BATCH, n_gt)), jnp.int32
        ),
        "gt_area": jnp.asarray(area, jnp.float32),
        "gt_valid": jnp.ones((BATCH, n_gt), bool),
    }


def cfg_variant(**kv):
    cfg = get_cfg()
    cfg.MODEL.RESNETS.DEPTH = 50
    cfg.MODEL.DAFNE.NUM_CLASSES = 15
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    for k, v in kv.items():
        node = cfg
        parts = k.split(".")
        for p in parts[:-1]:
            node = getattr(node, p)
        setattr(node, parts[-1], v)
    return cfg


def full_step_ms(cfg, batch):
    model = build_model(cfg)
    params = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, HW, HW, 3)))["params"]
    )()
    tx, sched = build_optimizer(cfg, params)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params), tx=tx
    )
    step = jax.jit(
        make_train_step(model, cfg, (HW, HW), tx, sched), donate_argnums=(0,)
    )

    def chained(carry, state, b):
        b = dict(b)
        b["image"] = b["image"] + (carry * 0.0).astype(b["image"].dtype)
        new_state, metrics = step(state, b)
        return metrics["loss/total"].astype(jnp.float32), new_state

    c = jnp.zeros((), jnp.float32)
    for _ in range(WARMUP):
        c, state = chained(c, state, batch)
    float(c)
    t0 = time.perf_counter()
    c = jnp.zeros((), jnp.float32)
    for _ in range(ITERS):
        c, state = chained(c, state, batch)
    float(c)
    return (time.perf_counter() - t0) / ITERS * 1000


def main():
    rng = np.random.RandomState(0)
    batch = synthetic_batch(rng)
    variants = [
        ("baseline", {}),
        ("remat_backbone", {"TPU.REMAT_BACKBONE": True}),
        ("head_norm_none", {"MODEL.DAFNE.NORM": "none"}),
        ("freeze_all_backbone", {"MODEL.BACKBONE.FREEZE_AT": 5}),
        ("towers_0", {"MODEL.DAFNE.NUM_CLS_CONVS": 0, "MODEL.DAFNE.NUM_BOX_CONVS": 0}),
        ("no_space_to_depth", {"TPU.STEM_SPACE_TO_DEPTH": False}),
    ]
    for name, kv in variants:
        try:
            ms = full_step_ms(cfg_variant(**kv), batch)
            print(f"{name}: {ms:.1f} ms", flush=True)
        except Exception as e:  # keep going; ablations are exploratory
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
