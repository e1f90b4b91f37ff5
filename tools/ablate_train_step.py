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
sits at ~60% MFU dominated by architecture FLOPs.  The round-2 "heavy
backward" puzzle (fwd:fwd+bwd 28:94.8 = 3.4x) was a MEASUREMENT artifact:
the fwd-only profiler phase summed just out["logits"], so XLA dead-code-
eliminated the corners/center towers (8 of 12 tower convs).  The honest
full fwd is 38.7 ms (all outputs consumed) — ratio 94.8/38.7 = 2.4x,
textbook.  Within the fwd, the towers run at ~125 TF/s (~64% MFU) and the
backbone+FPN ~22 ms is HBM-bandwidth-bound (~40 TF/s; its activation
traffic floor, which is exactly why static-int8 — halving activation
bytes — takes ~10 ms off eval e2e).  Remaining levers are architecture
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

# one synthetic-batch generator for all perf tools — a fix to the
# realistic-candidate generation must not fork between the profiler and
# the ablations (BATCH/HW/WARMUP/ITERS constants shared the same way)
from train_step_profile import BATCH, HW, synthetic_batch  # noqa: E402

WARMUP, ITERS = 3, 15


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

    # same device-chaining + final-fetch protocol as
    # train_step_profile.timed_chain, except the donated TrainState must be
    # threaded through as a second carry, so the loop is inlined here
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
