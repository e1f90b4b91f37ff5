"""Optimizer and LR schedule construction.

Functional re-design of the reference's custom optimizer builder
(tools/plain_train_net.py:77-128): SGD+momentum or Adam with per-parameter
LR/weight-decay groups, plus the Detectron2 WarmupMultiStepLR schedule.

Per-group semantics reproduced with optax masks instead of parameter groups:
  - biases:      lr * BIAS_LR_FACTOR, weight decay WEIGHT_DECAY_BIAS
  - norm params: weight decay WEIGHT_DECAY_NORM
  - frozen:      backbone FrozenBN affines/stats always; conv/stem params of
                 stages <= FREEZE_AT.  The reference freezes by excluding
                 params from the optimizer (requires_grad=False inside
                 Detectron2's ResNet.freeze); here a zero-update mask does
                 the same (torch-coupled weight decay never touches frozen
                 params either, so masking the whole update is exact).

`REFERENCE_WORLD_SIZE` auto-scaling (DefaultTrainer.auto_scale_workers,
plain_train_net.py:562-563) lives in `auto_scale_config`.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax


def warmup_multistep_schedule(
    base_lr: float,
    steps: Tuple[int, ...],
    gamma: float,
    warmup_factor: float,
    warmup_iters: int,
    warmup_method: str = "linear",
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Detectron2 WarmupMultiStepLR as a pure function of the step."""
    milestones = jnp.asarray(sorted(steps), jnp.int32)

    def schedule(count):
        count = jnp.asarray(count, jnp.float32)
        if warmup_method == "constant":
            warm = jnp.where(count < warmup_iters, warmup_factor, 1.0)
        else:  # linear
            alpha = jnp.clip(count / max(warmup_iters, 1), 0.0, 1.0)
            warm = jnp.where(
                count < warmup_iters, warmup_factor * (1 - alpha) + alpha, 1.0
            )
        decay = gamma ** jnp.sum(count >= milestones.astype(jnp.float32))
        return base_lr * warm * decay

    return schedule


def _param_labels(params) -> Any:
    """Label each param leaf: frozen / bias / norm / default."""

    def label(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
        path_str = "/".join(str(n) for n in names)
        in_backbone = "backbone" in path_str
        is_norm_mod = any("norm" in str(n) for n in names[:-1])
        leaf_name = str(names[-1])
        if in_backbone and is_norm_mod:
            return "frozen"  # FrozenBN affines + stats
        if leaf_name in ("running_mean", "running_var"):
            return "frozen"
        if leaf_name == "bias":
            return "bias"
        # GroupNorm scale/bias outside backbone
        if is_norm_mod or leaf_name == "scale":
            return "norm"
        return "default"

    return jax.tree_util.tree_map_with_path(label, params)


def _freeze_labels(labels, params, freeze_at: int):
    """Overwrite labels with 'frozen' for backbone stages <= freeze_at."""
    frozen_prefixes = ["backbone/stem"] if freeze_at >= 1 else []
    for s in range(2, freeze_at + 1):
        frozen_prefixes.append(f"backbone/res{s}_")

    def relabel(path, lab):
        names = "/".join(
            str(getattr(p, "key", getattr(p, "name", str(p)))) for p in path
        )
        if any(pref in names for pref in frozen_prefixes):
            return "frozen"
        return lab

    return jax.tree_util.tree_map_with_path(relabel, labels)


def build_optimizer(cfg, params) -> Tuple[optax.GradientTransformation, Callable]:
    """Returns (tx, lr_schedule).  `tx` consumes grads for the full param tree."""
    s = cfg.SOLVER
    schedule = warmup_multistep_schedule(
        s.BASE_LR, tuple(s.STEPS), s.GAMMA, s.WARMUP_FACTOR, s.WARMUP_ITERS,
        s.WARMUP_METHOD,
    )

    labels = _param_labels(params)
    labels = _freeze_labels(labels, params, cfg.MODEL.BACKBONE.FREEZE_AT)

    def sgd_group(wd: float, lr_factor: float = 1.0):
        chain = []
        if cfg.SOLVER.CLIP_GRADIENTS.ENABLED:
            if cfg.SOLVER.CLIP_GRADIENTS.CLIP_TYPE == "value":
                chain.append(optax.clip(cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE))
            else:
                chain.append(
                    optax.clip_by_global_norm(cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE)
                )
        if wd:
            chain.append(optax.add_decayed_weights(wd))
        if s.OPTIMIZER.lower() == "adam":
            chain.append(optax.scale_by_adam())
        else:
            chain.append(
                optax.trace(decay=s.MOMENTUM, nesterov=s.NESTEROV)
            )
        chain.append(optax.scale_by_schedule(lambda c: -schedule(c) * lr_factor))
        return optax.chain(*chain)

    tx = optax.multi_transform(
        {
            "default": sgd_group(s.WEIGHT_DECAY),
            "bias": sgd_group(s.WEIGHT_DECAY_BIAS, s.BIAS_LR_FACTOR),
            "norm": sgd_group(s.WEIGHT_DECAY_NORM),
            "frozen": optax.set_to_zero(),
        },
        labels,
    )
    return tx, schedule


def auto_scale_config(cfg, world_size: int):
    """Scale batch/LR/schedule for the actual device count, matching
    Detectron2 DefaultTrainer.auto_scale_workers semantics."""
    old = cfg.SOLVER.REFERENCE_WORLD_SIZE
    if old in (0, world_size):
        return cfg
    cfg = cfg.clone().defrost()
    scale = world_size / old
    bs = cfg.SOLVER.IMS_PER_BATCH
    cfg.SOLVER.IMS_PER_BATCH = max(world_size, int(round(bs * scale)))
    cfg.SOLVER.BASE_LR = cfg.SOLVER.BASE_LR * scale
    cfg.SOLVER.MAX_ITER = int(round(cfg.SOLVER.MAX_ITER / scale))
    cfg.SOLVER.WARMUP_ITERS = int(round(cfg.SOLVER.WARMUP_ITERS / scale))
    cfg.SOLVER.STEPS = [int(round(x / scale)) for x in cfg.SOLVER.STEPS]
    if cfg.TEST.EVAL_PERIOD:
        cfg.TEST.EVAL_PERIOD = int(round(cfg.TEST.EVAL_PERIOD / scale))
    if cfg.SOLVER.CHECKPOINT_PERIOD:
        cfg.SOLVER.CHECKPOINT_PERIOD = int(
            round(cfg.SOLVER.CHECKPOINT_PERIOD / scale)
        )
    cfg.SOLVER.REFERENCE_WORLD_SIZE = world_size
    return cfg.freeze()
