"""Jitted SPMD train/eval steps.

The TPU-native replacement for the reference's training loop internals
(tools/plain_train_net.py:443-492): one jitted function per step, batch
sharded over the mesh "data" axis, params replicated, gradients and loss
normalizers globally reduced by XLA-inserted collectives (no DDP wrapper,
no explicit all_reduce — SURVEY.md §5.8).

The step composes pure pieces:
  model.apply -> flatten levels -> assign_targets (ops/targets.py)
  -> dafne_losses (ops/losses.py) -> grad -> optax update.

NaN detection (the reference's `detect_anomaly`, plain_train_net.py:131-136)
is a `loss_is_finite` flag in the returned metrics — checked on host without
forcing extra device syncs.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from dafne_tpu.layers.quant import quantized_eval_scope
from dafne_tpu.models.head import compute_locations
from dafne_tpu.ops.losses import LossSpec, dafne_losses
from dafne_tpu.ops.postprocess import DecodeSpec, decode_detections
from dafne_tpu.ops.targets import (
    AssignmentSpec,
    assign_targets,
    flatten_levels,
    level_metadata,
)


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    batch_stats: Any = None  # BatchNorm running stats (None unless NORM=BN)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt,
        )


def level_sizes_for(image_hw: Tuple[int, int], strides) -> list:
    h, w = image_hw
    return [((h + s - 1) // s, (w + s - 1) // s) for s in strides]


def make_location_tables(image_hw, spec: AssignmentSpec):
    """Static per-level location grids + concatenated metadata."""
    sizes = level_sizes_for(image_hw, spec.strides)
    locs = [
        compute_locations(h, w, s) for (h, w), s in zip(sizes, spec.strides)
    ]
    loc_strides, size_ranges = level_metadata(sizes, spec)
    return locs, jnp.concatenate(locs, axis=0), loc_strides, size_ranges


def compute_losses(model, params, batch, assign_spec, loss_spec,
                   location_tables, batch_stats=None, train=False):
    """Pure loss computation used by both train and eval-loss paths.

    Returns ((losses, new_batch_stats), head_out); new_batch_stats is None
    unless the model carries BatchNorm running stats and train=True."""
    locs_list, locations, loc_strides, size_ranges = location_tables
    variables = {"params": params}
    new_stats = None
    if batch_stats is not None:
        variables["batch_stats"] = batch_stats
        if train:
            out, mutated = model.apply(
                variables, batch["image"], train=True, mutable=["batch_stats"]
            )
            new_stats = mutated["batch_stats"]
        else:
            out = model.apply(variables, batch["image"])
    else:
        out = model.apply(variables, batch["image"], train=train)
    num_classes = loss_spec.num_classes

    logits = flatten_levels(out["logits"], num_classes)
    corners = flatten_levels(out["corners"], 8)
    center = (
        flatten_levels(out["center"], 2)
        if out["center"][0] is not None
        else None
    )
    ctrness = flatten_levels(out["ctrness"], 1)[..., 0]

    if "tgt_labels" in batch:
        # targets precomputed on the host (TPU.HOST_ASSIGN): same
        # assign_targets, run on the CPU backend in the prefetch thread —
        # the device step starts directly at the losses
        targets = {
            "labels": batch["tgt_labels"],
            "reg_corners": batch["tgt_reg_corners"],
        }
        for k in ("tgt_reg_ltrb", "tgt_reg_abcd"):
            if k in batch:
                targets[k[len("tgt_"):]] = batch[k]
    else:
        targets = assign_targets(
            locations,
            loc_strides,
            size_ranges,
            batch["gt_corners"],
            batch["gt_hbox"],
            batch["gt_classes"],
            batch["gt_area"],
            batch["gt_valid"],
            assign_spec,
        )
    losses = dafne_losses(logits, corners, center, ctrness, targets, loss_spec)
    return (losses, new_stats), out


def resolve_host_assign(cfg) -> bool:
    """Resolve TPU.HOST_ASSIGN (False | True | "auto") to a decision.

    "auto" enables host-side assignment when the host has spare cores to
    overlap it with the running device step: the prefetch thread's CPU-jitted
    assign costs ~100 ms/batch/core at 24 gt (PARITY.md "Host-side target
    assignment"), so a 1-core host — like this build rig — would serialize
    it behind the loader and LOSE the measured 4-5% (186.5 vs 197.0 ms @b16
    on v5e with cores to spare).  Production multi-core hosts get the win
    for free; the first real assign batch is timed and logged either way so
    a misjudged auto shows up in the log.
    """
    v = cfg.TPU.get("HOST_ASSIGN", False)
    if isinstance(v, str):
        if v.lower() != "auto":
            raise ValueError(f"TPU.HOST_ASSIGN must be bool or 'auto', got {v!r}")
        try:
            cores = len(os.sched_getaffinity(0))
        except AttributeError:  # non-Linux
            cores = os.cpu_count() or 1
        enabled = cores >= 2
        import logging

        logging.getLogger("dafne_tpu").info(
            f"TPU.HOST_ASSIGN=auto: {cores} usable host core(s) -> "
            f"{'enabled' if enabled else 'disabled'} (needs >=2 to overlap "
            f"the device step)"
        )
        return enabled
    return bool(v)


def resolve_train_device_aug(cfg) -> bool:
    """Resolve TPU.TRAIN_DEVICE_AUG (False | True | "auto") to a decision.

    The device path ships the raw base image + tiny warp/color vectors and
    renders the augmented canvas INSIDE the jitted train step
    (ops/device_warp.py) — the train-time completion of the north-star
    on-device preprocessing stage.  It requires every geometric draw to be
    separable (transforms.train_geometric_augs_separable; True on a
    non-separable recipe is an error, the flagship DOTA recipes qualify,
    the 30-degree HRSC/UCAS ms recipes don't).  "auto" enables it when the
    host is compute-starved (<= 2 usable cores): the warp costs the device
    a few ms/step, so a host with cores to spare should keep cv2 warps
    overlapped with the device step instead — the mirror image of
    TPU.HOST_ASSIGN=auto, which moves work TO a strong host.
    """
    from dafne_tpu.data.transforms import train_geometric_augs_separable

    v = cfg.TPU.get("TRAIN_DEVICE_AUG", False)
    if v is False or v == "False":
        return False
    separable = train_geometric_augs_separable(cfg)
    if v is True or v == "True":
        if not separable:
            raise ValueError(
                "TPU.TRAIN_DEVICE_AUG=True but INPUT.ROTATION_AUG_ANGLES "
                f"{list(cfg.INPUT.ROTATION_AUG_ANGLES)} contains "
                "non-90-degree angles — those draws cannot be generated "
                "on device; use 'auto' or False"
            )
        return True
    if not (isinstance(v, str) and v.lower() == "auto"):
        raise ValueError(
            f"TPU.TRAIN_DEVICE_AUG must be bool or 'auto', got {v!r}"
        )
    if not separable:
        return False
    try:
        cores = len(os.sched_getaffinity(0))
    except AttributeError:  # non-Linux
        cores = os.cpu_count() or 1
    enabled = cores <= 2
    import logging

    logging.getLogger("dafne_tpu").info(
        f"TPU.TRAIN_DEVICE_AUG=auto: {cores} usable host core(s) -> "
        f"{'enabled' if enabled else 'disabled'} (augmentation moves "
        f"on-device when the host cannot keep cv2 warps ahead of the step)"
    )
    return enabled


_AUG_KEYS = (
    "aug_idx0_h", "aug_idx1_h", "aug_w0_h", "aug_w1_h",
    "aug_idx0_w", "aug_idx1_w", "aug_w0_w", "aug_w1_w",
)


def device_aug_image(batch: Dict[str, jnp.ndarray], color_aug: bool,
                     aug_sharding=None) -> jnp.ndarray:
    """Render the augmented train canvas on device from a device-aug batch
    (TPU.TRAIN_DEVICE_AUG): separable warp + optional d2 color jitter."""
    from dafne_tpu.ops.device_warp import device_color_aug, device_warp_batch

    p = {k[len("aug_"):]: batch[k] for k in _AUG_KEYS}
    img = device_warp_batch(batch["image_base"], p)
    if color_aug:
        img = device_color_aug(
            img, batch["color_light"], batch["color_w"], batch["aug_out_hw"]
        )
    if aug_sharding is not None:
        # re-establish the image sharding the host path's shard_batch gives
        # model inputs (data x spatial) — the warp output would otherwise
        # inherit only the data-axis sharding of its inputs, idling the
        # mesh's spatial axis for the whole forward/backward
        img = jax.lax.with_sharding_constraint(img, aug_sharding)
    return img


def make_host_assign_fn(cfg, image_hw: Tuple[int, int]):
    """Build the TPU.HOST_ASSIGN producer: host batch -> target arrays.

    Runs the SAME ``assign_targets`` as the in-step path, jitted for the
    CPU backend (impl="xla" — the Pallas kernel is TPU-only), inside the
    data-prefetch thread so it overlaps the running device step.  Returns
    only the fields ``dafne_losses`` consumes: labels, reg_corners, and the
    centerness source the loss spec traces (reg_ltrb for "plain",
    reg_abcd otherwise — ops/losses.py:199-202).
    """
    import dataclasses as _dc

    cpu = jax.local_devices(backend="cpu")[0]
    spec = _dc.replace(AssignmentSpec.from_config(cfg), impl="xla")
    ctr_key = (
        "reg_ltrb" if cfg.MODEL.DAFNE.CENTERNESS == "plain" else "reg_abcd"
    )
    with jax.default_device(cpu):
        _, locations, loc_strides, size_ranges = make_location_tables(
            image_hw, spec
        )

        @jax.jit
        def _assign(gt_corners, gt_hbox, gt_classes, gt_area, gt_valid):
            t = assign_targets(
                locations, loc_strides, size_ranges,
                gt_corners, gt_hbox, gt_classes, gt_area, gt_valid, spec,
            )
            return {
                "tgt_labels": t["labels"],
                "tgt_reg_corners": t["reg_corners"],
                "tgt_" + ctr_key: t[ctr_key],
            }

    logged = []  # first-call wall time, for HOST_ASSIGN=auto observability

    def host_assign(batch):
        # The host is free to use data-dependent shapes (unlike the jitted
        # device step): slice the static MAX_INSTANCES gt padding down to
        # the actual max valid count, rounded up to the scan chunk — on
        # typical scenes (<=32 gt) this is ~8x less assignment work than
        # the 256-slot padded shape.  The jit caches one executable per
        # bucket; targets' shapes ([N, K, ...]) don't depend on it.
        v = np.asarray(batch["gt_valid"])
        cols = np.where(v.any(axis=0))[0]  # last valid COLUMN, not count —
        # robust even if a mapper ever emits non-prefix-packed validity
        n_valid = int(cols[-1]) + 1 if cols.size else 1
        m = int(v.shape[1])
        bucket = min(m, max(spec.gt_chunk, -(-n_valid // spec.gt_chunk)
                            * spec.gt_chunk))
        # committing the inputs to the CPU device pins the jit execution
        # there (the process default device is the TPU)
        import time as _time

        t0 = _time.perf_counter()
        out = _assign(*(
            jax.device_put(np.asarray(batch[k])[:, :bucket], cpu)
            for k in ("gt_corners", "gt_hbox", "gt_classes", "gt_area",
                      "gt_valid")
        ))
        out = {k: np.asarray(v) for k, v in out.items()}
        if not logged:
            logged.append(True)
            import logging

            logging.getLogger("dafne_tpu").info(
                f"host assign: first batch (canvas {image_hw}, gt bucket "
                f"{bucket}) took {(_time.perf_counter() - t0) * 1e3:.1f} ms "
                f"incl. CPU-jit compile; steady-state is per-batch host work "
                f"that must stay under the device step time"
            )
        return out

    return host_assign


def make_train_step(model, cfg, image_hw: Tuple[int, int], tx, schedule=None,
                    device_aug: bool = False, aug_sharding=None):
    """Build the jittable train step for a static padded image size.

    ``device_aug`` (TPU.TRAIN_DEVICE_AUG, resolve_train_device_aug): the
    batch carries `image_base` + warp/color vectors instead of `image`; the
    step renders the augmented canvas on device before the forward pass.
    ``aug_sharding``: optional NamedSharding for the rendered canvas (keeps
    spatial-axis meshes sharded through the aug stage)."""
    assign_spec = AssignmentSpec.from_config(cfg)
    loss_spec = LossSpec.from_config(cfg)
    tables = make_location_tables(image_hw, assign_spec)
    color_aug = bool(cfg.INPUT.USE_COLOR_AUGMENTATIONS)

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        if device_aug:
            # rendered once, outside the grad closure (no params involved)
            batch = dict(batch)
            batch["image"] = device_aug_image(batch, color_aug, aug_sharding)

        def loss_fn(params):
            (losses, new_stats), _ = compute_losses(
                model, params, batch, assign_spec, loss_spec, tables,
                batch_stats=state.batch_stats, train=True,
            )
            return losses["loss/total"], (losses, new_stats)

        (loss, (metrics, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        metrics = dict(metrics)
        metrics["loss_is_finite"] = jnp.isfinite(loss)
        if schedule is not None:
            metrics["lr"] = schedule(state.step)
        new_state = state.apply_gradients(grads)
        if new_stats is not None:
            new_state = new_state.replace(batch_stats=new_stats)
        return new_state, metrics

    return train_step


def make_eval_step(model, cfg, image_hw: Tuple[int, int], decode_overrides=None):
    """Build the jittable inference step: images -> fixed-size detections.

    ``decode_overrides``: optional dict of DecodeSpec field overrides
    (diagnostics only — e.g. bench.py's ``{"skip_nms": True}`` NMS-share
    attribution program)."""
    import dataclasses

    assign_spec = AssignmentSpec.from_config(cfg)
    decode_spec = DecodeSpec.from_config(cfg, train=False)
    if decode_overrides:
        decode_spec = dataclasses.replace(decode_spec, **decode_overrides)
    locs_list, *_ = make_location_tables(image_hw, assign_spec)
    eval_int8 = bool(cfg.TPU.get("EVAL_INT8", False))
    # 0 = auto (dynamic -> 256, static -> 64; quantized_eval_scope)
    int8_min_ch = int(cfg.TPU.get("EVAL_INT8_MIN_CHANNELS", 0))
    # calibrated static scales: load the JSON NOW (build time) so a later
    # deletion of the file cannot fail inside a jit retrace
    int8_scales = cfg.TPU.get("EVAL_INT8_SCALES", "") or None
    if eval_int8 and isinstance(int8_scales, str):
        from dafne_tpu.layers.quant import load_act_scales

        int8_scales = load_act_scales(int8_scales)

    def eval_step(params, images, scale_xy: Optional[jnp.ndarray] = None,
                  batch_stats=None):
        variables = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        # interception happens at trace time: the jitted step is emitted
        # with w8a8 convs (layers/quant.py) when TPU.EVAL_INT8 is on
        with quantized_eval_scope(enabled=eval_int8, min_channels=int8_min_ch,
                                  act_scales=int8_scales):
            out = model.apply(variables, images)
        return decode_detections(out, locs_list, decode_spec, scale_xy)

    return eval_step


def init_state(model, cfg, image_hw, tx, rng=None) -> TrainState:
    rng = rng if rng is not None else jax.random.PRNGKey(max(cfg.SEED, 0))
    h, w = image_hw
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = model.init(rng, dummy)
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        tx=tx,
        batch_stats=variables.get("batch_stats"),
    )
