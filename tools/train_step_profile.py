#!/usr/bin/env python3
"""Attribute the flagship train-step time on real hardware (VERDICT r1 #9).

jax.profiler traces are unreliable over the axon remote tunnel, so this
measures by ABLATION: each phase is a separately-jitted program timed with
the on-device chaining trick from bench.py (inputs data-depend on the
previous step's output; ONE final fetch closes the pipeline):

  model_fwd    backbone+FPN+head forward only
  loss_fwd     + assignment + losses (no grad)
  train_step   + backward + optimizer (the real step)

and knob variants of the full step (remat backbone, assignment impl).

Run:  python tools/train_step_profile.py [--phases model_fwd,loss_fwd,...]
Writes PROFILE_TRAIN.json.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dafne_tpu.utils.platform import setup_compilation_cache

setup_compilation_cache()

import numpy as np

BATCH = int(os.environ.get("PROFILE_BATCH", "8"))
HW = 1024
ITERS, WARMUP = 10, 2


def flagship_cfg(**tpu_overrides):
    from dafne_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.MODEL.RESNETS.DEPTH = 50
    cfg.MODEL.DAFNE.NUM_CLASSES = 15
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    for k, v in tpu_overrides.items():
        setattr(cfg.TPU, k, v)
    return cfg


def synthetic_batch(rng, n_gt=24):
    import jax.numpy as jnp

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
        "image": jnp.asarray(rng.rand(BATCH, HW, HW, 3).astype(np.float32) * 255),
        "gt_corners": jnp.asarray(quads),
        "gt_hbox": jnp.asarray(hbox.astype(np.float32)),
        "gt_classes": jnp.asarray(rng.randint(0, 15, (BATCH, n_gt)).astype(np.int32)),
        "gt_area": jnp.asarray(area.astype(np.float32)),
        "gt_valid": jnp.asarray(np.ones((BATCH, n_gt), bool)),
    }


def timed_chain(step, *args):
    """step(carry, *args) -> new scalar carry; returns ms/iter."""
    import jax.numpy as jnp

    carry = jnp.zeros((), jnp.float32)
    for _ in range(WARMUP):
        carry = step(carry, *args)
    float(carry)
    t0 = time.perf_counter()
    carry = jnp.zeros((), jnp.float32)
    for _ in range(ITERS):
        carry = step(carry, *args)
    float(carry)
    return (time.perf_counter() - t0) / ITERS * 1000.0


def main():
    p = argparse.ArgumentParser()
    p.add_argument(
        "--phases",
        default="model_fwd,loss_fwd,train_step,train_step_remat",
    )
    args = p.parse_args()
    phases = args.phases.split(",")

    import jax
    import jax.numpy as jnp

    from dafne_tpu.engine.optimizer import build_optimizer
    from dafne_tpu.engine.trainer import (
        TrainState,
        compute_losses,
        make_location_tables,
        make_train_step,
    )
    from dafne_tpu.models import build_model
    from dafne_tpu.ops.losses import LossSpec
    from dafne_tpu.ops.targets import AssignmentSpec

    rng = np.random.RandomState(0)
    batch = synthetic_batch(rng)
    results = {"batch": BATCH, "hw": HW, "device": str(jax.devices()[0])}

    def build(cfg):
        model = build_model(cfg)
        params = jax.jit(
            lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, HW, HW, 3)))[
                "params"
            ]
        )()
        return model, params

    cfg = flagship_cfg()
    model, params = build(cfg)

    def _consume_all(out):
        # EVERY head output must feed the result: summing only out["logits"]
        # lets XLA dead-code-eliminate the corners/center towers (8 of the
        # 12 tower convs!) — the round-2/3 "model_fwd 28 ms" was exactly
        # that artifact (true full fwd ≈ 38.5 ms), which also manufactured
        # the "heavy backward" puzzle (94.8/28 = 3.4x; honest ratio 2.5x)
        tot = sum(jnp.sum(o) for o in out["logits"])
        tot += sum(jnp.sum(o) for o in out["corners"])
        tot += sum(jnp.sum(o) for o in out["ctrness"])
        tot += sum(jnp.sum(o) for o in out["center"] if o is not None)
        return tot.astype(jnp.float32)

    if "model_fwd" in phases:
        def fwd(carry, params, image):
            out = model.apply({"params": params}, image + carry * 0.0)
            return _consume_all(out)

        ms = timed_chain(jax.jit(fwd), params, batch["image"])
        results["model_fwd_ms"] = round(ms, 1)
        print("model_fwd", results["model_fwd_ms"], flush=True)

    if "loss_fwd" in phases:
        aspec = AssignmentSpec.from_config(cfg)
        lspec = LossSpec.from_config(cfg)
        tables = make_location_tables((HW, HW), aspec)

        def loss_fwd(carry, params, b):
            b = dict(b)
            b["image"] = b["image"] + carry * 0.0
            (losses, _), _ = compute_losses(
                model, params, b, aspec, lspec, tables, train=True
            )
            return losses["loss/total"].astype(jnp.float32)

        ms = timed_chain(jax.jit(loss_fwd), params, batch)
        results["loss_fwd_ms"] = round(ms, 1)
        print("loss_fwd", results["loss_fwd_ms"], flush=True)

    def full_step_ms(cfg_variant, batch_override=None):
        bench_batch = batch if batch_override is None else batch_override
        model_v, params_v = build(cfg_variant)
        tx, sched = build_optimizer(cfg_variant, params_v)
        state = TrainState(
            step=jnp.zeros((), jnp.int32), params=params_v,
            opt_state=tx.init(params_v), tx=tx,
        )
        step = jax.jit(
            make_train_step(model_v, cfg_variant, (HW, HW), tx, sched),
            donate_argnums=(0,),
        )

        # chain through the image so steps serialize on-device
        def chained(carry, state, b):
            b = dict(b)
            b["image"] = b["image"] + carry * 0.0
            new_state, metrics = step(state, b)
            return metrics["loss/total"].astype(jnp.float32), new_state

        c = jnp.zeros((), jnp.float32)
        for _ in range(WARMUP):
            c, state = chained(c, state, bench_batch)
        float(c)
        t0 = time.perf_counter()
        c = jnp.zeros((), jnp.float32)
        for _ in range(ITERS):
            c, state = chained(c, state, bench_batch)
        float(c)
        return (time.perf_counter() - t0) / ITERS * 1000.0

    if "assign_only" in phases:
        aspec = AssignmentSpec.from_config(cfg)
        tables = make_location_tables((HW, HW), aspec)
        from dafne_tpu.ops.targets import assign_targets

        def assign_only(carry, b):
            t = assign_targets(
                tables[1], tables[2], tables[3],
                b["gt_corners"] + carry * 0.0, b["gt_hbox"], b["gt_classes"],
                b["gt_area"], b["gt_valid"], aspec,
            )
            return sum(jnp.sum(v.astype(jnp.float32)) for v in t.values())

        results["assign_only_ms"] = round(
            timed_chain(jax.jit(assign_only), batch), 1
        )
        print("assign_only", results["assign_only_ms"], flush=True)

    if "losses_only" in phases or "losses_grad" in phases:
        # head outputs captured once; time flatten+losses in isolation
        aspec = AssignmentSpec.from_config(cfg)
        lspec = LossSpec.from_config(cfg)
        tables = make_location_tables((HW, HW), aspec)
        from dafne_tpu.ops.targets import assign_targets, flatten_levels

        out = jax.jit(lambda p, im: model.apply({"params": p}, im))(
            params, batch["image"]
        )
        jax.block_until_ready(out)
        targets = jax.jit(
            lambda b: assign_targets(
                tables[1], tables[2], tables[3], b["gt_corners"], b["gt_hbox"],
                b["gt_classes"], b["gt_area"], b["gt_valid"], aspec,
            )
        )(batch)
        jax.block_until_ready(targets)
        from dafne_tpu.ops.losses import dafne_losses

        def loss_of(out_, targets_):
            logits = flatten_levels(out_["logits"], lspec.num_classes)
            corners = flatten_levels(out_["corners"], 8)
            center = (
                flatten_levels(out_["center"], 2)
                if out_["center"][0] is not None else None
            )
            ctr = flatten_levels(out_["ctrness"], 1)[..., 0]
            return dafne_losses(logits, corners, center, ctr, targets_, lspec)[
                "loss/total"
            ]

        if "losses_only" in phases:
            def losses_only(carry, out_, targets_):
                out_ = jax.tree_util.tree_map(lambda x: x + carry * 0.0, out_)
                return loss_of(out_, targets_).astype(jnp.float32)

            results["losses_only_ms"] = round(
                timed_chain(jax.jit(losses_only), out, targets), 1
            )
            print("losses_only", results["losses_only_ms"], flush=True)

        if "losses_grad" in phases:
            def losses_grad(carry, out_, targets_):
                out_ = jax.tree_util.tree_map(lambda x: x + carry * 0.0, out_)
                l, g = jax.value_and_grad(lambda o: loss_of(o, targets_))(out_)
                return l + sum(
                    jnp.sum(x).astype(jnp.float32)
                    for x in jax.tree_util.tree_leaves(g)
                )

            results["losses_grad_ms"] = round(
                timed_chain(jax.jit(losses_grad), out, targets), 1
            )
            print("losses_grad", results["losses_grad_ms"], flush=True)

    if "model_grad" in phases:
        # fwd+bwd of the model alone under a trivial scalar loss: isolates
        # conv backward cost from the assignment/loss path
        def triv(params, image):
            out = model.apply({"params": params}, image)
            return sum(
                jnp.sum(o.astype(jnp.float32))
                for k in ("logits", "corners", "ctrness")
                for o in out[k]
            )

        def model_grad(carry, params, image):
            l, g = jax.value_and_grad(triv)(params, image + carry * 0.0)
            return l + sum(
                jnp.sum(x).astype(jnp.float32)
                for x in jax.tree_util.tree_leaves(g)
            )

        results["model_grad_ms"] = round(
            timed_chain(jax.jit(model_grad), params, batch["image"]), 1
        )
        print("model_grad", results["model_grad_ms"], flush=True)

    if "eval_full" in phases:
        from dafne_tpu.engine.trainer import make_eval_step

        eval_step = jax.jit(make_eval_step(model, cfg, (HW, HW)))

        def eval_full(carry, params, image):
            out = eval_step(params, image + carry * 0.0)
            return (jnp.sum(out["scores"]) + jnp.sum(out["corners"])).astype(
                jnp.float32
            )

        results["eval_full_ms"] = round(
            timed_chain(jax.jit(eval_full), params, batch["image"]), 1
        )
        print("eval_full", results["eval_full_ms"], flush=True)

    if "eval_int8" in phases:
        # same eval step with TPU.EVAL_INT8 (layers/quant.py), A/B'd against
        # an in-run bf16 baseline at each eligibility threshold
        from dafne_tpu.engine.trainer import make_eval_step

        import tempfile

        from dafne_tpu.layers.quant import calibrate_act_scales, save_act_scales

        # calibrate once at the loosest threshold (superset of all sites)
        scales = calibrate_act_scales(
            model, {"params": params}, [batch["image"]], min_channels=64
        )
        scales_path = os.path.join(
            tempfile.mkdtemp(prefix="int8_scales_"), "scales.json"
        )
        save_act_scales(scales_path, scales)

        # (mode, min_ch): dynamic per-image scales vs calibrated static
        # scales (quantize fuses into the producer — the narrow-conv bet)
        variants = [
            ("bf16", 0, ""),
            ("min_ch_128", 128, ""),
            ("min_ch_256", 256, ""),
            ("static_64", 64, scales_path),
            ("static_128", 128, scales_path),
            ("static_256", 256, scales_path),
        ]
        ab = {}
        for key, min_ch, sp in variants:

            eval_step_q = jax.jit(
                make_eval_step(
                    model,
                    flagship_cfg(
                        EVAL_INT8=min_ch > 0,
                        EVAL_INT8_MIN_CHANNELS=min_ch or 128,
                        EVAL_INT8_SCALES=sp,
                    ),
                    (HW, HW),
                )
            )

            def eval_q(carry, params, image, _s=eval_step_q):
                out = _s(params, image + carry * 0.0)
                return (
                    jnp.sum(out["scores"]) + jnp.sum(out["corners"])
                ).astype(jnp.float32)

            ab[key] = round(
                timed_chain(jax.jit(eval_q), params, batch["image"]), 1
            )
            print(f"eval_int8[{key}]", ab[key], flush=True)
        results["eval_int8_ms"] = ab

    if "model_fwd_int8" in phases:
        # A/B the eligibility threshold: narrow HBM-bound convs can get
        # slower in int8, wide MXU-bound ones faster (see layers/quant.py)
        from dafne_tpu.layers.quant import quantized_eval_scope

        ab = {}
        for min_ch in (64, 128, 256):

            def fwd_q(carry, params, image, _m=min_ch):
                with quantized_eval_scope(enabled=True, min_channels=_m):
                    out = model.apply({"params": params}, image + carry * 0.0)
                return _consume_all(out)

            ab[f"min_ch_{min_ch}"] = round(
                timed_chain(jax.jit(fwd_q), params, batch["image"]), 1
            )
            print(f"model_fwd_int8[{min_ch}]", ab[f"min_ch_{min_ch}"], flush=True)
        results["model_fwd_int8_ms"] = ab

    if (
        "nms_only" in phases
        or "suppression_only" in phases
        or "greedy_only" in phases
    ):
        # realistic NMS input: clusters of near-duplicate candidate quads
        from dafne_tpu.ops.nms import rotated_nms_batched
        from dafne_tpu.ops.pallas.quad_nms import greedy_scan, suppression_matrix

        m = int(flagship_cfg().TPU.NMS_MAX_CANDIDATES)
        n_obj = m // 16
        cx, cy = rng.uniform(100, HW - 100, (2, BATCH, n_obj, 1))
        w_, h_ = rng.uniform(16, 120, (2, BATCH, n_obj, 1))
        th = rng.uniform(0, np.pi, (BATCH, n_obj, 1))
        cx = cx + rng.randn(BATCH, n_obj, 16) * 4
        cy = cy + rng.randn(BATCH, n_obj, 16) * 4
        dxs = np.stack([-w_, w_, w_, -w_], -1) / 2 + 0 * th[..., None]
        dys = np.stack([-h_, -h_, h_, h_], -1) / 2 + 0 * th[..., None]
        cth, sth = np.cos(th)[..., None], np.sin(th)[..., None]
        quads = np.stack(
            [cx[..., None] + dxs * cth - dys * sth,
             cy[..., None] + dxs * sth + dys * cth], -1
        ).reshape(BATCH, m, 8).astype(np.float32)
        corners = jnp.asarray(quads)
        scores = jnp.asarray(rng.rand(BATCH, m).astype(np.float32))
        classes = jnp.asarray(rng.randint(0, 15, (BATCH, m)).astype(np.int32))
        valid = jnp.ones((BATCH, m), bool)
        # suppression_matrix's documented precondition (and the production
        # path through rotated_nms): CLASS-MAJOR, score-desc within class,
        # CCW rows — both the kernel's class-range tile skip and
        # greedy_scan's trip count depend on it
        from dafne_tpu.ops.nms import _as_ccw_rows

        order = np.lexsort(
            (-np.asarray(scores), np.asarray(classes)), axis=-1
        )
        sorted_corners = jnp.asarray(
            np.take_along_axis(quads, order[:, :, None], axis=1)
        )
        sorted_corners = jax.vmap(_as_ccw_rows)(sorted_corners)
        sorted_classes = jnp.asarray(
            np.take_along_axis(np.asarray(classes), order, axis=1)
        )

        if "nms_only" in phases:
            def nms_only(carry, c_, s_, k_, v_):
                keep = rotated_nms_batched(
                    c_ + carry * 0.0, s_, k_, v_, 0.1, ((5, 4),)
                )
                return jnp.sum(keep.astype(jnp.float32))

            results["nms_only_ms"] = round(
                timed_chain(jax.jit(nms_only), corners, scores, classes, valid),
                1,
            )
            print("nms_only", results["nms_only_ms"], flush=True)

        if "suppression_only" in phases:
            # class_major=True is the production path (rotated_nms orders
            # candidates class-major and selects the strip kernel); the
            # _2d variant times the layout-agnostic tiled kernel
            for tag, cm in [("", True), ("_2d", False)]:
                def supp_only(carry, c_, k_, cm=cm):
                    f = jax.vmap(
                        lambda cc, kk: suppression_matrix(
                            cc, kk, 0.1, class_major=cm
                        )
                    )
                    s = f(c_ + carry * 0.0, k_)
                    return jnp.sum(s.astype(jnp.float32))

                key = f"suppression_only{tag}_ms"
                results[key] = round(
                    timed_chain(
                        jax.jit(supp_only), sorted_corners, sorted_classes
                    ),
                    1,
                )
                print(key, results[key], flush=True)

        if "greedy_only" in phases:
            f = jax.jit(
                jax.vmap(lambda cc, kk: suppression_matrix(cc, kk, 0.1))
            )
            smat = f(sorted_corners, sorted_classes)
            jax.block_until_ready(smat)

            def greedy_only(carry, s_, v_):
                s_ = s_ + carry.astype(jnp.int8) * 0
                keep = jax.vmap(greedy_scan)(s_, v_)
                return jnp.sum(keep.astype(jnp.float32))

            results["greedy_only_ms"] = round(
                timed_chain(jax.jit(greedy_only), smat, valid), 1
            )
            print("greedy_only", results["greedy_only_ms"], flush=True)

    if "decode_only" in phases or "decode_no_sort" in phases or "decode_exact" in phases:
        from dafne_tpu.engine.trainer import make_location_tables
        from dafne_tpu.ops.postprocess import DecodeSpec, decode_detections

        aspec = AssignmentSpec.from_config(cfg)
        locs_list, *_ = make_location_tables((HW, HW), aspec)
        out = jax.jit(lambda p, im: model.apply({"params": p}, im))(
            params, batch["image"]
        )
        jax.block_until_ready(out)

        def run_decode(spec_):
            def decode_only(carry, out_):
                out_ = jax.tree_util.tree_map(lambda x: x + carry * 0.0, out_)
                d = decode_detections(out_, locs_list, spec_)
                return (jnp.sum(d["scores"]) + jnp.sum(d["corners"])).astype(
                    jnp.float32
                )

            return timed_chain(jax.jit(decode_only), out)

        if "decode_only" in phases:
            results["decode_only_ms"] = round(
                run_decode(DecodeSpec.from_config(cfg, train=False)), 1
            )
            print("decode_only", results["decode_only_ms"], flush=True)
        if "decode_no_sort" in phases:
            import dataclasses as _dc

            spec_ns = _dc.replace(
                DecodeSpec.from_config(cfg, train=False), sort_corners=False
            )
            results["decode_no_sort_ms"] = round(run_decode(spec_ns), 1)
            print("decode_no_sort", results["decode_no_sort_ms"], flush=True)
        if "decode_exact" in phases:
            import dataclasses as _dc

            # exact top-k in BOTH decode stages via ops/topk.py bisection
            # (the DECODE_APPROX_TOPK=False path)
            spec_ex = _dc.replace(
                DecodeSpec.from_config(cfg, train=False), approx_topk=False
            )
            results["decode_exact_ms"] = round(run_decode(spec_ex), 1)
            print("decode_exact", results["decode_exact_ms"], flush=True)

    if "tta_r101" in phases:
        # VERDICT r1 #3 done-criterion: the headline dota-1.0_r101_ms TTA aug
        # set must run on ONE chip without OOM via the bucketed eval steps.
        from dafne_tpu.config import load_config
        from dafne_tpu.engine.tta import (
            BucketedEvalSteps, build_tta_augs, tta_inference_single,
        )

        cfg_t = load_config(
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "configs", "pre-trained", "dota-1.0_r101_ms.yaml",
            )
        )
        model_t = __import__(
            "dafne_tpu.models", fromlist=["build_model"]
        ).build_model(cfg_t)
        params_t = jax.jit(
            lambda: model_t.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3))
            )["params"]
        )()
        img = (rng.rand(1024, 1024, 3) * 255).astype(np.float32)
        steps = BucketedEvalSteps(cfg_t, model_t)
        n_augs = len(build_tta_augs(cfg_t, 1024, 1024))
        t0 = time.perf_counter()
        det = tta_inference_single(cfg_t, steps, params_t, img)  # compiles
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            det = tta_inference_single(cfg_t, steps, params_t, img)
        results["tta_r101"] = {
            "augs_per_image": n_augs,
            "compile_plus_first_s": round(compile_s, 1),
            "s_per_image": round((time.perf_counter() - t0) / reps, 2),
            "detections": int(det["valid"].sum()),
            "oom": False,
            "note": "random weights (0 detections expected); trained-weight "
            "TTA with real detections + TTA-mAP>plain: TTA_CANARY.json",
        }
        print("tta_r101", results["tta_r101"], flush=True)

    if "train_step" in phases:
        results["train_step_ms"] = round(full_step_ms(flagship_cfg()), 1)
        print("train_step", results["train_step_ms"], flush=True)

    if "train_step_remat" in phases:
        results["train_step_remat_ms"] = round(
            full_step_ms(flagship_cfg(REMAT_BACKBONE=True)), 1
        )
        print("train_step_remat", results["train_step_remat_ms"], flush=True)

    if "train_step_host_assign" in phases:
        # TPU.HOST_ASSIGN device program: targets arrive WITH the batch
        # (computed here once on the CPU backend; in the real loop the
        # prefetch thread computes them overlapped with the running step) —
        # the device step starts at the losses, dropping the on-device
        # assignment phase.  host_assign_cpu_ms reports the host-side cost
        # per batch so the overlap claim is auditable (it must stay under
        # the step time for the prefetch thread to keep up).
        from dafne_tpu.engine.trainer import make_host_assign_fn

        cfg_h = flagship_cfg()
        assign_host = make_host_assign_fn(cfg_h, (HW, HW))
        assign_host(batch)  # compile
        t0 = time.perf_counter()
        for _ in range(5):
            tgt = assign_host(batch)
        host_ms = (time.perf_counter() - t0) * 1000.0 / 5
        batch_h = dict(batch)
        batch_h.update({k: jnp.asarray(v) for k, v in tgt.items()})
        results["train_step_host_assign_ms"] = round(
            full_step_ms(cfg_h, batch_override=batch_h), 1
        )
        results["host_assign_cpu_ms"] = round(host_ms, 1)
        print("train_step_host_assign", results["train_step_host_assign_ms"],
              "host_assign_cpu_ms", results["host_assign_cpu_ms"], flush=True)

    if "train_step_xla_assign" in phases:
        # route assignment through the XLA scan instead of the Pallas kernel
        results["train_step_xla_assign_ms"] = round(
            full_step_ms(flagship_cfg(ASSIGN_IMPL="xla")), 1
        )
        print("train_step_xla_assign", results["train_step_xla_assign_ms"], flush=True)

    if "eval_roofline" in phases:
        # Close the eval book (VERDICT r4 #3): eval_full sits well under a
        # FLOPs+bytes bound because decode/NMS are VPU-dominated — invisible
        # to an MXU+HBM roofline.  Split eval_full into model_fwd / decode /
        # NMS by program differencing (the skip_nms diagnostic program and
        # the dense-heads program share inputs with the full one), bound
        # each phase by the unit that limits it (MXU flops, HBM bytes, or
        # VPU ops), and commit the per-phase why-not table.
        #
        # VPU peak model: clock implied by the public 197 bf16 TFLOP/s
        # (4 MXUs x 128x128 x 2 flops => ~1.5 GHz), VPU = 8x128 lanes x
        # 4 ALUs x 1 op/lane/cycle ~= 6.1e12 ops/s.  FMA-heavy VPU code can
        # reach 2x that; compare/select-heavy code (decode top-k, NMS
        # suppression/greedy) cannot, and XLA cost analysis counts compares
        # as 0 flops anyway — so the VPU term UNDERCOUNTS real work and the
        # resulting bound is a conservative (optimistic) speed-of-light.
        from dafne_tpu.engine.trainer import make_eval_step

        E_PEAK_FLOPS = 197e12
        E_PEAK_BW = 819e9
        E_PEAK_VPU = 6.1e12

        def ecost_of(jitted, *eargs):
            comp = jitted.lower(*eargs).compile()
            ca = comp.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            return (
                float(ca.get("flops", 0.0)),
                float(ca.get("bytes accessed", 0.0)),
                float(ca.get("transcendentals", 0.0)),
            )

        def efwd_p(params, image):
            return _consume_all(model.apply({"params": params}, image))

        e_fwd = jax.jit(efwd_p)
        e_nonms = jax.jit(make_eval_step(
            model, cfg, (HW, HW), decode_overrides={"skip_nms": True}
        ))
        e_full = jax.jit(make_eval_step(model, cfg, (HW, HW)))

        def etimed(step):
            def run(carry, params, image):
                out = step(params, image + carry * 0.0)
                return (
                    jnp.sum(out["scores"]) + jnp.sum(out["corners"])
                ).astype(jnp.float32)

            return timed_chain(jax.jit(run), params, batch["image"])

        def etimed_fwd():
            def run(carry, params, image):
                return efwd_p(params, image + carry * 0.0)

            return timed_chain(jax.jit(run), params, batch["image"])

        ms_fwd = etimed_fwd()
        ms_nonms = etimed(e_nonms)
        ms_full = etimed(e_full)
        c_fwd = ecost_of(e_fwd, params, batch["image"])
        c_nonms = ecost_of(e_nonms, params, batch["image"])
        c_full = ecost_of(e_full, params, batch["image"])

        def phase_row(name, measured_ms, flops, nbytes, trans, vpu_bound):
            flops = max(flops, 0.0)
            nbytes = max(nbytes, 0.0)
            ops = flops + trans
            compute_ms = (
                ops / E_PEAK_VPU if vpu_bound else flops / E_PEAK_FLOPS
            ) * 1e3
            bw_ms = nbytes / E_PEAK_BW * 1e3
            bound_ms = max(compute_ms, bw_ms)
            return {
                "measured_ms": round(measured_ms, 1),
                "flops_g": round(flops / 1e9, 1),
                "bytes_gb": round(nbytes / 1e9, 2),
                "compute_unit": "vpu" if vpu_bound else "mxu",
                "compute_bound_ms": round(compute_ms, 1),
                "bw_bound_ms": round(bw_ms, 1),
                "bound_ms": round(bound_ms, 1),
                "pct_of_bound": round(bound_ms / max(measured_ms, 1e-6), 2),
            }

        table = {
            "model_fwd": phase_row(
                "model_fwd", ms_fwd, c_fwd[0], c_fwd[1], c_fwd[2], False
            ),
            "decode_topk": phase_row(
                "decode_topk", ms_nonms - ms_fwd,
                c_nonms[0] - c_fwd[0], c_nonms[1] - c_fwd[1],
                c_nonms[2] - c_fwd[2], True,
            ),
            "nms": phase_row(
                "nms", ms_full - ms_nonms,
                c_full[0] - c_nonms[0], c_full[1] - c_nonms[1],
                c_full[2] - c_nonms[2], True,
            ),
        }
        composite = sum(r["bound_ms"] for r in table.values())
        table["eval_full"] = {
            "measured_ms": round(ms_full, 1),
            "composite_bound_ms": round(composite, 1),
            "pct_of_composite_bound": round(composite / ms_full, 2),
            "note": (
                "random-weights regime (trained-mix NMS share is measured "
                "by bench.py). WHY-NOT decomposition: the eval residual "
                "lives almost entirely in model_fwd (its gap to the "
                "balanced 20.4 ms flops=bw bound = the round-3 tower-MFU "
                "finding: 256-ch 3x3 towers run ~64% MFU, and GN between "
                "tower convs forces activation materialization — "
                "train_ablation_ms.head_norm_none quantifies it), NOT in "
                "decode/NMS: decode measures FASTER than its byte bound "
                "(fusion keeps per-level candidates in VMEM — the 'bytes "
                "accessed' cost-analysis counts fusion-boundary buffers "
                "that never reach HBM) and NMS rides the invalid-slot "
                "tile skip. decode/nms VPU terms undercount "
                "compare/select work — their pct is a floor."
            ),
        }
        results["eval_roofline"] = table
        for k, v in table.items():
            print("eval_roofline", k, v, flush=True)

    if "roofline" in phases:
        # Per-phase roofline (VERDICT r3 #4): compiled-HLO FLOPs and bytes
        # from XLA cost analysis vs v5e peaks -> how close each phase sits
        # to its compute/bandwidth bound.  bound_ms = max(flops/peak_flops,
        # bytes/peak_bw); pct_of_bound = bound/measured (1.0 = speed of
        # light).  Bytes are fusion-boundary buffer accesses — a faithful
        # HBM-traffic proxy for this all-fused program.  Peaks: v5e bf16
        # MXU 197 TFLOP/s, HBM 819 GB/s (public TPU v5e spec).
        PEAK_FLOPS = 197e12
        PEAK_BW = 819e9

        def cost_of(jitted, *args):
            comp = jitted.lower(*args).compile()
            ca = comp.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            return float(ca.get("flops", 0.0)), float(
                ca.get("bytes accessed", 0.0)
            )

        programs = {}

        def fwd_p(params, image):
            return _consume_all(model.apply({"params": params}, image))

        programs["model_fwd"] = (jax.jit(fwd_p), (params, batch["image"]))

        def triv_p(params, image):
            out = model.apply({"params": params}, image)
            return sum(
                jnp.sum(o.astype(jnp.float32))
                for k in ("logits", "corners", "ctrness")
                for o in out[k]
            )

        def grad_p(params, image):
            l, g = jax.value_and_grad(triv_p)(params, image)
            return l + sum(
                jnp.sum(x).astype(jnp.float32)
                for x in jax.tree_util.tree_leaves(g)
            )

        programs["model_grad"] = (jax.jit(grad_p), (params, batch["image"]))

        from dafne_tpu.engine.trainer import make_eval_step

        programs["eval_full"] = (
            jax.jit(make_eval_step(model, cfg, (HW, HW))),
            (params, batch["image"]),
        )

        tx_r, sched_r = build_optimizer(cfg, params)
        state_r = TrainState(
            step=jnp.zeros((), jnp.int32), params=params,
            opt_state=tx_r.init(params), tx=tx_r,
        )
        programs["train_step"] = (
            jax.jit(make_train_step(model, cfg, (HW, HW), tx_r, sched_r)),
            (state_r, batch),
        )

        # measured ms: this run's numbers, else the committed profile
        committed = {}
        prof_path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "PROFILE_TRAIN.json",
        )
        if os.path.exists(prof_path):
            with open(prof_path) as f:
                committed = json.load(f)

        roofline = {}
        for name, (jitted, pargs) in programs.items():
            flops, nbytes = cost_of(jitted, *pargs)
            flops_ms = flops / PEAK_FLOPS * 1e3
            bw_ms = nbytes / PEAK_BW * 1e3
            bound_ms = max(flops_ms, bw_ms)
            measured = results.get(f"{name}_ms", committed.get(f"{name}_ms"))
            roofline[name] = {
                "flops_g": round(flops / 1e9, 1),
                "bytes_gb": round(nbytes / 1e9, 2),
                "flops_bound_ms": round(flops_ms, 1),
                "bw_bound_ms": round(bw_ms, 1),
                "bound_ms": round(bound_ms, 1),
                "bound": "flops" if flops_ms >= bw_ms else "bandwidth",
                "measured_ms": measured,
                "pct_of_bound": (
                    round(bound_ms / measured, 2) if measured else None
                ),
            }
            print("roofline", name, roofline[name], flush=True)
        results["roofline"] = roofline

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "PROFILE_TRAIN.json",
    )
    if BATCH != 8:  # non-default batch: suffix ALL keys so b8 numbers survive
        results.pop("batch", None)
        results = {f"{k}_b{BATCH}": v for k, v in results.items()}
    if os.path.exists(out):  # merge so partial-phase runs accumulate
        with open(out) as f:
            prev = json.load(f)
        prev.update(results)
        results = prev
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
