"""End-to-end inference throughput benchmark (the driver's round metric).

Measures images/sec/chip for the flagship DOTA pipeline at 1024²: raw pixels
-> normalize -> ResNet-50 + FPN -> DAFNe head -> static decode -> exact
rotated NMS -> top-1000 detections, all on-device in ONE jitted program.

The NMS/decode cost is DATA-dependent by design (class-major invalid-slot
tile skipping, chain-depth-bounded greedy), so the headline is measured with
TRAINED weights on held-out synthetic oriented scenes — a realistic candidate
mix — and the JSON records that mix (mean per-level survivors per image, NMS
input occupancy, post-NMS keeps, NMS time share) so a regression that shifts
the score distribution into a different cost regime is visible, not silent
(VERDICT r3 #3).  The trained weights are a quickly-trained (600-iter, 512²)
flagship-shaped model cached under ~/.cache/dafne_tpu; if training or the
cache fails for any reason the bench falls back to the historical
random-weights regime and says so in the JSON.

Baseline note: the reference publishes NO throughput numbers
(BASELINE.md: "Inference throughput: not published"); its benchmark harness
exists (tools/benchmark.py --task eval) but no results are committed.
`vs_baseline` therefore uses a documented estimate of the reference's
single-V100 R-50 eval throughput at 1024² (~14 img/s, typical for
FCOS-family R-50 detectors at this resolution with per-image Python decode
+ CUDA NMS).  The north-star is >=5x (BASELINE.json).
"""

import json
import os
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_IMG_S_ESTIMATE = 14.0  # see module docstring
# batch 16 is the throughput knee on one v5e: measured 171 img/s @8,
# 181 @16, 183 @32 — 16 keeps latency reasonable and ~all of the gain
BATCH = 16
HW = 1024
ITERS = 20
WARMUP = 3
TRAIN_ITERS = 600
CKPT_CACHE = os.path.expanduser("~/.cache/dafne_tpu/bench_ckpt_v1.msgpack")


def flagship_cfg():
    from dafne_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.MODEL.RESNETS.DEPTH = 50
    cfg.MODEL.DAFNE.NUM_CLASSES = 15
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    return cfg


def timed_chain(step, *args, iters=ITERS, warmup=WARMUP):
    """Measurement notes (axon tunnel runtime):
    - block_until_ready can return before execution -> a final fetch is
      the only reliable completion barrier;
    - every dispatch/fetch pays a ~31 ms relay round-trip, so steps are
      CHAINED through an on-device scalar (each step's input depends on
      the previous step's output): no step can be skipped, execution
      serializes on-device, dispatch latency overlaps, and ONE final
      fetch closes the pipeline.  `args[-1]` cycles over image buffers."""
    images = args[-1]
    carry = jnp.zeros((), jnp.float32)
    for _ in range(warmup):
        carry = step(*args[:-1], images[0], carry)
    float(carry)  # barrier
    t0 = time.perf_counter()
    carry = jnp.zeros((), jnp.float32)
    for i in range(iters):
        carry = step(*args[:-1], images[i % len(images)], carry)
    float(carry)
    return time.perf_counter() - t0


def make_scene_batches(n_buffers, batch, hw, max_boxes, seed_base):
    """Held-out synthetic oriented scenes staged as device buffers."""
    from dafne_tpu.data.datasets.synthetic import _make_gen_record

    buffers = []
    seed = seed_base
    for _ in range(n_buffers):
        imgs = []
        for _ in range(batch):
            rec = _make_gen_record(seed, hw=hw, max_boxes=max_boxes)
            imgs.append(rec["image"].astype(np.float32))
            seed += 1
        buffers.append(jnp.asarray(np.stack(imgs)))
    return buffers


def get_trained_params(model, cfg):
    """Load the cached quick-trained flagship checkpoint, or train one:
    600 iters at 512² on device-staged synthetic scene batches (the data
    cycles over 96 scenes; the point is a realistic score distribution,
    not generalization — tools/gen_canary.py gates that separately)."""
    import flax.serialization as fser

    params_template = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, HW, HW, 3)))[
            "params"
        ]
    )()
    if os.path.exists(CKPT_CACHE):
        with open(CKPT_CACHE, "rb") as f:
            params = fser.from_bytes(params_template, f.read())
        return jax.device_put(params), "cached"

    from dafne_tpu.data.datasets.synthetic import _make_gen_record
    from dafne_tpu.data.grain_loader import build_data_loader
    from dafne_tpu.engine.optimizer import build_optimizer
    from dafne_tpu.engine.train_loop import _DEVICE_KEYS
    from dafne_tpu.engine.trainer import TrainState, make_train_step

    thw = 512
    tcfg = flagship_cfg()
    tcfg.INPUT.MIN_SIZE_TRAIN = [thw]
    tcfg.INPUT.MAX_SIZE_TRAIN = thw
    tcfg.INPUT.ROTATION_AUG_ANGLES = [0.0]
    tcfg.SOLVER.IMS_PER_BATCH = 8
    tcfg.SOLVER.BASE_LR = 0.01
    tcfg.SOLVER.MAX_ITER = TRAIN_ITERS
    tcfg.SOLVER.STEPS = [int(TRAIN_ITERS * 0.75)]
    tcfg.SOLVER.WARMUP_ITERS = 100
    tcfg.SOLVER.WARMUP_FACTOR = 0.001
    tcfg.MODEL.BACKBONE.FREEZE_AT = 0
    tcfg.MODEL.DAFNE.LOSS_LAMBDA.CLS = 10.0
    tcfg.TPU.MAX_INSTANCES = 32
    tcfg.freeze()

    records = [
        _make_gen_record(1_000_000 + i, hw=thw, max_boxes=24) for i in range(96)
    ]
    loader = build_data_loader(tcfg, records, 8, train=True, seed=0,
                               pad_hw=(thw, thw))
    device_batches = []
    for _, b in zip(range(12), loader):
        device_batches.append(
            jax.device_put({k: b[k] for k in _DEVICE_KEYS if k in b})
        )

    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, thw, thw, 3)))[
        "params"
    ]
    tx, sched = build_optimizer(tcfg, params)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        opt_state=tx.init(params), tx=tx,
    )
    step = jax.jit(make_train_step(model, tcfg, (thw, thw), tx, sched),
                   donate_argnums=(0,))
    for it in range(TRAIN_ITERS):
        state, metrics = step(state, device_batches[it % len(device_batches)])
    assert bool(metrics["loss_is_finite"]), metrics
    params = jax.device_get(state.params)
    os.makedirs(os.path.dirname(CKPT_CACHE), exist_ok=True)
    with open(CKPT_CACHE, "wb") as f:
        f.write(fser.to_bytes(params))
    return jax.device_put(params), "trained"


def candidate_mix(model, cfg, params, images, eval_step):
    """Measured candidate mix on one batch: per-level survivors above the
    inference threshold (pre-cap), NMS input occupancy (post-cap), and
    post-NMS keeps — the knobs that set the data-dependent NMS cost."""
    from dafne_tpu.engine.trainer import AssignmentSpec, make_location_tables
    from dafne_tpu.ops.postprocess import DecodeSpec, decode_single_level

    spec = DecodeSpec.from_config(cfg, train=False)
    locs_list, *_ = make_location_tables((HW, HW), AssignmentSpec.from_config(cfg))

    def stats(params, images):
        out = model.apply({"params": params}, images)
        valid = jnp.concatenate(
            [
                decode_single_level(
                    out["logits"][i], out["corners"][i], out["ctrness"][i],
                    locs_list[i], spec.strides[i], spec,
                )["valid"]
                for i in range(len(locs_list))
            ],
            axis=1,
        )
        pre = valid.sum(axis=1)
        return pre

    pre = np.asarray(jax.jit(stats)(params, images))
    det = eval_step(params, images)
    kept = np.asarray(det["valid"]).sum(axis=1)
    cap = int(cfg.TPU.NMS_MAX_CANDIDATES)
    nms_in = np.minimum(pre, cap) if cap > 0 else pre
    return {
        "pre_cap_candidates_per_img": round(float(pre.mean()), 1),
        "nms_input_per_img": round(float(nms_in.mean()), 1),
        "nms_input_occupancy": round(float(nms_in.mean()) / max(cap, 1), 3),
        "kept_per_img": round(float(kept.mean()), 1),
    }


def bench_regime(model, cfg, params, images, with_nms_share):
    from dafne_tpu.engine.trainer import make_eval_step

    eval_step = jax.jit(make_eval_step(model, cfg, (HW, HW)))

    def step_fn(params, image, carry):
        out = eval_step(params, image + carry * 0.0)
        return jnp.sum(out["scores"]) + jnp.sum(out["corners"])

    dt = timed_chain(jax.jit(step_fn), params, images)
    result = {"img_s": round(BATCH * ITERS / dt, 2)}
    result.update(candidate_mix(model, cfg, params, images[0], eval_step))
    if with_nms_share:
        # identical program minus suppression (DecodeSpec.skip_nms) -> the
        # difference is the data-dependent NMS cost
        skip_step = jax.jit(
            make_eval_step(model, cfg, (HW, HW), decode_overrides={"skip_nms": True})
        )

        def skip_fn(params, image, carry):
            out = skip_step(params, image + carry * 0.0)
            return jnp.sum(out["scores"]) + jnp.sum(out["corners"])

        dt_skip = timed_chain(jax.jit(skip_fn), params, images, iters=10)
        dt_full10 = dt * 10 / ITERS
        result["nms_ms_share"] = round(max(0.0, 1.0 - dt_skip / dt_full10), 3)
    return result


def main():
    from dafne_tpu.models import build_model
    from dafne_tpu.utils.platform import setup_compilation_cache

    setup_compilation_cache()  # repeat runs skip the 1-5 min remote compile

    cfg = flagship_cfg()
    model = build_model(cfg)
    rng = np.random.RandomState(0)

    # ---- headline regime: trained weights, held-out synthetic scenes -----
    trained = None
    trained_source = None
    try:
        params_t, trained_source = get_trained_params(model, cfg)
        scene_images = make_scene_batches(
            n_buffers=2, batch=BATCH, hw=HW, max_boxes=96, seed_base=2_000_000,
        )
        trained = bench_regime(model, cfg, params_t, scene_images,
                               with_nms_share=True)
        del params_t, scene_images
    except Exception:
        traceback.print_exc()

    # ---- historical regime: random weights, uniform-noise pixels ---------
    params_r = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, HW, HW, 3)))[
            "params"
        ]
    )()
    noise_images = [
        jnp.asarray(rng.rand(BATCH, HW, HW, 3).astype(np.float32) * 255)
        for _ in range(4)
    ]
    random_regime = bench_regime(model, cfg, params_r, noise_images,
                                 with_nms_share=False)

    headline = trained["img_s"] if trained else random_regime["img_s"]
    print(
        json.dumps(
            {
                "metric": (
                    "images/sec/chip, DOTA R-50 1024^2 e2e incl. rotated NMS"
                    + ("" if trained else " (RANDOM-WEIGHTS FALLBACK)")
                ),
                "value": headline,
                "unit": "img/s",
                "vs_baseline": round(headline / REFERENCE_IMG_S_ESTIMATE, 2),
                "regime": "trained-heldout-scenes" if trained else "random",
                "trained_source": trained_source,
                "trained": trained,
                "random": random_regime,
            }
        )
    )


if __name__ == "__main__":
    main()
