"""End-to-end inference throughput benchmark (the driver's round metric).

Measures images/sec/chip for the flagship DOTA pipeline at 1024²: raw pixels
-> normalize -> ResNet-50 + FPN -> DAFNe head -> static decode -> exact
rotated NMS -> top-1000 detections, all on-device in ONE jitted program.

Baseline note: the reference publishes NO throughput numbers
(BASELINE.md: "Inference throughput: not published"); its benchmark harness
exists (tools/benchmark.py --task eval) but no results are committed.
`vs_baseline` therefore uses a documented estimate of the reference's
single-V100 R-50 eval throughput at 1024² (~14 img/s, typical for
FCOS-family R-50 detectors at this resolution with per-image Python decode
+ CUDA NMS).  The north-star is >=5x (BASELINE.json).
"""

import json
import time

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


def main():
    from dafne_tpu.config import get_cfg
    from dafne_tpu.engine.trainer import make_eval_step
    from dafne_tpu.models import build_model
    from dafne_tpu.utils.platform import setup_compilation_cache

    setup_compilation_cache()  # repeat runs skip the 1-5 min remote compile

    cfg = get_cfg()
    cfg.MODEL.RESNETS.DEPTH = 50
    cfg.MODEL.DAFNE.NUM_CLASSES = 15
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"

    model = build_model(cfg)
    rng = np.random.RandomState(0)
    # distinct buffers per iteration so no runtime-level caching can shortcut
    images = [
        jnp.asarray(rng.rand(BATCH, HW, HW, 3).astype(np.float32) * 255)
        for _ in range(4)
    ]

    params = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, HW, HW, 3)))["params"]
    )()
    eval_step = jax.jit(make_eval_step(model, cfg, (HW, HW)))

    # Measurement notes (axon tunnel runtime):
    #  - block_until_ready can return before execution -> a final fetch is
    #    the only reliable completion barrier;
    #  - every dispatch/fetch pays a ~31 ms relay round-trip, so steps are
    #    CHAINED through an on-device scalar (each step's input depends on
    #    the previous step's output): no step can be skipped, execution
    #    serializes on-device, dispatch latency overlaps, and ONE final
    #    fetch closes the pipeline.
    def step_fn(params, image, carry):
        out = eval_step(params, image + carry * 0.0)
        return jnp.sum(out["scores"]) + jnp.sum(out["corners"])

    step = jax.jit(step_fn)
    carry = jnp.zeros((), jnp.float32)
    for _ in range(WARMUP):
        carry = step(params, images[0], carry)
    float(carry)  # barrier

    t0 = time.perf_counter()
    carry = jnp.zeros((), jnp.float32)
    for i in range(ITERS):
        carry = step(params, images[i % len(images)], carry)
    float(carry)  # single completion barrier for the whole chain
    dt = time.perf_counter() - t0

    img_s = BATCH * ITERS / dt
    print(
        json.dumps(
            {
                "metric": "images/sec/chip, DOTA R-50 1024^2 e2e incl. rotated NMS",
                "value": round(img_s, 2),
                "unit": "img/s",
                "vs_baseline": round(img_s / REFERENCE_IMG_S_ESTIMATE, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
