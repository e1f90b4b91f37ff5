#!/usr/bin/env python3
"""On-hardware Pallas correctness checks (VERDICT r1 item #7).

Interpret-mode tests (tests/test_pallas_*.py) validate kernel SEMANTICS on
CPU; this script validates the MOSAIC LOWERING on the real TPU by asserting
Pallas results equal the pure-XLA formulations on-chip:

  1. quad_nms.suppression_matrix  vs  geometry.iou.quad_iou_matrix thresholding
  2. pallas.assign.assign_argmin  vs  ops.targets XLA scan path
  3. end-to-end rotated_nms keep  vs  float64 NumPy greedy reference

Writes VERIFY_TPU.json (committed as the per-round hardware artifact).
Run:  python tools/tpu_checks.py        (real chip; one TPU process at a time)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dafne_tpu.utils.platform import setup_compilation_cache

setup_compilation_cache()

import numpy as np


def random_quads(n, rng, lim=1024.0, smin=8.0, smax=90.0):
    cx = rng.uniform(smax, lim - smax, n)
    cy = rng.uniform(smax, lim - smax, n)
    w = rng.uniform(smin, smax, n)
    h = rng.uniform(smin, smax, n)
    th = rng.uniform(0, np.pi, n)
    c, s = np.cos(th), np.sin(th)
    dx = np.stack([-w, w, w, -w], 1) / 2
    dy = np.stack([-h, -h, h, h], 1) / 2
    x = cx[:, None] + dx * c[:, None] - dy * s[:, None]
    y = cy[:, None] + dx * s[:, None] + dy * c[:, None]
    return np.stack([x, y], 2).reshape(n, 8).astype(np.float32)


def check_suppression(rng, results):
    import jax
    import jax.numpy as jnp

    from dafne_tpu.geometry.iou import quad_iou_matrix
    from dafne_tpu.ops.pallas.quad_nms import suppression_matrix

    n, th = 1024, 0.1
    quads = random_quads(n, rng)
    # make real overlap pressure: duplicate half the boxes with jitter
    quads[n // 2 :] = quads[: n // 2] + rng.normal(0, 4, (n // 2, 8)).astype(
        np.float32
    )
    classes = rng.randint(0, 5, n).astype(np.int32)

    qs = jnp.asarray(quads)
    cs = jnp.asarray(classes)
    sup_pl = np.asarray(
        jax.jit(lambda q, c: suppression_matrix(q, c, th))(qs, cs)
    )
    def xla_sup(q, c):
        iou = quad_iou_matrix(q, q)
        ri = jnp.arange(n)
        return (
            (iou > th) & (c[:, None] == c[None, :]) & (ri[None, :] > ri[:, None])
        ).astype(jnp.int8)

    sup_x = np.asarray(jax.jit(xla_sup)(qs, cs))
    mism = int((sup_pl != sup_x).sum())
    total = n * n
    # float-boundary tolerance: the two formulations round differently only
    # where |iou - th| is at f32 noise level
    frac = mism / total
    results["suppression"] = {
        "n": n, "mismatches": mism, "fraction": frac,
        "suppressed_pl": int(sup_pl.sum()), "suppressed_xla": int(sup_x.sum()),
    }
    assert frac < 2e-5, results["suppression"]


def check_assign(rng, results):
    import jax
    import jax.numpy as jnp

    from dafne_tpu.ops.pallas.assign import assign_argmin
    from dafne_tpu.ops.targets import AssignmentSpec, assign_targets_single, level_metadata
    from dafne_tpu.engine.trainer import make_location_tables

    spec_x = AssignmentSpec(impl="xla")
    spec_p = AssignmentSpec(impl="pallas")
    _, locations, loc_strides, size_ranges = make_location_tables(
        (512, 512), spec_x
    )
    m = 64
    quads = random_quads(m, rng, lim=512.0, smin=10.0, smax=220.0)
    xs, ys = quads[:, 0::2], quads[:, 1::2]
    hbox = np.stack([xs.min(1), ys.min(1), xs.max(1), ys.max(1)], 1)
    area = np.abs(
        0.5
        * (
            (xs * np.roll(ys, -1, 1)).sum(1) - (ys * np.roll(xs, -1, 1)).sum(1)
        )
    ).astype(np.float32)
    classes = rng.randint(0, 15, m).astype(np.int32)
    valid = np.ones(m, bool)

    args = (
        jnp.asarray(quads), jnp.asarray(hbox), jnp.asarray(classes),
        jnp.asarray(area), jnp.asarray(valid),
    )

    def run(spec):
        return assign_targets_single(
            locations, loc_strides, size_ranges, *args, spec
        )

    out_x = jax.jit(lambda: run(spec_x))()
    out_p = jax.jit(lambda: run(spec_p))()
    lx = np.asarray(out_x["labels"])
    lp = np.asarray(out_p["labels"])
    ix = np.asarray(out_x["gt_inds"])
    ip = np.asarray(out_p["gt_inds"])
    mism = int((ix != ip).sum())
    results["assign"] = {
        "locations": int(lx.shape[0]), "gts": m,
        "label_mismatches": int((lx != lp).sum()),
        "ind_mismatches": mism,
        "positives_xla": int((lx != 15).sum()),
        "positives_pallas": int((lp != 15).sum()),
    }
    # in-quad epsilon boundary flips allowed at a tiny rate (see
    # tests/test_golden_torch.py ambiguity analysis)
    assert mism <= max(3, lx.shape[0] // 2000), results["assign"]
    assert results["assign"]["positives_xla"] > 0


def check_nms_end_to_end(rng, results):
    import jax
    import jax.numpy as jnp

    from dafne_tpu.ops.nms import rotated_nms
    from dafne_tpu.utils import polyiou

    n = 512
    quads = random_quads(n, rng)
    quads[n // 2 :] = quads[: n // 2] + rng.normal(0, 3, (n // 2, 8)).astype(
        np.float32
    )
    scores = rng.uniform(0.05, 1.0, n).astype(np.float32)
    classes = rng.randint(0, 3, n).astype(np.int32)
    valid = np.ones(n, bool)
    keep = np.asarray(
        jax.jit(
            lambda q, s, c, v: rotated_nms(q, s, c, v, 0.3)
        )(jnp.asarray(quads), jnp.asarray(scores), jnp.asarray(classes),
          jnp.asarray(valid))
    )

    # float64 host greedy reference (native C++ polyiou, ctypes)
    order = np.argsort(-scores)
    iou = polyiou.iou_poly_matrix(
        quads.astype(np.float64), quads.astype(np.float64)
    )
    ref_keep = np.zeros(n, bool)
    alive = np.ones(n, bool)
    for i in order:
        if not alive[i]:
            continue
        ref_keep[i] = True
        kill = (iou[i] > 0.3) & (classes == classes[i])
        kill[i] = False
        alive &= ~kill
    agree = float((keep == ref_keep).mean())
    results["nms_e2e"] = {
        "n": n, "kept_tpu": int(keep.sum()), "kept_ref": int(ref_keep.sum()),
        "agreement": agree,
    }
    assert agree > 0.995, results["nms_e2e"]


def main():
    import jax

    t0 = time.perf_counter()
    rng = np.random.RandomState(0)
    results = {"device": str(jax.devices()[0]), "platform": jax.devices()[0].platform}
    check_suppression(rng, results)
    check_assign(rng, results)
    check_nms_end_to_end(rng, results)
    results["elapsed_s"] = round(time.perf_counter() - t0, 1)
    results["ok"] = True
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "VERIFY_TPU.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
