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

    # strip kernel (class-major column spans): bit-equality with the 2-D
    # kernel on a class-ascending layout with an invalid tail
    order = np.argsort(classes, kind="stable")
    cs_cm = np.concatenate(
        [classes[order][: n - 64], np.full(64, -1, np.int32)]
    )
    qs_cm = jnp.asarray(quads[order])
    cs_cm = jnp.asarray(cs_cm)
    sup_strip = np.asarray(
        jax.jit(
            lambda q, c: suppression_matrix(q, c, th, class_major=True)
        )(qs_cm, cs_cm)
    )
    sup_2d = np.asarray(
        jax.jit(lambda q, c: suppression_matrix(q, c, th))(qs_cm, cs_cm)
    )
    mism_strip = int((sup_strip != sup_2d).sum())
    results["suppression"]["strip_vs_2d_mismatches"] = mism_strip
    assert mism_strip == 0, results["suppression"]


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


def dota_like_candidates(rng, n, num_classes=15):
    """Candidate mix shaped like a dense DOTA scene at the shipped budget:
    imbalanced classes (vehicles dominate), heavy near-duplicate overlap
    (each object proposed ~4x with jitter, like neighboring FPN locations),
    a few exact score ties and zero-score-but-valid slots, and a tail of
    invalid padding."""
    base = n // 5
    quads = random_quads(base, rng)
    reps = [quads]
    for _ in range(3):
        reps.append(quads + rng.normal(0, 3, quads.shape).astype(np.float32))
    extra = random_quads(n - 4 * base, rng)
    quads = np.concatenate(reps + [extra], 0)
    # class imbalance: ~40% small-vehicle(4)/large-vehicle(5) (the merged
    # pair), rest spread over the other 13
    cls_obj = np.where(
        rng.rand(base) < 0.4,
        rng.choice([4, 5], base),
        rng.randint(0, num_classes, base),
    ).astype(np.int32)
    classes = np.concatenate(
        [cls_obj] * 4 + [rng.randint(0, num_classes, n - 4 * base)]
    ).astype(np.int32)
    scores = rng.uniform(0.05, 1.0, n).astype(np.float32)
    scores[: base // 8] = scores[base : base + base // 8]  # exact ties
    valid = rng.rand(n) > 0.05  # some masked slots like a padded decode
    scores[~valid] = 0.0
    zero_valid = valid & (rng.rand(n) < 0.002)
    scores[zero_valid] = 0.0  # zero-score valid candidates stay eligible
    return quads, scores, classes, valid


def check_nms_shipped_scale(rng, results):
    """Keep-set equality at the SHIPPED candidate budget (VERDICT r2 #4):
    n=4096 = TPU.NMS_MAX_CANDIDATES with a realistic 15-class mix, the
    class-4/5 merge, ties, and invalid padding — exercising the class-major
    tile skipping and int8 Jacobi mat-vec at full size.  Pallas keep ==
    XLA keep exactly; both >=0.995 vs the float64 host greedy."""
    import jax
    import jax.numpy as jnp

    from dafne_tpu.ops.nms import rotated_nms
    from dafne_tpu.utils import polyiou

    n, th = 4096, 0.1
    quads, scores, classes, valid = dota_like_candidates(rng, n)
    args = (
        jnp.asarray(quads), jnp.asarray(scores), jnp.asarray(classes),
        jnp.asarray(valid),
    )
    run = lambda impl: np.asarray(
        jax.jit(
            lambda q, s, c, v: rotated_nms(
                q, s, c, v, th, impl=impl, scores01=True
            )
        )(*args)
    )
    keep_pl = run("pallas")
    keep_x = run("xla")
    agreement_pl_xla = float((keep_pl == keep_x).mean())

    # float64 host greedy on the merged-class view
    merged = np.where(classes == 5, 4, classes)
    order = np.lexsort((-scores, merged))  # class-major, score desc
    iou = polyiou.iou_poly_matrix(
        quads.astype(np.float64), quads.astype(np.float64)
    )
    ref_keep = np.zeros(n, bool)
    alive = valid.copy()
    for i in order:
        if not alive[i]:
            continue
        ref_keep[i] = True
        kill = (iou[i] > th) & (merged == merged[i]) & alive
        kill[i] = False
        alive &= ~kill
    results["nms_shipped_scale"] = {
        "n": n, "kept_pallas": int(keep_pl.sum()), "kept_xla": int(keep_x.sum()),
        "kept_ref64": int(ref_keep.sum()),
        "pallas_xla_agreement": agreement_pl_xla,
        "ref_agreement": float((keep_pl == ref_keep).mean()),
        "ref_flips": int((keep_pl != ref_keep).sum()),
        "zero_score_valid_kept": int(
            (keep_pl & valid & (scores == 0.0)).sum()
        ),
    }
    assert agreement_pl_xla == 1.0, results["nms_shipped_scale"]
    # The one known on-chip deviation from the host-precision reference:
    # borderline-IoU keep decisions flip under f32 (0.9985 measured, 6/4096
    # flips; no mAP effect per the decode deviation study).  Gate at >=0.998
    # (VERDICT r3 #8) so a numerics regression can't hide behind "inherent
    # float noise".
    assert results["nms_shipped_scale"]["ref_agreement"] >= 0.998, (
        results["nms_shipped_scale"]
    )


def check_topk_exact(rng, results):
    """On-chip set equality of the radix-select exact top-k (ops/topk.py)
    vs lax.top_k at the two REAL decode shapes: per-level P3 (k=2000 of
    245760, batch 8) and the global cap (k=4096 of 9856, batch 16), with
    decode-realistic sparsity (mostly zeros), heavy ties, and a row with
    fewer positives than k.  CPU tests prove the math; this proves the
    TPU lowering (fusion choices differ on-chip)."""
    import jax
    import jax.numpy as jnp

    from dafne_tpu.ops.topk import exact_topk_set

    out = {}
    for name, b, n, k in (("p3", 8, 245760, 2000), ("global", 16, 9856, 4096)):
        s = rng.uniform(0, 1, (b, n)).astype(np.float32)
        s[s < 0.9] = 0.0  # thresholded-score sparsity
        s[1] = np.round(s[1] * 8) / 8  # heavy exact ties
        s[2] = 0.0
        s[2, :7] = 0.5  # fewer positives than k
        sj = jnp.asarray(s)
        v_ref, i_ref = jax.jit(lambda x: jax.lax.top_k(x, k))(sj)
        v_got, i_got = jax.jit(lambda x: exact_topk_set(x, k))(sj)
        i_ref, i_got = np.asarray(i_ref), np.asarray(i_got)
        v_ref, v_got = np.asarray(v_ref), np.asarray(v_got)
        set_mism = sum(
            len(set(i_ref[r]) ^ set(i_got[r])) for r in range(b)
        )
        val_mism = int(
            (np.sort(v_ref, axis=1) != np.sort(v_got, axis=1)).sum()
        )
        out[name] = {
            "b": b, "n": n, "k": k,
            "index_set_mismatches": set_mism,
            "value_multiset_mismatches": val_mism,
        }
        assert set_mism == 0 and val_mism == 0, out
    results["topk_exact"] = out


def check_nms_grouped(rng, results):
    """rotated_nms_grouped on-chip (VERDICT r2 #4): Pallas == XLA keep-set
    at n=4096/group_k=512, and exact equality with global rotated_nms in
    the regime where no group overflows its budget."""
    import jax
    import jax.numpy as jnp

    from dafne_tpu.ops.nms import rotated_nms, rotated_nms_grouped

    n, th = 4096, 0.1
    quads, scores, classes, valid = dota_like_candidates(rng, n)
    args = (
        jnp.asarray(quads), jnp.asarray(scores), jnp.asarray(classes),
        jnp.asarray(valid),
    )
    rung = lambda impl: np.asarray(
        jax.jit(
            lambda q, s, c, v: rotated_nms_grouped(
                q, s, c, v, th, num_classes=15, group_k=512, impl=impl
            )
        )(*args)
    )
    keep_gp = rung("pallas")
    keep_gx = rung("xla")
    agreement = float((keep_gp == keep_gx).mean())

    # equality-with-global regime: a smaller mix where every merged class
    # group holds well under 512 candidates
    q2, s2, c2, v2 = dota_like_candidates(rng, 1024)
    args2 = (jnp.asarray(q2), jnp.asarray(s2), jnp.asarray(c2), jnp.asarray(v2))
    kg = np.asarray(
        jax.jit(
            lambda q, s, c, v: rotated_nms_grouped(
                q, s, c, v, th, num_classes=15, group_k=512, impl="pallas"
            )
        )(*args2)
    )
    kglob = np.asarray(
        jax.jit(
            lambda q, s, c, v: rotated_nms(
                q, s, c, v, th, impl="pallas", scores01=True
            )
        )(*args2)
    )
    results["nms_grouped"] = {
        "n": n, "group_k": 512,
        "kept_pallas": int(keep_gp.sum()), "kept_xla": int(keep_gx.sum()),
        "pallas_xla_agreement": agreement,
        "vs_global_n1024_agreement": float((kg == kglob).mean()),
    }
    assert agreement == 1.0, results["nms_grouped"]
    assert results["nms_grouped"]["vs_global_n1024_agreement"] == 1.0, (
        results["nms_grouped"]
    )


def main():
    import jax

    t0 = time.perf_counter()
    rng = np.random.RandomState(0)
    results = {"device": str(jax.devices()[0]), "platform": jax.devices()[0].platform}
    check_suppression(rng, results)
    check_assign(rng, results)
    check_nms_end_to_end(rng, results)
    check_nms_shipped_scale(rng, results)
    check_topk_exact(rng, results)
    check_nms_grouped(rng, results)
    results["elapsed_s"] = round(time.perf_counter() - t0, 1)
    results["ok"] = True
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "VERIFY_TPU.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
