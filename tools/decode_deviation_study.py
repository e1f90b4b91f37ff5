#!/usr/bin/env python3
"""Quantify decode deviations vs the reference on synthetic dense scenes.

The reference decode (dafne/modeling/dafne/dafne_outputs.py:824-858) takes
up to PRE_NMS_TOPK candidates PER LEVEL and feeds ALL levels' survivors into
NMS; this framework's static decode additionally (a) may cap the NMS input
with a global score top-k (TPU.NMS_MAX_CANDIDATES) and (b) may use
lax.approx_max_k for the per-level top-k (TPU.DECODE_APPROX_TOPK).

This study builds dense DOTA-like scenes (small-vehicle swarms on P3 +
medium objects on P4, more above-threshold candidates than any cap) and
measures the mAP cost of each deviation, reported as a table for PARITY.md.

Run: DAFNE_PLATFORM=cpu python tools/decode_deviation_study.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_scene(rng, img=1024, n_small=350, n_medium=350, n_noise=(3000, 1000),
               n_classes=15):
    """Synthetic head outputs for one dense image.

    Objects get a 5x5 blob of above-threshold logits around their center
    location (like a trained model), with exact corner regression at every
    blob location; per-object peak confidence varies widely so score-based
    truncation hits real objects.  ~25 candidates/object + noise singletons
    puts the above-threshold count well past every cap while the object
    count (700) stays under POST_NMS_TOPK (1000), so any recall the caps
    cost is visible in mAP rather than masked by the output budget.
    """
    strides = (8, 16, 32, 64, 128)
    sizes = [(img // s, img // s) for s in strides]
    logits = [np.full((1, h, w, n_classes), -9.0, np.float32) for h, w in sizes]
    corners = [np.zeros((1, h, w, 8), np.float32) for h, w in sizes]
    ctrness = [np.full((1, h, w, 1), -9.0, np.float32) for h, w in sizes]

    gts = []  # (cls, corners8)

    def add_objects(level, n, lo, hi):
        s = strides[level]
        h, w = sizes[level]
        for _ in range(n):
            size = rng.uniform(lo, hi)
            cx = rng.uniform(size, img - size)
            cy = rng.uniform(size, img - size)
            ang = rng.uniform(0, np.pi)
            c, sn = np.cos(ang), np.sin(ang)
            dx = np.array([-1, 1, 1, -1]) * size / 2
            dy = np.array([-1, -1, 1, 1]) * size * rng.uniform(0.4, 0.9) / 2
            xs = cx + dx * c - dy * sn
            ys = cy + dx * sn + dy * c
            quad = np.stack([xs, ys], 1).reshape(8)
            cls = int(rng.choice([4, 4, 4, 5, 3, 1]))  # vehicle-heavy mix
            gts.append((cls, quad))
            gx, gy = int(cx // s), int(cy // s)
            peak = rng.uniform(-2.0, 3.5)  # sigmoid in [0.12, 0.97]
            for oy in (-2, -1, 0, 1, 2):
                for ox in (-2, -1, 0, 1, 2):
                    yy, xx = gy + oy, gx + ox
                    if not (0 <= yy < h and 0 <= xx < w):
                        continue
                    drop = 0.7 * (abs(ox) + abs(oy))
                    logits[level][0, yy, xx, cls] = max(
                        logits[level][0, yy, xx, cls], peak - drop
                    )
                    ctrness[level][0, yy, xx, 0] = max(
                        ctrness[level][0, yy, xx, 0], peak - drop + 1.0
                    )
                    loc = np.array([xx * s + s // 2, yy * s + s // 2])
                    corners[level][0, yy, xx] = (quad - np.tile(loc, 4)) / s

    add_objects(0, n_small, 10, 28)   # P3 swarm
    add_objects(1, n_medium, 40, 100)  # P4

    # above-threshold background noise singletons (false-positive fodder;
    # also makes approx-top-k selection differences visible)
    for level in (0, 1):
        s = strides[level]
        h, w = sizes[level]
        n_noise_lvl = n_noise[level]
        ys = rng.randint(0, h, n_noise_lvl)
        xs = rng.randint(0, w, n_noise_lvl)
        cs = rng.randint(0, n_classes, n_noise_lvl)
        vals = rng.uniform(-2.9, -0.5, n_noise_lvl).astype(np.float32)
        cur = logits[level][0, ys, xs, cs]
        logits[level][0, ys, xs, cs] = np.maximum(cur, vals)
        ctrness[level][0, ys, xs, 0] = np.maximum(
            ctrness[level][0, ys, xs, 0], vals
        )
        # noise locations regress a plausible small box around themselves
        locs = np.stack([xs * s + s // 2, ys * s + s // 2], 1).astype(np.float32)
        nq = (
            np.tile(locs, (1, 4))
            + np.asarray([-8, -8, 8, -8, 8, 8, -8, 8], np.float32)
        )
        has_obj = np.abs(corners[level][0, ys, xs]).sum(-1) > 0
        corners[level][0, ys[~has_obj], xs[~has_obj]] = (
            (nq - np.tile(locs, (1, 4))) / s
        )[~has_obj]
    return strides, logits, corners, ctrness, gts


def run_decode(strides, logits, corners, ctrness, cap, approx, group_k=0):
    import jax.numpy as jnp

    from dafne_tpu.models.head import compute_locations
    from dafne_tpu.ops.postprocess import DecodeSpec, decode_detections

    spec = DecodeSpec(
        strides=strides,
        num_classes=15,
        pre_nms_thresh=0.05,
        pre_nms_topk=2000,
        post_nms_topk=1000,
        nms_threshold=0.1,
        nms_max_candidates=cap,
        nms_group_candidates=group_k,
        approx_topk=approx,
    )
    locs = [
        compute_locations(l.shape[1], l.shape[2], s)
        for l, s in zip(logits, strides)
    ]
    head_out = {
        "logits": [jnp.asarray(x) for x in logits],
        "corners": [jnp.asarray(x) for x in corners],
        "ctrness": [jnp.asarray(x) for x in ctrness],
    }
    t0 = time.perf_counter()
    out = decode_detections(head_out, locs, spec)
    out = {k: np.asarray(v) for k, v in out.items()}
    dt = time.perf_counter() - t0
    m = out["valid"][0]
    return (
        out["corners"][0][m],
        out["scores"][0][m],
        out["classes"][0][m],
        dt,
    )


def scene_map(det_corners, det_scores, det_classes, gts):
    from dafne_tpu.evaluation.voc_eval import eval_class

    aps = []
    classes = sorted({c for c, _ in gts})
    for c in classes:
        gt_c = np.asarray([q for cc, q in gts if cc == c], np.float64)
        if not len(gt_c):
            continue
        m = det_classes == c
        ids = ["im0"] * int(m.sum())
        _, _, ap, _ = eval_class(
            ids,
            det_scores[m],
            det_corners[m],
            {"im0": (gt_c, np.zeros(len(gt_c), bool))},
            ovthresh=0.5,
        )
        aps.append(ap)
    return 100.0 * float(np.mean(aps))


def main():
    from dafne_tpu.utils.platform import pin_platform_from_env
    pin_platform_from_env()

    rng = np.random.RandomState(0)
    n_scenes = int(os.environ.get("SCENES", "3"))
    n_small = int(os.environ.get("N_SMALL", "350"))
    n_medium = int(os.environ.get("N_MEDIUM", "350"))
    n_noise = (
        int(os.environ.get("NOISE_P3", "3000")),
        int(os.environ.get("NOISE_P4", "1000")),
    )
    scenes = [
        make_scene(rng, n_small=n_small, n_medium=n_medium, n_noise=n_noise)
        for _ in range(n_scenes)
    ]

    configs = [
        ("cap=2048  approx", 2048, True, 0),
        ("cap=4096  approx", 4096, True, 0),
        ("grouped K=512   ", 4096, True, 512),
        ("uncapped  approx", 0, True, 0),
        ("uncapped  exact ", 0, False, 0),
    ]
    print(f"{n_scenes} scenes, {n_small + n_medium} objects/scene, "
          f"noise {n_noise}, thresh 0.05, pre_topk 2000/level, post_topk 1000")
    print(f"{'config':<18} {'mAP@0.5':>8} {'dets/scene':>10}")
    for name, cap, approx, group_k in configs:
        maps, ndets = [], []
        for strides, logits, corners, ctrness, gts in scenes:
            dc, ds, dcl, _ = run_decode(
                strides, logits, corners, ctrness, cap, approx, group_k
            )
            maps.append(scene_map(dc, ds, dcl, gts))
            ndets.append(len(ds))
        print(f"{name:<18} {np.mean(maps):>8.2f} {np.mean(ndets):>10.0f}")


if __name__ == "__main__":
    main()
