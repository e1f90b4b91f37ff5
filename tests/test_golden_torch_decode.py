"""Golden test: the WHOLE static decode vs a torch re-statement of the
reference's dynamic-shape decode.

The per-op golden suite (test_golden_torch.py) covers assignment/losses/
corner-sort; the deviation study quantifies the static-shape caps; this
test pins the remaining glue — threshold semantics, sqrt(cls*ctr) mixing
order, per-level top-k, location+offset corner assembly, stride
denormalization, corner sort placement, class-aware NMS with the DOTA
4/5 merge, and the post-NMS kthvalue cut — by re-stating the reference
decode end-to-end in torch/NumPy (dafne_outputs.py:733-925, nms.py:37-93)
and comparing detection sets with `decode_detections`.

Oracles: the REFERENCE's own sort_corners.py (imported directly) and its
compiled polyiou.cpp drive the re-statement's corner sort and NMS IoU
(f64), via the helpers in test_reference_oracles.py.  Geometry is
constructed so no IoU pair sits near the NMS threshold (clusters overlap
heavily, distinct objects are disjoint) — f32-vs-f64 flips cannot occur.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from test_reference_oracles import (  # noqa: E402
    REF_ROOT,
    build_ref_iou_batch,
    load_ref_sort_module,
)

from dafne_tpu.ops.postprocess import DecodeSpec, decode_detections  # noqa: E402

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_ROOT), reason="reference tree not present"
)

STRIDES = (8, 16)
HW = ((32, 32), (16, 16))
C = 8  # enough classes to exercise the 4/5 vehicle merge
THRESH = 0.05
NMS_TH = 0.1


def _location(loc_idx, level):
    h, w = HW[level]
    s = STRIDES[level]
    row, col = divmod(loc_idx, w)
    return col * s + s // 2, row * s + s // 2


def _make_head_outputs(rng, n_img, n_obj):
    """Synthesize dense head outputs whose above-threshold candidates form
    well-separated objects, each smeared over several locations/levels and
    sometimes several classes (incl. a 4/5 vehicle pair)."""
    logits = [
        np.full((n_img, h, w, C), -10.0, np.float32) for (h, w) in HW
    ]
    corners = [
        rng.uniform(-0.3, 0.3, (n_img, h, w, 8)).astype(np.float32)
        for (h, w) in HW
    ]
    ctrness = [
        rng.uniform(-1.5, 1.5, (n_img, h, w, 1)).astype(np.float32)
        for (h, w) in HW
    ]
    # object centers on a coarse grid -> pairwise disjoint boxes
    cells = [(cx, cy) for cx in range(3) for cy in range(3)]
    rng.shuffle(cells)
    for i in range(n_img):
        for o in range(n_obj):
            cx = cells[o][0] * 90 + 40
            cy = cells[o][1] * 90 + 40
            sz = rng.uniform(22, 38)
            ang = rng.uniform(0, np.pi)
            dx = np.array([-sz, sz, sz, -sz]) / 2
            dy = np.array([-sz * 0.6, -sz * 0.6, sz * 0.6, sz * 0.6]) / 2
            quad = np.stack(
                [
                    cx + dx * np.cos(ang) - dy * np.sin(ang),
                    cy + dx * np.sin(ang) + dy * np.cos(ang),
                ],
                axis=1,
            ).reshape(8)
            classes = [int(rng.integers(0, C))]
            if o == 0:
                classes = [4, 5]  # must merge in NMS
            elif o == 1 and n_obj > 1:
                classes.append(int(rng.integers(0, C)))  # multi-class loc
            for _ in range(int(rng.integers(3, 7))):
                level = int(rng.integers(0, len(HW)))
                h, w = HW[level]
                s = STRIDES[level]
                col = int(np.clip(cx // s + rng.integers(-1, 2), 0, w - 1))
                row = int(np.clip(cy // s + rng.integers(-1, 2), 0, h - 1))
                lx, ly = col * s + s // 2, row * s + s // 2
                reg = (quad - np.tile([lx, ly], 4)) / s
                # small per-candidate jitter: near-duplicates, IoU >= ~0.8
                reg = reg + rng.uniform(-0.05, 0.05, 8)
                corners[level][i, row, col] = reg.astype(np.float32)
                for cls in classes:
                    logits[level][i, row, col, cls] = rng.uniform(0.5, 3.0)
                ctrness[level][i, row, col, 0] = rng.uniform(0.0, 2.0)
    return logits, corners, ctrness


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _reference_decode(
    logits, corners, ctrness, ref_sort, ref_iou, pre_nms_topk, post_nms_topk,
    thresh_with_ctr=False,
):
    """Torch/NumPy re-statement of the reference decode (see module doc)."""
    import torch

    n_img = logits[0].shape[0]
    per_image = [[] for _ in range(n_img)]  # (cls, score, poly) tuples
    for level in range(len(HW)):
        s = STRIDES[level]
        h, w = HW[level]
        cls_pred = _sigmoid(logits[level].reshape(n_img, h * w, C))
        ctr = _sigmoid(ctrness[level].reshape(n_img, h * w))
        reg = corners[level].reshape(n_img, h * w, 8) * s  # stride denorm
        if thresh_with_ctr:
            cls_pred = np.sqrt(cls_pred * ctr[:, :, None])
        candidate = cls_pred > THRESH
        pre_top_n = np.minimum(
            candidate.reshape(n_img, -1).sum(1), pre_nms_topk
        )
        if not thresh_with_ctr:
            cls_pred = np.sqrt(cls_pred * ctr[:, :, None])
        for i in range(n_img):
            locs, clss = np.nonzero(candidate[i])
            scores = cls_pred[i][candidate[i]].astype(np.float32)
            if len(locs) > pre_top_n[i]:
                # torch.topk semantics on the candidate-order array
                top = torch.topk(
                    torch.from_numpy(scores), int(pre_top_n[i]), sorted=False
                ).indices.numpy()
                locs, clss, scores = locs[top], clss[top], scores[top]
            for loc, cls, sc in zip(locs, clss, scores):
                lx, ly = _location(loc, level)
                poly = reg[i, loc] + np.tile([lx, ly], 4)
                per_image[i].append((int(cls), float(sc), poly))

    results = []
    for dets in per_image:
        if not dets:
            results.append([])
            continue
        # canonical corner sort with the REFERENCE's own sort_quadrilateral
        import torch

        polys = torch.tensor(
            np.stack([d[2] for d in dets]), dtype=torch.float32
        )
        polys = ref_sort.sort_quadrilateral(polys).numpy()
        scores = np.array([d[1] for d in dets], np.float32)
        clss = np.array([d[0] for d in dets], np.int64)
        merged = np.where(clss == 5, 4, clss)  # nms.py:77-79
        order = np.argsort(-scores, kind="stable")
        alive = np.ones(len(dets), bool)
        keep = []
        for j in order:
            if not alive[j]:
                continue
            keep.append(j)
            same = (merged == merged[j]) & alive
            same[j] = False
            if same.any():
                idx = np.nonzero(same)[0]
                ious = ref_iou(
                    np.repeat(polys[j][None], len(idx), 0), polys[idx]
                )
                alive[idx[ious > NMS_TH]] = False
        keep = np.asarray(keep)
        if len(keep) > post_nms_topk > 0:
            kth = np.partition(scores[keep], len(keep) - post_nms_topk)[
                len(keep) - post_nms_topk
            ]
            keep = keep[scores[keep] >= kth]
        results.append(
            [(int(clss[j]), float(scores[j]), polys[j]) for j in keep]
        )
    return results


def _ours_decode(logits, corners, ctrness, spec):
    head_out = {
        "logits": [jnp.asarray(x) for x in logits],
        "corners": [jnp.asarray(x) for x in corners],
        "ctrness": [jnp.asarray(x) for x in ctrness],
    }
    locations = [None] * len(HW)  # decode derives locations arithmetically
    out = decode_detections(head_out, locations, spec)
    out = {k: np.asarray(v) for k, v in out.items()}
    results = []
    for i in range(out["scores"].shape[0]):
        v = out["valid"][i].astype(bool)
        results.append(
            [
                (int(c), float(s), p)
                for c, s, p in zip(
                    out["classes"][i][v], out["scores"][i][v],
                    out["corners"][i][v],
                )
            ]
        )
    return results


def _assert_same_detections(ref, got, score_tol=2e-5, poly_tol=2e-3):
    assert len(ref) == len(got)
    for r_dets, g_dets in zip(ref, got):
        assert len(r_dets) == len(g_dets), (len(r_dets), len(g_dets))
        key = lambda d: (d[0], -d[1], tuple(np.round(d[2], 2)))
        for rd, gd in zip(sorted(r_dets, key=key), sorted(g_dets, key=key)):
            assert rd[0] == gd[0]
            assert abs(rd[1] - gd[1]) < score_tol, (rd[1], gd[1])
            np.testing.assert_allclose(rd[2], gd[2], atol=poly_tol)


@pytest.fixture(scope="module")
def oracles():
    pytest.importorskip("torch")
    iou = build_ref_iou_batch()
    srt = load_ref_sort_module()
    if iou is None or srt is None:
        pytest.skip("reference artifacts not present")
    return iou, srt


def _run_case(oracles, seed, n_obj, pre_nms_topk, post_nms_topk,
              thresh_with_ctr=False, nms_max_candidates=0):
    ref_iou, ref_sort = oracles
    rng = np.random.default_rng(seed)
    logits, corners, ctrness = _make_head_outputs(rng, 2, n_obj)
    ref = _reference_decode(
        logits, corners, ctrness, ref_sort, ref_iou,
        pre_nms_topk, post_nms_topk, thresh_with_ctr,
    )
    spec = DecodeSpec(
        strides=STRIDES,
        num_classes=C,
        pre_nms_thresh=THRESH,
        pre_nms_topk=pre_nms_topk,
        post_nms_topk=post_nms_topk,
        nms_threshold=NMS_TH,
        thresh_with_ctr=thresh_with_ctr,
        nms_max_candidates=nms_max_candidates,
        approx_topk=False,
    )
    got = _ours_decode(logits, corners, ctrness, spec)
    assert any(len(r) > 0 for r in ref), "vacuous case: no detections"
    _assert_same_detections(ref, got)


def test_decode_matches_reference_restatement(oracles):
    _run_case(oracles, seed=0, n_obj=6, pre_nms_topk=2000, post_nms_topk=1000)


def test_decode_matches_with_pre_topk_binding(oracles):
    # per-level candidate count exceeds a tiny pre-NMS top-k: exercises the
    # per-level torch.topk vs exact_topk_set equivalence inside the decode
    _run_case(oracles, seed=1, n_obj=8, pre_nms_topk=12, post_nms_topk=1000)


def test_decode_matches_with_post_topk_binding(oracles):
    # post-NMS survivor count exceeds post_nms_topk: the reference cuts by
    # kthvalue (>= kth score), ours by exact top-k — identical on the
    # distinct scores random heads produce (the documented tie deviation)
    _run_case(oracles, seed=2, n_obj=9, pre_nms_topk=2000, post_nms_topk=4)


def test_decode_matches_thresh_with_ctr(oracles):
    _run_case(
        oracles, seed=3, n_obj=6, pre_nms_topk=2000, post_nms_topk=1000,
        thresh_with_ctr=True,
    )


def test_decode_matches_at_shipped_cap(oracles):
    # the shipped NMS_MAX_CANDIDATES=4096 cap must not bite at these
    # candidate counts: same detections as the uncapped reference
    _run_case(
        oracles, seed=4, n_obj=6, pre_nms_topk=2000, post_nms_topk=1000,
        nms_max_candidates=4096,
    )
