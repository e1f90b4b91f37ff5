"""Static-shape decoding of dense head outputs into detections.

Re-designs the reference decode (dafne/modeling/dafne/dafne_outputs.py:
733-925), which leans on dynamic shapes (`nonzero`, boolean gathers,
data-dependent topk sizes, :824-858), as fixed-size top-k + validity masks —
the TPU formulation (SURVEY.md §7 "hard parts" #2):

  per level:   sigmoid(cls) [, sqrt(cls*ctr)] -> threshold mask
               -> top-k over the flattened (location x class) axis
               -> gather corners = location + stride * offsets (:860-872)
               -> canonical corner sort (:874-876)
  all levels:  concat -> global score cap to NMS_MAX_CANDIDATES
               -> exact rotated NMS -> top `post_nms_topk` by score (:907-925)

Every output is a fixed-size array with a validity mask; "fewer detections"
means more masked slots, never a different shape.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from dafne_tpu.geometry.quads import enclosing_hbox, sort_quadrilateral
from dafne_tpu.ops.nms import rotated_nms_batched, rotated_nms_grouped_batched
from dafne_tpu.ops.topk import exact_topk_set


@dataclasses.dataclass(frozen=True)
class DecodeSpec:
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    num_classes: int = 15
    pre_nms_thresh: float = 0.05
    pre_nms_topk: int = 2000
    post_nms_topk: int = 1000
    nms_threshold: float = 0.1
    thresh_with_ctr: bool = False
    has_centerness: bool = True
    ctr_in_score: bool = True
    sort_corners: bool = True
    stride_norm: bool = True
    nms_max_candidates: int = 2048
    nms_group_candidates: int = 0  # >0: per-class-group NMS (see ops/nms.py
    # rotated_nms_grouped); 0 = global-cap path via nms_max_candidates
    class_merge: Tuple[Tuple[int, int], ...] = ((5, 4),)
    approx_topk: bool = False  # True: lax.approx_max_k for the top-k stages;
    # default is EXACT top-k (ops/topk.py radix select + scatter-free
    # compaction): +2.9% full-program eval cost vs approx — under the <5%
    # bar, so the reference-exact candidate set is the default
    skip_nms: bool = False  # DIAGNOSTIC ONLY (bench.py NMS-share attribution):
    # keep = valid, i.e. the identical program minus suppression; never a
    # serving mode

    @classmethod
    def from_config(cls, cfg, train: bool = False) -> "DecodeSpec":
        d = cfg.MODEL.DAFNE
        return cls(
            strides=tuple(d.FPN_STRIDES),
            num_classes=d.NUM_CLASSES,
            pre_nms_thresh=d.INFERENCE_TH_TRAIN if train else d.INFERENCE_TH_TEST,
            pre_nms_topk=d.PRE_NMS_TOPK_TRAIN if train else d.PRE_NMS_TOPK_TEST,
            post_nms_topk=d.POST_NMS_TOPK_TRAIN if train else d.POST_NMS_TOPK_TEST,
            nms_threshold=d.NMS_TH,
            thresh_with_ctr=d.THRESH_WITH_CTR,
            has_centerness=d.CENTERNESS != "none",
            ctr_in_score=d.CENTERNESS_USE_IN_SCORE,
            sort_corners=d.SORT_CORNERS,
            stride_norm=d.ENABLE_FPN_STRIDE_NORM,
            nms_max_candidates=cfg.TPU.NMS_MAX_CANDIDATES,
            nms_group_candidates=cfg.TPU.get("NMS_GROUP_CANDIDATES", 0),
            approx_topk=cfg.TPU.get("DECODE_APPROX_TOPK", False),
        )


def decode_single_level(
    logits: jnp.ndarray,  # [N, H, W, C]
    corners: jnp.ndarray,  # [N, H, W, 8]
    ctrness: jnp.ndarray,  # [N, H, W, 1]
    locations: jnp.ndarray,  # [H*W, 2]
    stride: int,
    spec: DecodeSpec,
) -> Dict[str, jnp.ndarray]:
    """Fixed-size top-k decode of one FPN level -> [N, k] candidate dict."""
    n = logits.shape[0]
    c = logits.shape[-1]
    hw = logits.shape[1] * logits.shape[2]
    k = min(spec.pre_nms_topk, hw * c)

    cls_prob = jax.nn.sigmoid(logits.reshape(n, hw, c))
    ctr_prob = ctrness.reshape(n, hw)
    if spec.has_centerness:
        ctr_prob = jax.nn.sigmoid(ctr_prob)

    # ctr is ALWAYS mixed into the NMS score when centerness is enabled
    # (dafne_outputs.py:819-829); CENTERNESS_USE_IN_SCORE=False only
    # un-mixes the REPORTED score after NMS (dota_evaluation.py:134-137),
    # handled in decode_detections.
    if spec.has_centerness and spec.thresh_with_ctr:
        cls_prob = jnp.sqrt(cls_prob * ctr_prob[:, :, None])
    candidate = cls_prob > spec.pre_nms_thresh
    if spec.has_centerness and not spec.thresh_with_ctr:
        cls_prob = jnp.sqrt(cls_prob * ctr_prob[:, :, None])

    flat_scores = jnp.where(candidate, cls_prob, 0.0).reshape(n, hw * c)
    if spec.approx_topk and hw * c > 4 * k:
        # opt-in partitioned top-k (recall >= 0.99 of the true set; the
        # post-NMS top-1000 cushions the tail) via TPU.DECODE_APPROX_TOPK.
        top_scores, top_idx = jax.lax.approx_max_k(
            flat_scores, k, recall_target=0.99
        )
    elif hw * c > 4 * k:
        # DEFAULT: exact reference top-k set WITHOUT the degenerate variadic
        # sort — radix-select + scatter-free compaction (ops/topk.py),
        # ~approx_max_k cost at these shapes; candidate order is
        # index-ascending, which decode never depends on (NMS re-sorts
        # internally)
        top_scores, top_idx = exact_topk_set(flat_scores, k)
    else:
        top_scores, top_idx = jax.lax.top_k(flat_scores, k)  # [N, k]
    loc_idx = top_idx // c
    cls_idx = (top_idx % c).astype(jnp.int32)
    valid = top_scores > 0.0

    reg = corners.reshape(n, hw, 8)
    sel_reg = jnp.take_along_axis(reg, loc_idx[:, :, None], axis=1)  # [N, k, 8]
    if spec.stride_norm:
        sel_reg = sel_reg * stride
    # locations recovered arithmetically from the flat index (cheaper than a
    # constant-table gather, and keeps the 170k-location table out of the
    # program): x = col*stride + stride//2, y = row*stride + stride//2
    w = logits.shape[2]
    lx = (loc_idx % w).astype(jnp.float32) * stride + stride // 2
    ly = (loc_idx // w).astype(jnp.float32) * stride + stride // 2
    sel_loc = jnp.stack([lx, ly], axis=-1)  # [N, k, 2]
    # NOTE: corner sorting is deferred to decode_detections, after the
    # global candidate cap — sorting is per-candidate, so commuting it past
    # the score top-k is exact while doing ~40% of the work (the per-level
    # survivors total ~10k vs the 4096 cap).
    polys = sel_reg + jnp.tile(sel_loc, (1, 1, 4))

    sel_ctr = jnp.take_along_axis(ctr_prob, loc_idx, axis=1)
    return {
        "corners": polys,
        "scores": top_scores,
        "classes": cls_idx,
        "centerness": sel_ctr,
        "locations": sel_loc,
        "valid": valid,
    }


def decode_detections(
    head_out: Dict[str, List[jnp.ndarray]],
    locations: List[jnp.ndarray],
    spec: DecodeSpec,
    scale_xy: Optional[jnp.ndarray] = None,  # [N, 2] resized->original scale
) -> Dict[str, jnp.ndarray]:
    """Full decode: per-level top-k -> concat -> NMS -> post-NMS top-k.

    Returns fixed [N, post_nms_topk] arrays: corners [.., 8] (in original
    image coordinates if scale_xy given), hboxes [.., 4], scores, classes,
    centerness, valid.
    """
    per_level = [
        decode_single_level(
            head_out["logits"][i],
            head_out["corners"][i],
            head_out["ctrness"][i],
            locations[i],
            spec.strides[i],
            spec,
        )
        for i in range(len(locations))
    ]
    cand = {
        key: jnp.concatenate([p[key] for p in per_level], axis=1)
        for key in per_level[0]
    }

    # Cap the NMS input with a global score top-k (static size).
    # nms_max_candidates <= 0 means reference-faithful "no global cap": every
    # per-level top-k survivor enters NMS (the reference feeds all levels'
    # candidates, dafne_outputs.py:785-788,907-912).
    total = cand["scores"].shape[1]
    masked = jnp.where(cand["valid"], cand["scores"], 0.0)
    if spec.nms_group_candidates > 0:
        # per-class-group NMS over ALL per-level survivors: no global cap
        # (a global score cap can starve classes and drop detections on
        # dense scenes — measured in tools/decode_deviation_study.py).
        # No global top-k either: a full ~10k sort is the degenerate TPU
        # case and buys nothing — the grouped NMS does its own per-group
        # top-k and the post-NMS top-k orders the output.
        m = total
        corners, classes = cand["corners"], cand["classes"]
        ctr, locs, scores = cand["centerness"], cand["locations"], masked
    else:
        m = min(spec.nms_max_candidates, total) if spec.nms_max_candidates > 0 else total
        if spec.approx_topk and m < total and total > 2048:
            # opt-in approx_max_k (recall 0.99); its <1% recall loss sits in
            # the tail the post-NMS top-1000 cushions (measured mAP-neutral
            # in the study)
            top_scores, top_idx = jax.lax.approx_max_k(masked, m, recall_target=0.99)
        elif m < total and total > 2048:
            # DEFAULT: exact set selection; lax.top_k with k ~ n/2 would
            # degenerate into a full variadic sort (~20 ms/batch at m=4096
            # of 9856), exact_topk_set does it in ~2 ms
            top_scores, top_idx = exact_topk_set(masked, m)
        else:
            top_scores, top_idx = jax.lax.top_k(masked, m)
        take = lambda a: jnp.take_along_axis(
            a, top_idx.reshape(top_idx.shape + (1,) * (a.ndim - 2)), axis=1
        )
        corners = take(cand["corners"])
        classes = jnp.take_along_axis(cand["classes"], top_idx, axis=1)
        ctr = jnp.take_along_axis(cand["centerness"], top_idx, axis=1)
        locs = take(cand["locations"])
        scores = top_scores
    valid = scores > 0.0
    # Canonical corner sort, deferred from decode_single_level to after the
    # cap (still before NMS, preserving the reference's sort-then-NMS order,
    # dafne_outputs.py:874-876 — NMS IoU needs proper polygon vertex order).
    if spec.sort_corners:
        corners = sort_quadrilateral(corners)

    if spec.skip_nms:
        keep = valid
    elif spec.nms_group_candidates > 0:
        keep = rotated_nms_grouped_batched(
            corners, scores, classes, valid, spec.nms_threshold,
            spec.class_merge, spec.num_classes,
            group_k=spec.nms_group_candidates,
            min_total=max(spec.nms_max_candidates, spec.post_nms_topk),
        )
    else:
        keep = rotated_nms_batched(
            corners, scores, classes, valid, spec.nms_threshold,
            spec.class_merge, scores01=True,  # decode scores = sqrt(cls*ctr)
        )

    # Post-NMS top-k over all classes (dafne_outputs.py:916-923)
    k_out = min(spec.post_nms_topk, m)
    out_scores, out_idx = jax.lax.top_k(jnp.where(keep, scores, 0.0), k_out)
    take_out = lambda a: jnp.take_along_axis(
        a, out_idx.reshape(out_idx.shape + (1,) * (a.ndim - 2)), axis=1
    )
    out = {
        "corners": take_out(corners),
        "scores": out_scores,
        "classes": jnp.take_along_axis(classes, out_idx, axis=1),
        "centerness": jnp.take_along_axis(ctr, out_idx, axis=1),
        "locations": take_out(locs),
        "valid": out_scores > 0.0,
    }
    if spec.has_centerness and not spec.ctr_in_score:
        # un-mix centerness from the reported score: NMS ordering used
        # sqrt(cls*ctr) like the reference always does; the evaluator-facing
        # score reverts to the pure class confidence s^2/ctr (= cls)
        # (dota_evaluation.py:134-137).
        out["scores"] = jnp.where(
            out["valid"],
            out["scores"] ** 2 / jnp.maximum(out["centerness"], 1e-12),
            0.0,
        )
    if scale_xy is not None:
        s = jnp.tile(scale_xy[:, None, :], (1, 1, 4))  # [N,1,8]
        out["corners"] = out["corners"] * s
        out["locations"] = out["locations"] * scale_xy[:, None, :]
    out["hboxes"] = enclosing_hbox(out["corners"])
    return out
