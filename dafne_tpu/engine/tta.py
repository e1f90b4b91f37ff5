"""Test-time augmentation (TTA) inference.

Re-design of OneStageRCNNWithTTA + DotaDatasetMapperTTA
(dafne/modeling/tta.py:29-268) for static TPU shapes:

- the aug set is {TEST.AUG.MIN_SIZES multi-scale resize} x {identity, hflip,
  vflip or ROTATION_ANGLES x hflip} (tta.py:48-135)
- every augmented copy is an AffineAug rendered onto the smallest canvas of
  a small SIZE-BUCKET ladder; one compiled eval step per bucket (lazy).
  This keeps XLA shapes static without paying max-canvas FLOPs for every
  copy (a 450px copy on the default 4000px canvas would run ~80x the
  necessary conv work).  The per-bucket batch size scales inversely with
  canvas area so big canvases can't OOM.  The reference instead
  mini-batches ragged copies through the model 3 at a time (tta.py:173-197)
- predicted corners are mapped back with the exact inverse affine
  (tta.py:236-262 equivalent) and all copies are merged with the standard
  rotated NMS + post-topk (select_over_all_levels reuse, tta.py:264-268)
"""

from __future__ import annotations

import logging
import os
import time
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from dafne_tpu.data import get_dataset
from dafne_tpu.data import transforms as T
from dafne_tpu.data.mapper import pad_target_hw, read_image
from dafne_tpu.engine.trainer import make_eval_step
from dafne_tpu.evaluation import build_evaluator
from dafne_tpu.ops.device_warp import (
    device_warp,
    separable_warp_params,
    stack_warps,
)
from dafne_tpu.utils.polyiou import poly_nms

logger = logging.getLogger("dafne_tpu")


def build_tta_augs(cfg, w: int, h: int) -> List[T.AffineAug]:
    """The reference aug set (tta.py:48-135)."""
    augs = []
    max_size = cfg.TEST.AUG.MAX_SIZE
    rotations = list(cfg.TEST.AUG.ROTATION_ANGLES)
    for min_size in cfg.TEST.AUG.MIN_SIZES:
        base = T.shortest_edge_resize(w, h, int(min_size), max_size)
        variants = [base]
        if rotations:
            for ang in rotations:
                rot = T.rotation(w, h, float(ang)).compose(base)
                variants.append(rot)
                if cfg.TEST.AUG.HFLIP:
                    variants.append(
                        T.rotation(w, h, float(ang)).compose(
                            T.hflip(w, h).compose(base)
                        )
                    )
        else:
            if cfg.TEST.AUG.HFLIP:
                variants.append(T.hflip(w, h).compose(base))
            if cfg.TEST.AUG.VFLIP:
                variants.append(T.vflip(w, h).compose(base))
        augs.extend(variants)
    return augs


# canvas ladder for bucketed TTA eval steps; values are rounded up to the
# configured divisibility at use.  Only buckets actually hit get compiled.
_CANVAS_LADDER = (
    128, 256, 384, 512, 640, 768, 896, 1024, 1280, 1536, 1792, 2048,
    2560, 3072, 3584, 4096,
)


class BucketedEvalSteps:
    """Lazily-compiled eval steps, one per canvas bucket.

    `get(needed)` returns (canvas_hw, jitted_step, batch) for the smallest
    ladder canvas that fits `needed` pixels on both sides.  Batch size
    scales so that batch * canvas_area stays ~constant (4 x 1024^2), which
    bounds activation memory on the largest buckets.
    """

    def __init__(self, cfg, model, max_batch: int = 8,
                 area_budget: int = 4 * 1024 * 1024):
        self.cfg = cfg
        self.model = model
        self.div = max(int(cfg.TPU.IMAGE_SIZE_DIVISIBILITY), 1)
        self.max_size = int(-(-int(cfg.TEST.AUG.MAX_SIZE) // self.div) * self.div)
        self.max_batch = max_batch
        self.area_budget = area_budget
        self._steps = {}

    def _canvas_for(self, needed: int) -> int:
        for c in _CANVAS_LADDER:
            c = int(-(-c // self.div) * self.div)
            if c >= needed and c <= self.max_size:
                return c
        # over-MAX_SIZE copies render cropped onto the max canvas, like the
        # pre-bucketing behavior (resize already bounds them to MAX_SIZE;
        # only exotic rotation compositions can exceed it)
        return self.max_size

    def get(self, needed_hw):
        side = self._canvas_for(max(needed_hw))
        if side not in self._steps:
            batch = int(min(self.max_batch, max(1, self.area_budget // (side * side))))
            step = jax.jit(make_eval_step(self.model, self.cfg, (side, side)))
            self._steps[side] = (step, batch)
            logger.info(f"TTA: compiled eval step for canvas {side} batch {batch}")
        step, batch = self._steps[side]
        return (side, side), step, batch

    def get_fused(self, base_hw, needed_hw, transpose: bool):
        """On-device aug path (TPU.TTA_DEVICE_AUG): one jitted program per
        (base canvas, bucket canvas, transpose) that generates the k warped
        copies from the shipped base image (ops/device_warp.py one-hot
        matmuls) and runs the eval step on them — the host ships ONE image
        plus KB-sized sampling vectors instead of k full canvases."""
        side = self._canvas_for(max(needed_hw))
        key = (base_hw, side, transpose)
        if key not in self._steps:
            batch = int(min(self.max_batch, max(1, self.area_budget // (side * side))))
            eval_core = make_eval_step(self.model, self.cfg, (side, side))

            def fused(params, base_img, warps, batch_stats,
                      _t=transpose, _core=eval_core):
                return _core(params, device_warp(base_img, warps, _t),
                             None, batch_stats)

            self._steps[key] = (jax.jit(fused), batch)
            logger.info(
                f"TTA: compiled fused device-aug step base={base_hw} "
                f"canvas={side} transpose={transpose} batch={batch}"
            )
        step, batch = self._steps[key]
        return (side, side), step, batch


def tta_inference_single(
    cfg, steps: "BucketedEvalSteps", params, img: np.ndarray, batch_stats=None
) -> Dict[str, np.ndarray]:
    """All TTA copies of one image -> merged detections (original coords).

    With TPU.TTA_DEVICE_AUG (default on), separable copies — the whole
    DAFNe aug family: {scales} x {id, hflip, vflip, rot90-multiples} — are
    generated ON DEVICE from one shipped base image (ops/device_warp.py),
    cutting host->device bytes ~15x vs shipping every warped canvas; only
    non-separable augs (arbitrary-angle rotations) fall back to the host
    cv2 path.  Detections are identical up to the documented float-vs-cv2
    fixed-point resample difference (<=1 intensity level; gated mAP-neutral
    by tools/gen_canary.py)."""
    h, w = img.shape[:2]
    augs = build_tta_augs(cfg, w, h)
    all_corners, all_scores, all_classes, all_ctr = [], [], [], []

    def unpack(det, i, aug):
        m = det["valid"][i]
        corners = det["corners"][i][m].astype(np.float64)
        all_corners.append(
            aug.invert_coords(corners.reshape(-1, 4, 2)).reshape(-1, 8)
        )
        all_scores.append(det["scores"][i][m])
        all_classes.append(det["classes"][i][m])
        all_ctr.append(det["centerness"][i][m])

    host_augs = list(augs)
    if cfg.TPU.get("TTA_DEVICE_AUG", True):
        # pad the base image to a divisibility-rounded canvas so a
        # varied-size dataset hits a bounded set of (base_hw) programs
        div = max(int(cfg.TPU.IMAGE_SIZE_DIVISIBILITY), 1)
        rup = lambda v: int(-(-v // div) * div)
        base_hw = (rup(h), rup(w))
        groups: Dict[tuple, list] = {}
        host_augs = []
        for aug in augs:
            side = steps._canvas_for(max(aug.out_h, aug.out_w))
            p = separable_warp_params(aug, w, h, (side, side))
            if p is None:
                host_augs.append(aug)  # host cv2 fallback
            else:
                groups.setdefault((side, p.transpose), []).append((aug, p))
        if groups:
            base = np.zeros(
                base_hw + (3,),
                np.uint8 if img.dtype == np.uint8 else np.float32,
            )
            base[:h, :w] = img
            base_dev = jax.device_put(base)
            for (side, transpose), items in groups.items():
                _, step, batch = steps.get_fused(
                    base_hw, (side, side), transpose
                )
                for start in range(0, len(items), batch):
                    chunk = items[start : start + batch]
                    real = len(chunk)
                    while len(chunk) < batch:
                        chunk.append(chunk[-1])
                    warps = stack_warps([p for _, p in chunk])
                    det = step(params, base_dev, warps, batch_stats)
                    det = {k: np.asarray(v) for k, v in det.items()}
                    for i in range(real):
                        unpack(det, i, chunk[i][0])

    # group host-path copies by the smallest canvas bucket that fits them
    by_bucket: Dict[tuple, list] = {}
    for aug in host_augs:
        canvas_hw, step, batch = steps.get((aug.out_h, aug.out_w))
        by_bucket.setdefault((canvas_hw, batch), []).append((aug, step))

    for (canvas_hw, batch), items in by_bucket.items():
        pad_h, pad_w = canvas_hw
        step = items[0][1]
        canvases, metas = [], []
        for aug, _ in items:
            warped = aug.apply_image(img)
            # uint8 canvases: 4x less host->device transfer than f32 (the
            # model normalizes on-chip; the train loader ships uint8 too)
            canvas = np.zeros((pad_h, pad_w, 3), warped.dtype
                              if warped.dtype == np.uint8 else np.float32)
            rh, rw = warped.shape[:2]
            canvas[: min(rh, pad_h), : min(rw, pad_w)] = warped[:pad_h, :pad_w]
            canvases.append(canvas)
            metas.append(aug)
        for start in range(0, len(canvases), batch):
            chunk = canvases[start : start + batch]
            real = len(chunk)
            while len(chunk) < batch:
                chunk.append(chunk[-1])
            det = step(params, jnp.asarray(np.stack(chunk)), None, batch_stats)
            det = {k: np.asarray(v) for k, v in det.items()}
            for i in range(real):
                unpack(det, i, metas[start + i])

    corners = np.concatenate(all_corners) if all_corners else np.zeros((0, 8))
    scores = np.concatenate(all_scores) if all_scores else np.zeros(0)
    classes = np.concatenate(all_classes) if all_classes else np.zeros(0, np.int64)
    ctr = np.concatenate(all_ctr) if all_ctr else np.zeros(0)

    # class-aware rotated NMS merge (with the DOTA vehicle merge, nms.py:77-79)
    merged_cls = classes.copy()
    merged_cls[merged_cls == 5] = 4
    keep = np.zeros(len(scores), bool)
    for c in np.unique(merged_cls):
        sel = np.where(merged_cls == c)[0]
        k = poly_nms(corners[sel], scores[sel], cfg.MODEL.DAFNE.NMS_TH)
        keep[sel[k]] = True
    idx = np.where(keep)[0]
    # post-NMS top-k over all classes
    topk = cfg.MODEL.DAFNE.POST_NMS_TOPK_TEST
    if len(idx) > topk:
        idx = idx[np.argsort(-scores[idx])[:topk]]
    return {
        "corners": corners[idx],
        "scores": scores[idx],
        "classes": classes[idx],
        "valid": np.ones(len(idx), bool),
    }


def do_test_with_tta(cfg, model, params, output_dir=None, batch_stats=None):
    """TTA evaluation over cfg.DATASETS.TEST (do_test_with_TTA,
    plain_train_net.py:339-357)."""
    results = {}
    steps = BucketedEvalSteps(cfg, model)
    for dataset_name in cfg.DATASETS.TEST:
        records = get_dataset(dataset_name, cfg)
        out_dir = (
            os.path.join(output_dir, "inference_tta", dataset_name)
            if output_dir
            else None
        )
        evaluator = build_evaluator(cfg, dataset_name, records, out_dir)
        t0 = time.perf_counter()
        for r in records:
            img = r["image"] if "image" in r else read_image(
                r["file_name"], cfg.INPUT.FORMAT
            )
            det = tta_inference_single(cfg, steps, params, img, batch_stats)
            evaluator.process_image(
                r["image_id"], det["corners"], det["scores"], det["classes"],
                det["valid"],
            )
        res = evaluator.evaluate()
        logger.info(
            f"TTA eval {dataset_name}: {len(records)} images in "
            f"{time.perf_counter() - t0:.1f}s mAP={res.get('mAP', 0):.2f}"
        )
        results[dataset_name] = res
    return results
