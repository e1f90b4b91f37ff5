"""Test-time augmentation (TTA) inference.

Re-design of OneStageRCNNWithTTA + DotaDatasetMapperTTA
(dafne/modeling/tta.py:29-268) for static TPU shapes:

- the aug set is {TEST.AUG.MIN_SIZES multi-scale resize} x {identity, hflip,
  vflip or ROTATION_ANGLES x hflip} (tta.py:48-135)
- every augmented copy is an AffineAug, so all copies render onto ONE padded
  canvas size -> a single compiled eval step serves the whole set (the
  reference instead mini-batches ragged copies through the model 3 at a
  time, tta.py:173-197)
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


def tta_inference_single(
    cfg, eval_step, params, img: np.ndarray, pad_hw, batch_chunk: int = 4
) -> Dict[str, np.ndarray]:
    """All TTA copies of one image -> merged detections (original coords)."""
    h, w = img.shape[:2]
    augs = build_tta_augs(cfg, w, h)
    pad_h, pad_w = pad_hw

    canvases, metas = [], []
    for aug in augs:
        warped = aug.apply_image(img)
        canvas = np.zeros((pad_h, pad_w, 3), np.float32)
        rh, rw = warped.shape[:2]
        canvas[: min(rh, pad_h), : min(rw, pad_w)] = warped[:pad_h, :pad_w]
        canvases.append(canvas)
        metas.append(aug)

    all_corners, all_scores, all_classes, all_ctr = [], [], [], []
    for start in range(0, len(canvases), batch_chunk):
        chunk = canvases[start : start + batch_chunk]
        real = len(chunk)
        while len(chunk) < batch_chunk:
            chunk.append(chunk[-1])
        det = eval_step(params, jnp.asarray(np.stack(chunk)))
        det = {k: np.asarray(v) for k, v in det.items()}
        for i in range(real):
            aug = metas[start + i]
            m = det["valid"][i]
            corners = det["corners"][i][m].astype(np.float64)
            corners = aug.invert_coords(corners.reshape(-1, 4, 2)).reshape(-1, 8)
            all_corners.append(corners)
            all_scores.append(det["scores"][i][m])
            all_classes.append(det["classes"][i][m])
            all_ctr.append(det["centerness"][i][m])

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


def do_test_with_tta(cfg, model, params, output_dir=None):
    """TTA evaluation over cfg.DATASETS.TEST (do_test_with_TTA,
    plain_train_net.py:339-357)."""
    results = {}
    # canvas must fit the largest TTA copy
    div = cfg.TPU.IMAGE_SIZE_DIVISIBILITY
    m = cfg.TEST.AUG.MAX_SIZE
    pad_hw = (int(-(-m // div) * div),) * 2
    eval_step = jax.jit(make_eval_step(model, cfg, pad_hw))
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
            det = tta_inference_single(cfg, eval_step, params, img, pad_hw)
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
