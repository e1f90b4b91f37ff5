"""Dataset mapper: record dict -> static-shape training/eval example.

Re-design of DAFNeDatasetMapper (dafne/data/datasets/dafne_dataset_mapper.py:
13-47) for static TPU shapes:

  read image -> affine aug pipeline -> transform corners exactly
  -> drop degenerate/empty instances (filter_empty_instances equivalent)
  -> canonical corner sort (SORT_CORNERS_DATALOADER, :37-38)
  -> shoelace area of the transformed quad (gt_corners_area, :41)
  -> pad instances to TPU.MAX_INSTANCES and the image to a fixed
     (pad_h, pad_w) canvas (the size_divisibility padding of
     one_stage_detector.py:100-107, hoisted to the host).

Outputs are plain numpy arrays ready to be stacked into a batch.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from dafne_tpu.data import transforms as T


def _sort_quad_np(corners: np.ndarray) -> np.ndarray:
    """Vectorized NumPy mirror of geometry.quads.sort_quadrilateral (same
    batched formulation, no per-quad Python loop — the host hot path)."""
    c = corners.reshape(-1, 4, 2)
    n = c.shape[0]
    if n == 0:
        return corners
    ar4 = np.arange(4)
    left_idx = np.argmin(c[:, :, 0], axis=1)
    p1 = c[np.arange(n), left_idx]
    keep = ar4[None, :] != left_idx[:, None]
    rem_idx = np.sort(np.where(keep, ar4[None, :], 99), axis=1)[:, :3]
    rem = np.take_along_axis(c, rem_idx[:, :, None], axis=1)  # [N, 3, 2]

    v = rem - p1[:, None, :]

    def cr(a, b):
        return a[:, 0] * b[:, 1] - a[:, 1] * b[:, 0]

    conds = np.stack(
        [
            cr(v[:, 0], v[:, 1]) * cr(v[:, 0], v[:, 2]) < 0,
            cr(v[:, 1], v[:, 0]) * cr(v[:, 1], v[:, 2]) < 0,
            cr(v[:, 2], v[:, 0]) * cr(v[:, 2], v[:, 1]) < 0,
        ],
        axis=1,
    )
    first = np.argmax(conds, axis=1)
    p3 = rem[np.arange(n), first]
    a_idx = np.where(first == 0, 1, 0)
    b_idx = np.where(first == 2, 1, 2)
    sa = rem[np.arange(n), a_idx]
    sb = rem[np.arange(n), b_idx]
    diag = p3 - p1
    ca = cr(diag, sa - p1)
    cb = cr(diag, sb - p1)
    take_a = (ca > 0) | ((ca <= 0) & (cb <= 0))
    p2 = np.where(take_a[:, None], sa, sb)
    p4 = np.where(take_a[:, None], sb, sa)
    return np.stack([p1, p2, p3, p4], axis=1).reshape(-1, 8)


def _shoelace(corners: np.ndarray) -> np.ndarray:
    x = corners[:, 0::2]
    y = corners[:, 1::2]
    return 0.5 * np.abs(
        (x * np.roll(y, -1, axis=1)).sum(1) - (y * np.roll(x, -1, axis=1)).sum(1)
    )


def read_image(path: str, fmt: str = "BGR") -> np.ndarray:
    import cv2

    img = cv2.imread(path, cv2.IMREAD_COLOR)  # BGR uint8
    if img is None:
        raise FileNotFoundError(path)
    if fmt == "RGB":
        img = img[:, :, ::-1]
    return img


class DatasetMapper:
    """Callable record -> example; `train` toggles augmentation."""

    def __init__(self, cfg, train: bool, pad_hw: Tuple[int, int]):
        self.cfg = cfg
        self.train = train
        self.pad_h, self.pad_w = pad_hw
        self.max_inst = cfg.TPU.MAX_INSTANCES
        self.sort_corners = cfg.MODEL.DAFNE.SORT_CORNERS_DATALOADER
        self.fmt = cfg.INPUT.FORMAT
        self.color_aug = cfg.INPUT.USE_COLOR_AUGMENTATIONS and train
        # cache decoded uint8 images on the record dicts (small datasets /
        # benchmarking; DOTA-scale train sets should leave this off)
        self.cache_images = cfg.DATALOADER.get("CACHE_IMAGES", False)

    def __call__(
        self,
        record: Dict,
        rng: Optional[np.random.RandomState] = None,
        image_out: Optional[np.ndarray] = None,
    ) -> Dict[str, np.ndarray]:
        """`image_out`: optional pre-zeroed [pad_h, pad_w, 3] uint8 buffer to
        render into (the loader passes batch slices so no per-example canvas
        allocation + batch-stack copy happens — single-core host hot path)."""
        rng = rng or np.random.RandomState()
        if "image" in record:  # pre-loaded (synthetic datasets / cache)
            img = record["image"]
        else:
            img = read_image(record["file_name"], self.fmt)
            if self.cache_images:
                record["image"] = img
        h, w = img.shape[:2]

        if self.train:
            aug = T.build_train_augmentations(self.cfg, w, h, rng)
        else:
            aug = T.build_test_augmentation(self.cfg, w, h)
        img = aug.apply_image(img)
        if self.color_aug:
            img = T.apply_color_augmentations(img, rng)

        annos = record.get("annotations", [])
        corners = np.asarray(
            [a["corners"] for a in annos], dtype=np.float64
        ).reshape(-1, 8)
        classes = np.asarray([a["category_id"] for a in annos], dtype=np.int32)
        difficult = np.asarray(
            [a.get("difficult", False) for a in annos], dtype=bool
        )

        if len(corners):
            corners = aug.apply_coords(corners.reshape(-1, 4, 2)).reshape(-1, 8)
            # filter_empty_instances equivalent: enclosing hbox must be
            # non-degenerate after augmentation
            xs, ys = corners[:, 0::2], corners[:, 1::2]
            keep = (xs.max(1) - xs.min(1) > 1e-3) & (ys.max(1) - ys.min(1) > 1e-3)
            corners, classes, difficult = corners[keep], classes[keep], difficult[keep]
        if len(corners) and self.sort_corners:
            corners = _sort_quad_np(corners)

        n = min(len(corners), self.max_inst)
        gt_corners = np.zeros((self.max_inst, 8), np.float32)
        gt_hbox = np.zeros((self.max_inst, 4), np.float32)
        gt_classes = np.zeros((self.max_inst,), np.int32)
        gt_area = np.zeros((self.max_inst,), np.float32)
        gt_valid = np.zeros((self.max_inst,), bool)
        gt_difficult = np.zeros((self.max_inst,), bool)
        if n:
            c = corners[:n].astype(np.float32)
            gt_corners[:n] = c
            xs, ys = c[:, 0::2], c[:, 1::2]
            gt_hbox[:n] = np.stack(
                [xs.min(1), ys.min(1), xs.max(1), ys.max(1)], axis=1
            )
            gt_classes[:n] = classes[:n]
            gt_area[:n] = _shoelace(c)
            gt_valid[:n] = True
            gt_difficult[:n] = difficult[:n]

        rh, rw = img.shape[:2]
        # uint8 to the device: 4x less host copying and PCIe/ICI transfer
        # than float32; the model normalizes on-chip (OneStageDetector).
        if img.dtype != np.uint8:
            img = np.clip(img, 0, 255).astype(np.uint8)
        if image_out is not None:
            canvas = image_out  # caller-provided, pre-zeroed
        else:
            canvas = np.zeros((self.pad_h, self.pad_w, 3), np.uint8)
        if rh > self.pad_h or rw > self.pad_w:
            # only possible when the record's width/height metadata disagrees
            # with the actual file (the canvas is sized from record dims);
            # cropping silently would make detections in the lost band
            # impossible, so say it once
            if not getattr(self, "_crop_warned", False):
                self._crop_warned = True
                import logging

                logging.getLogger("dafne_tpu").warning(
                    "resized image (%d, %d) exceeds the static canvas "
                    "(%d, %d) and will be cropped — a dataset record's "
                    "width/height likely disagrees with the file on disk",
                    rh, rw, self.pad_h, self.pad_w,
                )
        canvas[:rh, :rw] = img[: self.pad_h, : self.pad_w]

        return {
            "image": canvas,
            "gt_corners": gt_corners,
            "gt_hbox": gt_hbox,
            "gt_classes": gt_classes,
            "gt_area": gt_area,
            "gt_valid": gt_valid,
            "gt_difficult": gt_difficult,
            "image_id": record.get("image_id", ""),
            "orig_hw": np.asarray([h, w], np.int32),
            "resized_hw": np.asarray([rh, rw], np.int32),
            # resized -> original scale, for rescaling predictions at eval
            "scale_xy": np.asarray([w / rw, h / rh], np.float32),
        }


def eval_preprocess_meta(cfg) -> dict:
    """The eval-time preprocessing recipe as a plain dict — single source
    for the export artifact metadata (tools/export_model.py) and live-mode
    serving (tools/serve.py), so the two can't diverge."""
    return {
        "resize_type": cfg.INPUT.RESIZE_TYPE,
        "min_size_test": cfg.INPUT.MIN_SIZE_TEST,
        "max_size_test": cfg.INPUT.MAX_SIZE_TEST,
        "resize_width_test": cfg.INPUT.get("RESIZE_WIDTH_TEST", 0),
        "resize_height_test": cfg.INPUT.get("RESIZE_HEIGHT_TEST", 0),
        "input_format": cfg.INPUT.FORMAT,  # channel order clients must send
    }


def eval_pad_hw(cfg, records) -> Tuple[int, int]:
    """Tight static eval canvas: the max RESIZED extent over the dataset's
    records (dims known without image IO), rounded up to the divisibility.

    Falls back to the worst-case `pad_target_hw` when any record lacks
    width/height.  Fixes the round-1 weakness of padding every eval batch to
    INPUT.MAX_SIZE_TEST even when the dataset resizes far smaller (e.g.
    HRSC: ~1100x800 sources at shortest-edge 800 fit a 1152x896 canvas, not
    1408^2)."""
    from dafne_tpu.data import transforms as T

    worst = pad_target_hw(cfg, train=False)
    div = cfg.TPU.IMAGE_SIZE_DIVISIBILITY
    mh = mw = 0
    for r in records:
        w, h = r.get("width"), r.get("height")
        if not w or not h:
            if "image" in r:
                h, w = r["image"].shape[:2]
            else:
                return worst
        aug = T.build_test_augmentation(cfg, int(w), int(h))
        mh = max(mh, aug.out_h)
        mw = max(mw, aug.out_w)
    if mh == 0:
        return worst
    rup = lambda v: int(-(-v // div) * div)
    return min(rup(mh), worst[0]), min(rup(mw), worst[1])


def pad_target_hw(cfg, train: bool) -> Tuple[int, int]:
    """The static canvas size for a config (max resize, rounded up to the
    size divisibility)."""
    div = cfg.TPU.IMAGE_SIZE_DIVISIBILITY
    if cfg.INPUT.RESIZE_TYPE == "both":
        h = cfg.INPUT.RESIZE_HEIGHT_TRAIN if train else cfg.INPUT.RESIZE_HEIGHT_TEST
        w = cfg.INPUT.RESIZE_WIDTH_TRAIN if train else cfg.INPUT.RESIZE_WIDTH_TEST
    else:
        m = cfg.INPUT.MAX_SIZE_TRAIN if train else cfg.INPUT.MAX_SIZE_TEST
        h = w = m
    rup = lambda v: int(-(-v // div) * div)
    return rup(h), rup(w)
