"""On-device train-time augmentation (TPU.TRAIN_DEVICE_AUG).

The train-side completion of the north-star on-device preprocessing stage:
the loader ships one raw base image per example plus tiny warp/color
parameter vectors, and the jitted train step renders the augmented canvas on
device (ops/device_warp.py; engine/trainer.py::device_aug_image).  The host
path (mapper cv2 warps, reference behavior per
dafne/data/datasets/dafne_dataset_mapper.py:13-47) is the oracle here.
"""

import os

import numpy as np
import pytest

from dafne_tpu.config import get_cfg
from tests.test_engine import tiny_cfg


def _cfg(tmp_out, color=False, **overrides):
    cfg = tiny_cfg(tmp_out, **overrides)
    if color:
        cfg.INPUT.USE_COLOR_AUGMENTATIONS = True
    return cfg


def _device_render(example, base_hw, color):
    """Render one device-aug example exactly as the train step does."""
    from dafne_tpu.ops.device_warp import device_color_aug, device_warp_batch

    base = np.zeros((1, *base_hw, 3), np.uint8)
    bh, bw = example["image_base"].shape[:2]
    base[0, :bh, :bw] = example["image_base"]
    p = {
        k[len("aug_"):]: example[k][None]
        for k in example
        if k.startswith("aug_") and k != "aug_out_hw"
    }
    img = device_warp_batch(base, p)
    if color:
        img = device_color_aug(
            img, example["color_light"][None], example["color_w"][None],
            example["aug_out_hw"][None],
        )
    return np.asarray(img[0])


@pytest.mark.parametrize("color", [False, True])
def test_device_aug_canvas_matches_host_path(tmp_path, color):
    """Same example seed -> the device-rendered canvas matches the host cv2
    canvas within fixed-point tolerance (warp <= cv2's 11-bit fixed point;
    color jitter adds one more truncation step), gt corners bit-equal (they
    transform on host either way), zero padding preserved."""
    from dafne_tpu.data import get_dataset
    from dafne_tpu.data.mapper import DatasetMapper, device_aug_base_hw
    from dafne_tpu.data.registry import register_all_datasets

    cfg = _cfg(tmp_path, color=color)
    register_all_datasets(cfg)
    recs = get_dataset(cfg.DATASETS.TRAIN[0], cfg)[:4]
    base_hw = device_aug_base_hw(recs)
    assert base_hw is not None
    pad_hw = (320, 320)  # >= every possible resize of the 256^2 sources
    m_host = DatasetMapper(cfg, True, pad_hw)
    m_dev = DatasetMapper(cfg, True, pad_hw, device_aug=True)
    for seed in range(10):
        rec = dict(recs[seed % len(recs)])
        eh = m_host(dict(rec), np.random.RandomState(seed))
        ed = m_dev(dict(rec), np.random.RandomState(seed))
        for k in ("gt_corners", "gt_classes", "gt_valid", "gt_area",
                  "resized_hw", "scale_xy"):
            np.testing.assert_array_equal(eh[k], ed[k], err_msg=k)
        img = _device_render(ed, base_hw, color)
        np.testing.assert_allclose(
            img, eh["image"].astype(np.float32), atol=2.0 if color else 1.5,
            err_msg=f"seed {seed}",
        )
        oh, ow = ed["aug_out_hw"]
        assert np.all(img[oh:] == 0) and np.all(img[:, ow:] == 0)


def test_resolve_train_device_aug(tmp_path, monkeypatch):
    """Eligibility + auto gating: rot90 recipes qualify, 30-degree recipes
    fall back (True on them is an error), auto keys off host core count."""
    from dafne_tpu.engine.trainer import resolve_train_device_aug

    cfg = _cfg(tmp_path)
    monkeypatch.setattr(os, "sched_getaffinity", lambda _: {0}, raising=False)
    cfg.merge_from_list(["TPU.TRAIN_DEVICE_AUG", "auto"])
    assert resolve_train_device_aug(cfg) is True  # starved host -> on
    monkeypatch.setattr(
        os, "sched_getaffinity", lambda _: set(range(8)), raising=False
    )
    assert resolve_train_device_aug(cfg) is False  # strong host -> cv2
    cfg.merge_from_list(["TPU.TRAIN_DEVICE_AUG", "True"])
    assert resolve_train_device_aug(cfg) is True

    # 30-degree ms recipe (hrsc/ucas style): not separable
    cfg.INPUT.ROTATION_AUG_ANGLES = [0.0, 30.0, 60.0, 90.0, 120.0, 150.0]
    with pytest.raises(ValueError, match="non-90-degree"):
        resolve_train_device_aug(cfg)
    cfg.merge_from_list(["TPU.TRAIN_DEVICE_AUG", "auto"])
    monkeypatch.setattr(os, "sched_getaffinity", lambda _: {0}, raising=False)
    assert resolve_train_device_aug(cfg) is False
    cfg.merge_from_list(["TPU.TRAIN_DEVICE_AUG", "False"])
    assert resolve_train_device_aug(cfg) is False


def test_device_aug_full_train_loop(tmp_path):
    """do_train end-to-end with TPU.TRAIN_DEVICE_AUG forced on (+ color
    jitter + bucketed multi-scale): losses finite through the device-aug
    render, and the loop actually took the device path."""
    import json
    import logging

    from dafne_tpu.data.registry import register_all_datasets
    from dafne_tpu.engine.train_loop import do_train
    from dafne_tpu.models import build_model

    cfg = _cfg(
        tmp_path, color=True,
        **{
            "TPU.TRAIN_DEVICE_AUG": True,
            "INPUT.MIN_SIZE_TRAIN": "[64, 256]",
            "INPUT.MAX_SIZE_TRAIN": 256,
            "SOLVER.IMS_PER_BATCH": 8,
            "SOLVER.MAX_ITER": 4,
            "SOLVER.CHECKPOINT_PERIOD": 0,
            "TEST.EVAL_PERIOD": 0,
            "DEBUG.OVERFIT_NUM_IMAGES": 4,
        },
    )
    register_all_datasets(cfg)
    model = build_model(cfg)
    do_train(cfg, model)
    rows = [
        json.loads(l)
        for l in open(os.path.join(str(tmp_path), "metrics.json"))
    ]
    losses = [r["loss/total"] for r in rows if "loss/total" in r]
    assert losses and all(np.isfinite(l) for l in losses), rows


def test_device_aug_host_assign_compose(tmp_path):
    """TPU.TRAIN_DEVICE_AUG x TPU.HOST_ASSIGN: targets precomputed on host
    from the exactly-transformed corners, canvas rendered on device — the
    gt arrays never ship."""
    import json

    from dafne_tpu.data.registry import register_all_datasets
    from dafne_tpu.engine.train_loop import do_train
    from dafne_tpu.models import build_model

    cfg = _cfg(
        tmp_path,
        **{
            "TPU.TRAIN_DEVICE_AUG": True,
            "TPU.HOST_ASSIGN": True,
            "SOLVER.IMS_PER_BATCH": 8,
            "SOLVER.MAX_ITER": 3,
            "SOLVER.CHECKPOINT_PERIOD": 0,
            "TEST.EVAL_PERIOD": 0,
            "DEBUG.OVERFIT_NUM_IMAGES": 2,
        },
    )
    register_all_datasets(cfg)
    model = build_model(cfg)
    do_train(cfg, model)
    rows = [
        json.loads(l)
        for l in open(os.path.join(str(tmp_path), "metrics.json"))
    ]
    losses = [r["loss/total"] for r in rows if "loss/total" in r]
    assert losses and all(np.isfinite(l) for l in losses), rows


def test_device_aug_loader_batch_contract(tmp_path):
    """The thread loader's device-aug batches carry the base-image buffer +
    warp vectors and no rendered canvas; the step-side canvas key matches
    the bucket draw."""
    from dafne_tpu.data import get_dataset
    from dafne_tpu.data.loader import DataLoader
    from dafne_tpu.data.mapper import train_canvas_buckets
    from dafne_tpu.data.registry import register_all_datasets
    from dafne_tpu.engine.train_loop import _batch_canvas_hw

    cfg = _cfg(
        tmp_path,
        **{
            "INPUT.MIN_SIZE_TRAIN": "[64, 256]",
            "INPUT.MAX_SIZE_TRAIN": 256,
            "DEBUG.OVERFIT_NUM_IMAGES": 4,
        },
    )
    register_all_datasets(cfg)
    records = []
    for name in cfg.DATASETS.TRAIN:
        records += get_dataset(name, cfg)
    buckets = train_canvas_buckets(cfg, records)
    loader = DataLoader(
        cfg, records, batch_size=2, train=True, seed=0, buckets=buckets,
        device_aug=True,
    )
    assert loader.device_aug and loader.base_hw is not None
    it = iter(loader)
    seen = set()
    for _ in range(16):
        b = next(it)
        assert "image" not in b and b["image_base"].dtype == np.uint8
        assert b["image_base"].shape[1:3] == loader.base_hw
        hw = _batch_canvas_hw(b)
        assert hw in buckets.canvases
        seen.add(hw)
        assert b["aug_w0_h"].shape == (2, hw[0])
        assert b["aug_w0_w"].shape == (2, hw[1])
    it.close()
    assert len(seen) >= 2  # multiple ladder canvases actually drawn
