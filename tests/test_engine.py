"""Engine integration tests: checkpoint resume, TTA inference, eval loop."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dafne_tpu.config import get_cfg


def tiny_cfg(tmp_out, **overrides):
    cfg = get_cfg()
    cfg.merge_from_file("configs/synthetic/base.yaml")
    cfg.OUTPUT_DIR = str(tmp_out)
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 16
    cfg.MODEL.RESNETS.STEM_OUT_CHANNELS = 8
    cfg.MODEL.FPN.OUT_CHANNELS = 16
    cfg.MODEL.DAFNE.NUM_CLS_CONVS = 1
    cfg.MODEL.DAFNE.NUM_BOX_CONVS = 1
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.SOLVER.IMS_PER_BATCH = 2
    cfg.DATALOADER.NUM_WORKERS = 0
    for k, v in overrides.items():
        cfg.merge_from_list([k, str(v)])
    return cfg


def test_checkpoint_save_restore_roundtrip(tmp_path):
    from dafne_tpu.engine.checkpoint import Checkpointer
    from dafne_tpu.engine.train_loop import build_state
    from dafne_tpu.models import build_model

    cfg = tiny_cfg(tmp_path)
    model = build_model(cfg)
    state, tx, _ = build_state(cfg, model, (128, 128))
    state = state.replace(step=jnp.asarray(7, jnp.int32))

    ck = Checkpointer(str(tmp_path))
    ck.save(7, state)
    ck.wait()

    state2, _, _ = build_state(cfg, model, (128, 128), rng=jax.random.PRNGKey(1))
    # different init -> params differ before restore
    a = np.asarray(state.params["head"]["cls_tower"]["conv0"]["kernel"])
    b = np.asarray(state2.params["head"]["cls_tower"]["conv0"]["kernel"])
    assert np.abs(a - b).max() > 0

    restored, step = ck.restore(state2)
    assert step == 7
    np.testing.assert_allclose(
        np.asarray(restored.params["head"]["cls_tower"]["conv0"]["kernel"]), a
    )


def test_resume_or_load_bootstrap_and_resume(tmp_path):
    from dafne_tpu.engine.checkpoint import Checkpointer
    from dafne_tpu.engine.train_loop import build_state
    from dafne_tpu.models import build_model

    cfg = tiny_cfg(tmp_path)
    model = build_model(cfg)
    state, _, _ = build_state(cfg, model, (128, 128))
    ck = Checkpointer(str(tmp_path))
    # nothing to resume -> stays at 0
    s, step = ck.resume_or_load(state, cfg, resume=True)
    assert step == 0
    ck.save(3, state.replace(step=jnp.asarray(3, jnp.int32)))
    ck.wait()
    s, step = ck.resume_or_load(state, cfg, resume=True)
    assert step == 3
    assert int(s.step) == 3
    # resume=False ignores the checkpoint
    s, step = ck.resume_or_load(state, cfg, resume=False)
    assert step == 0


def test_tta_augs_and_inference(tmp_path):
    from dafne_tpu.data import register_all_datasets
    from dafne_tpu.data.datasets.synthetic import load_synthetic
    from dafne_tpu.engine.tta import (
        BucketedEvalSteps,
        build_tta_augs,
        tta_inference_single,
    )
    from dafne_tpu.models import build_model

    cfg = tiny_cfg(
        tmp_path,
        **{
            "TEST.AUG.MIN_SIZES": "(128, 256)",
            "TEST.AUG.MAX_SIZE": "256",
            "TEST.AUG.HFLIP": "True",
            "TEST.AUG.VFLIP": "True",
        },
    )
    augs = build_tta_augs(cfg, 256, 256)
    assert len(augs) == 6  # 2 scales x {id, hflip, vflip}

    model = build_model(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)))["params"]
    steps = BucketedEvalSteps(cfg, model)
    rec = load_synthetic("val", 1)[0]
    det = tta_inference_single(cfg, steps, params, rec["image"])
    # the 128px copies must ride a smaller canvas than the 256px ones
    assert len(steps._steps) >= 2, steps._steps.keys()
    assert det["corners"].shape[1] == 8
    assert (det["scores"] >= 0).all()
    # corners land in original image coordinate range
    if len(det["corners"]):
        assert det["corners"].min() > -300 and det["corners"].max() < 600


def test_tta_with_batchnorm_stats(tmp_path):
    """Regression: TTA inference must thread batch_stats for BN-normed heads
    (MODEL.DAFNE.NORM=BN keeps running stats in a separate collection; the
    eval step needs them or flax raises a missing-collection error)."""
    from dafne_tpu.data.datasets.synthetic import load_synthetic
    from dafne_tpu.engine.tta import BucketedEvalSteps, tta_inference_single
    from dafne_tpu.models import build_model

    cfg = tiny_cfg(
        tmp_path,
        **{
            "MODEL.DAFNE.NORM": "BN",
            "TEST.AUG.MIN_SIZES": "(128,)",
            "TEST.AUG.MAX_SIZE": "128",
            "TEST.AUG.HFLIP": "True",
        },
    )
    model = build_model(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
    steps = BucketedEvalSteps(cfg, model)
    rec = load_synthetic("val", 1)[0]
    det = tta_inference_single(
        cfg, steps, variables["params"], rec["image"],
        batch_stats=variables["batch_stats"],
    )
    assert det["corners"].shape[1] == 8


def test_tta_rotation_set(tmp_path):
    from dafne_tpu.engine.tta import build_tta_augs

    cfg = tiny_cfg(
        tmp_path,
        **{
            "TEST.AUG.MIN_SIZES": "(128,)",
            "TEST.AUG.ROTATION_ANGLES": "(0, 90)",
            "TEST.AUG.HFLIP": "True",
        },
    )
    augs = build_tta_augs(cfg, 256, 256)
    # 1 scale x (base + 2 rotations x {plain, hflip}) = 5
    assert len(augs) == 5


def test_dota_test_split_writes_submission(tmp_path):
    """Unlabeled is_test datasets produce Task1 + merged zip, no AP."""
    from dafne_tpu.data.registry import DatasetCatalog, MetadataCatalog
    from dafne_tpu.engine.train_loop import do_test
    from dafne_tpu.models import build_model

    records = [
        {"image": np.zeros((128, 128, 3), np.uint8),
         "image_id": "P9__1__0___0", "height": 128, "width": 128,
         "annotations": []}
    ]
    name = "fake_dota_test"
    if name not in DatasetCatalog:
        DatasetCatalog.register(name, lambda: records)
    MetadataCatalog[name] = {
        "evaluator_type": "dota", "is_test": True,
        "thing_classes": ["plane", "ship"],
    }
    cfg = tiny_cfg(
        tmp_path,
        **{
            "DATASETS.TEST": f"('{name}',)",
            "MODEL.DAFNE.NUM_CLASSES": "2",
            "INPUT.MIN_SIZE_TEST": "128",
            "INPUT.MAX_SIZE_TEST": "128",
        },
    )
    model = build_model(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))["params"]
    do_test(cfg, model, params, str(tmp_path))
    out = tmp_path / "inference" / name
    assert (out / "task1" / "Task1_plane.txt").exists()
    assert (out / "submission.zip").exists()


def test_batchnorm_stats_update_and_checkpoint(tmp_path):
    """NORM=BN: running stats live in TrainState, update during training,
    persist through checkpoints, and drive eval normalization."""
    import jax.numpy as jnp

    from dafne_tpu.engine.checkpoint import Checkpointer
    from dafne_tpu.engine.optimizer import build_optimizer
    from dafne_tpu.engine.trainer import make_train_step
    from dafne_tpu.engine.train_loop import build_state
    from dafne_tpu.models import build_model
    from tests.test_model import synthetic_batch

    cfg = tiny_cfg(tmp_path, **{"MODEL.DAFNE.NORM": "BN"})
    model = build_model(cfg)
    state, tx, sched = build_state(cfg, model, (128, 128))
    assert state.batch_stats is not None
    bn0 = np.asarray(
        state.batch_stats["head"]["cls_tower"]["norm0_level0"]["mean"]
    )

    step = jax.jit(make_train_step(model, cfg, (128, 128), tx, sched))
    batch = synthetic_batch(n=2, hw=128, num_classes=3)
    new_state, metrics = step(state, batch)
    bn1 = np.asarray(
        new_state.batch_stats["head"]["cls_tower"]["norm0_level0"]["mean"]
    )
    assert np.abs(bn1 - bn0).max() > 0  # stats moved
    assert bool(metrics["loss_is_finite"])

    ck = Checkpointer(str(tmp_path))
    ck.save(1, jax.device_get(new_state))
    ck.wait()
    restored, s = ck.restore(state)
    np.testing.assert_allclose(
        np.asarray(
            restored.batch_stats["head"]["cls_tower"]["norm0_level0"]["mean"]
        ),
        bn1,
    )


def test_host_assign_losses_match(tmp_path):
    """TPU.HOST_ASSIGN: targets precomputed in the prefetch thread (same
    assign_targets, CPU backend) must be loss-identical to the in-step
    assignment — and the target arrays themselves must match exactly."""
    from dafne_tpu.engine.trainer import (
        make_host_assign_fn,
        make_location_tables,
        make_train_step,
    )
    from dafne_tpu.engine.train_loop import build_state
    from dafne_tpu.models import build_model
    from dafne_tpu.ops.targets import AssignmentSpec, assign_targets
    from tests.test_model import synthetic_batch

    cfg = tiny_cfg(tmp_path)
    model = build_model(cfg)
    state, tx, sched = build_state(cfg, model, (128, 128))
    step = jax.jit(make_train_step(model, cfg, (128, 128), tx, sched))
    batch = synthetic_batch(n=2, hw=128, num_classes=3)
    _, m_dev = step(state, batch)

    host_assign = make_host_assign_fn(cfg, (128, 128))
    tgt = host_assign(batch)
    assert set(tgt) == {"tgt_labels", "tgt_reg_corners", "tgt_reg_abcd"}

    # target arrays match the in-step assignment exactly
    spec = AssignmentSpec.from_config(cfg)
    _, locations, loc_strides, size_ranges = make_location_tables(
        (128, 128), spec
    )
    ref = assign_targets(
        locations, loc_strides, size_ranges, batch["gt_corners"],
        batch["gt_hbox"], batch["gt_classes"], batch["gt_area"],
        batch["gt_valid"], spec,
    )
    np.testing.assert_array_equal(tgt["tgt_labels"], np.asarray(ref["labels"]))
    # float targets: two separate XLA compilations of the same math may
    # reassociate fma -> ULP-level diffs; tight allclose, not bit equality
    np.testing.assert_allclose(
        tgt["tgt_reg_corners"], np.asarray(ref["reg_corners"]),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        tgt["tgt_reg_abcd"], np.asarray(ref["reg_abcd"]),
        rtol=1e-4, atol=1e-5,
    )

    # the jitted step consumes the precomputed targets (retraces on the new
    # batch keys) and produces the same losses
    batch_h = dict(batch)
    batch_h.update({k: jnp.asarray(v) for k, v in tgt.items()})
    _, m_host = step(state, batch_h)
    for k in m_dev:
        np.testing.assert_allclose(
            np.asarray(m_dev[k]), np.asarray(m_host[k]),
            rtol=1e-5, atol=1e-6, err_msg=k,
        )

    # --- bucket-slicing fast path: 96-slot padding, valid rows NOT
    # prefix-packed (one instance moved to column 40) -> bucket = 64 < 96;
    # the sliced host assignment must match the full-width one
    wide = {}
    for k in ("gt_corners", "gt_hbox", "gt_classes", "gt_area", "gt_valid"):
        v = np.asarray(batch[k])
        pad_shape = (v.shape[0], 96) + v.shape[2:]
        w = np.zeros(pad_shape, v.dtype)
        w[:, : v.shape[1]] = v
        wide[k] = w
    # relocate image 0's instance 1 to column 40, leaving a validity gap
    for k in ("gt_corners", "gt_hbox", "gt_classes", "gt_area", "gt_valid"):
        wide[k][0, 40] = wide[k][0, 1]
        wide[k][0, 1] = 0
    tgt_w = host_assign(wide)
    ref_w = assign_targets(
        locations, loc_strides, size_ranges,
        jnp.asarray(wide["gt_corners"]), jnp.asarray(wide["gt_hbox"]),
        jnp.asarray(wide["gt_classes"]), jnp.asarray(wide["gt_area"]),
        jnp.asarray(wide["gt_valid"]), spec,
    )
    np.testing.assert_array_equal(
        tgt_w["tgt_labels"], np.asarray(ref_w["labels"])
    )
    np.testing.assert_allclose(
        tgt_w["tgt_reg_corners"], np.asarray(ref_w["reg_corners"]),
        rtol=1e-4, atol=1e-5,
    )
    # the relocated instance is actually assigned somewhere (gap respected)
    assert (tgt_w["tgt_labels"][0] != cfg.MODEL.DAFNE.NUM_CLASSES).any()


def test_host_assign_full_loop(tmp_path):
    """do_train wiring: TPU.HOST_ASSIGN runs end-to-end (loader -> prefetch
    thread assign -> sharded device batch -> step) with finite losses."""
    import json

    from dafne_tpu.data.registry import register_all_datasets
    from dafne_tpu.engine.train_loop import do_train
    from dafne_tpu.models import build_model

    cfg = tiny_cfg(
        tmp_path,
        **{
            "TPU.HOST_ASSIGN": True,
            "SOLVER.IMS_PER_BATCH": 8,
            "SOLVER.MAX_ITER": 2,
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
    # host memory watchdog: the periodic metric rows record process RSS so
    # a host-side staging leak shows as a slope instead of a silent OOM kill
    rss = [r["host_rss_gb"] for r in rows if "host_rss_gb" in r]
    assert rss and all(v > 0 for v in rss), rows


def test_prefetch_producer_error_propagates(tmp_path, monkeypatch):
    """A crash inside the prefetch producer thread (e.g. host assign or
    device staging) must surface in the train loop as an exception, not
    wedge it forever on q.get()."""
    from dafne_tpu.data.registry import register_all_datasets
    from dafne_tpu.engine import train_loop
    from dafne_tpu.models import build_model

    def boom(*a, **k):
        raise RuntimeError("staged failure in producer")

    # do_train imports shard_batch from dafne_tpu.parallel at call time
    import dafne_tpu.parallel as parallel

    monkeypatch.setattr(parallel, "shard_batch", boom)
    cfg = tiny_cfg(
        tmp_path,
        **{
            "SOLVER.IMS_PER_BATCH": 8,
            "SOLVER.MAX_ITER": 2,
            "SOLVER.CHECKPOINT_PERIOD": 0,
            "TEST.EVAL_PERIOD": 0,
            "DEBUG.OVERFIT_NUM_IMAGES": 2,
        },
    )
    register_all_datasets(cfg)
    model = build_model(cfg)
    with pytest.raises(RuntimeError, match="staged failure"):
        train_loop.do_train(cfg, model)


def test_bucketed_train_full_loop(tmp_path):
    """TPU.BUCKETED_TRAIN end-to-end: do_train over a multi-scale recipe
    compiles one step per ladder canvas, mixes canvases across steps, and
    keeps losses finite (VERDICT r4 #1)."""
    import json

    from dafne_tpu.data.mapper import train_canvas_buckets
    from dafne_tpu.data.registry import register_all_datasets
    from dafne_tpu.data import get_dataset
    from dafne_tpu.engine.train_loop import do_train
    from dafne_tpu.models import build_model

    cfg = tiny_cfg(
        tmp_path,
        **{
            "INPUT.MIN_SIZE_TRAIN": "[64, 128, 256]",
            "INPUT.MAX_SIZE_TRAIN": 256,
            "SOLVER.IMS_PER_BATCH": 8,
            "SOLVER.MAX_ITER": 6,
            "SOLVER.CHECKPOINT_PERIOD": 0,
            "TEST.EVAL_PERIOD": 0,
            "DEBUG.OVERFIT_NUM_IMAGES": 4,
        },
    )
    register_all_datasets(cfg)
    records = []
    for name in cfg.DATASETS.TRAIN:
        records += get_dataset(name, cfg)
    buckets = train_canvas_buckets(cfg, records)
    assert buckets is not None and len(buckets.canvases) >= 2
    model = build_model(cfg)
    do_train(cfg, model)
    rows = [
        json.loads(l)
        for l in open(os.path.join(str(tmp_path), "metrics.json"))
    ]
    losses = [r["loss/total"] for r in rows if "loss/total" in r]
    assert losses and all(np.isfinite(l) for l in losses), rows


def test_bucketed_host_assign_full_loop(tmp_path):
    """Bucketed ms train x TPU.HOST_ASSIGN: the prefetch thread builds one
    CPU assign fn per ladder canvas (location tables are canvas-shaped) and
    the per-canvas device steps consume the precomputed targets."""
    import json

    from dafne_tpu.data.registry import register_all_datasets
    from dafne_tpu.engine.train_loop import do_train
    from dafne_tpu.models import build_model

    cfg = tiny_cfg(
        tmp_path,
        **{
            "TPU.HOST_ASSIGN": True,
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


def test_resolve_host_assign_auto(tmp_path, monkeypatch):
    """TPU.HOST_ASSIGN=auto enables host-side assignment only when >=2
    usable host cores exist (VERDICT r4 #7); bad strings are rejected."""
    from dafne_tpu.engine.trainer import resolve_host_assign

    cfg = tiny_cfg(tmp_path)
    cfg.merge_from_list(["TPU.HOST_ASSIGN", "auto"])
    monkeypatch.setattr(os, "sched_getaffinity", lambda _: {0}, raising=False)
    assert resolve_host_assign(cfg) is False
    monkeypatch.setattr(
        os, "sched_getaffinity", lambda _: {0, 1, 2, 3}, raising=False
    )
    assert resolve_host_assign(cfg) is True
    assert resolve_host_assign(tiny_cfg(tmp_path)) is False  # default off
    cfg2 = tiny_cfg(tmp_path, **{"TPU.HOST_ASSIGN": True})
    assert resolve_host_assign(cfg2) is True
    cfg3 = tiny_cfg(tmp_path)
    cfg3.TPU.HOST_ASSIGN = "always"
    with pytest.raises(ValueError):
        resolve_host_assign(cfg3)


def test_tta_device_aug_matches_host_path(tmp_path):
    """TPU.TTA_DEVICE_AUG A/B: on a constant image (bilinear-exact in both
    cv2 fixed point and float32, so the model inputs agree bitwise up to
    uint8 casting) the on-device aug path must reproduce the host cv2
    path's detections; the steps cache must show fused device programs."""
    from dafne_tpu.engine.tta import BucketedEvalSteps, tta_inference_single
    from dafne_tpu.models import build_model

    cfg = tiny_cfg(
        tmp_path,
        **{
            "TEST.AUG.MIN_SIZES": "(128, 256)",
            "TEST.AUG.MAX_SIZE": "256",
            "TEST.AUG.HFLIP": "True",
            "TEST.AUG.VFLIP": "True",
        },
    )
    model = build_model(cfg)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3))
    )["params"]
    img = np.full((256, 256, 3), 77, np.uint8)

    steps_dev = BucketedEvalSteps(cfg, model)
    det_dev = tta_inference_single(cfg, steps_dev, params, img)
    assert any(isinstance(k, tuple) for k in steps_dev._steps), (
        "device path never engaged"
    )

    cfg_host = tiny_cfg(
        tmp_path,
        **{
            "TEST.AUG.MIN_SIZES": "(128, 256)",
            "TEST.AUG.MAX_SIZE": "256",
            "TEST.AUG.HFLIP": "True",
            "TEST.AUG.VFLIP": "True",
            "TPU.TTA_DEVICE_AUG": False,
        },
    )
    det_host = tta_inference_single(
        cfg_host, BucketedEvalSteps(cfg_host, model), params, img
    )
    assert len(det_dev["scores"]) == len(det_host["scores"])
    if len(det_dev["scores"]):
        # merge order may differ; sort both by (class, score)
        def order(d):
            k = np.lexsort((d["scores"], d["classes"]))
            return {x: d[x][k] for x in ("corners", "scores", "classes")}

        a, b = order(det_dev), order(det_host)
        np.testing.assert_array_equal(a["classes"], b["classes"])
        np.testing.assert_allclose(a["scores"], b["scores"], atol=1e-4)
        np.testing.assert_allclose(a["corners"], b["corners"], atol=0.1)


def test_tta_device_aug_rotation_fallback(tmp_path):
    """Arbitrary-angle rotation TTA copies are non-separable: they must run
    through the host cv2 fallback while the separable copies of the same
    image still ride the device path — mixed, in one call."""
    from dafne_tpu.data.datasets.synthetic import load_synthetic
    from dafne_tpu.engine.tta import BucketedEvalSteps, tta_inference_single
    from dafne_tpu.models import build_model

    cfg = tiny_cfg(
        tmp_path,
        **{
            "TEST.AUG.MIN_SIZES": "(128,)",
            "TEST.AUG.MAX_SIZE": "128",
            "TEST.AUG.ROTATION_ANGLES": "(45, 90)",
            "TEST.AUG.HFLIP": "False",
        },
    )
    model = build_model(cfg)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3))
    )["params"]
    steps = BucketedEvalSteps(cfg, model)
    rec = load_synthetic("val", 1)[0]
    det = tta_inference_single(cfg, steps, params, rec["image"])
    assert det["corners"].shape[1] == 8
    keys = list(steps._steps)
    assert any(isinstance(k, tuple) for k in keys), keys  # fused programs
    assert any(isinstance(k, int) for k in keys), keys  # host fallback step


def test_async_checkpoint_snapshot_survives_donation(tmp_path):
    """save_async must snapshot the device buffers BEFORE the train loop
    donates them into the next step: after enqueuing a save, donate the
    state into a jitted update that overwrites every buffer, then restore
    — the checkpoint must hold the AT-SAVE values, not the updated (or
    corrupted) ones.  Also covers worker-thread error surfacing."""
    from dafne_tpu.engine.checkpoint import Checkpointer
    from dafne_tpu.engine.train_loop import build_state
    from dafne_tpu.models import build_model

    cfg = tiny_cfg(tmp_path)
    model = build_model(cfg)
    state, _, _ = build_state(cfg, model, (128, 128))
    state = state.replace(step=jnp.asarray(11, jnp.int32))
    at_save = np.asarray(
        state.params["head"]["cls_tower"]["conv0"]["kernel"]
    ).copy()

    ck = Checkpointer(str(tmp_path))
    ck.save_async(11, state)

    # immediately clobber the donated buffers, like the train loop does
    @jax.jit
    def clobber(s):
        return s.replace(
            params=jax.tree_util.tree_map(lambda x: x * 0 - 1.0, s.params)
        )

    clobber = jax.jit(clobber, donate_argnums=(0,))
    state = clobber(state)
    jax.block_until_ready(state.params)
    ck.wait()

    state2, _, _ = build_state(cfg, model, (128, 128), rng=jax.random.PRNGKey(1))
    restored, step = ck.restore(state2)
    assert step == 11
    np.testing.assert_allclose(
        np.asarray(restored.params["head"]["cls_tower"]["conv0"]["kernel"]),
        at_save,
    )


def test_benchmark_train_bucketed_tool(tmp_path):
    """tools/benchmark.py --task train on a bucketed ms recipe: reports
    per-canvas ms and the exact scale-weighted expected step time (the
    round-5 headline measurement path — guard it from rot)."""
    import json
    import subprocess
    import sys

    env = dict(os.environ, DAFNE_PLATFORM="cpu")
    r = subprocess.run(
        [sys.executable, "tools/benchmark.py",
         "--config-file", "configs/synthetic/base.yaml",
         "--task", "train", "--iters", "4", "--warmup", "1",
         "--batch-size", "2",
         "MODEL.RESNETS.DEPTH", "18",
         "MODEL.RESNETS.RES2_OUT_CHANNELS", "16",
         "MODEL.RESNETS.STEM_OUT_CHANNELS", "8",
         "MODEL.FPN.OUT_CHANNELS", "16",
         "MODEL.DAFNE.NUM_CLS_CONVS", "1",
         "MODEL.DAFNE.NUM_BOX_CONVS", "1",
         "TPU.COMPUTE_DTYPE", "float32",
         "INPUT.MIN_SIZE_TRAIN", "[64, 256]",
         "INPUT.MAX_SIZE_TRAIN", "256",
         "DEBUG.OVERFIT_NUM_IMAGES", "4",
         "TPU.TRAIN_DEVICE_AUG", "False"],
        capture_output=True, text=True, timeout=900,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
    )
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    out = json.loads(
        [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert out["bucketed"] is True
    assert len(out["per_canvas_ms"]) >= 2
    assert out["expected_step_ms"] is not None
    # expectation is a convex combination of the per-canvas times
    vals = list(out["per_canvas_ms"].values())
    assert min(vals) - 1e-6 <= out["expected_step_ms"] <= max(vals) + 1e-6
    assert out["device_aug"] is False


def test_benchmark_train_device_aug_tool(tmp_path):
    """tools/benchmark.py --task train with TPU.TRAIN_DEVICE_AUG: the staged
    batches ship base images + warp vectors and the measured step renders
    the augmented canvas on device — the benchmark must measure the step
    the recipe actually runs, not silently fall back to the host-aug
    program (the round-5 A/B measurement path)."""
    import json
    import subprocess
    import sys

    env = dict(os.environ, DAFNE_PLATFORM="cpu")
    r = subprocess.run(
        [sys.executable, "tools/benchmark.py",
         "--config-file", "configs/synthetic/base.yaml",
         "--task", "train", "--iters", "4", "--warmup", "1",
         "--batch-size", "2",
         "MODEL.RESNETS.DEPTH", "18",
         "MODEL.RESNETS.RES2_OUT_CHANNELS", "16",
         "MODEL.RESNETS.STEM_OUT_CHANNELS", "8",
         "MODEL.FPN.OUT_CHANNELS", "16",
         "MODEL.DAFNE.NUM_CLS_CONVS", "1",
         "MODEL.DAFNE.NUM_BOX_CONVS", "1",
         "TPU.COMPUTE_DTYPE", "float32",
         "INPUT.MIN_SIZE_TRAIN", "[64, 256]",
         "INPUT.MAX_SIZE_TRAIN", "256",
         "DEBUG.OVERFIT_NUM_IMAGES", "4",
         "TPU.TRAIN_DEVICE_AUG", "True"],
        capture_output=True, text=True, timeout=900,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
    )
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    out = json.loads(
        [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert out["device_aug"] is True
    assert out["bucketed"] is True
    assert len(out["per_canvas_ms"]) >= 2
