"""Training and evaluation driver loops.

Re-design of tools/plain_train_net.py's do_train/do_test (390-492, 316-336)
for single-program SPMD: ONE process drives the whole mesh; the train step
is jitted once with donated state; batches stream from the host loader with
the leading axis sharded over the mesh "data" axis.  NaN detection, periodic
eval, checkpointing and metric writing mirror the reference loop.
"""

from __future__ import annotations

import logging
import math
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dafne_tpu.data import DatasetCatalog, get_dataset, register_all_datasets
from dafne_tpu.data.grain_loader import build_data_loader
from dafne_tpu.data.mapper import pad_target_hw
from dafne_tpu.engine.checkpoint import Checkpointer
from dafne_tpu.engine.events import build_writers
from dafne_tpu.engine.optimizer import auto_scale_config, build_optimizer
from dafne_tpu.engine.trainer import (
    _AUG_KEYS,
    TrainState,
    make_eval_step,
    make_host_assign_fn,
    make_train_step,
    resolve_host_assign,
    resolve_train_device_aug,
)
from dafne_tpu.ops.postprocess import DecodeSpec
from dafne_tpu.ops.targets import AssignmentSpec
from dafne_tpu.evaluation import build_evaluator
from dafne_tpu.models import build_model
from dafne_tpu.parallel import (
    batch_sharding,
    create_mesh,
    replicate_to_mesh,
    replicated_sharding,
)
from dafne_tpu.parallel.mesh import mesh_from_config

logger = logging.getLogger("dafne_tpu")

_GT_KEYS = ("gt_corners", "gt_hbox", "gt_classes", "gt_area", "gt_valid")
_DEVICE_KEYS = ("image",) + _GT_KEYS


def _batch_canvas_hw(batch) -> tuple:
    """The train canvas a batch renders at: the image dims on the host-aug
    path, the warp-vector canvas dims on the device-aug path (where the
    canvas does not exist until the step renders it)."""
    if "image" in batch:
        return tuple(batch["image"].shape[1:3])
    return (batch["aug_idx0_h"].shape[1], batch["aug_idx0_w"].shape[1])

# jitted eval steps cached across do_test calls (keyed by model + canvas +
# decode/assign specs, all hashable frozen dataclasses), so periodic
# in-training evals reuse the compiled program instead of re-tracing
_EVAL_STEP_CACHE: Dict = {}


def _scales_file_key(path: str):
    """Cache-key component for an int8 scales JSON: path + mtime + size."""
    if not path:
        return ""
    try:
        st = os.stat(path)
        return (path, st.st_mtime_ns, st.st_size)
    except OSError:
        return (path, "missing")


def setup_logging(output_dir: Optional[str] = None):
    handlers = [logging.StreamHandler()]
    if output_dir:
        os.makedirs(output_dir, exist_ok=True)
        handlers.append(logging.FileHandler(os.path.join(output_dir, "log.txt")))
    logging.basicConfig(
        level=logging.INFO,
        format="[%(asctime)s %(name)s] %(message)s",
        handlers=handlers,
        force=True,
    )


def build_state(cfg, model, image_hw, rng=None):
    import jax.random as jrandom

    rng = rng if rng is not None else jrandom.PRNGKey(max(cfg.SEED, 0))
    h, w = image_hw
    variables = model.init(rng, jnp.zeros((1, h, w, 3)))
    params = variables["params"]
    tx, schedule = build_optimizer(cfg, params)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params),
        tx=tx, batch_stats=variables.get("batch_stats"),
    )
    return state, tx, schedule


def do_test(
    cfg, model, params, output_dir=None, step: int = 0, batch_stats=None
) -> Dict[str, Dict[str, float]]:
    """Evaluate on every cfg.DATASETS.TEST dataset (plain_train_net.py:316-336).

    Multi-process: every process runs the same jitted step on its slice of
    the global eval batch; decode outputs come back REPLICATED (the
    in-program all-gather replaces the reference's torch.distributed
    prediction gather) and only process 0 feeds the evaluator / writes
    artifacts."""
    from dafne_tpu.data.mapper import eval_pad_hw
    from dafne_tpu.parallel import distributed as dist

    results = {}
    mesh = mesh_from_config(cfg)
    n_mesh_dev = int(np.prod(mesh.devices.shape))
    pc = jax.process_count()
    # use the sharded path whenever the mesh has more than one device —
    # including single-process multi-chip, where plain jnp.asarray would
    # compile a one-device program and idle the rest of the slice
    use_mesh = n_mesh_dev > 1
    if use_mesh:
        params = replicate_to_mesh(params, mesh)
        if batch_stats is not None:
            batch_stats = replicate_to_mesh(batch_stats, mesh)

        from dafne_tpu.parallel import shard_batch

        # images over data AND the spatial axis when the mesh has one, same
        # as the train path (§5.7): halves per-device activation memory on
        # large eval canvases; exactness vs single-device is pinned by
        # tests/test_parallel.py::test_eval_step_under_mesh_matches_single_device
        spatial = "spatial" if "spatial" in mesh.axis_names else None

        def to_device(batch):
            d = shard_batch(
                {"image": batch["image"], "scale_xy": batch["scale_xy"]},
                mesh,
                spatial_axis=spatial,
            )
            return d["image"], d["scale_xy"]
    else:
        def to_device(batch):
            return jnp.asarray(batch["image"]), jnp.asarray(batch["scale_xy"])

    is_main = dist.is_main_process()
    for dataset_name in cfg.DATASETS.TEST:
        records = get_dataset(dataset_name, cfg)
        # tight per-dataset canvas (record dims, no image IO) instead of the
        # worst-case INPUT.MAX_SIZE_TEST square; compiled steps cached per
        # size ACROSS do_test calls (periodic in-training evals would
        # otherwise re-trace and pay the 1-5 min remote compile every time)
        pad_hw = eval_pad_hw(cfg, records)
        cache_key = (
            model,
            pad_hw,
            use_mesh,
            DecodeSpec.from_config(cfg, train=False),
            AssignmentSpec.from_config(cfg),
            # quantization mode changes the emitted program (layers/quant.py);
            # key the scales by file identity+mtime, not just path — a
            # recalibration overwriting the same JSON must not silently
            # reuse the program compiled with the old scales
            bool(cfg.TPU.get("EVAL_INT8", False)),
            int(cfg.TPU.get("EVAL_INT8_MIN_CHANNELS", 0)),
            _scales_file_key(cfg.TPU.get("EVAL_INT8_SCALES", "")),
        )
        if cache_key not in _EVAL_STEP_CACHE:
            if len(_EVAL_STEP_CACHE) > 32:
                _EVAL_STEP_CACHE.clear()
            fn = make_eval_step(model, cfg, pad_hw)
            _EVAL_STEP_CACHE[cache_key] = jax.jit(
                fn, out_shardings=replicated_sharding(mesh)
            ) if use_mesh else jax.jit(fn)
        eval_step = _EVAL_STEP_CACHE[cache_key]
        batch_size = max(1, int(cfg.TPU.EVAL_BATCH))
        if use_mesh:
            # the global eval batch must split evenly over the mesh data
            # axis AND over the loader's per-process slicing
            n_data = int(mesh.shape.get("data", 1))
            q = math.lcm(n_data, pc)
            batch_size = max(q, (batch_size // q) * q)
        loader = build_data_loader(
            cfg, records, batch_size=batch_size, train=False, pad_hw=pad_hw
        )
        out_dir = (
            os.path.join(output_dir, "inference", dataset_name) if output_dir else None
        )
        evaluator = build_evaluator(cfg, dataset_name, records, out_dir)
        t0 = time.perf_counter()
        n_images = 0
        # one-batch pipelining: dispatch batch i+1 before fetching batch i
        pending = None
        for batch in loader:
            images, scale_xy = to_device(batch)
            det = eval_step(params, images, scale_xy, batch_stats)
            if pending is not None:
                pb, pd = pending
                pd = {k: np.asarray(v) for k, v in pd.items()}
                if is_main:
                    evaluator.process_batch(pb, pd)
                n_images += int(pb["batch_valid"].sum())
            pending = (batch, det)
        if pending is not None:
            pb, pd = pending
            pd = {k: np.asarray(v) for k, v in pd.items()}
            if is_main:
                evaluator.process_batch(pb, pd)
            n_images += int(pb["batch_valid"].sum())
        dt = time.perf_counter() - t0
        if not is_main:
            results[dataset_name] = {}
            continue
        from dafne_tpu.data import MetadataCatalog

        meta = MetadataCatalog.get(dataset_name, {})
        has_gt = any(r.get("annotations") for r in records)
        if meta.get("is_test") and not has_gt:
            # unlabeled test split: Task1 files -> cross-tile merge -> zip
            # (dota_evaluation.py:344-351); no AP computable locally
            res = {}
            if out_dir:
                task1 = os.path.join(out_dir, "task1")
                evaluator.write_task1_files(task1)
                if meta.get("evaluator_type") == "dota":
                    from dafne_tpu.evaluation.result_merge import (
                        make_submission_zip, merge_by_poly,
                    )

                    merged = os.path.join(out_dir, "task1_merged")
                    merge_by_poly(task1, merged)
                    zp = make_submission_zip(
                        merged, os.path.join(out_dir, "submission.zip")
                    )
                    logger.info(f"wrote submission {zp}")
        else:
            res = evaluator.evaluate()
            if out_dir:
                evaluator.render_samples(cfg.TEST.NUM_PRED_VIS)
        logger.info(
            f"eval {dataset_name}: {n_images} images in {dt:.1f}s "
            f"({n_images / max(dt, 1e-9):.2f} img/s) mAP={res.get('mAP', 0):.2f}"
        )
        results[dataset_name] = res
        if output_dir and res:
            save_test_results(output_dir, dataset_name, step, res)
    return results


def save_test_results(output_dir, dataset_name, step, res):
    """Append per-iteration AP rows to a CSV (save_test_results,
    plain_train_net.py:360-374)."""
    import csv

    path = os.path.join(output_dir, "test_results.csv")
    exists = os.path.exists(path)
    with open(path, "a") as f:
        w = csv.writer(f)
        if not exists:
            w.writerow(["iteration", "dataset", "metric", "value"])
        for k, v in sorted(res.items()):
            w.writerow([step, dataset_name, k, f"{v:.4f}"])


def _host_rss_gb() -> float:
    """Resident host memory of this process in GB (0.0 where /proc is
    absent).  Written with the periodic train metrics so a host-side leak —
    e.g. transfer-staging growth in an experimental backend client — shows
    up as a slope in metrics.json/TensorBoard long before the kernel
    OOM-killer ends the run without a traceback."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return round(int(line.split()[1]) / 1048576, 3)
    except OSError:
        pass
    return 0.0


def do_train(cfg, model, resume: bool = False):
    output_dir = cfg.OUTPUT_DIR
    os.makedirs(output_dir, exist_ok=True)
    if cfg.DEBUG.get("JAX_DEBUG_NANS", False):
        # checkify-style NaN tracing for the geometry/loss kernels (§5.2)
        jax.config.update("jax_debug_nans", True)
    mesh = mesh_from_config(cfg)
    n_dev = int(np.prod(mesh.devices.shape))
    cfg = auto_scale_config(cfg, n_dev) if cfg.SOLVER.REFERENCE_WORLD_SIZE else cfg
    batch_size = cfg.SOLVER.IMS_PER_BATCH
    assert batch_size % n_dev == 0, (batch_size, n_dev)

    pad_hw = pad_target_hw(cfg, train=True)

    # train data (records first: the bucketed ms-train ladder is computed
    # from record dims, like eval_pad_hw)
    from dafne_tpu.data.mapper import train_canvas_buckets

    train_records = []
    for name in cfg.DATASETS.TRAIN:
        train_records += get_dataset(name, cfg)
    buckets = train_canvas_buckets(cfg, train_records)
    if buckets is not None:
        logger.info(
            f"bucketed ms train: canvases {buckets.canvases} "
            f"(scales {buckets.sizes}, sampling {buckets.sampling})"
        )
    logger.info(f"devices={n_dev} batch={batch_size} pad_hw={pad_hw}")

    init_hw = buckets.canvases[0] if buckets is not None else pad_hw
    state, tx, schedule = build_state(cfg, model, init_hw)
    checkpointer = Checkpointer(output_dir)
    state, start_iter = checkpointer.resume_or_load(state, cfg, resume)

    # replicate state over the mesh; shard batches along "data" (+ images
    # along "spatial" when the mesh defines one — §5.7 spatial parallelism)
    from dafne_tpu.parallel import shard_batch

    state = replicate_to_mesh(state, mesh)
    spatial = "spatial" if "spatial" in mesh.axis_names else None

    # TPU.TRAIN_DEVICE_AUG: the loader ships base images + warp vectors and
    # the step renders the augmented canvas on device (trainer.py)
    use_device_aug = resolve_train_device_aug(cfg)
    aug_sharding = None
    if use_device_aug and n_dev > 1:
        from dafne_tpu.parallel.mesh import image_sharding

        aug_sharding = image_sharding(mesh, "data", spatial)

    # one compiled train step per distinct canvas (exactly one when
    # bucketing is off); params/opt state are shape-independent, so the
    # same donated state threads through whichever bucket's step runs
    donate = (0,) if cfg.TPU.DONATE_STATE else ()
    _step_fns: Dict = {}

    def get_step(hw):
        if hw not in _step_fns:
            _step_fns[hw] = jax.jit(
                make_train_step(model, cfg, hw, tx, schedule,
                                device_aug=use_device_aug,
                                aug_sharding=aug_sharding),
                donate_argnums=donate,
            )
        return _step_fns[hw]

    # TPU.HOST_ASSIGN: target assignment moves into the prefetch thread
    # (CPU backend), overlapping the running device step (engine/trainer.py);
    # one assign fn per canvas (location tables are canvas-shaped)
    use_host_assign = resolve_host_assign(cfg)
    _assign_fns: Dict = {}

    def get_host_assign(hw):
        if hw not in _assign_fns:
            _assign_fns[hw] = make_host_assign_fn(cfg, hw)
        return _assign_fns[hw]

    loader = build_data_loader(
        cfg, train_records, batch_size, train=True, seed=max(cfg.SEED, 0),
        buckets=buckets, device_aug=use_device_aug,
    )
    if use_device_aug and not getattr(loader, "device_aug", False):
        use_device_aug = False  # loader fallback (grain / dimless records)
        aug_sharding = None
        _step_fns.clear()
    logger.info(f"train records: {len(train_records)}")

    # host side effects (metric writers, RTPT) are process-0 only; orbax
    # checkpointing participates on every process (multihost-aware)
    from dafne_tpu.parallel import distributed as dist

    is_main = dist.is_main_process()
    max_iter = cfg.SOLVER.MAX_ITER
    writers = build_writers(output_dir, max_iter) if is_main else []

    from dafne_tpu.utils.rtpt import RTPT

    rtpt = RTPT(
        experiment_name=cfg.EXPERIMENT_NAME,
        max_iterations=max_iter,
        status_file=os.path.join(output_dir, "rtpt_status"),
    ) if is_main else None
    if rtpt:
        rtpt.start()
    eval_period = cfg.TEST.EVAL_PERIOD
    ckpt_period = cfg.SOLVER.CHECKPOINT_PERIOD

    profile_window = list(cfg.DEBUG.PROFILE_ITERS or [])
    if profile_window and len(profile_window) != 2:
        raise ValueError(
            f"DEBUG.PROFILE_ITERS must be [start, stop], got {profile_window}"
        )
    profiling_active = False  # stop_trace only after a matching start (resume
    # can land inside the window, where stop without start would raise)

    def device_batches():
        """Host batch -> sharded device arrays, prefetched one step ahead so
        the (potentially slow) host->HBM transfer overlaps the running step."""
        import queue as _queue
        import threading as _threading

        q: "_queue.Queue" = _queue.Queue(maxsize=cfg.TPU.PREFETCH_DEPTH)
        stop = _threading.Event()

        if use_device_aug:
            img_keys = ["image_base", "aug_out_hw", *_AUG_KEYS]
            if cfg.INPUT.USE_COLOR_AUGMENTATIONS:
                img_keys += ["color_light", "color_w"]
        else:
            img_keys = ["image"]

        def producer():
            try:
                for batch in loader:
                    if stop.is_set():
                        return
                    if use_host_assign:
                        # targets replace the gt_* arrays on device: the
                        # host-targets loss branch never reads them, so
                        # shipping them would be pure dead transfer
                        db = {k: batch[k] for k in img_keys}
                        db.update(
                            get_host_assign(_batch_canvas_hw(batch))(batch)
                        )
                    else:
                        db = {k: batch[k] for k in img_keys + list(_GT_KEYS)}
                    q.put(shard_batch(db, mesh, spatial_axis=spatial))
            except BaseException as e:  # surface in the consumer, don't hang
                q.put(e)

        t = _threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            # drain so a producer blocked in q.put observes the stop flag and
            # exits, releasing its prefetched HBM batches (same fix as
            # data/loader.py's _train_iter) instead of pinning them for the
            # rest of the process (final checkpoint + final eval compile)
            try:
                while True:
                    q.get_nowait()
            except _queue.Empty:
                pass

    data_iter = device_batches()
    metrics = None
    t_data = 0.0
    last_write = start_iter - 1  # iteration of the previous metric write
    for it in range(start_iter, max_iter):
        if profile_window and it == profile_window[0]:
            jax.profiler.start_trace(os.path.join(output_dir, "profile"))
            profiling_active = True
        if profiling_active and it == profile_window[1]:
            jax.profiler.stop_trace()
            profiling_active = False
            logger.info(f"profiler trace written to {output_dir}/profile")
        t0 = time.perf_counter()
        device_batch = next(data_iter)
        t_data += time.perf_counter() - t0
        step_fn = get_step(_batch_canvas_hw(device_batch))
        state, metrics = step_fn(state, device_batch)

        if (it + 1) % 20 == 0 or it == start_iter:
            host = {k: float(v) for k, v in metrics.items()}
            host["data_time"] = t_data / max(1, it - last_write)
            host["host_rss_gb"] = _host_rss_gb()
            last_write = it
            t_data = 0.0
            if cfg.DEBUG.NAN_CHECK and not host.get("loss_is_finite", 1.0):
                raise FloatingPointError(
                    f"Loss became non-finite at iteration {it}: {host}"
                )
            for w in writers:
                w.write(it + 1, host)
            if rtpt:
                rtpt.step(iteration=it + 1)

        if ckpt_period and (it + 1) % ckpt_period == 0:
            # async: the loop only pays an on-device snapshot copy; the
            # D2H fetch + orbax write run on the checkpointer's worker
            checkpointer.save_async(it + 1, state)
        if eval_period and (it + 1) % eval_period == 0 and (it + 1) != max_iter:
            do_test(cfg, model, state.params, output_dir, step=it + 1,
                    batch_stats=state.batch_stats)

    if profiling_active:  # window extended past max_iter
        jax.profiler.stop_trace()
    checkpointer.save_async(max_iter, state)
    checkpointer.wait()
    for w in writers:
        w.close()
    return state


def default_setup(cfg, args=None):
    """Register datasets + logging + snapshot the config into OUTPUT_DIR
    (plain_train_net.py:507-544 semantics)."""
    setup_logging(cfg.OUTPUT_DIR)
    register_all_datasets(cfg)
    os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)
    cfg.dump_to_file(os.path.join(cfg.OUTPUT_DIR, "config.yaml"))
