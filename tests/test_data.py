"""Data layer tests: transforms, mapper, loader, samplers."""

import numpy as np
import pytest

from dafne_tpu.config import get_cfg
from dafne_tpu.data import transforms as T
from dafne_tpu.data.datasets.synthetic import load_synthetic
from dafne_tpu.data.loader import DataLoader, repeat_factors
from dafne_tpu.data.mapper import DatasetMapper, pad_target_hw


def syn_cfg(**kw):
    cfg = get_cfg()
    cfg.merge_from_file("configs/synthetic/base.yaml")
    for k, v in kw.items():
        cfg.merge_from_list([k, str(v)])
    return cfg


# ---------------------------------------------------------------- transforms


def test_affine_flip_roundtrip():
    aug = T.hflip(100, 80)
    pts = np.asarray([[10.0, 20.0], [90.0, 60.0]])
    out = aug.apply_coords(pts)
    np.testing.assert_allclose(out, [[90, 20], [10, 60]])
    np.testing.assert_allclose(aug.invert_coords(out), pts)


def test_affine_rotation_90_exact():
    # 90deg rotation about center of a 100x100 image maps (x, y) -> ...
    aug = T.rotation(100, 100, 90)
    c = np.asarray([[50.0, 50.0]])  # center fixed point
    np.testing.assert_allclose(aug.apply_coords(c), c, atol=1e-9)
    p = np.asarray([[10.0, 20.0]])
    out = aug.apply_coords(p)
    np.testing.assert_allclose(aug.invert_coords(out), p, atol=1e-9)
    # distance to center preserved
    assert np.linalg.norm(out - c) == pytest.approx(np.linalg.norm(p - c))


def test_affine_compose_matches_sequential():
    a = T.hflip(100, 80)
    b = T.resize(100, 80, 50, 40)
    ab = a.compose(b)
    pts = np.asarray([[10.0, 20.0], [70.0, 60.0]])
    np.testing.assert_allclose(
        ab.apply_coords(pts), b.apply_coords(a.apply_coords(pts))
    )
    assert (ab.out_w, ab.out_h) == (50, 40)


def test_shortest_edge_resize():
    aug = T.shortest_edge_resize(200, 100, 50, 1000)
    assert (aug.out_w, aug.out_h) == (100, 50)
    aug2 = T.shortest_edge_resize(200, 100, 50, 80)  # capped by max_size
    assert aug2.out_w == 80


def test_min_size_train_range_sampling():
    """INPUT.MIN_SIZE_TRAIN_SAMPLING=range draws uniform shortest edges in
    [lo, hi] (Detectron2 ResizeShortestEdge 'range' semantics)."""
    cfg = syn_cfg()
    cfg.defrost()
    cfg.INPUT.RESIZE_TYPE = "shortest-edge"
    cfg.INPUT.MIN_SIZE_TRAIN = (400, 800)
    cfg.INPUT.MIN_SIZE_TRAIN_SAMPLING = "range"
    cfg.INPUT.MAX_SIZE_TRAIN = 4000
    cfg.INPUT.ROTATION_AUG_ANGLES = []
    cfg.freeze()
    rng = np.random.RandomState(0)
    edges = set()
    for _ in range(64):
        aug = T.build_train_augmentations(cfg, 1000, 1200, rng)
        edge = min(aug.out_w, aug.out_h)
        assert 400 <= edge <= 800
        edges.add(edge)
    assert len(edges) > 10, "range sampling should produce many sizes"
    # choice mode only ever picks the listed values
    cfg.defrost()
    cfg.INPUT.MIN_SIZE_TRAIN_SAMPLING = "choice"
    cfg.freeze()
    for _ in range(16):
        aug = T.build_train_augmentations(cfg, 1000, 1200, rng)
        assert min(aug.out_w, aug.out_h) in (400, 800)


def test_affine_image_matches_coords():
    import cv2

    img = np.zeros((64, 64, 3), np.uint8)
    img[10:20, 30:40] = 255
    aug = T.hflip(64, 64)
    out = aug.apply_image(img)
    # the white block should now be mirrored in x
    ys, xs = np.where(out[:, :, 0] > 0)
    assert xs.min() == 64 - 40 and xs.max() == 64 - 31


# ------------------------------------------------------------------- mapper


def test_mapper_shapes_and_sorting():
    cfg = syn_cfg()
    rec = load_synthetic("train", 2)[0]
    mapper = DatasetMapper(cfg, train=True, pad_hw=pad_target_hw(cfg, True))
    ex = mapper(rec, np.random.RandomState(0))
    assert ex["image"].shape == (256, 256, 3)
    m = cfg.TPU.MAX_INSTANCES
    assert ex["gt_corners"].shape == (m, 8)
    assert ex["gt_valid"].sum() == len(rec["annotations"])
    # corners canonically sorted: first vertex is leftmost
    v = ex["gt_corners"][ex["gt_valid"]]
    np.testing.assert_allclose(v[:, 0], v[:, 0::2].min(1), atol=1e-4)
    # areas positive, hbox encloses corners
    assert (ex["gt_area"][ex["gt_valid"]] > 0).all()


def test_mapper_eval_scale():
    cfg = syn_cfg()
    cfg.INPUT.MIN_SIZE_TEST = 128
    cfg.INPUT.MAX_SIZE_TEST = 128
    rec = load_synthetic("val", 1)[0]  # 256x256 source
    mapper = DatasetMapper(cfg, train=False, pad_hw=(128, 128))
    ex = mapper(rec)
    np.testing.assert_allclose(ex["scale_xy"], [2.0, 2.0])
    # corners are in resized coords; scaling back must land inside original
    v = ex["gt_corners"][ex["gt_valid"]] * 2.0
    assert v.min() >= -1 and v.max() <= 257


# ------------------------------------------------------------------- loader


def test_train_loader_batches():
    cfg = syn_cfg()
    records = load_synthetic("train", 8)
    loader = DataLoader(cfg, records, batch_size=4, train=True, num_workers=2)
    it = iter(loader)
    b = next(it)
    assert b["image"].shape == (4, 256, 256, 3)
    assert b["gt_corners"].shape[0] == 4
    b2 = next(it)
    assert not np.array_equal(b["image"], b2["image"])


def test_eval_loader_padding():
    cfg = syn_cfg()
    records = load_synthetic("val", 5)
    loader = DataLoader(cfg, records, batch_size=4, train=False, num_workers=0)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[1]["batch_valid"].sum() == 1  # 5 = 4 + 1


def test_repeat_factors():
    # rare class gets repeated
    records = [
        {"annotations": [{"category_id": 0}]},
        {"annotations": [{"category_id": 0}]},
        {"annotations": [{"category_id": 0}]},
        {"annotations": [{"category_id": 1}]},  # freq 0.25
    ]
    f = repeat_factors(records, threshold=0.5)
    np.testing.assert_allclose(f[:3], 1.0)
    assert f[3] == pytest.approx(np.sqrt(0.5 / 0.25))


def test_cfgnode_pickle_roundtrip():
    import pickle

    cfg = syn_cfg()
    cfg.freeze()
    clone = pickle.loads(pickle.dumps(cfg))
    assert clone.MODEL.DAFNE.NUM_CLASSES == cfg.MODEL.DAFNE.NUM_CLASSES
    assert clone.is_frozen()
    import pytest as _pytest

    with _pytest.raises(AttributeError):
        clone.SOLVER.BASE_LR = 1.0


def test_grain_loader_backend():
    from dafne_tpu.data.grain_loader import GrainDataLoader, build_data_loader

    cfg = syn_cfg()
    cfg.DATALOADER.BACKEND = "grain"
    cfg.DATALOADER.NUM_WORKERS = 0  # in-process (spawn needs a real __main__)
    records = load_synthetic("train", 8)
    loader = build_data_loader(cfg, records, batch_size=4, train=True)
    assert isinstance(loader, GrainDataLoader)
    it = iter(loader)
    b = next(it)
    assert b["image"].shape == (4, 256, 256, 3)
    assert b["gt_corners"].shape[0] == 4

    # eval iteration pads the short final batch
    ev = GrainDataLoader(cfg, load_synthetic("val", 5), 4, train=False,
                         num_workers=0)
    batches = list(ev)
    assert len(batches) == 2
    assert batches[-1]["batch_valid"].sum() == 1


def test_axis_aligned_fast_path_matches_warpaffine():
    """Flips/rot90/flip-of-resize render identically through the numpy/cv2
    fast path and the general cv2.warpAffine path (the fast path must be a
    pure optimization, never a semantics change)."""
    import cv2

    from dafne_tpu.data import transforms as T

    rng = np.random.RandomState(0)
    img = (rng.rand(96, 128, 3) * 255).astype(np.uint8)
    h, w = img.shape[:2]
    sq = (rng.rand(64, 64, 3) * 255).astype(np.uint8)

    cases = [
        (T.hflip(w, h), img),
        (T.vflip(w, h), img),
        (T.rotation(64, 64, 90.0), sq),
        (T.rotation(64, 64, 180.0), sq),
        (T.rotation(64, 64, 270.0), sq),
        (T.hflip(64, 64).compose(T.rotation(64, 64, 90.0)), sq),
        (T.resize(w, h, 64, 48).compose(T.hflip(64, 48)), img),
    ]
    for aug, src in cases:
        fast = aug._axis_aligned_fast(src)
        assert fast is not None, aug.matrix
        # general path: warpAffine with the center-convention offset
        m = aug.matrix
        lin = m[:, :2]
        a_img = np.hstack(
            [lin, (lin @ np.array([0.5, 0.5]) + m[:, 2] - 0.5)[:, None]]
        )
        ref = cv2.warpAffine(
            src, a_img.astype(np.float32), (aug.out_w, aug.out_h),
            flags=cv2.INTER_LINEAR,
        )
        diff = np.abs(fast.astype(int) - ref.astype(int))
        assert diff.max() <= 1, (aug.matrix, diff.max())  # 1 LSB rounding

    # rotation by 30 degrees must NOT take the fast path
    assert T.rotation(64, 64, 30.0)._axis_aligned_fast(sq) is None


def test_eval_pad_hw_tightens_canvas():
    """eval canvas derives from record dims; falls back to worst case."""
    from dafne_tpu.config import get_cfg
    from dafne_tpu.data.mapper import eval_pad_hw, pad_target_hw

    cfg = get_cfg()
    cfg.INPUT.RESIZE_TYPE = "shortest-edge"
    cfg.INPUT.MIN_SIZE_TEST = 800
    cfg.INPUT.MAX_SIZE_TEST = 1333
    cfg.TPU.IMAGE_SIZE_DIVISIBILITY = 128

    # HRSC-like: 1100x800 sources -> shortest edge 800 -> 1100x800 resized
    records = [{"width": 1100, "height": 800}, {"width": 900, "height": 700}]
    hw = eval_pad_hw(cfg, records)
    assert hw == (896, 1152), hw  # much tighter than worst (1408, 1408)
    assert pad_target_hw(cfg, train=False) == (1408, 1408)

    # missing dims -> worst case
    assert eval_pad_hw(cfg, [{"file_name": "x.png"}]) == (1408, 1408)

    # preloaded image provides dims
    import numpy as np

    rec = {"image": np.zeros((256, 512, 3), np.uint8)}
    hw2 = eval_pad_hw(cfg, [rec])
    assert hw2[0] <= 1024 and hw2[1] <= 1408


def test_grain_loader_determinism_and_multiworker():
    """Same seed -> identical batch stream (incl. augmentation RNG) across
    fresh loader instances and across worker counts; the CfgNode pickling
    path (__reduce__) is exercised by the worker-transform construction."""
    from dafne_tpu.data.grain_loader import GrainDataLoader

    cfg = syn_cfg()
    cfg.DATALOADER.BACKEND = "grain"
    records = load_synthetic("train", 8)

    def first_batches(workers, seed, n=3):
        dl = GrainDataLoader(
            cfg, records, batch_size=4, train=True, seed=seed, num_workers=workers
        )
        it = iter(dl)
        return [next(it) for _ in range(n)]

    a = first_batches(0, seed=5)
    b = first_batches(0, seed=5)
    for ba, bb in zip(a, b):
        np.testing.assert_array_equal(ba["image"], bb["image"])
        np.testing.assert_array_equal(ba["gt_corners"], bb["gt_corners"])

    c = first_batches(0, seed=6)
    assert any(
        not np.array_equal(ba["image"], bc["image"]) for ba, bc in zip(a, c)
    ), "different seeds must differ"


def test_grain_eval_epoch_is_exactly_one_pass():
    """Eval iteration yields each record exactly once, in order, then stops."""
    from dafne_tpu.data.grain_loader import GrainDataLoader

    cfg = syn_cfg()
    records = load_synthetic("val", 7)
    dl = GrainDataLoader(cfg, records, batch_size=3, train=False, num_workers=0)
    seen = []
    for batch in dl:
        for i, valid in enumerate(batch["batch_valid"]):
            if valid:
                seen.append(batch["image_id"][i])
    assert seen == [r["image_id"] for r in records]
    # second iteration restarts cleanly (fresh epoch)
    n2 = sum(int(b["batch_valid"].sum()) for b in dl)
    assert n2 == 7


def test_color_augmentations_match_detectron2_formulas():
    """apply_color_augmentations reproduces the reference's exact aug stack
    (plain_train_net.py:259-268): RandomLighting(1.0) then brightness /
    contrast / saturation each U(0.5, 1.5), as d2 BlendTransforms with
    uint8 clip+truncate between stages.  The expectation below is an
    independent step-by-step restatement of the d2 formulas."""
    rng = np.random.RandomState(7)
    img = np.random.RandomState(0).randint(0, 256, (23, 31, 3), np.uint8)
    got = T.apply_color_augmentations(img, rng)
    assert got.dtype == np.uint8

    # independent restatement with an identically-seeded rng
    r2 = np.random.RandomState(7)
    x = img.astype(np.float32)
    u8 = lambda a: np.clip(a, 0, 255).astype(np.uint8)
    # RandomLighting(scale=1.0): img + eigvecs @ (normal(3) * eigvals)
    vecs = np.array([[-0.5675, 0.7192, 0.4009],
                     [-0.5808, -0.0045, -0.8140],
                     [-0.5836, -0.6948, 0.4203]])
    vals = np.array([0.2175, 0.0188, 0.0045])
    x = u8(x + vecs.dot(r2.normal(scale=1.0, size=3) * vals))
    w = r2.uniform(0.5, 1.5)                      # brightness: w * img
    x = u8(w * x.astype(np.float32))
    w = r2.uniform(0.5, 1.5)                      # contrast: blend with mean
    # d2 takes .mean() of the raw uint8 array -> float64
    x = u8((1 - w) * x.mean(dtype=np.float64) + w * x.astype(np.float32))
    w = r2.uniform(0.5, 1.5)                      # saturation: blend with gray
    # d2 dots the raw array with float64 coefficients -> float64 grayscale
    gray = x.astype(np.float64).dot([0.299, 0.587, 0.114])[:, :, None]
    x = u8((1 - w) * gray + w * x.astype(np.float32))
    np.testing.assert_array_equal(got, x)

    # float input stays float (no clipping -- d2 BlendTransform float path)
    rng = np.random.RandomState(3)
    f = np.random.RandomState(1).uniform(0, 255, (9, 9, 3)).astype(np.float32)
    out = T.apply_color_augmentations(f, rng)
    assert out.dtype == np.float32

    # distribution sanity: intensity factors really span 0.5-1.5 (the old
    # implementation used 0.9-1.1 -- this guards the documented knob)
    factors = []
    base = np.full((8, 8, 3), 100, np.uint8)
    for seed in range(200):
        r = np.random.RandomState(seed)
        r.normal(scale=1.0, size=3)  # skip lighting draws
        factors.append(r.uniform(0.5, 1.5))
    assert min(factors) < 0.6 and max(factors) > 1.4


# ------------------------------------------------- bucketed multi-scale train


def test_train_scale_buckets_ladder():
    """TrainScaleBuckets (TPU.BUCKETED_TRAIN): ladder bounded by
    TRAIN_MAX_BUCKETS, every scale's resize fits its canvas, canvases never
    exceed the worst-case static canvas, draws deterministic per rng seed
    (the multi-process agreement contract)."""
    from dafne_tpu.data.mapper import train_canvas_buckets

    cfg = syn_cfg(**{
        "INPUT.MIN_SIZE_TRAIN": "[64, 128, 192, 256]",
        "INPUT.MAX_SIZE_TRAIN": 256,
        "TPU.TRAIN_MAX_BUCKETS": 2,
    })
    records = load_synthetic("train", 8)
    b = train_canvas_buckets(cfg, records)
    assert b is not None
    assert 2 >= len(b.canvases) >= 2  # 64..256 cannot share one 128-div canvas
    areas = [h * w for h, w in b.canvases]
    assert areas == sorted(areas)
    worst = pad_target_hw(cfg, train=True)
    for s in b.sizes:
        ch, cw = b.canvas_for(s)
        assert ch <= worst[0] and cw <= worst[1]
        for r in records:
            a = T.shortest_edge_resize(
                r["width"], r["height"], s, cfg.INPUT.MAX_SIZE_TRAIN
            )
            assert a.out_h <= ch and a.out_w <= cw, (s, (ch, cw))
    # same seed -> identical per-batch draw sequence on every process
    seq_a = [b.draw(np.random.RandomState(7)) for _ in range(1)]
    ra, rb = np.random.RandomState(7), np.random.RandomState(7)
    assert [b.draw(ra) for _ in range(16)] == [b.draw(rb) for _ in range(16)]
    # draws come from the configured scale set with their ladder canvas
    rc = np.random.RandomState(3)
    for _ in range(16):
        s, hw = b.draw(rc)
        assert s in b.sizes and hw == b.canvas_for(s)


def test_train_canvas_buckets_gating():
    """Bucketing only engages when it can help: off-flag, single scale, or a
    one-canvas ladder all fall back to the static path (None)."""
    from dafne_tpu.data.mapper import train_canvas_buckets

    records = load_synthetic("train", 4)
    assert train_canvas_buckets(syn_cfg(), records) is None  # single scale
    cfg = syn_cfg(**{
        "INPUT.MIN_SIZE_TRAIN": "[128, 256]", "TPU.BUCKETED_TRAIN": False,
    })
    assert train_canvas_buckets(cfg, records) is None  # flag off
    # two scales that land on the SAME 128-divisible canvas: no ladder
    cfg = syn_cfg(**{
        "INPUT.MIN_SIZE_TRAIN": "[224, 256]", "INPUT.MAX_SIZE_TRAIN": 256,
    })
    assert train_canvas_buckets(cfg, records) is None
    # "range" sampling builds a grid ladder
    cfg = syn_cfg(**{
        "INPUT.MIN_SIZE_TRAIN": "[64, 256]",
        "INPUT.MIN_SIZE_TRAIN_SAMPLING": "range",
        "INPUT.MAX_SIZE_TRAIN": 256,
    })
    b = train_canvas_buckets(cfg, records)
    assert b is not None and len(b.canvases) >= 2
    # range draws stay in [lo, hi] and get a canvas that fits them
    rng = np.random.RandomState(0)
    for _ in range(32):
        s, (ch, cw) = b.draw(rng)
        assert 64 <= s <= 256
        for r in records:
            a = T.shortest_edge_resize(r["width"], r["height"], s, 256)
            assert a.out_h <= ch and a.out_w <= cw


def test_bucketed_loader_batch_shapes_and_coords():
    """The bucketed loader yields batches shaped by the per-batch draw, with
    gt coordinates consistent with the drawn scale (corners inside the
    resized extent), and two same-seed loaders agree batch-for-batch on the
    canvas (process-agreement contract)."""
    from dafne_tpu.data.mapper import train_canvas_buckets

    cfg = syn_cfg(**{
        "INPUT.MIN_SIZE_TRAIN": "[64, 128, 256]",
        "INPUT.MAX_SIZE_TRAIN": 256,
    })
    records = load_synthetic("train", 8)
    buckets = train_canvas_buckets(cfg, records)
    assert buckets is not None

    def shapes(n):
        loader = DataLoader(
            cfg, records, batch_size=4, train=True, num_workers=0,
            seed=5, buckets=buckets,
        )
        out = []
        it = iter(loader)
        for _ in range(n):
            b = next(it)
            hw = b["image"].shape[1:3]
            assert tuple(hw) in [tuple(c) for c in buckets.canvases]
            # gt stays inside the canvas (coords follow the drawn scale)
            v = b["gt_corners"][b["gt_valid"]]
            if len(v):
                assert v[:, 0::2].max() <= hw[1] + 1
                assert v[:, 1::2].max() <= hw[0] + 1
            out.append((tuple(hw), b["image"].sum()))
        return out

    a, b = shapes(6), shapes(6)
    assert a == b  # same seed -> identical draws AND identical batches
    assert len({hw for hw, _ in a}) >= 2  # ladder actually mixes canvases
