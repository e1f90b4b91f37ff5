"""Default configuration tree.

Covers the full knob surface of the reference (dafne/config/defaults.py:1-151
plus the Detectron2 base keys its shipped YAMLs exercise), with identical key
names so the reference's configs port 1:1, plus a new ``TPU`` namespace for
the knobs that only exist in this framework (static-shape padding sizes,
mesh layout, dtype policy).
"""

from __future__ import annotations

from dafne_tpu.config.config import CfgNode

INF = 100000000


def build_defaults() -> CfgNode:
    _C = CfgNode()
    _C.VERSION = 2
    _C.OUTPUT_DIR = "./output"
    _C.SEED = -1
    _C.EXPERIMENT_NAME = "dafne"
    _C.VIS_PERIOD = 0

    # ---------------------------------------------------------------- DEBUG
    _C.DEBUG = CfgNode()
    _C.DEBUG.OVERFIT_NUM_IMAGES = -1  # truncate datasets to N images (<0: off)
    _C.DEBUG.NAN_CHECK = True  # NaN/anomaly detection in the train loop
    _C.DEBUG.JAX_DEBUG_NANS = False  # jax_debug_nans kernel-level tracing
    _C.DEBUG.PROFILE_ITERS = []  # [start, stop] -> jax.profiler trace window

    # ---------------------------------------------------------------- MODEL
    _C.MODEL = CfgNode()
    _C.MODEL.META_ARCHITECTURE = "OneStageDetector"
    _C.MODEL.WEIGHTS = ""
    _C.MODEL.PIXEL_MEAN = [123.675, 116.28, 103.53]
    _C.MODEL.PIXEL_STD = [1.0, 1.0, 1.0]
    _C.MODEL.MASK_ON = False
    _C.MODEL.MOBILENET = False
    _C.MODEL.LOAD_PROPOSALS = False

    _C.MODEL.BACKBONE = CfgNode()
    _C.MODEL.BACKBONE.NAME = "build_dafne_resnet_fpn_backbone"
    _C.MODEL.BACKBONE.FREEZE_AT = 2
    _C.MODEL.BACKBONE.ANTI_ALIAS = False

    _C.MODEL.RESNETS = CfgNode()
    _C.MODEL.RESNETS.DEPTH = 50
    _C.MODEL.RESNETS.OUT_FEATURES = ["res3", "res4", "res5"]
    _C.MODEL.RESNETS.NUM_GROUPS = 1
    _C.MODEL.RESNETS.NORM = "FrozenBN"
    _C.MODEL.RESNETS.WIDTH_PER_GROUP = 64
    _C.MODEL.RESNETS.STEM_OUT_CHANNELS = 64
    _C.MODEL.RESNETS.RES2_OUT_CHANNELS = 256
    _C.MODEL.RESNETS.STRIDE_IN_1X1 = True
    _C.MODEL.RESNETS.RES5_DILATION = 1
    _C.MODEL.RESNETS.DEFORM_INTERVAL = 1
    _C.MODEL.RESNETS.DEFORM_ON_PER_STAGE = [False, False, False, False]
    _C.MODEL.RESNETS.DEFORM_MODULATED = False
    _C.MODEL.RESNETS.DEFORM_NUM_GROUPS = 1

    _C.MODEL.FPN = CfgNode()
    _C.MODEL.FPN.IN_FEATURES = ["res3", "res4", "res5"]
    _C.MODEL.FPN.OUT_CHANNELS = 256
    _C.MODEL.FPN.NORM = ""
    _C.MODEL.FPN.FUSE_TYPE = "sum"

    _C.MODEL.PROPOSAL_GENERATOR = CfgNode()
    _C.MODEL.PROPOSAL_GENERATOR.NAME = "DAFNe"
    _C.MODEL.PROPOSAL_GENERATOR.MIN_SIZE = 0

    _C.MODEL.TOP_MODULE = CfgNode()
    _C.MODEL.TOP_MODULE.NAME = ""  # can be "conv"
    _C.MODEL.TOP_MODULE.DIM = 16

    # DLA / VoVNet / MobileNet / ConvNeXt backbone families
    _C.MODEL.DLA = CfgNode()
    _C.MODEL.DLA.NORM = "BN"
    _C.MODEL.DLA.CONV_BODY = "DLA34"
    _C.MODEL.VOVNET = CfgNode()
    _C.MODEL.VOVNET.CONV_BODY = "V-39-eSE"
    _C.MODEL.VOVNET.NORM = "FrozenBN"
    _C.MODEL.VOVNET.OUT_FEATURES = ["stage3", "stage4", "stage5"]
    _C.MODEL.VOVNET.BACKBONE_OUT_CHANNELS = 256
    _C.MODEL.CONVNEXT = CfgNode()
    _C.MODEL.CONVNEXT.SIZE = "base"

    # ----------------------------------------------------------- DAFNe head
    d = _C.MODEL.DAFNE = CfgNode()
    d.NUM_CLASSES = 15
    d.IN_FEATURES = ["p3", "p4", "p5", "p6", "p7"]
    d.FPN_STRIDES = [8, 16, 32, 64, 128]
    d.PRIOR_PROB = 0.01
    d.INFERENCE_TH_TRAIN = 0.05
    d.INFERENCE_TH_TEST = 0.05
    d.NMS_TH = 0.1
    d.PRE_NMS_TOPK_TRAIN = 2000
    d.PRE_NMS_TOPK_TEST = 2000
    d.POST_NMS_TOPK_TRAIN = 1000
    d.POST_NMS_TOPK_TEST = 1000
    d.TOP_LEVELS = 2
    d.NORM = "GN"  # "GN", "BN", "SyncBN" or "none"
    d.USE_SCALE = True
    d.LOSS_SMOOTH_L1_BETA = 1.0 / 9.0
    d.ENABLE_LOSS_MODULATION = True
    d.ENABLE_LOSS_LOG = True
    d.SORT_CORNERS = True
    d.SORT_CORNERS_DATALOADER = True
    d.CENTERNESS = "oriented"  # "none" | "plain" | "oriented"
    d.CENTERNESS_ALPHA = 5
    d.CENTERNESS_USE_IN_SCORE = True
    d.CORNER_PREDICTION = "center-to-corner"
    # "direct" | "iterative" | "offset" | "center-to-corner" | "angle"
    d.CORNER_TOWER_ON_CENTER_TOWER = True
    d.MERGE_CORNER_CENTER_PRED = False
    d.ENABLE_LEVEL_SIZE_FILTERING = True
    d.ENABLE_IN_BOX_CHECK = True
    d.ENABLE_FPN_STRIDE_NORM = True
    d.THRESH_WITH_CTR = False
    d.CTR_ON_REG = True
    d.LOSS_ALPHA = 0.25
    d.LOSS_GAMMA = 2.0
    d.SIZES_OF_INTEREST = [64, 128, 256, 512]
    d.USE_RELU = True
    d.USE_DEFORMABLE = False
    d.LOSS_LAMBDA_NORM = True
    d.LOSS_LAMBDA = CfgNode()
    d.LOSS_LAMBDA.CORNERS = 1.0
    d.LOSS_LAMBDA.BOX = 1.0
    d.LOSS_LAMBDA.LTRB = 1.0
    d.LOSS_LAMBDA.CTR = 1.0
    d.LOSS_LAMBDA.CLS = 1.0
    d.LOSS_LAMBDA.CENTER = 1.0
    d.NUM_CLS_CONVS = 4
    d.NUM_BOX_CONVS = 4
    d.NUM_SHARE_CONVS = 0
    d.CENTER_SAMPLE = True
    d.CENTER_SAMPLE_ONLY = False
    d.COMBINE_CENTER_SAMPLE = True
    d.POS_RADIUS = 2.0
    d.LOC_LOSS_TYPE = "smoothl1"  # smoothl1 | iou | giou
    d.YIELD_PROPOSAL = False

    # ---------------------------------------------------------------- INPUT
    _C.INPUT = CfgNode()
    _C.INPUT.FORMAT = "BGR"
    _C.INPUT.MIN_SIZE_TRAIN = (800,)
    _C.INPUT.MIN_SIZE_TRAIN_SAMPLING = "choice"
    _C.INPUT.MAX_SIZE_TRAIN = 1333
    _C.INPUT.MIN_SIZE_TEST = 800
    _C.INPUT.MAX_SIZE_TEST = 1333
    _C.INPUT.HFLIP_TRAIN = True
    _C.INPUT.MIN_AREA = 10
    _C.INPUT.MIN_SIDE = 2
    _C.INPUT.ROTATION_AUG_ANGLES = [0.0, 90.0, 180.0, 270.0]
    _C.INPUT.ROTATION_AUG_SAMPLE_STYLE = "choice"
    _C.INPUT.RESIZE_TYPE = "shortest-edge"  # "shortest-edge" | "both"
    _C.INPUT.RESIZE_HEIGHT_TRAIN = 0
    _C.INPUT.RESIZE_WIDTH_TRAIN = 0
    _C.INPUT.RESIZE_HEIGHT_TEST = 0
    _C.INPUT.RESIZE_WIDTH_TEST = 0
    _C.INPUT.USE_COLOR_AUGMENTATIONS = False
    _C.INPUT.CROP = CfgNode()
    _C.INPUT.CROP.ENABLED = False
    _C.INPUT.CROP.TYPE = "relative_range"
    _C.INPUT.CROP.SIZE = [0.9, 0.9]

    # -------------------------------------------------------------- DATASETS
    _C.DATASETS = CfgNode()
    _C.DATASETS.TRAIN = ["dota_1_train_1024"]
    _C.DATASETS.TEST = ["dota_1_val_1024"]
    _C.DATASETS.DOTA_REMOVE_CONTAINER_CRANE = False
    _C.DATASETS.PROPOSAL_FILES_TRAIN = []
    _C.DATASETS.PROPOSAL_FILES_TEST = []

    # ------------------------------------------------------------ DATALOADER
    _C.DATALOADER = CfgNode()
    _C.DATALOADER.NUM_WORKERS = 4
    _C.DATALOADER.BACKEND = "threads"  # "threads" | "grain" (multiprocess)
    _C.DATALOADER.CACHE_IMAGES = False  # cache decoded uint8 on the records
    _C.DATALOADER.SAMPLER_TRAIN = "TrainingSampler"
    _C.DATALOADER.REPEAT_THRESHOLD = 0.0
    _C.DATALOADER.ASPECT_RATIO_GROUPING = True
    _C.DATALOADER.FILTER_EMPTY_ANNOTATIONS = True

    # ---------------------------------------------------------------- SOLVER
    _C.SOLVER = CfgNode()
    _C.SOLVER.OPTIMIZER = "sgd"  # "sgd" | "adam"
    _C.SOLVER.IMS_PER_BATCH = 16
    _C.SOLVER.BASE_LR = 0.001
    _C.SOLVER.MOMENTUM = 0.9
    _C.SOLVER.NESTEROV = False
    _C.SOLVER.WEIGHT_DECAY = 0.0001
    _C.SOLVER.WEIGHT_DECAY_NORM = 0.0
    _C.SOLVER.WEIGHT_DECAY_BIAS = 0.0001
    _C.SOLVER.BIAS_LR_FACTOR = 1.0
    _C.SOLVER.GAMMA = 0.1
    _C.SOLVER.STEPS = (30000,)
    _C.SOLVER.MAX_ITER = 40000
    _C.SOLVER.WARMUP_FACTOR = 1.0 / 1000
    _C.SOLVER.WARMUP_ITERS = 1000
    _C.SOLVER.WARMUP_METHOD = "linear"
    _C.SOLVER.CHECKPOINT_PERIOD = 5000
    _C.SOLVER.REFERENCE_WORLD_SIZE = 0
    _C.SOLVER.AMP = CfgNode()
    _C.SOLVER.AMP.ENABLED = False  # bf16 compute (TPU AMP equivalent)
    _C.SOLVER.CLIP_GRADIENTS = CfgNode()
    _C.SOLVER.CLIP_GRADIENTS.ENABLED = False
    _C.SOLVER.CLIP_GRADIENTS.CLIP_TYPE = "value"
    _C.SOLVER.CLIP_GRADIENTS.CLIP_VALUE = 1.0
    _C.SOLVER.CLIP_GRADIENTS.NORM_TYPE = 2.0

    # ------------------------------------------------------------------ TEST
    _C.TEST = CfgNode()
    _C.TEST.EVAL_PERIOD = 0
    _C.TEST.DETECTIONS_PER_IMAGE = 2000
    _C.TEST.IOU_TH = 0.5
    _C.TEST.NUM_PRED_VIS = 20
    _C.TEST.AUG = CfgNode()
    _C.TEST.AUG.ENABLED = False
    _C.TEST.AUG.MIN_SIZES = (400, 500, 600, 700, 800, 900, 1000, 1100, 1200)
    _C.TEST.AUG.MAX_SIZE = 4000
    _C.TEST.AUG.FLIP = True
    _C.TEST.AUG.HFLIP = True
    _C.TEST.AUG.VFLIP = True
    _C.TEST.AUG.ROTATION_ANGLES = ()
    _C.TEST.EXPECTED_RESULTS = []

    # --- TPU-native knobs (new in this framework) --------------------------
    t = _C.TPU = CfgNode()
    t.MESH_SHAPE = [-1]  # data-parallel mesh; -1 = all devices
    t.MESH_AXIS_NAMES = ["data"]
    t.COMPUTE_DTYPE = "bfloat16"  # model compute dtype ("float32" to disable)
    t.PARAM_DTYPE = "float32"
    t.MAX_INSTANCES = 256  # static per-image gt padding
    t.NMS_GROUP_CANDIDATES = 0  # >0: per-class-group NMS budget (exact
    # decomposition of class-aware NMS — cross-class pairs never suppress;
    # wins when per-class demand <= budget, loses to the global cap when one
    # class demands more — see PARITY.md study); 0 = global-cap path
    t.NMS_MAX_CANDIDATES = 4096  # static NMS input size (score top-k capped;
    # <= 0 = reference-faithful no-cap: all per-level survivors enter NMS).
    # 4096 matches the uncapped detection set even on adversarially dense
    # scenes (tools/decode_deviation_study.py; 2048 lost 4.5 mAP there once
    # near-duplicate suppression was fixed — see PARITY.md)
    t.EVAL_BATCH = 16  # eval images per step; 16 is the measured v5e
    # throughput knee (171 img/s @8 vs 181 @16 at 1024**2, bench.py)
    t.ASSIGN_IMPL = "auto"  # "auto" | "pallas" | "xla" target assignment
    t.DECODE_APPROX_TOPK = False  # True: lax.approx_max_k (recall 0.99) in
    # decode.  Exact is the default since the radix-select top-k with
    # scatter-free compaction (ops/topk.py) closed the gap: isolated decode
    # chain 9.7 ms exact vs 11.4 approx; full eval program +1.3 ms (+2.9%,
    # 45.5 vs 44.2 @batch 8) — under the <5% bar, so the reference-exact
    # candidate set wins the default (accuracy-first, like NMS_MAX_CANDIDATES).
    t.IMAGE_SIZE_DIVISIBILITY = 128  # pad H, W to multiples (P7 stride)
    t.BUCKETED_TRAIN = True  # multi-scale train on a small static-canvas
    # ladder: the shortest-edge scale is drawn once per BATCH (vs the
    # reference's per-image draw — the analog of its ASPECT_RATIO_GROUPING
    # batching) and the train step compiles once per distinct canvas, so a
    # 450-scale batch of the 450-1200 ms recipes no longer pays worst-case
    # 1280^2 conv FLOPs (~2x measured train throughput on the ms recipe).
    # Only active for shortest-edge resize with >1 train scale; the grain
    # backend falls back to the thread loader when on.
    t.TRAIN_MAX_BUCKETS = 4  # max distinct train canvases (compile count
    # bound: each bucket compiles its own train step, 1-5 min each on a
    # cold remote-compile tunnel, seconds when cached)
    t.TTA_DEVICE_AUG = True  # generate separable TTA copies (scales x
    # flips/rot90) ON DEVICE from one shipped base image via one-hot
    # sampling-matrix matmuls (ops/device_warp.py) — ~15x less host->device
    # transfer than shipping every warped canvas; arbitrary-angle rotation
    # augs fall back to the host cv2 path per copy. False = host cv2 warps
    # for everything (bit-comparable to the pre-round-5 behavior).
    t.TRAIN_DEVICE_AUG = "auto"  # render the train-time augmentation
    # (flips/rot90/multi-scale resize + color jitter) ON DEVICE inside the
    # jitted train step from one shipped base image per example
    # (ops/device_warp.py; engine/trainer.py::device_aug_image) — the
    # train-time completion of the north-star on-device preprocessing
    # stage.  Requires every geometric draw to be separable (rot90-only
    # recipes; the 30-degree HRSC/UCAS ms recipes keep host cv2 warps).
    # "auto": on when the host has <= 2 usable cores (a starved host can't
    # keep cv2 warps ahead of the device step; a strong host should —
    # the mirror of HOST_ASSIGN=auto).  True forces (error when not
    # separable), False keeps the host path.
    t.PREFETCH_DEPTH = 2  # host->device prefetch buffer
    t.DONATE_STATE = True  # donate train state buffers in the jitted step
    t.REMAT_BACKBONE = False  # jax.checkpoint over backbone stages
    t.STEM_SPACE_TO_DEPTH = True  # lower the 7x7/2 stem conv as
    # space-to-depth + 4x4/1 (identical function, ~4x better MXU use)
    t.EVAL_INT8 = False  # eval-time w8a8 convs (layers/quant.py): dynamic
    # per-image activation scales + per-out-channel weight scales, s32
    # accumulation on the MXU (~1.6x conv throughput on v5e). Predictors,
    # stem, offset generators and depthwise convs stay full precision.
    # Accuracy gate: tools/int8_canary.py / INT8_CANARY.json.
    t.EVAL_INT8_SCALES = ""  # path to a calibrated activation-scale JSON
    # (tools/calibrate_int8.py): calibrated sites use STATIC scales — the
    # quantize fuses into the producer op, no runtime max-reduce; "" = fully
    # dynamic. Uncalibrated sites always fall back to dynamic.
    t.HOST_ASSIGN = False  # False | True | "auto" (enable when >=2 usable
    # host cores — engine/trainer.py::resolve_host_assign; the probe result
    # and the first measured assign batch are logged).
    # True: compute target assignment (ops/targets.py) on the
    # HOST CPU inside the data-prefetch thread instead of on-device in the
    # train step.  Targets depend only on the augmented GT (not on params), so
    # this is pipeline work the reference happens to do on the accelerator
    # (dafne_outputs.py:252-503); moving it off-device shrinks the device
    # step (measured 101.8 -> 97.5 ms @ b8 1024^2 on v5e) and overlaps the
    # assignment with the running step.  Costs ~1.1 MB/image of extra
    # host->device traffic (labels + reg targets) and ~100 ms/batch of host
    # CPU per core at 24 gt — enable on hosts with enough cores to keep up
    # with the step time (see PARITY.md "Host-side target assignment");
    # off by default.  Numerics: the
    # same jitted assign_targets runs on the CPU backend (impl="xla"), and
    # the train-step losses are asserted equal either way
    # (tests/test_engine.py::test_host_assign_losses_match).
    t.EVAL_INT8_MIN_CHANNELS = 0  # quantize only convs with >= this many
    # in AND out channels; 0 = auto per mode (measured A/B, PARITY.md):
    # dynamic -> 256 (narrow HBM-bound convs get SLOWER from the per-call
    # max-reduce + requant traffic), static/calibrated -> 64 (the quantize
    # fuses into the producer, every eligible conv wins)

    return _C
