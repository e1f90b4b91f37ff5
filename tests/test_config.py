"""Config system tests: defaults, _BASE_ inheritance, CLI overrides, freeze."""

import glob
import os

import pytest

from dafne_tpu.config import CfgNode, get_cfg, load_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_defaults_complete():
    cfg = get_cfg()
    assert cfg.MODEL.DAFNE.NUM_CLASSES == 15
    assert cfg.MODEL.DAFNE.CORNER_PREDICTION == "center-to-corner"
    assert cfg.MODEL.DAFNE.FPN_STRIDES == [8, 16, 32, 64, 128]
    assert cfg.MODEL.DAFNE.LOSS_SMOOTH_L1_BETA == pytest.approx(1 / 9)
    assert cfg.SOLVER.OPTIMIZER == "sgd"
    assert cfg.TEST.IOU_TH == 0.5
    assert cfg.TPU.MESH_AXIS_NAMES == ["data"]


def test_get_cfg_is_a_copy():
    a, b = get_cfg(), get_cfg()
    a.MODEL.DAFNE.NUM_CLASSES = 3
    assert b.MODEL.DAFNE.NUM_CLASSES == 15


def test_base_inheritance():
    cfg = load_config(os.path.join(REPO, "configs/dota-1.0/1024.yaml"))
    # overridden in child
    assert cfg.DATASETS.TRAIN == ["dota_1_train_1024"]
    assert cfg.SOLVER.WARMUP_FACTOR == 0.1
    # inherited from parent
    assert cfg.SOLVER.BASE_LR == 0.01
    assert cfg.MODEL.DAFNE.LOSS_LAMBDA.CLS == 10.0
    # default survives
    assert cfg.MODEL.DAFNE.CORNER_PREDICTION == "center-to-corner"


def test_two_level_base():
    cfg = load_config(os.path.join(REPO, "configs/paper/ablation/dota-1.5-base.yaml"))
    assert cfg.MODEL.DAFNE.CORNER_PREDICTION == "direct"
    assert cfg.MODEL.DAFNE.CENTERNESS == "none"
    assert cfg.MODEL.DAFNE.NUM_CLASSES == 16
    assert cfg.SOLVER.BASE_LR == 0.01


def test_all_shipped_configs_load():
    files = glob.glob(os.path.join(REPO, "configs/**/*.yaml"), recursive=True)
    assert len(files) >= 12
    for f in files:
        cfg = load_config(f)
        assert cfg.MODEL.DAFNE.NUM_CLASSES > 0


def test_merge_from_list():
    cfg = get_cfg()
    cfg.merge_from_list(
        ["MODEL.DAFNE.NUM_CLASSES", "7", "SOLVER.BASE_LR", "0.02",
         "MODEL.DAFNE.CENTERNESS", "plain", "SOLVER.AMP.ENABLED", "True",
         "DATASETS.TRAIN", "('hrsc_trainval',)"]
    )
    assert cfg.MODEL.DAFNE.NUM_CLASSES == 7
    assert cfg.SOLVER.BASE_LR == 0.02
    assert cfg.MODEL.DAFNE.CENTERNESS == "plain"
    assert cfg.SOLVER.AMP.ENABLED is True
    assert cfg.DATASETS.TRAIN == ["hrsc_trainval"]


def test_freeze():
    cfg = load_config(os.path.join(REPO, "configs/hrsc/base.yaml"))
    with pytest.raises(AttributeError):
        cfg.MODEL.DAFNE.NUM_CLASSES = 3
    cfg.defrost()
    cfg.MODEL.DAFNE.NUM_CLASSES = 3
    assert cfg.MODEL.DAFNE.NUM_CLASSES == 3


def test_dump_roundtrip(tmp_path):
    cfg = load_config(os.path.join(REPO, "configs/ucas_aod/base.yaml"))
    p = tmp_path / "dump.yaml"
    cfg.dump_to_file(str(p))
    cfg2 = CfgNode()
    cfg2.merge_from_file(str(p))
    assert cfg2.MODEL.DAFNE.NUM_CLASSES == cfg.MODEL.DAFNE.NUM_CLASSES
    assert cfg2.SOLVER.STEPS == list(cfg.SOLVER.STEPS)


def test_yacs_style_tuple_strings():
    cfg = get_cfg()
    cfg.merge_from_list(["DATASETS.TEST", '("dota_1_val_600",)'])
    assert cfg.DATASETS.TEST == ["dota_1_val_600"]
