"""Utility tests: RTPT, notify hooks, decode flag variants, recipe builds."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_rtpt_eta_and_status_file(tmp_path):
    import time

    from dafne_tpu.utils.rtpt import RTPT, _fmt_eta

    assert _fmt_eta(59) == "0m:59s"
    assert _fmt_eta(3600 + 120) == "1h:02m"
    assert _fmt_eta(86400 + 3600) == "1d:01h"

    status = tmp_path / "rtpt"
    r = RTPT(experiment_name="exp", max_iterations=100, status_file=str(status))
    r.start()
    time.sleep(0.02)
    r.step(iteration=50)
    content = status.read_text()
    assert "[50%]" in content and "exp" in content
    # per-iteration rate accounts for the 50-step jump
    assert r.times[-1] < 0.01


def test_notify_report_and_cmd(tmp_path, monkeypatch):
    from dafne_tpu.config import get_cfg
    from dafne_tpu.utils.notify import notify

    out = tmp_path / "sentinel.json"
    monkeypatch.setenv(
        "DAFNE_NOTIFY_CMD", f"cat > {out}"
    )
    cfg = get_cfg()
    cfg.OUTPUT_DIR = str(tmp_path)
    report = notify("train_done", cfg, results={"mAP": 71.0})
    assert report["status"] == "train_done"
    # report written to OUTPUT_DIR
    with open(tmp_path / "run_report.json") as f:
        assert json.load(f)["results"]["mAP"] == 71.0
    # hook command received the report on stdin
    assert json.loads(out.read_text())["status"] == "train_done"


def test_decode_thresh_with_ctr_and_no_centerness():
    from dafne_tpu.models.head import compute_locations
    from dafne_tpu.ops.postprocess import DecodeSpec, decode_single_level

    n, h, w, c, stride = 1, 8, 8, 2, 8
    logits = np.full((n, h, w, c), -8.0, np.float32)
    logits[0, 2, 2, 1] = 2.0
    corners = np.zeros((n, h, w, 8), np.float32)
    ctrness = np.full((n, h, w, 1), -8.0, np.float32)  # low centerness
    locs = compute_locations(h, w, stride)

    # thresh_with_ctr=True: sqrt(cls*ctr) ~ sqrt(0.88 * 3e-4) < 0.05 -> dropped
    spec = DecodeSpec(
        strides=(stride,), num_classes=c, pre_nms_topk=16,
        thresh_with_ctr=True, nms_max_candidates=16,
    )
    out = decode_single_level(
        jnp.asarray(logits), jnp.asarray(corners), jnp.asarray(ctrness),
        locs, stride, spec,
    )
    assert int(np.asarray(out["valid"]).sum()) == 0

    # thresh_with_ctr=False: cls 0.88 > 0.05 passes, score still mixed
    spec2 = DecodeSpec(
        strides=(stride,), num_classes=c, pre_nms_topk=16,
        thresh_with_ctr=False, nms_max_candidates=16,
    )
    out2 = decode_single_level(
        jnp.asarray(logits), jnp.asarray(corners), jnp.asarray(ctrness),
        locs, stride, spec2,
    )
    assert int(np.asarray(out2["valid"]).sum()) == 1
    want = np.sqrt((1 / (1 + np.exp(-2.0))) * (1 / (1 + np.exp(8.0))))
    # slot order is top-k-implementation-defined (exact_topk_set returns
    # ascending-index order, lax.top_k descending-score); locate by mask
    got = float(np.asarray(out2["scores"])[np.asarray(out2["valid"])][0])
    assert got == pytest.approx(want, rel=1e-3)

    # centerness "none": raw cls prob is the score
    spec3 = DecodeSpec(
        strides=(stride,), num_classes=c, pre_nms_topk=16,
        has_centerness=False, nms_max_candidates=16,
    )
    ones = np.ones((n, h, w, 1), np.float32)
    out3 = decode_single_level(
        jnp.asarray(logits), jnp.asarray(corners), jnp.asarray(ones),
        locs, stride, spec3,
    )
    assert float(np.asarray(out3["scores"]).max()) == pytest.approx(
        1 / (1 + np.exp(-2.0)), rel=1e-3
    )


def test_all_shipped_recipes_build_models():
    """Every shipped YAML must produce a constructible model (tiny dims)."""
    import glob

    from dafne_tpu.config import load_config
    from dafne_tpu.models import build_model

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for f in sorted(glob.glob(os.path.join(repo, "configs/**/*.yaml"), recursive=True)):
        cfg = load_config(f, freeze=False)
        # shrink for construction speed; structure comes from the recipe
        cfg.MODEL.RESNETS.DEPTH = 18
        cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 16
        cfg.MODEL.RESNETS.STEM_OUT_CHANNELS = 8
        cfg.MODEL.FPN.OUT_CHANNELS = 16
        cfg.MODEL.DAFNE.NUM_CLS_CONVS = 1
        cfg.MODEL.DAFNE.NUM_BOX_CONVS = 1
        cfg.TPU.COMPUTE_DTYPE = "float32"
        cfg.freeze()
        model = build_model(cfg)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))[
            "params"
        ]
        assert "head" in params, f
