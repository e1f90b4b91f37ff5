"""HTTP serving front-end smoke (tools/serve.py).

Runs the tiny detector behind the stdlib server and drives the real HTTP
surface: /healthz, a .npy /detect round-trip (image smaller than the
canvas — exercising the mapper-faithful resize + scale_xy), and the
error path."""

import http.client
import io
import json
import os
import sys
import threading

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _tiny_cfg(tmp_path):
    from dafne_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.merge_from_file("configs/synthetic/base.yaml")
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res3", "res4", "res5"]
    cfg.MODEL.FPN.OUT_CHANNELS = 32
    cfg.MODEL.DAFNE.NUM_CLS_CONVS = 1
    cfg.MODEL.DAFNE.NUM_BOX_CONVS = 1
    cfg.MODEL.DAFNE.PRE_NMS_TOPK_TEST = 64
    cfg.MODEL.DAFNE.POST_NMS_TOPK_TEST = 32
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.NMS_MAX_CANDIDATES = 128
    cfg.TPU.EVAL_BATCH = 1
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.freeze()
    return cfg


def test_serve_http_roundtrip(tmp_path):
    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools",
        ),
    )
    from serve import DetectorService, make_server

    service = DetectorService.from_config(_tiny_cfg(tmp_path))
    srv = make_server(service, host="127.0.0.1", port=0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)

        # this service loaded no checkpoint: /healthz must be machine-
        # checkably unhealthy (503 + ok=false + untrained_weights=true)
        # so a probe catches a typo'd OUTPUT_DIR deployment
        conn.request("GET", "/healthz")
        r = conn.getresponse()
        health = json.loads(r.read())
        assert r.status == 503 and not health["ok"]
        assert health["untrained_weights"] is True
        assert health["canvas"] == list(service.pad_hw)

        # image smaller than the canvas -> resize + scale_xy path
        img = np.random.RandomState(0).randint(
            0, 256, (97, 123, 3), np.uint8
        )
        buf = io.BytesIO()
        np.save(buf, img)
        conn.request("POST", "/detect", body=buf.getvalue())
        r = conn.getresponse()
        out = json.loads(r.read())
        assert r.status == 200, out
        assert "detections" in out
        for d in out["detections"]:
            assert len(d["corners"]) == 8 and len(d["hbox"]) == 4
            assert 0.0 <= d["score"] <= 1.0
            # rescaled to ORIGINAL coordinates: inside the (padded-model
            # inverse-scaled) original frame, loose bound
            assert all(abs(v) < 4 * 123 for v in d["corners"])

        # encoded-image body (PNG is lossless): must produce the SAME
        # response as the .npy post of the same pixels — exercises the
        # cv2 decode + channel-order handling in decode_image_body
        import cv2

        ok, png = cv2.imencode(".png", img)  # img already BGR-order bytes
        assert ok
        conn.request("POST", "/detect", body=png.tobytes())
        r = conn.getresponse()
        out_png = json.loads(r.read())
        assert r.status == 200, out_png
        assert out_png == out

        # error path: garbage body -> 400, server stays alive
        conn.request("POST", "/detect", body=b"not an npy")
        r = conn.getresponse()
        assert r.status == 400
        assert "error" in json.loads(r.read())

        # zero-sized image is CLIENT error (400), not a 500 runtime fault
        buf = io.BytesIO()
        np.save(buf, np.zeros((0, 10, 3), np.uint8))
        conn.request("POST", "/detect", body=buf.getvalue())
        r = conn.getresponse()
        assert r.status == 400
        assert "error" in json.loads(r.read())

        conn.request("GET", "/healthz")
        assert conn.getresponse().status == 503  # still the untrained svc
    finally:
        srv.shutdown()


def test_serve_preprocess_matches_eval_mapper(tmp_path):
    """The serving preprocessing (resize + canvas + scale_xy) must be
    BIT-identical to the eval DatasetMapper — the mAP-certified pipeline.
    Catches dtype-order drift (float-resize-then-truncate vs the mapper's
    uint8 cv2 fixed-point resize) and resize-math duplication."""
    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools",
        ),
    )
    from serve import DetectorService

    from dafne_tpu.data.mapper import (
        DatasetMapper,
        eval_preprocess_meta,
        pad_target_hw,
    )

    cfg = _tiny_cfg(tmp_path)
    pad_hw = pad_target_hw(cfg, train=False)
    service = DetectorService(
        call_fn=None,  # preprocess only — never called
        batch=1,
        pad_hw=pad_hw,
        meta=dict(eval_preprocess_meta(cfg), checkpoint_step=0),
    )
    mapper = DatasetMapper(cfg, train=False, pad_hw=pad_hw)
    rng = np.random.RandomState(7)
    for hw in [(97, 123), (256, 77), (300, 300)]:
        img = rng.randint(0, 256, hw + (3,), np.uint8)
        record = {"image": img, "image_id": "x", "annotations": []}
        ex = mapper(record)
        images, scale = service.preprocess(img)
        assert np.array_equal(images[0], ex["image"].astype(np.float32)), hw
        assert np.array_equal(scale[0], ex["scale_xy"]), hw
        # float input pixels take the same uint8-first path
        images_f, _ = service.preprocess(img.astype(np.float32))
        assert np.array_equal(images_f, images), hw


def test_decode_image_body_pixel_cap(monkeypatch):
    """The decoded-dimension cap turns decompression bombs into 400s."""
    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools",
        ),
    )
    import serve

    img = np.zeros((64, 64, 3), np.uint8)
    buf = io.BytesIO()
    np.save(buf, img)
    assert serve.decode_image_body(buf.getvalue()).shape == (64, 64, 3)
    monkeypatch.setattr(serve, "MAX_IMAGE_PIXELS", 1000)
    try:
        serve.decode_image_body(buf.getvalue())
    except ValueError as e:
        assert "pixel" in str(e)
    else:
        raise AssertionError("oversized image must raise ValueError (-> 400)")
