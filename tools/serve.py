#!/usr/bin/env python3
"""Minimal HTTP serving front-end for the fused inference pipeline.

Stdlib-only (http.server) demo server wrapping either a serialized
StableHLO artifact (tools/export_model.py) or a live checkpoint — the
deployment story the reference's vestigial caffe2 deploy examples never
shipped (SURVEY.md §2.4).  One request = one image; the single jitted
program (model + decode + rotated NMS) runs under a single-flight lock
(ONE chip, one program at a time).

Usage:
  python tools/serve.py --artifact OUT/model.stablehlo [--port 8321]
  python tools/serve.py --config-file configs/dota-1.0/1024.yaml \
      OUTPUT_DIR runs/exp1 [--port 8321]    # live mode, loads checkpoint

API:
  GET  /healthz          -> 200 {"ok": true, "canvas": [H, W], "batch": N}
                         (503 + "ok": false + "untrained_weights": true
                         when no trained weights were loaded)
  POST /detect           body: .npy bytes of an HxWx3 uint8/float image
                         (channel order = the recipe's INPUT.FORMAT, BGR
                         in every shipped config), OR an encoded JPEG/PNG/
                         BMP file (decoded host-side with cv2; channel
                         order converted to the recipe's automatically)
                         -> {"detections": [{"corners": [8 floats, original
                            coords], "hbox": [4], "score": s, "class": c}]}

Preprocessing reproduces the eval mapper exactly: the SAME AffineAug
resize (transforms.build_test_augmentation semantics) applied to the
uint8 image (cv2 fixed-point rounding, like the mapper's on-disk path),
top-left placement on the static canvas, detections rescaled to original
coordinates by the same scale_xy = (w/rw, h/rh) the evaluator uses
(data/mapper.py).
"""

import argparse
import io
import json
import os
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


# A few-KB PNG/BMP can declare huge dimensions and make the decoder
# allocate gigabytes (decompression bomb) — MAX_BODY only bounds the
# COMPRESSED bytes.  OpenCV checks this env var per imdecode call; 64 MP
# comfortably covers any real aerial tile while bounding one decode at
# ~192 MB.  Set before cv2 ever decodes (import happens lazily below).
os.environ.setdefault("OPENCV_IO_MAX_IMAGE_PIXELS", str(64_000_000))
MAX_IMAGE_PIXELS = int(os.environ["OPENCV_IO_MAX_IMAGE_PIXELS"])


def decode_image_body(data: bytes, input_format: str = "BGR") -> np.ndarray:
    """Request body -> HxWx3 array: .npy verbatim, else cv2-decoded image.

    .npy bodies are trusted to already be in the recipe's channel order
    (the documented API contract).  Encoded files (JPEG/PNG/BMP) decode to
    BGR via cv2 and are converted to the recipe's INPUT.FORMAT here, so a
    curl-with-a-photo client never has to know about channel order."""
    if data[:6] == b"\x93NUMPY":
        img = np.load(io.BytesIO(data), allow_pickle=False)
    else:
        try:
            import cv2

            img = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
        except Exception as e:
            # anything the decoder throws (oversized per the pixel cap,
            # corrupt streams, missing cv2) is a CLIENT-payload problem ->
            # ValueError -> HTTP 400, never a 500
            raise ValueError(f"undecodable image body: {e}")
        if img is None:
            raise ValueError(
                "body is neither a .npy array nor a decodable image "
                "(JPEG/PNG/BMP)"
            )
        if input_format.upper() == "RGB":
            img = np.ascontiguousarray(img[:, :, ::-1])
    if img.ndim >= 2 and img.shape[0] * img.shape[1] > MAX_IMAGE_PIXELS:
        raise ValueError(
            f"image {img.shape[0]}x{img.shape[1]} exceeds the "
            f"{MAX_IMAGE_PIXELS}-pixel serving cap"
        )
    return img


def _test_aug(h, w, meta):
    """The recipe's eval resize as an AffineAug — the SAME code path the
    eval mapper runs (transforms.build_test_augmentation body), driven by
    the export metadata so artifact mode needs no config object.  Any
    future resize-semantics change in transforms.py flows through here
    automatically instead of silently desyncing serving from eval."""
    from dafne_tpu.data import transforms as T

    if meta.get("resize_type", "shortest-edge") == "shortest-edge":
        return T.shortest_edge_resize(
            w, h, meta["min_size_test"], meta["max_size_test"]
        )
    return T.resize(
        w, h, meta["resize_width_test"], meta["resize_height_test"]
    )


class DetectorService:
    """Wraps a call(images [B,H,W,3] f32, scale_xy [B,2] f32) -> dict."""

    def __init__(self, call_fn, batch, pad_hw, meta):
        self._call = call_fn
        self.batch = int(batch)
        self.pad_hw = tuple(pad_hw)
        self.meta = meta
        # machine-checkable deployment health: a checkpoint_step of 0 with
        # no MODEL.WEIGHTS means nothing trained was ever loaded — /healthz
        # reports ok=false so probes/load-balancers catch a typo'd
        # OUTPUT_DIR instead of routing traffic to random weights
        self.untrained = (
            meta.get("checkpoint_step") == 0 and not meta.get("weights")
        )
        self._lock = threading.Lock()  # single-flight: one chip, one program

    @classmethod
    def from_artifact(cls, path):
        from jax import export as jexport

        with open(path, "rb") as f:
            exported = jexport.deserialize(bytearray(f.read()))
        meta_path = os.path.join(os.path.dirname(path), "export_meta.json")
        meta = json.load(open(meta_path))
        if meta.get("weights_as_args"):
            raise SystemExit(
                "weights-as-args artifacts need the param tree; export "
                "without --weights-as-args for serving"
            )
        if int(meta.get("batch", 1)) > 1:
            # one image per request: a batch-N artifact zero-pads N-1
            # canvases every call (~Nx compute/latency per request)
            print(
                f"WARNING: artifact batch is {meta['batch']}; every "
                "single-image request pays the full batch's compute — "
                "re-export with `tools/export_model.py --batch 1` for "
                "serving",
                file=sys.stderr, flush=True,
            )
        return cls(
            lambda images, scale: exported.call(images, scale),
            meta["batch"],
            meta["pad_hw"],
            meta,
        )

    @classmethod
    def from_config(cls, cfg):
        import jax

        from dafne_tpu.data.mapper import eval_preprocess_meta, pad_target_hw
        from dafne_tpu.engine.checkpoint import Checkpointer
        from dafne_tpu.engine.train_loop import build_state
        from dafne_tpu.engine.trainer import make_eval_step
        from dafne_tpu.models import build_model

        model = build_model(cfg)
        pad_hw = pad_target_hw(cfg, train=False)
        state, _, _ = build_state(cfg, model, pad_hw)
        state, ckpt_step = Checkpointer(cfg.OUTPUT_DIR).resume_or_load(
            state, cfg, resume=True
        )
        if not ckpt_step and not cfg.MODEL.WEIGHTS:
            # a typo'd OUTPUT_DIR would otherwise serve random weights;
            # warn here AND report ok=false on /healthz (machine-checkable
            # — see DetectorService.untrained) so a probe catches it even
            # when a supervisor swallows stderr
            print(
                f"WARNING: no checkpoint under {cfg.OUTPUT_DIR} and "
                "MODEL.WEIGHTS is empty — serving UNTRAINED weights "
                "(/healthz will report ok=false)",
                file=sys.stderr, flush=True,
            )
        # one image per request: serve at batch 1, not TPU.EVAL_BATCH —
        # zero-padding a 16-wide eval batch would cost ~16x per request
        step = jax.jit(make_eval_step(model, cfg, pad_hw))
        params, bs = state.params, state.batch_stats
        meta = dict(
            eval_preprocess_meta(cfg),
            checkpoint_step=int(ckpt_step),
            weights=cfg.MODEL.WEIGHTS,
        )
        return cls(
            lambda images, scale: step(params, images, scale, bs),
            1,
            pad_hw,
            meta,
        )

    def preprocess(self, img: np.ndarray):
        """(images [B,ph,pw,3] f32, scale [B,2] f32) for one HxWx3 image —
        bit-identical to the eval mapper's canvas + scale_xy
        (tests/test_serve.py asserts this against DatasetMapper)."""
        if img.ndim != 3 or img.shape[-1] != 3:
            raise ValueError(f"expected HxWx3, got {img.shape}")
        h, w = img.shape[:2]
        if h == 0 or w == 0:
            raise ValueError(f"zero-sized image: {img.shape}")
        # mapper-exact: the mapper reads uint8 from disk and resizes the
        # uint8 image directly (cv2 fixed-point, round-to-nearest —
        # transforms.AffineAug._axis_aligned_fast); float client pixels are
        # converted FIRST so the resize sees the same dtype as eval
        if img.dtype != np.uint8:
            img = np.clip(img, 0, 255).astype(np.uint8)
        aug = _test_aug(h, w, self.meta)
        resized = aug.apply_image(img)
        rh, rw = resized.shape[:2]
        ph, pw = self.pad_hw
        images = np.zeros((self.batch, ph, pw, 3), np.float32)
        # canvas crop + full-resized-dims scale, exactly like the mapper's
        # oversize path (data/mapper.py)
        images[0, : min(rh, ph), : min(rw, pw)] = resized[:ph, :pw]
        scale = np.ones((self.batch, 2), np.float32)
        scale[0] = [w / rw, h / rh]
        return images, scale

    def detect(self, img: np.ndarray):
        """HxWx3 image in the recipe channel order (`meta['input_format']`,
        BGR in every shipped config), pixel range 0-255 (uint8 or float) —
        the range the model was trained on; [0,1]-normalized floats will
        produce garbage.  Returns detection dicts in ORIGINAL image
        coordinates."""
        images, scale = self.preprocess(img)

        with self._lock:
            out = self._call(images, scale)
        out = {k: np.asarray(v) for k, v in out.items()}
        keep = out["valid"][0].astype(bool)
        dets = []
        for i in np.nonzero(keep)[0]:
            dets.append(
                {
                    "corners": [float(x) for x in out["corners"][0, i]],
                    "hbox": [float(x) for x in out["hboxes"][0, i]],
                    "score": float(out["scores"][0, i]),
                    "class": int(out["classes"][0, i]),
                }
            )
        dets.sort(key=lambda d: -d["score"])
        return dets


def make_server(service: DetectorService, host="127.0.0.1", port=8321):
    class Handler(BaseHTTPRequestHandler):
        def _json(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        MAX_BODY = 256 << 20  # generous cap; an .npy image is << this

        def do_GET(self):
            if self.path == "/healthz":
                # 503 + ok=false when nothing trained was loaded: a probe
                # must be able to distinguish a typo'd OUTPUT_DIR (random
                # weights) from a healthy deployment without reading stderr
                self._json(503 if service.untrained else 200, {
                    "ok": not service.untrained,
                    "untrained_weights": service.untrained,
                    "canvas": list(service.pad_hw),
                    "batch": service.batch,
                    "input_format": service.meta.get("input_format", "BGR"),
                    "checkpoint_step": service.meta.get("checkpoint_step"),
                })
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/detect":
                return self._json(404, {"error": "unknown path"})
            try:
                n = int(self.headers.get("Content-Length", 0))
                if n > self.MAX_BODY:
                    return self._json(
                        413, {"error": f"body {n} bytes > {self.MAX_BODY}"}
                    )
                img = decode_image_body(
                    self.rfile.read(n),
                    service.meta.get("input_format", "BGR"),
                )
                dets = service.detect(np.asarray(img))
                self._json(200, {"detections": dets})
            except ValueError as e:  # malformed body / wrong shape
                self._json(400, {"error": str(e)})
            except Exception as e:  # model/runtime fault: OUR fault, 500
                self._json(500, {"error": str(e)})

        def log_message(self, *a):  # quiet access log
            pass

    return ThreadingHTTPServer((host, port), Handler)


def main(argv=None):
    from dafne_tpu.utils.platform import (
        pin_platform_from_env,
        setup_compilation_cache,
    )

    pin_platform_from_env()
    setup_compilation_cache()

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--artifact", default="", help="model.stablehlo path")
    p.add_argument("--config-file", default="", help="live mode recipe")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8321)
    p.add_argument("opts", nargs="*", default=[])
    args = p.parse_args(argv)

    if args.artifact:
        if args.opts:
            raise SystemExit(
                "KEY VALUE overrides don't apply to a serialized artifact "
                f"(got {args.opts}); re-export with the desired config"
            )
        service = DetectorService.from_artifact(args.artifact)
    elif args.config_file:
        from dafne_tpu.config import load_config

        cfg = load_config(args.config_file, freeze=False)
        if args.opts:
            cfg.merge_from_list(args.opts)
        cfg.freeze()
        service = DetectorService.from_config(cfg)
    else:
        raise SystemExit("need --artifact or --config-file")

    srv = make_server(service, args.host, args.port)
    print(json.dumps({
        "serving": f"http://{args.host}:{srv.server_address[1]}",
        "canvas": list(service.pad_hw),
        "batch": service.batch,
    }), flush=True)
    srv.serve_forever()


if __name__ == "__main__":
    main()
