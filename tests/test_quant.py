"""int8 (w8a8) quantized-eval tests — layers/quant.py.

The quantized path is an opt-in TPU serving optimization with no reference
counterpart (the reference evals in fp16/fp32, plain_train_net.py AMP); the
contract tested here is OURS: eligible convs swap to s8xs8->s32 with small
bounded error, everything else stays bit-exact, and the full eval step runs
end-to-end with TPU.EVAL_INT8.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import linen as nn

from dafne_tpu.layers.quant import (
    MIN_QUANT_CHANNELS,
    conv_is_quantizable,
    int8_conv_interceptor,
    quantize_kernel_per_channel,
    quantize_tensor_dynamic,
    quantized_eval_scope,
)


def _rand(shape, seed=0, scale=1.0):
    return jnp.asarray(
        np.random.RandomState(seed).randn(*shape).astype(np.float32) * scale
    )


class TestQuantizePrimitives:
    def test_tensor_roundtrip_error_bound(self):
        x = _rand((4, 8, 8, 32), seed=1, scale=3.0)
        xq, s = quantize_tensor_dynamic(x)
        assert xq.dtype == jnp.int8 and s.shape == (4, 1, 1, 1)
        # symmetric rounding: error <= per-image scale/2 elementwise
        err = jnp.abs(xq.astype(jnp.float32) * s - x)
        assert bool(jnp.all(err <= s / 2 + 1e-6))

    def test_per_image_scale_isolates_batch_elements(self):
        # a huge outlier in image 0 must not coarsen image 1's quantization
        x = _rand((2, 8, 8, 16), seed=9)
        x = x.at[0].multiply(1000.0)
        xq, s = quantize_tensor_dynamic(x)
        solo_q, solo_s = quantize_tensor_dynamic(x[1:])
        assert bool(jnp.all(xq[1] == solo_q[0]))
        assert float(s[1, 0, 0, 0]) == float(solo_s[0, 0, 0, 0])

    def test_zero_tensor_finite(self):
        xq, s = quantize_tensor_dynamic(jnp.zeros((2, 4, 4, 8)))
        assert float(s.min()) > 0 and int(jnp.abs(xq).max()) == 0

    def test_kernel_per_channel(self):
        w = _rand((3, 3, 16, 24), seed=2)
        # make channel 5 much larger: per-channel scales must absorb it
        w = w.at[..., 5].multiply(100.0)
        wq, s = quantize_kernel_per_channel(w)
        assert s.shape == (24,)
        err = jnp.abs(wq.astype(jnp.float32) * s - w)
        assert float((err / s[None, None, None, :]).max()) <= 0.5 + 1e-5
        # a global scale would wipe out the small channels; per-channel must not
        small = wq[..., 0].astype(jnp.float32) * s[0]
        rel = jnp.linalg.norm(small - w[..., 0]) / jnp.linalg.norm(w[..., 0])
        assert float(rel) < 0.01


class TestInterceptor:
    def _apply(self, mod, x, seed=0):
        v = mod.init(jax.random.PRNGKey(seed), x)
        ref = mod.apply(v, x)
        with quantized_eval_scope(enabled=True):
            q = mod.apply(v, x)
        return ref, q

    def test_eligible_conv_close(self):
        x = _rand((2, 16, 16, 64), seed=3)
        conv = nn.Conv(64, (3, 3), padding=[(1, 1), (1, 1)], use_bias=True)
        ref, q = self._apply(conv, x)
        assert q.dtype == ref.dtype and q.shape == ref.shape
        rel = jnp.linalg.norm(q - ref) / jnp.linalg.norm(ref)
        assert 0 < float(rel) < 0.025  # quantized (not bit-equal), but close

    def test_strided_dilated_conv_matches_nn_conv_geometry(self):
        # stride/padding/dilation must reproduce nn.Conv exactly (the
        # backbone uses stride-2 shortcuts and dilated 3x3s, resnet.py)
        x = _rand((2, 17, 17, 64), seed=4)
        conv = nn.Conv(
            64,
            (3, 3),
            strides=(2, 2),
            padding=[(2, 2), (2, 2)],
            kernel_dilation=(2, 2),
            use_bias=False,
        )
        ref, q = self._apply(conv, x)
        assert q.shape == ref.shape
        rel = jnp.linalg.norm(q - ref) / jnp.linalg.norm(ref)
        assert float(rel) < 0.03

    @pytest.mark.parametrize(
        "conv,ch",
        [
            # predictor-sized output (<64) -> full precision
            (nn.Conv(15, (3, 3), padding=[(1, 1), (1, 1)]), 64),
            # small input (<64, e.g. the 3-channel stem) -> full precision
            (nn.Conv(64, (7, 7), padding=[(3, 3), (3, 3)]), 3),
            # grouped/depthwise (MobileNet) -> full precision
            (
                nn.Conv(
                    64,
                    (3, 3),
                    padding=[(1, 1), (1, 1)],
                    feature_group_count=64,
                ),
                64,
            ),
        ],
    )
    def test_ineligible_convs_bit_exact(self, conv, ch):
        x = _rand((1, 8, 8, ch), seed=5)
        ref, q = self._apply(conv, x)
        assert bool(jnp.all(q == ref))

    def test_eligibility_predicate(self):
        x = jnp.zeros((1, 8, 8, MIN_QUANT_CHANNELS))
        ok = nn.Conv(MIN_QUANT_CHANNELS, (3, 3), padding="SAME")
        bad = nn.Conv(MIN_QUANT_CHANNELS, (3, 3), padding="CIRCULAR")
        # unbound modules: predicate must reject non-Conv and exotic padding
        assert not conv_is_quantizable(nn.Dense(8), x)
        assert conv_is_quantizable(ok, x)
        assert not conv_is_quantizable(bad, x)
        assert not conv_is_quantizable(ok, jnp.zeros((8, 8, 64)))  # ndim!=4
        # flax-legal paddings lax.conv rejects must fall back, not crash
        assert not conv_is_quantizable(
            nn.Conv(MIN_QUANT_CHANNELS, (3, 3), padding=1), x
        )
        assert not conv_is_quantizable(
            nn.Conv(MIN_QUANT_CHANNELS, (3, 3), padding=[1, 1]), x
        )
        # 1D kernels on 4D input are flax-legal too
        assert not conv_is_quantizable(
            nn.Conv(MIN_QUANT_CHANNELS, (3,), padding="SAME"), x
        )

    def test_int_padding_conv_runs_full_precision_not_crash(self):
        x = _rand((1, 8, 8, 64), seed=15)
        conv = nn.Conv(64, (3, 3), padding=1)  # stored verbatim by flax
        v = conv.init(jax.random.PRNGKey(0), x)
        ref = conv.apply(v, x)
        with quantized_eval_scope(enabled=True):
            q = conv.apply(v, x)
        assert bool(jnp.all(q == ref))

    def test_scope_disabled_is_noop(self):
        x = _rand((1, 8, 8, 64), seed=6)
        conv = nn.Conv(64, (3, 3), padding=[(1, 1), (1, 1)])
        v = conv.init(jax.random.PRNGKey(0), x)
        ref = conv.apply(v, x)
        with quantized_eval_scope(enabled=False):
            q = conv.apply(v, x)
        assert bool(jnp.all(q == ref))


class TestStaticScales:
    def test_static_matches_dynamic_when_calibrated_on_same_image(self):
        # batch 1: the dynamic per-image scale IS the tensor abs-max, so a
        # calibration amax from the same image must reproduce the output
        x = _rand((1, 16, 16, 64), seed=11)
        conv = nn.Conv(64, (3, 3), padding=[(1, 1), (1, 1)])
        v = conv.init(jax.random.PRNGKey(0), x)
        with quantized_eval_scope(enabled=True):
            dyn = conv.apply(v, x)
        amax = float(jnp.max(jnp.abs(x)))
        site_scales = {"": amax}  # unnamed root module -> empty site key
        with quantized_eval_scope(enabled=True, act_scales=site_scales):
            stat = conv.apply(v, x)
        assert bool(jnp.allclose(stat, dyn, atol=1e-5, rtol=1e-5))

    def test_undercalibrated_amax_saturates_not_nan(self):
        x = _rand((1, 8, 8, 64), seed=12, scale=10.0)
        conv = nn.Conv(64, (3, 3), padding=[(1, 1), (1, 1)])
        v = conv.init(jax.random.PRNGKey(0), x)
        with quantized_eval_scope(
            enabled=True, act_scales={"": float(jnp.max(jnp.abs(x))) / 50}
        ):
            out = conv.apply(v, x)
        assert bool(jnp.all(jnp.isfinite(out)))

    def test_empty_scales_is_exact_dynamic_fallback(self):
        x = _rand((1, 8, 8, 64), seed=13)
        conv = nn.Conv(64, (3, 3), padding=[(1, 1), (1, 1)])
        v = conv.init(jax.random.PRNGKey(0), x)
        with quantized_eval_scope(enabled=True):
            dyn = conv.apply(v, x)
        with quantized_eval_scope(enabled=True, act_scales={}):
            fb = conv.apply(v, x)
        assert bool(jnp.all(fb == dyn))

    def test_zero_amax_falls_back_to_dynamic(self):
        # a site recorded all-zero at calibration must NOT crush real
        # serving inputs through a 1e-8 static scale
        x = _rand((1, 8, 8, 256), seed=16)
        conv = nn.Conv(256, (3, 3), padding=[(1, 1), (1, 1)])
        v = conv.init(jax.random.PRNGKey(0), x)
        with quantized_eval_scope(enabled=True, min_channels=64):
            dyn = conv.apply(v, x)
        with quantized_eval_scope(
            enabled=True, min_channels=64, act_scales={"": 0.0}
        ):
            out = conv.apply(v, x)
        assert bool(jnp.all(out == dyn))

    def test_uncalibrated_narrow_site_stays_full_precision(self):
        # static mode, site missing from the table, channels below the
        # dynamic-win threshold (256): full precision, not dynamic int8
        x = _rand((1, 8, 8, 64), seed=17)
        conv = nn.Conv(64, (3, 3), padding=[(1, 1), (1, 1)])
        v = conv.init(jax.random.PRNGKey(0), x)
        ref = conv.apply(v, x)
        with quantized_eval_scope(
            enabled=True, min_channels=64,
            act_scales={"some/other/site": 1.0},
        ):
            out = conv.apply(v, x)
        assert bool(jnp.all(out == ref))

    def test_calibrate_model_and_static_eval(self, tmp_path):
        """End-to-end: sow-based calibration over the real model, JSON
        roundtrip, static-mode eval step runs and stays close to dynamic."""
        from dafne_tpu.engine.trainer import make_eval_step
        from dafne_tpu.layers.quant import (
            calibrate_act_scales,
            load_act_scales,
            save_act_scales,
        )
        from dafne_tpu.models import build_model
        from tests.test_model import tiny_cfg

        overrides = {
            "MODEL.RESNETS.RES2_OUT_CHANNELS": 64,
            "MODEL.RESNETS.STEM_OUT_CHANNELS": 64,
            "MODEL.FPN.OUT_CHANNELS": 64,
            "TPU.EVAL_INT8": True,
            "TPU.EVAL_INT8_MIN_CHANNELS": 64,
        }
        cfg = tiny_cfg(**overrides)
        model = build_model(cfg)
        hw = 128
        params = jax.jit(
            lambda: model.init(
                jax.random.PRNGKey(0), jnp.zeros((1, hw, hw, 3))
            )["params"]
        )()
        imgs = _rand((2, hw, hw, 3), seed=14, scale=50.0)

        scales = calibrate_act_scales(
            model, {"params": params}, [imgs], min_channels=64
        )
        assert len(scales) >= 5 and all(v > 0 for v in scales.values())
        path = str(tmp_path / "scales.json")
        save_act_scales(path, scales)
        assert load_act_scales(path) == {
            k: float(v) for k, v in scales.items()
        }

        cfg_s = tiny_cfg(**overrides)
        cfg_s.TPU.EVAL_INT8_SCALES = path
        det_s = jax.jit(make_eval_step(model, cfg_s, (hw, hw)))(params, imgs)
        det_d = jax.jit(make_eval_step(model, cfg, (hw, hw)))(params, imgs)
        for k in det_d:
            assert det_s[k].shape == det_d[k].shape
            assert bool(
                jnp.all(jnp.isfinite(det_s[k].astype(jnp.float32)))
            ), k
        # calibrated on the same image -> detection scores stay close
        assert bool(
            jnp.allclose(det_s["scores"], det_d["scores"], atol=5e-2)
        )

        # prove the serving lookup actually matches the calibration keys
        # (a silent key mismatch would fall back to dynamic and the above
        # closeness assert could not tell): crushing every calibrated
        # site's amax must visibly change the model output
        from dafne_tpu.layers.quant import quantized_eval_scope as qes

        crushed = {k: 1e-6 for k in scales}
        with qes(enabled=True, min_channels=64, act_scales=crushed):
            out_c = model.apply({"params": params}, imgs)
        with qes(enabled=True, min_channels=64):
            out_d = model.apply({"params": params}, imgs)
        diff = float(
            jnp.max(jnp.abs(out_c["logits"][0] - out_d["logits"][0]))
        )
        assert diff > 1e-3, "static scales were silently ignored"


class TestFullModel:
    def _cfg(self):
        from tests.test_model import tiny_cfg

        # widths >= MIN_QUANT_CHANNELS so backbone/FPN/tower convs quantize
        return tiny_cfg(**{
            "MODEL.RESNETS.RES2_OUT_CHANNELS": 64,
            "MODEL.RESNETS.STEM_OUT_CHANNELS": 64,
            "MODEL.FPN.OUT_CHANNELS": 64,
            "TPU.EVAL_INT8": True,
            # the shipped default (0 = auto: dynamic 256 / static 64)
            # targets the 256-wide flagship; this test model is 64-wide
            "TPU.EVAL_INT8_MIN_CHANNELS": 64,
        })

    def test_eval_step_int8(self):
        from dafne_tpu.engine.trainer import make_eval_step
        from dafne_tpu.models import build_model

        cfg = self._cfg()
        model = build_model(cfg)
        hw = 128
        params = jax.jit(
            lambda: model.init(
                jax.random.PRNGKey(0), jnp.zeros((1, hw, hw, 3))
            )["params"]
        )()
        imgs = _rand((2, hw, hw, 3), seed=7, scale=50.0)

        step_q = jax.jit(make_eval_step(model, cfg, (hw, hw)))
        det_q = step_q(params, imgs)
        cfg_f = self._cfg()
        cfg_f.TPU.EVAL_INT8 = False
        step_f = jax.jit(make_eval_step(model, cfg_f, (hw, hw)))
        det_f = step_f(params, imgs)

        for k in det_f:
            assert det_q[k].shape == det_f[k].shape
            assert bool(
                jnp.all(jnp.isfinite(det_q[k].astype(jnp.float32)))
            ), k
        # int8 must actually engage: the lowered program carries i8 convs
        q_ir = step_q.lower(params, imgs).as_text()
        assert "i8" in q_ir and "i32" in q_ir

    @pytest.mark.parametrize(
        "backbone",
        [
            "build_dafne_dla_fpn_backbone",
            "build_vovnet_fpn_backbone",
            "build_mnv2_backbone",
        ],
    )
    def test_other_backbone_families_run_under_int8_scope(self, backbone):
        """DLA/VoVNet(eSE)/MobileNet have grouped, depthwise and 1x1 convs
        the interceptor must quantize-or-skip without breaking the fwd."""
        from dafne_tpu.models import build_model
        from dafne_tpu.config import get_cfg

        cfg = get_cfg()
        cfg.MODEL.BACKBONE.NAME = backbone
        cfg.MODEL.VOVNET.CONV_BODY = "V-19-eSE"
        cfg.MODEL.FPN.OUT_CHANNELS = 64
        cfg.MODEL.DAFNE.NUM_CLASSES = 2
        cfg.MODEL.DAFNE.NUM_CLS_CONVS = 1
        cfg.MODEL.DAFNE.NUM_BOX_CONVS = 1
        cfg.TPU.COMPUTE_DTYPE = "float32"
        model = build_model(cfg)
        x = _rand((1, 128, 128, 3), seed=10, scale=50.0)
        params = model.init(jax.random.PRNGKey(0), x)["params"]
        with quantized_eval_scope(enabled=True, min_channels=64):
            out = model.apply({"params": params}, x)
        for lv in out["logits"]:
            assert bool(jnp.all(jnp.isfinite(lv.astype(jnp.float32))))

    def test_model_forward_interception_count(self):
        """Eligible convs in the real model are intercepted; predictors are
        not (all have <64 output channels)."""
        from dafne_tpu.models import build_model

        cfg = self._cfg()
        model = build_model(cfg)
        hw = 128
        params = jax.jit(
            lambda: model.init(
                jax.random.PRNGKey(0), jnp.zeros((1, hw, hw, 3))
            )["params"]
        )()

        hits, skips = [], []

        def counting(next_fun, args, kwargs, context):
            mod = context.module
            if (
                type(mod) is nn.Conv
                and context.method_name == "__call__"
                and args
            ):
                (hits if conv_is_quantizable(mod, args[0]) else skips).append(
                    "/".join(str(p) for p in (mod.path or ("?",)))
                )
            return int8_conv_interceptor(next_fun, args, kwargs, context)

        x = _rand((1, hw, hw, 3), seed=8, scale=50.0)
        with nn.intercept_methods(counting):
            out = model.apply({"params": params}, x)
        assert len(hits) >= 5, hits  # backbone + FPN + towers engaged
        # every predictor conv stayed full precision
        pred_names = ("cls_logits", "ctrness", "corners_pred", "center_pred")
        assert not any(any(p in h for p in pred_names) for h in hits), hits
        assert any("cls_logits" in s for s in skips), skips
        for lv in out["logits"]:
            assert bool(jnp.all(jnp.isfinite(lv.astype(jnp.float32))))


def test_int8_composes_with_device_tta(tmp_path):
    """TPU.EVAL_INT8 inside the fused device-aug TTA program: the int8
    eval step builds from cfg inside BucketedEvalSteps.get_fused, so the
    two opt-ins must compose (serving config: int8 + TTA)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from dafne_tpu.config import get_cfg
    from dafne_tpu.engine.tta import BucketedEvalSteps, tta_inference_single
    from dafne_tpu.models import build_model

    cfg = get_cfg()
    cfg.merge_from_file("configs/synthetic/base.yaml")
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 16
    cfg.MODEL.RESNETS.STEM_OUT_CHANNELS = 8
    cfg.MODEL.FPN.OUT_CHANNELS = 16
    cfg.MODEL.DAFNE.NUM_CLS_CONVS = 1
    cfg.MODEL.DAFNE.NUM_BOX_CONVS = 1
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TEST.AUG.MIN_SIZES = [128]
    cfg.TEST.AUG.MAX_SIZE = 128
    cfg.TEST.AUG.HFLIP = True
    cfg.TPU.EVAL_INT8 = True
    model = build_model(cfg)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3))
    )["params"]
    img = (np.random.RandomState(1).rand(256, 256, 3) * 255).astype(np.uint8)
    steps = BucketedEvalSteps(cfg, model)
    det = tta_inference_single(cfg, steps, params, img)
    assert det["corners"].shape[1] == 8
    assert any(isinstance(k, tuple) for k in steps._steps)  # fused path ran
