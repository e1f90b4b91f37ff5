"""Dynamic int8 (w8a8) quantized inference for the conv stack.

TPU-native serving optimization with no reference counterpart: the v5e MXU
runs s8 x s8 -> s32 at 2x the bf16 rate (394 vs 197 TOPS peak; measured
253 vs 160 on tower-shaped 3x3 convs on this chip), so eval-time convs can
trade ~0.4% weight/activation rounding error for ~1.6x conv throughput.

Design (opt-in via ``cfg.TPU.EVAL_INT8``; the default eval path is
untouched bf16):

- **Weights**: symmetric per-output-channel scales (max|w| over the
  kh/kw/cin axes / 127), quantized inside the jitted program — params stay
  the trained f32 tensors, checkpoints need no surgery, and XLA constant-
  folds the quantization when params are compile-time constants.
- **Activations**: dynamic symmetric per-tensor scale (max|x|/127 of the
  actual tensor, recomputed per call). No calibration pass or stats state;
  the extra reduction + rescale is fused by XLA and is noise next to the
  conv it feeds.
- **Accumulation** in int32 (``preferred_element_type``), dequantized to
  the module's compute dtype before bias/norm/activation, so everything
  around the conv (FrozenBN/GN/ReLU/residual adds) runs exactly as in the
  bf16 path.
- **Eligibility**: only plain ``nn.Conv`` with >=64 input and >=64 output
  channels and no feature groups. That automatically keeps full precision
  for the quality-critical edges of the network — the 3-channel stem, every
  predictor (cls_logits/ctrness/corners_pred/center_pred/xywha_pred/c*_pred
  all have <=15 output channels), deformable-conv offset generators (18
  channels), and MobileNet depthwise convs — with no fragile name lists.

Wiring: ``quantized_eval_scope(cfg)`` wraps ``model.apply`` in
``nn.intercept_methods``; interception happens at trace time, so the same
jitted eval step is emitted with int8 convs. The interceptor still CALLS
the original ``nn.Conv.__call__`` so parameter declaration (shapes, init,
checkpoint mapping) is byte-identical to the bf16 path; the unused bf16
conv result is dead-code-eliminated by jax/XLA (asserted by the perf
numbers in PARITY.md, not just assumed).

Accuracy gate: tools/int8_canary.py trains the overfit canary and asserts
int8 mAP within 1 point of bf16 on-chip (INT8_CANARY.json).
"""

from __future__ import annotations

from contextlib import nullcontext

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax import lax

# floors keep 0-range tensors (all-zero activations/weights) finite; both
# are far below any trained tensor's scale so they never bind otherwise
_ACT_SCALE_FLOOR = 1e-8
_W_SCALE_FLOOR = 1e-12

MIN_QUANT_CHANNELS = 64


def quantize_tensor_dynamic(x: jnp.ndarray):
    """Symmetric per-image int8 quantization with a dynamic scale.

    The scale is max|x|/127 over each leading-axis element's HWC slab
    (shape [B,1,..,1]), so a batch element's quantization — and therefore
    its detections — never depends on its batchmates (serving determinism
    across batch compositions).  Returns (x_q int8, scale f32) with
    x ~= x_q * scale."""
    xf = x.astype(jnp.float32)
    axes = tuple(range(1, x.ndim))
    scale = jnp.maximum(
        jnp.max(jnp.abs(xf), axis=axes, keepdims=True) / 127.0,
        _ACT_SCALE_FLOOR,
    )
    xq = jnp.clip(jnp.round(xf / scale), -127, 127)
    return xq.astype(jnp.int8), scale


def quantize_tensor_static(x: jnp.ndarray, amax: float):
    """Symmetric int8 quantization with a calibrated constant scale.

    Unlike the dynamic path there is no runtime max-reduce, so XLA fuses
    the quantize into the producing op's epilogue (FrozenBN/ReLU writes
    int8 directly) and the activation's HBM traffic into the conv halves.
    Out-of-calibration-range values saturate at +-127 (standard PTQ
    behavior; the canary gate owns the accuracy risk).
    Returns (x_q int8, scale f32 scalar) with x ~= x_q * scale."""
    scale = max(float(amax) / 127.0, _ACT_SCALE_FLOOR)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return xq.astype(jnp.int8), jnp.float32(scale)


def quantize_kernel_per_channel(w: jnp.ndarray):
    """Symmetric per-output-channel int8 quantization of an HWIO kernel.

    Returns (w_q int8, scale f32 [cout]) with w ~= w_q * scale."""
    wf = w.astype(jnp.float32)
    scale = jnp.maximum(
        jnp.max(jnp.abs(wf), axis=(0, 1, 2)) / 127.0, _W_SCALE_FLOOR
    )
    wq = jnp.clip(jnp.round(wf / scale), -127, 127)
    return wq.astype(jnp.int8), scale


def _pair(v):
    if v is None:
        return (1, 1)
    if isinstance(v, int):
        return (v, v)
    return tuple(v)


def int8_conv(x, kernel, bias, strides, padding, kernel_dilation, out_dtype,
              act_amax=None):
    """w8a8 conv: per-channel weight scale, s32 accumulation, dequant +
    bias in f32, cast to out_dtype.  Activation scale is dynamic per-image
    unless a calibrated ``act_amax`` is given (static mode)."""
    if act_amax is not None:
        xq, xs = quantize_tensor_static(x, act_amax)
    else:
        xq, xs = quantize_tensor_dynamic(x)
    wq, ws = quantize_kernel_per_channel(kernel)
    y = lax.conv_general_dilated(
        xq,
        wq,
        window_strides=_pair(strides),
        padding=padding,
        rhs_dilation=_pair(kernel_dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (xs * ws)  # [.., cout] * [cout]
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


def _lax_padding_ok(padding) -> bool:
    """True iff this nn.Conv padding can be passed verbatim to
    lax.conv_general_dilated: 'SAME'/'VALID' or a sequence of (lo, hi)
    pairs.  flax also accepts ints and sequences of ints (it canonicalizes
    internally); those must fall back to the original conv, not crash."""
    if isinstance(padding, str):
        return padding.upper() in ("SAME", "VALID")
    try:
        return all(
            not isinstance(p, (int, np.integer)) and len(p) == 2
            for p in padding
        )
    except TypeError:
        return False


def conv_is_quantizable(mod: nn.Module, x, min_channels: int = MIN_QUANT_CHANNELS) -> bool:
    """True iff this bound module is a plain nn.Conv we can run in int8."""
    if type(mod) is not nn.Conv:
        return False
    if not hasattr(x, "ndim") or x.ndim != 4:
        return False
    if mod.feature_group_count != 1:
        return False
    if x.shape[-1] < min_channels or mod.features < min_channels:
        return False
    # exotic nn.Conv features we don't reproduce -> keep the original path
    if _pair(getattr(mod, "input_dilation", None)) != (1, 1):
        return False
    if getattr(mod, "mask", None) is not None:
        return False
    if len(tuple(mod.kernel_size)) != 2:
        return False
    if not _lax_padding_ok(mod.padding):
        return False
    return True


def module_site(mod: nn.Module) -> str:
    """Stable string key for a bound module's position in the model tree."""
    return "/".join(str(p) for p in (mod.path or ()))


def make_int8_conv_interceptor(
    min_channels: int = MIN_QUANT_CHANNELS,
    act_scales=None,
    dynamic_min_channels: int = 256,
):
    """Build the interceptor with an eligibility channel threshold.

    The threshold picks where quantization pays on TPU: dequant/requant is
    extra HBM traffic around every quantized conv, so narrow bandwidth-bound
    convs (the early backbone stages) can get SLOWER in int8 while the wide
    compute-bound ones (towers/FPN/C4/C5) get the full MXU speedup —
    measured A/B in PARITY.md.

    ``act_scales``: optional {site: act_amax} table from
    ``calibrate_act_scales`` — sites found there use STATIC activation
    scales (the quantize fuses into the producer, no runtime max-reduce).
    Sites missing from the table (or recorded as amax<=0, i.e. the input
    was all-zero during calibration) fall back to the dynamic per-image
    scale — but only where dynamic quantization actually pays
    (``dynamic_min_channels``, default 256 per the A/B in PARITY.md);
    below that they stay full precision rather than regress."""

    act_scales = act_scales or None  # empty table == no table == dynamic

    def interceptor(
        next_fun, args, kwargs, context, _dyn_min=dynamic_min_channels
    ):
        mod = context.module
        if context.method_name != "__call__" or not args:
            return next_fun(*args, **kwargs)
        x = args[0]
        if not conv_is_quantizable(mod, x, min_channels):
            return next_fun(*args, **kwargs)
        amax = act_scales.get(module_site(mod)) if act_scales else None
        if amax is not None and amax <= 0:
            amax = None  # all-zero at calibration time != zero at serving
        if (
            amax is None
            and act_scales is not None
            and not conv_is_quantizable(mod, x, _dyn_min)
        ):
            # uncalibrated narrow conv in static mode: dynamic int8 would
            # be SLOWER than bf16 here — keep full precision
            return next_fun(*args, **kwargs)
        return _quantized_call(next_fun, args, kwargs, mod, x, amax)

    return interceptor


def int8_conv_interceptor(next_fun, args, kwargs, context):
    """flax method interceptor: swap eligible nn.Conv calls to w8a8.

    The original __call__ still runs so parameter declaration is identical
    to the unquantized model; its (unused) output is DCE'd under jit."""
    mod = context.module
    if context.method_name != "__call__" or not args:
        return next_fun(*args, **kwargs)
    x = args[0]
    if not conv_is_quantizable(mod, x):
        return next_fun(*args, **kwargs)
    return _quantized_call(next_fun, args, kwargs, mod, x)


def _quantized_call(next_fun, args, kwargs, mod, x, act_amax=None):
    ref_out = next_fun(*args, **kwargs)  # declares kernel/bias; DCE'd
    kernel = mod.get_variable("params", "kernel")
    bias = mod.get_variable("params", "bias") if mod.use_bias else None
    return int8_conv(
        x,
        kernel,
        bias,
        mod.strides,
        mod.padding,
        mod.kernel_dilation,
        ref_out.dtype,
        act_amax=act_amax,
    )


# ---------------------------------------------------------------------------
# Static-scale calibration (abs-max PTQ)
# ---------------------------------------------------------------------------

CALIB_COLLECTION = "quant_stats"


def make_calibration_interceptor(min_channels: int = MIN_QUANT_CHANNELS):
    """Interceptor that records each eligible conv input's abs-max.

    Runs the ORIGINAL conv (full precision) and sows max|x| into the
    ``quant_stats`` collection, so one jitted
    ``model.apply(..., mutable=[CALIB_COLLECTION])`` per calibration batch
    returns every site's amax — no eager per-op dispatch through the
    device tunnel."""

    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        if (
            context.method_name == "__call__"
            and args
            and conv_is_quantizable(mod, args[0], min_channels)
        ):
            mod.sow(
                CALIB_COLLECTION,
                "act_amax",
                jnp.max(jnp.abs(args[0].astype(jnp.float32))),
                reduce_fn=jnp.maximum,
                init_fn=lambda: jnp.float32(0.0),
            )
        return next_fun(*args, **kwargs)

    return interceptor


def flatten_calib_stats(stats) -> dict:
    """{site: amax} from the nested ``quant_stats`` collection."""
    from flax.traverse_util import flatten_dict

    out = {}
    for key, val in flatten_dict(stats).items():
        # key = (module, path..., 'act_amax'); sow without reduce_fn would
        # wrap values in a tuple — unwrap defensively
        if isinstance(val, (tuple, list)):
            val = val[0] if len(val) else 0.0
        out["/".join(key[:-1])] = float(val)
    return out


def calibrate_act_scales(
    model,
    variables,
    batches,
    min_channels: int = MIN_QUANT_CHANNELS,
    slack: float = 1.0,
) -> dict:
    """Run calibration batches and return {site: act_amax * slack}.

    ``batches`` is an iterable of image arrays shaped like the eval input.
    One jitted step per distinct shape; amax aggregated with max on host."""
    import jax as _jax

    @_jax.jit
    def calib_step(variables, images):
        with nn.intercept_methods(make_calibration_interceptor(min_channels)):
            _, mut = model.apply(
                variables, images, mutable=[CALIB_COLLECTION]
            )
        return mut[CALIB_COLLECTION]

    agg: dict = {}
    for images in batches:
        stats = flatten_calib_stats(_jax.device_get(calib_step(variables, images)))
        for k, v in stats.items():
            agg[k] = max(agg.get(k, 0.0), v)
    return {k: v * slack for k, v in agg.items()}


def save_act_scales(path: str, scales: dict) -> None:
    import json

    with open(path, "w") as f:
        json.dump(scales, f, indent=1, sort_keys=True)


def load_act_scales(path: str) -> dict:
    import json

    with open(path) as f:
        return {str(k): float(v) for k, v in json.load(f).items()}


def quantized_eval_scope(cfg=None, enabled=None, min_channels=None,
                         act_scales=None):
    """Context manager enabling int8 eval convs while tracing model.apply.

    Pass a config (reads ``cfg.TPU.EVAL_INT8`` / ``EVAL_INT8_MIN_CHANNELS``
    / ``EVAL_INT8_SCALES``) or the keyword args directly; returns a
    nullcontext when disabled so call sites can wrap unconditionally.
    ``act_scales`` (a dict, or a path to a JSON saved by
    ``save_act_scales``) switches calibrated sites to static scales."""
    if enabled is None:
        enabled = bool(cfg is not None and cfg.TPU.get("EVAL_INT8", False))
    if not enabled:
        return nullcontext()
    if min_channels is None and cfg is not None:
        min_channels = cfg.TPU.get("EVAL_INT8_MIN_CHANNELS", 0)
    if act_scales is None and cfg is not None:
        act_scales = cfg.TPU.get("EVAL_INT8_SCALES", "") or None
    if isinstance(act_scales, str):
        act_scales = load_act_scales(act_scales)
    if min_channels is None:
        min_channels = MIN_QUANT_CHANNELS  # bare API (no config)
    elif min_channels <= 0:
        # config 0 = auto: measured A/B winners (PARITY.md) — dynamic
        # scales only pay on wide compute-bound convs; static (fused, no
        # max-reduce) pays everywhere eligible
        min_channels = MIN_QUANT_CHANNELS if act_scales else 256
    return nn.intercept_methods(
        make_int8_conv_interceptor(min_channels, act_scales)
    )
