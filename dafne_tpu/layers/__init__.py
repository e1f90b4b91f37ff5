from dafne_tpu.layers.quant import (
    int8_conv,
    int8_conv_interceptor,
    quantize_kernel_per_channel,
    quantize_tensor_dynamic,
    quantized_eval_scope,
)
from dafne_tpu.layers.deform_conv import (
    DeformConv2d,
    bilinear_sample,
    center_to_offsets,
    corners_to_offsets,
    hbox_to_offsets,
    ltrb_to_offsets,
)

__all__ = [
    "DeformConv2d",
    "bilinear_sample",
    "ltrb_to_offsets",
    "hbox_to_offsets",
    "center_to_offsets",
    "corners_to_offsets",
    "int8_conv",
    "int8_conv_interceptor",
    "quantize_kernel_per_channel",
    "quantize_tensor_dynamic",
    "quantized_eval_scope",
]
