"""
TPU compute primitives for StyleGAN2.

These replace the reference submodule's CUDA ops (SURVEY.md §2.9:
dnnlib/tflib/ops/upfirdn_2d.cu and fused_bias_act.cu) with XLA-native formulations
(conv_general_dilated + fused elementwise epilogues) and optional Pallas kernels for
the hot fused paths. Layout is NHWC everywhere (TPU-friendly); weights are HWIO.
"""

from gance_tpu.ops.bias_act import bias_act
from gance_tpu.ops.modulated_conv import modulated_conv2d
from gance_tpu.ops.upfirdn2d import (
    conv_downsample_2d,
    downsample_2d,
    setup_filter_kernel,
    upfirdn2d,
    upsample_2d,
    upsample_conv_2d,
)

__all__ = [
    "bias_act",
    "modulated_conv2d",
    "upfirdn2d",
    "setup_filter_kernel",
    "upsample_2d",
    "downsample_2d",
    "upsample_conv_2d",
    "conv_downsample_2d",
]
