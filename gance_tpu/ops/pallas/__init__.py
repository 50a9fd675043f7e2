"""
Pallas TPU kernels for the synthesis hot path — the explicit-fusion replacements
for the reference submodule's CUDA ops (SURVEY.md §2.9: fused_bias_act.cu,
upfirdn_2d.cu). Opt-in via GANCE_TPU_USE_PALLAS=1 (the XLA formulations in
gance_tpu/ops are the default and the numerical reference).
"""

from gance_tpu.ops.pallas.fused_ops import fused_bias_noise_lrelu, upsample2x_blur

__all__ = ["fused_bias_noise_lrelu", "upsample2x_blur"]
