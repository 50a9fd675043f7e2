"""
Compute-precision policy for the synthesis/training convs.

One knob, read once at import: GANCE_TPU_PRECISION =
  * "highest" (default) — fp32-exact MXU passes; bit-stable against the numpy
    references and the fidelity-sensitive loaded-weight path.
  * "default" — the hardware's fastest single-pass mode (bf16 multiply, fp32
    accumulate on TPU). ~3-6x faster matmul/conv throughput; per-pixel uint8
    deltas vs fp32 are small but nonzero.

The style/demod dots in modulated conv always stay fp32-HIGHEST — they are tiny
(512x512) and demodulation is numerically sensitive.
"""

import os

from jax import lax

_NAMES = {
    "highest": lax.Precision.HIGHEST,
    "high": lax.Precision.HIGH,
    "default": lax.Precision.DEFAULT,
}

CONV_PRECISION = _NAMES[os.environ.get("GANCE_TPU_PRECISION", "highest").lower()]
