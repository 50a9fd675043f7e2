"""
Parity of the fused Pallas Conv1+epilogue+ToRGB kernel against the composed
XLA ops it replaces (interpreter mode; hardware validation runs via
tools/bench_phase_fused.py on the real TPU).
"""

import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from gance_tpu.ops.pallas.phase_fused import phase_conv1_torgb_fused


@pytest.mark.parametrize("dtype", [jnp.float32])
def test_matches_composed_xla_ops(dtype):
    rng = np.random.RandomState(0)
    b, c = 1, 256
    x = jnp.asarray(rng.randn(b, 512, 512, c) * 0.5, dtype)
    w4 = jnp.asarray(rng.randn(2, 2, c, c) * 0.05, dtype)
    wrgb = jnp.asarray(rng.randn(b, c, 16) * 0.1, dtype)
    wrgb = wrgb.at[:, :, 12:].set(0.0)
    demod = jnp.asarray(rng.rand(b, c) + 0.5, jnp.float32)
    nb = jnp.asarray(rng.randn(1, 513, 513, c) * 0.1, dtype)

    got = phase_conv1_torgb_fused(x, w4, wrgb, demod, nb, interpret=True)

    z = lax.conv_general_dilated(
        x, w4, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    z = z * demod[:, None, None, :] + nb.astype(jnp.float32)
    z = jnp.maximum(z, z * 0.2).astype(dtype)
    ref = jnp.einsum("bmnc,bck->bmnk", z, wrgb)

    assert got.shape == (b, 513, 513, 16)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-4, rtol=1e-4
    )
