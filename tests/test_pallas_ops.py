"""
Pallas kernel correctness in interpreter mode (CPU) against the XLA formulations.
On real TPU hardware the same kernels compile natively (exercised by bench
tooling, not by this CPU suite).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from gance_tpu.ops.bias_act import bias_act
from gance_tpu.ops.pallas.fused_ops import fused_bias_noise_lrelu, upsample2x_blur
from gance_tpu.ops.upfirdn2d import upsample_2d


@pytest.mark.parametrize("shape", [(2, 8, 8, 16), (1, 16, 8, 4)])
def test_fused_bias_noise_lrelu_matches_xla(rng, shape):
    b, h, w, c = shape
    x = rng.randn(*shape).astype(np.float32)
    noise = rng.randn(1, h, w, 1).astype(np.float32)
    bias = rng.randn(c).astype(np.float32)
    strength = np.float32(0.37)

    got = np.asarray(
        fused_bias_noise_lrelu(
            jnp.asarray(x), jnp.asarray(noise), jnp.asarray(bias),
            jnp.asarray(strength), interpret=True,
        )
    )
    want = np.asarray(
        bias_act(jnp.asarray(x + noise * strength), jnp.asarray(bias), act="lrelu")
    )
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("shape", [(1, 8, 8, 3), (2, 16, 8, 4), (1, 4, 4, 1)])
def test_upsample2x_blur_matches_upfirdn(rng, shape):
    x = rng.randn(*shape).astype(np.float32)
    got = np.asarray(upsample2x_blur(jnp.asarray(x), interpret=True))
    want = np.asarray(upsample_2d(jnp.asarray(x)))
    assert got.shape == want.shape == (shape[0], shape[1] * 2, shape[2] * 2, shape[3])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize(
    "shape,w_logical",
    [((2, 65, 65, 8), None), ((1, 129, 136, 16), 129), ((2, 33, 40, 8), 33)],
)
def test_blur4_separable_pad11_matches_upfirdn(rng, shape, w_logical):
    """
    The production post-transpose-conv blur kernel (8-tap separable, halo DMA,
    boundary columns): interpreter-exact against the XLA upfirdn with the
    upsample_conv_2d pad arithmetic (pad0=pad1=1), including junk-padded widths.
    """
    from gance_tpu.ops.pallas.fused_ops import blur4_separable_pad11
    from gance_tpu.ops.upfirdn2d import setup_filter_kernel, upfirdn2d

    x = rng.randn(*shape).astype(np.float32)
    k = setup_filter_kernel((1, 3, 3, 1), gain=4.0)
    wl = w_logical or shape[2]
    got = np.asarray(
        blur4_separable_pad11(
            jnp.asarray(x), (0.25, 0.75, 0.75, 0.25), w_logical=w_logical,
            interpret=True,
        )
    )
    want = np.asarray(upfirdn2d(jnp.asarray(x[:, :, :wl, :]), k, pad0=1, pad1=1))
    assert got.shape == want.shape == (shape[0], shape[1] - 1, wl - 1, shape[3])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_upsample_conv_2d_shape_contract(rng):
    """The pallas-gated dispatcher preserves the NVlabs output shape on CPU."""
    from gance_tpu.ops.upfirdn2d import upsample_conv_2d

    x = rng.randn(2, 32, 32, 8).astype(np.float32)
    w = rng.randn(3, 3, 8, 8).astype(np.float32)
    out = np.asarray(upsample_conv_2d(jnp.asarray(x), jnp.asarray(w)))
    assert out.shape == (2, 64, 64, 8)


@pytest.mark.parametrize("shape", [(2, 19, 19, 8), (1, 11, 27, 4)])
def test_stencil_blur4_matches_xla(rng, shape):
    from gance_tpu.ops.pallas.fused_ops import stencil_blur4_valid
    from gance_tpu.ops.upfirdn2d import setup_filter_kernel, upfirdn2d

    x = rng.randn(*shape).astype(np.float32)
    k = setup_filter_kernel((1, 3, 3, 1), gain=4.0)
    kflip = tuple(tuple(float(v) for v in row) for row in k[::-1, ::-1])
    got = np.asarray(stencil_blur4_valid(jnp.asarray(x), kflip, interpret=True))
    # equivalent: upfirdn with up=down=1, no padding == VALID convolution
    want = np.asarray(upfirdn2d(jnp.asarray(x), k, up=1, down=1, pad0=0, pad1=0))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
