"""
Validate the XLA formulations of the StyleGAN2 primitives against literal numpy
implementations of the published op semantics (tests/numpy_reference.py).
"""

import numpy as np
import pytest

from gance_tpu.ops import (
    bias_act,
    conv_downsample_2d,
    downsample_2d,
    modulated_conv2d,
    upfirdn2d,
    upsample_2d,
    upsample_conv_2d,
)
from gance_tpu.ops.upfirdn2d import setup_filter_kernel

from tests import numpy_reference as ref


@pytest.mark.parametrize("up,down,pad0,pad1", [
    (1, 1, 0, 0),
    (1, 1, 2, 1),
    (2, 1, 2, 1),
    (1, 2, 1, 2),
    (2, 2, 3, 3),
    (1, 1, -1, 2),
    (2, 1, 3, -2),
])
def test_upfirdn2d_matches_reference(rng, up, down, pad0, pad1):
    x = rng.randn(2, 8, 8, 3).astype(np.float32)
    k = setup_filter_kernel((1, 3, 3, 1))
    got = np.asarray(upfirdn2d(x, k, up=up, down=down, pad0=pad0, pad1=pad1))
    want = ref.upfirdn2d_np(x, k.astype(np.float64), up=up, down=down, pad0=pad0, pad1=pad1)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_upsample_2d(rng):
    x = rng.randn(1, 6, 6, 2).astype(np.float32)
    got = np.asarray(upsample_2d(x))
    want = ref.upsample_2d_np(x)
    assert got.shape == (1, 12, 12, 2)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_downsample_2d(rng):
    x = rng.randn(1, 8, 8, 2).astype(np.float32)
    got = np.asarray(downsample_2d(x))
    want = ref.downsample_2d_np(x)
    assert got.shape == (1, 4, 4, 2)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_upsample_conv_2d(rng):
    x = rng.randn(2, 4, 4, 5).astype(np.float32)
    w = (rng.randn(3, 3, 5, 7) * 0.2).astype(np.float32)
    got = np.asarray(upsample_conv_2d(x, w))
    want = ref.upsample_conv_2d_np(x, w)
    assert got.shape == (2, 8, 8, 7)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_conv_downsample_2d(rng):
    x = rng.randn(2, 8, 8, 5).astype(np.float32)
    w = (rng.randn(3, 3, 5, 7) * 0.2).astype(np.float32)
    got = np.asarray(conv_downsample_2d(x, w))
    want = ref.conv_downsample_2d_np(x, w)
    assert got.shape == (2, 4, 4, 7)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("up,down,demod", [
    (False, False, True),
    (False, False, False),
    (True, False, True),
    (False, True, True),
])
def test_modulated_conv2d(rng, up, down, demod):
    b, h, cin, cout, wdim = 3, 8, 6, 10, 12
    x = rng.randn(b, h, h, cin).astype(np.float32)
    style_w = rng.randn(b, wdim).astype(np.float32)
    weight = rng.randn(3, 3, cin, cout).astype(np.float32)
    mod_weight = rng.randn(wdim, cin).astype(np.float32)
    mod_bias = rng.randn(cin).astype(np.float32) * 0.1
    got = np.asarray(
        modulated_conv2d(
            x, style_w, weight, mod_weight, mod_bias, up=up, down=down, demodulate=demod
        )
    )
    want = ref.modulated_conv2d_np(
        x, style_w, weight, mod_weight, mod_bias, up=up, down=down, demodulate=demod
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_bias_act_lrelu(rng):
    x = rng.randn(4, 8).astype(np.float32)
    b = rng.randn(8).astype(np.float32)
    got = np.asarray(bias_act(x, b, act="lrelu"))
    pre = x + b
    want = np.where(pre >= 0, pre, pre * 0.2) * np.sqrt(2.0)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_bias_act_linear_no_gain(rng):
    x = rng.randn(4, 8).astype(np.float32)
    got = np.asarray(bias_act(x, None, act="linear"))
    np.testing.assert_allclose(got, x, rtol=0, atol=0)


def test_bias_act_clamp(rng):
    x = np.array([[-10.0, 0.5, 10.0]], dtype=np.float32)
    got = np.asarray(bias_act(x, None, act="linear", clamp=1.0))
    np.testing.assert_allclose(got, [[-1.0, 0.5, 1.0]])
