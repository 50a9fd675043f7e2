"""
Style-modulated 2D convolution — the core StyleGAN2 synthesis op.

Semantics follow the reference submodule's `modulated_conv2d_layer`
(stylegan2 training/networks_stylegan2.py; SURVEY.md §2.9 row 4):

    s  = affine(style_w) + 1                       # per-sample input-channel scales
    ww = weight * s[in] ;  d = rsqrt(Σ ww² + 1e-8) # per-sample demod over (kh,kw,in)
    y  = demod ∘ conv(x * s, weight)               # conv may up/down-sample

TPU-first choice: the *non-fused* formulation (scale input channels, shared-weight
conv, scale output channels). The fused/grouped-conv variant bakes per-sample weights,
which defeats XLA's ability to keep one big MXU matmul shared across the batch; the
non-fused form is mathematically identical and keeps the conv batched. The two
elementwise scalings fuse into the conv's prologue/epilogue under XLA.

Weights are HWIO (kh, kw, in, out), activations NHWC. Runtime weight scaling
(equalized LR / "wscale": he_std = gain / sqrt(fan_in)) is applied here so stored
parameters keep the TF checkpoint's "unit" parameterization and .pkl weights load
unchanged.
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from gance_tpu.ops.precision import CONV_PRECISION
from gance_tpu.ops.upfirdn2d import (
    DEFAULT_RESAMPLE_KERNEL,
    conv_downsample_2d,
    upsample_conv_2d,
)


def runtime_weight_coef(fan_in: int, gain: float = 1.0, lrmul: float = 1.0) -> float:
    """Equalized-LR runtime coefficient: he_std * lrmul (use_wscale=True semantics)."""
    he_std = gain / np.sqrt(fan_in)
    return float(he_std * lrmul)


def style_vector(
    style_w: jax.Array, mod_weight: jax.Array, mod_bias: jax.Array
) -> jax.Array:
    """Style affine (dense, gain=1, lrmul=1): s = w @ (mod_weight*coef) + bias + 1.
    Returns fp32 (B, Cin)."""
    mod_coef = runtime_weight_coef(mod_weight.shape[0])
    return (
        jnp.dot(
            style_w.astype(jnp.float32),
            mod_weight.astype(jnp.float32) * mod_coef,
            precision=lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        + mod_bias.astype(jnp.float32)
        + 1.0
    )


def demod_vector(styles: jax.Array, w_scaled: jax.Array) -> jax.Array:
    """Demodulation d[b,o] = rsqrt( sum_i s[b,i]^2 * sum_khw w[...,i,o]^2 + 1e-8 ).
    `w_scaled` is the runtime-scaled fp32 conv weight (kh,kw,Cin,Cout)."""
    w_sq_sum = jnp.sum(jnp.square(w_scaled), axis=(0, 1))  # (Cin, Cout)
    return lax.rsqrt(
        jnp.dot(
            jnp.square(styles),
            w_sq_sum,
            precision=lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        + 1e-8
    )


def modulated_conv2d(
    x: jax.Array,
    style_w: jax.Array,
    weight: jax.Array,
    mod_weight: jax.Array,
    mod_bias: jax.Array,
    up: bool = False,
    down: bool = False,
    demodulate: bool = True,
    resample_kernel: Tuple[int, ...] = DEFAULT_RESAMPLE_KERNEL,
    compute_dtype: Optional[jnp.dtype] = None,
    out_nchw: bool = False,
) -> jax.Array:
    """
    :param x: activations (B, H, W, Cin).
    :param style_w: per-sample dlatent row (B, W_DIM) feeding the style affine.
    :param weight: conv weight (kh, kw, Cin, Cout), unit parameterization.
    :param mod_weight: style affine weight (W_DIM, Cin), unit parameterization.
    :param mod_bias: style affine bias (Cin,); +1 applied per StyleGAN2.
    :param up/down: 2x resample fused with the conv (mutually exclusive).
    :param demodulate: apply weight demodulation (disabled for ToRGB).
    :param out_nchw: emit (B, Cout, H', W') straight from the conv — used by the
        low-channel ToRGB layers whose downstream RGB chain lives in NCHW (C=3 on
        the lane axis wastes 42x; the conv chooses the layout for free). Plain
        (non-resampling) path only.
    :return: (B, H', W', Cout), or (B, Cout, H', W') when `out_nchw`.
    """
    if up and down:
        raise ValueError("up and down are mutually exclusive")
    if out_nchw and (up or down):
        raise ValueError("out_nchw is only supported on the plain conv path")
    dtype = compute_dtype or x.dtype
    kh, kw, cin, cout = weight.shape

    styles = style_vector(style_w, mod_weight, mod_bias)  # (B, Cin)

    # Runtime-scaled conv weight (shared across batch).
    w_coef = runtime_weight_coef(kh * kw * cin)
    w = weight.astype(jnp.float32) * w_coef

    demod = demod_vector(styles, w) if demodulate else None  # (B, Cout)

    # Non-fused path: scale inputs, shared conv, scale outputs.
    x = x * styles[:, None, None, :].astype(x.dtype)
    w = w.astype(dtype)
    x = x.astype(dtype)

    if up:
        y = upsample_conv_2d(x, w, kernel=resample_kernel)
    elif down:
        y = conv_downsample_2d(x, w, kernel=resample_kernel)
    else:
        y = lax.conv_general_dilated(
            x,
            w,
            window_strides=(1, 1),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NCHW" if out_nchw else "NHWC"),
            precision=CONV_PRECISION,
            # follow the compute dtype: the MXU accumulates fp32 internally
            # either way, and an fp32-preferred output with bf16 inputs makes
            # the conv non-differentiable (mixed-dtype transposed conv)
            preferred_element_type=dtype,
        ).astype(dtype)

    if demod is not None:
        if out_nchw:
            y = y * demod[:, :, None, None].astype(y.dtype)
        else:
            y = y * demod[:, None, None, :].astype(y.dtype)
    return y


def dense_layer(
    x: jax.Array,
    weight: jax.Array,
    bias: Optional[jax.Array] = None,
    gain: float = 1.0,
    lrmul: float = 1.0,
) -> jax.Array:
    """
    Equalized-LR dense layer: y = x @ (weight * he_std * lrmul) [+ bias * lrmul].
    `weight` is (in, out) in the TF checkpoint's unit parameterization. Bias addition
    is typically deferred to `bias_act` (which applies the lrmul); pass bias here only
    for linear layers.
    """
    coef = runtime_weight_coef(weight.shape[0], gain=gain, lrmul=lrmul)
    y = jnp.dot(
        x,
        weight.astype(x.dtype) * jnp.asarray(coef, x.dtype),
        precision=CONV_PRECISION,
        preferred_element_type=x.dtype,
    ).astype(x.dtype)
    if bias is not None:
        y = y + bias.astype(y.dtype) * lrmul
    return y


def conv2d_layer(
    x: jax.Array,
    weight: jax.Array,
    up: bool = False,
    down: bool = False,
    gain: float = 1.0,
    lrmul: float = 1.0,
    resample_kernel: Tuple[int, ...] = DEFAULT_RESAMPLE_KERNEL,
) -> jax.Array:
    """
    Plain equalized-LR conv (discriminator layers / fromrgb). Weight HWIO, x NHWC.
    """
    kh, kw, cin, _ = weight.shape
    coef = runtime_weight_coef(kh * kw * cin, gain=gain, lrmul=lrmul)
    w = weight.astype(x.dtype) * jnp.asarray(coef, x.dtype)
    if up:
        return upsample_conv_2d(x, w, kernel=resample_kernel)
    if down:
        return conv_downsample_2d(x, w, kernel=resample_kernel)
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=CONV_PRECISION,
        preferred_element_type=x.dtype,
    ).astype(x.dtype)
