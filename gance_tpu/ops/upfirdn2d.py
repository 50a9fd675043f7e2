"""
upfirdn2d — upsample, FIR filter, downsample — as XLA convolutions.

This is the TPU-native re-implementation of the reference submodule's CUDA primitive
(stylegan2 dnnlib/tflib/ops/upfirdn_2d.{cu,py}; see SURVEY.md §2.9). Semantics follow
the public NVlabs definition:

    1. zero-stuff the input by the integer factor `up` along H and W
       (each sample followed by up-1 zeros, so length becomes H*up),
    2. zero-pad by (pad0, pad1) on each spatial edge (negative pads crop),
    3. convolve (true convolution — kernel flipped) with a 2D FIR kernel per channel,
    4. keep every `down`-th sample.

On TPU all four steps map onto one `lax.conv_general_dilated` call (lhs_dilation for
zero-stuffing, window_strides for downsampling, depthwise grouping for the per-channel
FIR), which XLA lowers to fused HBM-friendly code — no custom kernel needed for the
memory-bound blur itself. Note XLA lhs_dilation yields (H-1)*up+1 samples (no trailing
zeros), so the NVlabs trailing stuffing is folded into the conv padding as pad1+(up-1).
Layout: NHWC.
"""

import functools
from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from gance_tpu.ops.precision import CONV_PRECISION

KernelLike = Union[Sequence[float], np.ndarray]

# The binomial resampling kernel used throughout StyleGAN2 (config-f default).
DEFAULT_RESAMPLE_KERNEL: Tuple[int, ...] = (1, 3, 3, 1)


def setup_filter_kernel(kernel: KernelLike, gain: float = 1.0) -> np.ndarray:
    """
    Normalize a 1D or 2D FIR kernel to a 2D float32 kernel with unit (or `gain`) DC
    response. Mirrors the submodule's `_setup_kernel` (upfirdn_2d.py upstream).
    """
    k = np.asarray(kernel, dtype=np.float32)
    if k.ndim == 1:
        k = np.outer(k, k)
    k /= np.sum(k)
    return k * gain


def upfirdn2d(
    x: jax.Array,
    kernel: np.ndarray,
    up: int = 1,
    down: int = 1,
    pad0: int = 0,
    pad1: int = 0,
) -> jax.Array:
    """
    Apply the upsample→FIR→downsample primitive to `x` of shape (N, H, W, C).

    :param kernel: 2D float FIR kernel (already gain-scaled; see `setup_filter_kernel`).
    :param up: integer zero-stuffing factor.
    :param down: integer decimation factor.
    :param pad0: padding before (top/left), applied after zero-stuffing. May be negative.
    :param pad1: padding after (bottom/right). May be negative.
    :return: (N, H_out, W_out, C) with H_out = (H*up + pad0 + pad1 - kh) // down + 1.
    """
    if x.ndim != 4:
        raise ValueError(f"upfirdn2d expects NHWC input, got shape {x.shape}")
    kernel = np.asarray(kernel, dtype=np.float32)
    if kernel.ndim != 2:
        raise ValueError("upfirdn2d kernel must be 2D; use setup_filter_kernel first.")

    channels = x.shape[-1]
    # True convolution: flip the kernel (lax convs are cross-correlations).
    k = jnp.asarray(kernel[::-1, ::-1], dtype=jnp.float32)

    # Lane-efficiency: NHWC puts channels on the TPU lane axis; a 3-channel RGB
    # stream pads 3 -> 128 lanes (42x wasted VPU work — the ToRGB skip chain at
    # 1024px showed up as the top fusions in profiles). For tiny channel counts,
    # run the depthwise FIR in NCHW so W (large) sits on the lanes instead.
    if channels < 8:
        rhs = k[:, :, None, None].astype(x.dtype)
        rhs = jnp.tile(rhs, (1, 1, 1, channels))
        out = lax.conv_general_dilated(
            jnp.transpose(x, (0, 3, 1, 2)),
            rhs,
            window_strides=(down, down),
            padding=((pad0, pad1 + up - 1), (pad0, pad1 + up - 1)),
            lhs_dilation=(up, up),
            rhs_dilation=(1, 1),
            dimension_numbers=("NCHW", "HWIO", "NCHW"),
            feature_group_count=channels,
            precision=CONV_PRECISION,
            preferred_element_type=jnp.float32,
        )
        return jnp.transpose(out, (0, 2, 3, 1)).astype(x.dtype)

    rhs = jnp.tile(k[:, :, None, None], (1, 1, 1, channels)).astype(x.dtype)
    out = lax.conv_general_dilated(
        x,
        rhs,
        window_strides=(down, down),
        # XLA supports negative padding (crop) directly; the +(up-1) restores the
        # NVlabs trailing zero-stuffing that lhs_dilation omits.
        padding=((pad0, pad1 + up - 1), (pad0, pad1 + up - 1)),
        lhs_dilation=(up, up),
        rhs_dilation=(1, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=channels,
        precision=CONV_PRECISION,
        preferred_element_type=jnp.float32,
    )
    return out.astype(x.dtype)


def upsample_2d(
    x: jax.Array,
    kernel: KernelLike = DEFAULT_RESAMPLE_KERNEL,
    factor: int = 2,
    gain: float = 1.0,
) -> jax.Array:
    """2x (by default) FIR upsampling. NVlabs `upsample_2d` pad arithmetic."""
    k = setup_filter_kernel(kernel, gain * (factor**2))
    p = k.shape[0] - factor
    return upfirdn2d(x, k, up=factor, pad0=(p + 1) // 2 + factor - 1, pad1=p // 2)


def downsample_2d(
    x: jax.Array,
    kernel: KernelLike = DEFAULT_RESAMPLE_KERNEL,
    factor: int = 2,
    gain: float = 1.0,
) -> jax.Array:
    """2x (by default) FIR downsampling. NVlabs `downsample_2d` pad arithmetic."""
    k = setup_filter_kernel(kernel, gain)
    p = k.shape[0] - factor
    return upfirdn2d(x, k, down=factor, pad0=(p + 1) // 2, pad1=p // 2)


def upsample_conv_2d(
    x: jax.Array,
    w: jax.Array,
    kernel: KernelLike = DEFAULT_RESAMPLE_KERNEL,
    factor: int = 2,
    gain: float = 1.0,
) -> jax.Array:
    """
    Fused transpose-conv (stride `factor`, VALID) followed by FIR smoothing — the
    upsampling convolution used by StyleGAN2 synthesis (`Conv0_up` layers).

    `w` is HWIO (kh, kw, in, out). NVlabs implements this as conv2d_transpose with a
    spatially-flipped, io-swapped weight; the transpose-conv's implicit flip cancels
    it, so on XLA this is exactly a cross-correlation of the zero-stuffed input with
    the *original* weight, padded (kh-1) on each side, followed by `upfirdn2d` with
    the documented pad arithmetic.
    """
    ck = w.shape[0]
    k = setup_filter_kernel(kernel, gain * (factor**2))
    p = (k.shape[0] - factor) - (ck - 1)

    y = lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(1, 1),
        # conv2d_transpose(stride f, VALID) output is (H-1)*f + ck, which equals the
        # zero-stuffed input ((H-1)*f + 1) padded ck-1 on both sides under VALID corr.
        padding=((ck - 1, ck - 1), (ck - 1, ck - 1)),
        lhs_dilation=(factor, factor),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=CONV_PRECISION,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    return upfirdn2d(y, k, pad0=(p + 1) // 2 + factor - 1, pad1=p // 2 + 1)


def conv_downsample_2d(
    x: jax.Array,
    w: jax.Array,
    kernel: KernelLike = DEFAULT_RESAMPLE_KERNEL,
    factor: int = 2,
    gain: float = 1.0,
) -> jax.Array:
    """
    FIR blur followed by a strided VALID convolution — StyleGAN2's downsampling conv
    (discriminator `Conv1_down` / `Skip` layers). `w` is HWIO.
    """
    ck = w.shape[0]
    k = setup_filter_kernel(kernel, gain)
    p = (k.shape[0] - factor) + (ck - 1)
    x = upfirdn2d(x, k, pad0=(p + 1) // 2, pad1=p // 2)
    return lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(factor, factor),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=CONV_PRECISION,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("factor",))
def nearest_upsample_2d(x: jax.Array, factor: int = 2) -> jax.Array:
    """Plain nearest-neighbour upsampling (utility, not part of the NVlabs op set)."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, factor, w, factor, c))
    return x.reshape(n, h * factor, w * factor, c)
