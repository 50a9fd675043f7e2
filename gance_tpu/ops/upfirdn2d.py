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
from typing import Optional, Sequence, Tuple, Union

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
    pad0_h: Optional[int] = None,
    pad1_h: Optional[int] = None,
    pad0_w: Optional[int] = None,
    pad1_w: Optional[int] = None,
) -> jax.Array:
    """
    Apply the upsample→FIR→downsample primitive to `x` of shape (N, H, W, C).

    :param kernel: 2D float FIR kernel (already gain-scaled; see `setup_filter_kernel`).
    :param up: integer zero-stuffing factor.
    :param down: integer decimation factor.
    :param pad0: padding before (top/left), applied after zero-stuffing. May be negative.
    :param pad1: padding after (bottom/right). May be negative.
    :param pad0_h/pad1_h/pad0_w/pad1_w: per-axis overrides of pad0/pad1 (used by
        the separable two-pass split of symmetric kernels).
    :return: (N, H_out, W_out, C) with H_out = (H*up + pad0 + pad1 - kh) // down + 1.
    """
    if x.ndim != 4:
        raise ValueError(f"upfirdn2d expects NHWC input, got shape {x.shape}")
    kernel = np.asarray(kernel, dtype=np.float32)
    if kernel.ndim != 2:
        raise ValueError("upfirdn2d kernel must be 2D; use setup_filter_kernel first.")
    pad0_h = pad0 if pad0_h is None else pad0_h
    pad1_h = pad1 if pad1_h is None else pad1_h
    pad0_w = pad0 if pad0_w is None else pad0_w
    pad1_w = pad1 if pad1_w is None else pad1_w

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
            padding=((pad0_h, pad1_h + up - 1), (pad0_w, pad1_w + up - 1)),
            lhs_dilation=(up, up),
            rhs_dilation=(1, 1),
            dimension_numbers=("NCHW", "HWIO", "NCHW"),
            feature_group_count=channels,
            precision=CONV_PRECISION,
            preferred_element_type=x.dtype,
        )
        return jnp.transpose(out, (0, 2, 3, 1)).astype(x.dtype)

    rhs = jnp.tile(k[:, :, None, None], (1, 1, 1, channels)).astype(x.dtype)
    out = lax.conv_general_dilated(
        x,
        rhs,
        window_strides=(down, down),
        # XLA supports negative padding (crop) directly; the +(up-1) restores the
        # NVlabs trailing zero-stuffing that lhs_dilation omits.
        padding=((pad0_h, pad1_h + up - 1), (pad0_w, pad1_w + up - 1)),
        lhs_dilation=(up, up),
        rhs_dilation=(1, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=channels,
        precision=CONV_PRECISION,
        preferred_element_type=x.dtype,
    )
    return out.astype(x.dtype)


def _upsample2x_polyphase(x: jax.Array, k1d: np.ndarray) -> jax.Array:
    """
    2x upsample with a separable 4-tap FIR, expressed as its polyphase
    decomposition in pure XLA: each output phase is a 2-tap blend of shifted
    inputs (even: k[0]*x[i-1] + k[2]*x[i]; odd: k[1]*x[i] + k[3]*x[i+1]),
    interleaved with a stack+reshape per axis. The zero-stuffed dilated-conv
    formulation multiplies 75% zeros and ran at ~34% HBM bandwidth in profiles;
    this form is elementwise work XLA fuses into the interleave copies.
    """
    xc = jnp.transpose(x, (0, 3, 1, 2))
    out = upsample2x_polyphase_nchw(xc, k1d)
    return jnp.transpose(out, (0, 2, 3, 1))


def upsample2x_polyphase_nchw(xc: jax.Array, k1d: KernelLike) -> jax.Array:
    """
    The polyphase 2x upsample on NCHW input, no layout sandwiches — the native
    form for the low-channel RGB skip chain (NHWC puts C=3 on the 128-lane axis;
    interleaving there materializes hugely padded tiles in a full-model context.
    With W on the lanes the interleaves are dense).
    """
    lo0, hi0, hi1, lo1 = (float(v) for v in np.asarray(k1d))  # [.25,.75,.75,.25]
    b, c, h, w = xc.shape
    xp = jnp.pad(xc, ((0, 0), (0, 0), (1, 1), (1, 1)))

    # horizontal phases (rows still padded): even = lo0*x[w-1] + hi1*x[w]
    left, mid, right = xp[..., :-2], xp[..., 1:-1], xp[..., 2:]
    h_even = lo0 * left + hi1 * mid
    h_odd = hi0 * mid + lo1 * right
    hs = jnp.stack([h_even, h_odd], axis=-1).reshape(b, c, h + 2, 2 * w)

    # vertical phases
    up, vmid, down = hs[:, :, :-2], hs[:, :, 1:-1], hs[:, :, 2:]
    v_even = lo0 * up + hi1 * vmid
    v_odd = hi0 * vmid + lo1 * down
    return jnp.stack([v_even, v_odd], axis=3).reshape(b, c, 2 * h, 2 * w)


def upsample2x_phases_nchw(xc: jax.Array, k1d: KernelLike) -> Tuple[jax.Array, ...]:
    """
    The polyphase 2x upsample WITHOUT the final interleave: returns the four
    phase planes ((i, j) = (row parity, col parity), each (B, C, H, W)) such
    that `upsample2x_polyphase_nchw(xc)[..., 2m+i, 2n+j] == phases[i*2+j][..., m, n]`
    bit-exactly (same taps, same accumulation order — only the stack/reshape
    interleaves are skipped).

    This feeds the fused uint8 phase epilogue (ops/phase_block.py
    `phase_top_block_uint8`): the skip add / bias / quantize run per-phase and
    only uint8 bytes are interleaved, cutting the final relayout traffic 4x.
    Do NOT use it to "simplify" upsample2x_polyphase_nchw — the two-stage
    interleave there is load-bearing for XLA fusion (measured r2b).
    """
    lo0, hi0, hi1, lo1 = (float(v) for v in np.asarray(k1d))
    b, c, h, w = xc.shape
    xp = jnp.pad(xc, ((0, 0), (0, 0), (1, 1), (1, 1)))

    # horizontal phases (rows still padded), same expressions as the
    # interleaving form so values match bit-for-bit
    left, mid, right = xp[..., :-2], xp[..., 1:-1], xp[..., 2:]
    h_even = lo0 * left + hi1 * mid
    h_odd = hi0 * mid + lo1 * right

    def vertical(hs: jax.Array) -> Tuple[jax.Array, jax.Array]:
        up, vmid, down = hs[:, :, :-2], hs[:, :, 1:-1], hs[:, :, 2:]
        return lo0 * up + hi1 * vmid, hi0 * vmid + lo1 * down

    v_even_j0, v_odd_j0 = vertical(h_even)
    v_even_j1, v_odd_j1 = vertical(h_odd)
    return v_even_j0, v_even_j1, v_odd_j0, v_odd_j1


def upsample_2d_nchw(
    xc: jax.Array,
    kernel: KernelLike = DEFAULT_RESAMPLE_KERNEL,
    gain: float = 1.0,
) -> jax.Array:
    """2x FIR upsampling on NCHW input (the synthesis RGB skip chain's layout)."""
    k = setup_filter_kernel(kernel, gain * 4.0)
    root = _separable_root(k)
    if k.shape == (4, 4) and np.allclose(np.outer(root, root), k):
        return upsample2x_polyphase_nchw(xc, root)
    out = upsample_2d(jnp.transpose(xc, (0, 2, 3, 1)), kernel, factor=2, gain=gain)
    return jnp.transpose(out, (0, 3, 1, 2))


import os as _os

# Escape hatch while the polyphase formulation is being qualified in-context:
# GANCE_TPU_UPSAMPLE=dilated restores the conv formulation.
_UPSAMPLE_MODE = _os.environ.get("GANCE_TPU_UPSAMPLE", "polyphase")


def upsample_2d(
    x: jax.Array,
    kernel: KernelLike = DEFAULT_RESAMPLE_KERNEL,
    factor: int = 2,
    gain: float = 1.0,
) -> jax.Array:
    """2x (by default) FIR upsampling. NVlabs `upsample_2d` pad arithmetic."""
    k = setup_filter_kernel(kernel, gain * (factor**2))
    if (
        _UPSAMPLE_MODE == "polyphase"
        and factor == 2
        and k.shape == (4, 4)
        and np.allclose(np.outer(_separable_root(k), _separable_root(k)), k)
    ):
        return _upsample2x_polyphase(x, _separable_root(k))
    p = k.shape[0] - factor
    return upfirdn2d(x, k, up=factor, pad0=(p + 1) // 2 + factor - 1, pad1=p // 2)


def _separable_root(k: np.ndarray) -> np.ndarray:
    """1D factor of a separable symmetric 2D kernel (k = outer(r, r), r >= 0)."""
    diag = np.sqrt(np.maximum(np.diag(k), 0.0))
    return diag


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

    pad0, pad1 = (p + 1) // 2 + factor - 1, p // 2 + 1
    root = _separable_root(k)
    cout = w.shape[3]
    h_in, w_in = x.shape[1], x.shape[2]
    conv_out_w = (w_in - 1) * factor + 1 + 2 * (ck - 1) - ck + 1
    use_pallas_blur = (
        _blur_kernel_enabled()
        and factor == 2
        and pad0 == 1
        and pad1 == 1
        and k.shape == (4, 4)
        and np.allclose(np.outer(root, root), k)
        and h_in == w_in
        and (conv_out_w - 1) % 8 == 0
        and conv_out_w >= 65
        and (cout == 64 or cout % 128 == 0)
    )
    # The Pallas blur's halo DMAs need the W extent aligned to the (8,128)
    # tiling (16 for the C=64 lane-folded path), so the transpose conv emits a
    # few extra junk columns on the right that the kernel never reads.
    quantum = 16 if cout == 64 else 8
    pad_extra = (-conv_out_w) % quantum if use_pallas_blur else 0

    y = lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(1, 1),
        # conv2d_transpose(stride f, VALID) output is (H-1)*f + ck, which equals the
        # zero-stuffed input ((H-1)*f + 1) padded ck-1 on both sides under VALID corr.
        padding=((ck - 1, ck - 1), (ck - 1, ck - 1 + pad_extra)),
        lhs_dilation=(factor, factor),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=CONV_PRECISION,
        preferred_element_type=x.dtype,
    ).astype(x.dtype)

    if use_pallas_blur:
        # The post-conv smoothing FIR is VPU-bound, not memory-bound (measured
        # at ~2.1 T ops/s ~= VPU peak as XLA's 16-tap 2D depthwise conv; an XLA
        # separable two-pass loses its tap saving to the intermediate
        # round-trip). The Pallas kernel runs both separable passes in one VMEM
        # residency: 8 taps, one HBM read, one HBM write.
        from gance_tpu.ops.pallas.fused_ops import blur4_separable_pad11

        return blur4_separable_pad11(
            y, tuple(float(v) for v in root), w_logical=conv_out_w
        )
    return upfirdn2d(y, k, pad0=pad0, pad1=pad1)


def _blur_kernel_enabled() -> bool:
    """
    Opt-in (GANCE_TPU_BLUR=pallas). Measured on v5e: XLA's 16-tap 2D depthwise
    form runs at ~2.1 T ops/s ~= VPU peak in-model, and the Pallas separable
    kernel's unaligned-slice shifts + per-grid-step DMA overheads cost more than
    the halved tap count saves (0.25-0.44x at C>=128; the C=64 lane-folded path
    is pathological). Kept for a future Mosaic with cheaper sublane shifts /
    pipelined halo DMA.
    """
    return _os.environ.get("GANCE_TPU_BLUR", "xla") == "pallas"


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
        preferred_element_type=x.dtype,
    ).astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("factor",))
def nearest_upsample_2d(x: jax.Array, factor: int = 2) -> jax.Array:
    """Plain nearest-neighbour upsampling (utility, not part of the NVlabs op set)."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, factor, w, factor, c))
    return x.reshape(n, h * factor, w * factor, c)
