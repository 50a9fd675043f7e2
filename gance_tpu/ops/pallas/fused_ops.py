"""
Fused Pallas kernels.

1. `fused_bias_noise_lrelu` — the synthesis layer epilogue
   (noise-inject + bias + leaky-relu + gain) as one VMEM pass. This is the direct
   analogue of the submodule's fused_bias_act.cu plus the noise add that NVlabs
   performs separately; here it is one kernel: y = lrelu(x + n*s + b) * sqrt(2).

2. `upsample2x_blur` — the ToRGB skip-chain 2x upsample
   (gance_tpu.ops.upfirdn2d.upsample_2d with the default [1,3,3,1] kernel) as a
   polyphase stencil. The XLA formulation convolves a zero-stuffed image (75% of
   multiplies hit zeros); the polyphase form reads each input pixel once and writes
   each output pixel once with 2x2-tap phase filters:
       even phase: 0.25*x[i-1] + 0.75*x[i];  odd phase: 0.75*x[i] + 0.25*x[i+1]
   (separably in H and W; zero padding at the borders). This op is memory-bound at
   1024px and channel-starved (C=3), so the kernel flattens (W, C) into the lane
   axis and shifts by C lanes instead of padding 3 channels to 128 lanes.

   STATUS: numerically exact in interpreter mode (tests/test_pallas_ops.py), but
   the phase-interleave reshape ((rows, 2, W*C) -> transposed (rows, 2*W*C)) is a
   lane-layout cast the current Mosaic compiler rejects on hardware
   ("infer-vector-layout: unsupported shape cast"). The XLA formulation remains
   the production path; a phase-planar output layout is the known fix if this
   pass ever dominates a profile.
"""

import functools
from typing import Optional
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SQRT2 = math.sqrt(2.0)
# [1,3,3,1]/8 binomial, gain 2 per axis (factor 2 upsample): phases [1/4, 3/4].
_P_LOW = 0.25
_P_HIGH = 0.75


def _bias_noise_lrelu_kernel(x_ref, noise_ref, bias_ref, strength_ref, out_ref):
    x = x_ref[...]
    noise = noise_ref[...]  # (1, TH, W, 1) broadcasting over batch + channels
    bias = bias_ref[...]  # (C,)
    strength = strength_ref[0]
    pre = x + noise * strength + bias[None, None, None, :]
    out_ref[...] = jnp.where(pre >= 0, pre, pre * 0.2) * _SQRT2


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_bias_noise_lrelu(
    x: jax.Array,
    noise: jax.Array,
    bias: jax.Array,
    noise_strength: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    """
    lrelu(x + noise*strength + bias) * sqrt(2) in one pass.
    :param x: (B, H, W, C); noise: (1, H, W, 1); bias: (C,); noise_strength: ().
    """
    b, h, w, c = x.shape
    # Row-tile so a block fits VMEM comfortably (<= ~2MB fp32).
    th = h
    while b * th * w * c * 4 > 2 * 1024 * 1024 and th % 2 == 0:
        th //= 2
    grid = (h // th,)
    return pl.pallas_call(
        _bias_noise_lrelu_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, th, w, c), lambda i: (0, i, 0, 0)),
            pl.BlockSpec((1, th, w, 1), lambda i: (0, i, 0, 0)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((1,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((b, th, w, c), lambda i: (0, i, 0, 0)),
        interpret=interpret,
    )(
        x,
        noise.astype(x.dtype),
        bias.astype(x.dtype),
        jnp.reshape(noise_strength, (1,)).astype(x.dtype),
    )


def _upsample2x_blur_kernel(
    x_hbm_ref, out_ref, scratch_ref, dma_sem, *, channels: int, tile_h: int
):
    """
    Halo pattern: the padded input stays in HBM; each grid step DMAs its
    (B, TH+2, W*C) row window (one halo row above and below; caller zero-padded the
    borders) into VMEM scratch. Output block: (B, 2*TH, 2*W*C) with the W,C
    interleaving on the lane axis.
    """
    i = pl.program_id(0)
    window = pltpu.make_async_copy(
        x_hbm_ref.at[:, pl.ds(i * tile_h, tile_h + 2), :],
        scratch_ref,
        dma_sem,
    )
    window.start()
    window.wait()

    x = scratch_ref[...]  # (B, TH+2, WC)
    wc = x.shape[-1]

    # Horizontal neighbors: shift the flattened (W, C) lane axis by C.
    zeros = jnp.zeros_like(x[..., :channels])
    x_left = jnp.concatenate([zeros, x[..., :-channels]], axis=-1)  # x[w-1]
    x_right = jnp.concatenate([x[..., channels:], zeros], axis=-1)  # x[w+1]

    # Horizontal phases (still at input rows): even = .25*left + .75*x,
    # odd = .75*x + .25*right, interleaved to (..., 2W, C) lane order.
    h_even = _P_LOW * x_left + _P_HIGH * x
    h_odd = _P_HIGH * x + _P_LOW * x_right
    b = x.shape[0]
    rows = x.shape[1]
    inter = jnp.stack([h_even, h_odd], axis=-2)  # (B, rows, 2, WC)
    inter = inter.reshape(b, rows, 2, wc // channels, channels)
    inter = inter.transpose(0, 1, 3, 2, 4).reshape(b, rows, 2 * wc)  # (B, rows, 2WC)

    # Vertical phases over the real rows [1, TH]: even uses row i-1 and i,
    # odd uses row i and i+1.
    cur = inter[:, 1 : 1 + tile_h]
    up = inter[:, 0:tile_h]
    down = inter[:, 2 : 2 + tile_h]
    v_even = _P_LOW * up + _P_HIGH * cur  # (B, TH, 2WC)
    v_odd = _P_HIGH * cur + _P_LOW * down
    out = jnp.stack([v_even, v_odd], axis=2).reshape(b, 2 * tile_h, 2 * wc)
    out_ref[...] = out


@functools.partial(jax.jit, static_argnames=("interpret",))
def upsample2x_blur(x: jax.Array, interpret: bool = False) -> jax.Array:
    """
    2x FIR upsample with the [1,3,3,1] binomial (== upsample_2d defaults) as a
    polyphase Pallas kernel. x: (B, H, W, C) -> (B, 2H, 2W, C).
    """
    b, h, w, c = x.shape
    # One halo row of zeros at top and bottom (blur pad semantics).
    padded = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
    flat = padded.reshape(b, h + 2, w * c)

    th = h
    while b * (2 * th) * (2 * w * c) * 4 > 4 * 1024 * 1024 and th % 2 == 0:
        th //= 2
    grid = (h // th,)

    out = pl.pallas_call(
        functools.partial(_upsample2x_blur_kernel, channels=c, tile_h=th),
        out_shape=jax.ShapeDtypeStruct((b, 2 * h, 2 * w * c), x.dtype),
        grid=grid,
        in_specs=[
            # Full padded input resident off-chip; the kernel DMAs overlapping
            # (th+2)-row halo windows itself.
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((b, 2 * th, 2 * w * c), lambda i: (0, i, 0)),
        scratch_shapes=[
            pltpu.VMEM((b, th + 2, w * c), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(flat)
    return out.reshape(b, 2 * h, 2 * w, c)


def _blur_window_dma(x_hbm, win, sem, b, i, n, th):
    """
    DMA one (th+3)-row halo window of image `b` into `win`, zero-filling the
    virtual pad row at the top (first block) / bottom (last block). Halo rows
    ride the UNTILED H dim — Mosaic requires DMA slice extents aligned to the
    (8, 128) tiling on the last two dims, so those are always copied full-width.
    """
    r0 = i * th

    @pl.when(i == 0)
    def _():
        win[0:1, :, :] = jnp.zeros_like(win[0:1, :, :])
        cp = pltpu.make_async_copy(x_hbm.at[b, 0 : th + 2, :, :], win.at[1 : th + 3], sem)
        cp.start()
        cp.wait()

    @pl.when(jnp.logical_and(i > 0, i < n - 1))
    def _():
        cp = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(r0 - 1, th + 3), :, :], win.at[0 : th + 3], sem
        )
        cp.start()
        cp.wait()

    @pl.when(i == n - 1)
    def _():
        win[th + 2 : th + 3, :, :] = jnp.zeros_like(win[0:1, :, :])
        cp = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(r0 - 1, th + 2), :, :], win.at[0 : th + 2], sem
        )
        cp.start()
        cp.wait()


def _blur4_sep_kernel(
    x_hbm, out_ref, win, sem, *, th: int, taps: tuple, w_logical: int
):
    """
    One grid step = one image x one row-block: DMA the halo window, run BOTH
    separable 4-tap passes in VMEM, write (th, w_logical-1) output rows. 8 taps
    instead of the 16 XLA's 2D depthwise form burns — this op is VPU-bound, so
    tap count is the budget — and zero intermediate HBM traffic.

    Layout: W on sublanes, C on lanes. The input's W may be padded past
    `w_logical` with junk columns (DMA extents must be 8-aligned); the kernel
    never reads them. W borders (the upfirdn pad0=pad1=1 zeros) are explicit
    boundary-column expressions; unaligned STATIC slices/stores on the sublane
    dim are supported by current Mosaic (probed on v5e).
    """
    k0, k1, k2, k3 = taps
    _blur_window_dma(x_hbm, win, sem, pl.program_id(0), pl.program_id(1),
                     pl.num_programs(1), th)
    w_out = w_logical - 1

    # vertical 4-tap, then horizontal 4-tap; interior cols j=1..w_out-2 read
    # x[j-1..j+2]. Compute dtype = data dtype (bf16 VPU rate is the budget).
    vt = (
        k0 * win[0:th]
        + k1 * win[1 : th + 1]
        + k2 * win[2 : th + 2]
        + k3 * win[3 : th + 3]
    )  # (th, Wp, C)

    mid = (
        k0 * vt[:, 0 : w_out - 2]
        + k1 * vt[:, 1 : w_out - 1]
        + k2 * vt[:, 2 : w_out]
        + k3 * vt[:, 3 : w_out + 1]
    )
    left = k1 * vt[:, 0:1] + k2 * vt[:, 1:2] + k3 * vt[:, 2:3]
    right = (
        k0 * vt[:, w_logical - 3 : w_logical - 2]
        + k1 * vt[:, w_logical - 2 : w_logical - 1]
        + k2 * vt[:, w_logical - 1 : w_logical]
    )
    dtype = out_ref.dtype
    out_ref[0, :, 0:1, :] = left.astype(dtype)
    out_ref[0, :, 1 : w_out - 1, :] = mid.astype(dtype)
    out_ref[0, :, w_out - 1 : w_out, :] = right.astype(dtype)


def _blur4_sep_fold_kernel(
    x_hbm, out_ref, win, sem, *, th: int, taps: tuple, w_logical: int
):
    """
    The C=64 variant: DMA lane extents must be 128-aligned, so the caller views
    (H, W, 64) as (H, W/2, 128) — adjacent column pairs folded into the lane
    axis (even col = lanes 0:64, odd col = lanes 64:128). Horizontal taps then
    mix the two lane halves of neighboring folds; unaligned lane-half slices are
    Mosaic-supported. `w_logical` is the UNFOLDED valid width (odd: 2^k + 1).
    """
    k0, k1, k2, k3 = taps
    _blur_window_dma(x_hbm, win, sem, pl.program_id(0), pl.program_id(1),
                     pl.num_programs(1), th)
    assert w_logical % 2 == 1
    m = (w_logical - 1) // 2  # full output fold count (w_out = 2m)

    vt = (
        k0 * win[0:th]
        + k1 * win[1 : th + 1]
        + k2 * win[2 : th + 2]
        + k3 * win[3 : th + 3]
    )  # (th, WFp, 128)

    e = vt[:, :, 0:64]   # x[2f]
    o = vt[:, :, 64:128]  # x[2f + 1]

    # out col 2f   = k0 x[2f-1] + k1 x[2f]   + k2 x[2f+1] + k3 x[2f+2]
    # out col 2f+1 = k0 x[2f]   + k1 x[2f+1] + k2 x[2f+2] + k3 x[2f+3]
    even_main = (
        k0 * o[:, 0 : m - 1] + k1 * e[:, 1:m] + k2 * o[:, 1:m] + k3 * e[:, 2 : m + 1]
    )  # folds 1..m-1
    even_0 = k1 * e[:, 0:1] + k2 * o[:, 0:1] + k3 * e[:, 1:2]  # x[-1] pad = 0
    odd_main = (
        k0 * e[:, 0 : m - 1]
        + k1 * o[:, 0 : m - 1]
        + k2 * e[:, 1:m]
        + k3 * o[:, 1:m]
    )  # folds 0..m-2
    # last odd col (2m-1) reads x[2m-2..2m+1]; x[2m] = e[m] is the final valid
    # column, x[2m+1] is the upfirdn zero pad
    odd_last = k0 * e[:, m - 1 : m] + k1 * o[:, m - 1 : m] + k2 * e[:, m : m + 1]

    dtype = out_ref.dtype
    out_ref[0, :, 0:1, 0:64] = even_0.astype(dtype)
    out_ref[0, :, 1:m, 0:64] = even_main.astype(dtype)
    out_ref[0, :, 0 : m - 1, 64:128] = odd_main.astype(dtype)
    out_ref[0, :, m - 1 : m, 64:128] = odd_last.astype(dtype)


@functools.partial(
    jax.jit, static_argnames=("taps", "w_logical", "tile_h", "interpret")
)
def blur4_separable_pad11(
    x: jax.Array,
    taps: tuple,
    w_logical: Optional[int] = None,
    tile_h: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """
    upfirdn2d(x[..., :w_logical, :], outer(taps, taps), pad0=1, pad1=1) — the
    post-transpose-conv smoothing FIR of `upsample_conv_2d` — as one fused
    separable Pallas pass. x: (B, H, Wp, C); out (B, H-1, w_logical-1, C).
    Columns >= w_logical are ignored padding (Wp must be 8-aligned for C%128==0,
    16-aligned for C==64, so halo DMAs satisfy Mosaic's tiling alignment).
    """
    b, h, wp, c = x.shape
    w_logical = wp if w_logical is None else w_logical
    out_h = h - 1
    w_out = w_logical - 1
    if out_h % tile_h:
        raise ValueError(f"H-1={out_h} must be a multiple of tile_h={tile_h}")
    grid = (b, out_h // tile_h)
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.HBM)
    ]

    if c == 64 and not interpret:
        if wp % 16 or w_logical % 2 != 1:
            raise ValueError(f"C=64 fold path needs 16-aligned Wp, odd w_logical; got {wp}, {w_logical}")
        folded = x.reshape(b, h, wp // 2, 128)
        out = pl.pallas_call(
            functools.partial(
                _blur4_sep_fold_kernel, th=tile_h, taps=taps, w_logical=w_logical
            ),
            out_shape=jax.ShapeDtypeStruct((b, out_h, w_out // 2, 128), x.dtype),
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, tile_h, w_out // 2, 128), lambda bi, i: (bi, i, 0, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((tile_h + 3, wp // 2, 128), x.dtype),
                pltpu.SemaphoreType.DMA,
            ],
        )(folded)
        return out.reshape(b, out_h, w_out, 64)

    return pl.pallas_call(
        functools.partial(
            _blur4_sep_kernel, th=tile_h, taps=taps, w_logical=w_logical
        ),
        out_shape=jax.ShapeDtypeStruct((b, out_h, w_out, c), x.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tile_h, w_out, c), lambda bi, i: (bi, i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 3, wp, c), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x)


def _stencil_blur_kernel(
    x_hbm_ref, out_ref, scratch_ref, dma_sem, *, taps, tile_h: int, window_h: int
):
    """
    VALID 4-tap 2D stencil over a caller-padded (B, C, H, W) input:
    out[i, j] = sum over (a, b) of k[a, b] * x[i+a, j+b]. Row-tiled with manual
    halo DMA; tap shifts are pltpu.roll along sublanes (H) and lanes (W) followed
    by 0-offset aligned slices — Mosaic rejects unaligned slice offsets on the
    tiled dims, rolls it supports.

    STATUS (candidate replacement for the memory-bound post-transpose-conv blur,
    profiled at ~34% HBM BW as an XLA depthwise conv): exact in interpreter mode;
    on hardware the current Mosaic compiler blocks each formulation tried —
    NHWC DMA slices need 8/128-aligned W/C, bf16 `roll` is "not implemented", and
    the fp32 roll formulation overflows scoped VMEM from rotate temporaries. The
    XLA formulation stays the production path; revisit when Mosaic grows sub-lane
    slice offsets or 16-bit rotates.
    """
    i = pl.program_id(1)
    b = pl.program_id(0)
    window = pltpu.make_async_copy(
        x_hbm_ref.at[b, :, pl.ds(i * tile_h, window_h), :],
        scratch_ref,
        dma_sem,
    )
    window.start()
    window.wait()

    x = scratch_ref[...]  # (C, WINDOW_H, W)
    w_out = out_ref.shape[3]
    rows = x.shape[1]
    cols = x.shape[2]
    acc = None
    for a in range(4):
        # pltpu.roll wants non-negative shifts: roll by size-a == shift left by a.
        rolled_rows = pltpu.roll(x, (rows - a) % rows, 1) if a else x
        for c in range(4):
            shifted = (
                pltpu.roll(rolled_rows, (cols - c) % cols, 2) if c else rolled_rows
            )
            term = shifted[:, :tile_h, :w_out] * taps[a][c]
            acc = term if acc is None else acc + term
    out_ref[0, ...] = acc


@functools.partial(jax.jit, static_argnames=("kernel", "interpret"))
def stencil_blur4_valid(
    x: jax.Array, kernel: tuple, interpret: bool = False
) -> jax.Array:
    """
    VALID true-convolution with a static 4x4 FIR over (B, H, W, C) input (already
    padded by the caller): output (B, H-3, W-3, C). Used as the fast path for the
    memory-bound post-transpose-conv blur in upsample_conv_2d — profiled at ~34%
    of HBM bandwidth as an XLA depthwise conv on 1025^2 intermediates.

    :param kernel: 4x4 nested tuple of python floats (pre-flipped for convolution).
    """
    b, h, w, c = x.shape
    out_h, out_w = h - 3, w - 3
    # Work in (B, C, H, W): lanes = W (large), sublanes = H. Pad W to the lane
    # quantum and H so every DMA window stays in bounds.
    sub = 16 if x.dtype.itemsize == 2 else 8
    x_chw = jnp.transpose(x, (0, 3, 1, 2))
    if w % 128:
        x_chw = jnp.pad(x_chw, ((0, 0), (0, 0), (0, 0), (0, 128 - w % 128)))
        w = x_chw.shape[3]

    # Tile rows; DMA window = tile_h + 3 halo rounded to the sublane quantum.
    tile_h = out_h
    while (tile_h + sub) * w * c * x.dtype.itemsize > 5 * 1024 * 1024 and tile_h % 2 == 0:
        tile_h //= 2
    if out_h % tile_h:
        tile_h = out_h
    window_h = tile_h + 3
    if window_h % sub:
        window_h += sub - (window_h % sub)
    needed_h = (out_h // tile_h - 1) * tile_h + window_h
    if needed_h > h:
        x_chw = jnp.pad(x_chw, ((0, 0), (0, 0), (0, needed_h - h), (0, 0)))
    grid = (b, out_h // tile_h)

    out = pl.pallas_call(
        functools.partial(
            _stencil_blur_kernel, taps=kernel, tile_h=tile_h, window_h=window_h
        ),
        out_shape=jax.ShapeDtypeStruct((b, c, out_h, out_w), x.dtype),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, c, tile_h, out_w), lambda b_, i: (b_, 0, i, 0)),
        scratch_shapes=[
            pltpu.VMEM((c, window_h, w), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x_chw)
    return jnp.transpose(out, (0, 2, 3, 1))
