"""
Polyphase formulation of the top synthesis block (Conv0_up -> Conv1 -> ToRGB).

Why this exists: at 1024px config-f the block's channel count (64) is below the
TPU's 128-lane width, so the standard formulation leaves the MXU half idle on
`Conv1`, and the 4-tap smoothing FIR after the transposed conv runs as a 16-tap
2D depthwise pass at VPU peak (~24.5 ms of a 145 ms batch — the profiled
bottleneck; see ROUND_NOTES.md). Both problems disappear in *phase space*:

  * The transposed conv (stride-2) followed by the FIR blur is one linear
    operator. Decomposed over the four output phases (dh, dw) in {0,1}^2, each
    phase is a plain 3x3 stride-1 convolution on the coarse grid. Stacking the
    phases on the channel axis yields ONE dense conv
    (3,3,cin,4*cout) at half resolution: the blur's FLOPs ride the MXU inside
    the conv instead of the VPU, and the output channel count (256) fills the
    lanes.
  * `Conv1` (3x3 SAME on the fine grid) becomes a (2,2,4c,4c) conv on the
    coarse grid: per-phase the 3x3 window touches only a 2x2 patch of coarse
    pixels. Output channels again 4*64=256 -> full lane utilisation (the
    standard form measured ~38% MXU).
  * ToRGB (1x1) is phase-diagonal; the phases interleave back to pixel space
    only on the tiny RGB tensor.

Derivation (1D; H and W are independent, kernels combine as outer products).
With x the coarse input, s its 2x zero-stuffing (s[2i]=x[i]), w the 3-tap conv
weight and k the 4-tap FIR (both as cross-correlations, matching
`upsample_conv_2d`'s lax calls at upfirdn2d.py:223-291):

    u[a] = sum_d s[a+d-2] * w[d]          (transposed conv, pads ck-1=2)
    y[p] = sum_t u[p+t-1] * k[t]          (FIR, pad0=pad1=1)
         = sum_q s[p+q-3] * G[q],   G[q] = sum_{t+d=q} k[t]*w[d]   (6 taps)

Substituting s[2i]=x[i] and p=2m+delta gives the phase kernels

    y[2m+delta] = sum_{r=-1..1} x[m+r] * G[3-delta+2r]

— a 3-tap SAME conv per phase. For Conv1 (z[p] = sum_d y[p+d-1]*v[d]) the
window of output phase sigma lands on coarse rows {m-1, m} once the sigma=1
plane is defined as z[2m-1] (shifted by one fine pixel); the shift is undone
for free inside the final interleave. The conv therefore has a 2x2 kernel and
emits H/2+1 rows, of which the sigma=0 planes are valid on [0, H/2) and the
sigma=1 planes on [1, H/2].

Everything here replaces reference behavior exactly (same operator, different
association order): parity with the standard path is pinned by tests. The
reference implements this block as CUDA upfirdn_2d + cuDNN convs
(stylegan2 dnnlib/tflib/ops/upfirdn_2d.cu; SURVEY.md §2.9).

Phase/channel layout: channel index = ph * C + c with ph = dh*2 + dw (row
phase major). sigma planes of Conv1 use the same layout.
"""

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from gance_tpu.ops.bias_act import bias_act
from gance_tpu.ops.precision import CONV_PRECISION
from gance_tpu.ops.upfirdn2d import setup_filter_kernel, _separable_root

Array = jax.Array


def phase_kernel_slices(k1d: np.ndarray) -> np.ndarray:
    """The 1D composed kernel G (6 taps) slice indices are fixed; returns k1d
    validated for the phase path (length-4, symmetric, separable root)."""
    k1d = np.asarray(k1d, dtype=np.float32)
    if k1d.shape != (4,) or not np.allclose(k1d, k1d[::-1]):
        raise ValueError("phase path requires a symmetric 4-tap separable FIR")
    return k1d


def resample_root(resample_kernel: Tuple[int, ...], factor: int = 2) -> np.ndarray:
    """1D FIR root with upsampling gain, as `upsample_conv_2d` uses it."""
    k2 = setup_filter_kernel(resample_kernel, float(factor**2))
    root = _separable_root(k2)
    if k2.shape != (4, 4) or not np.allclose(np.outer(root, root), k2):
        raise ValueError("phase path requires a separable symmetric 4x4 FIR")
    return root.astype(np.float32)


def phase_path_supported(resample_kernel: Tuple[int, ...]) -> bool:
    """Whether the polyphase top block can represent this resampling FIR
    (symmetric separable 4-tap — config-f's (1,3,3,1)). Other kernels must
    stay on the generic upfirdn2d path."""
    try:
        root = resample_root(resample_kernel)
    except ValueError:
        return False
    return bool(np.allclose(root, root[::-1]))


def fold_upconv_blur_weights(w: Array, k1d: np.ndarray) -> Array:
    """
    Fold the stride-2 transposed conv + 4-tap FIR into one (3,3,cin,4*cout)
    stride-1 conv weight over the coarse grid.

    :param w: HWIO (3,3,cin,cout), already runtime-scaled (equalized LR).
    :param k1d: 1D FIR root including upsample gain (sums to 2).
    """
    k1d = phase_kernel_slices(k1d)
    kh, kw, cin, cout = w.shape
    if (kh, kw) != (3, 3):
        raise ValueError("phase upconv fold requires a 3x3 conv weight")
    k2 = jnp.asarray(np.outer(k1d, k1d), w.dtype)  # (4,4)

    # G2[qh,qw] = sum_{dh,dw} w[dh,dw] * k2[qh-dh, qw-dw]  -> (6,6,cin,cout)
    g2 = jnp.zeros((6, 6, cin, cout), w.dtype)
    for dh in range(3):
        for dw in range(3):
            g2 = g2.at[dh : dh + 4, dw : dw + 4].add(
                k2[:, :, None, None] * w[dh, dw][None, None]
            )

    # Phase (dh,dw) kernel = G2[(1-dh)::2, (1-dw)::2]  (3x3 each).
    phases = []
    for ph_h in range(2):
        for ph_w in range(2):
            phases.append(g2[(1 - ph_h) :: 2, (1 - ph_w) :: 2])  # (3,3,cin,cout)
    # (3,3,cin,4,cout) -> (3,3,cin,4*cout); channel = ph*cout + c.
    return jnp.stack(phases, axis=3).reshape(3, 3, cin, 4 * cout)


# 1D tap map for the Conv1 fold: _CONV1_TAPS[sigma] = [(kh, delta, d), ...]
# with kh in {0,1} the folded kernel row (input coarse row m + kh - 1), delta
# the input phase, d the original 3-tap index.
_CONV1_TAPS = {
    0: [(0, 1, 0), (1, 0, 1), (1, 1, 2)],  # z[2m]   = v0*y[2m-1] + v1*y[2m] + v2*y[2m+1]
    1: [(0, 0, 0), (0, 1, 1), (1, 0, 2)],  # z[2m-1] = v0*y[2m-2] + v1*y[2m-1] + v2*y[2m]
}


def fold_conv1_weights(v: Array) -> Array:
    """
    Fold a 3x3 SAME conv on the fine grid into a (2,2,4*cin,4*cout) conv on the
    phase planes. Output sigma=0 planes hold fine rows 2m, sigma=1 planes hold
    fine rows 2m-1 (one-pixel shift, undone at interleave time). With conv
    padding (1,1) the output is (H/2+1) x (W/2+1); validity windows are
    [0, H/2) for sigma=0 and [1, H/2] for sigma=1 per axis.

    :param v: HWIO (3,3,cin,cout), already runtime-scaled.
    """
    kh, kw, cin, cout = v.shape
    if (kh, kw) != (3, 3):
        raise ValueError("phase conv1 fold requires a 3x3 conv weight")
    folded = jnp.zeros((2, 2, 4 * cin, 4 * cout), v.dtype)
    for sig_h in range(2):
        for kh_i, delta_h, dh in _CONV1_TAPS[sig_h]:
            for sig_w in range(2):
                for kw_i, delta_w, dw in _CONV1_TAPS[sig_w]:
                    in_ph = delta_h * 2 + delta_w
                    out_ph = sig_h * 2 + sig_w
                    folded = folded.at[
                        kh_i,
                        kw_i,
                        in_ph * cin : (in_ph + 1) * cin,
                        out_ph * cout : (out_ph + 1) * cout,
                    ].add(v[dh, dw])
    return folded


def phase_split_fine(fine: Array) -> Array:
    """(B, H, W, 1) fine-grid map -> (B, H/2, W/2, 4) phase planes
    (ph = dh*2+dw, value at [m,n,ph] = fine[2m+dh, 2n+dw])."""
    b, h, w, c = fine.shape
    if c != 1 or h % 2 or w % 2:
        raise ValueError(f"expected (B, even, even, 1) fine map, got {fine.shape}")
    x = fine.reshape(b, h // 2, 2, w // 2, 2)
    return jnp.transpose(x, (0, 1, 3, 2, 4)).reshape(b, h // 2, w // 2, 4)


def phase_split_fine_shifted(fine: Array) -> Array:
    """(B, H, W, 1) fine map -> (B, H/2+1, W/2+1, 4) planes matching the Conv1
    output convention: plane (sig_h, sig_w) row m holds fine[2m - sig_h,
    2n - sig_w]; out-of-range entries are zero (they are sliced away later)."""
    b, h, w, c = fine.shape
    if c != 1 or h % 2 or w % 2:
        raise ValueError(f"expected (B, even, even, 1) fine map, got {fine.shape}")
    hh, hw = h // 2 + 1, w // 2 + 1
    planes = []
    for sig_h in range(2):
        for sig_w in range(2):
            plane = jnp.zeros((b, hh, hw), fine.dtype)
            rows = fine[:, (2 - sig_h) % 2 :: 2, :, 0] if sig_h else fine[:, ::2, :, 0]
            # rows: fine rows (2m - sig_h) for m starting at sig_h.
            cols = rows[:, :, (2 - sig_w) % 2 :: 2] if sig_w else rows[:, :, ::2]
            plane = plane.at[:, sig_h : sig_h + h // 2, sig_w : sig_w + w // 2].set(cols)
            planes.append(plane)
    return jnp.stack(planes, axis=-1)


def phase_conv(
    x: Array,
    folded_w: Array,
    padding: Tuple[Tuple[int, int], Tuple[int, int]],
    compute_dtype: jnp.dtype,
) -> Array:
    """Shared conv call for the folded weights (NHWC, stride 1)."""
    return lax.conv_general_dilated(
        x.astype(compute_dtype),
        folded_w.astype(compute_dtype),
        window_strides=(1, 1),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=CONV_PRECISION,
        preferred_element_type=compute_dtype,
    )


def interleave_phases_nchw(rgb_ph: Array, h: int, w: int) -> Array:
    """
    (B, H/2+1, W/2+1, 4*C) Conv1-convention RGB phase planes (channel =
    ph*C + k; C=3 for RGB) -> (B, C, H, W) NCHW fine image. sigma=0 rows
    [0, H/2) are fine rows 2m; sigma=1 rows [1, H/2] are fine rows 2m-1.
    """
    b = rgb_ph.shape[0]
    c = rgb_ph.shape[-1] // 4
    hh, hw = h // 2, w // 2
    r = rgb_ph.reshape(b, hh + 1, hw + 1, 2, 2, c)
    # -> (B, C, sig_h, sig_w, H/2+1, W/2+1)
    r = jnp.transpose(r, (0, 5, 3, 4, 1, 2))
    even_h = r[:, :, 0][:, :, :, 0:hh]          # fine rows 2m, m in [0,hh)
    odd_h = r[:, :, 1][:, :, :, 1 : hh + 1]      # fine rows 2m-1, m in [1,hh]
    # interleave rows: fine row 2j <- even_h[j], 2j+1 <- odd_h[j] (=2(j+1)-1)
    rows = jnp.stack([even_h, odd_h], axis=4)    # (B,C,sig_w,hh,2,hw+1)
    rows = rows.reshape(b, c, 2, h, hw + 1)
    even_w = rows[:, :, 0][:, :, :, 0:hw]
    odd_w = rows[:, :, 1][:, :, :, 1 : hw + 1]
    cols = jnp.stack([even_w, odd_w], axis=4)    # (B,C,h,hw,2)
    return cols.reshape(b, c, h, w)


def _tile4(vec: Array) -> Array:
    """Per-channel vector (.., C) -> (.., 4*C) matching the ph-major layout."""
    return jnp.tile(vec, (1,) * (vec.ndim - 1) + (4,))


def _add_phase_noise(
    x_ph: Array, noise_ph: Optional[Array], strength: Array
) -> Array:
    """x_ph (B,h,w,4*C) += noise_ph (1,h,w,4) * strength, broadcast over C."""
    if noise_ph is None:
        return x_ph
    b, hh, hw, c4 = x_ph.shape
    x5 = x_ph.reshape(b, hh, hw, 4, c4 // 4)
    x5 = x5 + noise_ph[..., None].astype(x_ph.dtype) * strength.astype(x_ph.dtype)
    return x5.reshape(b, hh, hw, c4)


def _phase_pre_rgb(
    x: Array,
    block: dict,
    dlatent_rows: Tuple[Array, Array, Array],
    noise_up_fine: Optional[Array],
    noise_c1_fine: Optional[Array],
    resample_kernel: Tuple[int, ...],
    compute_dtype: jnp.dtype,
) -> Tuple[Array, Array]:
    """
    The shared body of the phase top block through Conv1's lrelu, with the
    ToRGB style multiply already applied: Conv0_up+blur (folded), Conv1.
    Returns (z_styled, wr): z_styled (B, H/2+1, W/2+1, 4*cout) ready for the
    ToRGB contraction, wr the runtime-coef'd fp32 (1, 1, cout, 3) base ToRGB
    weight (per-phase — the block-diagonal or per-phase-conv form is the
    caller's choice; both contract the same 64 nonzero products in the same
    channel order, so they are bit-identical on MXU and XLA:CPU alike).
    """
    from gance_tpu.ops.modulated_conv import (
        demod_vector,
        runtime_weight_coef,
        style_vector,
    )

    up, c1, torgb = block["Conv0_up"], block["Conv1"], block["ToRGB"]
    dl_up, dl_c1, dl_rgb = dlatent_rows
    kh, kw, cin, cout = up["weight"].shape

    # --- Conv0_up + FIR blur as one folded phase conv ---
    w_up = up["weight"].astype(jnp.float32) * runtime_weight_coef(kh * kw * cin)
    s_up = style_vector(dl_up, up["mod_weight"], up["mod_bias"])  # (B, cin)
    d_up = demod_vector(s_up, w_up)  # (B, cout)
    folded_up = fold_upconv_blur_weights(w_up, resample_root(resample_kernel))
    xs = (x * s_up[:, None, None, :].astype(x.dtype)).astype(compute_dtype)
    xp = phase_conv(xs, folded_up, ((1, 1), (1, 1)), compute_dtype)
    xp = xp * _tile4(d_up).astype(xp.dtype)[:, None, None, :]
    noise_up_ph = None if noise_up_fine is None else phase_split_fine(noise_up_fine)
    xp = _add_phase_noise(xp, noise_up_ph, up["noise_strength"])
    xp = bias_act(xp, _tile4(up["bias"]), act="lrelu")

    # Phase folding assumes the standard StyleGAN2 top-block shape chain:
    # Conv1 is 3x3 with cin == cout == Conv0_up's cout, and ToRGB consumes that
    # same channel count. True for every GeneratorConfig, but assert it so a
    # future architecture change fails loudly instead of mis-scaling the
    # equalized-LR coefficients silently (round-2 advisor finding).
    c1_kh, c1_kw, c1_cin, c1_cout = c1["weight"].shape
    if (c1_kh, c1_kw, c1_cin, c1_cout) != (3, 3, cout, cout):
        raise ValueError(
            f"phase_top_block: Conv1 weight {c1['weight'].shape} breaks the "
            f"(3, 3, {cout}, {cout}) top-block invariant"
        )
    if torgb["weight"].shape[2] != c1_cout:
        raise ValueError(
            f"phase_top_block: ToRGB cin {torgb['weight'].shape[2]} != Conv1 "
            f"cout {c1_cout}"
        )

    # --- Conv1 as a 2x2 phase conv (sigma-shift convention) ---
    v = c1["weight"].astype(jnp.float32) * runtime_weight_coef(c1_kh * c1_kw * c1_cin)
    s_c1 = style_vector(dl_c1, c1["mod_weight"], c1["mod_bias"])  # (B, cout)
    d_c1 = demod_vector(s_c1, v)
    xp = xp * _tile4(s_c1).astype(xp.dtype)[:, None, None, :]
    z = phase_conv(xp, fold_conv1_weights(v), ((1, 1), (1, 1)), compute_dtype)
    z = z * _tile4(d_c1).astype(z.dtype)[:, None, None, :]
    noise_c1_ph = (
        None if noise_c1_fine is None else phase_split_fine_shifted(noise_c1_fine)
    )
    z = _add_phase_noise(z, noise_c1_ph, c1["noise_strength"])
    z = bias_act(z, _tile4(c1["bias"]), act="lrelu")

    # --- ToRGB style multiply (the contraction itself is the caller's) ---
    wr = torgb["weight"].astype(jnp.float32) * runtime_weight_coef(
        torgb["weight"].shape[2]
    )
    s_rgb = style_vector(dl_rgb, torgb["mod_weight"], torgb["mod_bias"])  # (B, cout)
    z = z * _tile4(s_rgb).astype(z.dtype)[:, None, None, :]
    return z, wr


def _phase_rgb_planes(
    x: Array,
    block: dict,
    dlatent_rows: Tuple[Array, Array, Array],
    noise_up_fine: Optional[Array],
    noise_c1_fine: Optional[Array],
    resample_kernel: Tuple[int, ...],
    compute_dtype: jnp.dtype,
) -> Array:
    """
    `_phase_pre_rgb` plus the phase-diagonal ToRGB contraction. Returns the
    RGB phase planes (B, H/2+1, W/2+1, 12), channel = ph*3 + k,
    ph = sigma_h*2 + sigma_w.
    """
    z, wr = _phase_pre_rgb(
        x, block, dlatent_rows, noise_up_fine, noise_c1_fine,
        resample_kernel, compute_dtype,
    )
    cout = wr.shape[2]
    n_rgb = wr.shape[-1]
    wr_ph = jnp.zeros((1, 1, 4 * cout, 4 * n_rgb), jnp.float32)
    for ph in range(4):
        wr_ph = wr_ph.at[
            0, 0, ph * cout : (ph + 1) * cout, ph * n_rgb : (ph + 1) * n_rgb
        ].set(wr[0, 0])
    return phase_conv(z, wr_ph, ((0, 0), (0, 0)), compute_dtype)


def phase_top_block(
    x: Array,
    block: dict,
    dlatent_rows: Tuple[Array, Array, Array],
    noise_up_fine: Optional[Array],
    noise_c1_fine: Optional[Array],
    y_up_nchw: Optional[Array],
    resample_kernel: Tuple[int, ...],
    compute_dtype: jnp.dtype,
) -> Array:
    """
    The full top synthesis block (Conv0_up -> Conv1 -> ToRGB + skip add) in
    phase space. Numerically equivalent to the standard `_synthesis_layer` /
    `_torgb` chain (up to fp reassociation); see module docstring for why.

    :param x: previous block output, NHWC (B, H/2, W/2, cin).
    :param block: params dict with "Conv0_up", "Conv1", "ToRGB".
    :param dlatent_rows: the three per-layer dlatent rows (B, w_dim).
    :param noise_up_fine / noise_c1_fine: fine-grid noise maps (B or 1, H, W, 1)
        for the two conv layers (const buffers or freshly sampled), or None.
    :param y_up_nchw: the upsampled RGB accumulator (B, 3, H, W) NCHW, or None.
    :return: new RGB accumulator (B, 3, H, W) NCHW.
    """
    h, w = x.shape[1] * 2, x.shape[2] * 2
    t_ph = _phase_rgb_planes(
        x, block, dlatent_rows, noise_up_fine, noise_c1_fine,
        resample_kernel, compute_dtype,
    )
    t = interleave_phases_nchw(t_ph, h, w)
    t = t + block["ToRGB"]["bias"].astype(t.dtype)[None, :, None, None]
    return t if y_up_nchw is None else y_up_nchw + t


def phase_top_block_uint8(
    x: Array,
    block: dict,
    dlatent_rows: Tuple[Array, Array, Array],
    noise_up_fine: Optional[Array],
    noise_c1_fine: Optional[Array],
    y_nchw: Optional[Array],
    resample_kernel: Tuple[int, ...],
    compute_dtype: jnp.dtype,
    drange: Tuple[float, float] = (-1.0, 1.0),
) -> Array:
    """
    The phase top block with a FUSED uint8 output epilogue: the RGB skip
    upsample stays in polyphase form (no 1024px float intermediate), the skip
    add / ToRGB bias / uint8 quantization all run per-phase on dense
    12-channel tensors, and only uint8 bytes are interleaved to the final
    NHWC image — replacing the bf16 interleave -> NCHW skip add -> NHWC
    transpose -> quantize chain, whose relayout copies the r3/r4 roofline
    accounting measured at ~10x their HBM floor (tools/roofline.py).

    Value-identical to `images_to_uint8(transpose(phase_top_block(...)))` at
    the HLO level: per-pixel adds happen in the same order on the same
    operands (the polyphase skip upsample is tap-for-tap the accumulation the
    interleaving form runs — `upsample2x_phases_nchw`), and the uint8 output
    matches bit-for-bit on XLA:CPU (pinned by tests). On TPU the two program
    FORMS are not bit-equal: XLA:TPU keeps bf16 math in fp32 INSIDE a fusion
    and rounds at fusion boundaries, so restructuring the epilogue moves the
    rounding points — measured at 1024px bf16: mean |diff| 0.078 uint8 steps,
    7.7% of pixels nonzero, max 5 steps vs the fine program (r4 probe), well
    inside the bf16-vs-fp32 envelope itself (r3 cert: mean ~1.0 step).

    :param y_nchw: the PRE-upsample RGB accumulator (B, 3, H/2, W/2) NCHW
        (note: `phase_top_block` takes the upsampled one), or None.
    :return: uint8 NHWC image (B, H, W, 3).
    """
    from gance_tpu.ops.upfirdn2d import upsample2x_phases_nchw

    b = x.shape[0]
    hh, hw = x.shape[1], x.shape[2]
    # GANCE_TPU_UINT8_RGB selects the ToRGB contraction form (trace-time read,
    # like GANCE_TPU_BLUR — set before the first jitted call):
    #   'blockdiag' (default): one (1,1,4*cout,12) block-diagonal conv over
    #     the full grid.
    #   'split': four per-phase 1x1 convs with the sigma spatial slice folded
    #     into the conv INPUT, so each phase's bias/skip/quantize fuses into
    #     its own conv epilogue and the (B, H/2+1, W/2+1, 12) intermediate
    #     never exists — built to dodge that tensor's 2.34 ms XLA relayout
    #     copy (tools/roofline.py), but MEASURED SLOWER on the v5e at 1024px
    #     bf16 (204.2 vs 209.5 f/s at batch 24; 48.9 vs 46.1 ms at batch 8):
    #     four 3-channel-out convs pay more in MXU setup than the copy costs.
    #     Kept as the measured A/B arm. Both forms contract the same 64
    #     nonzero products in the same channel order (CPU-bit-identical,
    #     pinned by tests; TPU differs within fusion-boundary rounding).
    split_rgb = os.environ.get("GANCE_TPU_UINT8_RGB", "blockdiag") == "split"

    bias = block["ToRGB"]["bias"]

    y_phases: Optional[Tuple[Array, ...]] = None
    if y_nchw is not None:
        k = setup_filter_kernel(resample_kernel, 4.0)
        y_phases = upsample2x_phases_nchw(y_nchw, _separable_root(k))

    lo, hi = drange
    scale = 255.0 / (hi - lo)
    offset = 0.5 - lo * scale

    if split_rgb:
        z, wr = _phase_pre_rgb(
            x, block, dlatent_rows, noise_up_fine, noise_c1_fine,
            resample_kernel, compute_dtype,
        )
        cout = wr.shape[2]
    else:
        t_ph = _phase_rgb_planes(
            x, block, dlatent_rows, noise_up_fine, noise_c1_fine,
            resample_kernel, compute_dtype,
        )

    quantized = []
    for ph in range(4):
        sig_h, sig_w = ph // 2, ph % 2
        if split_rgb:
            zs = z[:, sig_h : hh + sig_h, sig_w : hw + sig_w,
                   ph * cout : (ph + 1) * cout]
            t = phase_conv(zs, wr, ((0, 0), (0, 0)), compute_dtype)
        else:
            t = t_ph[:, sig_h : hh + sig_h, sig_w : hw + sig_w,
                     ph * 3 : (ph + 1) * 3]
        t = t + bias.astype(t.dtype)
        if y_phases is not None:
            # same operand order as the fine-grid `y + t`
            t = jnp.transpose(y_phases[ph], (0, 2, 3, 1)).astype(t.dtype) + t
        # images_to_uint8 semantics, applied per phase (per-pixel op, so it
        # commutes with the interleave)
        v = t.astype(jnp.float32) * scale + offset
        quantized.append(jnp.clip(jnp.floor(v), 0.0, 255.0).astype(jnp.uint8))

    # interleave uint8 phases -> (B, H, W, 3): columns first, then rows
    rows = []
    for sig_h in range(2):
        cols = jnp.stack([quantized[sig_h * 2], quantized[sig_h * 2 + 1]], axis=3)
        rows.append(cols.reshape(b, hh, 2 * hw, 3))
    out = jnp.stack(rows, axis=2)
    return out.reshape(b, 2 * hh, 2 * hw, 3)


def interleave_phases_nhwc(x_ph: Array, h: int, w: int) -> Array:
    """(B, H/2, W/2, 4*C) upconv-convention phase planes -> (B, H, W, C)."""
    b, hh, hw, c4 = x_ph.shape
    c = c4 // 4
    x = x_ph.reshape(b, hh, hw, 2, 2, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))  # (B,hh,dh,hw,dw,C)
    return x.reshape(b, h, w, c)
