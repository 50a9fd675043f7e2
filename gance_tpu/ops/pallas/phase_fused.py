"""
Fused phase-space Conv1 + epilogue + ToRGB Pallas kernel.

Context (ops/phase_block.py): on TPU the 1024px block runs in phase space;
its Conv1 is a (2,2,256,256) stride-1 conv over (B, 512, 512, 256) followed
by demod/noise/bias/lrelu and a phase-diagonal 1x1 ToRGB (256 -> 12). As XLA
programs those are two passes: the conv fusion writes the 3.2GB activated
tensor to HBM and the ToRGB matmul reads it back (profiled 17.7 + 6.4 ms per
batch-of-24). This kernel keeps the activation in VMEM: per grid step it
DMAs a 10-row input window, runs the four tap matmuls (the 2x2 kernel as
sublane-shifted (513,256) @ (256,256) MXU contractions), applies the
epilogue on the f32 accumulator, and emits only the (513,16) RGB phases.

What makes this kernel simple where round-1's blur kernels were not:
  * the contraction dim (256 channels) rides the lanes and every DMA slice
    offset rides the UNTILED leading dims (batch, row) — no tile-alignment
    traps and no input padding copies (the caller's x is used as-is);
  * the only unaligned accesses are static VMEM sublane slices (column
    taps at window offsets 7/8), which current Mosaic supports;
  * 513 = 9 * 57, so the 9-row output tiling divides the noise and output
    arrays exactly;
  * noise*strength + bias is pre-expanded by the caller into one
    (1, 513, 513, 256) tensor (batch-invariant), so the in-kernel epilogue
    is mul(demod) + add + lrelu — and sqrt(2)*s_rgb folds into the per-batch
    ToRGB matrix.

Status: PARKED — this kernel is hardware-correct but NOT wired into any
production path and has no enablement flag. Measured 36.1 ms vs XLA's 26.0 ms
for the same fused region on v5e (ROUND_NOTES round 2: Mosaic does not overlap
the VPU epilogue / halo DMA under the tap matmuls, and each shape costs a
15-25 min uncached remote Mosaic compile on this tunnel). Kept as a measured
engineering artifact; revisit if Mosaic scheduling improves.
Numerics: parity with the XLA path is pinned by tests/test_phase_fused.py.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_M = 9          # output rows per grid step; 513 = 9 * 57
_N_OUT = 513
_N_PAD = 528        # window cols: [0,8) zeros | [8,520) data | [520,528) zeros


def _kernel(
    x_hbm,        # (B, 512, 512, C) in HBM — manual halo DMA
    w_ref,        # (2, 2, C, C) folded conv taps, VMEM
    wrgb_ref,     # (1, C, 16) per-b ToRGB (s_rgb * sqrt2 folded), VMEM
    demod_ref,    # (1, 1, C) per-b demod (tiled x4), VMEM
    nb_ref,       # (1, TILE_M, 513, C): noise*strength + bias, pre-expanded
    out_ref,      # (1, TILE_M, 513, 16)
    win,          # VMEM scratch (TILE_M + 1, _N_PAD, C)
    sem,          # DMA semaphore
    *,
    c: int,
):
    b = pl.program_id(0)
    i = pl.program_id(1)
    n_i = pl.num_programs(1)

    # scratch persists across grid steps: zero the pad column strips once
    # (the DMAs only ever write cols [8, 520), so they stay zero after).
    @pl.when(jnp.logical_and(b == 0, i == 0))
    def _():
        win[:, 0:8, :] = jnp.zeros_like(win[:, 0:8, :])
        win[:, 520:528, :] = jnp.zeros_like(win[:, 520:528, :])

    # --- halo window DMA: win row k holds input row (TILE_M*i - 1 + k); the
    # row offsets ride the untiled leading dim (free); the column data lands
    # at sublane offset 8 (tile-aligned dest). Edge rows are zeroed.
    @pl.when(i == 0)
    def _():
        win[0:1] = jnp.zeros_like(win[0:1])
        cp = pltpu.make_async_copy(
            x_hbm.at[b, 0:TILE_M, :, :], win.at[1 : TILE_M + 1, 8:520, :], sem
        )
        cp.start()
        cp.wait()

    @pl.when(jnp.logical_and(i > 0, i < n_i - 1))
    def _():
        cp = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(TILE_M * i - 1, TILE_M + 1), :, :],
            win.at[0 : TILE_M + 1, 8:520, :],
            sem,
        )
        cp.start()
        cp.wait()

    @pl.when(i == n_i - 1)
    def _():
        # last tile: output rows 504..512; input row 512 does not exist
        win[TILE_M : TILE_M + 1] = jnp.zeros_like(win[0:1])
        cp = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(TILE_M * i - 1, TILE_M), :, :],
            win.at[0:TILE_M, 8:520, :],
            sem,
        )
        cp.start()
        cp.wait()

    w = w_ref[...]
    wrgb = wrgb_ref[0]
    demod = demod_ref[0, 0].astype(jnp.float32)[None, :]
    f32 = jnp.float32

    for r in range(TILE_M):
        # output row m' = TILE_M*i + r reads input rows m'-1 (win r) and
        # m' (win r+1); column taps n'-1 / n' are window offsets 7 / 8.
        acc = jnp.dot(win[r, 7 : 7 + _N_OUT], w[0, 0], preferred_element_type=f32)
        acc += jnp.dot(win[r, 8 : 8 + _N_OUT], w[0, 1], preferred_element_type=f32)
        acc += jnp.dot(win[r + 1, 7 : 7 + _N_OUT], w[1, 0], preferred_element_type=f32)
        acc += jnp.dot(win[r + 1, 8 : 8 + _N_OUT], w[1, 1], preferred_element_type=f32)
        z = acc * demod + nb_ref[0, r].astype(f32)
        z = jnp.maximum(z, z * 0.2).astype(wrgb.dtype)
        out_ref[0, r] = jnp.dot(z, wrgb, preferred_element_type=f32).astype(
            out_ref.dtype
        )


@functools.partial(jax.jit, static_argnames=("interpret",))
def phase_conv1_torgb_fused(
    x: jax.Array,           # (B, 512, 512, C): P output, activated, s_c1-scaled
    folded_w: jax.Array,    # (2, 2, C, C)
    wrgb_b: jax.Array,      # (B, C, 16): s_rgb * lrelu-gain folded, cols 12+ zero
    demod_b: jax.Array,     # (B, C) conv1 demod, tiled x4
    noise_bias: jax.Array,  # (1, 513, 513, C): noise*strength + bias, expanded
    interpret: bool = False,
) -> jax.Array:
    """
    rgb_ph[b, m', n', :] = lrelu(conv2d(x, folded_w, pad (1,1)) * demod
                                 + noise_bias) @ wrgb_b[b]
    Returns (B, 513, 513, 16) — the Conv1 + epilogue + ToRGB chain of
    phase_block.phase_top_block in one HBM pass.
    """
    b, m, n, c = x.shape
    if (m, n) != (_N_OUT - 1, _N_OUT - 1):
        raise ValueError(f"kernel is specialized to 512^2 inputs, got {x.shape}")
    grid = (b, _N_OUT // TILE_M)
    return pl.pallas_call(
        functools.partial(_kernel, c=c),
        out_shape=jax.ShapeDtypeStruct((b, _N_OUT, _N_OUT, 16), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.HBM),
            pl.BlockSpec((2, 2, c, c), lambda bi, i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, 16), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_M, _N_OUT, c), lambda bi, i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, TILE_M, _N_OUT, 16), lambda bi, i: (bi, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((TILE_M + 1, _N_PAD, c), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(
        x,
        folded_w.astype(x.dtype),
        wrgb_b.astype(x.dtype),
        demod_b.astype(jnp.float32)[:, None, :],
        noise_bias.astype(x.dtype),
    )
