"""
StyleGAN2 (config-f family) in functional JAX — mapping, synthesis, discriminator.

Replaces the reference submodule's pickled TF1 graphs (SURVEY.md §2.9:
training/networks_stylegan2.py — `G_mapping`, `G_synthesis_stylegan2`, `D_stylegan2`)
with a params pytree + jitted apply functions. Weight semantics (equalized-LR "unit"
parameterization, modulation/demodulation, binomial resampling FIR, noise injection,
skip-connection ToRGB chain, resnet D) are kept identical so weights converted from
the same `.pkl` files reproduce outputs; the execution model is TPU-native:

  * activations NHWC, weights HWIO (MXU-friendly; TF checkpoints are HWIO already),
  * the whole synthesis stack traces into ONE XLA program — no per-layer Python,
  * batch is the leading axis everywhere and is the natural `Mesh` sharding axis,
  * optional bfloat16 compute with fp32 accumulation (`compute_dtype`),
  * per-layer constant noise buffers live in the params pytree (randomize_noise=False
    semantics, the reference's load-bearing inference config at
    network_functions.py:125).

Naming mirrors the TF variable tree (e.g. params["synthesis"]["64x64"]["Conv0_up"]
["weight"]) so the .pkl loader is a mechanical re-keying, documented in
models/pickle_loader.py.
"""

import math
import os
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gance_tpu.ops.bias_act import bias_act
from gance_tpu.ops.modulated_conv import conv2d_layer, dense_layer, modulated_conv2d
from gance_tpu.ops.upfirdn2d import upsample_2d_nchw

Params = Dict[str, Any]

# The reference's inference-time truncation (network_functions.py:124): psi > 1
# EXPANDS deviation from the average dlatent for extra variety.
DEFAULT_TRUNCATION_PSI = 1.2


@dataclass(frozen=True)
class GeneratorConfig:
    """Static architecture hyperparameters (config-f defaults at 1024px)."""

    resolution: int = 1024
    latent_size: int = 512
    dlatent_size: int = 512
    num_channels: int = 3
    fmap_base: int = 32768  # config-f doubles config-e's 16384 at high res
    fmap_decay: float = 1.0
    fmap_min: int = 1
    fmap_max: int = 512
    mapping_layers: int = 8
    mapping_fmaps: int = 512
    mapping_lrmul: float = 0.01
    resample_kernel: Tuple[int, ...] = (1, 3, 3, 1)
    # mbstd settings only matter for the discriminator / training.
    mbstd_group_size: int = 4
    mbstd_num_features: int = 1

    @property
    def resolution_log2(self) -> int:
        return int(math.log2(self.resolution))

    @property
    def num_style_rows(self) -> int:
        """18 at 1024px — the reference's blend-depth upper bound."""
        return self.resolution_log2 * 2 - 2

    def nf(self, stage: int) -> int:
        """Feature-map count at a stage (NVlabs nf())."""
        return int(
            np.clip(
                int(self.fmap_base / (2.0 ** (stage * self.fmap_decay))),
                self.fmap_min,
                self.fmap_max,
            )
        )

    def block_resolutions(self) -> Tuple[int, ...]:
        """Synthesis block output resolutions above 4: (8, 16, ..., resolution)."""
        return tuple(2**res for res in range(3, self.resolution_log2 + 1))


# --------------------------------------------------------------------------------
# Initialization (matches the TF "unit" parameterization: weights ~ N(0, 1/lrmul),
# runtime equalized-LR scaling applied in the ops).
# --------------------------------------------------------------------------------


def _conv_layer_params(
    key: jax.Array,
    kernel: int,
    cin: int,
    cout: int,
    dlatent_size: int,
    with_noise: bool,
) -> Params:
    keys = jax.random.split(key, 3)
    params: Params = {
        "weight": jax.random.normal(keys[0], (kernel, kernel, cin, cout), jnp.float32),
        "mod_weight": jax.random.normal(keys[1], (dlatent_size, cin), jnp.float32),
        "mod_bias": jnp.zeros((cin,), jnp.float32),
        "bias": jnp.zeros((cout,), jnp.float32),
    }
    if with_noise:
        params["noise_strength"] = jnp.zeros((), jnp.float32)
    return params


def init_generator_params(key: jax.Array, config: GeneratorConfig) -> Params:
    """Random init of the full generator pytree (mapping + synthesis + noise)."""
    k_map, k_syn = jax.random.split(key)

    # --- mapping ---
    mapping: Params = {}
    fan_in = config.latent_size
    init_std = 1.0 / config.mapping_lrmul
    for i in range(config.mapping_layers):
        k_map, sub = jax.random.split(k_map)
        fmaps = (
            config.dlatent_size
            if i == config.mapping_layers - 1
            else config.mapping_fmaps
        )
        mapping[f"Dense{i}"] = {
            "weight": jax.random.normal(sub, (fan_in, fmaps), jnp.float32) * init_std,
            "bias": jnp.zeros((fmaps,), jnp.float32),
        }
        fan_in = fmaps

    # --- synthesis ---
    synthesis: Params = {}
    k_syn, sub = jax.random.split(k_syn)
    synthesis["4x4"] = {
        "Const": {"const": jax.random.normal(sub, (1, 4, 4, config.nf(1)), jnp.float32)},
    }
    k_syn, sub = jax.random.split(k_syn)
    synthesis["4x4"]["Conv"] = _conv_layer_params(
        sub, 3, config.nf(1), config.nf(1), config.dlatent_size, with_noise=True
    )
    k_syn, sub = jax.random.split(k_syn)
    synthesis["4x4"]["ToRGB"] = _conv_layer_params(
        sub, 1, config.nf(1), config.num_channels, config.dlatent_size, with_noise=False
    )

    for res in range(3, config.resolution_log2 + 1):
        name = f"{2**res}x{2**res}"
        cin, cout = config.nf(res - 2), config.nf(res - 1)
        k_syn, s0 = jax.random.split(k_syn)
        k_syn, s1 = jax.random.split(k_syn)
        k_syn, s2 = jax.random.split(k_syn)
        synthesis[name] = {
            "Conv0_up": _conv_layer_params(s0, 3, cin, cout, config.dlatent_size, True),
            "Conv1": _conv_layer_params(s1, 3, cout, cout, config.dlatent_size, True),
            "ToRGB": _conv_layer_params(
                s2, 1, cout, config.num_channels, config.dlatent_size, False
            ),
        }

    # --- per-layer constant noise buffers (NHWC: (1, H, W, 1)) ---
    noise: Params = {}
    for layer_idx in range(config.num_style_rows - 1):
        res = (layer_idx + 5) // 2  # noise0 -> 4x4, noise1/2 -> 8x8, ...
        size = 2**res
        k_syn, sub = jax.random.split(k_syn)
        noise[f"noise{layer_idx}"] = jax.random.normal(sub, (1, size, size, 1), jnp.float32)
    synthesis["noise"] = noise

    return {
        "mapping": mapping,
        "synthesis": synthesis,
        "dlatent_avg": jnp.zeros((config.dlatent_size,), jnp.float32),
    }


def init_discriminator_params(key: jax.Array, config: GeneratorConfig) -> Params:
    """Random init of the resnet discriminator pytree (config-f D_stylegan2)."""
    params: Params = {}
    top = config.resolution_log2

    def conv_p(k, kernel, cin, cout, with_bias=True):
        p = {"weight": jax.random.normal(k, (kernel, kernel, cin, cout), jnp.float32)}
        if with_bias:
            p["bias"] = jnp.zeros((cout,), jnp.float32)
        return p

    key, sub = jax.random.split(key)
    params[f"{2**top}x{2**top}"] = {
        "FromRGB": conv_p(sub, 1, config.num_channels, config.nf(top - 1))
    }
    for res in range(top, 2, -1):
        name = f"{2**res}x{2**res}"
        block = params.setdefault(name, {})
        key, s0 = jax.random.split(key)
        key, s1 = jax.random.split(key)
        key, s2 = jax.random.split(key)
        block["Conv0"] = conv_p(s0, 3, config.nf(res - 1), config.nf(res - 1))
        block["Conv1_down"] = conv_p(s1, 3, config.nf(res - 1), config.nf(res - 2))
        block["Skip"] = conv_p(s2, 1, config.nf(res - 1), config.nf(res - 2), with_bias=False)

    key, s0 = jax.random.split(key)
    key, s1 = jax.random.split(key)
    key, s2 = jax.random.split(key)
    cin_4x4 = config.nf(1) + config.mbstd_num_features
    params["4x4"] = {
        "Conv": conv_p(s0, 3, cin_4x4, config.nf(1)),
        "Dense0": {
            "weight": jax.random.normal(s1, (config.nf(1) * 16, config.nf(0)), jnp.float32),
            "bias": jnp.zeros((config.nf(0),), jnp.float32),
        },
    }
    # The final dense lives in its own top-level scope in the TF variable tree
    # ("Output/weight"), NOT under 4x4 — keep the real pickle layout.
    params["Output"] = {
        "weight": jax.random.normal(s2, (config.nf(0), 1), jnp.float32),
        "bias": jnp.zeros((1,), jnp.float32),
    }
    return params


def config_from_params(params: Params) -> GeneratorConfig:
    """Infer the architecture config from a loaded generator pytree."""
    synthesis = params["synthesis"]
    resolutions = [
        int(k.split("x")[0]) for k in synthesis.keys() if "x" in k and k[0].isdigit()
    ]
    resolution = max(resolutions)
    latent_size = params["mapping"]["Dense0"]["weight"].shape[0]
    dlatent_size = synthesis["4x4"]["Conv"]["mod_weight"].shape[0]
    mapping_layers = len([k for k in params["mapping"] if k.startswith("Dense")])
    # fmap_base from the highest-resolution block's output channels:
    top_log2 = int(math.log2(resolution))
    top_channels = synthesis[f"{resolution}x{resolution}"]["Conv1"]["weight"].shape[-1]
    fmap_base = top_channels * (2 ** (top_log2 - 1))
    # fmap_max equals the 4x4 channel count for all practical configs (512 @ config-f).
    fmap_max = synthesis["4x4"]["Conv"]["weight"].shape[-1]
    mapping_fmaps = params["mapping"]["Dense0"]["weight"].shape[1]
    return GeneratorConfig(
        resolution=resolution,
        latent_size=int(latent_size),
        dlatent_size=int(dlatent_size),
        mapping_layers=int(mapping_layers),
        mapping_fmaps=int(mapping_fmaps),
        fmap_base=int(fmap_base),
        fmap_max=int(fmap_max),
    )


# --------------------------------------------------------------------------------
# Forward passes
# --------------------------------------------------------------------------------


def mapping_apply(
    params: Params,
    z: jax.Array,
    config: GeneratorConfig,
    lrmul: Optional[float] = None,
) -> jax.Array:
    """
    G_mapping: pixel-norm the latent, 8 equalized-LR dense+lrelu layers (lrmul 0.01).
    :param z: (B, latent_size).
    :return: w (B, dlatent_size).
    """
    lrmul = config.mapping_lrmul if lrmul is None else lrmul
    x = z.astype(jnp.float32)
    # normalize_latents (pixel norm over the latent dim)
    x = x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=-1, keepdims=True) + 1e-8)
    mapping = params["mapping"]
    for i in sorted(
        (k for k in mapping if k.startswith("Dense")), key=lambda s: int(s[5:])
    ):
        layer = mapping[i]
        x = dense_layer(x, layer["weight"], lrmul=lrmul)
        x = bias_act(x, layer["bias"] * lrmul, act="lrelu")
    return x


def broadcast_dlatents(w: jax.Array, config: GeneratorConfig) -> jax.Array:
    """Tile (B, 512) -> w+ (B, num_style_rows, 512)."""
    return jnp.tile(w[:, None, :], (1, config.num_style_rows, 1))


def truncate_dlatents(
    dlatents: jax.Array,
    dlatent_avg: jax.Array,
    psi: float = DEFAULT_TRUNCATION_PSI,
    cutoff: Optional[int] = None,
) -> jax.Array:
    """
    Truncation trick: w' = w_avg + (w - w_avg) * psi, optionally only for style rows
    below `cutoff`. The reference runs psi=1.2 (network_functions.py:124).
    """
    avg = dlatent_avg.astype(dlatents.dtype)
    if cutoff is None:
        return avg + (dlatents - avg) * psi
    rows = np.arange(dlatents.shape[1])
    layer_psi = jnp.where(jnp.asarray(rows < cutoff), psi, 1.0)[None, :, None]
    return avg + (dlatents - avg) * layer_psi.astype(dlatents.dtype)


def _synthesis_layer(
    x: jax.Array,
    layer_params: Params,
    dlatent_row: jax.Array,
    noise_const: Optional[jax.Array],
    rng: Optional[jax.Array],
    up: bool,
    config: GeneratorConfig,
    compute_dtype: jnp.dtype,
) -> jax.Array:
    """conv (maybe up) -> noise inject -> bias+lrelu. NVlabs `layer()`."""
    x = modulated_conv2d(
        x,
        dlatent_row,
        layer_params["weight"],
        layer_params["mod_weight"],
        layer_params["mod_bias"],
        up=up,
        demodulate=True,
        resample_kernel=config.resample_kernel,
        compute_dtype=compute_dtype,
    )
    if rng is not None:
        noise = jax.random.normal(rng, (x.shape[0], x.shape[1], x.shape[2], 1), x.dtype)
        x = x + noise * layer_params["noise_strength"].astype(x.dtype)
    elif noise_const is not None:
        x = x + noise_const.astype(x.dtype) * layer_params["noise_strength"].astype(x.dtype)
    return bias_act(x, layer_params["bias"], act="lrelu")


def _torgb(
    x: jax.Array,
    layer_params: Params,
    dlatent_row: jax.Array,
    y: Optional[jax.Array],
    config: GeneratorConfig,
    compute_dtype: jnp.dtype,
) -> jax.Array:
    """
    1x1 modulated conv (no demod) + bias; skip-add the upsampled RGB trunk.
    The RGB accumulator lives in NCHW end-to-end: 3 channels on the 128-lane axis
    would waste 42x on every skip add/blur (profiled as a relayout-copy chain);
    the ToRGB conv emits NCHW for free and the whole chain stays dense.
    """
    t = modulated_conv2d(
        x,
        dlatent_row,
        layer_params["weight"],
        layer_params["mod_weight"],
        layer_params["mod_bias"],
        demodulate=False,
        resample_kernel=config.resample_kernel,
        compute_dtype=compute_dtype,
        out_nchw=True,
    )
    t = t + layer_params["bias"].astype(t.dtype)[None, :, None, None]
    return t if y is None else y + t


def phase_mode_from_env() -> str:
    """
    Validated GANCE_TPU_PHASE1024 value: 'auto' (default), 'on', or 'off'.
    Unknown values raise instead of silently falling through to auto.
    """
    mode = os.environ.get("GANCE_TPU_PHASE1024", "auto").strip().lower()
    if mode not in ("auto", "on", "off"):
        raise ValueError(
            f"GANCE_TPU_PHASE1024={mode!r}: expected 'auto', 'on', or 'off'"
        )
    return mode


def resolve_phase_top_block(config: "GeneratorConfig", compute_dtype: Any) -> bool:
    """
    Resolve the polyphase-top-block decision EAGERLY (env + backend + dtype +
    architecture) to a plain bool, suitable as a static jit argument. Callers
    that jit synthesis should resolve with this per call and pass the bool to
    `synthesis_apply(phase_top_block_mode=...)` so env flips key the jit cache
    (a trace-time env read inside the jitted function cannot).

    One gate serves forward AND differentiated call sites (projection,
    training): the r2 "pathological fp32 phase forward+backward compile" was
    specific to fp32-HIGHEST, which auto mode already excludes — at
    GANCE_TPU_PRECISION=high the fp32 phase backward compiles cleanly and
    wins (r3 measured: 400.9 -> 340.2 ms per 1024px projection step at
    batch 4).
    """
    return _phase_top_block_enabled(
        config.nf(config.resolution_log2 - 1), compute_dtype
    ) and _phase_kernel_supported(config)


def _phase_kernel_supported(config: "GeneratorConfig") -> bool:
    from gance_tpu.ops.phase_block import phase_path_supported

    return phase_path_supported(config.resample_kernel)


def _phase_top_block_enabled(top_cout: int, compute_dtype: jnp.dtype) -> bool:
    """
    Whether the top block runs in polyphase form (ops/phase_block.py): the
    FIR blur folds into the up-conv's MXU matmul and the block's channel
    count stacks x4 to fill the 128 TPU lanes. Numerically equivalent up to
    fp reassociation; profiled 163.7 -> 195.1 f/s at 1024px bf16 batch 24.
    GANCE_TPU_PHASE1024: 'auto' (default; on iff running on TPU with either a
    sub-fp32 compute dtype OR a non-HIGHEST conv precision), 'on', 'off'.
    The auto gate excludes only fp32-HIGHEST, where folding the blur into the
    convs runs the extra FLOPs at the slow exact-matmul rate (measured 1.26x
    slower end-to-end, and the fp32 forward+backward compile is pathological)
    — the VPU blur is free by comparison there. Under
    GANCE_TPU_PRECISION=high (bf16x3) the folded FLOPs are cheap again:
    measured 65.9 vs 59.3 f/s at fp32 batch 8, same max-1-uint8-step /
    66.4 dB parity vs fp32-HIGHEST; the fp32-HIGH phase BACKWARD also
    compiles cleanly and wins (r3: 400.9 -> 340.2 ms per 1024px projection
    step at batch 4), so one gate serves forward and differentiated paths.
    """
    if top_cout >= 128:
        return False  # full lanes already; phase form would only add FLOPs
    mode = phase_mode_from_env()
    if mode == "on":
        return True
    if mode == "off":
        return False
    if jax.default_backend() != "tpu":
        return False
    if jnp.dtype(compute_dtype).itemsize < 4:
        return True
    from gance_tpu.ops import precision as precision_mod

    return precision_mod.CONV_PRECISION != jax.lax.Precision.HIGHEST


def synthesis_apply(
    params: Params,
    dlatents: jax.Array,
    config: GeneratorConfig,
    noise_mode: str = "const",
    rng: Optional[jax.Array] = None,
    compute_dtype: jnp.dtype = jnp.float32,
    phase_top_block_mode: Optional[bool] = None,
    remat: bool = False,
    uint8_output: bool = False,
) -> jax.Array:
    """
    G_synthesis (skip architecture): w+ (B, num_style_rows, 512) -> image
    (B, resolution, resolution, 3) float in approx [-1, 1], or uint8 when
    `uint8_output`.

    :param noise_mode: 'const' (buffers from params — the reference's
        randomize_noise=False), 'random' (needs `rng`), or 'none'.
    :param phase_top_block_mode: force the polyphase top block on/off; None
        (default) resolves GANCE_TPU_PHASE1024 at trace time (note: the env
        read does not key the jit cache — pass an explicit bool for
        programmatic control within one process).
    :param remat: rematerialize each synthesis block under autodiff
        (jax.checkpoint): the backward pass recomputes a block's activations
        instead of storing them — the standard TPU trade of FLOPs for HBM
        that makes high-resolution training fit (training OOMed at 256px
        batch 8 on 16GB without it). No effect on forward-only use.
    :param uint8_output: emit the serving uint8 NHWC image directly. On the
        polyphase top-block path (forward-only) this fuses the skip add /
        bias / quantize into phase space and interleaves only uint8 bytes
        (ops/phase_block.py `phase_top_block_uint8` — bit-identical to
        `images_to_uint8` of the float output on CPU, pinned by tests; on
        TPU within fusion-boundary bf16 rounding, measured mean 0.078 /
        max 5 uint8 steps — see the phase_top_block_uint8 docstring); every
        other path falls back to `images_to_uint8(float output)` inside the
        same program.
    """
    if noise_mode not in ("const", "random", "none"):
        raise ValueError(f"bad noise_mode {noise_mode!r}")
    if noise_mode == "random" and rng is None:
        raise ValueError("noise_mode='random' requires rng")

    synthesis = params["synthesis"]
    noise_buffers = synthesis.get("noise", {})
    batch = dlatents.shape[0]

    def layer_noise(layer_idx: int) -> Tuple[Optional[jax.Array], Optional[jax.Array]]:
        if noise_mode == "random":
            return None, jax.random.fold_in(rng, layer_idx)
        if noise_mode == "const":
            return noise_buffers.get(f"noise{layer_idx}"), None
        return None, None

    x = jnp.tile(
        synthesis["4x4"]["Const"]["const"].astype(compute_dtype), (batch, 1, 1, 1)
    )
    nc, nr = layer_noise(0)
    x = _synthesis_layer(
        x, synthesis["4x4"]["Conv"], dlatents[:, 0], nc, nr, False, config, compute_dtype
    )
    y = _torgb(x, synthesis["4x4"]["ToRGB"], dlatents[:, 1], None, config, compute_dtype)

    top = config.resolution_log2
    if phase_top_block_mode is None:
        use_phase = _phase_top_block_enabled(config.nf(top - 1), compute_dtype)
    else:
        use_phase = phase_top_block_mode and config.nf(top - 1) < 128
    if use_phase:
        from gance_tpu.ops.phase_block import phase_path_supported

        # Non-(1,3,3,1)-style FIRs stay on the generic upfirdn2d path.
        use_phase = phase_path_supported(config.resample_kernel)

    for res in range(3, top + 1):
        block = synthesis[f"{2**res}x{2**res}"]
        dl_rows = (
            dlatents[:, res * 2 - 5],
            dlatents[:, res * 2 - 4],
            dlatents[:, res * 2 - 3],
        )
        if res == top and use_phase:
            from gance_tpu.ops.phase_block import phase_top_block, phase_top_block_uint8

            size = 2**res

            def fine_noise(layer_idx: int) -> Optional[jax.Array]:
                ncn, nrn = layer_noise(layer_idx)
                if nrn is not None:
                    # same key/shape/dtype as the standard path -> same values
                    return jax.random.normal(nrn, (batch, size, size, 1), compute_dtype)
                return ncn

            if uint8_output and not remat:
                # fused serving epilogue: skip add + bias + quantize per
                # phase, interleave uint8 only (forward-only: remat implies
                # autodiff, which keeps the float path)
                return phase_top_block_uint8(
                    x, block, dl_rows,
                    fine_noise(res * 2 - 5), fine_noise(res * 2 - 4), y,
                    config.resample_kernel, compute_dtype,
                )

            def phase_fn(x, blk, dls, n0, n1, y):
                return phase_top_block(
                    x, blk, dls, n0, n1, y, config.resample_kernel, compute_dtype
                )

            if remat:
                phase_fn = jax.checkpoint(phase_fn)
            y = upsample_2d_nchw(y, kernel=config.resample_kernel)
            y = phase_fn(
                x, block, dl_rows,
                fine_noise(res * 2 - 5), fine_noise(res * 2 - 4), y,
            )
            break

        def block_fn(x, y, blk, dls, noises):
            (nc0, nr0), (nc1, nr1) = noises
            x = _synthesis_layer(
                x, blk["Conv0_up"], dls[0], nc0, nr0, True, config, compute_dtype
            )
            x = _synthesis_layer(
                x, blk["Conv1"], dls[1], nc1, nr1, False, config, compute_dtype
            )
            y = upsample_2d_nchw(y, kernel=config.resample_kernel)
            y = _torgb(x, blk["ToRGB"], dls[2], y, config, compute_dtype)
            return x, y

        if remat:
            # One checkpoint per block: the backward pass recomputes this
            # block's activations instead of storing all of them (HBM <->
            # FLOPs trade that makes high-res training fit on one chip).
            block_fn = jax.checkpoint(block_fn)
        noises = (layer_noise(res * 2 - 5), layer_noise(res * 2 - 4))
        x, y = block_fn(x, y, block, dl_rows, noises)

    # one NCHW -> NHWC relayout of the final image only
    image = jnp.transpose(y, (0, 2, 3, 1)).astype(jnp.float32)
    return images_to_uint8(image) if uint8_output else image


def generator_apply(
    params: Params,
    z: jax.Array,
    config: GeneratorConfig,
    truncation_psi: Optional[float] = DEFAULT_TRUNCATION_PSI,
    noise_mode: str = "const",
    rng: Optional[jax.Array] = None,
    compute_dtype: jnp.dtype = jnp.float32,
    phase_top_block_mode: Optional[bool] = None,
    uint8_output: bool = False,
) -> jax.Array:
    """Full G: z -> mapping -> broadcast -> truncation -> synthesis."""
    w = mapping_apply(params, z, config)
    dlatents = broadcast_dlatents(w, config)
    if truncation_psi is not None and truncation_psi != 1.0:
        dlatents = truncate_dlatents(dlatents, params["dlatent_avg"], truncation_psi)
    return synthesis_apply(
        params, dlatents, config, noise_mode=noise_mode, rng=rng,
        compute_dtype=compute_dtype, phase_top_block_mode=phase_top_block_mode,
        uint8_output=uint8_output,
    )


def resize_images(images: jax.Array, side_length: int) -> jax.Array:
    """
    Bicubic resize of float NHWC images on device — the TPU-side replacement for
    the host cv2.INTER_CUBIC pass (media/video.py resize_source): scaling happens
    inside the jitted synthesis program, so host egress moves output-sized frames
    instead of native-resolution ones.
    """
    b, _, _, c = images.shape
    return jax.image.resize(
        images, (b, side_length, side_length, c), method="cubic"
    )


def images_to_uint8(images: jax.Array, drange: Tuple[float, float] = (-1.0, 1.0)) -> jax.Array:
    """
    Float NHWC -> uint8 NHWC output transform — the
    `tflib.convert_images_to_uint8(nchw_to_nhwc=True)` epilogue the reference applies
    to every synthesized frame (network_functions.py:122,156). Fused into the jitted
    synthesis program here instead of running as a separate graph op.
    """
    lo, hi = drange
    scale = 255.0 / (hi - lo)
    x = images * scale + (0.5 - lo * scale)
    return jnp.clip(jnp.floor(x), 0.0, 255.0).astype(jnp.uint8)


# --------------------------------------------------------------------------------
# Discriminator (resnet arch) — needed for the training capability
# --------------------------------------------------------------------------------


def minibatch_stddev(
    x: jax.Array, group_size: int = 4, num_new_features: int = 1
) -> jax.Array:
    """Append the cross-minibatch stddev feature map (NHWC)."""
    n, h, w, c = x.shape
    g = min(group_size, n)
    if n % g != 0:
        g = 1
    y = x.reshape(g, n // g, h, w, num_new_features, c // num_new_features)
    y = y.astype(jnp.float32)
    y = y - jnp.mean(y, axis=0, keepdims=True)
    y = jnp.mean(jnp.square(y), axis=0)
    y = jnp.sqrt(y + 1e-8)
    y = jnp.mean(y, axis=(1, 2, 4), keepdims=True)  # over H, W, channel-split
    y = jnp.squeeze(y, axis=4)  # (n//g, 1, 1, F)
    y = jnp.tile(y, (g, h, w, 1)).astype(x.dtype)
    return jnp.concatenate([x, y], axis=-1)


def discriminator_apply(
    params: Params,
    images: jax.Array,
    config: GeneratorConfig,
    compute_dtype: jnp.dtype = jnp.float32,
    remat: bool = False,
) -> jax.Array:
    """
    D_stylegan2 (resnet): image (B, R, R, 3) -> logits (B, 1).

    :param remat: rematerialize each resnet block under autodiff (see
        synthesis_apply) — R1's grad-of-grad through D is the training
        memory peak.
    """
    top = config.resolution_log2
    x = images.astype(compute_dtype)
    frgb = params[f"{2**top}x{2**top}"]["FromRGB"]
    x = conv2d_layer(x, frgb["weight"])
    x = bias_act(x, frgb["bias"], act="lrelu")

    inv_sqrt2 = 1.0 / math.sqrt(2.0)

    def d_block(x, block):
        t = x
        x = conv2d_layer(x, block["Conv0"]["weight"])
        x = bias_act(x, block["Conv0"]["bias"], act="lrelu")
        x = conv2d_layer(x, block["Conv1_down"]["weight"], down=True,
                         resample_kernel=config.resample_kernel)
        x = bias_act(x, block["Conv1_down"]["bias"], act="lrelu")
        t = conv2d_layer(t, block["Skip"]["weight"], down=True,
                         resample_kernel=config.resample_kernel)
        return (x + t) * jnp.asarray(inv_sqrt2, x.dtype)

    if remat:
        d_block = jax.checkpoint(d_block)
    for res in range(top, 2, -1):
        x = d_block(x, params[f"{2**res}x{2**res}"])

    block = params["4x4"]
    x = minibatch_stddev(x, config.mbstd_group_size, config.mbstd_num_features)
    x = conv2d_layer(x, block["Conv"]["weight"])
    x = bias_act(x, block["Conv"]["bias"], act="lrelu")
    x = x.reshape(x.shape[0], -1)
    x = dense_layer(x, block["Dense0"]["weight"])
    x = bias_act(x, block["Dense0"]["bias"], act="lrelu")
    x = dense_layer(x, params["Output"]["weight"])
    x = bias_act(x, params["Output"]["bias"], act="linear")
    return x.astype(jnp.float32)
