"""
gance_tpu — a TPU-native (JAX / XLA / Pallas) framework with the capabilities of
esologic/GANce: audio + video → StyleGAN2 latent space → synthesized music videos.

Design stance (vs. the reference):
  * The reference is a single-GPU TF1 media pipeline whose architecture is dominated by
    TF1 memory-leak workarounds (child-process network hosts) and per-frame Python loops.
  * This framework is pure-functional: StyleGAN2 is a params pytree + jitted apply
    functions, the audio→latent DSP chain is a single jitted graph, and synthesis runs
    in frame batches under `jax.sharding` over a device mesh.

Layers (mirrors SURVEY.md §1 layer map, rebuilt TPU-first):
  * gance_tpu.ops        — upfirdn2d / fused bias-act / modulated conv (XLA + Pallas)
  * gance_tpu.models     — StyleGAN2 generator/discriminator + TF1 .pkl weight loader
  * gance_tpu.audio      — WAV ingest, spectrogram, smoothing, reducers (jitted DSP)
  * gance_tpu.synthesis  — batched synthesis runtime + orchestration (MultiNetwork equiv)
  * gance_tpu.projection — LPIPS latent projection + HDF5 projection-file v2 format
  * gance_tpu.media      — video/image IO, audio mux, disk-backed iterator tee
  * gance_tpu.overlay    — face/eye tracking, phash gating, mask compositing
  * gance_tpu.parallel   — device mesh, sharded synthesis + training step
  * gance_tpu.pipelines  — noise_blend / projection_file_blend top-level pipelines
  * gance_tpu.cli        — click CLIs matching the reference's command shapes
"""

__version__ = "0.8.0"

import os as _os

_platforms = _os.environ.get("JAX_PLATFORMS", "")
if _platforms and _platforms.lower() != "axon":
    # The axon TPU plugin pins jax_platforms to itself, which silently overrides a
    # user's JAX_PLATFORMS (e.g. =cpu for tests/tools). Re-applying the user's value
    # through the config API restores the documented env-var behavior. The plugin's
    # own ambient value ("axon") is left alone.
    import jax as _jax

    _jax.config.update("jax_platforms", _platforms)

if _os.environ.get("GANCE_TPU_COMPILE_CACHE", "1") != "0":
    # XLA compiles are expensive (minutes over a tunneled TPU); persist them so CLI
    # invocations after the first are fast. Opt out with GANCE_TPU_COMPILE_CACHE=0.
    import jax as _jax

    _cache_dir = _os.environ.get(
        "GANCE_TPU_COMPILE_CACHE_DIR",
        _os.path.join(_os.path.expanduser("~"), ".cache", "gance_tpu_jax"),
    )
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


# Lazy top-level API (keeps `import gance_tpu` light for CLI startup).
_API = {
    "SynthesisNetwork": ("gance_tpu.synthesis.runtime", "SynthesisNetwork"),
    "MultiNetwork": ("gance_tpu.synthesis.runtime", "MultiNetwork"),
    "load_generator": ("gance_tpu.models.pickle_loader", "load_generator"),
    "GeneratorConfig": ("gance_tpu.models.stylegan2", "GeneratorConfig"),
    "generator_apply": ("gance_tpu.models.stylegan2", "generator_apply"),
    "TPUProjector": ("gance_tpu.projection.projector", "TPUProjector"),
    "load_projection_file": ("gance_tpu.projection.file_reader", "load_projection_file"),
    "noise_blend_api": ("gance_tpu.pipelines.noise_blend", "noise_blend_api"),
    "projection_file_blend_api": (
        "gance_tpu.pipelines.projection_file_blend",
        "projection_file_blend_api",
    ),
}


def __getattr__(name: str):
    if name in _API:
        import importlib

        module_name, attr = _API[name]
        return getattr(importlib.import_module(module_name), attr)
    raise AttributeError(f"module 'gance_tpu' has no attribute {name!r}")
