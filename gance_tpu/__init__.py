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

__version__ = "0.1.0"
