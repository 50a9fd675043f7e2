"""
Network quality metrics (net-new vs the reference).

The reference delegates training to its TF1 submodule fork and never evaluates
the resulting networks (SURVEY §2.9 — the fork's one noted feature is crash
resume); this framework trains first-class (parallel/training.py), so it also
measures what it trains:

  * `metrics.ppl` — Perceptual Path Length (the StyleGAN smoothness metric):
    LPIPS distance between synthesized images at epsilon-separated points on
    latent interpolation paths, batched and jitted for TPU.
  * `metrics.frechet` — exact Fréchet-distance machinery (the FID formula)
    over a pluggable feature extractor, with streaming mean/covariance
    accumulation so arbitrarily many samples pass through constant memory.

CLI: `python network_metrics.py ppl|frechet ...` at the repo root.
"""

from gance_tpu.metrics.frechet import (
    FeatureMoments,
    frechet_distance_network_vs_images,
    gaussian_frechet_distance,
    pooled_vgg_features,
)
from gance_tpu.metrics.ppl import PPLResult, perceptual_path_length, slerp

__all__ = [
    "FeatureMoments",
    "frechet_distance_network_vs_images",
    "gaussian_frechet_distance",
    "pooled_vgg_features",
    "PPLResult",
    "perceptual_path_length",
    "slerp",
]
