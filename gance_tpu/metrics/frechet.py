"""
Fréchet feature distance — the FID formula over a pluggable feature extractor.

The math is the exact Fréchet (2-Wasserstein) distance between gaussians fit
to feature distributions:

    d^2 = |mu_a - mu_b|^2 + tr(cov_a + cov_b - 2 (cov_a cov_b)^{1/2})

and is tested against the closed-form diagonal-gaussian case. The FEATURES are
pluggable because the canonical FID extractor (ImageNet Inception-v3) has no
weights on this host class (zero egress): the default extractor is the same
VGG16 stack projection uses (projection/lpips.py — the NVlabs
vgg16_zhang_perceptual.pkl loads directly, the deterministic random-VGG
fallback otherwise), global-average-pooled per block and concatenated.
Distances are therefore comparable only within one feature configuration —
they are NOT published-FID-comparable numbers; drop Inception weights into the
extractor slot to get those.

Constant memory at any sample count: features stream through a running
(sum, outer-product sum) accumulator in float64; images never accumulate.
"""

from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Callable, Dict, Iterator, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from gance_tpu.models.stylegan2 import (
    GeneratorConfig,
    generator_apply,
    images_to_uint8,
)
from gance_tpu.utils.logging import LOGGER
from gance_tpu.projection.lpips import (
    DEFAULT_FEATURE_BLOCKS,
    downsample_to,
    vgg_features,
)

_FEATURE_SIZE = 256  # evaluate features at 256px, like projection/PPL


def pooled_vgg_features(
    params: Dict[str, Any],
    images: jax.Array,
    feature_blocks: Sequence[int] = DEFAULT_FEATURE_BLOCKS,
) -> jax.Array:
    """
    (B, H, W, 3) float images in [-1, 1] -> (B, D) pooled VGG features:
    each selected block's activations global-average-pooled over space,
    concatenated along channels (blocks 0-4 -> D = 64+128+256+512+512 = 1472).
    """
    images = downsample_to(images.astype(jnp.float32), _FEATURE_SIZE)
    feats = vgg_features(params, images, feature_blocks)
    return jnp.concatenate([jnp.mean(f, axis=(1, 2)) for f in feats], axis=-1)


@dataclass
class FeatureMoments:
    """Streaming mean/covariance accumulator (float64, constant memory)."""

    dim: int
    count: int = 0
    _sum: np.ndarray = field(init=False)
    _outer: np.ndarray = field(init=False)

    def __post_init__(self) -> None:
        self._sum = np.zeros((self.dim,), np.float64)
        self._outer = np.zeros((self.dim, self.dim), np.float64)

    def update(self, features: np.ndarray) -> None:
        features = np.asarray(features, np.float64)
        if features.ndim != 2 or features.shape[1] != self.dim:
            raise ValueError(f"expected (B, {self.dim}), got {features.shape}")
        self._sum += features.sum(axis=0)
        self._outer += features.T @ features
        self.count += features.shape[0]

    def finalize(self) -> tuple:
        """(mu, cov) with the sample (ddof=1) covariance, matching np.cov."""
        if self.count < 2:
            raise ValueError("need at least 2 samples for a covariance")
        mu = self._sum / self.count
        cov = (self._outer - self.count * np.outer(mu, mu)) / (self.count - 1)
        return mu, cov


def gaussian_frechet_distance(
    mu_a: np.ndarray, cov_a: np.ndarray, mu_b: np.ndarray, cov_b: np.ndarray,
    eps: float = 1e-6,
) -> float:
    """
    Exact Fréchet distance between two gaussians (the FID formula). The matrix
    square root uses scipy.linalg.sqrtm on the product; a tiny eps*I ridge is
    added on numerical failure (the standard FID implementations' guard).
    """
    from scipy import linalg

    mu_a = np.atleast_1d(np.asarray(mu_a, np.float64))
    mu_b = np.atleast_1d(np.asarray(mu_b, np.float64))
    cov_a = np.atleast_2d(np.asarray(cov_a, np.float64))
    cov_b = np.atleast_2d(np.asarray(cov_b, np.float64))

    diff = mu_a - mu_b
    covmean = linalg.sqrtm(cov_a.dot(cov_b))
    if not np.isfinite(covmean).all():
        offset = np.eye(cov_a.shape[0]) * eps
        covmean = linalg.sqrtm((cov_a + offset).dot(cov_b + offset))
    if np.iscomplexobj(covmean):
        # sqrtm of a PSD-matrix product is real up to round-off; a large
        # imaginary part means the covariances were not meaningful (typically
        # rank-deficient: fewer samples than feature dims). Reference FID
        # implementations raise here; we warn so a mid-training quality curve
        # survives, but the number is flagged as unreliable.
        imag_max = float(np.abs(np.diagonal(covmean).imag).max())
        if imag_max > 1e-3:
            LOGGER.warning(
                "Frechet sqrtm is significantly complex (max diagonal imag "
                "%.3g) — covariances are likely rank-deficient (sample count "
                "below the feature dim); treat this distance as unreliable.",
                imag_max,
            )
        covmean = covmean.real
    value = diff.dot(diff) + np.trace(cov_a) + np.trace(cov_b) - 2.0 * np.trace(covmean)
    # Exact-zero case (identical inputs) can land epsilon-negative.
    return float(max(value, 0.0))


FeatureFn = Callable[[Dict[str, Any], jax.Array], jax.Array]


def _network_feature_stream(
    params: Dict[str, Any],
    config: GeneratorConfig,
    perceptual_params: Dict[str, Any],
    num_samples: int,
    batch_size: int,
    truncation_psi: Optional[float],
    seed: int,
    feature_fn: FeatureFn,
) -> Iterator[np.ndarray]:
    """Pooled features of freshly sampled network outputs, one batch at a time."""

    def chunk(p, perc, key, batch):
        z = jax.random.normal(key, (batch, config.latent_size))
        images = generator_apply(
            p, z, config,
            truncation_psi=truncation_psi,
            noise_mode="const",
        )
        # Measure the DELIVERED distribution: quantize exactly like the uint8
        # images a user saves/serves (and like the real side reads back) —
        # comparing the unclipped float output against clipped uint8 files
        # would build a metric artifact into the distance.
        images = images_to_uint8(images).astype(jnp.float32) / 127.5 - 1.0
        return feature_fn(perc, images)

    chunk_fn = jax.jit(chunk, static_argnums=(3,))
    key = jax.random.PRNGKey(seed)
    done = 0
    index = 0
    while done < num_samples:
        batch = min(batch_size, num_samples - done)
        yield np.asarray(chunk_fn(params, perceptual_params, jax.random.fold_in(key, index), batch))
        done += batch
        index += 1


def _image_feature_stream(
    image_paths: Sequence[Path],
    resolution: int,
    perceptual_params: Dict[str, Any],
    batch_size: int,
    feature_fn: FeatureFn,
) -> Iterator[np.ndarray]:
    """Pooled features of on-disk images (resized to `resolution`, [-1, 1])."""
    import cv2

    from gance_tpu.media.images import read_image

    feature_fn = jax.jit(feature_fn)
    for start in range(0, len(image_paths), batch_size):
        chunk_paths = image_paths[start : start + batch_size]
        images = np.stack(
            [
                cv2.resize(
                    read_image(p), (resolution, resolution),
                    interpolation=cv2.INTER_AREA,
                ).astype(np.float32)
                / 127.5
                - 1.0
                for p in chunk_paths
            ]
        )
        yield np.asarray(feature_fn(perceptual_params, images))


def frechet_distance_network_vs_images(
    params: Dict[str, Any],
    config: GeneratorConfig,
    perceptual_params: Dict[str, Any],
    image_directory: Path,
    num_samples: int = 2048,
    batch_size: int = 8,
    truncation_psi: Optional[float] = None,
    feature_fn: Optional[FeatureFn] = None,
    seed: int = 0,
    feature_stream_hook: Optional[Callable[[str, Iterator[np.ndarray]], Iterator[np.ndarray]]] = None,
) -> Dict[str, Any]:
    """
    Fréchet feature distance between a generator's sampling distribution and an
    image folder (the training-set quality check FID performs, over the
    documented pluggable features).

    :param num_samples: generated-sample count; the real side uses every image
        in the folder (capped at num_samples, taking the sorted prefix).
        Counts at or below the feature dim (1472 for the default extractor)
        give rank-deficient covariances — fine for a relative training curve,
        logged as unreliable for absolute comparison.
    :param truncation_psi: None/1.0 = UNTRUNCATED sampling, the FID convention
        (NVlabs evaluates metrics without truncation — truncation suppresses
        diversity and would understate mode collapse). Pass the serving psi
        (1.2) explicitly to measure the delivered truncated distribution.
    :param feature_fn: the pluggable extractor — (extractor_params,
        (B, H, W, 3) float images in [-1, 1]) -> (B, D) features; default
        `pooled_vgg_features`. Drop an Inception-v3 apply function (and its
        params as `perceptual_params`) into this slot for published-FID
        features; both streams run through the same function, jitted.
    :param feature_stream_hook: test seam — wraps each ("fake"|"real", stream).
    :return: dict with `distance`, the per-side sample counts, and provenance.
    """
    from gance_tpu.parallel.data import list_image_paths

    if feature_fn is None:
        feature_fn = pooled_vgg_features

    paths = list_image_paths(Path(image_directory))
    if len(paths) < 2:
        raise ValueError(f"Need at least 2 images in {image_directory}")
    paths = paths[: num_samples or len(paths)]

    fake_stream: Iterator[np.ndarray] = _network_feature_stream(
        params, config, perceptual_params, num_samples, batch_size,
        truncation_psi, seed, feature_fn,
    )
    real_stream: Iterator[np.ndarray] = _image_feature_stream(
        paths, config.resolution, perceptual_params, batch_size, feature_fn
    )
    if feature_stream_hook is not None:
        fake_stream = feature_stream_hook("fake", fake_stream)
        real_stream = feature_stream_hook("real", real_stream)

    moments = {"fake": None, "real": None}
    for name, stream in (("fake", fake_stream), ("real", real_stream)):
        accumulator = None
        for features in stream:
            if accumulator is None:
                accumulator = FeatureMoments(dim=features.shape[1])
            accumulator.update(features)
        moments[name] = accumulator

    mu_fake, cov_fake = moments["fake"].finalize()
    mu_real, cov_real = moments["real"].finalize()
    min_count = min(moments["fake"].count, moments["real"].count)
    if min_count <= mu_fake.shape[0]:
        LOGGER.warning(
            "Frechet covariances are rank-deficient (%d samples over %d "
            "feature dims) — comparable across steps of one run, unreliable "
            "as an absolute distance.",
            min_count,
            int(mu_fake.shape[0]),
        )
    return {
        "distance": gaussian_frechet_distance(mu_fake, cov_fake, mu_real, cov_real),
        "num_fake": moments["fake"].count,
        "num_real": moments["real"].count,
        "feature_dim": int(mu_fake.shape[0]),
        "note": (
            "Frechet distance over pooled VGG16 features (pluggable; NOT "
            "comparable to published Inception-FID numbers)"
            if feature_fn is pooled_vgg_features
            else "Frechet distance over custom feature_fn features"
        ),
    }
