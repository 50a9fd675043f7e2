"""
Perceptual Path Length (PPL) — the StyleGAN latent-space smoothness metric.

Semantics follow NVlabs stylegan2 `metrics/perceptual_path_length.py` (inside
the submodule GANce forks; reconstructed from the public upstream the fork
follows — SURVEY §2.9):

  * sample latent pairs (z0, z1); pick an interpolation position t — uniform in
    [0, 1) for `sampling="full"`, fixed 0 for `sampling="end"`;
  * interpolate in `space="w"` (lerp between mapped w0, w1 — the headline
    configuration) or `space="z"` (slerp between the gaussian latents, then
    map);
  * synthesize images at t and t + epsilon with constant noise, optionally
    center-crop to the face region (crop=True for 1024px face models:
    rows 3c:7c, cols 2c:6c with c = resolution // 8);
  * distance = LPIPS(img_t, img_t+eps) / epsilon^2, using the same pluggable
    VGG16 metric as projection (projection/lpips.py — the NVlabs
    vgg16_zhang_perceptual.pkl loads directly; the deterministic random-VGG
    fallback applies when no weights exist, making values comparable only
    within one metric configuration);
  * reject outliers outside the [1st, 99th] percentile and report the mean.

TPU shape: the whole pair pipeline (map -> interpolate -> synthesize x2 ->
LPIPS) is ONE jitted program over a (batch,) of pairs; sample counts beyond the
batch run as repeated dispatches of the same compiled program with per-chunk
fold_in keys, accumulating distances host-side (constant device memory).
"""

from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gance_tpu.models.stylegan2 import (
    GeneratorConfig,
    broadcast_dlatents,
    mapping_apply,
    synthesis_apply,
    truncate_dlatents,
)
from gance_tpu.projection.lpips import downsample_to, lpips_distance

# NVlabs evaluates the perceptual distance at 256px (same as projection).
_PERCEPTUAL_SIZE = 256


def slerp(a: jax.Array, b: jax.Array, t: jax.Array) -> jax.Array:
    """
    Spherical interpolation between latent batches (NVlabs `slerp`): inputs are
    unit-normalized, the result is a unit vector at angle fraction `t` along
    the great circle from a to b. (StyleGAN's mapping pixel-norms its input,
    so the unit-norm output is exactly what z-space interpolation should feed.)

    :param a, b: (B, D); :param t: broadcastable to (B, 1).
    """
    a = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
    b = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
    d = jnp.clip(jnp.sum(a * b, axis=-1, keepdims=True), -1.0, 1.0)
    p = t * jnp.arccos(d)
    c = b - d * a
    c = c / (jnp.linalg.norm(c, axis=-1, keepdims=True) + 1e-12)
    out = a * jnp.cos(p) + c * jnp.sin(p)
    return out / (jnp.linalg.norm(out, axis=-1, keepdims=True) + 1e-12)


def _crop_face_region(images: jax.Array) -> jax.Array:
    """NVlabs PPL face crop: c = H//8; rows 3c:7c, cols 2c:6c."""
    c = images.shape[1] // 8
    return images[:, c * 3 : c * 7, c * 2 : c * 6, :]


@dataclass
class PPLResult:
    """PPL value + the provenance a JSON report needs."""

    ppl: float
    num_samples: int
    num_filtered: int
    space: str
    sampling: str
    epsilon: float
    crop: bool


def _build_chunk_fn(
    config: GeneratorConfig,
    space: str,
    sampling: str,
    epsilon: float,
    crop: bool,
    truncation_psi: Optional[float],
    compute_dtype: Any,
):
    """One jitted dispatch: (params, key, batch) -> (batch,) distances."""

    def chunk(params: Dict[str, Any], perceptual: Dict[str, Any], key: jax.Array, batch: int):
        z_key, t_key = jax.random.split(key)
        z = jax.random.normal(z_key, (batch * 2, config.latent_size))
        z0, z1 = z[:batch], z[batch:]
        if sampling == "full":
            t = jax.random.uniform(t_key, (batch, 1))
        else:  # "end"
            t = jnp.zeros((batch, 1))

        if space == "w":
            w0 = mapping_apply(params, z0, config)
            w1 = mapping_apply(params, z1, config)
            wt0 = w0 + (w1 - w0) * t
            wt1 = w0 + (w1 - w0) * (t + epsilon)
        else:  # "z"
            wt0 = mapping_apply(params, slerp(z0, z1, t), config)
            wt1 = mapping_apply(params, slerp(z0, z1, t + epsilon), config)

        # One synthesis dispatch for both endpoints: stack pairs into the batch.
        dlatents = broadcast_dlatents(jnp.concatenate([wt0, wt1]), config)
        if truncation_psi is not None:
            dlatents = truncate_dlatents(dlatents, params["dlatent_avg"], truncation_psi)
        images = synthesis_apply(
            params, dlatents, config, noise_mode="const", compute_dtype=compute_dtype
        ).astype(jnp.float32)
        if crop:
            images = _crop_face_region(images)
        images = downsample_to(images, _PERCEPTUAL_SIZE)
        d = lpips_distance(perceptual, images[:batch], images[batch:])
        return d * (1.0 / (epsilon**2))

    return jax.jit(chunk, static_argnums=(3,))


def perceptual_path_length(
    params: Dict[str, Any],
    config: GeneratorConfig,
    perceptual_params: Dict[str, Any],
    num_samples: int = 2048,
    batch_size: int = 8,
    space: str = "w",
    sampling: str = "full",
    epsilon: float = 1e-4,
    crop: bool = False,
    truncation_psi: Optional[float] = None,
    compute_dtype: Any = jnp.float32,
    seed: int = 0,
) -> PPLResult:
    """
    Compute PPL for a generator.

    :param perceptual_params: projection/lpips.py weights dict
        (`load_vgg_params` for real weights, `random_vgg_params` fallback).
    :param truncation_psi: None (NVlabs PPL evaluates the raw mapping output)
        or a psi to measure the truncated sampling distribution instead.
    :return: PPLResult; `.ppl` is the outlier-filtered mean.
    """
    if space not in ("w", "z"):
        raise ValueError(f"space must be 'w' or 'z', got {space!r}")
    if sampling not in ("full", "end"):
        raise ValueError(f"sampling must be 'full' or 'end', got {sampling!r}")
    chunk_fn = _build_chunk_fn(
        config, space, sampling, float(epsilon), crop, truncation_psi, compute_dtype
    )
    key = jax.random.PRNGKey(seed)
    distances = []
    done = 0
    chunk_index = 0
    while done < num_samples:
        batch = min(batch_size, num_samples - done)
        d = chunk_fn(params, perceptual_params, jax.random.fold_in(key, chunk_index), batch)
        distances.append(np.asarray(d))
        done += batch
        chunk_index += 1
    all_distances = np.concatenate(distances)

    # NVlabs outlier rejection: keep [1st, 99th] percentile, mean the rest.
    lo = np.percentile(all_distances, 1, method="lower")
    hi = np.percentile(all_distances, 99, method="higher")
    filtered = all_distances[(all_distances >= lo) & (all_distances <= hi)]
    return PPLResult(
        ppl=float(np.mean(filtered)),
        num_samples=int(num_samples),
        num_filtered=int(filtered.size),
        space=space,
        sampling=sampling,
        epsilon=float(epsilon),
        crop=bool(crop),
    )
