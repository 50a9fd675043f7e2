"""
Perceptual distance for latent projection.

The reference's projector minimizes LPIPS(VGG16) between target and synthesized
images (SURVEY.md §2.9 row 5 — `Projector` uses the NVlabs vgg16_zhang_perceptual
pickle). This machine has no pretrained VGG weights and no network egress, so the
perceptual metric is pluggable:

  * `VGGFeatureExtractor` implements the VGG16 conv stack in JAX. When a weights
    file is supplied (`.npz` of conv kernels, e.g. exported from torchvision),
    distances match true LPIPS up to the learned per-layer weighting.
  * Without weights, `random_vgg_params(seed)` builds the same architecture with
    fixed-seed He-scaled random filters. Random-filter perceptual distances are a
    documented, surprisingly strong perceptual proxy; they are deterministic, so
    projection remains reproducible.

Distance (LPIPS form): unit-normalize each layer's channels, L2 across channels,
mean over space, sum over layers.

True-LPIPS extensions (used when importing the NVlabs `vgg16_zhang_perceptual.pkl`
via projection/vgg_import.py — SURVEY.md §2.9 row 5):
  * `lin{b}_w` (C,) per feature block: Zhang's learned per-channel linear weighting
    of the squared normalized-feature differences. Absent -> uniform weighting
    (the previous behavior, and what random-filter mode uses).
  * `input_shift` / `input_scale` (3,): Zhang's ScalingLayer constants mapping
    [-1, 1] RGB onto the VGG training distribution; applied before the conv stack
    when present.
"""

from pathlib import Path
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# VGG16 conv layout: (out_channels, convs_per_block)
VGG16_BLOCKS: Tuple[Tuple[int, int], ...] = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))

# Layers whose activations feed the distance (outputs of each block, pre-pool).
DEFAULT_FEATURE_BLOCKS: Tuple[int, ...] = (0, 1, 2, 3, 4)

# Zhang's ScalingLayer constants (lpips/networks_basic.py): map [-1, 1] RGB onto
# the ImageNet-normalized distribution the pretrained VGG expects.
ZHANG_INPUT_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
ZHANG_INPUT_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def random_vgg_params(seed: int = 0, in_channels: int = 3) -> Dict[str, np.ndarray]:
    """Fixed-seed He-initialized VGG16 conv weights (HWIO)."""
    rng = np.random.RandomState(seed)
    params: Dict[str, np.ndarray] = {}
    cin = in_channels
    for b, (cout, n_convs) in enumerate(VGG16_BLOCKS):
        for c in range(n_convs):
            fan_in = 3 * 3 * cin
            params[f"block{b}_conv{c}_w"] = (
                rng.randn(3, 3, cin, cout) * np.sqrt(2.0 / fan_in)
            ).astype(np.float32)
            params[f"block{b}_conv{c}_b"] = np.zeros((cout,), np.float32)
            cin = cout
    return params


def load_vgg_params(path: Path) -> Dict[str, np.ndarray]:
    """
    Load perceptual-net weights: an .npz with the block{b}_conv{c}_{w,b} (+
    optional lin{b}_w / input_shift / input_scale) keys, or the NVlabs
    `vgg16_zhang_perceptual.pkl` directly (converted via projection/vgg_import.py
    — the exact asset the reference's projector consumes).
    """
    path = Path(path)
    if path.suffix == ".pkl":
        from gance_tpu.projection.vgg_import import load_nvlabs_lpips_pickle

        return load_nvlabs_lpips_pickle(path)
    blob = np.load(str(path))
    return {k: np.asarray(blob[k], np.float32) for k in blob.files}


def _conv(x: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    y = lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    return jax.nn.relu(y + b.astype(y.dtype))


def vgg_features(
    params: Dict[str, np.ndarray],
    images: jax.Array,
    feature_blocks: Sequence[int] = DEFAULT_FEATURE_BLOCKS,
) -> List[jax.Array]:
    """
    VGG16 forward collecting per-block features.
    :param images: (B, H, W, 3) float in [-1, 1].
    """
    x = images
    if "input_shift" in params:
        shift = jnp.asarray(params["input_shift"], x.dtype)
        scale = jnp.asarray(params["input_scale"], x.dtype)
        x = (x - shift) / scale
    feats: List[jax.Array] = []
    for b, (_, n_convs) in enumerate(VGG16_BLOCKS):
        for c in range(n_convs):
            x = _conv(x, jnp.asarray(params[f"block{b}_conv{c}_w"]),
                      jnp.asarray(params[f"block{b}_conv{c}_b"]))
        if b in feature_blocks:
            feats.append(x)
        # 2x2 max pool between blocks (not after the last)
        if b < len(VGG16_BLOCKS) - 1:
            x = lax.reduce_window(
                x, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
    return feats


def lpips_distance(
    params: Dict[str, np.ndarray],
    images_a: jax.Array,
    images_b: jax.Array,
    feature_blocks: Sequence[int] = DEFAULT_FEATURE_BLOCKS,
) -> jax.Array:
    """
    LPIPS-form distance per batch element: for each selected block, channel-unit-
    normalize activations, squared L2 over channels (weighted by the learned
    `lin{b}_w` vector when present — true LPIPS; uniform otherwise), mean over
    space, sum blocks.
    :return: (B,) distances.
    """
    # vgg_features returns features in ASCENDING block order regardless of the
    # sequence order given; normalize so lin{block}_w always pairs correctly.
    feature_blocks = tuple(sorted(feature_blocks))
    feats_a = vgg_features(params, images_a, feature_blocks)
    feats_b = vgg_features(params, images_b, feature_blocks)
    total = None
    for block, (fa, fb) in zip(feature_blocks, zip(feats_a, feats_b)):
        na = fa * lax.rsqrt(jnp.sum(jnp.square(fa), axis=-1, keepdims=True) + 1e-10)
        nb = fb * lax.rsqrt(jnp.sum(jnp.square(fb), axis=-1, keepdims=True) + 1e-10)
        sq = jnp.square(na - nb)
        lin = params.get(f"lin{block}_w")
        if lin is not None:
            sq = sq * jnp.asarray(lin, sq.dtype)
        d = jnp.mean(jnp.sum(sq, axis=-1), axis=(1, 2))
        total = d if total is None else total + d
    return total


def downsample_to(images: jax.Array, size: int) -> jax.Array:
    """
    Average-pool square images down to `size` (the projector evaluates LPIPS at
    256px like the NVlabs implementation). No-op when already at/below size.
    """
    h = images.shape[1]
    if h <= size:
        return images
    factor = h // size
    return lax.reduce_window(
        images,
        0.0,
        lax.add,
        (1, factor, factor, 1),
        (1, factor, factor, 1),
        "VALID",
    ) / float(factor * factor)
