"""
Perceptual hash (pHash) as a batched JAX computation.

Algorithm-compatible with imagehash.phash (the reference's gating metric,
overlay_eye_tracking.py:105-112): grayscale -> 32x32 -> 2D DCT-II -> top-left 8x8
coefficients -> median threshold -> 64-bit hash; distance = Hamming. The DCT +
threshold runs as one jitted op over a batch of crops — the "phash = DCT, trivially
XLA-able" item from BASELINE.json.
"""

import cv2
import jax
import jax.numpy as jnp
import numpy as np

HASH_SIZE = 8
HIGHFREQ_FACTOR = 4
_RESIZE = HASH_SIZE * HIGHFREQ_FACTOR  # 32


def _prepare_crop(image: np.ndarray) -> np.ndarray:
    """RGB (or gray) uint8 crop -> 32x32 float grayscale (PIL 'L' weights)."""
    image = np.asarray(image)
    if image.ndim == 3:
        # PIL convert('L') weights
        gray = (
            image[..., 0] * 0.299 + image[..., 1] * 0.587 + image[..., 2] * 0.114
        ).astype(np.float32)
    else:
        gray = image.astype(np.float32)
    return cv2.resize(gray, (_RESIZE, _RESIZE), interpolation=cv2.INTER_AREA)


@jax.jit
def _phash_bits(batch: jax.Array) -> jax.Array:
    """(B, 32, 32) float -> (B, 64) bool hash bits."""
    dct = jax.scipy.fft.dct(jax.scipy.fft.dct(batch, axis=1), axis=2)
    low = dct[:, :HASH_SIZE, :HASH_SIZE].reshape(batch.shape[0], -1)  # (B, 64)
    med = jnp.median(low, axis=1, keepdims=True)
    return low > med


def phash_batch(crops: list) -> np.ndarray:
    """Hash a list of uint8 crops (any sizes) -> (B, 64) bool array."""
    prepared = np.stack([_prepare_crop(c) for c in crops])
    return np.asarray(_phash_bits(jnp.asarray(prepared)))


def phash(image: np.ndarray) -> np.ndarray:
    """Hash one crop -> (64,) bool array."""
    return phash_batch([image])[0]


def phash_distance(a: np.ndarray, b: np.ndarray) -> int:
    """Hamming distance between two hash bit arrays."""
    return int(np.count_nonzero(np.asarray(a) != np.asarray(b)))
