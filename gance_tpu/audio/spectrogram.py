"""
Audio spectrogram → latent-vector transform — the canonical audio feature path
(reference gance/apply_spectrogram.py; SURVEY.md §2.3).

Exact semantics preserved (including the reference's operator-precedence quirk
`m = num_frequency_bins - 1 * 2` ⇒ window = vector_length - 2, stepped by
vector_length, so each window skips 2 samples), but computed as one jitted graph:
strided windowing is a reshape+slice, the FFT batch is a single jnp.fft call, the
per-vector length resample is a batched Fourier resample, and both savgol smoothing
passes are linear operators (see audio/dsp.py).
"""

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gance_tpu.audio.dsp import fourier_resample, minmax_scale, savgol_smooth


@functools.partial(jax.jit, static_argnames=("num_frequency_bins", "truncate"))
def compute_spectrogram(
    data: jax.Array, num_frequency_bins: int, truncate: bool = True
) -> jax.Array:
    """
    Hanning-windowed strided FFT magnitude in dB, normalized to global max
    (reference apply_spectrogram.py:49-83).

    :param data: mono audio (S,) — stereo (S, 2) is averaged to mono.
    :param num_frequency_bins: the "vector length"; windows are this minus 2 samples
        wide and step by exactly this many samples.
    :return: (freq_bins, num_windows) — rows are frequencies over time; freq_bins is
        (num_frequency_bins - 2) // 2 when truncated.
    """
    data = jnp.asarray(data, jnp.float32)
    if data.ndim > 1:
        data = jnp.mean(data, axis=1)

    m = num_frequency_bins - 1 * 2  # reference quirk: == vector_length - 2
    step = num_frequency_bins
    num_windows = (data.shape[0] - m) // step + 1
    starts = jnp.arange(num_windows) * step
    idx = starts[:, None] + jnp.arange(m)[None, :]
    slices = data[idx]  # (num_windows, m)

    win = jnp.asarray(np.hanning(m + 1)[:-1], jnp.float32)
    slices = slices * win[None, :]

    if truncate:
        # rfft bins [0, m//2] ⊇ the kept fft bins [0, m//2) — half the FFT work.
        spectrum = jnp.fft.rfft(slices, axis=1).T[: m // 2]
    else:
        spectrum = jnp.fft.fft(slices, axis=1).T
    s = jnp.abs(spectrum)
    return 20.0 * jnp.log10(s / jnp.max(s))


@functools.partial(jax.jit, static_argnames=("vector_length", "amplitude_range"))
def reshape_spectrogram_to_vectors(
    spectrogram_data: jax.Array,
    vector_length: int,
    amplitude_range: Optional[Tuple[float, float]] = None,
) -> jax.Array:
    """
    Transpose (freq, time) → per-time vectors, Fourier-resample each vector from
    freq_bins to `vector_length`, optionally minmax-scale the whole signal
    (reference apply_spectrogram.py:20-46). Returns flat ConcatenatedVectors
    (num_windows * vector_length,).
    """
    transposed = spectrogram_data.T  # (time, freq)
    scaled = fourier_resample(transposed, vector_length, axis=-1)
    flat = scaled.reshape(-1)
    if amplitude_range is not None:
        flat = minmax_scale(flat, feature_range=amplitude_range)
    return flat


@functools.partial(jax.jit, static_argnames=("vector_length", "amplitude_range"))
def compute_spectrogram_smooth_scale(
    data: jax.Array,
    vector_length: int,
    amplitude_range: Optional[Tuple[float, float]] = None,
) -> jax.Array:
    """
    The canonical audio→latent transform (reference apply_spectrogram.py:85-118):
    spectrogram → per-vector resample/scale → smooth across vectors (savgol 7/3 along
    time per latent dim) → smooth within each vector (savgol 5/3).
    Returns flat ConcatenatedVectors.
    """
    spectrogram = compute_spectrogram(data, vector_length)
    flat = reshape_spectrogram_to_vectors(
        spectrogram, vector_length, amplitude_range=amplitude_range
    )
    divided = flat.reshape(-1, vector_length)  # (N, V)
    across = savgol_smooth(divided, window_length=7, polyorder=3, axis=0)
    within = savgol_smooth(across, window_length=5, polyorder=3, axis=1)
    return within.reshape(-1)
