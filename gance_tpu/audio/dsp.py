"""
Core jittable DSP primitives with scipy/sklearn-exact semantics.

Each function here replicates a host-library op the reference leans on
(scipy.signal.resample / savgol_filter, sklearn minmax_scale, pandas rolling mean,
librosa RMS, np.roll-per-vector) as a static-shape jnp computation, so the whole
audio→latent chain traces into one XLA program. Exactness is enforced by golden
tests against the host libraries (tests/test_audio_dsp.py).
"""

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy.signal import savgol_coeffs
from scipy.signal import savgol_filter as _scipy_savgol


@functools.partial(jax.jit, static_argnames=("num", "axis"))
def fourier_resample(x: jax.Array, num: int, axis: int = -1) -> jax.Array:
    """
    scipy.signal.resample (Fourier method, real input) along `axis`:
    truncate/zero-pad the rfft, fix the unpaired Nyquist bin, scaled irfft.
    """
    x = jnp.moveaxis(x, axis, -1)
    n = x.shape[-1]
    m = min(num, n)
    m2 = m // 2 + 1
    X = jnp.fft.rfft(x.astype(jnp.float32))[..., :m2]
    if m % 2 == 0 and num != n:
        factor = 2.0 if num < n else 0.5
        X = X.at[..., m // 2].multiply(factor)
    y = jnp.fft.irfft(X / (n / num), n=num)
    return jnp.moveaxis(y, -1, axis)


def _savgol_matrices(window_length: int, polyorder: int) -> Tuple[np.ndarray, np.ndarray]:
    """Interior correlation coeffs + exact edge operator (scipy mode='interp')."""
    coeffs = savgol_coeffs(window_length, polyorder)  # symmetric for deriv=0
    edge_op = _scipy_savgol(np.eye(window_length), window_length, polyorder, axis=0)
    return coeffs.astype(np.float64), edge_op.astype(np.float64)


@functools.partial(jax.jit, static_argnames=("window_length", "polyorder", "axis"))
def savgol_smooth(
    x: jax.Array, window_length: int, polyorder: int, axis: int = -1
) -> jax.Array:
    """
    Savitzky-Golay smoothing (deriv=0) matching scipy.signal.savgol_filter's default
    mode='interp' exactly: FIR correlation in the interior, polynomial-fit edges
    (expressed as a precomputed (W, W) linear operator applied to the first/last W
    samples). Savgol is a pure linear operator, so this is exact, and on TPU it is a
    conv + two small matmuls instead of a host loop.
    """
    coeffs, edge_op = _savgol_matrices(window_length, polyorder)
    half = window_length // 2

    x = jnp.moveaxis(x, axis, -1).astype(jnp.float32)
    lead_shape = x.shape[:-1]
    n = x.shape[-1]
    if n < window_length:
        raise ValueError(f"signal length {n} < window_length {window_length}")

    flat = x.reshape(-1, 1, n)
    kernel = jnp.asarray(coeffs[::-1], jnp.float32).reshape(-1, 1, 1)  # (W, 1, 1)
    interior = jax.lax.conv_general_dilated(
        flat,
        kernel,
        window_strides=(1,),
        padding=((half, half),),
        dimension_numbers=("NCH", "HIO", "NCH"),
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(*lead_shape, n)

    e = jnp.asarray(edge_op, jnp.float32)
    top = jnp.einsum("ij,...j->...i", e[:half], x[..., :window_length])
    bottom = jnp.einsum("ij,...j->...i", e[-half:], x[..., -window_length:])
    y = interior.at[..., :half].set(top).at[..., -half:].set(bottom)
    return jnp.moveaxis(y, -1, axis)


@functools.partial(jax.jit, static_argnames=("feature_range",))
def minmax_scale(
    x: jax.Array, feature_range: Tuple[float, float] = (0.0, 1.0)
) -> jax.Array:
    """
    sklearn.preprocessing.minmax_scale over the flattened array (the reference always
    passes 1D): map [min, max] -> feature_range; constant input maps to the low end.
    """
    lo, hi = feature_range
    xmin = jnp.min(x)
    xmax = jnp.max(x)
    scale = jnp.where(xmax > xmin, xmax - xmin, 1.0)
    return (x - xmin) / scale * (hi - lo) + lo


def remap_values_into_range(
    data: jax.Array,
    input_range: Tuple[float, float],
    output_range: Tuple[float, float],
) -> jax.Array:
    """
    Linear range remap — replaces the reference's multiprocessing-Pool interp1d
    (vector_sources_common.py:44-61) with one vectorized expression.
    """
    in0, in1 = input_range
    out0, out1 = output_range
    data = jnp.asarray(data, jnp.float32)
    span = in1 - in0
    span = jnp.where(span == 0, 1.0, span)
    return (data - in0) * ((out1 - out0) / span) + out0


@functools.partial(jax.jit, static_argnames=("window", "min_periods"))
def rolling_mean(x: jax.Array, window: int, min_periods: Optional[int] = None) -> jax.Array:
    """
    pandas Series.rolling(window).mean() semantics: trailing window, NaN for the
    first window-1 positions (emitted as the fill applied by the caller).
    Returns (values, valid_mask-free) with leading positions = NaN.
    """
    del min_periods
    x = jnp.asarray(x, jnp.float32)
    if x.shape[0] < window:
        # pandas parity: a series shorter than the window is all-NaN (the
        # serving path can hand very short clips to the RMS reducer).
        return jnp.full(x.shape, jnp.nan, x.dtype)
    csum = jnp.cumsum(x)
    shifted = jnp.concatenate([jnp.zeros((window,), x.dtype), csum[:-window]])
    means = (csum - shifted) / window
    idx = jnp.arange(x.shape[0])
    return jnp.where(idx >= window - 1, means, jnp.nan)


@functools.partial(jax.jit, static_argnames=("frame_length", "hop_length", "center"))
def rms_frames(
    x: jax.Array, frame_length: int, hop_length: int = 512, center: bool = False
) -> jax.Array:
    """
    librosa.feature.rms semantics (the reference's per-frame loudness reducer,
    vector_reduction.py:22-35): RMS over frames of `frame_length` samples advancing
    by `hop_length` (librosa's default hop is 512 regardless of frame length).
    """
    x = jnp.asarray(x, jnp.float32)
    if center:
        x = jnp.pad(x, (frame_length // 2, frame_length // 2), mode="reflect")
    n = x.shape[0]
    num_frames = 1 + (n - frame_length) // hop_length
    starts = jnp.arange(num_frames) * hop_length
    idx = starts[:, None] + jnp.arange(frame_length)[None, :]
    frames = x[idx]
    return jnp.sqrt(jnp.mean(jnp.square(frames), axis=1))


@jax.jit
def rotate_vectors_over_time(data: jax.Array, roll_values: jax.Array) -> jax.Array:
    """
    FFT-roll: circularly shift vector i by cumsum(roll_values)[i] (reference
    vector_sources_common.py:408-428 — np.roll(v, -r) per vector, here one gather).

    Count-mismatch semantics match the reference's zip: when the roll stream and
    the vector stream have different lengths (the RMS reducer's librosa hop of 512
    produces a different frame count whenever vector_length != 512), the output
    truncates to the shorter of the two.

    :param data: (N, V) divided vectors.
    :param roll_values: (M,) per-vector roll increments.
    :return: (min(N, M), V) rotated vectors.
    """
    n = min(data.shape[0], roll_values.shape[0])
    data = data[:n]
    v = data.shape[1]
    shifts = jnp.cumsum(roll_values[:n].astype(jnp.int32))
    idx = (jnp.arange(v)[None, :] + shifts[:, None]) % v
    return jnp.take_along_axis(data, idx, axis=1)


@functools.partial(jax.jit, static_argnames=("size",))
def maximum_filter1d(x: jax.Array, size: int) -> jax.Array:
    """
    scipy.ndimage.maximum_filter1d (mode='reflect') — rolling max with a centered
    window, left-biased for even sizes (origin 0 ⇒ window [i - size//2, i + (size-1)//2]).
    """
    x = jnp.asarray(x, jnp.float32)
    left = size // 2
    right = size - left - 1
    # scipy.ndimage's 'reflect' duplicates the edge sample == numpy's 'symmetric'.
    padded = jnp.pad(x, (left, right), mode="symmetric")
    idx = jnp.arange(x.shape[0])[:, None] + jnp.arange(size)[None, :]
    return jnp.max(padded[idx], axis=1)
