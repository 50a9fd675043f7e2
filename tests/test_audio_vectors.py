"""
Vector-array algebra + reducers + spectrogram tests (ported from the reference's
test_vector_sources_common.py / test_vector_reduction.py coverage shapes).
"""

import numpy as np
import pytest

from gance_tpu.audio import primitives, reduction, vectors
from gance_tpu.audio.spectrogram import (
    compute_spectrogram,
    compute_spectrogram_smooth_scale,
)
from gance_tpu.types import DataLabel, ResultLayers


def test_sub_vectors_shapes(rng):
    flat = rng.randn(10 * 512)
    divided = vectors.sub_vectors(flat, 512)
    assert divided.shape == (10, 512)
    mat = rng.randn(18, 10 * 512)
    divided_m = vectors.sub_vectors(mat, 512)
    assert divided_m.shape == (10, 18, 512)
    np.testing.assert_array_equal(divided_m[3], mat[:, 3 * 512 : 4 * 512])


def test_scale_vectors_resample_bounds(rng):
    data = rng.randn(4 * 100)
    out = vectors.scale_vectors_to_length_resample(data, 100, 512)
    assert out.shape == (4 * 512,)


def test_scale_vectors_linspace(rng):
    data = rng.randn(2 * 10)
    out = vectors.scale_vectors_to_length_linspace(data, 10, 25)
    assert out.shape == (2 * 25,)
    # endpoints preserved by cubic interpolation at exact knots
    np.testing.assert_allclose(out[0], data[0], rtol=1e-9)


def test_duplicate_to_vector_count(rng):
    data = rng.randn(3 * 8)
    out = vectors.duplicate_to_vector_count(data, 8, 6)
    divided = out.reshape(6, 8)
    np.testing.assert_array_equal(divided[0], divided[1])
    np.testing.assert_array_equal(divided[0], data[:8])
    with pytest.raises(ValueError, match="Cannot duplicate"):
        vectors.duplicate_to_vector_count(data, 8, 7)


def test_interpolate_to_vector_count(rng):
    data = rng.randn(3 * 8)
    out = vectors.interpolate_to_vector_count(data, 8, 9)
    assert out.shape == (9 * 8,)
    np.testing.assert_allclose(out[:8], data[:8], rtol=1e-9)
    np.testing.assert_allclose(out[-8:], data[-8:], rtol=1e-9)


def test_promote_demote(rng):
    data = rng.randn(16)
    mat = vectors.promote_to_matrix_duplicate(data, 18)
    assert mat.shape == (18, 16)
    np.testing.assert_array_equal(vectors.demote_to_vector_select(mat, 0), data)
    with pytest.raises(ValueError):
        vectors.promote_to_matrix_duplicate(mat, 3)


def test_rotate_matrices(rng):
    mat = rng.randn(3, 4 * 8)
    rolls = np.array([1, 1, 0, 2])
    out = vectors.rotate_vectors_over_time(mat, 8, rolls)
    assert out.shape == mat.shape
    # every row rolled identically
    flat_row = vectors.rotate_vectors_over_time(mat[0], 8, rolls)
    np.testing.assert_allclose(out[0], flat_row, rtol=1e-6)


def test_interpolate_between_vectors():
    start = np.zeros(4)
    end = np.ones(4)
    out = vectors.interpolate_between_vectors(start, end, 3)
    divided = out.reshape(3, 4)
    np.testing.assert_allclose(divided[0], 0.0)
    np.testing.assert_allclose(divided[1], 0.5)
    np.testing.assert_allclose(divided[2], 1.0)


def test_smooth_across_and_each(rng):
    import scipy.signal

    data = rng.randn(20 * 16)
    out = vectors.smooth_across_vectors(data, 16, window_length=7, polyorder=3)
    want = scipy.signal.savgol_filter(data.reshape(20, 16), 7, 3, axis=0).reshape(-1)
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-4)

    out = vectors.smooth_each_vector(data, 16, window_length=5, polyorder=3)
    want = scipy.signal.savgol_filter(data.reshape(20, 16), 5, 3, axis=1).reshape(-1)
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------- spectrogram


def test_spectrogram_shape(rng):
    vl = 64
    data = rng.randn(20 * vl).astype(np.float32)
    spec = np.asarray(compute_spectrogram(data, vl))
    assert spec.shape == ((vl - 2) // 2, 20)
    assert spec.max() <= 0.0 + 1e-5  # dB relative to max


def test_spectrogram_matches_numpy_derivation(rng):
    """Re-derive the reference algorithm literally in numpy and compare."""
    vl = 32
    data = rng.randn(10 * vl).astype(np.float32)

    m = vl - 2
    n_windows = (len(data) - m) // vl + 1
    slices = np.stack([data[i * vl : i * vl + m] for i in range(n_windows)])
    win = np.hanning(m + 1)[:-1]
    slices = (slices * win).T
    fft = np.fft.fft(slices, axis=0)
    spectrum = fft[: m // 2]
    s = np.abs(spectrum)
    want = 20 * np.log10(s / np.max(s))

    got = np.asarray(compute_spectrogram(data, vl))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_spectrogram_smooth_scale_contract(rng):
    vl = 64
    data = rng.randn(30 * vl).astype(np.float32)
    out = np.asarray(compute_spectrogram_smooth_scale(data, vl, amplitude_range=(-1.0, 1.0)))
    assert out.shape == (30 * vl,)
    assert out.min() >= -1.5 and out.max() <= 1.5  # smoothing may ring slightly


# ---------------------------------------------------------------------- reducers


def test_quantize_results_layers(rng):
    data = np.linspace(0.0, 1.0, 50)
    layers = ResultLayers(result=DataLabel(data, "x"), layers=[])
    out = reduction.quantize_results_layers(layers, network_indices=[0, 1, 2])
    assert out.result.data.min() == 0
    assert out.result.data.max() == 2
    assert out.result.data.dtype == int


def test_track_length_filter_truth_table():
    flags = np.array([1, 1, 1, 0, 1, 0, 1, 1], dtype=bool)
    out = reduction.track_length_filter(flags, 2)
    np.testing.assert_array_equal(out, [1, 1, 1, 0, 0, 0, 1, 1])
    out = reduction.track_length_filter(flags, 3)
    np.testing.assert_array_equal(out, [1, 1, 1, 0, 0, 0, 0, 0])
    out = reduction.track_length_filter(flags, 1)
    np.testing.assert_array_equal(out, flags)
    assert reduction.track_length_filter(np.array([], dtype=bool), 2).size == 0


def test_track_length_filter_matches_pandas(rng):
    import pandas as pd

    flags = pd.Series(rng.rand(200) > 0.5)
    for track_length in (1, 2, 5):
        got = reduction.track_length_filter(flags.to_numpy(), track_length)
        df = pd.DataFrame({"bool_tracks": flags.astype(int)})
        df["track_number"] = (
            df.bool_tracks.astype(int).diff(1).fillna(0).abs().cumsum().squeeze()
        )
        df["track_length"] = df.track_number.groupby(df.track_number).transform(len)
        want = ((df.bool_tracks == 1) & (df.track_length >= track_length)).to_numpy()
        np.testing.assert_array_equal(got, want)


def test_gzip_reducer(rng):
    data = rng.randn(10 * 64).astype(np.float32)
    out = reduction.reduce_vector_gzip_compression_rolling_average(data, 64)
    assert out.result.data.shape == (10,)
    assert len(out.layers) == 2


def test_derive_and_rolling_sum():
    data = np.arange(30, dtype=np.float64)
    layers = ResultLayers(result=DataLabel(data, "x"), layers=[])
    derived = reduction.derive_results_layers(layers, order=1)
    # derivative of a line == slope
    np.testing.assert_allclose(derived.result.data, 1.0, atol=1e-6)
    summed = reduction.rolling_sum_results_layers(layers, 3)
    assert np.isnan(summed.result.data[0])
    np.testing.assert_allclose(summed.result.data[2], 0 + 1 + 2)


def test_absolute_value():
    layers = ResultLayers(result=DataLabel(np.array([-1.0, 2.0]), "x"), layers=[])
    out = reduction.absolute_value_results_layers(layers)
    np.testing.assert_array_equal(out.result.data, [1.0, 2.0])


# ---------------------------------------------------------------------- primitives


def test_gaussian_data_deterministic():
    a = primitives.gaussian_data(16, 10, primitives.Sigmas(5, 0))
    b = primitives.gaussian_data(16, 10, primitives.Sigmas(5, 0))
    np.testing.assert_array_equal(a, b)
    assert a.shape == (160,)
    # RMS-normalized
    np.testing.assert_allclose(np.sqrt(np.mean(a**2)), 1.0, rtol=1e-5)


def test_line_sweep():
    out = primitives.line_sweep(0, 1, 4, 3)
    assert out.shape == (12,)


def test_square_wave_sweeps():
    out = primitives.square_wave_sweep_horizontal(16, 4, 0, 5)
    assert out.shape == (5 * 16,)
    out = primitives.square_wave_sweep_vertical(16, 2, 4, -2, 2)
    assert out.shape == (4 * 16,)
