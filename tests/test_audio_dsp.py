"""
DSP primitive exactness tests: each jitted primitive against its host-library oracle
(scipy / sklearn / pandas-equivalent formulas), plus the reference's golden audio
value (claps.wav RMS — test_dynamic_model_switching.py:38).
"""

from pathlib import Path

import numpy as np
import pytest
import scipy.ndimage
import scipy.signal

from gance_tpu.audio import dsp

CLAPS = Path("/root/reference/test/assets/claps.wav")


@pytest.mark.parametrize("n,num", [(255, 512), (512, 255), (100, 100), (33, 64), (64, 33)])
def test_fourier_resample_matches_scipy(rng, n, num):
    x = rng.randn(4, n).astype(np.float32)
    got = np.asarray(dsp.fourier_resample(x, num, axis=-1))
    want = scipy.signal.resample(x, num, axis=-1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("w,p,n", [(7, 3, 50), (5, 3, 20), (3, 2, 9), (7, 3, 7), (51, 2, 512)])
def test_savgol_matches_scipy(rng, w, p, n):
    x = rng.randn(3, n).astype(np.float32)
    got = np.asarray(dsp.savgol_smooth(x, w, p, axis=-1))
    want = scipy.signal.savgol_filter(x, w, p, axis=-1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_savgol_axis0(rng):
    x = rng.randn(20, 6).astype(np.float32)
    got = np.asarray(dsp.savgol_smooth(x, 7, 3, axis=0))
    want = scipy.signal.savgol_filter(x, 7, 3, axis=0)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_minmax_scale_matches_sklearn(rng):
    from sklearn.preprocessing import minmax_scale as sk_minmax

    x = rng.randn(100).astype(np.float32)
    got = np.asarray(dsp.minmax_scale(x, feature_range=(-4.0, 4.0)))
    want = sk_minmax(x, feature_range=(-4, 4))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_minmax_scale_constant():
    x = np.full((10,), 3.0, np.float32)
    got = np.asarray(dsp.minmax_scale(x, feature_range=(-1.0, 1.0)))
    np.testing.assert_allclose(got, -1.0)


def test_rolling_mean_matches_pandas(rng):
    import pandas as pd

    x = rng.randn(50)
    got = np.asarray(dsp.rolling_mean(x, 3))
    want = pd.Series(x).rolling(3).mean().to_numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6, equal_nan=True)


def test_rms_frames_basic():
    x = np.concatenate([np.ones(512), np.zeros(512)]).astype(np.float32)
    got = np.asarray(dsp.rms_frames(x, frame_length=512, hop_length=512))
    np.testing.assert_allclose(got, [1.0, 0.0], atol=1e-6)


def test_rms_frames_hop_default(rng):
    # librosa default hop 512 with frame_length 1024 -> overlapping frames
    x = rng.randn(4096).astype(np.float32)
    got = np.asarray(dsp.rms_frames(x, frame_length=1024))
    assert got.shape[0] == 1 + (4096 - 1024) // 512
    want0 = np.sqrt(np.mean(x[:1024] ** 2))
    np.testing.assert_allclose(got[0], want0, rtol=1e-5)


@pytest.mark.parametrize("size", [3, 4, 7])
def test_maximum_filter1d_matches_scipy(rng, size):
    x = rng.randn(40).astype(np.float32)
    got = np.asarray(dsp.maximum_filter1d(x, size=size))
    want = scipy.ndimage.maximum_filter1d(x, size=size)
    np.testing.assert_allclose(got, want)


def test_rotate_vectors_matches_np_roll(rng):
    data = rng.randn(5, 8).astype(np.float32)
    rolls = np.array([1, 0, 2, 1, 3])
    got = np.asarray(dsp.rotate_vectors_over_time(data, rolls))
    cum = np.cumsum(rolls)
    want = np.stack([np.roll(v, -int(r)) for v, r in zip(data, cum)])
    np.testing.assert_array_equal(got, want)


def test_claps_golden_rms():
    """
    The reference's golden scalar (test_dynamic_model_switching.py:38): RMS of the
    first 1000-sample frame of claps.wav scaled for 60fps video == 0.00298562.
    Tolerance 1e-3 relative: the time-stretch resampler differs (scipy polyphase vs
    resampy Kaiser sinc) — measured divergence is ~7e-5.
    """
    from gance_tpu.audio.io import read_wavs_scale_for_video
    from gance_tpu.audio.reduction import reduce_vector_rms_rolling_max
    from gance_tpu.audio.vectors import sub_vectors

    audio = read_wavs_scale_for_video(
        wavs=[CLAPS], vector_length=1000, frames_per_second=60.0
    ).wav_data
    vec = sub_vectors(audio, 1000)[0]
    reduced = reduce_vector_rms_rolling_max(vec, 1000)
    assert reduced.result.data.shape[0] == 1
    assert np.isclose(reduced.result.data[0], 0.00298562, rtol=1e-3)


def test_read_wavs_length_contract():
    from gance_tpu.audio.io import read_wavs_scale_for_video

    out = read_wavs_scale_for_video(wavs=[CLAPS], vector_length=512, frames_per_second=30.0)
    assert out.wav_data.shape[0] % 512 == 0
    # target mode locks the vector count exactly (after padding)
    out = read_wavs_scale_for_video(wavs=[CLAPS], vector_length=512, target_num_vectors=100)
    assert out.wav_data.shape[0] == 100 * 512


def test_read_wavs_cache(tmp_path):
    from gance_tpu.audio.io import read_wavs_scale_for_video

    cache = tmp_path / "audio_cache.p"
    first = read_wavs_scale_for_video(
        wavs=[CLAPS], vector_length=512, frames_per_second=30.0, cache_path=cache
    )
    assert cache.exists()
    second = read_wavs_scale_for_video(
        wavs=[CLAPS], vector_length=512, frames_per_second=30.0, cache_path=cache
    )
    np.testing.assert_array_equal(first.wav_data, second.wav_data)


def test_read_wavs_mode_errors():
    from gance_tpu.audio.io import read_wavs_scale_for_video

    with pytest.raises(ValueError):
        read_wavs_scale_for_video(wavs=[CLAPS], vector_length=512)
    with pytest.raises(ValueError):
        read_wavs_scale_for_video(
            wavs=[CLAPS], vector_length=512, frames_per_second=30.0, target_num_vectors=10
        )


def test_rotate_truncates_on_count_mismatch(rng):
    """Reference zip semantics: mismatched roll/vector counts truncate the output
    (happens whenever vector_length != 512 because of librosa's fixed 512 hop)."""
    data = rng.randn(7, 16).astype(np.float32)
    rolls = np.ones(51, dtype=int)
    out = np.asarray(dsp.rotate_vectors_over_time(data, rolls))
    assert out.shape == (7, 16)
    rolls_short = np.ones(3, dtype=int)
    out = np.asarray(dsp.rotate_vectors_over_time(data, rolls_short))
    assert out.shape == (3, 16)
    np.testing.assert_array_equal(out[0], np.roll(data[0], -1))
