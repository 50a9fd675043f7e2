"""
Audio/feature layer — the reference's L2 (SURVEY.md §2.3: gance/vector_sources/ +
apply_spectrogram.py) rebuilt as jitted JAX DSP over static shapes.

Design split:
  * the heavy vector chain (spectrogram, Fourier per-vector resample, savgol
    smoothing, minmax scaling, FFT roll, alpha blends) runs on-device as one jitted
    graph per song (shapes are static once the audio is length-locked);
  * scalar per-frame analytics (RMS reducers, gzip complexity, spline derivatives)
    stay host-side — they produce O(frames) scalars, not O(frames x 512) data, and
    two of them (zlib byte counts, smoothing splines) are inherently host ops.
"""

from gance_tpu.audio.io import WavFileProperties, read_wav_file, read_wavs_scale_for_video
from gance_tpu.audio.spectrogram import (
    compute_spectrogram,
    compute_spectrogram_smooth_scale,
    reshape_spectrogram_to_vectors,
)

__all__ = [
    "WavFileProperties",
    "read_wav_file",
    "read_wavs_scale_for_video",
    "compute_spectrogram",
    "compute_spectrogram_smooth_scale",
    "reshape_spectrogram_to_vectors",
]
