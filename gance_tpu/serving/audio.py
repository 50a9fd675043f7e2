"""
Audio-reactive ONLINE synthesis: the reference's flagship transform — music
into the latent space of one or more networks with loudness-driven network
switching (music_into_networks.py noise-blend; visualization_inputs.py:94-166)
— behind the serving daemon's HTTP surface.

The server does the L2 signal work host-side exactly as the offline pipeline
does (WAV -> video-locked time stretch -> smoothed/scaled spectrogram alpha-
blended with seeded gaussian noise -> RMS-quantized per-frame network
indices), then rides the DynamicBatcher: the frame stream is split into
contiguous same-network RUNS, each run submitted as its own batcher request
(the online analog of the offline sort-by-index optimization: the batcher's
lanes keep every device batch single-network while runs for different
networks coalesce independently), and the parts reassemble in frame order.

Determinism: the noise source is the reference's seeded gaussian
(primitives.DEFAULT_RANDOM_SEED), so the same WAV + parameters produce the
same frames on every request — cacheable at the HTTP layer.

No reference counterpart for the ONLINE form (the reference renders offline
videos only); the transform itself mirrors gance/visualization_inputs.py:94
and the index semantics of gance/music_into_networks.py.
"""

import base64
import binascii
import time
from typing import Any, Dict, List, NamedTuple, Optional, Sequence, Tuple

import numpy as np

from gance_tpu.utils.logging import LOGGER

DEFAULT_FPS = 30.0
DEFAULT_ALPHA = 0.5
# The offline CLI's spectrogram amplitude range (cli/music_into_networks.py).
DEFAULT_FFT_AMPLITUDE_RANGE = (-10.0, 10.0)


class AudioSynthesisPlan(NamedTuple):
    """The resolved request: what the device will be asked to render."""

    combined: np.ndarray  # (frames, vector_length) float32 z rows
    indices: np.ndarray  # (frames,) int — resolved BATCHER network index per frame
    selected: List[int]  # the request's network palette (batcher indices)
    fps: float
    vector_length: int
    wav_bytes: bytes  # the original audio, for the "avi" response mux


class AudioRequestError(ValueError):
    """Client-side problem with an audio request -> HTTP 400."""


def _float_field(payload: Dict[str, Any], key: str, default: float) -> float:
    """A JSON number field -> float, with bad types as a 400 not a 500."""
    value = payload.get(key, default)
    try:
        return float(value)
    except (TypeError, ValueError) as error:
        raise AudioRequestError(
            f'"{key}" must be a number, got {value!r}'
        ) from error


def _decode_wav(payload: Dict[str, Any]):
    from gance_tpu.audio.io import read_wav_bytes

    encoded = payload.get("wav_base64")
    if not isinstance(encoded, str) or not encoded:
        raise AudioRequestError(
            '"wav_base64" (base64-encoded WAV bytes) is required'
        )
    try:
        raw = base64.b64decode(encoded, validate=True)
    except (binascii.Error, ValueError) as error:
        raise AudioRequestError(f'"wav_base64" is not valid base64: {error}') from error
    try:
        return read_wav_bytes(raw), raw
    except Exception as error:  # scipy raises assorted types on bad content
        raise AudioRequestError(f"could not parse WAV content: {error}") from error


def plan_audio_request(
    payload: Dict[str, Any],
    networks: Sequence[Any],
    selected: Sequence[int],
    frame_cap: int,
) -> AudioSynthesisPlan:
    """
    Resolve a /synthesize_audio body to the frames the device will render.

    ``selected`` is the request's network palette as BATCHER indices (the
    daemon resolves names); quantized RMS indices 0..K-1 map onto it in
    order, the same contract as the offline CLI's sorted network list.
    """
    wav, wav_raw = _decode_wav(payload)
    if wav.wav_data.size == 0:
        raise AudioRequestError("the WAV contains zero samples")

    fps = _float_field(payload, "fps", DEFAULT_FPS)
    if not 0 < fps <= 240:
        raise AudioRequestError(f'"fps" must be in (0, 240], got {fps}')
    alpha = _float_field(payload, "alpha", DEFAULT_ALPHA)
    if not 0.0 <= alpha <= 1.0:
        raise AudioRequestError(f'"alpha" must be in [0, 1], got {alpha}')
    fft_roll = bool(payload.get("fft_roll", False))
    try:
        amplitude_range = tuple(
            float(edge)
            for edge in payload.get(
                "fft_amplitude_range", DEFAULT_FFT_AMPLITUDE_RANGE
            )
        )
        if len(amplitude_range) != 2:
            raise AudioRequestError(
                '"fft_amplitude_range" must be a [low, high] pair'
            )
    except (TypeError, ValueError) as error:
        raise AudioRequestError(
            f'"fft_amplitude_range" must be a [low, high] pair: {error}'
        ) from error

    # Frame-cap BEFORE the time stretch: the polyphase resample over a big
    # request would burn minutes of CPU and GBs of float64 intermediates
    # before an after-the-fact cap could reject it. FPS mode pins
    # frames ~= duration x fps, so the estimate is within rounding of the
    # exact post-stretch count (which is still enforced below).
    estimated_frames = (
        wav.wav_data.shape[0] / float(wav.sample_rate)
    ) * fps  # samples are axis 0 for mono and multi-channel alike
    if estimated_frames > frame_cap * 1.05 + 2:
        raise AudioRequestError(
            f"~{int(estimated_frames)} frames at {fps:g} fps exceeds the "
            f"per-request cap of {frame_cap}; send a shorter clip or lower fps"
        )

    if not selected:
        raise AudioRequestError("no live networks to synthesize with")
    palette_networks = [networks[index] for index in selected]
    if any(network is None for network in palette_networks):
        # a concurrent /admin/unload freed a palette slot after resolution;
        # the batcher's locked check is the authoritative gate — fail 400 here
        raise AudioRequestError("a palette network has been unloaded")
    vector_lengths = {
        int(network.expected_vector_length) for network in palette_networks
    }
    if len(vector_lengths) != 1:
        raise AudioRequestError(
            "selected networks disagree on latent length "
            f"({sorted(vector_lengths)}); pick a same-architecture palette"
        )
    resolutions = {
        int(getattr(network, "resolution", 0)) for network in palette_networks
    }
    if len(resolutions) != 1:
        raise AudioRequestError(
            f"selected networks disagree on resolution ({sorted(resolutions)}); "
            "frames of one response must share a shape"
        )
    vector_length = next(iter(vector_lengths))

    from gance_tpu.audio.io import read_wavs_scale_for_video
    from gance_tpu.synthesis.inputs import alpha_blend_vectors_max_rms_power_audio

    scaled = read_wavs_scale_for_video(
        [wav], vector_length=vector_length, frames_per_second=fps
    )
    frames = scaled.wav_data.shape[0] // vector_length
    if frames < 1:
        raise AudioRequestError("audio is too short for even one frame")
    if frames > frame_cap:
        raise AudioRequestError(
            f"{frames} frames at {fps:g} fps exceeds the per-request cap of "
            f"{frame_cap}; send a shorter clip or lower fps"
        )

    try:
        # Pin the feature pipeline's jitted DSP to the HOST CPU backend: the
        # arrays are tiny (seconds of audio), but on an accelerator backend
        # each new clip-length shape would trigger a device compile — minutes
        # over a remote-compile TPU link, measured as the difference between
        # a ~1s and a never-finishing first request. The accelerator is for
        # synthesis; request planning is host math.
        import jax

        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            visualization_input = alpha_blend_vectors_max_rms_power_audio(
                alpha=alpha,
                fft_roll_enabled=fft_roll,
                fft_amplitude_range=amplitude_range,
                time_series_audio_vectors=scaled.wav_data,
                vector_length=vector_length,
                network_indices=list(range(len(selected))),
            )
    except ValueError as error:
        # the RMS/smoothing pipeline needs a minimum series length (savgol
        # window 7 over the 512-sample-hop RMS frames) — same constraint as
        # the offline pipeline, surfaced as a client error here
        raise AudioRequestError(
            f"clip too short for the audio feature pipeline: {error}"
        ) from error
    combined = np.asarray(
        visualization_input.combined.data, np.float32
    ).reshape(-1, vector_length)
    quantized = np.asarray(
        visualization_input.network_indices.result.data, np.int64
    )
    # The RMS reducer frames audio at the librosa hop (512), so for
    # vector lengths != 512 the index series and the frame series disagree
    # slightly in length; the offline orchestration's rule is min-count +
    # clip (synthesis/orchestration.py) — same here.
    count = min(combined.shape[0], quantized.shape[0])
    if count < 1:
        raise AudioRequestError("audio is too short for even one frame")
    combined = combined[:count]
    palette = np.asarray(list(selected), dtype=np.int64)
    indices = palette[np.clip(quantized[:count], 0, len(selected) - 1)]
    return AudioSynthesisPlan(
        combined=combined,
        indices=indices,
        selected=list(selected),
        fps=fps,
        vector_length=vector_length,
        wav_bytes=wav_raw,
    )


def encode_music_video(
    images: np.ndarray, wav_bytes: bytes, fps: float
) -> bytes:
    """
    Frames + the ORIGINAL audio -> one playable video file (bytes): the
    complete reference deliverable (music_into_networks writes exactly this —
    frames at fps with the source WAVs muxed in) produced server-side for a
    single request. Uses the same writer + mux stack as the offline CLIs
    (ffmpeg when present, the native MJPEG+PCM AVI muxer otherwise). FPS mode
    locked the frame count to the clip duration, so the original audio lines
    up with the frames by construction.
    """
    import tempfile
    from pathlib import Path

    from gance_tpu.media.video import write_source_to_disk_consume

    with tempfile.TemporaryDirectory() as tmp:
        wav_path = Path(tmp) / "audio.wav"
        wav_path.write_bytes(wav_bytes)
        video_path = Path(tmp) / "clip.avi"
        write_source_to_disk_consume(
            iter(list(images)), video_path, video_fps=float(fps),
            audio_paths=[wav_path],
        )
        if list(Path(tmp).glob("clip.audio*.wav")):
            # the mux stack's last-resort fallback (no ffmpeg AND no native
            # muxer) writes the audio as a sidecar — a silent video would
            # break this endpoint's contract, so fail loudly instead
            raise RuntimeError(
                "no audio muxer available on this host (ffmpeg or the native "
                "AVI muxer) — cannot honor format='avi'"
            )
        return video_path.read_bytes()


def _network_groups(indices: np.ndarray) -> List[Tuple[int, np.ndarray]]:
    """Frame stream -> one (network_index, frame_positions) group per
    DISTINCT network, first-appearance order. Grouping (rather than
    contiguous runs) is the online form of the offline sort-by-index
    optimization: loudness hovering at a quantization midpoint alternates
    the index frame-to-frame, and per-run submission would turn that into
    one padded device dispatch per frame (~12% occupancy); grouping keeps
    each network's frames in as few full batches as possible, and the
    caller scatters results back to frame order."""
    groups: List[Tuple[int, np.ndarray]] = []
    seen: List[int] = []
    for index in indices.tolist():
        if index not in seen:
            seen.append(index)
    for index in seen:
        groups.append((int(index), np.flatnonzero(indices == index)))
    return groups


def synthesize_plan(
    batcher: Any,
    plan: AudioSynthesisPlan,
    timeout_s: Optional[float] = None,
) -> np.ndarray:
    """
    Render the plan through the batcher and return (frames, H, W, 3) uint8 in
    frame order. Per-network groups are submitted up front (they interleave
    with other traffic at the batcher's discretion), then collected against
    one shared deadline and scattered back to frame order.
    """
    groups = _network_groups(plan.indices)
    futures = []
    try:
        for network_index, positions in groups:
            futures.append(
                batcher.submit(
                    plan.combined[positions], network_index=network_index
                )
            )
        deadline = None if timeout_s is None else time.monotonic() + timeout_s
        parts = []
        for future in futures:
            remaining = (
                None if deadline is None else max(0.0, deadline - time.monotonic())
            )
            parts.append(future.result(timeout=remaining))
    except BaseException:
        # a failed submit or collect must not strand sibling groups' rows
        for future in futures:
            future.cancel()
        raise
    out = np.empty(
        (len(plan.indices),) + parts[0].shape[1:], dtype=parts[0].dtype
    )
    for (_index, positions), part in zip(groups, parts):
        out[positions] = part
    LOGGER.info(
        "audio synthesis: %d frames over %d network group(s)",
        len(plan.indices), len(groups),
    )
    return out
