"""
noise_blend — audio → spectrogram-vs-noise alpha blend → batched synthesis → video
(reference music_into_networks.py:285-401).
"""

from pathlib import Path
from typing import List, Optional, Tuple

import more_itertools
import numpy as np

from gance_tpu.audio.io import read_wavs_scale_for_video
from gance_tpu.media.images import horizontal_concat_images
from gance_tpu.media.video import (
    resize_source,
    write_source_to_disk_consume,
    write_source_to_disk_forward,
)
from gance_tpu.synthesis.inputs import alpha_blend_vectors_max_rms_power_audio
from gance_tpu.synthesis.orchestration import vector_synthesis
from gance_tpu.synthesis.runtime import MultiNetwork
from gance_tpu.utils.logging import LOGGER


def _build_mesh(data_parallel: Optional[int]):
    """('data','model') mesh for multi-chip serving, or None for single-device."""
    if data_parallel is None:
        return None
    import jax

    from gance_tpu.parallel.mesh import create_mesh

    if len(jax.devices()) < 2:
        LOGGER.warning(
            "--data-parallel requested but only one device is visible; "
            "running single-device."
        )
        return None
    return create_mesh(data_parallel=data_parallel)


def _check_network_parallel(requested: bool, network_paths: List[Path]) -> bool:
    """Network-parallel serving needs >= one device per network; degrade loudly."""
    if not requested:
        return False
    import jax

    if len(jax.devices()) < len(network_paths):
        LOGGER.warning(
            "--network-parallel requested but %d networks > %d devices; "
            "running the default resident-network path.",
            len(network_paths), len(jax.devices()),
        )
        return False
    return True


def _resolve_placement(
    data_parallel: Optional[int],
    device_per_network: bool,
    network_parallel: bool,
    network_paths: List[Path],
):
    """
    One placement flag at a time — conflicting flags ERROR (the CLI help
    promises mutual exclusion; silently picking one would serve a different
    mode than the user asked for). Insufficient-device cases degrade loudly
    to the default resident-network path instead.
    """
    if sum([data_parallel is not None, device_per_network, network_parallel]) > 1:
        raise ValueError(
            "--data-parallel, --one-network-per-device, and --network-parallel "
            "are mutually exclusive"
        )
    import jax

    if (
        data_parallel is None
        and not device_per_network
        and not network_parallel
        and jax.process_count() > 1
    ):
        # Multi-host with no placement flag would have every host redundantly
        # synthesize the full frame stream on its own chips; default to pure
        # DP over all global devices (frames are independent — DP is always
        # right), mirroring the projection CLI's multi-host default.
        from gance_tpu.parallel.mesh import create_mesh

        LOGGER.info(
            "Multi-host render: defaulting to pure data parallelism over all "
            "%d global devices.", len(jax.devices()),
        )
        return create_mesh(), False, False
    mesh = _build_mesh(data_parallel)
    return mesh, device_per_network, _check_network_parallel(
        network_parallel, network_paths
    )


def noise_blend_api(
    wav: List[Path],
    output_path: Path,
    network_paths: List[Path],
    frames_to_visualize: Optional[int],
    output_fps: float,
    output_side_length: int,
    debug_path: Optional[Path],
    debug_window: Optional[int],
    debug_side_length: Optional[int],
    alpha: float,
    fft_roll_enabled: bool,
    fft_amplitude_range: Tuple[float, float],
    cache_path: Optional[Path] = None,
    compute_dtype: Optional[str] = None,
    trace_dir: Optional[Path] = None,
    debug_3d: bool = False,
    data_parallel: Optional[int] = None,
    device_per_network: bool = False,
    network_parallel: bool = False,
    resumable: bool = False,
    resume_chunk_frames: int = 300,
) -> None:
    """
    Render a music video: audio features alpha-blended with smoothed gaussian noise,
    network per frame selected by quantized RMS loudness.

    :param resumable: checkpoint the render every `resume_chunk_frames` frames
        (media/resume.py): a killed run resumes from the durable frame count —
        the input arrays are sliced there, so finished frames are never
        re-synthesized — and the final output (with audio) is identical to an
        uninterrupted run. Requires debug_path=None (the debug tile stream has
        no resume story). The reference cannot resume synthesis (SURVEY §5).
    """
    create_debug_visualization = debug_path is not None
    audio_paths = [Path(p) for p in wav]
    if resumable and create_debug_visualization:
        raise ValueError("--resumable does not support the debug visualization video")
    if resumable:
        import jax

        if jax.process_count() > 1:
            # The multi-host writer gating lives in write_source_to_disk_forward;
            # write_source_resumable has no coordinator story — every process
            # would race the same manifest on a shared filesystem.
            raise ValueError(
                "--resumable is single-process only; combine it with "
                "single-host rendering or drop --dist-*"
            )

    import contextlib

    import jax.numpy as jnp

    from gance_tpu.utils.profiling import trace

    dtype = {None: None, "float32": jnp.float32, "bfloat16": jnp.bfloat16}[compute_dtype]
    trace_ctx = trace(Path(trace_dir)) if trace_dir else contextlib.nullcontext()
    mesh, device_per_network, network_parallel = _resolve_placement(
        data_parallel, device_per_network, network_parallel, network_paths
    )

    # Output scaling is fused into the jitted synthesis program (device-side
    # bicubic) so host egress moves output-sized frames, not native-res ones.
    with trace_ctx, MultiNetwork(
        network_paths=network_paths,
        output_side_length=output_side_length,
        mesh=mesh,
        device_per_network=device_per_network,
        network_parallel=network_parallel,
        **({"compute_dtype": dtype} if dtype is not None else {}),
    ) as multi_networks:
        audio = read_wavs_scale_for_video(
            wavs=audio_paths,
            vector_length=multi_networks.expected_vector_length,
            frames_per_second=output_fps,
            cache_path=cache_path,
        ).wav_data

        viz_input = alpha_blend_vectors_max_rms_power_audio(
            alpha=alpha,
            fft_roll_enabled=fft_roll_enabled,
            fft_amplitude_range=fft_amplitude_range,
            time_series_audio_vectors=audio,
            vector_length=multi_networks.expected_vector_length,
            network_indices=multi_networks.network_indices,
        )

        if resumable:
            from gance_tpu.media.resume import (
                durable_frames,
                file_identity,
                write_source_resumable,
            )
            from gance_tpu.synthesis.inputs import slice_visualization_input

            total_frames = len(np.asarray(viz_input.network_indices.result.data))
            if frames_to_visualize is not None:
                total_frames = min(total_frames, frames_to_visualize)
            fingerprint = {
                "pipeline": "noise_blend",
                "wavs": [file_identity(p) for p in audio_paths],
                "networks": [file_identity(p) for p in network_paths],
                "alpha": alpha,
                "fft_roll_enabled": bool(fft_roll_enabled),
                "fft_amplitude_range": list(fft_amplitude_range),
                "output_fps": float(output_fps),
                "output_side_length": int(output_side_length),
                "frames_to_visualize": frames_to_visualize,
                "compute_dtype": compute_dtype,
            }
            start = durable_frames(Path(output_path), fingerprint)
            if start:
                LOGGER.info(
                    "Resuming noise_blend at frame %d/%d", start, total_frames
                )
            synthesis_output = vector_synthesis(
                networks=multi_networks,
                data=slice_visualization_input(viz_input, start),
                frames_to_visualize=total_frames - start,
            )
            write_source_resumable(
                source=synthesis_output.synthesized_images,
                output_path=Path(output_path),
                video_fps=output_fps,
                fingerprint=fingerprint,
                audio_paths=audio_paths,
                chunk_frames=resume_chunk_frames,
            )
            LOGGER.info("noise_blend complete: %s", output_path)
            return

        visualizer = None
        if create_debug_visualization:
            from gance_tpu.viz.panels import synthesis_visualizer

            visualizer = synthesis_visualizer(
                side_length=debug_side_length,
                waterfall_vectors=viz_input.combined if debug_3d else None,
            )

        synthesis_output = vector_synthesis(
            networks=multi_networks,
            data=viz_input,
            frames_to_visualize=frames_to_visualize,
            visualizer=visualizer,
        )

        from gance_tpu.utils.profiling import timed_iterator

        hero_frames = timed_iterator(
            "encode",
            write_source_to_disk_forward(
                source=synthesis_output.synthesized_images,  # already output-sized
                video_path=Path(output_path),
                video_fps=output_fps,
                audio_paths=audio_paths,
                high_quality=True,
            ),
        )

        if create_debug_visualization:
            write_source_to_disk_consume(
                source=(
                    horizontal_concat_images([hero, viz])
                    for hero, viz in zip(
                        resize_source(hero_frames, (debug_side_length, debug_side_length)),
                        synthesis_output.visualization_images,
                    )
                ),
                video_path=Path(debug_path),
                video_fps=output_fps,
                audio_paths=audio_paths,
            )
        else:
            more_itertools.consume(hero_frames)

    LOGGER.info("noise_blend complete: %s", output_path)
