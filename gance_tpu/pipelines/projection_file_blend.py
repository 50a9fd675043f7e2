"""
projection_file_blend — the flagship pipeline (reference
gance/projection_file_blend.py:56-343; produced the Won Pound album video).

Audio spectrogram alpha-blended into the first `blend_depth` style rows of a
projection file's final latents, batched synthesis with loudness-driven network
switching, optional eye-tracked overlay of the projection targets gated by
bbox/phash distance + track-length filtering + (optionally) a music-complexity
mask, muxed with the audio track; optional many-tile debug video.
"""

import logging
import os
from itertools import tee
from pathlib import Path
from typing import Iterator, List, Optional, Tuple

import more_itertools
import numpy as np

from gance_tpu.audio import reduction as vector_reduction
from gance_tpu.audio.io import read_wavs_scale_for_video
from gance_tpu.audio.vectors import underlying_length
from gance_tpu.media.disk_tee import NPY_SERIALIZER, iterator_on_disk
from gance_tpu.media.images import horizontal_concat_images
from gance_tpu.media.video import (
    scale_square_source_duplicate,
    write_source_to_disk_consume,
    write_source_to_disk_forward,
)
from gance_tpu.media.resume import file_identity as resume_file_identity
from gance_tpu.overlay.common import BoundingBox, write_boxes_onto_image
from gance_tpu.overlay.eye_tracking import compute_eye_tracking_overlay
from gance_tpu.projection import file_reader as projection_file_reader
from gance_tpu.synthesis.inputs import alpha_blend_projection_file
from gance_tpu.synthesis.orchestration import vector_synthesis
from gance_tpu.synthesis.runtime import MultiNetwork
from gance_tpu.types import ResultLayers
from gance_tpu.utils.divisor import divide_no_remainder
from gance_tpu.utils.logging import LOGGER


def _overlay_decisions_path(output_path: Path) -> Path:
    return output_path.with_name(output_path.name + ".overlay.jsonl")


def _load_overlay_decisions(path: Path, fingerprint: dict) -> List[Optional[List[BoundingBox]]]:
    """
    Per-frame overlay decisions checkpointed by a previous resumable run
    (detection at ~126 ms/frame is the flagship's host bottleneck — worth far
    more than the 5 ms synthesis to not repeat). First line pins the render
    fingerprint; a mismatch discards the cache (stale thresholds would change
    decisions).
    """
    import json

    if not path.exists():
        return []
    lines = path.read_text().splitlines()
    if not lines:
        return []
    try:
        header = json.loads(lines[0])
    except json.JSONDecodeError:
        # Killed while writing the header itself: nothing usable.
        LOGGER.warning("%s has a torn header; recomputing overlay decisions.", path)
        path.unlink()
        return []
    if header.get("fingerprint") != fingerprint:
        LOGGER.warning(
            "%s was written by a render with different parameters; "
            "recomputing overlay decisions.", path
        )
        path.unlink()
        return []
    decisions: List[Optional[List[BoundingBox]]] = []
    for index, line in enumerate(lines[1:]):
        try:
            record = json.loads(line)
        except json.JSONDecodeError:
            if index == len(lines) - 2:
                # A kill -9 mid-flush leaves a torn FINAL line; every earlier
                # line was followed by a flushed newline, so the prefix is
                # intact — drop the tail record and recompute it. Truncate it
                # out of the file too: it has no trailing newline, so a later
                # append would otherwise weld onto the torn bytes.
                LOGGER.warning(
                    "%s ends in a torn line (crash mid-write); dropping the "
                    "final record and resuming from %d cached decisions.",
                    path, len(decisions),
                )
                tmp = path.with_name(path.name + ".tmp")
                tmp.write_text("\n".join(lines[:-1]) + "\n", encoding="utf-8")
                os.replace(tmp, path)
                break
            # Torn line in the MIDDLE means the file is corrupt beyond the
            # crash model (disk error, concurrent writer): recompute all.
            LOGGER.warning(
                "%s is corrupt at record %d; recomputing overlay decisions.",
                path, index,
            )
            path.unlink()
            return []
        boxes = record["boxes"]
        decisions.append(
            None if boxes is None else [BoundingBox(*box) for box in boxes]
        )
    return decisions


def _checkpoint_decisions(
    path: Path, fingerprint: dict, start_index: int, decisions: Iterator
) -> Iterator:
    """Append each newly computed decision to the jsonl as it streams through."""
    import json
    import time

    # Test seam (like GANCE_TPU_RESUME_CHUNK_DELAY): widen the per-decision
    # window so a kill -9 lands mid-DETECTION deterministically in tests.
    delay = float(os.environ.get("GANCE_TPU_RESUME_DECISION_DELAY", "0") or 0)

    if start_index == 0 or not path.exists():
        header = json.dumps({"fingerprint": fingerprint})
        path.write_text(header + "\n")
    with path.open("a", encoding="utf-8") as handle:
        for boxes in decisions:
            if delay:
                time.sleep(delay)
            handle.write(
                json.dumps(
                    {"boxes": None if boxes is None else [list(b) for b in boxes]}
                )
                + "\n"
            )
            handle.flush()
            yield boxes


def _resumable_blend(  # pylint: disable=too-many-locals
    *,
    reader,
    viz_input,
    multi_networks,
    output_path: Path,
    output_fps: float,
    output_side_length: int,
    frame_multiplier: int,
    num_output_frames: int,
    frames_to_visualize: Optional[int],
    audio_paths: List[Path],
    time_series_audio_vectors: np.ndarray,
    overlay_enabled: bool,
    overlay_music_mask_enabled: bool,
    complexity_change_rolling_sum_window: Optional[int],
    complexity_change_threshold: Optional[float],
    phash_distance: Optional[int],
    bbox_distance: Optional[float],
    track_length: Optional[int],
    overlay_detection_side: Optional[int],
    overlay_smoothing: int,
    resume_chunk_frames: int,
    fingerprint: dict,
) -> None:
    """
    The flagship render with frame-indexed checkpoint/resume: hero frames land
    in finished chunks (media/resume.py), and the per-frame eye-tracking
    decisions land in a jsonl sidecar as they are computed — so a killed run
    resumes synthesis at the durable frame count AND detection at the decided
    frame count. The output equals an uninterrupted run's because every stage
    is deterministic and the track-length filter always sees the decision set
    for ALL frames (cached prefix + freshly computed tail).
    """
    from itertools import islice

    from gance_tpu.media.resume import durable_frames, write_source_resumable
    from gance_tpu.synthesis.inputs import slice_visualization_input

    total = (
        num_output_frames
        if frames_to_visualize is None
        else min(num_output_frames, frames_to_visualize)
    )
    start = durable_frames(output_path, fingerprint)
    decisions_path = _overlay_decisions_path(output_path)
    cached: List[Optional[List[BoundingBox]]] = (
        _load_overlay_decisions(decisions_path, fingerprint)[:total]
        if overlay_enabled
        else []
    )
    done = len(cached)
    if start:
        LOGGER.info(
            "Resuming projection_file_blend at frame %d/%d (%d overlay "
            "decisions cached)", start, total, done,
        )

    # Temporal smoothing needs a `warm`-frame detection replay before frame
    # `done` to rebuild its trailing box history (see the comment at the
    # compute_eye_tracking_overlay call below).
    warm = (
        min(done, overlay_smoothing)
        if overlay_smoothing and overlay_smoothing > 1
        else 0
    )
    detect_from = done - warm
    # Compose needs synthesized frames [start, total); detection needs
    # [detect_from, total). Chunks are only written after ALL decisions are
    # durable, so start > 0 implies done == total; min() is belt-and-braces.
    synth_from = (
        start if (not overlay_enabled or done >= total) else min(start, detect_from)
    )
    synthesis_output = vector_synthesis(
        networks=multi_networks,
        data=slice_visualization_input(viz_input, synth_from),
        frames_to_visualize=total - synth_from,
        unload_networks_when_complete=True,
    )
    background_scaled = scale_square_source_duplicate(
        source=synthesis_output.synthesized_images,
        output_side_length=output_side_length,
    )

    def scaled_targets() -> "Iterator[np.ndarray]":
        # reader.target_images returns a FRESH lazy iterator per access, so
        # detection and compose each take their own (no disk tee needed)
        return scale_square_source_duplicate(
            source=reader.target_images,
            output_side_length=output_side_length,
            frame_multiplier=frame_multiplier,
        )

    if overlay_enabled:
        if overlay_music_mask_enabled:
            mask = vector_reduction.music_complexity_mask(
                time_series_audio_vectors=time_series_audio_vectors,
                vector_length=multi_networks.expected_vector_length,
                rolling_sum_window=complexity_change_rolling_sum_window,
            )
            mask_data = np.asarray(mask.result.data, dtype=float)
            mask_data = np.where(np.isnan(mask_data), np.inf, mask_data)
            skip_mask: List[bool] = list(mask_data > complexity_change_threshold)
        else:
            skip_mask = [False] * num_output_frames

        if done < total:
            # Temporal smoothing carries a trailing `overlay_smoothing`-frame
            # deque of raw eye boxes across frames; resuming detection at
            # frame `done` with an empty deque would gate frames done..done+N
            # on unsmoothed geometry and break the "output equals an
            # uninterrupted run" contract. The deque's state at frame `done`
            # is a pure function of the last `overlay_smoothing` frames' raw
            # detections (maxlen window + resets that only look one frame
            # back), so replaying detection over exactly those frames — and
            # discarding the re-emitted decisions, which are already durable
            # in the sidecar — rebuilds it bit-exactly.
            # synthesized frames feed detection AND compose: disk-tee them.
            # Targets likewise: detection fully materializes before compose
            # starts (the track filter needs every decision), so compose's
            # replay copy is always on the tee disk by the time it's pulled —
            # one HDF5 read + gzip decompress + scale per frame instead of two
            # (measured 0.24 s/frame at 1024px on one core, the bulk of the
            # compose stage's busy time in the r4 e2e bench).
            background_iterators = iterator_on_disk(
                iterator=background_scaled, copies=1, serializer=NPY_SERIALIZER
            )
            target_iterators = iterator_on_disk(
                iterator=scaled_targets(), copies=1, serializer=NPY_SERIALIZER
            )
            overlay_results = compute_eye_tracking_overlay(
                foreground_images=islice(target_iterators[0], detect_from, None),
                background_images=islice(
                    background_iterators[0], detect_from - synth_from, None
                ),
                min_phash_distance=phash_distance,
                min_bbox_distance=bbox_distance,
                skip_mask=skip_mask[detect_from:],
                detection_side=overlay_detection_side,
                temporal_smoothing=overlay_smoothing,
                # the resumable path never reads contexts; without this the
                # tee buffers one result per frame for the whole render
                want_contexts=False,
            )
            boxes_stream = overlay_results.bbox_lists
            for _ in range(warm):
                next(boxes_stream)  # warm-up frames: already in the sidecar
            # materialize (the track filter needs every decision), streaming
            # each new decision into the sidecar as it is computed
            new_boxes = list(
                _checkpoint_decisions(
                    decisions_path, fingerprint, done, boxes_stream
                )
            )
            all_boxes = cached + new_boxes
            background_for_compose = islice(
                background_iterators[1], start - synth_from, None
            )
            foreground_for_compose = islice(target_iterators[1], start, None)
        else:
            all_boxes = cached
            background_for_compose = background_scaled  # starts at start already
            foreground_for_compose = islice(scaled_targets(), start, None)

        long_tracks_mask = vector_reduction.track_length_filter(
            bool_tracks=np.asarray(
                [
                    (not skip) and (box is not None)
                    for skip, box in zip(skip_mask, all_boxes)
                ]
            ),
            track_length=track_length,
        )

        def compose() -> "Iterator[np.ndarray]":
            for boxes, foreground, background, in_long_track in zip(
                all_boxes[start:],
                foreground_for_compose,
                background_for_compose,
                list(long_tracks_mask)[start:],
            ):
                yield (
                    write_boxes_onto_image(
                        foreground_image=foreground,
                        background_image=background,
                        bounding_boxes=boxes,
                    )
                    if in_long_track
                    else background
                )

        blended = compose()
    else:
        blended = background_for_compose = background_scaled

    write_source_resumable(
        source=blended,
        output_path=output_path,
        video_fps=output_fps,
        fingerprint=fingerprint,
        audio_paths=audio_paths,
        chunk_frames=resume_chunk_frames,
    )
    if overlay_enabled:
        decisions_path.unlink(missing_ok=True)


def projection_file_blend_api(  # pylint: disable=too-many-locals,too-many-branches
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
    projection_file_path: Path,
    blend_depth: int,
    compute_dtype: Optional[str] = None,
    trace_dir: Optional[Path] = None,
    debug_3d: bool = False,
    data_parallel: Optional[int] = None,
    device_per_network: bool = False,
    network_parallel: bool = False,
    complexity_change_rolling_sum_window: Optional[int] = None,
    complexity_change_threshold: Optional[float] = None,
    phash_distance: Optional[int] = None,
    bbox_distance: Optional[float] = None,
    track_length: Optional[int] = None,
    overlay_detection_side: Optional[int] = None,
    overlay_smoothing: int = 0,
    resumable: bool = False,
    resume_chunk_frames: int = 300,
) -> None:
    """
    See module docstring; parameter meanings match the reference CLI help.

    :param resumable: checkpoint the render every `resume_chunk_frames` frames
        plus the per-frame overlay decisions (media/resume.py): a killed run
        resumes from the durable frame count — inputs are sliced there, and
        already-computed eye-tracking decisions are replayed from the sidecar
        instead of re-detected — and the final output (with audio) equals an
        uninterrupted run's. Requires debug_path=None.
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

    overlay_enabled = all(
        p is not None for p in (phash_distance, bbox_distance, track_length)
    )
    overlay_music_mask_enabled = all(
        p is not None
        for p in (complexity_change_rolling_sum_window, complexity_change_threshold)
    )
    if overlay_music_mask_enabled and not overlay_enabled:
        raise ValueError("Overlay music mask without overlay being enabled is not supported!")

    import contextlib

    import jax.numpy as jnp

    from gance_tpu.utils.profiling import trace

    dtype = {None: None, "float32": jnp.float32, "bfloat16": jnp.bfloat16}[compute_dtype]
    trace_ctx = trace(Path(trace_dir)) if trace_dir else contextlib.nullcontext()

    from gance_tpu.pipelines.noise_blend import _resolve_placement

    mesh, device_per_network, network_parallel = _resolve_placement(
        data_parallel, device_per_network, network_parallel, network_paths
    )
    multi_networks = MultiNetwork(
        network_paths=network_paths,
        load=True,
        mesh=mesh,
        device_per_network=device_per_network,
        network_parallel=network_parallel,
        **({"compute_dtype": dtype} if dtype is not None else {}),
    )

    with trace_ctx, projection_file_reader.load_projection_file(
        Path(projection_file_path)
    ) as reader:
        final_latents = projection_file_reader.final_latents_matrices_label(reader)

        final_latents_in_file = (
            underlying_length(final_latents.data) / multi_networks.expected_vector_length
        )
        processed_frames_in_file = reader.projection_attributes.projection_frame_count
        projection_complete = reader.projection_attributes.complete

        LOGGER.info(
            "Reading projection file. Complete: %s, Final Latent Count: %s, "
            "Processed Frames: %s",
            projection_complete,
            final_latents_in_file,
            processed_frames_in_file,
        )

        if not projection_complete or abs(final_latents_in_file - processed_frames_in_file) > 2:
            raise ValueError("Invalid Projection File, cannot continue.")

        frame_multiplier = divide_no_remainder(
            numerator=int(output_fps),
            denominator=int(reader.projection_attributes.projection_fps),
        )
        num_output_frames = int(frame_multiplier * final_latents_in_file)

        time_series_audio_vectors = read_wavs_scale_for_video(
            wavs=audio_paths,
            vector_length=multi_networks.expected_vector_length,
            target_num_vectors=num_output_frames,
        ).wav_data

        viz_input = alpha_blend_projection_file(
            final_latents_matrices_label=final_latents,
            alpha=alpha,
            fft_roll_enabled=fft_roll_enabled,
            fft_amplitude_range=fft_amplitude_range,
            blend_depth=blend_depth,
            time_series_audio_vectors=time_series_audio_vectors,
            vector_length=multi_networks.expected_vector_length,
            network_indices=multi_networks.network_indices,
        )

        if resumable:
            _resumable_blend(
                reader=reader,
                viz_input=viz_input,
                multi_networks=multi_networks,
                output_path=Path(output_path),
                output_fps=output_fps,
                output_side_length=output_side_length,
                frame_multiplier=frame_multiplier,
                num_output_frames=num_output_frames,
                frames_to_visualize=frames_to_visualize,
                audio_paths=audio_paths,
                time_series_audio_vectors=time_series_audio_vectors,
                overlay_enabled=overlay_enabled,
                overlay_music_mask_enabled=overlay_music_mask_enabled,
                complexity_change_rolling_sum_window=complexity_change_rolling_sum_window,
                complexity_change_threshold=complexity_change_threshold,
                phash_distance=phash_distance,
                bbox_distance=bbox_distance,
                track_length=track_length,
                overlay_detection_side=overlay_detection_side,
                overlay_smoothing=overlay_smoothing,
                resume_chunk_frames=resume_chunk_frames,
                fingerprint={
                    "pipeline": "projection_file_blend",
                    "wavs": [resume_file_identity(p) for p in audio_paths],
                    "networks": [resume_file_identity(p) for p in network_paths],
                    "projection_file": str(projection_file_path),
                    "projection_file_md5": reader.projection_attributes.target_md5_hash,
                    "alpha": alpha,
                    "fft_roll_enabled": bool(fft_roll_enabled),
                    "fft_amplitude_range": list(fft_amplitude_range),
                    "blend_depth": int(blend_depth),
                    "output_fps": float(output_fps),
                    "output_side_length": int(output_side_length),
                    "frames_to_visualize": frames_to_visualize,
                    "compute_dtype": compute_dtype,
                    "phash_distance": phash_distance,
                    "bbox_distance": bbox_distance,
                    "track_length": track_length,
                    "overlay_detection_side": overlay_detection_side,
                    "overlay_smoothing": overlay_smoothing,
                    "complexity_change_rolling_sum_window": complexity_change_rolling_sum_window,
                    "complexity_change_threshold": complexity_change_threshold,
                },
            )
            LOGGER.info("projection_file_blend complete: %s", output_path)
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
            unload_networks_when_complete=True,
        )

        from gance_tpu.utils.profiling import timed_iterator

        # Disk-tee the two frame streams so overlay detection and final compositing
        # can each consume a copy without holding frames in RAM (reference :184-199).
        # NPY (not gzip-9 HDF5) serialization: the tee is scratch, and gzip-9
        # costs ~1.9 s per 1024px frame on one host core — ~70x the raw store.
        num_copies = 1 if overlay_enabled else 0
        foreground_iterators = iterator_on_disk(
            iterator=timed_iterator(
                "target_read",
                scale_square_source_duplicate(
                    source=reader.target_images,
                    output_side_length=output_side_length,
                    frame_multiplier=frame_multiplier,
                ),
            ),
            copies=num_copies,
            serializer=NPY_SERIALIZER,
        )
        background_iterators = iterator_on_disk(
            iterator=timed_iterator(
                "synth_egress",
                scale_square_source_duplicate(
                    source=synthesis_output.synthesized_images,
                    output_side_length=output_side_length,
                ),
            ),
            copies=num_copies,
            serializer=NPY_SERIALIZER,
        )

        music_complexity_overlay_mask: Optional[ResultLayers] = (
            vector_reduction.music_complexity_mask(
                time_series_audio_vectors=time_series_audio_vectors,
                vector_length=multi_networks.expected_vector_length,
                rolling_sum_window=complexity_change_rolling_sum_window,
            )
            if overlay_music_mask_enabled
            else None
        )

        overlay_results = None
        foregrounds: Optional[Iterator[np.ndarray]] = None

        if overlay_enabled:
            if overlay_music_mask_enabled:
                mask_data = np.asarray(
                    music_complexity_overlay_mask.result.data, dtype=float
                )
                mask_data = np.where(np.isnan(mask_data), np.inf, mask_data)
                skip_mask: List[bool] = list(mask_data > complexity_change_threshold)
            else:
                skip_mask = [False] * num_output_frames

            overlay_results = compute_eye_tracking_overlay(
                foreground_images=foreground_iterators[0],
                background_images=background_iterators[0],
                min_phash_distance=phash_distance,
                min_bbox_distance=bbox_distance,
                skip_mask=skip_mask,
                detection_side=overlay_detection_side,
                temporal_smoothing=overlay_smoothing,
            )

            logging.info(
                "Starting to compute mask to filter out short sequences of overlay frames."
            )

            # The one full-stream materialization (reference :247): track-length
            # filtering needs all overlay decisions.
            boxes_list = list(timed_iterator("detect", overlay_results.bbox_lists))

            long_tracks_mask = vector_reduction.track_length_filter(
                bool_tracks=np.asarray(
                    [
                        (not skip) and (box is not None)
                        for skip, box in zip(skip_mask, boxes_list)
                    ]
                ),
                track_length=track_length,
            )

            def compose() -> Iterator[Tuple[np.ndarray, np.ndarray]]:
                for bounding_boxes, foreground, background, in_long_track in zip(
                    boxes_list,
                    foreground_iterators[1],
                    background_iterators[1],
                    long_tracks_mask,
                ):
                    blended = (
                        write_boxes_onto_image(
                            foreground_image=foreground,
                            background_image=background,
                            bounding_boxes=bounding_boxes,
                        )
                        if in_long_track
                        else background
                    )
                    yield blended, foreground

            pairs_a, pairs_b = tee(compose(), 2)
            blended_output: Iterator[np.ndarray] = (pair[0] for pair in pairs_a)
            foregrounds = (pair[1] for pair in pairs_b)
        else:
            # Foreground stream is left unconsumed (lazy, so it costs nothing).
            blended_output = background_iterators[0]

        blended_output = timed_iterator(
            "encode",
            write_source_to_disk_forward(
                source=timed_iterator("compose", blended_output),
                video_path=Path(output_path),
                video_fps=output_fps,
                audio_paths=audio_paths,
                high_quality=True,
            ),
        )

        if create_debug_visualization:
            from gance_tpu.viz.overlay_viz import (
                VisualizeOverlayThresholds,
                visualize_overlay_computation,
            )
            from gance_tpu.viz.reduction_viz import visualize_result_layers

            overlay_visualization = (
                visualize_overlay_computation(
                    overlay=overlay_results.contexts,
                    frames_per_context=debug_window,
                    video_square_side_length=debug_side_length,
                    horizontal_lines=VisualizeOverlayThresholds(
                        phash_line=phash_distance, bbox_distance_line=bbox_distance
                    ),
                )
                if overlay_enabled
                else None
            )

            tiles = [
                scale_square_source_duplicate(
                    source=blended_output, output_side_length=debug_side_length
                ),
                scale_square_source_duplicate(
                    source=foregrounds, output_side_length=debug_side_length
                )
                if foregrounds is not None
                else None,
                scale_square_source_duplicate(
                    source=reader.final_images,
                    output_side_length=debug_side_length,
                    frame_multiplier=frame_multiplier,
                ),
                synthesis_output.visualization_images,
                overlay_visualization,
                visualize_result_layers(
                    result_layers=music_complexity_overlay_mask,
                    frames_per_context=debug_window,
                    video_height=debug_side_length,
                    title="Overlay binary mask",
                    horizontal_line=complexity_change_threshold,
                )
                if music_complexity_overlay_mask is not None
                else None,
            ]

            write_source_to_disk_consume(
                source=(
                    horizontal_concat_images(images)
                    for images in zip(*[t for t in tiles if t is not None])
                ),
                video_path=Path(debug_path),
                video_fps=output_fps,
                audio_paths=audio_paths,
                high_quality=False,
            )
        else:
            more_itertools.consume(blended_output)

    LOGGER.info("projection_file_blend complete: %s", output_path)
