"""
Read back and re-encode segmented raw-spill AVIs.

`create_raw_spill_writer` (media/video.py) emits uncompressed BI_RGB AVI
content through the native O_DIRECT muxer, auto-segmented below AVI's 4 GiB
RIFF limit: `out.avi`, `out.part001.avi`, `out.part002.avi`, ... Each segment
plays standalone, but downstream consumers — projection of a spilled render,
or producing a single compressed deliverable — need the spill as ONE frame
stream. This module provides that:

  * `spill_segment_paths` enumerates a spill's segments in playback order
    (validating contiguity: a missing middle segment raises instead of
    silently skipping frames);
  * `frames_in_spill` is `frames_in_video` over the whole spill — same
    metadata + lazy-RGB-iterator contract (fps override, exact fps reduction,
    resize), so a spill drops into any pipeline that consumes a video;
  * `reencode_spill` streams every frame through the standard (compressed)
    writer into a single deliverable, with optional audio muxing — the
    offline half of the raw-spill egress pattern (spill at O_DIRECT rate on
    the one-core TPU host, compress where encode compute exists).

The reference delegates all of this to an ffmpeg binary
(gance/image_sources/video_common.py:24-140); spill segmentation is net-new
(it exists because this framework's synthesis outruns single-core encoders).
"""

import re
import tempfile
from itertools import islice
from pathlib import Path
from typing import Iterator, List, Optional, Tuple

import cv2
import numpy as np

from gance_tpu.media.video import (
    VideoFrames,
    add_wavs_to_video,
    create_video_writer,
    reduce_fps_take_every,
    threaded_writer,
)
from gance_tpu.types import ImageResolution
from gance_tpu.utils.logging import LOGGER

_PART_RE = re.compile(r"\.part(\d{3,})$")


def spill_segment_paths(spill_path: Path) -> List[Path]:
    """
    The segments of a raw spill in playback order: the base file, then its
    `.partNNN` siblings. Raises if the base is missing or the part numbering
    has a hole (a lost middle segment would otherwise silently drop frames).
    """
    base = Path(spill_path)
    if not base.exists():
        raise ValueError(f"Spill base segment does not exist: {base}")
    parts = []
    for candidate in base.parent.glob(f"{base.stem}.part*{base.suffix}"):
        match = _PART_RE.search(candidate.with_suffix("").name[len(base.stem):])
        if match is None:
            continue
        parts.append((int(match.group(1)), candidate))
    parts.sort()
    expected = list(range(1, len(parts) + 1))
    numbers = [n for n, _ in parts]
    if numbers != expected:
        raise ValueError(
            f"Spill {base} has non-contiguous segments: found part numbers "
            f"{numbers}, expected {expected}"
        )
    return [base] + [p for _, p in parts]


def _segment_metadata(path: Path) -> Tuple[float, ImageResolution, int]:
    video = cv2.VideoCapture(str(path))
    if not video.isOpened():
        raise ValueError(f"Couldn't open spill segment: {path}")
    fps = float(video.get(cv2.CAP_PROP_FPS))
    resolution = ImageResolution(
        width=int(video.get(cv2.CAP_PROP_FRAME_WIDTH)),
        height=int(video.get(cv2.CAP_PROP_FRAME_HEIGHT)),
    )
    count = int(video.get(cv2.CAP_PROP_FRAME_COUNT))
    video.release()
    return fps, resolution, count


def frames_in_spill(
    spill_path: Path,
    video_fps: Optional[float] = None,
    reduce_fps_to: Optional[float] = None,
    width_height: Optional[Tuple[int, int]] = None,
) -> VideoFrames:
    """
    `frames_in_video` over an entire segmented spill: one lazy RGB iterator
    spanning every segment, with the same fps-override / exact-fps-reduction /
    resize options (reductions apply across segment boundaries).
    """
    segments = spill_segment_paths(spill_path)
    fps0, resolution, _ = _segment_metadata(segments[0])
    fps = video_fps if video_fps is not None else fps0
    frame_count = sum(_segment_metadata(s)[2] for s in segments)
    take_every = reduce_fps_take_every(fps, reduce_fps_to)

    def iterate() -> Iterator[np.ndarray]:
        for segment in segments:
            video = cv2.VideoCapture(str(segment))
            if not video.isOpened():
                raise ValueError(f"Couldn't open spill segment: {segment}")
            while True:
                ret, frame = video.read()
                if not ret:
                    break
                frame = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
                if width_height is not None:
                    frame = cv2.resize(
                        frame, width_height, interpolation=cv2.INTER_CUBIC
                    )
                yield frame
            video.release()

    frames: Iterator[np.ndarray] = iterate()
    reduced_fps: Optional[float] = None
    reduced_frame_count: Optional[int] = None
    if take_every is not None:
        frames = islice(frames, 0, None, take_every)
        reduced_fps = reduce_fps_to
        reduced_frame_count = -(-frame_count // take_every)

    return VideoFrames(
        original_fps=fps,
        total_frame_count=frame_count,
        original_resolution=resolution,
        frames=frames,
        reduced_fps=reduced_fps,
        reduced_frame_count=reduced_frame_count,
    )


def reencode_spill(
    spill_path: Path,
    output_path: Path,
    high_quality: bool = False,
    audio_paths: Optional[List[Path]] = None,
    video_fps: Optional[float] = None,
    delete_segments: bool = False,
) -> None:
    """
    Re-encode a segmented raw spill into ONE compressed video file (plus
    optional audio mux) — always through the standard writer, never back to
    the spill path, regardless of GANCE_TPU_EGRESS.

    :param delete_segments: remove the spill segments after a successful
        re-encode (the spill is ~46x the compressed size at 2160px).
    """
    spill_path, output_path = Path(spill_path), Path(output_path)
    video = frames_in_spill(spill_path, video_fps=video_fps)
    fps = video.original_fps

    mux_audio = bool(audio_paths)
    if mux_audio:
        tmp = tempfile.NamedTemporaryFile(suffix=output_path.suffix, delete=False)
        tmp.close()
        target = Path(tmp.name)
    else:
        target = output_path

    writer = threaded_writer(
        create_video_writer(
            target, fps, video.original_resolution,
            high_quality=high_quality, allow_spill=False,
        )
    )
    count = 0
    try:
        for frame in video.frames:
            writer.write(frame)
            count += 1
            if count % 500 == 0:
                LOGGER.info(
                    "Re-encoded %d/%d spill frames into %s",
                    count, video.total_frame_count, output_path,
                )
    finally:
        writer.finish()
    if mux_audio:
        try:
            add_wavs_to_video(target, list(audio_paths), output_path)
        finally:
            target.unlink(missing_ok=True)
    LOGGER.info("Re-encoded %d spill frames into %s", count, output_path)
    if delete_segments:
        for segment in spill_segment_paths(spill_path):
            segment.unlink()
            LOGGER.info("Deleted spill segment %s", segment)
