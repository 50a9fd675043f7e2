"""
Frame-indexed checkpoint/resume for synthesis renders.

The reference's synthesis runs are NOT resumable (SURVEY §5: "Synthesis runs
are not resumable") — a crash at frame 40,000 of an album-length 4K render
restarts from zero. Here the hero render is CHUNKED: frames stream into
self-contained part files under `<output>.parts/`, each part finished and
recorded in an atomically-replaced sidecar manifest (`<output>.resume.json`),
so a kill -9 loses at most the in-flight chunk. On resume the pipeline slices
its precomputed input arrays at the durable frame count — synthesis of
finished frames is SKIPPED, not replayed — and appends new chunks. When the
source exhausts, the parts concatenate (+ audio mux) into the requested
deliverable and the scaffolding is removed; a crash during that finalize
re-runs only the finalize (every frame is already durable).

The manifest carries a caller-supplied fingerprint of every output-affecting
parameter; resuming with different parameters is refused (the parts would not
belong to the requested render).

Two part formats (an in-flight part from a crash is DISCARDED on resume —
only parts whose `finish()` ran and whose manifest entry landed count — so a
part format only needs to be standalone-readable once complete):

  * `mp4v` — plain cv2 writer. Compressed parts, but the finalize re-encode
    compounds the loss (resumable output equals resumable output, not an
    uninterrupted non-resumable run).
  * `raw-avi` — the native muxer's uncompressed BI_RGB O_DIRECT path, one
    complete AVI per part (chunks are byte-capped below the 4 GiB RIFF limit
    so a part never segments). Durable frames are BIT-EXACT, so the finalize
    performs the render's single, only encode: the deliverable is identical
    to an uninterrupted non-resumable run's (pinned by tests). Also the fast
    path on one-core hosts (raw 2160px writes measured 78 f/s vs 17 mp4v).

The default follows the egress mode: `GANCE_TPU_EGRESS=raw-spill` selects
`raw-avi` parts (previously that combination wrote LOSSY mp4v parts and then
"raw-spilled" the re-encode — a lossy roundtrip into a raw deliverable). The
format is recorded in the manifest; a resume keeps the recorded format
regardless of the current env so one render's parts stay uniform. The final
deliverable goes through the standard writer stack with `high_quality=True`,
exactly like a non-resumable render.
"""

import itertools
import json
import os
from pathlib import Path
from typing import Any, Dict, Iterator, List, Optional

import numpy as np

from gance_tpu.media.video import (
    create_raw_spill_writer,
    create_video_writer,
    frames_in_video,
    write_source_to_disk_forward,
)
from gance_tpu.types import image_resolution
from gance_tpu.utils.logging import LOGGER

DEFAULT_CHUNK_FRAMES = 300

# Raw parts must stay single-file (no .partNNN segmentation inside a part):
# cap a chunk's pixel bytes safely below RawAviWriter's own 3.5 GiB roll
# threshold (SEGMENT_BYTES_DEFAULT), leaving headroom for AVI chunk/index
# overhead (~24 bytes/frame).
RAW_PART_BYTE_BUDGET = int(3.2 * 1024**3)

PART_FORMATS = ("mp4v", "raw-avi")


def default_parts_format() -> str:
    """raw-avi iff the egress mode is raw-spill (see module docstring)."""
    egress = os.environ.get("GANCE_TPU_EGRESS", "auto").strip().lower()
    return "raw-avi" if egress == "raw-spill" else "mp4v"


def file_identity(path: Path) -> list:
    """
    Content identity of an input file for render fingerprints:
    ``[path, size_bytes, mtime_ns]``. A path string alone would let parts
    rendered from an overwritten file (e.g. a retrained network pkl at the
    same path) silently concatenate with frames from the new content; size +
    mtime catches every overwrite without paying an md5 pass over
    multi-hundred-MB network pickles at the start of every resumable run.
    Returned as a JSON-native list so the manifest round-trip compares equal.
    """
    stat = Path(path).stat()
    return [str(path), stat.st_size, stat.st_mtime_ns]


def manifest_path(output_path: Path) -> Path:
    return output_path.with_name(output_path.name + ".resume.json")


def parts_directory(output_path: Path) -> Path:
    return output_path.with_name(output_path.name + ".parts")


def _write_manifest(output_path: Path, manifest: Dict[str, Any]) -> None:
    """Atomic sidecar update: a crash leaves either the old or the new state."""
    path = manifest_path(output_path)
    tmp = path.with_name(path.name + ".tmp")
    tmp.write_text(json.dumps(manifest, indent=2))
    os.replace(tmp, path)


def load_manifest(
    output_path: Path, fingerprint: Dict[str, Any]
) -> Optional[Dict[str, Any]]:
    """
    The existing manifest for `output_path`, or None when starting fresh.
    Raises when a manifest exists but was written by a render with different
    parameters — its parts do not belong to the requested output.
    """
    path = manifest_path(output_path)
    if not path.exists():
        return None
    manifest = json.loads(path.read_text())
    if manifest.get("fingerprint") != fingerprint:
        raise ValueError(
            f"{path} belongs to a render with different parameters; delete it "
            f"(and {parts_directory(output_path)}) to start over, or rerun "
            "with the original parameters to resume.\n"
            f"manifest: {json.dumps(manifest.get('fingerprint'), sort_keys=True)}\n"
            f"requested: {json.dumps(fingerprint, sort_keys=True)}"
        )
    return manifest


def durable_frames(output_path: Path, fingerprint: Dict[str, Any]) -> int:
    """Frames already safely on disk for this exact render (0 = fresh start)."""
    manifest = load_manifest(output_path, fingerprint)
    if manifest is None:
        return 0
    return int(sum(chunk["frames"] for chunk in manifest["chunks"]))


def write_source_resumable(
    source: Iterator[np.ndarray],
    output_path: Path,
    video_fps: float,
    fingerprint: Dict[str, Any],
    audio_paths: Optional[List[Path]] = None,
    chunk_frames: int = DEFAULT_CHUNK_FRAMES,
    high_quality: bool = True,
    parts_format: Optional[str] = None,
) -> int:
    """
    Consume `source` — the frames AFTER the durable prefix (the caller slices
    its inputs at `durable_frames(...)`) — into finished part files, then
    concatenate every part (+ audio mux) into `output_path`.

    :param parts_format: 'mp4v' or 'raw-avi' (see module docstring). None =
        `default_parts_format()`. A resumed render keeps the format recorded
        in its manifest regardless of this argument.
    :return: the total frame count of the finished render.
    """
    output_path = Path(output_path)
    requested_format = parts_format or default_parts_format()
    if requested_format not in PART_FORMATS:
        raise ValueError(
            f"parts_format {requested_format!r}: expected one of {PART_FORMATS}"
        )
    manifest = load_manifest(output_path, fingerprint) or {
        "fingerprint": fingerprint,
        "chunks": [],
        "parts_format": requested_format,
    }
    # older manifests predate the field and hold mp4v parts
    fmt = manifest.setdefault("parts_format", "mp4v")
    if fmt != requested_format:
        LOGGER.info(
            "Resuming with parts_format=%s from the manifest "
            "(requested %s; one render's parts stay uniform)",
            fmt, requested_format,
        )
    parts_dir = parts_directory(output_path)
    parts_dir.mkdir(parents=True, exist_ok=True)
    # an in-flight chunk from a crashed run is not in the manifest: discard
    recorded = {chunk["name"] for chunk in manifest["chunks"]}
    for stray in sorted(parts_dir.iterdir()):
        if stray.name not in recorded:
            LOGGER.info("Discarding unfinished part %s", stray)
            stray.unlink()

    start = int(sum(chunk["frames"] for chunk in manifest["chunks"]))
    index = len(manifest["chunks"])
    written = start
    effective_chunk = chunk_frames
    while True:
        chunk = list(itertools.islice(source, effective_chunk))
        if not chunk:
            break
        resolution = image_resolution(chunk[0])
        if fmt == "raw-avi":
            # byte-cap raw chunks below the RIFF limit (a part must not
            # segment); re-slice the first chunk if the cap is smaller
            frame_bytes = int(np.prod(chunk[0].shape))
            cap = max(1, RAW_PART_BYTE_BUDGET // frame_bytes)
            if cap < effective_chunk:
                LOGGER.info(
                    "Raw parts: chunk capped at %d frames (%d requested) to "
                    "stay below the 4 GiB AVI segment limit", cap, chunk_frames,
                )
                effective_chunk = cap
                source = itertools.chain(chunk[cap:], source)
                chunk = chunk[:cap]
            name = f"part_{index:05d}.avi"
            writer = create_raw_spill_writer(
                parts_dir / name, video_fps, resolution
            )
        else:
            name = f"part_{index:05d}.mp4"
            writer = create_video_writer(
                parts_dir / name, video_fps, resolution,
                high_quality=False,  # parts must be standalone cv2-readable
                allow_spill=False,
            )
        for frame in chunk:
            writer.write(frame)
        writer.finish()
        manifest["chunks"].append({"name": name, "frames": len(chunk)})
        _write_manifest(output_path, manifest)
        index += 1
        written += len(chunk)
        LOGGER.info(
            "Resumable render: %d frames durable (+%d in %s)",
            written, len(chunk), name,
        )
        # Test seam: the kill -9 tests need a window between durable chunks to
        # land the signal deterministically (tiny test renders finish in ms).
        delay = float(os.environ.get("GANCE_TPU_RESUME_CHUNK_DELAY", "0") or 0)
        if delay:
            import time

            time.sleep(delay)

    # Finalize: every frame is durable; produce the deliverable and clean up.
    # Killed here? The manifest survives, the next run's source is empty, and
    # this block simply re-runs.
    def part_frames() -> Iterator[np.ndarray]:
        for chunk_record in manifest["chunks"]:
            yield from frames_in_video(
                video_path=parts_dir / chunk_record["name"]
            ).frames

    total = int(sum(chunk["frames"] for chunk in manifest["chunks"]))
    LOGGER.info(
        "Resumable render: finalizing %d frames -> %s", total, output_path
    )
    import more_itertools

    more_itertools.consume(
        write_source_to_disk_forward(
            source=part_frames(),
            video_path=output_path,
            video_fps=video_fps,
            audio_paths=audio_paths,
            high_quality=high_quality,
        )
    )
    for chunk_record in manifest["chunks"]:
        (parts_dir / chunk_record["name"]).unlink(missing_ok=True)
    parts_dir.rmdir()
    manifest_path(output_path).unlink(missing_ok=True)
    return total
