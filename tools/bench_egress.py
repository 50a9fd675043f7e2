"""
Host-side video egress benchmark: frames/sec written at 4K (2160px) and 1024px
for the available writer backends (cv2 mp4v fast profile; ffmpeg x264 when
present; native AVI muxer for the audio path), raw vs threaded.

The 4K/60 target (BASELINE.md) needs >= 60 f/s sustained encode so egress never
gates synthesis. Note: over the tunneled axon TPU, device->host transfer is
capped at ~22 MB/s (~1.6 f/s of 2160px uint8), an environment artifact — encode
rates below are what matter on a real TPU host.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")
import numpy as np

from gance_tpu.media.video import create_video_writer, threaded_writer
from gance_tpu.types import ImageResolution


def _bench_writer(side: int, frames: int, threaded: bool, tmp: Path) -> float:
    rng = np.random.RandomState(0)
    # a few distinct frames so the codec can't trivially dedup
    pool = [(rng.rand(side, side, 3) * 255).astype(np.uint8) for _ in range(4)]
    path = tmp / f"bench_{side}_{threaded}.mp4"
    handle = create_video_writer(path, 60.0, ImageResolution(width=side, height=side))
    if threaded:
        handle = threaded_writer(handle)
    t0 = time.time()
    for i in range(frames):
        handle.write(pool[i % len(pool)])
    handle.finish()
    elapsed = time.time() - t0
    path.unlink(missing_ok=True)
    return frames / elapsed


def _bench_native_avi(side: int, frames: int, tmp: Path) -> float:
    from gance_tpu.media.native import AviWriter

    rng = np.random.RandomState(0)
    pool = [(rng.rand(side, side, 3) * 255).astype(np.uint8) for _ in range(4)]
    path = tmp / f"bench_{side}.avi"
    writer = AviWriter(path, side, side, 60.0)
    t0 = time.time()
    for i in range(frames):
        writer.write_frame_rgb(pool[i % len(pool)])
    writer.finalize()
    elapsed = time.time() - t0
    path.unlink(missing_ok=True)
    return frames / elapsed


def _bench_raw_spill(side: int, frames: int, tmp: Path, bgr: bool = False) -> float:
    """Uncompressed BI_RGB AVI via the native O_DIRECT writer."""
    from gance_tpu.media.native import RawAviWriter

    rng = np.random.RandomState(0)
    pool = [(rng.rand(side, side, 3) * 255).astype(np.uint8) for _ in range(4)]
    path = tmp / f"raw_{side}_{bgr}.avi"
    writer = RawAviWriter(path, side, side, 60.0)
    t0 = time.time()
    for i in range(frames):
        if bgr:
            writer.write_frame_bgr(pool[i % len(pool)])
        else:
            writer.write_frame_rgb(pool[i % len(pool)])
    writer.finalize()
    elapsed = time.time() - t0
    for segment in writer.segment_paths:
        segment.unlink(missing_ok=True)
    return frames / elapsed


def _bench_jpeg_thread_curve(side: int, frames: int, workers_list) -> dict:
    """
    JPEG encode rate vs thread count (cv2 releases the GIL in imencode, so a
    pool scales on multi-core hosts; the measured curve documents this host's
    single-core ceiling).
    """
    import concurrent.futures

    import cv2

    rng = np.random.RandomState(0)
    pool = [(rng.rand(side, side, 3) * 255).astype(np.uint8) for _ in range(4)]

    def encode(i: int) -> int:
        ok, jpeg = cv2.imencode(
            ".jpg", pool[i % len(pool)], [cv2.IMWRITE_JPEG_QUALITY, 95]
        )
        return int(jpeg.size)

    curve = {}
    for workers in workers_list:
        with concurrent.futures.ThreadPoolExecutor(max_workers=workers) as executor:
            t0 = time.time()
            list(executor.map(encode, range(frames)))
            curve[str(workers)] = round(frames / (time.time() - t0), 1)
    return curve


def main() -> None:
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as tmp_str:
        tmp = Path(tmp_str)
        results = {"cores": os.cpu_count()}
        for side, frames in [(1024, 120), (2160, 60)]:
            raw = _bench_writer(side, frames, threaded=False, tmp=tmp)
            thr = _bench_writer(side, frames, threaded=True, tmp=tmp)
            avi = _bench_native_avi(side, frames, tmp)
            spill = _bench_raw_spill(side, frames, tmp)
            spill_bgr = _bench_raw_spill(side, frames, tmp, bgr=True)
            jpeg_curve = _bench_jpeg_thread_curve(
                side, max(frames // 2, 16), (1, 2, 4)
            )
            results[f"{side}px"] = {
                "mp4v_raw_fps": round(raw, 1),
                "mp4v_threaded_caller_fps": round(thr, 1),
                "native_avi_mjpeg_fps": round(avi, 1),
                "raw_spill_fps": round(spill, 1),
                "raw_spill_prebgr_fps": round(spill_bgr, 1),
                "jpeg_encode_fps_by_threads": jpeg_curve,
            }
            print(
                f"{side}px: mp4v raw {raw:6.1f} f/s | mp4v threaded caller-side "
                f"{thr:6.1f} f/s | native AVI/MJPEG {avi:6.1f} f/s | raw spill "
                f"{spill:6.1f} f/s (pre-BGR {spill_bgr:6.1f}) | jpeg threads "
                f"{jpeg_curve}",
                flush=True,
            )
        print(json.dumps(results))


if __name__ == "__main__":
    main()
