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
            results[f"{side}px"] = {
                "mp4v_raw_fps": round(raw, 1),
                "mp4v_threaded_caller_fps": round(thr, 1),
                "native_avi_mjpeg_fps": round(avi, 1),
            }
            print(
                f"{side}px: mp4v raw {raw:6.1f} f/s | mp4v threaded caller-side "
                f"{thr:6.1f} f/s | native AVI/MJPEG {avi:6.1f} f/s",
                flush=True,
            )
        print(json.dumps(results))


if __name__ == "__main__":
    main()
