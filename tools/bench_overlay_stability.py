"""
Overlay decision-stability metric: eye-box IoU jitter + gating decision flips,
with and without --overlay-smoothing, on the reference's REAL face assets and
on a fabricated jittered sequence.

The substitution risk being quantified (r3 VERDICT "what's weak" #5): the
native Viola-Jones detector replaces dlib landmarks, and single-frame box
instability can flip gating decisions frame-to-frame — the reference's
track-length filter masks short flips after the fact but does nothing for box
geometry. This prints per-sequence JSON lines:

  * consecutive-frame IoU of the matched eye box (mean/min — higher = stabler);
  * decision flips (overlay_written changes between consecutive frames);

for smoothing OFF (reference behavior) vs a 5-frame window.

Runs on CPU: python tools/bench_overlay_stability.py
"""

import argparse
import itertools
import json
import sys
from pathlib import Path

ASSETS = Path("/root/reference/test/assets")


def _iou(a, b) -> float:
    ax0, ay0, ax1, ay1 = a.x, a.y, a.x + a.width, a.y + a.height
    bx0, by0, bx1, by1 = b.x, b.y, b.x + b.width, b.y + b.height
    ix = max(0, min(ax1, bx1) - max(ax0, bx0))
    iy = max(0, min(ay1, by1) - max(ay0, by0))
    inter = ix * iy
    union = a.width * a.height + b.width * b.height - inter
    return inter / union if union else 0.0


def measure(name, fg_frames, bg_frames, smoothing, phash, bbox):
    import numpy as np

    from gance_tpu.overlay.eye_tracking import compute_eye_tracking_overlay

    result = compute_eye_tracking_overlay(
        foreground_images=iter(fg_frames),
        background_images=iter(bg_frames),
        min_phash_distance=phash,
        min_bbox_distance=bbox,
        temporal_smoothing=smoothing,
    )
    boxes = list(result.bbox_lists)
    contexts = list(result.contexts)
    decisions = [c.overlay_written for c in contexts]
    flips = sum(1 for a, b in zip(decisions, decisions[1:]) if a != b)
    ious = [
        _iou(a[0], b[0])
        for a, b in zip(boxes, boxes[1:])
        if a is not None and b is not None and a and b
    ]
    record = {
        "sequence": name,
        "smoothing": smoothing,
        "frames": len(decisions),
        "overlay_frames": int(sum(decisions)),
        "decision_flips": flips,
        "consecutive_iou_mean": round(float(np.mean(ious)), 4) if ious else None,
        "consecutive_iou_min": round(float(np.min(ious)), 4) if ious else None,
    }
    print(json.dumps(record), flush=True)
    return record


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--phash-distance", type=int, default=30)
    parser.add_argument("--bbox-distance", type=float, default=50.0)
    parser.add_argument("--smoothing", type=int, default=5)
    parser.add_argument("--jitter-frames", type=int, default=12)
    parser.add_argument("--jitter-px", type=int, default=6)
    args = parser.parse_args()

    sys.path.insert(0, "/root/repo")
    import gance_tpu  # noqa: F401
    import cv2
    import numpy as np

    from gance_tpu.media.images import read_image
    from gance_tpu.media.video import frames_in_video

    sequences = {}

    # 1. natural sequence: the reference's real face video
    video = ASSETS / "devon_face_sample_short.mp4"
    if video.exists():
        frames = list(frames_in_video(video_path=video).frames)
        sequences["devon_face_sample_short"] = (frames, frames)

    # 2. fabricated jittered sequence: one real face photo under per-frame
    # random translation (detector jitter made explicit and controllable)
    face_path = ASSETS / "face_image.jpeg"
    if face_path.exists():
        base = read_image(face_path)
        side = 768
        base = cv2.resize(base, (side, side), interpolation=cv2.INTER_AREA)
        rng = np.random.RandomState(0)
        jittered = []
        for _ in range(args.jitter_frames):
            dx, dy = rng.randint(-args.jitter_px, args.jitter_px + 1, size=2)
            matrix = np.float32([[1, 0, dx], [0, 1, dy]])
            jittered.append(
                cv2.warpAffine(base, matrix, (side, side), borderMode=cv2.BORDER_REFLECT)
            )
        sequences["jittered_face_image"] = (jittered, jittered)

    if not sequences:
        raise SystemExit("no assets found under " + str(ASSETS))

    summary = {}
    for name, (fg, bg) in sequences.items():
        off = measure(name, fg, bg, 0, args.phash_distance, args.bbox_distance)
        on = measure(name, fg, bg, args.smoothing, args.phash_distance, args.bbox_distance)
        summary[name] = {
            "flips_off": off["decision_flips"],
            "flips_on": on["decision_flips"],
            "iou_mean_off": off["consecutive_iou_mean"],
            "iou_mean_on": on["consecutive_iou_mean"],
            "iou_min_off": off["consecutive_iou_min"],
            "iou_min_on": on["consecutive_iou_min"],
        }
    print(json.dumps({"metric": "overlay decision stability", **summary}))


if __name__ == "__main__":
    main()
