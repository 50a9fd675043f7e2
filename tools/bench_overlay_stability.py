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


def measure_tracking_error(frames, shifts) -> dict:
    """
    Landmark-point precision against GROUND TRUTH: the jittered frames are one
    photo under known integer translations, so the matched eye center must move
    exactly with the shift. Reports the per-frame deviation
    |(center_t - center_0) - (shift_t - shift_0)| in pixels for raw Haar boxes
    vs gradient-refined boxes (overlay/eye_refine.py) — the number that
    quantifies the dlib-landmark substitution (r3 VERDICT missing #1).
    """
    import numpy as np

    from gance_tpu.overlay.faces import FaceFinderProxy

    out = {}
    for label, refine in (("raw", False), ("refined", True)):
        finder = FaceFinderProxy(refine_eye_centers=refine)
        # PER-EYE landmark centroids (the centroid of the 6 emitted keypoints
        # is exactly the eye-box center) — NOT the per-face left+right
        # bounding rect, whose centroid averages the two eyes and halves the
        # apparent error.
        all_centers = []
        eye_widths = []
        for frame in frames:
            centers = []
            for face in finder.face_landmarks(frame):
                for key in ("left_eye", "right_eye"):
                    pts = np.asarray(face[key], np.float64)
                    centers.append((float(pts[:, 0].mean()), float(pts[:, 1].mean())))
                    eye_widths.append(float(pts[:, 0].max() - pts[:, 0].min()))
            all_centers.append(centers)
        base = next((i for i, c in enumerate(all_centers) if c), None)
        # A detection counts as the SAME eye only within half an EYE width of
        # its ground-truth position; farther means the detector produced a
        # different/false eye (an identity miss — already covered by the
        # flip/IoU metrics). Splitting the two isolates what this metric is
        # for: sub-window localization precision of matched landmarks.
        gate = (np.median(eye_widths) / 2.0) if eye_widths else 0.0
        errors = []
        expected = 0
        if base is not None:
            # For EACH eye detected in the base frame: its ground-truth position
            # in frame t is base_center + (shift_t - shift_base). Match to the
            # NEAREST detection in frame t and record the residual when the
            # match passes the identity gate.
            for base_center in all_centers[base]:
                for i, centers in enumerate(all_centers):
                    if i == base or not centers:
                        continue
                    expected += 1
                    ex = base_center[0] + shifts[i][0] - shifts[base][0]
                    ey = base_center[1] + shifts[i][1] - shifts[base][1]
                    residual = min(
                        float(np.hypot(cx - ex, cy - ey)) for cx, cy in centers
                    )
                    if residual <= gate:
                        errors.append(residual)
        out[label] = {
            "frames_detected": sum(bool(c) for c in all_centers),
            "eye_match_rate": round(len(errors) / expected, 3) if expected else None,
            "identity_gate_px": round(float(gate), 1),
            "matched_err_mean_px": (
                round(float(np.mean(errors)), 2) if errors else None
            ),
            "matched_err_p90_px": (
                round(float(np.percentile(errors, 90)), 2) if errors else None
            ),
            "matched_err_max_px": round(float(np.max(errors)), 2) if errors else None,
        }
    print(json.dumps({"metric": "eye-center tracking error vs ground truth", **out}))
    return out


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
        shifts = []
        for _ in range(args.jitter_frames):
            dx, dy = rng.randint(-args.jitter_px, args.jitter_px + 1, size=2)
            matrix = np.float32([[1, 0, dx], [0, 1, dy]])
            shifts.append((int(dx), int(dy)))
            jittered.append(
                cv2.warpAffine(base, matrix, (side, side), borderMode=cv2.BORDER_REFLECT)
            )
        sequences["jittered_face_image"] = (jittered, jittered)
        measure_tracking_error(jittered, shifts)

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
