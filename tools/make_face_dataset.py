"""
Fabricate a small real-face training dataset from the reference's test assets.

Purpose: close the recorded convergence-study caveat (ROUND_NOTES "DEFAULT
DECISION" block) — the steps-vs-distance curve behind `--convergence-stop` was
measured against a RANDOM-INIT generator, whose manifold sits far from any real
frame (clean distance ~0.89). A generator trained on the very frames being
projected puts the targets near/on the manifold — the regime where projection
could keep improving past the random-init plateau and the 150-step stop could
be premature. Pipeline:

  1. this script: decode the reference's devon_face_sample_short.mp4 frames +
     the real face JPEGs into an image folder at --resolution;
  2. train.py on that folder (overfit on purpose — near-manifold is the point):
       python train.py --dataset-directory /tmp/train_ds --resolution 256 \
         --batch-size 8 --total-steps 1200 --checkpoint-every 600 \
         --compute-dtype bfloat16 --no-remat \
         --checkpoint-path /tmp/train256.ckpt --output-network /tmp/trained_256.pkl
  3. the convergence bench against the exported pickle:
       python tools/bench_convergence.py --network /tmp/trained_256.pkl \
         --batch 5 --budgets 250,1000

Reference anchors: projection step-count selection via convergence analysis
(projection_visualization.py:59-211, CHANGELOG 0.14.0); assets under
/root/reference/test/assets/ (read-only).
"""

import argparse
from pathlib import Path

REFERENCE_ASSETS = Path("/root/reference/test/assets")
FACE_JPEGS = (
    "face_image.jpeg",
    "april_27_cottage_session_1_04-28-2021_11-48-52-507461.jpeg",
    "april_27_cottage_session_1_04-28-2021_11-50-12-752379.jpeg",
    "april_27_cottage_session_1_04-28-2021_11-50-48-250746.jpeg",
)


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--output-directory", type=Path, default=Path("/tmp/train_ds"))
    parser.add_argument("--resolution", type=int, default=256)
    parser.add_argument("--assets", type=Path, default=REFERENCE_ASSETS)
    args = parser.parse_args()

    import sys

    sys.path.insert(0, "/root/repo")
    import cv2
    import numpy as np

    from gance_tpu.media.video import frames_in_video

    out = args.output_directory
    out.mkdir(parents=True, exist_ok=True)
    side = (args.resolution, args.resolution)

    count = 0
    video_path = args.assets / "devon_face_sample_short.mp4"
    if video_path.exists():
        for i, frame in enumerate(frames_in_video(video_path, width_height=side).frames):
            cv2.imwrite(
                str(out / f"frame_{i:04d}.png"),
                cv2.cvtColor(np.asarray(frame), cv2.COLOR_RGB2BGR),
            )
            count += 1
    for name in FACE_JPEGS:
        src = args.assets / name
        if not src.exists():
            continue
        img = cv2.imread(str(src))
        if img is None:
            print(f"skipping unreadable asset {src}")
            continue
        # Center-crop to square before resizing so faces are not squashed
        # (standard face-dataset prep); the training loader resizes again but
        # preserves whatever aspect distortion exists in the stored file.
        h, w = img.shape[:2]
        short = min(h, w)
        y0, x0 = (h - short) // 2, (w - short) // 2
        img = img[y0 : y0 + short, x0 : x0 + short]
        cv2.imwrite(
            str(out / (name.rsplit(".", 1)[0] + ".png")),
            cv2.resize(img, side, interpolation=cv2.INTER_AREA),
        )
        count += 1
    if count == 0:
        raise SystemExit(f"no assets found under {args.assets}")
    print(f"{count} images at {args.resolution}px -> {out}")


if __name__ == "__main__":
    main()
