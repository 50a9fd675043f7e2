"""
Projection fidelity closure on TRAINED weights (r4 VERDICT item 1, second
half): the reference's flagship integration contract —
/root/reference/test/test_projection_file.py:36-170 — executed against a real
trained network instead of random init:

  1. project real video frames (the reference's devon_face_sample_short.mp4)
     into a projection file through the production CLI path;
  2. reader roundtrip: `verify_projection_file_assumptions` (all style rows
     of every final latent identical), target round-trip count;
  3. convergence monotonicity: the FIRST history latent sits farther from
     the final latent than the SECOND-TO-LAST (reference :120-141);
  4. re-synthesis fidelity: synthesizing the stored final latents through
     the same network reproduces the stored final images — scored as the
     reference scores it (PNG byte-size delta) plus max/mean pixel error
     (stronger than the reference's proxy).

Prints one JSON line; non-zero exit if any contract fails.

Run (TPU):
  bash tools/tpu_retry.sh /tmp/fidelity.log python \
    tools/bench_projection_fidelity.py --network /tmp/trained_256.pkl
"""

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")

DEVON = "/root/reference/test/assets/devon_face_sample_short.mp4"


def png_bytes(image) -> int:
    import cv2

    ok, encoded = cv2.imencode(".png", cv2.cvtColor(image, cv2.COLOR_RGB2BGR))
    assert ok
    return len(encoded.tobytes())


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--network", type=str, required=True)
    parser.add_argument("--steps", type=int, default=250)
    parser.add_argument("--frames", type=int, default=5)
    parser.add_argument("--video", type=str, default=DEVON)
    parser.add_argument("--compute-dtype", type=str, default="bfloat16")
    args = parser.parse_args()

    import numpy as np

    import gance_tpu  # noqa: F401 — side-effect import (compile cache + platform config)

    from gance_tpu.projection import file_reader
    from gance_tpu.projection.file_writer import project_video_to_file
    from gance_tpu.synthesis.runtime import SynthesisNetwork

    started = time.time()
    with tempfile.TemporaryDirectory() as tmp:
        projection_path = Path(tmp) / "fidelity.hdf5"
        project_video_to_file(
            path_to_video=Path(args.video),
            path_to_network=Path(args.network),
            projection_file_path=projection_path,
            steps_per_projection=args.steps,
            num_frames_to_project=args.frames,
            latents_histories_enabled=True,
            compute_dtype=args.compute_dtype,
        )
        project_wall = time.time() - started

        # contract 2: the verifier the reference ships (rows identical etc.)
        file_reader.verify_projection_file_assumptions(projection_path)

        with file_reader.load_projection_file(projection_path) as reader:
            finals = [np.asarray(f) for f in reader.final_images]
            targets = [np.asarray(t) for t in reader.target_images]
            final_latents = [np.asarray(l) for l in reader.final_latents]
            assert len(finals) == len(targets) == args.frames

            # contract 3: convergence monotonicity per frame
            monotone = []
            for history, final in zip(reader.latents_histories, final_latents):
                steps = [np.asarray(h) for h in history]
                first = float(np.abs(steps[0] - final).sum())
                near_last = float(np.abs(steps[-2] - final).sum())
                monotone.append(first > near_last)

            # contract 4: re-synthesis from final latents == stored finals
            network = SynthesisNetwork.from_pkl(Path(args.network))
            resynth = [
                np.asarray(image)
                for image in file_reader.network_outputs_at_final_latents(
                    reader, network
                )
            ]

        png_deltas = [
            abs(png_bytes(a) - png_bytes(b)) for a, b in zip(finals, resynth)
        ]
        pixel_max = max(
            int(np.abs(a.astype(int) - b.astype(int)).max())
            for a, b in zip(finals, resynth)
        )
        pixel_mean = float(
            np.mean(
                [
                    np.abs(a.astype(float) - b.astype(float)).mean()
                    for a, b in zip(finals, resynth)
                ]
            )
        )
        # visual-proximity sanity: the projection should land close to the
        # target on a trained (near-manifold) network. Targets are stored at
        # the source video's resolution; compare at the network's.
        import cv2

        side = finals[0].shape[0]
        targets = [
            cv2.resize(t, (side, side), interpolation=cv2.INTER_AREA)
            if t.shape[0] != side
            else t
            for t in targets
        ]
        target_psnr = [
            float(
                10
                * np.log10(
                    255.0**2
                    / max(
                        np.mean(
                            (a.astype(float) - b.astype(float)) ** 2
                        ),
                        1e-9,
                    )
                )
            )
            for a, b in zip(finals, targets)
        ]

    record = {
        "metric": "projection fidelity on trained weights",
        "network": args.network,
        "steps": args.steps,
        "frames": args.frames,
        "project_wall_s": round(project_wall, 1),
        "rows_identical_verified": True,
        "convergence_monotone_per_frame": monotone,
        "resynthesis_png_byte_delta": png_deltas,
        "resynthesis_png_byte_delta_max": max(png_deltas),
        "resynthesis_pixel_max": pixel_max,
        "resynthesis_pixel_mean": round(pixel_mean, 4),
        "final_vs_target_psnr_db": [round(p, 2) for p in target_psnr],
    }
    print(json.dumps(record), flush=True)
    # the reference's tolerance: re-synthesis within 5000 PNG bytes of the
    # stored finals (test_projection_file.py:36-170); monotone convergence
    ok = all(monotone) and max(png_deltas) <= 5000
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
