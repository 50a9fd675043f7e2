"""
Projection steps-vs-final-distance on REAL video frames + the convergence stop.

The reference chose its production step counts offline with the
"80% projected" convergence analysis (projection_visualization.py:59-211,
CHANGELOG 0.14.0) and shipped a 1000-step default
(projector_file_writer.py:680). This measures, at full scale on real video
frames (the reference's devon_face_sample_short.mp4 by default):

  1. the steps-vs-final-distance curve of the NVlabs schedule family — one
     full projection per step budget (the schedule stretches with num_steps,
     so a 250-step run is the honest "choose 250 as the default" arm);
  2. the --convergence-stop arm: nominal 1000-step schedule, truncated online
     by the plateau detector — steps actually run + endpoint quality.

Every endpoint is scored with TPUProjector.evaluate_distance — the CLEAN
(jitter-free) perceptual distance of the final (w, noises) against the target,
so early-stopped endpoints are not penalized by the still-annealing w-jitter
that inflates their streamed traces.

Wall times include per-budget scan compiles (each num_steps shapes the
schedule, hence its own XLA program); the steps column is the durable result.

Run (TPU):  bash tools/tpu_retry.sh /tmp/conv.log python tools/bench_convergence.py
"""

import argparse
import itertools
import json
import sys
import time
from pathlib import Path

DEFAULT_VIDEO = "/root/reference/test/assets/devon_face_sample_short.mp4"


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--video", type=str, default=DEFAULT_VIDEO)
    parser.add_argument("--resolution", type=int, default=1024)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--compute-dtype", type=str, default="bfloat16")
    parser.add_argument("--budgets", type=str, default="100,250,500,1000")
    parser.add_argument("--epsilon", type=float, default=0.001)
    parser.add_argument("--window", type=int, default=50)
    parser.add_argument("--min-steps", type=int, default=100)
    parser.add_argument(
        "--network", type=str, default=None,
        help="Project against this NVlabs-format .pkl instead of a random-init "
        "generator (closes the r4 caveat: the plateau shape was only measured "
        "against random weights; trained manifolds may converge differently). "
        "Overrides --resolution with the pickle's.",
    )
    parser.add_argument(
        "--nominal", type=int, default=1000,
        help="Schedule length for the convergence-stop arm.",
    )
    args = parser.parse_args()

    sys.path.insert(0, "/root/repo")
    import gance_tpu  # noqa: F401
    import jax
    import numpy as np

    from gance_tpu.media.video import frames_in_video
    from gance_tpu.models.stylegan2 import GeneratorConfig, init_generator_params
    from gance_tpu.projection.projector import ProjectorSettings, TPUProjector

    if args.network is not None:
        from gance_tpu.models.pickle_loader import load_generator

        params, config = load_generator(Path(args.network))
    else:
        config = GeneratorConfig(resolution=args.resolution)
        with jax.default_device(jax.devices("cpu")[0]):
            params = init_generator_params(jax.random.PRNGKey(0), config)
    params = jax.device_put(params, jax.devices()[0])

    video = frames_in_video(video_path=Path(args.video))
    frames = list(itertools.islice(video.frames, args.batch))
    if len(frames) < args.batch:
        print(
            f"{args.video}: only {len(frames)} frames; batch {args.batch} -> "
            f"{len(frames)}",
            file=sys.stderr, flush=True,
        )
    targets = np.stack(frames)
    print(
        f"device={jax.devices()[0]} targets={targets.shape} "
        f"from {Path(args.video).name}",
        file=sys.stderr, flush=True,
    )

    def run(num_steps: int, convergence: bool):
        settings = ProjectorSettings(
            num_steps=num_steps, compute_dtype=args.compute_dtype,
        )
        if convergence:
            settings.convergence_stop = args.epsilon
            settings.convergence_window = args.window
            settings.convergence_min_steps = args.min_steps
        projector = TPUProjector(
            params, config, settings=settings, expected_time_per_step=None
        )
        started = time.time()
        out = projector.project_batch(
            targets, want_step_images=False, per_step_noises=False
        )
        wall = time.time() - started
        finals = np.concatenate([r.final_latents for r in out])  # (B, R, 512)
        noises = [
            np.concatenate([r.noises[i] for r in out])
            for i in range(len(out[0].noises))
        ]
        clean = projector.evaluate_distance(finals, noises, targets)
        record = {
            "arm": (
                f"convergence_stop(eps={args.epsilon},w={args.window})"
                if convergence
                else f"budget_{num_steps}"
            ),
            "nominal_steps": num_steps,
            "steps_run": int(out[0].steps_run),
            "clean_distance_mean": round(float(np.mean(clean)), 4),
            "clean_distance_max": round(float(np.max(clean)), 4),
            "clean_distance_per_frame": [round(float(d), 4) for d in clean],
            "streamed_final_distance_mean": round(
                float(np.mean([r.final_distance for r in out])), 4
            ),
            "wall_sec_incl_compile": round(wall, 1),
        }
        print(json.dumps(record), flush=True)
        return record

    records = []
    for budget in [int(b) for b in args.budgets.split(",")]:
        records.append(run(budget, convergence=False))
    stop_record = run(args.nominal, convergence=True)

    # The stop arm compares against the full-budget arm; if --nominal isn't in
    # --budgets, fall back to the longest budget run rather than dying with a
    # StopIteration AFTER hours of projection runs completed.
    full = next(
        (r for r in records if r["nominal_steps"] == args.nominal),
        max(records, key=lambda r: r["nominal_steps"]),
    )
    print(
        json.dumps(
            {
                "metric": "projection convergence-stop certification",
                "video": Path(args.video).name,
                "network": args.network,  # null = random-init generator
                "resolution": config.resolution,
                "batch": args.batch,
                "compute_dtype": args.compute_dtype,
                "curve_steps": [r["nominal_steps"] for r in records],
                "curve_clean_distance_mean": [
                    r["clean_distance_mean"] for r in records
                ],
                "stop_steps_run": stop_record["steps_run"],
                "stop_clean_distance_mean": stop_record["clean_distance_mean"],
                "full_clean_distance_mean": full["clean_distance_mean"],
                "steps_saved_ratio": round(
                    args.nominal / max(stop_record["steps_run"], 1), 2
                ),
                "stop_vs_full_distance_delta": round(
                    stop_record["clean_distance_mean"]
                    - full["clean_distance_mean"],
                    4,
                ),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
