"""
Warm-start projection on temporally-coherent frames: distance at equal steps,
cold vs warm.

Video frames change little frame-to-frame; the reference cold-starts every
frame at the dlatent average and pays the full step budget each time
(projector_file_writer.py:617-802). `--warm-start` initializes each frame at
its predecessor's final latents instead. This measures the quality-at-equal-
steps gap on a synthetic coherent sequence: targets rendered from a slow
latent walk (reachable by construction), projected per-frame with a fixed
step budget, cold vs warm, plus one long cold anchor run for the
"steps-to-equal-distance" comparison.

Usage: tools/tpu_retry.sh /tmp/warm.log python tools/bench_warm_start.py \
           [resolution] [steps] [frames] [anchor_steps]
Prints one JSON line.
"""

import json
import sys


def main() -> None:
    resolution = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    frames = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    anchor_steps = int(sys.argv[4]) if len(sys.argv) > 4 else 4 * steps

    sys.path.insert(0, "/root/repo")
    import gance_tpu  # noqa: F401
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gance_tpu.models.stylegan2 import (
        GeneratorConfig,
        images_to_uint8,
        init_generator_params,
        mapping_apply,
        synthesis_apply,
    )
    from gance_tpu.projection.projector import ProjectorSettings, TPUProjector

    config = GeneratorConfig(resolution=resolution)
    with jax.default_device(jax.devices("cpu")[0]):
        params = init_generator_params(jax.random.PRNGKey(0), config)
    params = jax.device_put(params, jax.devices()[0])

    # Coherent target sequence: a slow walk in w space (per-frame step sized so
    # consecutive frames differ visibly but modestly, like adjacent video frames).
    w0 = mapping_apply(params, jax.random.normal(jax.random.PRNGKey(1), (1, 512)), config)
    w1 = mapping_apply(params, jax.random.normal(jax.random.PRNGKey(2), (1, 512)), config)
    targets = []
    for t in range(frames):
        alpha = 0.05 * t  # 5% of the way to a second sample per frame
        w_t = (1 - alpha) * w0 + alpha * w1
        dlat = jnp.tile(w_t[:, None, :], (1, config.num_style_rows, 1))
        img = synthesis_apply(params, dlat, config, noise_mode="const")
        targets.append(np.asarray(images_to_uint8(img))[0])
    targets = np.stack(targets)
    print(f"targets ready: {targets.shape}", file=sys.stderr, flush=True)

    def make_projector(num_steps):
        return TPUProjector(
            params, config,
            settings=ProjectorSettings(
                num_steps=num_steps, compute_dtype="bfloat16",
                scan_segment=min(num_steps, 250),
            ),
            expected_time_per_step=None,
        )

    projector = make_projector(steps)
    cold_dists, warm_dists = [], []
    cold_finals, warm_finals = [], []
    previous = None
    previous_noises = None
    for t in range(frames):
        cold = projector.project(targets[t], want_step_images=False)
        cold_dists.append(cold.final_distance)
        cold_finals.append(cold.final_latents[0, 0])
        if previous is None:
            warm = cold  # frame 0 has no predecessor; warm == cold by definition
        else:
            # jitter-free: the annealed exploration jitter erases the head
            # start (first measurement run: warm@100 ~ cold@100 with jitter on)
            warm = projector.project(
                targets[t], want_step_images=False, initial_latents=previous,
                initial_noises=previous_noises, noise_factor=0.0,
            )
        warm_dists.append(warm.final_distance)
        warm_finals.append(warm.final_latents[0, 0])
        previous = warm.final_latents[0, 0]  # (512,) row for the next frame
        previous_noises = warm.noises  # [(1, h, w, 1), ...]
        print(
            f"frame {t}: cold@{steps}={cold.final_distance:.4f} "
            f"warm@{steps}={warm.final_distance:.4f}",
            file=sys.stderr, flush=True,
        )

    # Long cold anchor on the last frame: how many steps does cold need to
    # match warm's distance?
    anchor = make_projector(anchor_steps).project(
        targets[-1], want_step_images=False
    )
    print(
        f"anchor: cold@{anchor_steps}={anchor.final_distance:.4f}",
        file=sys.stderr, flush=True,
    )

    print(
        json.dumps(
            {
                "metric": (
                    f"{resolution}px warm-start projection distance at {steps} "
                    f"steps (coherent frames)"
                ),
                "cold_mean_distance": round(float(np.mean(cold_dists[1:])), 4),
                "warm_mean_distance": round(float(np.mean(warm_dists[1:])), 4),
                "per_frame_cold": [round(float(d), 4) for d in cold_dists],
                "per_frame_warm": [round(float(d), 4) for d in warm_dists],
                "anchor_steps": anchor_steps,
                "anchor_cold_distance": round(float(anchor.final_distance), 4),
                "steps": steps,
                "frames": frames,
                # adjacent-frame latent jitter: projection files feed video
                # blending, so smoother trajectories mean less frame flicker
                "cold_adjacent_w_dist": round(float(np.mean([
                    np.linalg.norm(a - b)
                    for a, b in zip(cold_finals[1:], cold_finals[:-1])
                ])), 3),
                "warm_adjacent_w_dist": round(float(np.mean([
                    np.linalg.norm(a - b)
                    for a, b in zip(warm_finals[1:], warm_finals[:-1])
                ])), 3),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
