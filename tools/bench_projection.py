"""
LPIPS projection throughput on the real TPU vs the reference's headline number.

The reference projects one 1024px frame in ~10 minutes per 1000 steps on its
CUDA dev GPU (projector_file_writer.py:3-7) with a 60 s/step crash watchdog.
This measures our jitted projector step (synthesis forward + perceptual
forward/backward + Adam update, all one XLA program) at full config-f scale.

Prints ONE JSON line with steps/sec and the projected wall time for the
reference's default 1000-step frame projection.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")
import gance_tpu  # noqa: F401
import jax
import numpy as np


def main() -> None:
    from gance_tpu.models.stylegan2 import GeneratorConfig, init_generator_params
    from gance_tpu.projection.projector import ProjectorSettings, TPUProjector

    resolution = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    compute_dtype = sys.argv[3] if len(sys.argv) > 3 else "float32"
    batch = int(sys.argv[4]) if len(sys.argv) > 4 else 1

    config = GeneratorConfig(resolution=resolution)
    with jax.default_device(jax.devices("cpu")[0]):
        params = init_generator_params(jax.random.PRNGKey(0), config)
    params = jax.device_put(params, jax.devices()[0])

    projector = TPUProjector(
        params, config,
        settings=ProjectorSettings(num_steps=steps, compute_dtype=compute_dtype),
        expected_time_per_step=None,  # fully pipelined: no per-step host sync
    )
    targets = (np.random.RandomState(0).rand(batch, resolution, resolution, 3) * 255).astype(
        np.uint8
    )

    print(f"device: {jax.devices()[0]}; compiling...", file=sys.stderr, flush=True)
    result = projector.project_batch(targets)[0]
    # First run includes compile; time a second run for the steady-state rate.
    t0 = time.time()
    result = projector.project_batch(targets)[0]
    elapsed = time.time() - t0

    steps_per_sec = steps / elapsed
    # a 1000-step run projects `batch` frames concurrently
    seconds_per_1000 = 1000.0 / steps_per_sec / batch
    print(
        f"{steps} steps in {elapsed:.1f}s; final LPIPS-form distance "
        f"{result.final_distance:.4f}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": f"{resolution}px LPIPS projection steps/sec/chip ({compute_dtype}, batch {batch})",
                "value": round(steps_per_sec, 2),
                "unit": "steps/sec",
                "reference_1000step_frame_sec": 600.0,
                "ours_1000step_frame_sec": round(seconds_per_1000, 1),
                "frames_per_projection": batch,
                "speedup_vs_reference": round(600.0 / seconds_per_1000, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
