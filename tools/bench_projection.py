"""
LPIPS projection throughput on the real TPU vs the reference's headline number.

The reference projects one 1024px frame in ~10 minutes per 1000 steps on its
CUDA dev GPU (projector_file_writer.py:3-7) with a 60 s/step crash watchdog.
This measures our jitted projector step (synthesis forward + perceptual
forward/backward + Adam update, all one XLA program) at full config-f scale.

--data-parallel N shards the frame batch over a ('data','model') mesh with an
N-wide data axis (multi-chip projection). On a single-TPU host, pair it with
--virtual-cpu M to measure frame-equivalent scaling on an M-device virtual CPU
mesh (relative scaling is meaningful there; absolute steps/sec is not).

Prints ONE JSON line with steps/sec and the projected wall time for the
reference's default 1000-step frame projection.
"""

import argparse
import json
import os
import sys
import time


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("resolution", type=int, nargs="?", default=1024)
    parser.add_argument("steps", type=int, nargs="?", default=60)
    parser.add_argument("compute_dtype", type=str, nargs="?", default="float32")
    parser.add_argument("batch", type=int, nargs="?", default=1)
    parser.add_argument(
        "--data-parallel", type=int, default=None,
        help="Shard frames over a mesh with this data-axis size.",
    )
    parser.add_argument(
        "--virtual-cpu", type=int, default=None,
        help="Force CPU with this many virtual devices (scaling experiments).",
    )
    parser.add_argument(
        "--remat", action="store_true",
        help="Rematerialize synthesis blocks in the backward (FLOPs for HBM; "
        "probes whether HBM-pressured large batches recover).",
    )
    args = parser.parse_args()

    if args.virtual_cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        flags = os.environ.get("XLA_FLAGS", "")
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.virtual_cpu}"
        ).strip()

    sys.path.insert(0, "/root/repo")
    import gance_tpu  # noqa: F401
    import jax

    if args.virtual_cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from gance_tpu.models.stylegan2 import GeneratorConfig, init_generator_params
    from gance_tpu.projection.projector import ProjectorSettings, TPUProjector

    resolution, steps = args.resolution, args.steps
    compute_dtype, batch = args.compute_dtype, args.batch

    config = GeneratorConfig(resolution=resolution)
    with jax.default_device(jax.devices("cpu")[0]):
        params = init_generator_params(jax.random.PRNGKey(0), config)

    mesh = None
    if args.data_parallel:
        from gance_tpu.parallel.mesh import create_mesh

        mesh = create_mesh(data_parallel=args.data_parallel)
        print(f"mesh: {dict(mesh.shape)}", file=sys.stderr, flush=True)
    else:
        params = jax.device_put(params, jax.devices()[0])

    projector = TPUProjector(
        params, config,
        settings=ProjectorSettings(
            num_steps=steps, compute_dtype=compute_dtype, remat=args.remat,
        ),
        expected_time_per_step=None,  # fully pipelined: no per-step host sync
        mesh=mesh,
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

    # Two-point measurement: each project_batch pays a constant eager setup
    # (noise init, optimizer init, target prep — one-time RPCs over a tunneled
    # device) that dominates short runs but amortizes over the production
    # 1000-step projection. A second run at 3x the steps isolates the marginal
    # per-step rate: marginal = (t3 - t1) / (2 * steps).
    from dataclasses import replace as dc_replace

    projector3 = TPUProjector(
        params, config,
        settings=dc_replace(projector.settings, num_steps=3 * steps),
        expected_time_per_step=None,
        mesh=mesh,
    )
    projector3.project_batch(targets)  # compile pass
    t0 = time.time()
    projector3.project_batch(targets)
    elapsed3 = time.time() - t0
    marginal_step_sec = max((elapsed3 - elapsed) / (2 * steps), 1e-9)

    steps_per_sec = steps / elapsed
    # a 1000-step run projects `batch` frames concurrently; the constant setup
    # is paid once, so extrapolate with the marginal rate
    seconds_per_1000 = (elapsed - steps * marginal_step_sec + 1000.0 * marginal_step_sec) / batch
    dp = args.data_parallel or 1
    print(
        f"{steps} steps in {elapsed:.1f}s; final LPIPS-form distance "
        f"{result.final_distance:.4f}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": (
                    f"{resolution}px LPIPS projection steps/sec ({compute_dtype}, "
                    f"batch {batch}" + (f", dp={dp}" if dp > 1 else "")
                    + (", remat" if args.remat else "") + ")"
                ),
                "value": round(steps_per_sec, 2),
                "unit": "steps/sec",
                "reference_1000step_frame_sec": 600.0,
                "ours_1000step_frame_sec": round(seconds_per_1000, 1),
                "marginal_ms_per_step": round(marginal_step_sec * 1000, 1),
                "frames_per_projection": batch,
                "frame_equiv_steps_per_sec": round(steps_per_sec * batch, 2),
                "data_parallel": dp,
                "speedup_vs_reference": round(600.0 / seconds_per_1000, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
