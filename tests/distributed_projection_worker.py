"""
Worker process for the multi-host projection test (tests/test_distributed.py).

Runs the REAL `project_video_to_file` CLI with --dist-* flags: joins an
N-process CPU `jax.distributed` runtime (4 virtual devices per process), lets
the CLI default the mesh to pure DP over all 8 global devices, projects a video
whose frame batch shards across the process boundary (Gloo here, DCN on real
pods), and relies on the coordinator-only writer gating — process 0 writes the
HDF5 projection file, the other process drives the identical collective control
flow through the null writer.

Invoked as `python -m tests.distributed_projection_worker <process_id>
<num_processes> <port> <workdir> [output_relpath]`; never collected by pytest
itself. The optional output_relpath (default multi.hdf5) lets the
writer-failure-abort test point the coordinator at an unwritable path.
"""

import os
import sys


def main() -> None:
    process_id = sys.argv[1]
    num_processes = sys.argv[2]
    port = sys.argv[3]
    workdir = sys.argv[4]
    output_relpath = sys.argv[5] if len(sys.argv) > 5 else "multi.hdf5"

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
    ).strip()

    import jax

    # The axon TPU plugin ignores the env var; the config flag wins (conftest.py).
    jax.config.update("jax_platforms", "cpu")

    from gance_tpu.cli.project_video_to_file import cli

    cli(
        args=[
            "videos",
            "--path-to-network", f"{workdir}/net.pkl",
            "--steps-per-projection", "4",
            "--projection-batch", "4",
            "--video-output", f"{workdir}/source.mp4", f"{workdir}/{output_relpath}",
            "--dist-coordinator", f"localhost:{port}",
            "--dist-num-processes", num_processes,
            "--dist-process-id", process_id,
        ]
    )


if __name__ == "__main__":
    main()
