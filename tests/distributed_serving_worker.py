"""
Worker process for the multi-host SERVING test (tests/test_distributed.py).

Runs the REAL `music_into_networks noise-blend` CLI with --dist-* flags: joins
an N-process CPU `jax.distributed` runtime (4 virtual devices per process),
lets the pipeline default to pure DP over all 8 global devices — every frame
batch shards across the process boundary (Gloo here, DCN on real pods), host
fetches allgather the frames to every host — and relies on coordinator-only
writer gating: process 0 writes the video, the other process drives the
identical collective control flow and writes nothing.

Invoked as `python -m tests.distributed_serving_worker <process_id>
<num_processes> <port> <workdir>`; never collected by pytest itself.
"""

import os
import sys


def main() -> None:
    process_id = sys.argv[1]
    num_processes = sys.argv[2]
    port = sys.argv[3]
    workdir = sys.argv[4]

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
    ).strip()

    import jax

    # The axon TPU plugin ignores the env var; the config flag wins (conftest.py).
    jax.config.update("jax_platforms", "cpu")

    from gance_tpu.cli.music_into_networks import cli

    cli(
        args=[
            "noise-blend",
            "--wav", f"{workdir}/sound.wav",
            "--output-path", f"{workdir}/multi.mp4",
            "--network-path", f"{workdir}/net.pkl",
            "--frames-to-visualize", "12",
            "--output-fps", "30",
            "--output-side-length", "32",
            "--dist-coordinator", f"localhost:{port}",
            "--dist-num-processes", num_processes,
            "--dist-process-id", process_id,
        ]
    )


if __name__ == "__main__":
    main()
