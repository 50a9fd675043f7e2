"""
Worker process for the multi-host DAEMON test (tests/test_serving_multihost.py).

Joins an N-process CPU `jax.distributed` runtime (4 virtual devices per
process) and runs the ONLINE serving stack over the process-spanning mesh:
process 0 binds the HTTP daemon, wraps its networks in MultiHostNetwork
proxies, drives real HTTP requests through ServingClient against itself, and
saves the responses; the other process mirrors every device dispatch through
the control channel (serving/multihost.py) so all collectives have their
participants. The parent test replays the same requests single-process on
its own 8 virtual devices and asserts bit-identical images (pure DP has no
reductions).

Invoked as `python -m tests.distributed_daemon_worker <process_id>
<num_processes> <dist_port> <workdir> <control_port>`; never collected by
pytest itself.
"""

import os
import sys
from pathlib import Path


def main() -> None:
    process_id = int(sys.argv[1])
    num_processes = int(sys.argv[2])
    dist_port = sys.argv[3]
    workdir = Path(sys.argv[4])
    control_port = int(sys.argv[5])

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
    ).strip()

    import jax

    # The axon TPU plugin ignores the env var; the config flag wins (conftest.py).
    jax.config.update("jax_platforms", "cpu")

    from gance_tpu.parallel.distributed import initialize_distributed

    initialize_distributed(f"localhost:{dist_port}", num_processes, process_id)

    import numpy as np

    from gance_tpu.parallel.mesh import create_mesh
    from gance_tpu.serving.multihost import (
        ControlCoordinator,
        network_fingerprint,
        run_worker,
        wrap_networks_for_multihost,
    )
    from gance_tpu.synthesis.runtime import SynthesisNetwork

    mesh = create_mesh()  # pure DP over all 8 global devices
    networks = [SynthesisNetwork.from_pkl(workdir / "net.pkl", mesh=mesh)]

    if process_id == 0:
        from gance_tpu.serving import ServingClient, SynthesisDaemon

        coordinator = ControlCoordinator(
            num_workers=num_processes - 1,
            bind_host="127.0.0.1",
            port=control_port,
            heartbeat_interval_s=1.0,
        )
        coordinator.accept(network_fingerprint(networks), timeout_s=300.0)
        proxies = wrap_networks_for_multihost(networks, coordinator)
        with SynthesisDaemon(proxies, port=0, max_batch=8) as daemon:
            client = ServingClient(f"http://127.0.0.1:{daemon.port}", timeout_s=300.0)
            assert client.health()["ok"]
            out_z = client.synthesize(latents=np.load(workdir / "z.npy"))
            out_w = client.synthesize(dlatents=np.load(workdir / "w.npy"))
            np.save(workdir / "out_z.npy", out_z)
            np.save(workdir / "out_w.npy", out_w)
        coordinator.shutdown()
        assert not coordinator.failed.is_set(), "control channel failed"
    else:
        served = run_worker(
            networks, "127.0.0.1", control_port, process_id, recv_timeout_s=300.0
        )
        assert served == 2, f"worker mirrored {served} dispatches, expected 2"


if __name__ == "__main__":
    main()
