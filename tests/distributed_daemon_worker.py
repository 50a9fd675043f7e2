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
        from gance_tpu.serving.multihost import MultiHostNetwork

        coordinator = ControlCoordinator(
            num_workers=num_processes - 1,
            bind_host="127.0.0.1",
            port=control_port,
            heartbeat_interval_s=1.0,
        )
        coordinator.accept(network_fingerprint(networks), timeout_s=300.0)
        proxies = wrap_networks_for_multihost(networks, coordinator)

        def network_loader(path: str, index: int):
            # Two-phase: parse locally, run prepare+commit on the worker,
            # then from_staged enters the mesh-placement collective together
            # with the worker's commit (a single-phase load deadlocks here —
            # the placement is a cross-process collective).
            staged = SynthesisNetwork.stage_pkl(Path(path))
            coordinator.broadcast_load(path, index)
            return MultiHostNetwork(
                SynthesisNetwork.from_staged(staged, Path(path), mesh=mesh),
                coordinator,
                index,
            )

        with SynthesisDaemon(
            proxies, port=0, max_batch=8,
            network_loader=network_loader,
            network_unloader=coordinator.broadcast_unload,
        ) as daemon:
            client = ServingClient(f"http://127.0.0.1:{daemon.port}", timeout_s=300.0)
            assert client.health()["ok"]
            out_z = client.synthesize(latents=np.load(workdir / "z.npy"))
            out_w = client.synthesize(dlatents=np.load(workdir / "w.npy"))
            np.save(workdir / "out_z.npy", out_z)
            np.save(workdir / "out_w.npy", out_w)
            # hot rollout mid-serve: a REAL pickle loads onto the
            # process-spanning mesh on every host, then serves
            loaded = client.load_network(str(workdir / "net2.pkl"))
            assert loaded["index"] == 1 and loaded["name"] == "net2", loaded
            out_z2 = client.synthesize(
                latents=np.load(workdir / "z.npy"), network="net2"
            )
            np.save(workdir / "out_z2.npy", out_z2)
            assert client.unload_network("net2")["drained"] is True
        coordinator.shutdown()
        assert not coordinator.failed.is_set(), "control channel failed"
    else:
        served = run_worker(
            networks, "127.0.0.1", control_port, process_id,
            recv_timeout_s=300.0,
            load_prepare=lambda path, _i: SynthesisNetwork.stage_pkl(
                Path(path)
            ),
            load_commit=lambda staged, path, _i: SynthesisNetwork.from_staged(
                staged, Path(path), mesh=mesh
            ),
        )
        assert served == 3, f"worker mirrored {served} dispatches, expected 3"


if __name__ == "__main__":
    main()
