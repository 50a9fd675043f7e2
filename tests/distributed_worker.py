"""
Worker process for tests/test_distributed.py.

Joins an N-process CPU `jax.distributed` runtime (4 virtual devices per
process), builds ONE process-spanning ('data', 'model') mesh, runs real sharded
train steps on it (the cross-process gradient collectives ride Gloo here, DCN
on real multi-host TPU), then dumps — via the coordinator only — the gathered
global batches and final state so the test can replay them single-process and
assert trajectory equality.

Invoked as `python -m tests.distributed_worker <process_id> <num_processes>
<port> <outdir>`; never collected by pytest itself.
"""

import os
import pickle
import sys
from pathlib import Path


def main() -> None:
    process_id = int(sys.argv[1])
    num_processes = int(sys.argv[2])
    port = sys.argv[3]
    outdir = Path(sys.argv[4])

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
    ).strip()

    import jax

    # The axon TPU plugin ignores the env var; the config flag wins (conftest.py).
    jax.config.update("jax_platforms", "cpu")

    from gance_tpu.parallel.distributed import (
        global_batch,
        initialize_distributed,
        is_coordinator,
    )

    initialize_distributed(f"localhost:{port}", num_processes, process_id)

    import numpy as np
    from jax.experimental import multihost_utils

    from gance_tpu.models.stylegan2 import GeneratorConfig
    from gance_tpu.parallel.mesh import create_mesh
    from gance_tpu.parallel.training import (
        TrainingConfig,
        init_training_state,
        make_train_step,
        shard_training_state,
    )

    assert jax.device_count() == 4 * num_processes, jax.devices()
    assert jax.local_device_count() == 4

    model_config = GeneratorConfig(
        resolution=16, fmap_base=256, fmap_max=32, latent_size=16,
        dlatent_size=16, mapping_layers=2, mapping_fmaps=16,
    )
    # Short reg intervals so the lazy R1/path-length branches actually run
    # (and their psums cross processes) within the few test steps.
    train_config = TrainingConfig(r1_interval=2, pl_interval=2)

    # data=4 x model=2: the model pairs sit within a process, the data axis
    # spans both processes — the hierarchical layout mesh.py prescribes.
    mesh = create_mesh(data_parallel=4)

    state = init_training_state(jax.random.PRNGKey(0), model_config, train_config)
    state = shard_training_state(mesh, state, train_config)
    train_step = make_train_step(model_config, train_config, mesh=mesh)

    batches = []
    metrics = {}
    for step in range(3):
        # Per-process data, as in production (each host loads its file shard).
        rng = np.random.RandomState(1000 * process_id + step)
        local = rng.uniform(-1.0, 1.0, size=(2, 16, 16, 3)).astype(np.float32)
        reals = global_batch(mesh, local)
        # Record the assembled global batch so the single-process replay feeds
        # byte-identical data regardless of device-order conventions.
        batches.append(np.asarray(multihost_utils.process_allgather(reals, tiled=True)))
        state, metrics = train_step(state, reals, np.asarray(jax.random.PRNGKey(step)))

    host_state = multihost_utils.process_allgather(state, tiled=True)
    if is_coordinator():
        with open(outdir / "result.pkl", "wb") as f:
            pickle.dump(
                {
                    "batches": batches,
                    "state": host_state,
                    "metrics": {k: np.asarray(v) for k, v in metrics.items()},
                },
                f,
            )


if __name__ == "__main__":
    main()
