"""
Multi-process (multi-host / multi-slice) runtime support.

The reference is a single-GPU, single-host system (SURVEY §2.10 — no NCCL/MPI/
torch.distributed anywhere in its dependency set), so the distributed backend is
net-new capability. This module is the process-level half of it; the mesh-level
half (the hierarchical ('data', 'model') layout that keeps tensor-parallel
collectives on ICI and lets only the batch axis touch DCN) lives in
`gance_tpu/parallel/mesh.py`.

Pieces:
  * `initialize_distributed` — `jax.distributed.initialize` wrapper (one JAX
    process per TPU host; afterwards `jax.devices()` is the GLOBAL device list
    and `create_mesh()` builds one process-spanning mesh over it).
  * `global_batch` / `global_scan_block` — the host-local → global-array
    hand-off: each process loads only its shard of the batch
    (`parallel/data.py` shards the file list by `process_index`), and these
    assemble the per-host arrays into ONE global jax.Array laid out over the
    mesh's 'data' axis without any host ever materializing the full batch.
    Inside jit nothing changes: the program was already written against global
    shapes with sharding constraints, GSPMD inserts the cross-host collectives.

Certified by an executed multi-process test (tests/test_distributed.py): two
OS processes × four virtual CPU devices each, joined over the coordinator into
an 8-device ('data', 'model') mesh, run real sharded train steps whose final
state matches a single-process 8-device run of the same global batches.
"""

from typing import Optional, Sequence, Union

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gance_tpu.utils.logging import LOGGER

ArrayLike = Union[np.ndarray, jax.Array]


def initialize_distributed(
    coordinator_address: str,
    num_processes: int,
    process_id: int,
    local_device_ids: Optional[Sequence[int]] = None,
) -> None:
    """
    Join this process into a multi-process JAX runtime.

    Must run before the first use of any JAX backend (device queries, jit,
    array creation) — JAX fixes its process topology at backend init. The train
    CLI therefore takes the coordinator flags and calls this before touching
    devices; library users embedding gance_tpu should do the same.

    Idempotent for the same (coordinator, num_processes, process_id) triple so
    REPL/tool code can call it defensively; raises on a conflicting re-init
    (JAX cannot change topology mid-process).
    """
    state = getattr(initialize_distributed, "_initialized", None)
    wanted = (coordinator_address, int(num_processes), int(process_id))
    if state is not None:
        if state == wanted:
            return
        raise RuntimeError(
            f"jax.distributed already initialized as {state}; cannot re-init as {wanted}"
        )
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=int(num_processes),
        process_id=int(process_id),
        local_device_ids=local_device_ids,
    )
    initialize_distributed._initialized = wanted  # type: ignore[attr-defined]
    LOGGER.info(
        "jax.distributed up: process %d/%d, %d local / %d global devices",
        jax.process_index(),
        jax.process_count(),
        jax.local_device_count(),
        jax.device_count(),
    )


def global_batch(
    mesh: Mesh, local_batch: ArrayLike, batch_axis: str = "data"
) -> ArrayLike:
    """
    Assemble per-process batch shards into one global (B_global, ...) array
    sharded over the mesh's batch axis, B_global = B_local × process_count.

    Every participating process must call this with its own local shard (the
    result is a single global jax.Array addressable only piecewise). With one
    process the host data is returned unchanged — jit places it under its own
    sharding constraints, which (unlike an eager device_put) tolerate batch
    sizes the 'data' axis does not divide — so call sites need no
    single-vs-multi-process branch.
    """
    local = np.asarray(local_batch)
    if jax.process_count() == 1:
        return local
    sharding = NamedSharding(mesh, P(batch_axis))
    return jax.make_array_from_process_local_data(sharding, local)


def global_scan_block(
    mesh: Mesh, local_block: ArrayLike, batch_axis: str = "data"
) -> ArrayLike:
    """
    `global_batch` for a scanned block of batches: (S, B_local, ...) →
    (S, B_global, ...) sharded P(None, batch_axis) — the scan (step) axis is
    sequential and must stay unsharded.
    """
    local = np.asarray(local_block)
    if jax.process_count() == 1:
        return local
    sharding = NamedSharding(mesh, P(None, batch_axis))
    return jax.make_array_from_process_local_data(sharding, local)


def is_coordinator() -> bool:
    """True on the process that should own singleton host-side work (logs, exports)."""
    return jax.process_index() == 0
