"""
Multi-chip parallelism — net-new capability relative to the single-GPU reference
(SURVEY.md §2.10: "Distributed comm backend: none"). Scaling is jax.sharding/GSPMD:
pick a Mesh, annotate shardings, let XLA insert the collectives over ICI.

  * data axis  — frame/sample batches shard across chips (the pipeline's natural
    parallelism: synthesis frames are independent).
  * model axis — tensor parallelism over channel dimensions of the large convs and
    dense layers (weights sharded on output channels; activations on channels).
  * network axis — network-parallel serving: N networks resident on N device
    groups at once (network_parallel.py), dissolving the reference's expensive
    per-switch process respawn into one SPMD program.
"""

from gance_tpu.parallel.distributed import (
    global_batch,
    global_scan_block,
    initialize_distributed,
    is_coordinator,
)
from gance_tpu.parallel.mesh import (
    create_mesh,
    shard_batch,
    generator_param_sharding,
    discriminator_param_sharding,
)
from gance_tpu.parallel.network_parallel import (
    NetworkParallelSynthesis,
    create_network_mesh,
    stack_network_params,
)
from gance_tpu.parallel.sharded_synthesis import make_sharded_synthesis
from gance_tpu.parallel.training import (
    TrainingState,
    init_training_state,
    make_train_step,
)

__all__ = [
    "initialize_distributed",
    "global_batch",
    "global_scan_block",
    "is_coordinator",
    "create_mesh",
    "shard_batch",
    "generator_param_sharding",
    "discriminator_param_sharding",
    "make_sharded_synthesis",
    "NetworkParallelSynthesis",
    "create_network_mesh",
    "stack_network_params",
    "TrainingState",
    "init_training_state",
    "make_train_step",
]
