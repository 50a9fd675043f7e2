"""
Multi-chip parallelism — net-new capability relative to the single-GPU reference
(SURVEY.md §2.10: "Distributed comm backend: none"). Scaling is jax.sharding/GSPMD:
pick a Mesh, annotate shardings, let XLA insert the collectives over ICI.

  * data axis  — frame/sample batches shard across chips (the pipeline's natural
    parallelism: synthesis frames are independent).
  * model axis — tensor parallelism over channel dimensions of the large convs and
    dense layers (weights sharded on output channels; activations on channels).
"""

from gance_tpu.parallel.mesh import (
    create_mesh,
    shard_batch,
    generator_param_sharding,
    discriminator_param_sharding,
)
from gance_tpu.parallel.sharded_synthesis import make_sharded_synthesis
from gance_tpu.parallel.training import (
    TrainingState,
    init_training_state,
    make_train_step,
)

__all__ = [
    "create_mesh",
    "shard_batch",
    "generator_param_sharding",
    "discriminator_param_sharding",
    "make_sharded_synthesis",
    "TrainingState",
    "init_training_state",
    "make_train_step",
]
