"""
Multi-chip batched synthesis: one jitted program with frame batches sharded over the
mesh's data axis and the large weights tensor-parallel over the model axis. This is
the scale-out path for the production pipeline (frames are independent, so DP is
near-perfect; collectives only appear inside tensor-parallel convs and at host
egress).
"""

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from gance_tpu.models.stylegan2 import (
    DEFAULT_TRUNCATION_PSI,
    GeneratorConfig,
    generator_apply,
    synthesis_apply,
)
from gance_tpu.parallel.mesh import generator_param_sharding, shard_batch

Params = Dict[str, Any]


def make_sharded_synthesis(
    mesh: Mesh,
    params: Params,
    config: GeneratorConfig,
    truncation_psi: Optional[float] = DEFAULT_TRUNCATION_PSI,
    compute_dtype: Any = jnp.float32,
) -> Callable[[jax.Array], jax.Array]:
    """
    Build a compiled z-batch -> uint8 image-batch function over `mesh`. The param
    pytree is placed according to the tensor-parallel sharding policy once; calls
    take (global) batches whose leading axis shards over 'data'.
    """
    param_shardings = generator_param_sharding(mesh, params)
    sharded_params = jax.device_put(params, param_shardings)
    batch_sharding = shard_batch(mesh)

    @jax.jit
    def synthesize(z: jax.Array) -> jax.Array:
        z = jax.lax.with_sharding_constraint(z, batch_sharding)
        # uint8_output fuses the serving epilogue (skip add / bias / quantize
        # in phase space, uint8-only interleave) — elementwise per shard, so
        # it composes with GSPMD exactly like the float epilogue did
        # (bit-identical; covered by the dryrun equality check).
        images = generator_apply(
            sharded_params,
            z,
            config,
            truncation_psi=truncation_psi,
            noise_mode="const",
            compute_dtype=compute_dtype,
            uint8_output=True,
        )
        return jax.lax.with_sharding_constraint(images, batch_sharding)

    return synthesize


def make_sharded_matrix_synthesis(
    mesh: Mesh,
    params: Params,
    config: GeneratorConfig,
    compute_dtype: Any = jnp.float32,
) -> Callable[[jax.Array], jax.Array]:
    """Same as make_sharded_synthesis but for w+ (B, R, 512) inputs."""
    param_shardings = generator_param_sharding(mesh, params)
    sharded_params = jax.device_put(params, param_shardings)
    batch_sharding = shard_batch(mesh)

    @jax.jit
    def synthesize(dlatents: jax.Array) -> jax.Array:
        dlatents = jax.lax.with_sharding_constraint(dlatents, batch_sharding)
        images = synthesis_apply(
            sharded_params, dlatents, config, noise_mode="const",
            compute_dtype=compute_dtype, uint8_output=True,
        )
        return jax.lax.with_sharding_constraint(images, batch_sharding)

    return synthesize
