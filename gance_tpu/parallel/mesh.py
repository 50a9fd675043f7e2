"""
Device mesh construction + sharding specs for StyleGAN2 params/activations.

Sharding policy (scaling-book style: annotate, let GSPMD insert collectives):
  * batch axes of activations -> 'data'
  * output-channel axes of the big conv/dense weights -> 'model' (tensor parallel);
    weights below a size threshold stay replicated (collective cost would dominate)
  * per-layer noise buffers, biases, scalars -> replicated
"""

from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Params = Dict[str, Any]

# Weights smaller than this stay replicated: an all-gather per layer costs more
# than the memory saved.
_MIN_SHARDED_PARAM = 1 << 16  # 64k elements


def create_mesh(
    n_devices: Optional[int] = None,
    data_parallel: Optional[int] = None,
) -> Mesh:
    """
    Build a ('data', 'model') mesh over the available devices. By default the data
    axis gets as many devices as possible while keeping the model axis a power-of-2
    divisor (1, 2 or 4) — frame synthesis is embarrassingly data-parallel, so DP
    should dominate unless the model doesn't fit.
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    count = len(devices)
    if data_parallel is None:
        # Frame synthesis is embarrassingly data-parallel: pure DP by default.
        # Tensor parallelism is an explicit choice (pass data_parallel < count)
        # for models that don't fit one chip.
        data_parallel = count
        model_parallel = 1
    else:
        if count % data_parallel:
            raise ValueError(f"{count} devices not divisible by dp={data_parallel}")
        model_parallel = count // data_parallel
    grid = np.asarray(devices).reshape(data_parallel, model_parallel)
    return Mesh(grid, axis_names=("data", "model"))


def shard_batch(mesh: Mesh) -> NamedSharding:
    """Sharding for (B, ...) activations: batch over 'data', rest replicated."""
    return NamedSharding(mesh, P("data"))


def _leaf_spec(path: Tuple[str, ...], leaf: Any) -> P:
    """PartitionSpec for one generator/discriminator param leaf."""
    size = int(np.prod(np.shape(leaf))) if np.ndim(leaf) else 1
    name = path[-1] if path else ""
    if size < _MIN_SHARDED_PARAM:
        return P()
    if name == "weight":
        # conv (kh, kw, cin, cout) or dense (in, out): shard the output channels
        return P(*([None] * (np.ndim(leaf) - 1) + ["model"]))
    if name == "mod_weight":
        # (w_dim, cin): replicated — cin must match the conv's unsharded input
        return P()
    # consts, noise buffers, biases
    return P()


def _tree_sharding(mesh: Mesh, tree: Params) -> Params:
    def walk(node: Any, path: Tuple[str, ...]):
        if isinstance(node, dict):
            return {key: walk(value, path + (key,)) for key, value in node.items()}
        return NamedSharding(mesh, _leaf_spec(path, node))

    return walk(tree, ())


def generator_param_sharding(mesh: Mesh, params: Params) -> Params:
    """Sharding pytree for generator params (big conv/dense kernels on 'model')."""
    return _tree_sharding(mesh, params)


def discriminator_param_sharding(mesh: Mesh, params: Params) -> Params:
    """Sharding pytree for discriminator params."""
    return _tree_sharding(mesh, params)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
