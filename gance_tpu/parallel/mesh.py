"""
Device mesh construction + sharding specs for StyleGAN2 params/activations.

Sharding policy (scaling-book style: annotate, let GSPMD insert collectives):
  * batch axes of activations -> 'data'
  * output-channel axes of the big conv/dense weights -> 'model' (tensor parallel);
    weights below a size threshold stay replicated (collective cost would dominate)
  * per-layer noise buffers, biases, scalars -> replicated
"""

from functools import lru_cache as _functools_lru_cache
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Params = Dict[str, Any]

# Weights smaller than this stay replicated: an all-gather per layer costs more
# than the memory saved.
_MIN_SHARDED_PARAM = 1 << 16  # 64k elements


def _hybrid_device_grid(
    devices: list, data_parallel: int, model_parallel: int
) -> np.ndarray:
    """
    Arrange multi-slice devices into a (data, model) grid whose axes respect the
    interconnect hierarchy (scaling-book layout): the 'model' axis lives entirely
    WITHIN a slice (tensor-parallel collectives ride ICI every layer), and the
    'data' axis varies slice index slowest (the only cross-DCN traffic is the
    once-per-step gradient psum / the never-communicating serving batch axis).

    Pure function over any objects with a `slice_index` attribute (testable
    without multi-slice hardware).
    """
    slices: dict = {}
    for device in devices:
        slices.setdefault(getattr(device, "slice_index", 0), []).append(device)
    per_slice = {k: len(v) for k, v in slices.items()}
    if len(set(per_slice.values())) != 1:
        raise ValueError(f"Uneven devices per slice: {per_slice}")
    slice_size = next(iter(per_slice.values()))
    if slice_size % model_parallel:
        raise ValueError(
            f"model axis {model_parallel} must divide the slice size {slice_size} "
            "(tensor-parallel collectives must stay on ICI)"
        )
    dp_per_slice = slice_size // model_parallel
    if data_parallel != dp_per_slice * len(slices):
        raise ValueError(
            f"dp={data_parallel} != per-slice dp {dp_per_slice} x {len(slices)} slices"
        )
    rows = []
    for slice_index in sorted(slices):
        rows.append(
            np.asarray(slices[slice_index], dtype=object).reshape(
                dp_per_slice, model_parallel
            )
        )
    # slice index varies slowest along 'data'
    return np.concatenate(rows, axis=0)


def create_mesh(
    n_devices: Optional[int] = None,
    data_parallel: Optional[int] = None,
) -> Mesh:
    """
    Build a ('data', 'model') mesh over the available devices. By default the data
    axis gets as many devices as possible while keeping the model axis a power-of-2
    divisor (1, 2 or 4) — frame synthesis is embarrassingly data-parallel, so DP
    should dominate unless the model doesn't fit.

    Multi-slice topologies (devices reporting distinct `slice_index`es, i.e.
    ICI islands joined by DCN) are laid out hierarchically: 'model' never
    crosses a slice boundary and 'data' varies slice index slowest, so every
    per-layer collective rides ICI and only the batch axis touches DCN.
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

    n_slices = len({getattr(device, "slice_index", 0) for device in devices})
    if n_slices > 1:
        grid = _hybrid_device_grid(list(devices), data_parallel, model_parallel)
    else:
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


def fetch_to_host(value: Any) -> np.ndarray:
    """
    Device array -> host numpy, multi-host-safe: an array sharded over a
    process-spanning mesh is not fully addressable from one host, so it is
    allgathered to every host first. This is a COLLECTIVE in multi-process
    runs — every process must reach every fetch in the same order (the serving
    pipelines guarantee it by running the identical frame loop on all hosts,
    with only the coordinator's writers doing real I/O). Two fast paths skip
    the collective: fully-addressable arrays (single-process), and
    fully-REPLICATED multi-process arrays, whose local shard already holds the
    complete value — materializing it is a plain D2H copy, safe from any
    thread at any time (replicate_for_fetch exploits this to move the
    collective out of egress threads).
    """
    if isinstance(value, jax.Array) and not value.is_fully_addressable:
        if value.sharding.is_fully_replicated:
            return np.asarray(value.addressable_shards[0].data)
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(value, tiled=True))
    return np.asarray(value)


@_functools_lru_cache(maxsize=16)
def replicate_for_fetch(mesh: Mesh):
    """
    Compiled identity that gathers a mesh-sharded array into a fully
    REPLICATED one. In multi-process runs this is the fetch collective made
    explicit as a PROGRAM: launching it keeps cross-process program order in
    the launching thread (where order is controlled), while the subsequent
    host materialization (`fetch_to_host`'s replicated fast path) is a local
    D2H copy that any thread may do later — which lets pipelines overlap
    device compute with host egress without reordering collectives.
    """
    return jax.jit(lambda x: x, out_shardings=replicated(mesh))
