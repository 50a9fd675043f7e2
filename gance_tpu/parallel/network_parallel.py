"""
Network-parallel serving: N networks resident on N device groups simultaneously.

The reference pays a full child-process kill + TF re-init for every network
switch, which is why it sorts frames by network index and spills them to disk
(network_visualization.py:653-674) — and SURVEY §2.10 names the TPU-native
answer: "one network per device ⇒ true DP over frames". The runtime already has
the literal form of that (`MultiNetwork(device_per_network=True)`: each network
pinned to one whole device, per-group programs dispatched concurrently from the
host). This module is the SPMD generalization: the mesh gets a 'network' axis,
every network's params live on their own device GROUP (so each network is also
data-parallel within its group — one network is no longer capped at one chip's
throughput), and ONE program synthesizes every network's frame group per
dispatch (one host dispatch instead of N — material on a 1-core host driving a
remote device). Switching isn't amortized — it does not exist.

Trade-offs vs the default windowed-regrouping stream (synthesis/runtime.py):
  * every device group computes the SAME padded group size per dispatch, so the
    mode wins when frame counts per network are roughly balanced (the
    quantized-RMS index streams that drive production runs are) and loses up to
    N× FLOPs when one network dominates — there plain DP over 'data' is right;
  * all N param sets must share one architecture (true for the reference's use:
    the networks are training snapshots of one model, network_functions.py:41-48);
  * HBM holds N/(device count) param sets per chip instead of all N per chip,
    which is also what makes many-network serving fit at all.

Frames route host-side (gather by index, pad to a bucketed group size, scatter
back to stream order) exactly like the windowed stream, but the groups dispatch
as ONE program instead of per-network programs.
"""

import math
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gance_tpu.models.pickle_loader import load_generator
from gance_tpu.models.stylegan2 import (
    DEFAULT_TRUNCATION_PSI,
    GeneratorConfig,
    generator_apply,
    images_to_uint8,
    resize_images,
    resolve_phase_top_block,
    synthesis_apply,
)

Params = Dict[str, Any]


def create_network_mesh(n_networks: int, n_devices: Optional[int] = None) -> Mesh:
    """
    ('network', 'data') mesh: one device group per network, frames within a
    group data-parallel. Uses the largest device prefix divisible by
    n_networks; serving never communicates across the 'network' axis, so any
    assignment works (keep a network's group within one ICI slice when placing
    by hand on multi-slice topologies).
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    per = len(devices) // n_networks
    if per < 1:
        raise ValueError(
            f"{n_networks} networks need at least {n_networks} devices; "
            f"have {len(devices)}"
        )
    grid = np.asarray(devices[: n_networks * per]).reshape(n_networks, per)
    return Mesh(grid, axis_names=("network", "data"))


def stack_network_params(params_list: Sequence[Params]) -> Params:
    """
    Stack per-network param pytrees along a new leading 'network' axis. All
    trees must share structure and leaf shapes (same architecture).

    Stacks in HOST memory (np, not jnp): the stacked tree holds every
    network's params at once, and the whole point of the 'network' axis is
    that no single chip's HBM has to — committing the stack to the default
    device first would spike chip 0 to N param sets before the sharded
    device_put. Loaded .pkl trees are numpy already, so this is also free.
    """
    first = jax.tree.structure(params_list[0])
    for i, tree in enumerate(params_list[1:], start=1):
        if jax.tree.structure(tree) != first:
            raise ValueError(
                f"Network {i} has a different param structure than network 0 — "
                "network-parallel serving requires one shared architecture"
            )
    return jax.tree.map(
        lambda *leaves: np.stack([np.asarray(leaf) for leaf in leaves]),
        *params_list,
    )


class NetworkParallelSynthesis:
    """
    All-networks-resident synthesis over a ('network', 'data') mesh.

    `synthesize(frame_data, network_indices)` is the stream-order surface
    (routing + padding + scatter handled here); `synthesize_grouped` is the
    device-level (N, G, ...) -> (N, G, H, W, 3) primitive.
    """

    def __init__(
        self,
        params_list: Sequence[Params],
        config: GeneratorConfig,
        mesh: Optional[Mesh] = None,
        truncation_psi: Optional[float] = DEFAULT_TRUNCATION_PSI,
        compute_dtype: Any = jnp.float32,
        phase_top_block_mode: Optional[bool] = None,
        output_side_length: Optional[int] = None,
    ) -> None:
        self.n_networks = len(params_list)
        if self.n_networks < 1:
            raise ValueError("Need at least one network")
        self.config = config
        self.mesh = mesh if mesh is not None else create_network_mesh(self.n_networks)
        if self.mesh.shape.get("network") != self.n_networks:
            raise ValueError(
                f"Mesh 'network' axis {self.mesh.shape.get('network')} != "
                f"{self.n_networks} networks"
            )
        self.data_axis = self.mesh.shape.get("data", 1)
        self._truncation_psi = truncation_psi
        self._compute_dtype = compute_dtype
        self._phase_mode = phase_top_block_mode
        self.output_side_length = output_side_length

        stacked = stack_network_params(list(params_list))
        self._param_specs = jax.tree.map(lambda _: P("network"), stacked)
        param_shardings = jax.tree.map(
            lambda spec: NamedSharding(self.mesh, spec), self._param_specs
        )
        self._params = jax.device_put(stacked, param_shardings)
        self._io_sharding = NamedSharding(self.mesh, P("network", "data"))
        self._grouped: Dict[Tuple[bool, bool], Any] = {}

    @classmethod
    def from_pkls(cls, paths: Sequence[Path], **kwargs: Any) -> "NetworkParallelSynthesis":
        loaded = [load_generator(Path(p)) for p in paths]
        params_list = [params for params, _ in loaded]
        config = loaded[0][1]
        for path, (_, other) in zip(paths[1:], loaded[1:]):
            if other != config:
                raise ValueError(
                    f"{path} has architecture {other} != {config} — "
                    "network-parallel serving requires one shared architecture"
                )
        return cls(params_list, config, **kwargs)

    # ---- device-level primitive ----

    def _resolved_phase_mode(self) -> bool:
        """Per-call env resolution so GANCE_TPU_PHASE1024 flips key the program
        cache (same contract as SynthesisNetwork._resolved_phase_mode)."""
        if self._phase_mode is not None:
            return self._phase_mode
        return resolve_phase_top_block(self.config, self._compute_dtype)

    def _build_grouped(self, matrix: bool, phase_mode: bool):
        config = self.config
        psi = self._truncation_psi
        dtype = self._compute_dtype
        side = self.output_side_length

        def body(stacked: Params, grouped: jax.Array) -> jax.Array:
            local = jax.tree.map(lambda leaf: leaf[0], stacked)
            frames = grouped[0]
            # fused uint8 epilogue only when no resize follows (resize needs
            # the float image); bit-identical either way
            fused = side is None or side == config.resolution
            if matrix:
                images = synthesis_apply(
                    local, frames, config, noise_mode="const",
                    compute_dtype=dtype, phase_top_block_mode=phase_mode,
                    uint8_output=fused,
                )
            else:
                images = generator_apply(
                    local, frames, config, truncation_psi=psi, noise_mode="const",
                    compute_dtype=dtype, phase_top_block_mode=phase_mode,
                    uint8_output=fused,
                )
            if fused:
                return images[None]
            images = resize_images(images, side)
            return images_to_uint8(images)[None]

        io_spec = P("network", "data")
        return jax.jit(
            jax.shard_map(
                body,
                mesh=self.mesh,
                in_specs=(self._param_specs, io_spec),
                out_specs=io_spec,
            )
        )

    def synthesize_grouped(self, grouped: np.ndarray) -> jax.Array:
        """
        (n_networks, G, 512) z groups or (n_networks, G, rows, 512) dlatent
        groups -> (n_networks, G, R, R, 3) uint8 on device. G must divide by
        the mesh 'data' axis.
        """
        grouped = np.asarray(grouped)
        if grouped.shape[0] != self.n_networks:
            raise ValueError(
                f"Leading axis {grouped.shape[0]} != {self.n_networks} networks"
            )
        if grouped.shape[1] % self.data_axis:
            raise ValueError(
                f"Group size {grouped.shape[1]} must divide by the data axis "
                f"({self.data_axis})"
            )
        matrix = grouped.ndim == 4
        key = (matrix, self._resolved_phase_mode())
        if key not in self._grouped:
            self._grouped[key] = self._build_grouped(matrix, key[1])
        placed = jax.device_put(grouped.astype(np.float32), self._io_sharding)
        return self._grouped[key](self._params, placed)

    # ---- stream-order surface ----

    @property
    def output_resolution(self) -> int:
        return self.output_side_length or self.config.resolution

    def dispatch(
        self,
        frame_data: np.ndarray,
        network_indices: Optional[np.ndarray] = None,
        batch_size: int = 8,
    ) -> Tuple[int, List[Tuple[jax.Array, List[np.ndarray]]]]:
        """
        Route, pad, and asynchronously dispatch all rounds for `frame_data`
        ((N, 512) vectors or (N, rows, 512) matrices) with per-frame
        `network_indices`. Returns an opaque handle for `gather` — dispatch the
        next window before gathering this one to overlap device compute with
        the device->host pull (the stream path's double buffering).

        `batch_size` caps the per-device frames per dispatch (group size cap =
        batch_size x data-axis); larger inputs dispatch in rounds, all rounds
        sharing one compiled group shape.
        """
        frame_data = np.asarray(frame_data)
        n = frame_data.shape[0]
        if network_indices is None:
            network_indices = np.zeros((n,), dtype=int)
        network_indices = np.asarray(network_indices).astype(int)
        if network_indices.shape != (n,):
            raise ValueError(
                f"network_indices shape {network_indices.shape} != ({n},)"
            )
        if n and (network_indices.min() < 0 or network_indices.max() >= self.n_networks):
            raise ValueError(
                f"network_indices out of range [0, {self.n_networks}) : "
                f"[{network_indices.min()}, {network_indices.max()}]"
            )
        if n == 0:
            return 0, []

        positions = [
            np.flatnonzero(network_indices == i) for i in range(self.n_networks)
        ]
        # Same pow-2 shape-bucketing invariant as the windowed stream (lazy
        # import: runtime's package __init__ pulls sibling modules).
        from gance_tpu.synthesis.runtime import _bucket_size

        largest = max(len(p) for p in positions)
        cap = max(batch_size, 1) * self.data_axis
        rounds = max(1, math.ceil(largest / cap))
        group = _bucket_size(
            math.ceil(largest / rounds), batch_size=cap, multiple=self.data_axis
        )

        dispatched: List[Tuple[jax.Array, List[np.ndarray]]] = []
        for round_index in range(rounds):
            chunk_positions = [
                p[round_index * group : (round_index + 1) * group] for p in positions
            ]
            gather = np.zeros((self.n_networks, group), dtype=int)
            for i, chunk in enumerate(chunk_positions):
                gather[i, : len(chunk)] = chunk  # pad rows re-run frame 0: harmless
            # async dispatch: later rounds overlap earlier rounds' device time
            dispatched.append(
                (self.synthesize_grouped(frame_data[gather]), chunk_positions)
            )
        return n, dispatched

    def gather(
        self, handle: Tuple[int, List[Tuple[jax.Array, List[np.ndarray]]]]
    ) -> np.ndarray:
        """Pull a `dispatch` handle to the host, scattered to stream order."""
        n, dispatched = handle
        side = self.output_resolution
        out = np.empty((n, side, side, 3), dtype=np.uint8)
        for device_images, chunk_positions in dispatched:
            host_images = np.asarray(device_images)
            for i, chunk in enumerate(chunk_positions):
                out[chunk] = host_images[i, : len(chunk)]
        return out

    def synthesize(
        self,
        frame_data: np.ndarray,
        network_indices: Optional[np.ndarray] = None,
        batch_size: int = 8,
    ) -> np.ndarray:
        """
        Synthesize `frame_data` with per-frame `network_indices`, returning
        (N, R, R, 3) uint8 in stream order. One dispatch+gather; callers that
        stream should pipeline `dispatch`/`gather` windows themselves (or use
        `MultiNetwork(network_parallel=True).synthesize_stream`).
        """
        return self.gather(self.dispatch(frame_data, network_indices, batch_size))
