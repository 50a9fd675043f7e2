"""
Batched synthesis runtime.

Replaces the reference's process-hosted `NetworkInterface` / `MultiNetwork`
(network_functions.py:66-640) with resident param pytrees + one compiled apply
function shared by every network of the same architecture. The public surface keeps
the reference's API shape (expected_vector_length, create_image_vector/matrix/
generic, indexed_* variants, context-manager load/unload) and adds the batched
entry points that the TPU pipeline actually uses.

Load-bearing inference constants preserved from the reference
(network_functions.py:122-168): truncation_psi=1.2, randomize_noise=False (const
noise buffers), matrix inputs skip the mapping network (synthesis-only), output is
uint8 NHWC.
"""

import functools
import os
from dataclasses import dataclass
from pathlib import Path
from typing import Any, Dict, Iterator, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

# parse_network_paths is re-exported here because the reference exposes it from the
# same module as MultiNetwork (network_functions.py:643).
from gance_tpu.models.pickle_loader import load_generator, parse_network_paths  # noqa: F401
from gance_tpu.models.stylegan2 import (
    DEFAULT_TRUNCATION_PSI,
    resize_images,
    GeneratorConfig,
    generator_apply,
    images_to_uint8,
    synthesis_apply,
)
from gance_tpu.parallel.mesh import fetch_to_host
from gance_tpu.types import is_vector
from gance_tpu.utils.logging import LOGGER

Params = Dict[str, Any]

# Streaming default balances latency vs throughput; raw synthesis throughput on
# v5e peaks near batch 48 with the fused uint8 epilogue (bench.py, r4), so
# raise GANCE_TPU_BATCH_SIZE for offline runs.
DEFAULT_BATCH_SIZE = int(os.environ.get("GANCE_TPU_BATCH_SIZE", "8"))

# How many batches of frames synthesize_stream groups at once: with rapidly
# alternating network indices, grouping over lookahead*batch frames lets each
# index fill WHOLE batches (zero pad waste) instead of pow-2-padded fragments;
# pad waste is bounded by ~1 + 1/lookahead. Costs lookahead batches of output
# latency/HBM, irrelevant for offline renders.
DEFAULT_STREAM_LOOKAHEAD = int(os.environ.get("GANCE_TPU_STREAM_LOOKAHEAD", "2"))

# Compute dtype for synthesis ("float32" exact / "bfloat16" fast — style/demod math
# stays fp32 either way; measured 141 vs 38 frames/sec at 1024px on v5e).
DEFAULT_COMPUTE_DTYPE = {
    "float32": jnp.float32,
    "bfloat16": jnp.bfloat16,
}[os.environ.get("GANCE_TPU_COMPUTE_DTYPE", "float32").lower()]


# phase_top_block_mode is resolved EAGERLY per call (resolve_phase_top_block) and
# passed as a static bool so flipping GANCE_TPU_PHASE1024 mid-process keys a fresh
# jit entry instead of silently serving the stale program (the trace-time env read
# inside synthesis_apply cannot key the cache).
@functools.partial(
    jax.jit,
    static_argnames=(
        "config", "truncation_psi", "compute_dtype", "output_side_length",
        "phase_top_block_mode",
    ),
)
def _jit_images_from_z(
    params: Params,
    z: jax.Array,
    config: GeneratorConfig,
    truncation_psi: Optional[float],
    compute_dtype: Any = jnp.float32,
    output_side_length: Optional[int] = None,
    phase_top_block_mode: Optional[bool] = None,
) -> jax.Array:
    needs_resize = (
        output_side_length is not None and output_side_length != config.resolution
    )
    images = generator_apply(
        params, z, config, truncation_psi=truncation_psi, noise_mode="const",
        compute_dtype=compute_dtype, phase_top_block_mode=phase_top_block_mode,
        uint8_output=not needs_resize,  # fused epilogue (resize needs float)
    )
    if needs_resize:
        images = resize_images(images, output_side_length)
        return images_to_uint8(images)
    return images


@functools.partial(
    jax.jit,
    static_argnames=(
        "config", "compute_dtype", "output_side_length", "phase_top_block_mode"
    ),
)
def _jit_images_from_dlatents(
    params: Params,
    dlatents: jax.Array,
    config: GeneratorConfig,
    compute_dtype: Any = jnp.float32,
    output_side_length: Optional[int] = None,
    phase_top_block_mode: Optional[bool] = None,
) -> jax.Array:
    needs_resize = (
        output_side_length is not None and output_side_length != config.resolution
    )
    images = synthesis_apply(
        params, dlatents, config, noise_mode="const", compute_dtype=compute_dtype,
        phase_top_block_mode=phase_top_block_mode,
        uint8_output=not needs_resize,  # fused epilogue (resize needs float)
    )
    if needs_resize:
        images = resize_images(images, output_side_length)
        return images_to_uint8(images)
    return images


def _pad_batch(data: np.ndarray, batch_size: int) -> Tuple[np.ndarray, int]:
    """Pad the leading axis up to `batch_size`; return (padded, real_count)."""
    real = data.shape[0]
    if real == batch_size:
        return data, real
    pad = [(0, batch_size - real)] + [(0, 0)] * (data.ndim - 1)
    return np.pad(data, pad), real


def _window_in_order(
    window: Tuple[int, List[Tuple[Any, List[int]]]], window_start: int
) -> Iterator[np.ndarray]:
    """
    Pull a dispatched window's per-index groups to the host and yield its frames
    back in original stream order.
    """
    count, groups = window
    out: List[Optional[np.ndarray]] = [None] * count
    for device_images, positions in groups:
        host_images = fetch_to_host(device_images)
        for row, position in enumerate(positions):
            out[position - window_start] = host_images[row]
    for image in out:
        assert image is not None
        yield image


def _bucket_size(real: int, batch_size: int, multiple: int = 1) -> int:
    """
    Smallest `multiple`·2^k >= `real`, capped at `batch_size` — bounds wasted FLOPs
    on partial batches at <2x while keeping the set of compiled batch shapes at
    log2 variants. `multiple` keeps buckets divisible by the mesh data-axis size
    when batches shard over devices.
    """
    size = multiple
    while size < real and size < batch_size:
        size *= 2
    return min(size, batch_size)


@dataclass
class SynthesisNetwork:
    """
    A loaded generator: params + config + compiled batched apply.

    Mirrors the reference `NetworkInterface` NT (network_functions.py:66-78) plus
    batched entry points.
    """

    params: Params
    config: GeneratorConfig
    path: Optional[Path] = None
    truncation_psi: Optional[float] = DEFAULT_TRUNCATION_PSI
    compute_dtype: Any = DEFAULT_COMPUTE_DTYPE
    # When set, frames leave the device already scaled to this side length (the
    # resize is fused into the jitted program; egress moves output-sized frames).
    output_side_length: Optional[int] = None
    # When set, params are placed tensor-parallel over the mesh's 'model' axis and
    # frame batches shard over 'data' — the multi-chip serving path. Batches of
    # any size work: they pad to a data-axis multiple at the device boundary
    # and the pads are sliced back off.
    mesh: Optional[Any] = None
    # When set (exclusive with mesh), this network lives wholly on one device —
    # the one-network-per-device true-DP mode (SURVEY.md §2.10): each network of
    # a MultiNetwork occupies its own chip and frame groups for different
    # networks synthesize concurrently.
    device: Optional[Any] = None

    def __post_init__(self) -> None:
        if self.mesh is not None and self.device is not None:
            raise ValueError("mesh and device placement are mutually exclusive")
        if self.mesh is not None:
            from gance_tpu.parallel.mesh import generator_param_sharding, shard_batch

            self.params = jax.device_put(
                self.params, generator_param_sharding(self.mesh, self.params)
            )
            self._batch_sharding = shard_batch(self.mesh)
            self._data_axis = int(dict(self.mesh.shape).get("data", 1))
        else:
            self._batch_sharding = None
            self._data_axis = 1
            if self.device is not None:
                self.params = jax.device_put(self.params, self.device)
            else:
                # Hold params RESIDENT on the default device up front:
                # load_generator returns host numpy arrays, and a jit
                # re-uploads host-side arguments on EVERY call — ~120 MB of
                # config-f params per dispatched batch (verified with
                # jax.transfer_guard), which dwarfs the batch compute on
                # serving paths and is pure waste on all of them.
                self.params = jax.device_put(self.params)

    def _place_batch(self, batch: jax.Array) -> jax.Array:
        if self._batch_sharding is not None:
            return jax.device_put(batch, self._batch_sharding)
        if self.device is not None:
            return jax.device_put(batch, self.device)
        return batch

    @classmethod
    def from_pkl(
        cls,
        path: Path,
        truncation_psi: Optional[float] = DEFAULT_TRUNCATION_PSI,
        compute_dtype: Any = DEFAULT_COMPUTE_DTYPE,
        output_side_length: Optional[int] = None,
        mesh: Optional[Any] = None,
        device: Optional[Any] = None,
    ) -> "SynthesisNetwork":
        return cls.from_staged(
            cls.stage_pkl(path),
            path,
            truncation_psi=truncation_psi,
            compute_dtype=compute_dtype,
            output_side_length=output_side_length,
            mesh=mesh,
            device=device,
        )

    @classmethod
    def stage_pkl(cls, path: Path) -> Tuple[Params, GeneratorConfig]:
        """
        The host-side half of `from_pkl`: parse the pickle into host arrays
        with NO device placement. Pair with `from_staged`. The split exists
        for multi-host hot rollout (serving/multihost.py): placing params
        onto a process-spanning mesh is a collective every process must
        enter together, so parse (fallible, per-host) and placement
        (lockstep) cannot be one step there.
        """
        return load_generator(Path(path))

    @classmethod
    def from_staged(
        cls, staged: Tuple[Params, GeneratorConfig], path: Path, **kwargs: Any
    ) -> "SynthesisNetwork":
        """Construct (and device-place) a network from `stage_pkl` output."""
        params, config = staged
        return cls(params=params, config=config, path=Path(path), **kwargs)

    @property
    def expected_vector_length(self) -> int:
        """Input z length (reference network_functions.py:191)."""
        return self.config.latent_size

    @property
    def resolution(self) -> int:
        return self.config.resolution

    # ---- batched (the TPU-native path) ----

    def _resolved_phase_mode(self) -> bool:
        """Per-call env resolution so GANCE_TPU_PHASE1024 flips key the jit cache."""
        from gance_tpu.models.stylegan2 import resolve_phase_top_block

        return resolve_phase_top_block(self.config, self.compute_dtype)

    def _pad_for_data_axis(self, batch: jax.Array) -> Tuple[jax.Array, int]:
        """
        Mesh batches must shard evenly over 'data': pad by repeating the last
        row (callers slice the pads back off). Keeps the single-frame compat
        surface (create_image_*) working on mesh-sharded networks.
        """
        n = batch.shape[0]
        pad = (-n) % self._data_axis
        if pad:
            batch = jnp.concatenate([batch, jnp.repeat(batch[-1:], pad, axis=0)])
        return batch, n

    def device_images_from_vectors(self, z_batch: np.ndarray) -> jax.Array:
        """(B, latent) z batch -> device-resident (B, R, R, 3) uint8 (async)."""
        z, n = self._pad_for_data_axis(jnp.asarray(z_batch, jnp.float32))
        images = _jit_images_from_z(
            self.params,
            self._place_batch(z),
            self.config,
            self.truncation_psi,
            self.compute_dtype,
            self.output_side_length,
            self._resolved_phase_mode(),
        )
        return images[:n] if images.shape[0] != n else images

    def device_images_from_matrices(self, dlatent_batch: np.ndarray) -> jax.Array:
        """
        (B, num_style_rows, dlatent) w+ batch -> device uint8 images. Skips the
        mapping network AND truncation — projection latents are final
        (reference network_functions.py:160-168).
        """
        dlat, n = self._pad_for_data_axis(jnp.asarray(dlatent_batch, jnp.float32))
        images = _jit_images_from_dlatents(
            self.params,
            self._place_batch(dlat),
            self.config,
            self.compute_dtype,
            self.output_side_length,
            self._resolved_phase_mode(),
        )
        return images[:n] if images.shape[0] != n else images

    def device_images_generic(self, batch: np.ndarray) -> jax.Array:
        """Dispatch on input rank: (B, V) -> vectors, (B, R, V) -> matrices."""
        batch = np.asarray(batch)
        if batch.ndim == 2:
            return self.device_images_from_vectors(batch)
        if batch.ndim == 3:
            return self.device_images_from_matrices(batch)
        raise ValueError(f"Cannot dispatch batch of shape {batch.shape}")

    def images_from_vectors(self, z_batch: np.ndarray) -> np.ndarray:
        return fetch_to_host(self.device_images_from_vectors(z_batch))

    def images_from_matrices(self, dlatent_batch: np.ndarray) -> np.ndarray:
        return fetch_to_host(self.device_images_from_matrices(dlatent_batch))

    def images_generic(self, batch: np.ndarray) -> np.ndarray:
        return fetch_to_host(self.device_images_generic(batch))

    # ---- single-image compatibility surface (reference ImageFunction protocol) ----

    def create_image_vector(self, data: np.ndarray) -> np.ndarray:
        return self.images_from_vectors(np.asarray(data).reshape(1, -1))[0]

    def create_image_matrix(self, data: np.ndarray) -> np.ndarray:
        return self.images_from_matrices(np.asarray(data)[None, ...])[0]

    def create_image_generic(self, data: np.ndarray) -> np.ndarray:
        return (
            self.create_image_vector(data)
            if is_vector(data)
            else self.create_image_matrix(data)
        )


class FakeSynthesisNetwork:
    """
    Deterministic fake backend for tests — the reference's mock-NetworkInterface
    pattern (test_network_functions.py:29-99) promoted to a first-class fake. Images
    encode the mean of the input so tests can assert data flow without a real model.
    """

    def __init__(self, resolution: int = 64, expected_vector_length: int = 512) -> None:
        self.config = GeneratorConfig(resolution=resolution)
        self._vector_length = expected_vector_length
        self.path: Optional[Path] = None
        self.resolution = resolution

    @property
    def expected_vector_length(self) -> int:
        return self._vector_length

    def _render(self, batch: np.ndarray) -> np.ndarray:
        flat = batch.reshape(batch.shape[0], -1)
        mean = flat.mean(axis=1)
        value = np.clip((mean * 37 + 128), 0, 255).astype(np.uint8)
        return np.broadcast_to(
            value[:, None, None, None], (batch.shape[0], self.resolution, self.resolution, 3)
        ).copy()

    def images_from_vectors(self, z_batch: np.ndarray) -> np.ndarray:
        return self._render(np.asarray(z_batch))

    def images_from_matrices(self, dlatent_batch: np.ndarray) -> np.ndarray:
        return self._render(np.asarray(dlatent_batch))

    def images_generic(self, batch: np.ndarray) -> np.ndarray:
        return self._render(np.asarray(batch))

    def device_images_generic(self, batch: np.ndarray) -> np.ndarray:
        return self._render(np.asarray(batch))

    def create_image_vector(self, data: np.ndarray) -> np.ndarray:
        return self._render(np.asarray(data).reshape(1, -1))[0]

    def create_image_matrix(self, data: np.ndarray) -> np.ndarray:
        return self._render(np.asarray(data)[None])[0]

    def create_image_generic(self, data: np.ndarray) -> np.ndarray:
        return self._render(np.asarray(data).reshape(1, *np.asarray(data).shape))[0]


class _NetworkParallelMember:
    """
    Single-network NetworkLike view into a NetworkParallelSynthesis: keeps the
    indexed_create_image_* / viz surfaces working when MultiNetwork serves in
    network-parallel mode. Routing a batch through the full mesh program for one
    network wastes the other groups' FLOPs — fine for the occasional
    single-image call; the hot path (synthesize_stream) routes whole windows.
    """

    def __init__(self, serving: Any, index: int, path: Optional[Path]) -> None:
        self._serving = serving
        self.index = index
        self.path = path

    @property
    def expected_vector_length(self) -> int:
        return self._serving.config.latent_size

    @property
    def resolution(self) -> int:
        return self._serving.config.resolution

    def images_generic(self, batch: np.ndarray) -> np.ndarray:
        batch = np.asarray(batch)
        indices = np.full((batch.shape[0],), self.index, dtype=int)
        return self._serving.synthesize(batch, indices)

    # network-parallel gathers scatter host-side, so "device" images are host
    # arrays here; np.asarray in the window pull is a no-op on them.
    device_images_generic = images_generic
    images_from_vectors = images_generic
    images_from_matrices = images_generic

    def create_image_vector(self, data: np.ndarray) -> np.ndarray:
        return self.images_generic(np.asarray(data).reshape(1, -1))[0]

    def create_image_matrix(self, data: np.ndarray) -> np.ndarray:
        return self.images_generic(np.asarray(data)[None])[0]

    def create_image_generic(self, data: np.ndarray) -> np.ndarray:
        return (
            self.create_image_vector(data)
            if is_vector(data)
            else self.create_image_matrix(data)
        )


NetworkLike = Union[SynthesisNetwork, FakeSynthesisNetwork, _NetworkParallelMember]


class MultiNetwork:
    """
    Multiple candidate networks addressed by index (reference MultiNetwork,
    network_functions.py:484-640). All params stay resident (HBM) once loaded;
    context-manager enter/exit maps to load/drop of the param arrays.
    """

    def __init__(
        self,
        network_paths: Sequence[Path],
        load: bool = False,
        truncation_psi: Optional[float] = DEFAULT_TRUNCATION_PSI,
        compute_dtype: Any = DEFAULT_COMPUTE_DTYPE,
        output_side_length: Optional[int] = None,
        mesh: Optional[Any] = None,
        device_per_network: bool = False,
        network_parallel: bool = False,
        _preloaded: Optional[List[NetworkLike]] = None,
    ) -> None:
        if sum([mesh is not None, device_per_network, network_parallel]) > 1:
            raise ValueError(
                "mesh, device_per_network, and network_parallel are mutually exclusive"
            )
        self.network_paths = [Path(p) for p in network_paths]
        self._truncation_psi = truncation_psi
        self._compute_dtype = compute_dtype
        self._output_side_length = output_side_length
        self._mesh = mesh
        self._device_per_network = device_per_network
        self._network_parallel = network_parallel
        self._np_serving: Optional[Any] = None
        self._networks: Optional[List[NetworkLike]] = _preloaded
        if load and self._networks is None:
            self.load()

    @classmethod
    def from_networks(cls, networks: Sequence[NetworkLike]) -> "MultiNetwork":
        """Build from already-constructed networks (incl. fakes, for tests)."""
        return cls(
            network_paths=[n.path or Path(f"fake_{i}") for i, n in enumerate(networks)],
            _preloaded=list(networks),
        )

    def load(self) -> None:
        if self._networks is None and self._network_parallel:
            from gance_tpu.parallel.network_parallel import NetworkParallelSynthesis

            LOGGER.info(
                "Network-parallel serving: %d networks resident on a "
                "('network','data') mesh", len(self.network_paths),
            )
            self._np_serving = NetworkParallelSynthesis.from_pkls(
                self.network_paths,
                truncation_psi=self._truncation_psi,
                compute_dtype=self._compute_dtype,
                output_side_length=self._output_side_length,
            )
            self._networks = [
                _NetworkParallelMember(self._np_serving, i, p)
                for i, p in enumerate(self.network_paths)
            ]
            return
        if self._networks is None:
            LOGGER.info("Loading %d networks", len(self.network_paths))
            devices = jax.devices() if self._device_per_network else None
            if devices:
                LOGGER.info(
                    "One network per device over %d devices (true DP over frames)",
                    len(devices),
                )
            self._networks = [
                SynthesisNetwork.from_pkl(
                    p,
                    truncation_psi=self._truncation_psi,
                    compute_dtype=self._compute_dtype,
                    output_side_length=self._output_side_length,
                    mesh=self._mesh,
                    device=devices[i % len(devices)] if devices else None,
                )
                for i, p in enumerate(self.network_paths)
            ]

    def unload(self) -> None:
        """Drop all param arrays (frees HBM; the reference kills child processes)."""
        self._networks = None
        self._np_serving = None

    def __enter__(self) -> "MultiNetwork":
        self.load()
        return self

    def __exit__(self, *exc: Any) -> None:
        self.unload()

    def _require_loaded(self) -> List[NetworkLike]:
        if self._networks is None:
            raise ValueError("Networks are not loaded; call load() or use as a context manager.")
        return self._networks

    def __len__(self) -> int:
        return len(self.network_paths)

    @property
    def network_indices(self) -> List[int]:
        return list(range(len(self.network_paths)))

    @property
    def expected_vector_length(self) -> int:
        return self._require_loaded()[0].expected_vector_length

    @property
    def resolution(self) -> int:
        return self._require_loaded()[0].resolution

    def network(self, index: int) -> NetworkLike:
        return self._require_loaded()[index]

    # ---- single-image compatibility surface ----

    def indexed_create_image_vector(self, index: int, data: np.ndarray) -> np.ndarray:
        return self._require_loaded()[index].create_image_vector(data)

    def indexed_create_image_matrix(self, index: int, data: np.ndarray) -> np.ndarray:
        return self._require_loaded()[index].create_image_matrix(data)

    def indexed_create_image_generic(self, index: int, data: np.ndarray) -> np.ndarray:
        return self._require_loaded()[index].create_image_generic(data)

    # ---- batched streaming synthesis (the hot path) ----

    def synthesize_stream(
        self,
        frame_data: np.ndarray,
        network_indices: Optional[np.ndarray] = None,
        batch_size: int = DEFAULT_BATCH_SIZE,
        lookahead: int = DEFAULT_STREAM_LOOKAHEAD,
    ) -> Iterator[np.ndarray]:
        """
        Synthesize frames in order, yielding uint8 (H, W, 3) images one at a time
        while computing in fixed-size batches.

        Frames are processed in windows of `lookahead * batch_size` frames.
        Within a window, frames are gathered by network index (the reference's
        sort-by-index insight, network_visualization.py:653-674, re-expressed as
        an order-restored batch gather: grouping happens inside the window,
        outputs scatter back to stream order, so the caller sees frames strictly
        in order). Each per-index group dispatches in FULL `batch_size` chunks
        plus one power-of-two-padded remainder — so with lookahead >= 2, rapidly
        alternating indices still fill whole batches and pad waste is bounded by
        ~1 + 1/lookahead (lookahead=1 reproduces the old per-batch windows with
        their <2x bound). Because every network's params are resident,
        "switching" is free.

        Egress is double-buffered at window granularity: window i+1's groups are
        dispatched (JAX dispatch is async) before window i is pulled to the host,
        so device compute overlaps the device->host transfer and downstream host
        work. Larger lookahead costs proportionally more output-frame latency and
        HBM — irrelevant for offline renders, lower it for interactive use.

        :param frame_data: (N, V) vectors or (N, R, V) matrices.
        :param network_indices: (N,) ints into this MultiNetwork; None -> all zeros.
        """
        networks = self._require_loaded()
        frame_data = np.asarray(frame_data)
        n = frame_data.shape[0]
        if network_indices is None:
            network_indices = np.zeros((n,), dtype=int)
        network_indices = np.asarray(network_indices).astype(int)
        if network_indices.shape[0] < n:
            # zip semantics (the reference pairs streams the same way), but a
            # silently shortened render is a classic off-by-one symptom — warn.
            LOGGER.warning(
                "synthesize_stream: %d frames but %d network indices; "
                "truncating to the shorter stream",
                n, network_indices.shape[0],
            )
            n = network_indices.shape[0]
            frame_data = frame_data[:n]
        if n and (
            network_indices[:n].min() < 0
            or network_indices[:n].max() >= len(networks)
        ):
            # Python's negative indexing would silently render with the WRONG
            # network; the network-parallel path already rejects this.
            raise ValueError(
                f"network_indices out of range [0, {len(networks)}): "
                f"[{network_indices[:n].min()}, {network_indices[:n].max()}]"
            )

        if self._np_serving is not None:
            # Network-parallel mode: whole windows route through the all-networks
            # SPMD program (batch_size caps per-device frames per network group);
            # window i+1 dispatches before window i is pulled, same double
            # buffering as the per-network path below.
            serving = self._np_serving
            window_size = batch_size * max(int(lookahead), 1)
            pending = None
            for start in range(0, n, window_size):
                end = min(start + window_size, n)
                handle = serving.dispatch(
                    frame_data[start:end],
                    network_indices[start:end],
                    batch_size=batch_size,
                )
                if pending is not None:
                    yield from serving.gather(pending)
                pending = handle
            if pending is not None:
                yield from serving.gather(pending)
            return

        # Batches that shard over a mesh must stay divisible by the data-axis
        # size — including the cap on bucket sizes, so the requested batch_size
        # rounds DOWN to a data-axis multiple (never exceeding the caller's
        # memory budget; rounds UP only when batch_size < data_axis, the
        # minimum shardable batch).
        data_axis = getattr(self._mesh, "shape", {}).get("data", 1) if self._mesh else 1
        if data_axis > 1:
            batch_size = max(data_axis, batch_size - batch_size % data_axis)

        window_size = batch_size * max(int(lookahead), 1)

        def dispatch_window(start: int, end: int) -> Tuple[int, List[Tuple[Any, List[int]]]]:
            """Group [start:end) by index, dispatch each group; keep positions."""
            window_indices = network_indices[start:end]
            groups: List[Tuple[Any, List[int]]] = []
            for index in dict.fromkeys(int(i) for i in window_indices):
                positions = [
                    start + offset
                    for offset in np.nonzero(window_indices == index)[0]
                ]
                # Full batches first; only the remainder pays pad waste.
                for chunk_start in range(0, len(positions), batch_size):
                    chunk_positions = positions[chunk_start : chunk_start + batch_size]
                    chunk = frame_data[chunk_positions]
                    padded, _ = _pad_batch(
                        chunk,
                        _bucket_size(
                            len(chunk_positions), batch_size, multiple=data_axis
                        ),
                    )
                    groups.append(
                        (
                            networks[index].device_images_generic(padded),
                            chunk_positions,
                        )
                    )
            return end - start, groups

        pending: Optional[Tuple[int, List[Tuple[Any, List[int]]]]] = None
        pending_start = 0
        for start in range(0, n, window_size):
            window = dispatch_window(start, min(start + window_size, n))
            if pending is not None:
                yield from _window_in_order(pending, pending_start)
                pending_start += pending[0]
            pending = window
        if pending is not None:
            yield from _window_in_order(pending, pending_start)

    def synthesize_all(
        self,
        frame_data: np.ndarray,
        network_indices: Optional[np.ndarray] = None,
        batch_size: int = DEFAULT_BATCH_SIZE,
        lookahead: int = DEFAULT_STREAM_LOOKAHEAD,
    ) -> np.ndarray:
        """Materialize the full (N, R, R, 3) uint8 stack (small runs / tests)."""
        return np.stack(
            list(
                self.synthesize_stream(
                    frame_data, network_indices, batch_size, lookahead
                )
            )
        )
