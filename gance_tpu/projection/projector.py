"""
TPU latent projector: optimize (w, noise buffers) so the generator reproduces a
target image — the reference submodule's `Projector` (SURVEY.md §2.9 row 5)
re-implemented as a jitted optax loop.

Behavioral contract kept from NVlabs projector.py:
  * optimize a single (1, 512) w initialized at the sampled dlatent average,
    broadcast to all style rows at synthesis time ⇒ final latents (1, R, 512) with
    identical rows (the invariant `verify_projection_file_assumptions` checks);
  * Adam with cosine ramp-down / linear ramp-up LR schedule (base 0.1);
  * annealed gaussian jitter added to w (initial_noise_factor 0.05 × dlatent_std,
    ramp 0.75);
  * per-layer noise buffers optimized jointly, pyramid cross-correlation
    regularizer (weight 1e5), re-normalized to zero-mean/unit-std every step;
  * perceptual distance evaluated at ≤256px (average-pooled);
  * default 1000 steps; a wall-clock watchdog per step replaces the reference's
    child-process timeout (projector_file_writer.py:64,:311-329) — the failure
    detection semantic survives, the process machinery doesn't.

Where the reference runs TF in a watchdogged child process and ships step results
over a bounded queue, this projector is a pure in-process jitted step; history
streaming happens through a host callback per step (the HDF5 writer), which also
preserves the per-frame durability contract.
"""

import collections
import time
from dataclasses import dataclass, replace
from pathlib import Path
from typing import Any, Callable, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec

from gance_tpu.models.pickle_loader import load_generator
from gance_tpu.models.stylegan2 import (
    GeneratorConfig,
    images_to_uint8,
    mapping_apply,
    synthesis_apply,
)
from gance_tpu.projection.lpips import (
    downsample_to,
    lpips_distance,
    load_vgg_params,
    random_vgg_params,
)
from gance_tpu.utils.logging import LOGGER

StepCallback = Callable[[int, np.ndarray, List[np.ndarray], np.ndarray], None]


class ProjectionResult(NamedTuple):
    """Final outputs of one frame's projection."""

    final_latents: np.ndarray  # (1, R, 512), rows identical
    final_image: np.ndarray  # (H, W, 3) uint8
    noises: List[np.ndarray]
    noises_shapes: List[Tuple[int, ...]]
    final_distance: float
    # Optimization steps actually run: == num_steps unless the convergence
    # early stop (ProjectorSettings.convergence_stop) fired first.
    steps_run: int = 0


@dataclass
class ProjectorSettings:
    """Hyperparameters (NVlabs projector.py defaults)."""

    num_steps: int = 1000
    dlatent_avg_samples: int = 10_000
    initial_learning_rate: float = 0.1
    initial_noise_factor: float = 0.05
    lr_rampdown_length: float = 0.25
    lr_rampup_length: float = 0.05
    noise_ramp_length: float = 0.75
    regularize_noise_weight: float = 1e5
    perceptual_size: int = 256
    seed: int = 303
    # Synthesis compute dtype inside the loss: "float32" (exact, the reference's
    # behavior) or "bfloat16" (~2-3x faster steps on TPU; latents/Adam state and
    # the perceptual features stay fp32, gradients flow through the bf16 forward).
    compute_dtype: str = "float32"
    # Steps per device-side lax.scan segment: the optimization loop runs
    # ON-DEVICE in segments of this many steps whenever per-step host data
    # isn't required (profiled: device compute is ~166 ms/step at 1024px
    # batch 8 but host-side per-step dispatch over the interconnect adds
    # ~60% on top; one dispatch per segment removes it). Latents histories
    # still stream — the scan stacks the tiny per-step w on device. Per-step
    # dispatch remains for noises/images histories and is forced by
    # scan_segment=1.
    scan_segment: int = 250
    # Convergence early stop (opt-in): stop the optimization once EVERY
    # frame's perceptual-distance trace has plateaued — the online form of the
    # reference's "80% projected" convergence analysis
    # (projection_visualization.py:59-211, the analysis NVlabs/GANce used
    # offline to pick production step counts, CHANGELOG 0.14.0). The rule:
    # compare the medians of the two most recent `convergence_window`-step
    # blocks of the per-step distance trace; stop when the relative
    # improvement falls below `convergence_stop` for all frames in the batch.
    # Medians ride out the annealed w-jitter's noise; the check runs at scan-
    # segment boundaries (the trace is a tiny (S, B) fetch), so it costs one
    # host sync per segment. None = run the full num_steps (reference
    # behavior). The LR/jitter schedules still stretch over the NOMINAL
    # num_steps — stopping truncates the trajectory, it does not reschedule.
    convergence_stop: Optional[float] = None
    convergence_window: int = 50
    # Earliest step the stop may fire. None scales with the budget:
    # max(2 * convergence_window, 10% of num_steps) — past the LR ramp-up
    # (the first 5% of the nominal schedule), which reads as a plateau.
    convergence_min_steps: Optional[int] = None

    def resolved_convergence_min_steps(self) -> int:
        if self.convergence_min_steps is not None:
            return self.convergence_min_steps
        return max(2 * self.convergence_window, self.num_steps // 10)
    # Rematerialize synthesis blocks in the backward pass (jax.checkpoint):
    # recompute activations instead of storing them — the trade that makes
    # 1024px TRAINING fit one chip (parallel/training.py). For projection it
    # is a measured LOSS (r3, v5e): bf16 batch 16 goes from running (411
    # ms/step) to RESOURCE_EXHAUSTED, and fp32 batch 8 crashes the worker —
    # forcing the per-block save set displaces XLA's own finer-grained remat
    # scheduling of the scanned fwd+bwd, raising peak HBM instead of lowering
    # it. Kept as an equality-tested knob (the projection working set differs
    # from training's: per-layer noises are differentiated arguments and the
    # perceptual net rides the same backward); do not enable in production.
    remat: bool = False


def convergence_should_stop(
    distance_trace: np.ndarray, window: int, epsilon: float, min_steps: int
) -> bool:
    """
    Plateau detector over a per-step distance trace (T,) or (T, B): True when
    EVERY frame's relative improvement between the medians of the two most
    recent `window`-step blocks is below `epsilon`. Medians absorb the
    annealed-jitter noise; `min_steps` keeps the LR ramp-up (the first 5% of
    the nominal schedule) from reading as a plateau.
    """
    trace = np.asarray(distance_trace, np.float64)
    if trace.ndim == 1:
        trace = trace[:, None]
    if trace.shape[0] < max(min_steps, 2 * window):
        return False
    recent = np.median(trace[-window:], axis=0)
    previous = np.median(trace[-2 * window : -window], axis=0)
    improvement = (previous - recent) / np.maximum(previous, 1e-12)
    return bool(np.all(improvement < epsilon))


def _lr_schedule(t: jax.Array, s: ProjectorSettings) -> jax.Array:
    ramp = jnp.minimum(1.0, (1.0 - t) / s.lr_rampdown_length)
    ramp = 0.5 - 0.5 * jnp.cos(ramp * jnp.pi)
    ramp = ramp * jnp.minimum(1.0, t / s.lr_rampup_length)
    return s.initial_learning_rate * ramp


def _noise_regularization(noises: List[jax.Array]) -> jax.Array:
    """
    Pyramid shifted-correlation penalty (NVlabs reg_loss), per batch element:
    noises are (B, H, W, 1); returns (B,).
    """
    batch = noises[0].shape[0] if noises else 1
    reg = jnp.zeros((batch,), jnp.float32)
    for noise in noises:
        v = noise  # (B, H, W, 1)
        size = v.shape[1]
        while True:
            reg = reg + jnp.mean(v * jnp.roll(v, 1, axis=2), axis=(1, 2, 3)) ** 2
            reg = reg + jnp.mean(v * jnp.roll(v, 1, axis=1), axis=(1, 2, 3)) ** 2
            if size <= 8:
                break
            v = v.reshape(batch, size // 2, 2, size // 2, 2, 1).mean(axis=(2, 4))
            size //= 2
    return reg


def _normalize_noises(noises: List[jax.Array]) -> List[jax.Array]:
    """Zero-mean/unit-std per batch element (noises are (B, H, W, 1))."""
    out = []
    for n in noises:
        mean = jnp.mean(n, axis=(1, 2, 3), keepdims=True)
        var = jnp.mean(jnp.square(n - mean), axis=(1, 2, 3), keepdims=True)
        out.append((n - mean) * jax.lax.rsqrt(var + 1e-8))
    return out


class TPUProjector:
    """Projects images into a single generator's latent space."""

    def __init__(
        self,
        params: Dict[str, Any],
        config: GeneratorConfig,
        num_steps: Optional[int] = None,
        vgg_weights_path: Optional[Path] = None,
        expected_time_per_step: Optional[float] = None,
        settings: Optional[ProjectorSettings] = None,
        first_step_timeout: Optional[float] = None,
        mesh: Optional[Any] = None,
    ) -> None:
        self.params = params
        self.config = config
        # Multi-chip projection: frames are embarrassingly parallel (each frame
        # owns its latents/noises/Adam state, and the summed batch loss keeps
        # per-frame gradients exact), so projection data-parallelizes over the
        # mesh 'data' axis mechanically — every batch-leading array shards over
        # 'data', params replicate, and GSPMD inserts nothing but the trivial
        # collectives. This multiplies per-chip projection throughput by the
        # data-axis size; the reference is strictly one frame per child process
        # (projector_file_writer.py:617 — the 8h-for-5s-of-video bottleneck).
        # The mesh may span PROCESSES (multi-host): after
        # parallel.distributed.initialize_distributed, every process constructs
        # this projector with the same global mesh and calls project/
        # project_batch with the same full batch — placement shards frames
        # across all hosts' chips, host fetches allgather (collective; see
        # _fetch), and callers gate file writes to the coordinator.
        self.mesh = mesh
        if mesh is not None:
            self._replicated_sharding = NamedSharding(mesh, PartitionSpec())
            self._data_sharding = NamedSharding(mesh, PartitionSpec("data"))
            self._data_axis_size = int(mesh.shape["data"])
        else:
            self._replicated_sharding = None
            self._data_sharding = None
            self._data_axis_size = 1
        # Copy the settings (never mutate a caller-owned object); an explicit
        # num_steps kwarg overrides the settings value, otherwise settings win.
        self.settings = replace(settings) if settings else ProjectorSettings()
        if num_steps is not None:
            self.settings.num_steps = num_steps
        self.expected_time_per_step = expected_time_per_step
        # Step 0 includes the one-time jit compile (minutes over a tunneled TPU
        # with a cold cache), so it gets its own, much longer budget instead of
        # escaping the hang detector entirely. The reference's child-process
        # timeout covered every step (projector_file_writer.py:64,:311-329);
        # this preserves that semantic with a compile-aware allowance.
        if first_step_timeout is not None:
            self.first_step_timeout: Optional[float] = first_step_timeout
        elif expected_time_per_step is not None:
            self.first_step_timeout = max(600.0, 20.0 * expected_time_per_step)
        else:
            self.first_step_timeout = None
        self._perceptual_params = (
            load_vgg_params(vgg_weights_path)
            if vgg_weights_path is not None
            else random_vgg_params(seed=0)
        )
        self._noise_names = sorted(
            params["synthesis"].get("noise", {}).keys(), key=lambda n: int(n[5:])
        )
        self._optimizer = optax.inject_hyperparams(optax.adam)(learning_rate=0.1)
        self._compute_dlatent_stats()
        if mesh is not None:
            # Place AFTER the eager dlatent-stats pass (which runs single-device):
            # replicated params keep the synthesis forward pure-DP over frames.
            self.params = jax.device_put(self.params, self._replicated_sharding)
        self._step_fn = self._build_step()

    @classmethod
    def from_pkl(
        cls, path: Path, num_steps: Optional[int] = None, **kwargs: Any
    ) -> "TPUProjector":
        params, config = load_generator(Path(path))
        return cls(params, config, num_steps=num_steps, **kwargs)

    def _perceptual_on_device(self) -> Dict[str, jax.Array]:
        """
        The perceptual net's weights as device arrays (replicated under a
        mesh), uploaded ONCE and cached — they are a per-step argument of the
        jitted step (never trace-time constants; see _build_step), and
        re-uploading ~60MB per project_batch call would dominate short runs.
        Swapping self._perceptual_params (a new dict object) invalidates.
        """
        params = self._perceptual_params
        cache = getattr(self, "_perceptual_device_cache", None)
        if cache is None or cache[0] is not params:
            placed = {k: jnp.asarray(v) for k, v in params.items()}
            if self.mesh is not None:
                placed = jax.device_put(placed, self._replicated_sharding)
            self._perceptual_device_cache = (params, placed)
        return self._perceptual_device_cache[1]

    def _place_data(self, value: jax.Array) -> jax.Array:
        """
        Shard a batch-leading array over the mesh 'data' axis (no-op off-mesh).

        Multi-host: `jax.device_put` of a host value onto a process-spanning
        sharding treats it as the GLOBAL value and places each process's
        addressable shards — so every process passes the same full batch and
        the mesh spreads the frames across all hosts' chips.
        """
        if self._data_sharding is None:
            return value
        return jax.device_put(value, self._data_sharding)

    @staticmethod
    def _fetch(value: jax.Array) -> np.ndarray:
        """
        Device array -> host numpy, multi-host-safe.

        An array sharded over a process-spanning mesh is not fully addressable
        from one host, so it is first allgathered to every host (a COLLECTIVE:
        in a multi-process run every process must reach every fetch — which is
        why non-coordinator processes of a distributed projection drive the
        same callback control flow through the null writer instead of skipping
        it; see file_writer.project_video_to_file). Single-process (or
        local-mesh) arrays take the plain np.asarray path.
        """
        if isinstance(value, jax.Array) and not value.is_fully_addressable:
            from jax.experimental import multihost_utils

            return np.asarray(multihost_utils.process_allgather(value, tiled=True))
        return np.asarray(value)

    def _compute_dlatent_stats(self) -> None:
        """Sampled w average/std (NVlabs uses 10k z samples)."""
        n = self.settings.dlatent_avg_samples
        z = jax.random.normal(
            jax.random.PRNGKey(self.settings.seed), (n, self.config.latent_size)
        )
        w = mapping_apply(self.params, z, self.config)
        self.dlatent_avg = jnp.mean(w, axis=0, keepdims=True)  # (1, 512)
        self.dlatent_std = float(
            jnp.sqrt(jnp.mean(jnp.sum(jnp.square(w - self.dlatent_avg), axis=1)))
        )

    def _synthesis_from_w(self, w: jax.Array, noises: List[jax.Array]) -> jax.Array:
        """(1, 512) + noise buffers -> (1, R, R, 3) float image."""
        dlatents = jnp.tile(w[:, None, :], (1, self.config.num_style_rows, 1))
        params = dict(self.params)
        synthesis = dict(params["synthesis"])
        synthesis["noise"] = {
            name: noises[i] for i, name in enumerate(self._noise_names)
        }
        params["synthesis"] = synthesis
        dtype = jnp.bfloat16 if self.settings.compute_dtype == "bfloat16" else jnp.float32
        from gance_tpu.models.stylegan2 import resolve_phase_top_block

        # Same phase gate as the forward path: auto mode excludes only
        # fp32-HIGHEST, where the phase backward compile is pathological (r2);
        # the fp32-HIGH phase backward is a measured win (r3: 400.9 -> 340.2
        # ms/step at 1024px batch 4).
        return synthesis_apply(
            params, dlatents, self.config, noise_mode="const", compute_dtype=dtype,
            phase_top_block_mode=resolve_phase_top_block(self.config, dtype),
            remat=self.settings.remat,
        )

    def _make_single_step(self):
        """The per-step math, shared by the per-step jit and the scanned loop."""
        settings = self.settings

        # The perceptual net's weights are an explicit ARGUMENT of the jitted
        # step, not trace-time closure constants: embedding ~60MB of conv
        # filters as HLO constants bloats the program/compile cache and ties
        # the compiled artifact to one metric (swapping metrics mid-process
        # silently kept serving the embedded one through the remote-compile
        # cache); as an argument, one compiled step serves any same-structure
        # metric and the weights upload to HBM once.
        def loss_fn(perceptual, w, noises, target_proc, w_jitter):
            images = self._synthesis_from_w(w + w_jitter, noises)
            proc = downsample_to(images, settings.perceptual_size)
            # per-frame distances; frames optimize independently, so summing
            # the batch loss gives each frame exactly its single-frame gradient
            dist = lpips_distance(perceptual, proc, target_proc)
            reg = _noise_regularization(noises) * settings.regularize_noise_weight
            return jnp.sum(dist + reg), (dist, images)

        grad_fn = jax.value_and_grad(loss_fn, argnums=(1, 2), has_aux=True)

        def single_step(
            w, noises, opt_state, target_proc, t, step_rng, perceptual, noise_factor
        ):
            # noise_factor is a TRACED scalar (settings.initial_noise_factor by
            # default): warm starts pass 0.0 — the annealed w-jitter exists to
            # explore away from the cold dlatent-average start, and it erases a
            # warm start's head start (measured r3: with the default jitter,
            # warm@100 steps ~ cold@100; with jitter 0 the gap opens).
            noise_strength = (
                self.dlatent_std
                * noise_factor
                * jnp.maximum(0.0, 1.0 - t / settings.noise_ramp_length) ** 2
            )
            w_jitter = jax.random.normal(step_rng, w.shape) * noise_strength
            (_, (dist, images)), grads = grad_fn(
                perceptual, w, noises, target_proc, w_jitter
            )
            opt_state.hyperparams["learning_rate"] = _lr_schedule(t, settings)
            updates, opt_state = self._optimizer.update(grads, opt_state, (w, noises))
            w, noises = optax.apply_updates((w, noises), updates)
            noises = _normalize_noises(noises)
            # History image = this step's forward (pre-update), like the reference's
            # get_images(); reusing it avoids a second synthesis pass per step.
            return w, noises, opt_state, dist, images

        return single_step

    def _build_step(self):
        single_step = self._make_single_step()

        def step(w, noises, opt_state, target_proc, t, rng, perceptual, noise_factor):
            w, noises, opt_state, dist, images = single_step(
                w, noises, opt_state, target_proc, t, rng, perceptual, noise_factor
            )
            return w, noises, opt_state, dist, images_to_uint8(images)

        # Donate the optimization state (w, noises, opt_state): each step
        # consumes the previous step's buffers and returns updated ones, so
        # XLA aliases them in place instead of allocating ~3x the state per
        # step and freeing the old copy through the allocator — measured as
        # the dominant non-compute cost of large projection batches (the
        # batch-16 "cliff": device op time scales linearly with batch, the
        # per-step alloc/free churn does not).
        return jax.jit(step, donate_argnums=(0, 1, 2))

    def _scan_fn(self, segment_len: int):
        """
        A jitted DEVICE-SIDE loop over `segment_len` optimization steps
        (lax.scan): one host dispatch per segment instead of per step — the
        per-step tunnel/allocator overhead measured at ~60% of step wall time
        vanishes. Stacks the per-step distances and post-update w latents
        ((S, B) and (S, B, 512) — tiny) so latents histories still stream.
        Compiled once per distinct segment length and cached.
        """
        cache = getattr(self, "_scan_fn_cache", None)
        if cache is None:
            cache = self._scan_fn_cache = {}
        num_steps = max(self.settings.num_steps, 1)
        key = (segment_len, num_steps)  # num_steps shapes the LR/jitter schedules
        if key in cache:
            return cache[key]

        single_step = self._make_single_step()

        def run_segment(
            w, noises, opt_state, rng, target_proc, perceptual, start_step,
            noise_factor,
        ):
            def body(carry, step_index):
                w, noises, opt_state, rng = carry
                t = step_index.astype(jnp.float32) / num_steps
                rng, step_rng = jax.random.split(rng)
                w, noises, opt_state, dist, _images = single_step(
                    w, noises, opt_state, target_proc, t, step_rng, perceptual,
                    noise_factor,
                )
                # _images is unused in ys/carry -> dead-code-eliminated by XLA
                return (w, noises, opt_state, rng), (dist, w)

            step_indices = start_step + jnp.arange(segment_len)
            (w, noises, opt_state, rng), (dists, w_history) = jax.lax.scan(
                body, (w, noises, opt_state, rng), step_indices
            )
            return w, noises, opt_state, rng, dists, w_history

        fn = jax.jit(run_segment, donate_argnums=(0, 1, 2))
        cache[key] = fn
        return fn

    def project(
        self,
        target_image: np.ndarray,
        step_callback: Optional[StepCallback] = None,
        want_step_images: bool = True,
        initial_latents: Optional[np.ndarray] = None,
        initial_noises: Optional[List[np.ndarray]] = None,
        noise_factor: Optional[float] = None,
    ) -> ProjectionResult:
        """
        Optimize latents to reproduce `target_image` (uint8 (H, W, 3)); stream each
        step through `step_callback(step, latents(1,R,512), noises, image_uint8)`.
        `initial_latents` ((512,) or (R, 512)) warm-starts w — see project_batch.
        """
        batch_callback = None
        if step_callback is not None:

            def batch_callback(step, latents, noises, images):
                step_callback(
                    step,
                    latents[0:1],
                    [n[0:1] for n in noises],
                    images[0] if images.size else np.zeros((0, 0, 3), np.uint8),
                )

        if initial_latents is not None:
            initial_latents = np.asarray(initial_latents)[None, ...]
        return self.project_batch(
            np.asarray(target_image)[None, ...],
            step_callback=batch_callback,
            want_step_images=want_step_images,
            initial_latents=initial_latents,
            initial_noises=initial_noises,
            noise_factor=noise_factor,
        )[0]

    def project_batch(
        self,
        target_images: np.ndarray,
        step_callback: Optional[Callable[[int, np.ndarray, List[np.ndarray], np.ndarray], None]] = None,
        want_step_images: bool = True,
        per_step_noises: bool = True,
        initial_latents: Optional[np.ndarray] = None,
        initial_noises: Optional[List[np.ndarray]] = None,
        noise_factor: Optional[float] = None,
    ) -> List[ProjectionResult]:
        """
        Project a BATCH of frames in one optimization (each frame gets its own
        latents/noises; the summed loss keeps gradients per-frame exact). At
        batch 1 the chip is latency-bound, so batching multiplies projection
        throughput nearly for free — the reference is strictly one frame per
        child process (projector_file_writer.py:332-464).

        :param target_images: (B, H, W, 3) uint8.
        :param step_callback: per step: (step, latents (B, R, 512),
            noises [(B, h, w, 1), ...], images (B, res, res, 3) uint8 — empty
            when want_step_images is False).
        :param per_step_noises: whether the callback needs the ACTUAL per-step
            noise buffers. False (with want_step_images False) lets the loop
            run on-device in lax.scan segments — one dispatch per
            `settings.scan_segment` steps instead of per step — while the
            callback still receives exact per-step latents/step numbers (the
            scan stacks them) and the current end-of-segment noises (valid for
            shape recording, which is all the projection writer needs when
            noises histories are disabled).
        :param initial_latents: optional warm start for the optimized w —
            (512,) broadcast to the batch, (B, 512), or (B, R, 512) (row 0 is
            taken; projection keeps all rows identical). None starts at the
            sampled dlatent average, the NVlabs behavior (the reference is
            always-cold, projector_file_writer.py:617-802). Measured NOTE:
            warm-starting frame N from frame N-1's finals is distance-NEUTRAL
            under the default schedule at every tested budget (the annealed
            w-jitter erases the head start, and with jitter 0 the endpoint is
            schedule-bound — ROUND_NOTES r3c); use it for temporal smoothing
            of latent trajectories, not to cut num_steps.
        :param initial_noises: optional warm start for the per-layer noise
            buffers (the list shape ProjectionResult.noises carries, each
            (B, h, w, 1) or (1, h, w, 1) broadcast over the batch). None draws
            fresh gaussian noise, the NVlabs behavior.
        :param noise_factor: overrides settings.initial_noise_factor for THIS
            call (a traced scalar — no recompile). Pass 0.0 with a warm start:
            the annealed exploration jitter erases the head start otherwise.
        :return: one ProjectionResult per input frame.
        """
        settings = self.settings
        resolution = self.config.resolution
        target_images = np.asarray(target_images)
        batch = int(target_images.shape[0])

        # Multi-chip: pad the frame batch up to a data-axis multiple (repeating
        # the last frame — numerically benign) so it shards evenly; padded rows
        # optimize like real frames and are dropped from every output.
        pad = (-batch) % self._data_axis_size
        if pad:
            target_images = np.concatenate(
                [target_images, np.repeat(target_images[-1:], pad, axis=0)]
            )
        work_batch = batch + pad

        target = jnp.asarray(target_images, jnp.float32) / 127.5 - 1.0
        if target.shape[1] != resolution:
            target = jax.image.resize(
                target, (work_batch, resolution, resolution, 3), method="linear"
            )
        target_proc = self._place_data(downsample_to(target, settings.perceptual_size))

        rng = jax.random.PRNGKey(settings.seed)
        if initial_latents is None:
            w_init = jnp.tile(jnp.asarray(self.dlatent_avg), (work_batch, 1))
        else:
            w_init = jnp.asarray(initial_latents, jnp.float32)
            if w_init.ndim == 3:  # (B, R, 512): rows identical by invariant
                w_init = w_init[:, 0, :]
            if w_init.ndim == 1:  # (512,): broadcast to the batch
                w_init = jnp.tile(w_init[None, :], (batch, 1))
            if w_init.shape != (batch, self.config.dlatent_size):
                raise ValueError(
                    f"initial_latents: expected ({batch}, "
                    f"{self.config.dlatent_size}), got {tuple(w_init.shape)}"
                )
            if pad:
                w_init = jnp.concatenate(
                    [w_init, jnp.repeat(w_init[-1:], pad, axis=0)]
                )
        w = self._place_data(w_init)  # (B, 512)
        noise_rng, rng = jax.random.split(rng)
        if initial_noises is None:
            noises = [
                self._place_data(
                    jax.random.normal(
                        jax.random.fold_in(noise_rng, i),
                        (work_batch,)
                        + tuple(self.params["synthesis"]["noise"][name].shape[1:]),
                    )
                )
                for i, name in enumerate(self._noise_names)
            ]
        else:
            if len(initial_noises) != len(self._noise_names):
                raise ValueError(
                    f"initial_noises: expected {len(self._noise_names)} buffers, "
                    f"got {len(initial_noises)}"
                )
            noises = []
            for i, buf in enumerate(initial_noises):
                arr = jnp.asarray(buf, jnp.float32)
                expected_spatial = tuple(
                    self.params["synthesis"]["noise"][self._noise_names[i]].shape[1:]
                )
                if (
                    arr.ndim != 4
                    or arr.shape[0] not in (1, batch)
                    or tuple(arr.shape[1:]) != expected_spatial
                ):
                    raise ValueError(
                        f"initial_noises[{i}]: expected {(1,) + expected_spatial} "
                        f"or {(batch,) + expected_spatial}, got {tuple(arr.shape)}"
                    )
                if arr.shape[0] == 1 and work_batch > 1:
                    arr = jnp.tile(arr, (work_batch, 1, 1, 1))
                elif arr.shape[0] == batch and pad:
                    arr = jnp.concatenate(
                        [arr, jnp.repeat(arr[-1:], pad, axis=0)]
                    )
                noises.append(self._place_data(arr))
        # init() builds zeros_like mirrors of (w, noises), so the Adam state
        # inherits their 'data' sharding; step count / lr stay replicated scalars.
        opt_state = self._optimizer.init((w, noises))

        perceptual = self._perceptual_on_device()

        # The optimization loop runs ON-DEVICE in lax.scan segments whenever
        # per-step host data beyond (latents, distances) isn't needed — one
        # dispatch per segment removes the per-step tunnel/allocator overhead
        # (measured ~60% of step wall time at 1024px). Per-step dispatch
        # remains for noises/images histories, which move big arrays per step.
        use_scan = (
            settings.scan_segment > 1
            and settings.num_steps > 1
            and (step_callback is None or not (want_step_images or per_step_noises))
        )

        dist = jnp.zeros((batch,))
        empty_image = np.zeros((batch, 0, 0, 3), np.uint8)
        effective_noise_factor = jnp.asarray(
            settings.initial_noise_factor if noise_factor is None else noise_factor,
            jnp.float32,
        )

        # Convergence early stop (opt-in): host-side per-step distance trace,
        # checked at scan-segment boundaries / per step. The fetch is a
        # collective under a multi-host mesh, and every process sees the same
        # trace, so the stop decision is identical everywhere by construction.
        converge = settings.convergence_stop is not None
        # The detector only ever reads the last 2*window rows, and nothing can
        # stop before max(min_steps, 2*window): keep a BOUNDED deque of recent
        # rows and skip the per-step device fetch entirely until the trace is
        # close enough to the gate to matter (a fetch is a tunnel round-trip /
        # multi-host collective per step — the dominant cost of arming the
        # stop on a long non-scan run).
        trace_window = 2 * settings.convergence_window
        trace_gate = max(settings.resolved_convergence_min_steps(), trace_window)
        distance_trace: "collections.deque" = collections.deque()
        trace_rows = 0
        steps_completed = 0

        def _record_distances(rows: np.ndarray) -> None:
            nonlocal trace_rows
            distance_trace.append(rows)
            trace_rows += rows.shape[0]
            while distance_trace and (
                trace_rows - distance_trace[0].shape[0] >= trace_window
            ):
                trace_rows -= distance_trace.popleft().shape[0]

        def _wants_trace() -> bool:
            # True once the rows produced so far could be inside the window of
            # a future check — i.e. the trailing 2*window rows before the gate.
            return converge and steps_completed > trace_gate - trace_window

        def _converged() -> bool:
            if not converge or steps_completed < trace_gate or not distance_trace:
                return False
            # min_steps already enforced via steps_completed (the deque is
            # bounded, so the trace length no longer measures total steps).
            return convergence_should_stop(
                np.concatenate(distance_trace, axis=0),
                window=settings.convergence_window,
                epsilon=float(settings.convergence_stop),
                min_steps=0,
            )

        if use_scan:
            # Checks happen at segment boundaries, so the segment length caps
            # the stop granularity: clamp it to the convergence window.
            segment_cap = (
                min(settings.scan_segment, settings.convergence_window)
                if converge
                else settings.scan_segment
            )
            step_number = 0
            while step_number < settings.num_steps:
                segment = min(segment_cap, settings.num_steps - step_number)
                start_time = time.monotonic()
                # A segment length not seen by this projector compiles a fresh
                # lax.scan program (minutes over a tunneled TPU) — the
                # compile-aware budget must apply to EVERY first use of a
                # length, not just step 0: a shorter final remainder segment
                # would otherwise trip the watchdog at the very end of the run.
                # Freshness = the cache grew (robust to the cache's key shape).
                cached_before = len(getattr(self, "_scan_fn_cache", {}))
                scan_fn = self._scan_fn(segment)
                fresh_compile = len(self._scan_fn_cache) > cached_before
                w, noises, opt_state, rng, dists, w_history = scan_fn(
                    w, noises, opt_state, rng, target_proc, perceptual,
                    jnp.asarray(step_number, jnp.int32),
                    effective_noise_factor,
                )
                dist = dists[-1]
                if self.expected_time_per_step is not None or step_callback is not None:
                    dist.block_until_ready()
                if step_callback is not None:
                    # latents histories: the scan stacked post-update w per step
                    history = self._fetch(w_history)[:, :batch]
                    noises_np = [self._fetch(n)[:batch] for n in noises]
                    for offset in range(segment):
                        latents = np.tile(
                            history[offset][:, None, :],
                            (1, self.config.num_style_rows, 1),
                        )
                        step_callback(
                            step_number + offset, latents, noises_np, empty_image
                        )
                elapsed = time.monotonic() - start_time
                # Watchdog at segment granularity: the per-step semantic
                # (projector_file_writer.py:64) scales to segment * budget,
                # with the compile-aware allowance on the first segment.
                if self.expected_time_per_step is not None:
                    budget = self.expected_time_per_step * segment
                    if fresh_compile and self.first_step_timeout is not None:
                        budget = max(budget, self.first_step_timeout)
                    if elapsed > budget:
                        raise RuntimeError(
                            f"Projection segment at step {step_number} took "
                            f"{elapsed:.1f}s > expected {budget}s — assuming a hang "
                            "(watchdog semantics from the reference's per-step "
                            "timeout, at scan-segment granularity)."
                        )
                step_number += segment
                steps_completed = step_number
                if _wants_trace():
                    _record_distances(self._fetch(dists)[:, :batch])
                    if _converged():
                        LOGGER.info(
                            "Convergence stop at step %d/%d (windowed relative "
                            "improvement < %g for every frame).",
                            steps_completed, settings.num_steps,
                            settings.convergence_stop,
                        )
                        break
        else:
            for step_number in range(settings.num_steps):
                start_time = time.monotonic()
                t = jnp.asarray(step_number / max(settings.num_steps, 1), jnp.float32)
                rng, step_rng = jax.random.split(rng)
                w, noises, opt_state, dist, images_dev = self._step_fn(
                    w, noises, opt_state, target_proc, t, step_rng, perceptual,
                    effective_noise_factor,
                )
                if self.expected_time_per_step is not None:
                    # JAX dispatch is async; the watchdog must observe real device
                    # progress, so force a per-step sync when it is armed (the
                    # reference's per-step timeout semantics, projector_file_writer
                    # .py:64,:311-329). Disarm (None) to run fully pipelined.
                    dist.block_until_ready()
                if step_callback is not None:
                    # Pairing note: latents are post-update, the image is the step's
                    # forward pass (pre-update) — exactly the reference's pairing
                    # (NVlabs get_dlatents reads the updated variable while get_images
                    # returns the forward images the loss saw).
                    latents = np.tile(
                        self._fetch(w)[:batch, None, :], (1, self.config.num_style_rows, 1)
                    )
                    noises_np = [self._fetch(n)[:batch] for n in noises]
                    images = (
                        self._fetch(images_dev)[:batch]
                        if want_step_images
                        else empty_image
                    )
                    step_callback(step_number, latents, noises_np, images)
                elapsed = time.monotonic() - start_time
                step_budget = (
                    self.first_step_timeout if step_number == 0 else self.expected_time_per_step
                )
                if step_budget is not None and elapsed > step_budget:
                    raise RuntimeError(
                        f"Projection step {step_number} took {elapsed:.1f}s > "
                        f"expected {step_budget}s — assuming a hang "
                        "(watchdog semantics from the reference's per-step timeout; "
                        "step 0 uses a compile-aware budget)."
                    )
                steps_completed = step_number + 1
                if _wants_trace():
                    _record_distances(self._fetch(dist).reshape(1, -1)[:, :batch])
                    if _converged():
                        LOGGER.info(
                            "Convergence stop at step %d/%d (windowed relative "
                            "improvement < %g for every frame).",
                            steps_completed, settings.num_steps,
                            settings.convergence_stop,
                        )
                        break

        # Jitted final render: the op-by-op eager chain costs seconds of RPC
        # round-trips over a tunneled device; one compiled dispatch instead.
        final_fn = getattr(self, "_final_render_fn", None)
        if final_fn is None:
            final_fn = self._final_render_fn = jax.jit(
                lambda w, noises: images_to_uint8(self._synthesis_from_w(w, noises))
            )
        final_images = self._fetch(final_fn(w, noises))
        latents = self._fetch(w)
        noises_np = [self._fetch(n) for n in noises]
        distances = self._fetch(dist).reshape(-1)[:batch]
        return [
            ProjectionResult(
                final_latents=np.tile(
                    latents[b : b + 1, None, :], (1, self.config.num_style_rows, 1)
                ),
                final_image=final_images[b],
                noises=[n[b : b + 1] for n in noises_np],
                noises_shapes=[(1,) + tuple(n.shape[1:]) for n in noises_np],
                final_distance=float(distances[b]),
                steps_run=steps_completed,
            )
            for b in range(batch)
        ]

    def evaluate_distance(
        self,
        latents: np.ndarray,
        noises: List[np.ndarray],
        target_images: np.ndarray,
    ) -> np.ndarray:
        """
        CLEAN perceptual distance of an endpoint: synthesize from `latents`
        ((B, 512) or (B, R, 512) — row 0) with `noises` and measure against
        `target_images` ((B, H, W, 3) uint8), no exploration jitter. The
        streamed per-step distances include the annealed w-jitter early in a
        run, so this is the honest quality of stopping at a given step —
        the number the convergence-stop benchmarks compare.
        """
        fn = getattr(self, "_eval_distance_fn", None)
        if fn is None:

            def eval_fn(perceptual, w, noise_list, target_proc):
                images = self._synthesis_from_w(w, noise_list)
                proc = downsample_to(images, self.settings.perceptual_size)
                return lpips_distance(perceptual, proc, target_proc)

            fn = self._eval_distance_fn = jax.jit(eval_fn)

        w = jnp.asarray(np.asarray(latents), jnp.float32)
        if w.ndim == 3:  # (B, R, 512): rows identical by invariant
            w = w[:, 0, :]
        target = jnp.asarray(np.asarray(target_images), jnp.float32) / 127.5 - 1.0
        resolution = self.config.resolution
        if target.shape[1] != resolution:
            target = jax.image.resize(
                target, (target.shape[0], resolution, resolution, 3), method="linear"
            )
        target_proc = downsample_to(target, self.settings.perceptual_size)
        noise_list = [jnp.asarray(np.asarray(n), jnp.float32) for n in noises]
        # _fetch, not bare np.asarray: under a process-spanning mesh the jitted
        # output is not fully addressable and must be allgathered first.
        return np.asarray(
            self._fetch(fn(self._perceptual_on_device(), w, noise_list, target_proc))
        )
