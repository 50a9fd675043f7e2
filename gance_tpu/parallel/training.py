"""
StyleGAN2 training step — sharded, jitted, resumable.

The reference never calls training from Python, but its submodule fork's one noted
feature is crash-resumable training (CHANGELOG 0.10.0; SURVEY.md §2.9 last row), so
training is part of the capability surface. This module implements the StyleGAN2
objective in functional JAX over a ('data', 'model') mesh:

  * non-saturating logistic GAN loss,
  * R1 gradient penalty on reals (lazy regularization: applied every
    `r1_interval` steps at interval-scaled strength, like the reference),
  * path-length regularization on G (lazy, every `pl_interval` steps):
    penalizes deviation of |J^T y| — the w+-space Jacobian contracted with a
    unit-variance image-space probe — from its running mean, NVlabs config-f's
    G regularizer (stylegan2 training/loss.py G_logistic_ns_pathreg),
  * style-mixing regularization (prob 0.9),
  * EMA of the generator ("Gs" — the network the inference pipeline consumes),
  * Adam for both networks, batch sharded over 'data', large weights over 'model',
  * checkpoint/resume as a plain pytree save/restore (per-step durability).
"""

import pickle
from dataclasses import dataclass
from pathlib import Path
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh

from gance_tpu.models.stylegan2 import (
    GeneratorConfig,
    broadcast_dlatents,
    discriminator_apply,
    init_discriminator_params,
    init_generator_params,
    mapping_apply,
    synthesis_apply,
)
from gance_tpu.parallel.mesh import (
    discriminator_param_sharding,
    generator_param_sharding,
    replicated,
    shard_batch,
)

Params = Dict[str, Any]


@dataclass(frozen=True)
class TrainingConfig:
    """Training hyperparameters (StyleGAN2 config-f defaults)."""

    learning_rate: float = 0.002
    adam_beta1: float = 0.0
    adam_beta2: float = 0.99
    adam_eps: float = 1e-8
    r1_gamma: float = 10.0
    r1_interval: int = 16
    # Path-length regularization (G's lazy regularizer in config-f). 0 disables
    # it statically (no second-order graph is traced at all). The penalty is
    # computed on batch // pl_minibatch_shrink samples, and its strength is
    # interval-scaled exactly like R1. pl_decay is the running-mean EMA rate.
    pl_weight: float = 2.0
    pl_interval: int = 4
    pl_decay: float = 0.01
    pl_minibatch_shrink: int = 2
    style_mixing_prob: float = 0.9
    # Moving average of the mapping output ("w_avg"): the center inference-time
    # truncation contracts toward (networks.G_mapping's dlatent_avg_beta).
    # Without this update an exported network truncates around the zero init.
    dlatent_avg_beta: float = 0.995
    ema_beta: float = 0.999
    # Mixed precision: 'bfloat16' runs G/D forward+backward in bf16 on the MXU
    # while master weights, gradients (via the cast transpose), Adam moments,
    # EMA and the losses stay fp32 — the standard TPU training recipe (bf16
    # needs no loss scaling, unlike fp16). 'float32' is the exact path.
    compute_dtype: str = "float32"
    # Rematerialize G/D blocks under autodiff (jax.checkpoint): recompute
    # activations in the backward pass instead of storing them. Trades ~1/3
    # extra FLOPs for the HBM that high-resolution training needs (without it
    # a 256px batch-8 step already exceeds one v5e's 16GB).
    remat: bool = False


class TrainingState(NamedTuple):
    """Everything needed to resume training.

    `pl_mean` (the path-length running mean) defaults to 0.0 so checkpoints
    written before it existed unpickle cleanly (NamedTuple reconstruction
    fills missing trailing fields from defaults).
    """

    g_params: Params
    d_params: Params
    g_opt_state: Any
    d_opt_state: Any
    ema_params: Params
    step: jax.Array
    pl_mean: jax.Array = 0.0


def _optimizer(config: TrainingConfig) -> optax.GradientTransformation:
    return optax.adam(
        config.learning_rate, b1=config.adam_beta1, b2=config.adam_beta2,
        eps=config.adam_eps,
    )


def init_training_state(
    key: jax.Array,
    model_config: GeneratorConfig,
    train_config: TrainingConfig = TrainingConfig(),
) -> TrainingState:
    g_key, d_key = jax.random.split(key)
    g_params = init_generator_params(g_key, model_config)
    d_params = init_discriminator_params(d_key, model_config)
    opt = _optimizer(train_config)
    return TrainingState(
        g_params=g_params,
        d_params=d_params,
        g_opt_state=opt.init(g_params),
        d_opt_state=opt.init(d_params),
        ema_params=jax.tree.map(jnp.copy, g_params),
        step=jnp.zeros((), jnp.int32),
        pl_mean=jnp.zeros((), jnp.float32),
    )


def _mixed_dlatents(
    g_params: Params,
    z1: jax.Array,
    z2: jax.Array,
    rng: jax.Array,
    model_config: GeneratorConfig,
    mixing_prob: float,
) -> jax.Array:
    """Style-mixing regularization: crossover w rows at a random cutoff."""
    w1 = mapping_apply(g_params, z1, model_config)
    w2 = mapping_apply(g_params, z2, model_config)
    d1 = broadcast_dlatents(w1, model_config)
    d2 = broadcast_dlatents(w2, model_config)
    rows = model_config.num_style_rows
    mix_rng, cutoff_rng = jax.random.split(rng)
    do_mix = jax.random.uniform(mix_rng, (z1.shape[0], 1, 1)) < mixing_prob
    cutoff = jax.random.randint(cutoff_rng, (z1.shape[0], 1, 1), 1, rows)
    row_idx = jnp.arange(rows)[None, :, None]
    take_second = do_mix & (row_idx >= cutoff)
    return jnp.where(take_second, d2, d1)


def _make_train_step_core(
    model_config: GeneratorConfig,
    train_config: TrainingConfig = TrainingConfig(),
    mesh: Optional[Mesh] = None,
) -> Callable[[TrainingState, jax.Array, jax.Array], Tuple[TrainingState, Dict[str, jax.Array]]]:
    """
    The un-jitted train step: (state, real_images (B,R,R,3) float [-1,1],
    rng) -> (state, metrics). When `mesh` is given, batches are constrained to the
    'data' axis (params arrive pre-sharded via shard_training_state). Shared by
    the per-step jit (make_train_step) and the device-side scanned loop
    (make_train_scan).
    """
    opt = _optimizer(train_config)
    compute_dtype = jnp.dtype(train_config.compute_dtype)
    constrain = (
        (lambda x: jax.lax.with_sharding_constraint(x, shard_batch(mesh)))
        if mesh is not None
        else (lambda x: x)
    )

    def generate(g_params: Params, z1, z2, rng) -> jax.Array:
        dlatents = _mixed_dlatents(
            g_params, z1, z2, rng, model_config, train_config.style_mixing_prob
        )
        noise_rng = jax.random.fold_in(rng, 1)
        from gance_tpu.models.stylegan2 import resolve_phase_top_block

        # Same phase gate as the forward path (auto mode excludes only
        # fp32-HIGHEST, whose phase backward compile is pathological — r2;
        # the fp32-HIGH phase backward compiles cleanly and wins, r3).
        return synthesis_apply(
            g_params, dlatents, model_config, noise_mode="random", rng=noise_rng,
            compute_dtype=compute_dtype, remat=train_config.remat,
            phase_top_block_mode=resolve_phase_top_block(model_config, compute_dtype),
        )

    def d_loss_fn(d_params, g_params, reals, z1, z2, rng, apply_r1):
        fakes = constrain(generate(g_params, z1, z2, rng))
        fake_logits = discriminator_apply(
            d_params, fakes, model_config, compute_dtype=compute_dtype,
            remat=train_config.remat,
        )
        real_logits = discriminator_apply(
            d_params, reals, model_config, compute_dtype=compute_dtype,
            remat=train_config.remat,
        )
        loss = jnp.mean(jax.nn.softplus(fake_logits)) + jnp.mean(
            jax.nn.softplus(-real_logits)
        )

        # R1: gradient penalty on reals (lazy-reg strength scaling like NVlabs)
        def real_score(images):
            return jnp.sum(
                discriminator_apply(
                    d_params, images, model_config, compute_dtype=compute_dtype,
                    remat=train_config.remat,
                )
            )

        def r1_term() -> jax.Array:
            # Lazy R1 is FUSED into the main D update every r1_interval-th step
            # (interval-scaled strength), unlike NVlabs' separate interleaved
            # reg-only optimizer steps. Deliberate deviation: NVlabs' mb_ratio
            # Adam rescale (lr and betas x interval/(interval+1)) compensates
            # for its optimizer seeing main-loss grads in only 16 of every 17
            # updates — here the main loss is present in EVERY update, so that
            # compensation does not apply and the raw hyperparameters are
            # correct for this formulation.
            grads = jax.grad(real_score)(reals)
            penalty = jnp.mean(jnp.sum(jnp.square(grads), axis=(1, 2, 3)))
            return penalty * (train_config.r1_gamma * 0.5) * train_config.r1_interval

        r1 = jax.lax.cond(apply_r1, r1_term, lambda: jnp.asarray(0.0))
        return loss + r1, (loss, r1)

    pl_enabled = train_config.pl_weight > 0.0 and train_config.pl_interval > 0

    def g_loss_fn(g_params, d_params, z1, z2, rng, pl_mean, apply_pl):
        fakes = constrain(generate(g_params, z1, z2, rng))
        fake_logits = discriminator_apply(
            d_params, fakes, model_config, compute_dtype=compute_dtype,
            remat=train_config.remat,
        )
        loss = jnp.mean(jax.nn.softplus(-fake_logits))

        def pl_term() -> Tuple[jax.Array, jax.Array]:
            # NVlabs pathreg: lengths = sqrt(mean over style rows of
            # |d(sum(images * y))/d w+|^2 summed over the latent dim), with
            # y ~ N(0, 1/HW) an image-space probe; penalize (lengths - EMA)^2.
            # Differentiating the penalty w.r.t. g_params goes through the
            # Jacobian-vector product (second order through synthesis) AND
            # through w+'s dependence on the mapping network — same as the
            # reference's tf.gradients-of-tf.gradients formulation.
            pl_batch = max(
                z1.shape[0] // max(train_config.pl_minibatch_shrink, 1), 1
            )
            pl_rng = jax.random.fold_in(rng, 2)
            dlatents = _mixed_dlatents(
                g_params, z1[:pl_batch], z2[:pl_batch], pl_rng, model_config,
                train_config.style_mixing_prob,
            )

            def probed_sum(dl: jax.Array) -> jax.Array:
                from gance_tpu.models.stylegan2 import resolve_phase_top_block

                imgs = synthesis_apply(
                    g_params, dl, model_config, noise_mode="random",
                    rng=jax.random.fold_in(pl_rng, 1),
                    compute_dtype=compute_dtype, remat=train_config.remat,
                    phase_top_block_mode=resolve_phase_top_block(
                        model_config, compute_dtype
                    ),
                ).astype(jnp.float32)
                probe = jax.random.normal(
                    jax.random.fold_in(pl_rng, 3), imgs.shape, jnp.float32
                ) / np.sqrt(imgs.shape[1] * imgs.shape[2])
                return jnp.sum(imgs * probe)

            pl_grads = jax.grad(probed_sum)(dlatents)
            pl_lengths = jnp.sqrt(
                jnp.mean(jnp.sum(jnp.square(pl_grads), axis=2), axis=1)
            )
            penalty = jnp.mean(
                jnp.square(pl_lengths - jax.lax.stop_gradient(pl_mean))
            )
            scaled = penalty * (
                train_config.pl_weight * train_config.pl_interval
            )
            return scaled, jnp.mean(pl_lengths)

        if pl_enabled:
            pl_penalty, pl_length = jax.lax.cond(
                apply_pl, pl_term, lambda: (jnp.asarray(0.0), jnp.asarray(0.0))
            )
        else:
            pl_penalty = pl_length = jnp.asarray(0.0)
        return loss + pl_penalty, (loss, pl_penalty, pl_length)

    def train_step(
        state: TrainingState, reals: jax.Array, rng: jax.Array
    ) -> Tuple[TrainingState, Dict[str, jax.Array]]:
        reals = constrain(reals.astype(jnp.float32))
        batch = reals.shape[0]
        z_rng, mix_rng_d, mix_rng_g, z_rng_g = jax.random.split(rng, 4)
        z1 = jax.random.normal(z_rng, (batch, model_config.latent_size))
        z2 = jax.random.normal(jax.random.fold_in(z_rng, 7), (batch, model_config.latent_size))
        apply_r1 = (state.step % train_config.r1_interval) == 0
        apply_pl = (state.step % train_config.pl_interval) == 0 if pl_enabled else False

        # --- D step ---
        (_, (d_loss, r1)), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state.d_params, state.g_params, reals, z1, z2, mix_rng_d, apply_r1
        )
        d_updates, d_opt_state = opt.update(d_grads, state.d_opt_state, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)

        # --- G step (against the updated D) ---
        z1g = jax.random.normal(z_rng_g, (batch, model_config.latent_size))
        z2g = jax.random.normal(jax.random.fold_in(z_rng_g, 7), (batch, model_config.latent_size))
        pl_mean = jnp.asarray(state.pl_mean, jnp.float32)
        (_, (g_loss, pl_penalty, pl_length)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(state.g_params, d_params, z1g, z2g, mix_rng_g, pl_mean, apply_pl)
        g_updates, g_opt_state = opt.update(g_grads, state.g_opt_state, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        # Path-length running mean: EMA toward the measured lengths, advanced
        # only on steps where the regularizer actually ran.
        if pl_enabled:
            new_pl_mean = jnp.where(
                apply_pl,
                pl_mean + train_config.pl_decay * (pl_length - pl_mean),
                pl_mean,
            )
        else:
            new_pl_mean = pl_mean

        # --- dlatent_avg ("w_avg") moving average: no gradient flows to it;
        # it tracks the mean mapping output so inference truncation has a real
        # center. One extra mapping forward on the G-step latents (tiny next
        # to synthesis). ---
        w_avg_batch = jnp.mean(mapping_apply(g_params, z1g, model_config), axis=0)
        new_dlatent_avg = w_avg_batch + (
            g_params["dlatent_avg"] - w_avg_batch
        ) * train_config.dlatent_avg_beta
        g_params = {**g_params, "dlatent_avg": new_dlatent_avg}

        # --- EMA ("Gs") ---
        beta = train_config.ema_beta
        ema_params = jax.tree.map(
            lambda ema, new: ema * beta + new * (1.0 - beta), state.ema_params, g_params
        )
        # Non-trainable running statistics are copied, not EMA'd (the exported
        # Gs should truncate around the CURRENT running w_avg).
        ema_params = {**ema_params, "dlatent_avg": new_dlatent_avg}

        new_state = TrainingState(
            g_params=g_params,
            d_params=d_params,
            g_opt_state=g_opt_state,
            d_opt_state=d_opt_state,
            ema_params=ema_params,
            step=state.step + 1,
            pl_mean=new_pl_mean,
        )
        metrics = {"d_loss": d_loss, "g_loss": g_loss, "r1": r1, "pl": pl_penalty}
        return new_state, metrics

    return train_step


def make_train_step(
    model_config: GeneratorConfig,
    train_config: TrainingConfig = TrainingConfig(),
    mesh: Optional[Mesh] = None,
) -> Callable[[TrainingState, jax.Array, jax.Array], Tuple[TrainingState, Dict[str, jax.Array]]]:
    """The jitted per-step trainer (see _make_train_step_core)."""
    return jax.jit(
        _make_train_step_core(model_config, train_config, mesh), donate_argnums=(0,)
    )


def make_train_scan(
    model_config: GeneratorConfig,
    train_config: TrainingConfig = TrainingConfig(),
    mesh: Optional[Mesh] = None,
) -> Callable[[TrainingState, jax.Array, jax.Array], Tuple[TrainingState, Dict[str, jax.Array]]]:
    """
    A device-side lax.scan over a BLOCK of train steps: one host dispatch per
    `segment` steps instead of per step. The training state pytree has hundreds
    of leaves (G+D params, two Adam states, EMA), so per-step dispatch marshals
    hundreds of buffer handles over the interconnect every step — the same
    overhead class measured at ~60% of projection step time; scanning removes
    it (the projection precedent: 45.1 -> ~20 s/frame).

    Signature: (state, reals_block (S, B, R, R, 3), step_keys (S, 2) uint32
    PRNG keys — one per step, host-derived so the per-step protocol matches
    make_train_step exactly) -> (state, metrics stacked over S).
    """
    step_core = _make_train_step_core(model_config, train_config, mesh)

    def train_segment(
        state: TrainingState, reals_block: jax.Array, step_keys: jax.Array
    ) -> Tuple[TrainingState, Dict[str, jax.Array]]:
        def body(carry, xs):
            reals, key = xs
            new_state, metrics = step_core(carry, reals, key)
            return new_state, metrics

        return jax.lax.scan(body, state, (reals_block, step_keys))

    return jax.jit(train_segment, donate_argnums=(0,))


def shard_training_state(
    mesh: Mesh,
    state: TrainingState,
    train_config: TrainingConfig = TrainingConfig(),
) -> TrainingState:
    """
    Place a training state onto the mesh: params tensor-parallel per the sharding
    policy, optimizer moments sharded exactly like their params (via a reference
    opt.init on the sharded params), scalars replicated.
    """
    g_shard = generator_param_sharding(mesh, state.g_params)
    d_shard = discriminator_param_sharding(mesh, state.d_params)
    rep = replicated(mesh)

    g_params = jax.device_put(state.g_params, g_shard)
    d_params = jax.device_put(state.d_params, d_shard)

    opt = _optimizer(train_config)

    def opt_state_shardings(param_shardings: Any, params: Params) -> Any:
        """
        Sharding pytree for the optimizer state WITHOUT allocating it:
        optax.adam's mu/nu mirror the params tree (shard like their params),
        scalars (the step counter) replicate. Structure is asserted against an
        abstract opt.init so an optimizer change can't silently mis-shard —
        on mismatch, fall back to a real (allocating) opt.init reference.
        """
        from jax.sharding import NamedSharding

        abstract = jax.eval_shape(opt.init, params)
        try:
            # adam state = (ScaleByAdamState(count, mu, nu), EmptyState())
            scale_state, *rest = abstract
            candidate = (
                type(scale_state)(count=rep, mu=param_shardings, nu=param_shardings),
                *rest,
            )
            if jax.tree.structure(candidate) == jax.tree.structure(abstract):
                return candidate
        except (TypeError, AttributeError):
            pass
        # Fallback: allocate a reference state and read its shardings (the
        # pre-existing behavior; costs a transient 2x-params allocation).
        def from_ref(ref_leaf: Any) -> Any:
            sharding = getattr(ref_leaf, "sharding", None)
            if not isinstance(sharding, NamedSharding) or sharding.mesh.devices.size != mesh.devices.size:
                return rep
            return sharding

        return jax.tree.map(from_ref, opt.init(params))

    def move_opt_state(shardings: Any, old: Any) -> Any:
        return jax.tree.map(jax.device_put, old, shardings)

    return TrainingState(
        g_params=g_params,
        d_params=d_params,
        g_opt_state=move_opt_state(
            opt_state_shardings(g_shard, g_params), state.g_opt_state
        ),
        d_opt_state=move_opt_state(
            opt_state_shardings(d_shard, d_params), state.d_opt_state
        ),
        ema_params=jax.device_put(state.ema_params, g_shard),
        step=jax.device_put(state.step, rep),
        pl_mean=jax.device_put(jnp.asarray(state.pl_mean, jnp.float32), rep),
    )


# --------------------------------------------------------------------------------
# Checkpoint / resume (the fork's crash-resume capability)
# --------------------------------------------------------------------------------


def save_checkpoint(path: Path, state: TrainingState) -> None:
    """
    Atomic-ish checkpoint: write to .tmp then rename.

    Multi-host: np.asarray raises on arrays that aren't fully addressable from
    this process, so sharded state is first allgathered to every host (a
    collective — every process must call save_checkpoint, which the train loop
    does), and only process 0 writes (the hosts would otherwise race on the
    same path).
    """
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        host_state = multihost_utils.process_allgather(state, tiled=True)
        if jax.process_index() != 0:
            return
    else:
        host_state = jax.tree.map(np.asarray, state)
    tmp = Path(str(path) + ".tmp")
    with open(tmp, "wb") as f:
        pickle.dump(host_state, f, protocol=pickle.HIGHEST_PROTOCOL)
    tmp.replace(path)


def load_checkpoint(path: Path) -> TrainingState:
    with open(path, "rb") as f:
        return pickle.load(f)
