"""
CLI: train StyleGAN2 on an image folder, with crash-resume.

The reference delegates training to its TF1 submodule fork, whose one noted feature
is resumable training (CHANGELOG 0.10.0). Here training is first-class: the sharded
jitted train step (gance_tpu/parallel/training.py) driven over an image directory,
checkpointing every N steps, auto-resuming from the checkpoint, and exporting the
EMA generator as an NVlabs-format .pkl that the synthesis CLIs load directly.
"""

from pathlib import Path
from typing import Optional

import click
import numpy as np

from gance_tpu.utils.logging import LOGGER, add_log_file


@click.command()
@click.option("--dataset-directory", type=click.Path(exists=True, file_okay=False), required=True)
@click.option("--resolution", type=click.IntRange(min=16), default=64)
@click.option("--batch-size", type=click.IntRange(min=1), default=8)
@click.option("--total-steps", type=click.IntRange(min=1), default=1000)
@click.option("--learning-rate", type=float, default=0.002)
@click.option("--r1-gamma", type=float, default=10.0)
@click.option(
    "--pl-weight", type=float, default=2.0,
    help="Path-length regularization weight (config-f's G regularizer); "
    "0 disables it (no second-order graph is traced).",
)
@click.option("--fmap-base", type=int, default=None, help="Defaults to config-f scaling.")
@click.option("--fmap-max", type=int, default=512)
@click.option("--latent-size", type=int, default=512)
@click.option(
    "--checkpoint-path", type=click.Path(dir_okay=False), required=True,
    help="Checkpoint file; training resumes from it automatically when it exists.",
)
@click.option("--checkpoint-every", type=click.IntRange(min=1), default=200)
@click.option(
    "--output-network", type=click.Path(dir_okay=False), required=True,
    help="Write the EMA generator here as an NVlabs-format .pkl.",
)
@click.option("--data-parallel", type=int, default=None, help="Mesh data axis size.")
@click.option(
    "--compute-dtype", type=click.Choice(["float32", "bfloat16"]), default="float32",
    help="bfloat16 = mixed precision: bf16 fwd/bwd on the MXU, fp32 master "
    "weights/Adam/EMA/losses (no loss scaling needed, unlike fp16).",
)
@click.option(
    "--remat/--no-remat", default=False,
    help="Rematerialize G/D blocks in the backward pass (jax.checkpoint): "
    "trades ~1/3 extra FLOPs for the HBM high-resolution training needs.",
)
@click.option(
    "--scan-segment", type=click.IntRange(min=1), default=1,
    help="Run this many train steps per device-side lax.scan dispatch. "
    "Measured neutral on this hardware (the donated-state chain already "
    "hides per-step dispatch behind the 183 ms step: 184 ms/step scanned) - "
    "raise it on hosts where dispatch marshaling outruns the step time. "
    "Best when it divides --checkpoint-every.",
)
@click.option(
    "--metrics-every", type=click.IntRange(min=1), default=None,
    help="Evaluate the EMA generator every N steps (PPL + Fréchet feature "
    "distance vs the training images — the NVlabs fork's run-metrics-during-"
    "training capability) and append one JSON line per eval to "
    "--metrics-path. Evaluations run at checkpoint boundaries, so N is "
    "effectively rounded up to a multiple of --checkpoint-every.",
)
@click.option(
    "--metrics-samples", type=click.IntRange(min=2), default=64,
    help="Sample count per metric per evaluation (training-curve cheapness "
    "over publication precision).",
)
@click.option(
    "--metrics-path", type=click.Path(dir_okay=False), default=None,
    help="Metrics JSONL sidecar; default: <checkpoint-path>.metrics.jsonl.",
)
@click.option(
    "--metrics-vgg-weights", type=click.Path(exists=True, dir_okay=False), default=None,
    help="Perceptual weights for the metrics (NVlabs vgg16_zhang_perceptual.pkl "
    "or imported .npz); default: the deterministic random-VGG metric.",
)
@click.option("--seed", type=int, default=0)
@click.option(
    "--dist-coordinator", type=str, default=None,
    help="host:port of process 0. Setting this (with the two options below) joins "
    "a multi-host run: every host starts the same command with its own "
    "--dist-process-id, devices aggregate into ONE global mesh, the dataset and "
    "batch shard per host (--batch-size is PER HOST), and GSPMD carries the "
    "gradient/TP collectives across hosts. Net-new vs the single-GPU reference.",
)
@click.option("--dist-num-processes", type=int, default=None)
@click.option("--dist-process-id", type=int, default=None)
@click.option(
    "--run-config", type=click.Path(dir_okay=False), default=None,
    help="Dump the resolved CLI arguments to this JSON path.",
)
@click.option("--log", type=click.Path(dir_okay=False), default=None)
def cli(  # pylint: disable=too-many-arguments,too-many-locals
    dataset_directory: str,
    resolution: int,
    batch_size: int,
    total_steps: int,
    learning_rate: float,
    r1_gamma: float,
    pl_weight: float,
    fmap_base: Optional[int],
    fmap_max: int,
    latent_size: int,
    checkpoint_path: str,
    checkpoint_every: int,
    output_network: str,
    data_parallel: Optional[int],
    compute_dtype: str,
    remat: bool,
    scan_segment: int,
    metrics_every: Optional[int],
    metrics_samples: int,
    metrics_path: Optional[str],
    metrics_vgg_weights: Optional[str],
    seed: int,
    dist_coordinator: Optional[str],
    dist_num_processes: Optional[int],
    dist_process_id: Optional[int],
    run_config: Optional[str],
    log: Optional[str],
) -> None:
    """Train StyleGAN2 on an image folder (resumable; exports a loadable .pkl)."""
    arguments = dict(locals())  # snapshot before any local bindings join
    from gance_tpu.cli.common import dump_run_config

    dump_run_config(run_config, arguments)
    add_log_file(Path(log) if log else None)

    dist_options = (dist_coordinator, dist_num_processes, dist_process_id)
    if any(option is not None for option in dist_options):
        if any(option is None for option in dist_options):
            raise click.UsageError(
                "--dist-coordinator, --dist-num-processes and --dist-process-id "
                "must be given together"
            )
        if metrics_every is not None:
            # Metric evaluation drives its own (local) jitted programs; under a
            # process-spanning mesh that would need every host to run a second,
            # synchronized collective program mid-training. Run metrics offline
            # (network_metrics.py) against the exported checkpoints instead.
            # (Checked BEFORE initialize_distributed — that call blocks on the
            # coordinator rendezvous, and a usage error must not.)
            raise click.UsageError(
                "--metrics-every is single-process-only; evaluate multi-host "
                "runs offline with network_metrics.py against the exported .pkl."
            )
        from gance_tpu.parallel.distributed import initialize_distributed

        # Must precede every device query below — JAX fixes its process
        # topology at backend init.
        initialize_distributed(dist_coordinator, dist_num_processes, dist_process_id)

    import jax

    from gance_tpu.models.pickle_loader import save_generator_pickle
    from gance_tpu.models.stylegan2 import GeneratorConfig
    from gance_tpu.parallel.mesh import create_mesh
    from gance_tpu.parallel.training import (
        TrainingConfig,
        init_training_state,
        load_checkpoint,
        make_train_step,
        save_checkpoint,
        shard_training_state,
    )

    model_config = GeneratorConfig(
        resolution=resolution,
        fmap_base=fmap_base if fmap_base is not None else 32768,
        fmap_max=fmap_max,
        latent_size=latent_size,
        dlatent_size=latent_size,
        mapping_fmaps=latent_size,
    )
    train_config = TrainingConfig(
        learning_rate=learning_rate, r1_gamma=r1_gamma, pl_weight=pl_weight,
        compute_dtype=compute_dtype, remat=remat,
    )

    from gance_tpu.parallel.data import StreamingImageDataset

    # Streaming loader: constant memory for arbitrarily large folders, and the
    # batch sequence is a pure function of (seed, step) so resuming from the
    # checkpoint replays exactly the batches an uninterrupted run would see.
    # Multi-host: shard the file list per host (process_index/process_count).
    dataset = StreamingImageDataset(
        Path(dataset_directory),
        resolution,
        seed=seed + 1,
        host_index=jax.process_index(),
        host_count=jax.process_count(),
    )

    mesh = create_mesh(data_parallel=data_parallel) if len(jax.devices()) > 1 else None
    ckpt = Path(checkpoint_path)
    had_checkpoint = ckpt.exists()
    if had_checkpoint:
        state = load_checkpoint(ckpt)
        LOGGER.info("Resumed from %s at step %d", ckpt, int(state.step))
    else:
        state = init_training_state(jax.random.PRNGKey(seed), model_config, train_config)
    if jax.process_count() > 1:
        # Multi-host agreement: checkpoints are written by process 0 only, so
        # on pods WITHOUT a shared filesystem the other hosts would init fresh
        # state here while process 0 resumes — shard_training_state would then
        # assemble mismatched per-host values into one global array (silent
        # corruption), and disagreeing start steps hang the collectives.
        # Process 0's load-or-init result is canonical; ship it to everyone.
        from jax.experimental import multihost_utils

        seen = multihost_utils.process_allgather(np.asarray([had_checkpoint]))
        if bool(seen.any()) and not bool(seen.all()):
            LOGGER.warning(
                "Checkpoint %s visible on %d/%d hosts (no shared filesystem?);"
                " adopting process 0's state everywhere.",
                ckpt, int(seen.sum()), int(seen.size),
            )
        state = multihost_utils.broadcast_one_to_all(
            jax.tree.map(np.asarray, state)
        )
    if mesh is not None:
        state = shard_training_state(mesh, state, train_config)
        LOGGER.info("Training over mesh %s", dict(mesh.shape))

    from gance_tpu.parallel.training import make_train_scan
    from gance_tpu.utils.profiling import StageTimer

    timer = StageTimer("train", log_every=max(checkpoint_every // 4, 1))
    start_step = int(state.step)
    metrics = None

    metrics_file = (
        Path(metrics_path)
        if metrics_path
        else ckpt.with_name(ckpt.name + ".metrics.jsonl")
    )
    eval_perceptual = None
    last_metrics_step = start_step

    def maybe_eval_metrics(next_step: int) -> None:
        """EMA-quality eval at a checkpoint boundary (every --metrics-every steps)."""
        nonlocal eval_perceptual, last_metrics_step
        if metrics_every is None or next_step - last_metrics_step < metrics_every:
            return
        last_metrics_step = next_step
        from gance_tpu.metrics.training_eval import (
            append_metrics_record,
            evaluate_training_metrics,
        )

        if eval_perceptual is None:
            from gance_tpu.projection.lpips import load_vgg_params, random_vgg_params

            eval_perceptual = (
                load_vgg_params(Path(metrics_vgg_weights))
                if metrics_vgg_weights
                else random_vgg_params(seed=0)
            )
        host_ema = jax.tree.map(np.asarray, state.ema_params)
        record = evaluate_training_metrics(
            host_ema,
            model_config,
            eval_perceptual,
            Path(dataset_directory),
            step=next_step,
            num_samples=metrics_samples,
            seed=seed,
        )
        append_metrics_record(metrics_file, record)

    if scan_segment > 1:
        # Device-side scan: one dispatch per block of steps. Per-step keys are
        # host-derived exactly as the per-step path derives them, so the two
        # paths produce the same training trajectory.
        train_segment = make_train_scan(model_config, train_config, mesh=mesh)
        pending_reals: list = []
        pending_keys: list = []

        def flush_block():
            nonlocal state, metrics
            if not pending_reals:
                return
            block = np.stack(pending_reals)
            if mesh is not None:
                from gance_tpu.parallel.distributed import global_scan_block

                # Host-local shard -> one global (S, B_global, ...) array over
                # the mesh 'data' axis (each host loaded only its file shard).
                block = global_scan_block(mesh, block)
            keys = np.stack(pending_keys)
            state, stacked = train_segment(state, block, keys)
            metrics = {k: np.asarray(v)[-1] for k, v in stacked.items()}
            timer.tick(n=len(pending_reals))
            pending_reals.clear()
            pending_keys.clear()

        for step, reals in dataset.batches(start_step, total_steps, batch_size):
            pending_reals.append(np.asarray(reals))
            pending_keys.append(np.asarray(jax.random.PRNGKey(seed * 1000 + step)))
            boundary = (step + 1) % checkpoint_every == 0 or step + 1 == total_steps
            if len(pending_reals) >= scan_segment or boundary:
                flush_block()
            if boundary:
                save_checkpoint(ckpt, state)
                LOGGER.info(
                    "step %d: d_loss=%.4f g_loss=%.4f r1=%.4f pl=%.4f (checkpointed)",
                    step + 1, float(metrics["d_loss"]), float(metrics["g_loss"]),
                    float(metrics["r1"]), float(metrics.get("pl", 0.0)),
                )
                maybe_eval_metrics(step + 1)
    else:
        train_step = make_train_step(model_config, train_config, mesh=mesh)
        if mesh is not None:
            from gance_tpu.parallel.distributed import global_batch
        for step, reals in dataset.batches(start_step, total_steps, batch_size):
            if mesh is not None:
                reals = global_batch(mesh, reals)
            # np.asarray: host-derived keys must arrive as plain host data so a
            # multi-process jit treats them as replicated inputs.
            state, metrics = train_step(
                state, reals, np.asarray(jax.random.PRNGKey(seed * 1000 + step))
            )
            timer.tick()
            if (step + 1) % checkpoint_every == 0 or step + 1 == total_steps:
                save_checkpoint(ckpt, state)
                LOGGER.info(
                    "step %d: d_loss=%.4f g_loss=%.4f r1=%.4f pl=%.4f (checkpointed)",
                    step + 1, float(metrics["d_loss"]), float(metrics["g_loss"]),
                    float(metrics["r1"]), float(metrics.get("pl", 0.0)),
                )
                maybe_eval_metrics(step + 1)
    timer.summary()

    if jax.process_count() > 1:
        # Sharded leaves are not fully addressable from one host: allgather
        # (collective — every process reaches this line), coordinator writes.
        from jax.experimental import multihost_utils

        host_ema = multihost_utils.process_allgather(state.ema_params, tiled=True)
        if jax.process_index() != 0:
            return
    else:
        host_ema = jax.tree.map(np.asarray, state.ema_params)
    save_generator_pickle(host_ema, Path(output_network))
    LOGGER.info("Wrote EMA generator to %s", output_network)


if __name__ == "__main__":
    cli()
