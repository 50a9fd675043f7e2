"""
CLI: run the online synthesis HTTP daemon (gance_tpu/serving/).

Net-new vs the reference (which only ships offline render CLIs): load one
generator pickle, bind an HTTP port, and serve /synthesize with dynamic
request batching onto the TPU's fixed-shape compiled programs. See
gance_tpu/serving/daemon.py for the endpoint contract.
"""

from pathlib import Path
from typing import Optional

import click

from gance_tpu.utils.logging import LOGGER, add_log_file


@click.command()
@click.option(
    "--network-path", type=click.Path(exists=True, dir_okay=False), multiple=True,
    help="Generator .pkl to serve (repeat to serve several resident networks; "
    "requests pick one with the 'network' field, default index 0).",
)
@click.option(
    "--networks-directory", type=click.Path(exists=True, file_okay=False),
    default=None,
    help="Serve every *.pkl in this directory (sorted), like the render CLIs.",
)
@click.option(
    "--networks-json", type=click.Path(exists=True, dir_okay=False), default=None,
    help='JSON file {"networks": [paths...]} of pickles to serve.',
)
@click.option("--host", default="127.0.0.1", show_default=True)
@click.option(
    "--port", type=click.IntRange(min=0), default=8799, show_default=True,
    help="0 binds an ephemeral port (printed at startup).",
)
@click.option(
    "--max-batch", type=click.IntRange(min=1), default=None,
    help="Device batch ceiling (default: GANCE_TPU_SERVE_BATCH or 48, the "
    "measured 1024px v5e sweet spot; keep it a multiple of 8).",
)
@click.option(
    "--max-delay-ms", type=click.FloatRange(min=0), default=5.0, show_default=True,
    help="Coalescing linger: how long a request waits for company before the "
    "batch dispatches (latency traded for occupancy).",
)
@click.option(
    "--output-side-length", type=click.IntRange(min=1), default=None,
    help="Scale frames to this side on-device before egress (native "
    "resolution when unset).",
)
@click.option(
    "--truncation-psi", type=float, default=None,
    help="Override the serving default truncation psi.",
)
@click.option(
    "--compute-dtype", type=click.Choice(["bfloat16", "float32"]), default=None,
    help="Override the serving compute dtype (default bfloat16).",
)
@click.option(
    "--use-mesh/--no-mesh", "use_mesh", default=None,
    help="Shard serving over ALL local devices (params tensor-parallel over "
    "'model', request batches over 'data'). Default: mesh when more than one "
    "device is visible, single-device otherwise.",
)
@click.option(
    "--data-parallel", type=click.IntRange(min=1), default=None,
    help="Data-axis size of the serving mesh (device count / this = tensor-"
    "parallel size). Implies --use-mesh. Default: pure DP over all devices.",
)
@click.option(
    "--dist-coordinator", type=str, default=None,
    help="host:port of process 0's jax.distributed coordinator. Setting this "
    "(with the two options below) runs the daemon MULTI-HOST: every host "
    "runs this command with its own --dist-process-id, process 0 serves "
    "HTTP and broadcasts each device batch over a TCP control channel, the "
    "other processes mirror every dispatch so request batches shard over "
    "ALL hosts' chips (serving/multihost.py).",
)
@click.option("--dist-num-processes", type=int, default=None)
@click.option("--dist-process-id", type=int, default=None)
@click.option(
    "--control-port", type=click.IntRange(min=0), default=None,
    help="TCP port of the multi-host control channel (coordinator binds, "
    "workers connect to the --dist-coordinator host). Default: the "
    "jax.distributed coordinator port + 1000.",
)
@click.option(
    "--control-bind", type=str, default=None,
    help="Interface the control channel listens on. Default: the "
    "--dist-coordinator host (NOT 0.0.0.0 — the channel should face the "
    "worker fleet only; set GANCE_TPU_SERVE_TOKEN on every host too).",
)
@click.option("--log", "log_path", type=click.Path(dir_okay=False), default=None)
@click.option(
    "--warmup", type=click.Choice(["all", "max", "none"]), default="all",
    show_default=True,
    help="Programs to compile before binding the port, so requests never "
    "absorb the (minutes-long on a cold TPU) XLA compile. 'all' = every "
    "bucket shape the batcher can dispatch, both the z and w+ lanes; 'max' = "
    "only the full-batch z program (fastest startup; other shapes compile on "
    "first use); 'none' = bind immediately.",
)
@click.option(
    "--warmup-audio", type=str, default=None,
    help="Comma-separated clip durations in seconds (e.g. '2,5,30'): run the "
    "/synthesize_audio feature pipeline once per duration (at the default "
    "request fps, 30) before binding, so the first audio request of each "
    "expected clip length never absorbs the per-length DSP compiles "
    "(host-side only; no device work).",
)
def cli(  # pylint: disable=too-many-arguments
    network_path: tuple,
    networks_directory: Optional[str],
    networks_json: Optional[str],
    host: str,
    port: int,
    max_batch: Optional[int],
    max_delay_ms: float,
    output_side_length: Optional[int],
    truncation_psi: Optional[float],
    compute_dtype: Optional[str],
    use_mesh: Optional[bool],
    data_parallel: Optional[int],
    dist_coordinator: Optional[str],
    dist_num_processes: Optional[int],
    dist_process_id: Optional[int],
    control_port: Optional[int],
    control_bind: Optional[str],
    log_path: Optional[str],
    warmup: str,
    warmup_audio: Optional[str],
) -> None:
    """Serve one or more generators over HTTP with dynamic request batching."""
    import numpy as np

    from gance_tpu.cli.common import maybe_initialize_distributed, resolve_networks
    from gance_tpu.serving import SynthesisDaemon, default_max_batch
    from gance_tpu.serving.batcher import warmup_batch_sizes
    from gance_tpu.synthesis.runtime import SynthesisNetwork
    from gance_tpu.utils.profiling import start_memwatch

    start_memwatch()  # no-op unless GANCE_TPU_MEMWATCH is set
    if log_path:
        add_log_file(Path(log_path))

    # Must precede every device query: JAX fixes its process topology at
    # backend init.
    maybe_initialize_distributed(
        dist_coordinator, dist_num_processes, dist_process_id
    )

    kwargs = {}
    if truncation_psi is not None:
        kwargs["truncation_psi"] = truncation_psi
    if compute_dtype is not None:
        import jax.numpy as jnp

        kwargs["compute_dtype"] = {
            "bfloat16": jnp.bfloat16, "float32": jnp.float32,
        }[compute_dtype]
    import jax

    multi_host = jax.process_count() > 1
    if multi_host:
        if use_mesh is False:
            raise click.UsageError(
                "--no-mesh is impossible multi-host: the whole point of "
                "--dist-* is sharding batches over every host's chips"
            )
        use_mesh = True
    if data_parallel is not None and use_mesh is None:
        use_mesh = True
    if use_mesh is None:
        use_mesh = len(jax.devices()) > 1
    if use_mesh:
        from gance_tpu.parallel.mesh import create_mesh

        mesh = create_mesh(data_parallel=data_parallel)
        LOGGER.info(
            "Serving over a %s mesh (%d devices)",
            dict(mesh.shape), mesh.devices.size,
        )
        kwargs["mesh"] = mesh
    elif data_parallel is not None:
        raise click.UsageError("--data-parallel requires the mesh (drop --no-mesh)")

    try:
        paths = resolve_networks(networks_directory, network_path, networks_json)
    except ValueError as error:  # no sources given / bad json -> clean usage error
        raise click.UsageError(str(error)) from error

    def commit_network(staged, path) -> SynthesisNetwork:
        # One constructor for startup AND hot loads (/admin/load): rollout
        # networks serve with the same mesh/dtype/psi/scale as the originals.
        return SynthesisNetwork.from_staged(
            staged, Path(path), output_side_length=output_side_length, **kwargs
        )

    def build_network(path) -> SynthesisNetwork:
        return commit_network(SynthesisNetwork.stage_pkl(Path(path)), path)

    networks = [build_network(p) for p in paths]
    resolved_batch = max_batch if max_batch is not None else default_max_batch()

    if warmup != "none":
        # The batcher dispatches log2 BUCKET shapes, not just max_batch — a
        # single-seed request runs the batch-8 program. "all" compiles every
        # shape either lane can hit so no request ever waits on a cold jit.
        # Params are traced jit arguments, so same-config networks share one
        # compiled program: warm each DISTINCT architecture once.
        sizes = (
            warmup_batch_sizes(resolved_batch)
            if warmup == "all"
            else [resolved_batch]
        )
        distinct = list({n.config: n for n in networks}.values())
        LOGGER.info(
            "Warming %d program(s) (%d distinct architecture(s), batch sizes "
            "%s; first TPU compile can take minutes)...",
            len(sizes) * len(distinct) * (2 if warmup == "all" else 1),
            len(distinct), sizes,
        )
        for network in distinct:
            vector_length = network.expected_vector_length
            style_rows = int(network.config.num_style_rows)
            for size in sizes:
                network.images_from_vectors(
                    np.zeros((size, vector_length), np.float32)
                )
                if warmup == "all":
                    network.images_from_matrices(
                        np.zeros((size, style_rows, vector_length), np.float32)
                    )
        LOGGER.info("Warmup complete.")

    if warmup_audio:
        import base64
        import tempfile

        from gance_tpu.audio.io import fabricate_percussive_wav
        from gance_tpu.serving.audio import plan_audio_request

        try:
            durations = [float(v) for v in warmup_audio.split(",") if v.strip()]
        except ValueError as error:
            raise click.UsageError(
                f"--warmup-audio wants comma-separated seconds: {error}"
            ) from error
        for seconds in durations:
            LOGGER.info(
                "Warming audio feature pipeline for %.3gs clips ...", seconds
            )
            with tempfile.TemporaryDirectory() as tmp:
                clip = fabricate_percussive_wav(
                    Path(tmp) / "warm.wav", seconds=seconds
                ).read_bytes()
            plan_audio_request(
                {"wav_base64": base64.b64encode(clip).decode()},
                networks,
                list(range(len(networks))),
                frame_cap=1 << 20,  # warmup never rejects on length
            )
        LOGGER.info("Audio warmup complete.")

    if multi_host:
        from gance_tpu.serving.multihost import (
            ControlCoordinator,
            MultiHostServingError,
            network_fingerprint,
            run_worker,
            wrap_networks_for_multihost,
        )

        coordinator_host, _, dist_port = dist_coordinator.partition(":")
        if control_port is not None:
            resolved_control_port = control_port
        elif dist_port.isdigit():
            resolved_control_port = int(dist_port) + 1000
        else:
            raise click.UsageError(
                "--control-port is required when --dist-coordinator carries "
                "no port"
            )
        if jax.process_index() != 0:
            # Workers never bind HTTP: they mirror the coordinator's device
            # dispatches so every collective has all its participants.
            try:
                run_worker(
                    networks,
                    coordinator_host or "127.0.0.1",
                    resolved_control_port,
                    jax.process_index(),
                    # Two-phase hot rollout: parse host-side (fallible),
                    # then enter the mesh placement in lockstep with the
                    # coordinator (multihost.py MSG_LOAD_* commentary).
                    load_prepare=lambda p, _i: SynthesisNetwork.stage_pkl(
                        Path(p)
                    ),
                    load_commit=lambda staged, p, _i: commit_network(
                        staged, p
                    ),
                )
            except MultiHostServingError as error:
                raise click.ClickException(str(error)) from error
            return
        coordinator = ControlCoordinator(
            num_workers=jax.process_count() - 1,
            # Listen on the coordinator's own interface, not every interface:
            # this channel speaks authenticated-but-pickled frames and should
            # face the worker fleet only (override for exotic topologies).
            bind_host=(
                control_bind if control_bind is not None
                else (coordinator_host or "127.0.0.1")
            ),
            port=resolved_control_port,
        )
        try:
            coordinator.accept(network_fingerprint(networks))
        except MultiHostServingError as error:
            raise click.ClickException(str(error)) from error
        serving_networks = wrap_networks_for_multihost(networks, coordinator)

        from gance_tpu.serving.multihost import MultiHostNetwork

        def network_loader(path: str, index: int):
            # Coordinator parses FIRST so a bad path fails before any worker
            # is involved; broadcast_load then runs prepare (completion-
            # acked, abortable) + commit (receipt-acked) on every worker, and
            # the from_staged here enters the mesh-placement collective
            # together with them.
            staged = SynthesisNetwork.stage_pkl(Path(path))
            coordinator.broadcast_load(path, index)
            try:
                network = commit_network(staged, path)
            except BaseException as error:
                # The workers committed slot `index` and may be parked inside
                # the placement collective this process just abandoned; the
                # fleets' slot tables have diverged with no recovery protocol.
                # Latch the channel broken (stops serving loudly) rather than
                # leave every future rollout failing with cryptic slot skew.
                coordinator.fail(
                    f"coordinator-side commit of {path} into slot {index} "
                    f"failed after workers committed: {error}"
                )
                raise
            return MultiHostNetwork(network, coordinator, index)

        def network_unloader(index: int) -> None:
            coordinator.broadcast_unload(index)

    else:
        coordinator = None
        serving_networks = networks
        network_unloader = None

        class _TwoPhaseLoader:
            # The daemon runs `prepare` (the slow host-side pickle parse)
            # OUTSIDE the batcher's device-op lock, so single-host serving
            # keeps dispatching through most of a hot rollout; only `commit`
            # (the device placement) pauses dispatches.
            @staticmethod
            def prepare(path: str, _index: int):
                return SynthesisNetwork.stage_pkl(Path(path))

            @staticmethod
            def commit(staged, path: str, _index: int) -> SynthesisNetwork:
                return commit_network(staged, path)

            def __call__(self, path: str, _index: int) -> SynthesisNetwork:
                return build_network(path)

        network_loader = _TwoPhaseLoader()

    with SynthesisDaemon(
        serving_networks, host=host, port=port,
        max_batch=resolved_batch, max_delay_ms=max_delay_ms,
        network_loader=network_loader, network_unloader=network_unloader,
    ) as daemon:
        click.echo(
            f"serving {', '.join(str(p) for p in paths)} on "
            f"http://{host}:{daemon.port} "
            f"(max_batch={resolved_batch}, linger={max_delay_ms}ms)"
        )
        import signal
        import threading

        stop_requested = threading.Event()

        def _on_sigterm(_signum, _frame) -> None:
            LOGGER.info("SIGTERM: draining the synthesis daemon")
            stop_requested.set()

        previous_handler = signal.signal(signal.SIGTERM, _on_sigterm)
        try:
            # Serve until SIGTERM/SIGINT — or, multi-host, until the control
            # channel breaks (a lost worker means no collective can complete,
            # so keeping the port open would only accumulate hung requests).
            while not stop_requested.wait(0.5):
                if coordinator is not None and coordinator.failed.is_set():
                    break
        except KeyboardInterrupt:
            LOGGER.info("shutting down synthesis daemon")
            stop_requested.set()
        finally:
            signal.signal(signal.SIGTERM, previous_handler)
        if stop_requested.is_set():
            # Graceful: finish in-flight requests (new ones get 503) before
            # the context manager tears the batcher down.
            daemon.drain()
    if coordinator is not None:
        if coordinator.failed.is_set():
            coordinator.close()
            raise click.ClickException(
                "multi-host serving control channel failed; daemon stopped"
            )
        coordinator.shutdown()


if __name__ == "__main__":
    cli()
