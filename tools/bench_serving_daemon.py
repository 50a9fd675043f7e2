"""
Bench the online serving daemon END-TO-END: concurrent HTTP clients against
`gance_tpu.serving.SynthesisDaemon`, dynamic batching onto the device,
sustained frames/sec + request latency percentiles + batch occupancy.

This measures the full production serving stack — HTTP parse, request
validation, DynamicBatcher coalescing/bucketing, device dispatch, device->host
fetch, npy encode — not the bare jitted program (bench.py measures that:
221.3 f/s at 1024px bf16 batch 48 on the v5e). On THIS dev host the wall
number at 1024px is a tunnel artifact (~22 MB/s device->host link = ~7 f/s of
uint8 1024px frames no matter the server); the occupancy + latency shape and
the smaller-resolution rates are what transfer to a real TPU VM.

Usage (CPU smoke):            JAX_PLATFORMS=cpu python tools/bench_serving_daemon.py \
                                  --resolution 64 --seconds 5
Real chip (wrap in retry):    bash tools/tpu_retry.sh /tmp/serve_bench.log \
                                  python tools/bench_serving_daemon.py --seconds 30

Prints ONE JSON line.
"""

import argparse
import json
import sys
import threading
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--resolution", type=int, default=1024)
    parser.add_argument("--clients", type=int, default=6, help="concurrent client threads")
    parser.add_argument(
        "--request-frames", type=int, default=8, help="frames per /synthesize request"
    )
    parser.add_argument("--seconds", type=float, default=30.0, help="timed window")
    parser.add_argument("--max-batch", type=int, default=None)
    parser.add_argument(
        "--max-delay-ms", type=float, default=5.0, help="batcher coalescing linger"
    )
    parser.add_argument(
        "--networks", type=int, default=1,
        help="number of RESIDENT networks (distinct param sets, same config); "
        "clients round-robin requests across them — certifies that online "
        "network switching costs nothing (same-config networks share one "
        "compiled program, so N networks add zero compiles)",
    )
    parser.add_argument(
        "--output-side", type=int, default=None,
        help="scale frames to this side ON DEVICE before egress (the serving "
        "CLI's --output-side-length): shrinks the device->host transfer, which "
        "is the binding ceiling on tunneled dev hosts",
    )
    parser.add_argument(
        "--warm", default="all", choices=["all", "max"],
        help="'all' warms every bucket the batcher can dispatch; 'max' only "
        "the full batch (enough when --request-frames == max batch: every "
        "dispatch lands on the max bucket, and cold compiles over the tunnel "
        "cost minutes each)",
    )
    parser.add_argument(
        "--compute-dtype", default="bfloat16", choices=["bfloat16", "float32"],
        help="bfloat16 = the production serving path (fp32 at 1024px OOMs HBM "
        "from batch 32 up — measured, same ceiling as fp32-HIGHEST b16)",
    )
    parser.add_argument(
        "--audio", action="store_true",
        help="bench POST /synthesize_audio instead of /synthesize: each "
        "client repeatedly posts a fabricated WAV clip; the server runs the "
        "full music->latents transform (time stretch, spectrogram/noise "
        "blend, RMS index routing) per request before the device work — the "
        "reference's flagship use-case measured ONLINE",
    )
    parser.add_argument(
        "--audio-clip-seconds", type=float, default=2.0,
        help="length of the fabricated WAV each audio request carries",
    )
    parser.add_argument(
        "--audio-fps", type=float, default=30.0,
        help="frames per second the audio request asks for",
    )
    parser.add_argument(
        "--fmap-base", type=int, default=None,
        help="override the generator's fmap_base (default = config-f 32768; "
        "CPU smokes need a small value — config-f channel widths make even a "
        "64px forward take tens of seconds on one CPU core)",
    )
    parser.add_argument("--fmap-max", type=int, default=None)
    parser.add_argument(
        "--settle-seconds", type=float, default=None,
        help="untimed warm pass before the measured window (default "
        "min(5, seconds/2)); the audio arm's FIRST request absorbs one-time "
        "per-clip-shape DSP compiles, so give it a settle longer than that",
    )
    args = parser.parse_args()

    import gance_tpu  # noqa: F401  (platform/compile-cache plumbing)
    import jax
    import numpy as np

    from gance_tpu.models.stylegan2 import GeneratorConfig, init_generator_params
    from gance_tpu.serving import SynthesisDaemon, default_max_batch
    from gance_tpu.serving.batcher import warmup_batch_sizes
    from gance_tpu.synthesis.runtime import SynthesisNetwork

    max_batch = args.max_batch if args.max_batch is not None else default_max_batch()

    import jax.numpy as jnp

    config_kwargs = {}
    if args.fmap_base is not None:
        config_kwargs["fmap_base"] = args.fmap_base
    if args.fmap_max is not None:
        config_kwargs["fmap_max"] = args.fmap_max
    config = GeneratorConfig(resolution=args.resolution, **config_kwargs)
    networks = []
    for n in range(args.networks):
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            params = init_generator_params(jax.random.PRNGKey(n), config)
        # SynthesisNetwork.__post_init__ device_puts params resident, exactly
        # like the serving CLI path (no bench-only placement anymore)
        networks.append(
            SynthesisNetwork(
                params=params,
                config=config,
                output_side_length=args.output_side,
                compute_dtype={"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
                    args.compute_dtype
                ],
            )
        )
    network = networks[0]

    # Warm every z-lane bucket the batcher can dispatch so the timed window
    # never absorbs an XLA compile (minutes over the tunnel).
    sizes = warmup_batch_sizes(max_batch) if args.warm == "all" else [max_batch]
    for size in sizes:
        print(f"warming z program batch={size} ...", file=sys.stderr, flush=True)
        network.images_from_vectors(np.zeros((size, 512), np.float32))

    stop = threading.Event()
    lock = threading.Lock()
    frames_done = [0]
    requests_done = [0]
    errors = [0]

    wav_bytes = None
    if args.audio:
        import tempfile
        from pathlib import Path

        from gance_tpu.audio.io import fabricate_percussive_wav

        with tempfile.TemporaryDirectory() as tmp:
            wav_bytes = fabricate_percussive_wav(
                Path(tmp) / "clip.wav", seconds=args.audio_clip_seconds
            ).read_bytes()

    def client(base_url: str, seed0: int) -> None:
        from gance_tpu.serving import ServingClient

        serving_client = ServingClient(base_url)
        i = 0
        while not stop.is_set():
            try:
                if args.audio:
                    images = serving_client.synthesize_audio(
                        wav_bytes, fps=args.audio_fps
                    )
                else:
                    images = serving_client.synthesize(
                        count=args.request_frames,
                        seed=seed0 * 100003 + i,
                        network=(
                            (seed0 + i) % args.networks if args.networks > 1 else None
                        ),
                    )
                assert images.shape[1] == (args.output_side or args.resolution)
                with lock:
                    frames_done[0] += images.shape[0]
                    requests_done[0] += 1
            except Exception:  # pylint: disable=broad-except
                if not stop.is_set():
                    with lock:
                        errors[0] += 1
            i += 1

    with SynthesisDaemon(
        networks,
        host="127.0.0.1",
        port=0,
        max_batch=max_batch,
        max_delay_ms=args.max_delay_ms,
    ) as daemon:
        base_url = f"http://127.0.0.1:{daemon.port}"
        threads = [
            threading.Thread(target=client, args=(base_url, k), daemon=True)
            for k in range(args.clients)
        ]
        # settle pass: first requests per client (connection setup, any stray
        # shape warms) stay out of the timed window
        for t in threads:
            t.start()
        time.sleep(
            args.settle_seconds
            if args.settle_seconds is not None
            else min(5.0, args.seconds / 2.0)
        )
        with lock:
            frames_done[0] = requests_done[0] = errors[0] = 0
        stats_before = daemon.batcher.stats()
        start = time.monotonic()
        time.sleep(args.seconds)
        with lock:
            frames = frames_done[0]
            requests = requests_done[0]
            errs = errors[0]
        elapsed = time.monotonic() - start
        stats_after = daemon.batcher.stats()
        stop.set()
        # daemon context exit closes the batcher, failing in-flight futures;
        # clients see errors after stop is set and ignore them

    batches = stats_after["batches"] - stats_before["batches"]
    dispatched = stats_after["dispatched_rows"] - stats_before["dispatched_rows"]
    window_frames = stats_after["frames"] - stats_before["frames"]
    print(
        json.dumps(
            {
                "metric": f"{args.resolution}px serving daemon sustained frames/sec "
                + (
                    f"(AUDIO: {args.clients} clients x "
                    f"{args.audio_clip_seconds:g}s clip @ {args.audio_fps:g} fps"
                    if args.audio
                    else f"({args.clients} clients x {args.request_frames} frames/req"
                )
                + (f", {args.networks} resident networks" if args.networks > 1 else "")
                + (f", output side {args.output_side}" if args.output_side else "")
                + ")",
                "value": round(frames / elapsed, 2),
                "unit": "frames/sec",
                "requests_per_sec": round(requests / elapsed, 2),
                "client_errors": errs,
                "mean_dispatch_batch": round(window_frames / batches, 1) if batches else None,
                "bucket_occupancy": round(window_frames / dispatched, 3) if dispatched else None,
                "latency_p50_ms": stats_after.get("latency_p50_ms"),
                "latency_p99_ms": stats_after.get("latency_p99_ms"),
                "max_batch": max_batch,
                "linger_ms": args.max_delay_ms,
                "frames_by_network": stats_after.get("frames_by_network"),
            }
        )
    )


if __name__ == "__main__":
    main()
