"""
Worst-case network-switching throughput of `MultiNetwork.synthesize_stream`
(VERDICT r2 item 8: the windowed order-restored gather had no measured number).

Two resident config-f generators serve a frame stream whose network index
alternates every K frames (K = the "alternation factor"). Within each
batch-size window, frames group by index and each group pads to the next
power-of-two bucket — so the interesting regimes at batch 24 are:

  * K >= 24 : whole windows hit one network (the no-switching baseline);
  * K = 8   : window splits 16/8 -> buckets 16+8 = 24 (zero pad waste);
  * K in {1, 2, 4} : window splits 12/12 -> buckets 16+16 = 32 (1.33x FLOPs,
    the documented worst case of the pow-2 bucket scheme).

Frames leave the device at a small output_side_length (resize fused on-device)
so the tunnel's ~22 MB/s host link measures nothing — the number is synthesis
compute + grouping overhead, which is what serving on a real host would see.

Prints one JSON line with f/s per alternation factor.
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    import gance_tpu  # noqa: F401
    import jax
    import numpy as np

    from gance_tpu.models.stylegan2 import GeneratorConfig, init_generator_params
    from gance_tpu.synthesis.runtime import MultiNetwork, SynthesisNetwork

    resolution = int(os.environ.get("BENCH_RESOLUTION", "1024"))
    batch = int(os.environ.get("BENCH_BATCH", "24"))
    frames = int(os.environ.get("BENCH_FRAMES", str(batch * 8)))
    out_side = int(os.environ.get("BENCH_OUT_SIDE", "64"))
    factors = [int(f) for f in os.environ.get("BENCH_FACTORS", "24,8,4,2,1").split(",")]

    config = GeneratorConfig(resolution=resolution)
    cpu = jax.devices("cpu")[0]
    networks = []
    for i in range(2):
        with jax.default_device(cpu):
            params = init_generator_params(jax.random.PRNGKey(i), config)
        params = jax.device_put(params, jax.devices()[0])
        networks.append(
            SynthesisNetwork(
                params=params,
                config=config,
                compute_dtype="bfloat16",
                output_side_length=out_side,
            )
        )
    multi = MultiNetwork.from_networks(networks)

    z = np.random.RandomState(0).randn(frames, config.latent_size).astype(np.float32)

    lookaheads = [
        int(v) for v in os.environ.get("BENCH_LOOKAHEADS", "1,2").split(",")
    ]
    results = {}
    for lookahead in lookaheads:
        for factor in factors:
            indices = (np.arange(frames) // factor) % 2
            # warmup: compile every bucket shape this pattern produces
            for image in multi.synthesize_stream(
                z[: batch * 2 * lookahead], indices[: batch * 2 * lookahead],
                batch, lookahead,
            ):
                pass
            t0 = time.time()
            count = 0
            for image in multi.synthesize_stream(z, indices, batch, lookahead):
                count += 1
            elapsed = time.time() - t0
            fps = count / elapsed
            results[f"lookahead_{lookahead}_alternation_{factor}"] = round(fps, 2)
            print(
                f"lookahead {lookahead} factor {factor:2d}: {fps:7.2f} f/s "
                f"({count} frames in {elapsed:.2f}s)",
                file=sys.stderr,
                flush=True,
            )

    # Network-parallel arm (BENCH_NETWORK_PARALLEL=1): both networks resident on
    # their own device group of a ('network','data') mesh, one SPMD program per
    # window. Needs >= 2 devices; on this 1-chip tunnel it reports skipped —
    # the arm exists so multi-chip hardware has a ready probe.
    network_parallel_results = {}
    if os.environ.get("BENCH_NETWORK_PARALLEL") == "1":
        if len(jax.devices()) < 2:
            network_parallel_results["status"] = "skipped (1 device)"
            print("network-parallel arm skipped: 1 device", file=sys.stderr)
        else:
            import jax.numpy as jnp

            from gance_tpu.parallel.network_parallel import NetworkParallelSynthesis

            np_serving = NetworkParallelSynthesis(
                [n.params for n in networks], config,
                compute_dtype=jnp.bfloat16, output_side_length=out_side,
            )
            for factor in factors:
                indices = (np.arange(frames) // factor) % 2
                _ = np_serving.synthesize(
                    z[: batch * 2], indices[: batch * 2], batch_size=batch
                )  # warmup
                t0 = time.time()
                out = np_serving.synthesize(z, indices, batch_size=batch)
                elapsed = time.time() - t0
                fps = len(out) / elapsed
                network_parallel_results[f"alternation_{factor}"] = round(fps, 2)
                print(
                    f"network-parallel factor {factor:2d}: {fps:7.2f} f/s",
                    file=sys.stderr, flush=True,
                )

    # worst_over_baseline covers ONLY the windowed-stream arms: the
    # network-parallel arm runs on a different device count, so mixing it in
    # would turn the switching-overhead ratio into a hardware-config ratio.
    baseline = max(results.values())
    payload = {
        "metric": f"{resolution}px synthesize_stream f/s vs network alternation (bf16, batch {batch}, 2 nets)",
        "unit": "frames/sec",
        "results": results,
        "worst_over_baseline": round(min(results.values()) / baseline, 3),
    }
    if network_parallel_results:
        payload["network_parallel"] = network_parallel_results
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
