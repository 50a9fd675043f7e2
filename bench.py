"""
Benchmark: sustained 1024x1024 StyleGAN2 synthesis throughput per chip.

Protocol (validated against tunnel artifacts — see .claude/skills/verify/SKILL.md):
  * full config-f generator, z batch -> uint8 frames, bf16 compute with fp32
    accumulation (style/demod math stays fp32);
  * every batch's output feeds a device-side running checksum, and ONE scalar
    fetch at the end forces all executions — per-batch host syncs measure tunnel
    RPC latency (~0.7s) rather than the chip, and free-running dispatch without a
    data dependency can be reordered past the timer;
  * params initialized on CPU (eager randoms over a tunneled TPU are slow) and
    device_put once, like the production runtime.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/sec", "vs_baseline": N/60}
vs_baseline is against the 60 fps/chip north-star target (BASELINE.md; the
reference publishes no formal numbers).
"""

import json
import os
import sys
import time


def main() -> None:
    import gance_tpu  # noqa: F401  (platform/compile-cache plumbing)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gance_tpu.models.stylegan2 import (
        GeneratorConfig,
        generator_apply,
        images_to_uint8,
        init_generator_params,
    )

    # 24 is the sweet spot. The "cliff" past it is sublane padding: these
    # layouts put batch on the 8-wide sublane axis (T(8,128) tiles), so any
    # batch not a multiple of 8 pads to the next one — b28 computes as 32
    # (+14% per frame, matching the measured 13% via xplane diff, r3); b32
    # is pad-free but exceeds the VMEM-friendly working set. Use multiples
    # of 8.
    batch = int(os.environ.get("BENCH_BATCH", "24"))
    iters = int(os.environ.get("BENCH_ITERS", "12"))
    resolution = int(os.environ.get("BENCH_RESOLUTION", "1024"))
    # BENCH_DTYPE=float32 measures the exact path; combine with
    # GANCE_TPU_PRECISION=high for the bf16x3 fp32-emulation experiment.
    dtype_name = os.environ.get("BENCH_DTYPE", "bfloat16")
    compute_dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[dtype_name]

    config = GeneratorConfig(resolution=resolution)

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = init_generator_params(jax.random.PRNGKey(0), config)
    device = jax.devices()[0]
    print(f"bench device: {device}", file=sys.stderr)
    params = jax.device_put(params, device)

    @jax.jit
    def forward_acc(p, z, acc):
        images = images_to_uint8(
            generator_apply(
                p, z, config, truncation_psi=1.2, compute_dtype=compute_dtype
            )
        )
        return acc + jnp.sum(images.astype(jnp.uint32))

    zs = [
        jax.device_put(
            np.random.RandomState(i).randn(batch, config.latent_size).astype(np.float32),
            device,
        )
        for i in range(iters)
    ]

    # warmup: compile + drain
    acc = jax.device_put(jnp.zeros((), jnp.uint32), device)
    t0 = time.time()
    acc = forward_acc(params, zs[0], acc)
    _ = int(acc)
    print(f"compile+first batch: {time.time() - t0:.1f}s", file=sys.stderr)

    t0 = time.time()
    for z in zs:
        acc = forward_acc(params, z, acc)
    checksum = int(acc)  # single fetch forces all executions
    elapsed = time.time() - t0

    frames_per_sec = iters * batch / elapsed
    print(
        f"checksum={checksum} elapsed={elapsed:.2f}s "
        f"({elapsed / iters * 1000:.0f} ms/batch of {batch})",
        file=sys.stderr,
    )
    dtype_note = (
        "bf16 compute, fp32 accum"
        if dtype_name == "bfloat16"
        else f"{dtype_name} compute, {os.environ.get('GANCE_TPU_PRECISION', 'highest')} precision"
    )
    print(
        json.dumps(
            {
                "metric": f"{resolution}x{resolution} StyleGAN2 synthesis frames/sec/chip ({dtype_note})",
                "value": round(frames_per_sec, 2),
                "unit": "frames/sec",
                "vs_baseline": round(frames_per_sec / 60.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
