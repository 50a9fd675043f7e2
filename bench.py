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

The payload runs in a CHILD process behind a stall guard: the tunneled remote
compile intermittently hangs forever (zero link traffic, no response — the
failure class tools/tpu_retry.sh exists for), and a killed-and-retried process
virtually always compiles fine. The guard watches child output + network
counters and kills/retries on a dead stall, so a single hang can't cost the
round its benchmark number. BENCH_NO_GUARD=1 runs the payload inline.
"""

import json
import os
import subprocess
import sys
import tempfile
import time


def main() -> None:
    if os.environ.get("BENCH_TEST_HANG") == "1":
        # Test hook: simulate the remote-compile dead hang for the stall guard.
        time.sleep(600)
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

    # Batch 48 is the r4 sweet spot (fused uint8 epilogue): 24 -> 209.5,
    # 32 -> 215.9, 48 -> 221.3, 56 -> 219.7 f/s; 64+ fails remote compile
    # (persistent tpu_compile_helper exit 1 across 6 retries). The old
    # b24 ceiling was the pre-fusion epilogue's HBM working set; with only
    # uint8 bytes interleaved, larger batches amortize the fixed per-dispatch
    # costs instead. Keep batch a multiple of 8: these layouts put batch on
    # the 8-wide sublane axis (T(8,128) tiles), so off-multiples pad up —
    # b28 computes as 32 (+14%/frame, measured via xplane diff, r3).
    batch = int(os.environ.get("BENCH_BATCH", "48"))
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

    # BENCH_EPILOGUE=fused runs the serving path's phase-domain uint8 epilogue
    # (uint8_output=True; bit-identical on CPU by construction + tests, and
    # within TPU fusion-boundary rounding — mean 0.078 uint8 steps, max 5 —
    # of "fine", which interleaves in bf16 and quantizes after (the pre-r4
    # program)).
    fused_epilogue = os.environ.get("BENCH_EPILOGUE", "fused") == "fused"

    @jax.jit
    def forward_acc(p, z, acc):
        if fused_epilogue:
            images = generator_apply(
                p, z, config, truncation_psi=1.2, compute_dtype=compute_dtype,
                uint8_output=True,
            )
        else:
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
                # Self-describing: if the tunnel is down and JAX fell back to
                # CPU, the number must not read as a TPU result.
                "device": device.platform,
            }
        )
    )


def _rx_bytes() -> int:
    """Total received bytes on the tunnel-facing interface (-1 if unreadable)."""
    try:
        with open("/proc/net/dev") as f:
            for line in f:
                if "eth0" in line:
                    return int(line.split()[1])
    except (OSError, ValueError, IndexError):
        pass
    return -1


def _run_guarded() -> int:
    """
    Run main() in a child process, killing and retrying on a dead stall
    (no new output AND no link traffic for BENCH_STALL_SECS). 420s default
    clears the longest healthy silent gap observed (a ~6 min cold compile
    emits the device line first, then goes quiet for <420s).
    """
    stall_secs = int(os.environ.get("BENCH_STALL_SECS", "420"))
    attempts = int(os.environ.get("BENCH_ATTEMPTS", "3"))
    # Tests set this to detect the stall from output alone (shared hosts have
    # unrelated link traffic); production keeps the AND with the rx counter so
    # a healthy-but-quiet long compile is never killed.
    output_only = os.environ.get("BENCH_STALL_OUTPUT_ONLY") == "1"
    env = dict(os.environ, BENCH_NO_GUARD="1")
    # Final safety net: if every TPU attempt dies (tunnel hard-down — observed
    # multi-hour outages), run once pinned to CPU with a tiny shape so the
    # round still records a self-describing result ("device": "cpu") instead
    # of nothing. A labeled wrong-hardware number beats an absent file.
    # BENCH_NO_FALLBACK=1 restores fail-with-no-output.
    fallback_attempts = 0 if os.environ.get("BENCH_NO_FALLBACK") == "1" else 1
    # Tiny shapes are forced (incl. resolution): the fallback is a labeled
    # liveness record, not the real metric — a full 1024px config-f compile+run
    # on this 1-core host could block the round for hours, unwatched.
    fallback_env = dict(
        env,
        JAX_PLATFORMS="cpu",
        BENCH_BATCH=os.environ.get("BENCH_FALLBACK_BATCH", "2"),
        BENCH_ITERS=os.environ.get("BENCH_FALLBACK_ITERS", "2"),
        BENCH_RESOLUTION=os.environ.get("BENCH_FALLBACK_RESOLUTION", "64"),
    )
    # The hang-simulation hook models a TPU-init stall; the CPU pin avoids
    # that path, so the hook must not re-hang the fallback child.
    fallback_env.pop("BENCH_TEST_HANG", None)
    for attempt in range(1, attempts + 1 + fallback_attempts):
        cpu_fallback = attempt == attempts + 1
        if cpu_fallback:
            print(
                "bench: all TPU attempts failed — one CPU-pinned fallback run "
                "so the round records a (labeled) result",
                file=sys.stderr,
            )
        with tempfile.NamedTemporaryFile(
            mode="w+", suffix=".log", prefix="bench_", delete=False
        ) as log:
            child = subprocess.Popen(
                [sys.executable, os.path.abspath(__file__)],
                stdout=log, stderr=subprocess.STDOUT,
                env=fallback_env if cpu_fallback else env,
            )
            # The stall watchdog exists for the REMOTE-compile dead hang; the
            # CPU-pinned fallback can't hit it, and a quiet single-core compile
            # can legitimately outlast any stall window — run it unwatched.
            if cpu_fallback:
                child.wait()
            last_size, stall = 0, 0.0
            poll_s = float(os.environ.get("BENCH_STALL_POLL_SECS", "15"))
            while child.poll() is None:
                rx0 = _rx_bytes()
                time.sleep(poll_s)
                size = os.path.getsize(log.name)
                if size == last_size and (output_only or _rx_bytes() == rx0):
                    stall += poll_s
                else:
                    stall = 0.0
                last_size = size
                if stall >= stall_secs:
                    print(
                        f"bench attempt {attempt}: dead stall {stall:.0f}s "
                        "(no output, no link traffic) — killing and retrying",
                        file=sys.stderr,
                    )
                    child.kill()
                    child.wait()
                    break
            log.seek(0)
            lines = log.read().splitlines()
        if child.returncode == 0:
            # Child stdout+stderr are merged; re-split: the JSON result line
            # goes to stdout (the driver's contract), the rest to stderr.
            result = next(
                (l for l in reversed(lines) if l.startswith('{"metric"')), None
            )
            for line in lines:
                if line != result:
                    print(line, file=sys.stderr)
            if result is not None:
                print(result)
                return 0
            print("bench child exited 0 without a result line", file=sys.stderr)
        else:
            for line in lines[-20:]:
                print(line, file=sys.stderr)
            print(
                f"bench attempt {attempt} failed (rc={child.returncode})",
                file=sys.stderr,
            )
    return 1


if __name__ == "__main__":
    if os.environ.get("BENCH_NO_GUARD") == "1":
        main()
    else:
        sys.exit(_run_guarded())
