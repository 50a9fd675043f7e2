"""
Training-step throughput on the real TPU: fp32 vs bf16 mixed precision.

Runs the full sharded train step (D step with lazy R1, G step, EMA) on a
single chip at a mid-size config and reports steps/sec for both compute
dtypes. Tunnel-safe timing: steps chain through the donated state; one
final metric fetch forces execution.

Usage: python tools/bench_train.py [resolution] [batch] [steps]
"""

import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")
import gance_tpu  # noqa: F401
import jax
import jax.numpy as jnp
import numpy as np


def main(resolution: int, batch: int, steps: int) -> None:
    from gance_tpu.models.stylegan2 import GeneratorConfig
    from gance_tpu.parallel.training import (
        TrainingConfig,
        init_training_state,
        make_train_step,
    )

    model_config = GeneratorConfig(resolution=resolution)
    reals = jax.device_put(
        (np.random.RandomState(0).rand(batch, resolution, resolution, 3) * 2 - 1
         ).astype(np.float32)
    )

    import os

    only = os.environ.get("BENCH_TRAIN_ONLY", "")  # e.g. "bfloat16+remat"
    for dtype, remat in (
        ("float32", False),
        ("float32", True),
        ("bfloat16", False),
        ("bfloat16", True),
    ):
        label = f"{dtype}{'+remat' if remat else ''}"
        if only and label != only:
            continue
        cfg = dataclasses.replace(
            TrainingConfig(), compute_dtype=dtype, remat=remat
        )
        with jax.default_device(jax.devices("cpu")[0]):
            state = init_training_state(jax.random.PRNGKey(0), model_config, cfg)
        state = jax.device_put(state, jax.devices()[0])
        step = make_train_step(model_config, cfg)

        try:
            t0 = time.time()
            state, metrics = step(state, reals, jax.random.PRNGKey(1))
            _ = float(metrics["d_loss"])
            print(f"{label}: compile+first {time.time() - t0:.1f}s",
                  file=sys.stderr, flush=True)

            t0 = time.time()
            for i in range(steps):
                state, metrics = step(state, reals, jax.random.PRNGKey(2 + i))
            d_loss = float(metrics["d_loss"])  # forces the chain
            dt = (time.time() - t0) / steps
            print(
                f"{label}: {dt * 1e3:.0f} ms/step ({batch / dt:.1f} imgs/sec) "
                f"at {resolution}px batch {batch}; d_loss={d_loss:.3f}",
                flush=True,
            )
            # --- scanned loop: the same steps as ONE device-side dispatch ---
            if os.environ.get("BENCH_TRAIN_SCAN", "1") == "1":
                from gance_tpu.parallel.training import make_train_scan

                scan = make_train_scan(model_config, cfg)
                reals_block = jnp.broadcast_to(
                    reals, (steps,) + reals.shape
                )
                keys = jnp.stack(
                    [jax.random.PRNGKey(2 + i) for i in range(steps)]
                )
                t0 = time.time()
                state, stacked = scan(state, reals_block, keys)
                _ = float(np.asarray(stacked["d_loss"])[-1])
                print(f"{label} scan: compile+first {time.time() - t0:.1f}s",
                      file=sys.stderr, flush=True)
                t0 = time.time()
                state, stacked = scan(state, reals_block, keys)
                _ = float(np.asarray(stacked["d_loss"])[-1])
                dt = (time.time() - t0) / steps
                print(
                    f"{label} scan({steps}): {dt * 1e3:.0f} ms/step "
                    f"({batch / dt:.1f} imgs/sec)",
                    flush=True,
                )
        except Exception as exc:  # OOM etc: report and continue the sweep
            msg = str(exc).splitlines()[0][:140]
            print(f"{label}: FAILED ({msg})", flush=True)
        finally:
            del state, step


if __name__ == "__main__":
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    main(res, batch, steps)
