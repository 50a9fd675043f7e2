"""
Hardware validation + timing of the fused phase Conv1+ToRGB Pallas kernel
against the composed XLA ops it would replace (conv fusion writes 3.2GB, the
ToRGB matmul reads it back; profiled 17.7 + 6.4 ms per batch-of-24).

Usage: python tools/bench_phase_fused.py [batch] [iters]
"""

import sys
import time

sys.path.insert(0, "/root/repo")
import gance_tpu  # noqa: F401
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def main(batch: int, iters: int) -> None:
    from gance_tpu.ops.pallas.phase_fused import phase_conv1_torgb_fused

    rng = np.random.RandomState(0)
    c = 256
    dev = jax.devices()[0]
    x = jax.device_put(jnp.asarray(rng.randn(batch, 512, 512, c) * 0.5, jnp.bfloat16), dev)
    w4 = jax.device_put(jnp.asarray(rng.randn(2, 2, c, c) * 0.05, jnp.float32), dev)
    wrgb = jnp.asarray(rng.randn(batch, c, 16) * 0.1, jnp.float32)
    wrgb = jax.device_put(wrgb.at[:, :, 12:].set(0.0), dev)
    demod = jax.device_put(jnp.asarray(rng.rand(batch, c) + 0.5, jnp.float32), dev)
    nb = jax.device_put(jnp.asarray(rng.randn(1, 513, 513, c) * 0.1, jnp.bfloat16), dev)

    def xla_ref(x, w4, wrgb, demod, nb, acc):
        z = lax.conv_general_dilated(
            x, w4.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=x.dtype,
        )
        z = z.astype(jnp.float32) * demod[:, None, None, :] + nb.astype(jnp.float32)
        z = jnp.maximum(z, z * 0.2).astype(x.dtype)
        rgb = jnp.einsum("bmnc,bck->bmnk", z, wrgb.astype(x.dtype))
        return acc + jnp.sum(rgb.astype(jnp.float32))

    def fused(x, w4, wrgb, demod, nb, acc):
        rgb = phase_conv1_torgb_fused(x, w4, wrgb, demod, nb)
        return acc + jnp.sum(rgb.astype(jnp.float32))

    # --- parity on hardware (full batch: reuses the single kernel shape the
    # timing section needs — each Pallas shape costs a very long remote
    # Mosaic compile on this tunnel) ---
    bp = batch
    xp, wrgbp, demodp = x[:bp], wrgb[:bp], demod[:bp]

    @jax.jit
    def ref_small(x, w4, wrgb, demod, nb):
        z = lax.conv_general_dilated(
            x, w4.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=x.dtype,
        )
        z = z.astype(jnp.float32) * demod[:, None, None, :] + nb.astype(jnp.float32)
        z = jnp.maximum(z, z * 0.2).astype(x.dtype)
        return jnp.einsum("bmnc,bck->bmnk", z, wrgb.astype(x.dtype))

    rgb_f = np.asarray(
        phase_conv1_torgb_fused(xp, w4, wrgbp, demodp, nb)
    ).astype(np.float32)
    rgb_r = np.asarray(ref_small(xp, w4, wrgbp, demodp, nb)).astype(np.float32)
    scale = max(1e-6, float(np.abs(rgb_r).max()))
    rel = float(np.abs(rgb_f - rgb_r).max()) / scale
    print(f"hardware parity: max rel diff {rel:.2e} (scale {scale:.1f})", flush=True)

    for name, fn in (("xla", xla_ref), ("fused", fused)):
        f = jax.jit(fn)
        acc = jax.device_put(jnp.zeros((), jnp.float32), dev)
        t0 = time.time()
        acc = f(x, w4, wrgb, demod, nb, acc)
        acc.block_until_ready()
        print(f"{name}: compile+first {time.time() - t0:.1f}s", file=sys.stderr, flush=True)
        t0 = time.time()
        for _ in range(iters):
            acc = f(x, w4, wrgb, demod, nb, acc)
        _ = float(acc)
        dt = (time.time() - t0) / iters
        print(f"{name}: {dt * 1e3:.2f} ms (batch {batch})", flush=True)


if __name__ == "__main__":
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    main(batch, iters)
