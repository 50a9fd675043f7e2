"""
Feasibility probe: int8 conv throughput on this TPU vs bf16, on the shapes
that dominate post-phase-rewrite synthesis (see tools/profile_model.py):

  P conv   (3,3,128,256) @ (24,512,512,128)
  C1 conv  (2,2,256,256) @ (24,512,512,256)
  conv1@512 (3,3,128,128) @ (24,512,512,128)

If int8 sustains ~2x bf16 (v5e MXU: 394 TOPS int8 vs 197 TFLOPS bf16), a
calibrated int8 serving mode is worth building; if XLA doesn't lower these to
the int8 MXU path, this records the dead end.

Usage: python tools/bench_int8.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")
import gance_tpu  # noqa: F401
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _time(fn, args, iters=20, label=""):
    compiled = jax.jit(fn)
    acc = jnp.zeros((), jnp.float32)
    t0 = time.time()
    acc = compiled(*args, acc)
    acc.block_until_ready()
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        acc = compiled(*args, acc)
    _ = float(acc)
    dt = (time.time() - t0) / iters
    print(f"{label:58s} {dt * 1e3:8.3f} ms (compile {compile_s:.1f}s)")
    return dt


def bench_shape(b, h, kh, cin, cout):
    rng = np.random.RandomState(0)
    x8 = jax.device_put(
        jnp.asarray(rng.randint(-127, 128, (b, h, h, cin)), jnp.int8)
    )
    w8 = jax.device_put(
        jnp.asarray(rng.randint(-127, 128, (kh, kh, cin, cout)), jnp.int8)
    )
    xb = jax.device_put(jnp.asarray(rng.randn(b, h, h, cin), jnp.bfloat16))
    wb = jax.device_put(jnp.asarray(rng.randn(kh, kh, cin, cout), jnp.bfloat16))

    def conv_i8(x, w, acc):
        out = lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        # dequant epilogue as production would have it
        deq = out.astype(jnp.float32) * 1.23e-4
        return acc + jnp.sum(deq)

    def conv_bf16(x, w, acc):
        out = lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16,
        )
        return acc + jnp.sum(out).astype(jnp.float32)

    flops = 2 * b * h * h * kh * kh * cin * cout
    label = f"({b},{h},{h},{cin}) * ({kh},{kh},{cin},{cout})"
    t8 = _time(conv_i8, (x8, w8), label=f"int8  {label}")
    tb = _time(conv_bf16, (xb, wb), label=f"bf16  {label}")
    print(
        f"    int8 {flops / t8 / 1e12:6.1f} Tops | bf16 {flops / tb / 1e12:6.1f} "
        f"TFLOPS | int8 speedup {tb / t8:.2f}x"
    )


if __name__ == "__main__":
    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    bench_shape(24, 512, 3, 128, 256)   # P conv
    bench_shape(24, 512, 2, 256, 256)   # C1 conv
    bench_shape(24, 512, 3, 128, 128)   # conv1@512
