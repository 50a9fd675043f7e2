"""
Op-level microbenchmarks on the real TPU (tunnel-safe protocol: device-side
checksum chaining, one scalar fetch at the end — see bench.py / memory notes).

Usage: python tools/bench_ops.py [blur|model|conv1]
"""

import sys
import time

sys.path.insert(0, "/root/repo")  # run from anywhere without touching PYTHONPATH
import gance_tpu  # noqa: F401  (platform plumbing)
import jax
import jax.numpy as jnp
import numpy as np


def _time_op(fn, args, iters=30, label=""):
    """Compile, then time `iters` chained executions (device-side dependency)."""
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
    elapsed = (time.time() - t0) / iters
    print(f"{label:55s} {elapsed * 1e3:8.3f} ms  (compile {compile_s:.1f}s)")
    return elapsed


def bench_blur():
    from gance_tpu.ops.upfirdn2d import (
        _upsample2x_polyphase,
        setup_filter_kernel,
        upfirdn2d,
    )

    k = setup_filter_kernel((1, 3, 3, 1), 4.0)
    k1d = np.asarray([0.25, 0.75, 0.75, 0.25])

    for (b, h, c) in [(24, 512, 3), (24, 256, 3), (24, 128, 3), (8, 512, 3)]:
        x = jax.device_put(
            jnp.asarray(np.random.RandomState(0).randn(b, h, h, c), jnp.bfloat16)
        )

        def dilated(x, acc, k=k):
            out = upfirdn2d(x, k, up=2, pad0=2, pad1=1)
            return acc + jnp.sum(out).astype(jnp.float32)

        def poly(x, acc, k1d=k1d):
            out = _upsample2x_polyphase(x, k1d)
            return acc + jnp.sum(out).astype(jnp.float32)

        bytes_moved = (b * h * h * c + b * 4 * h * h * c) * 2
        t_d = _time_op(dilated, (x,), label=f"blur dilated-conv  ({b},{h},{h},{c}) bf16")
        t_p = _time_op(poly, (x,), label=f"blur polyphase-xla ({b},{h},{h},{c}) bf16")
        print(
            f"    speedup {t_d / t_p:.2f}x | poly effective BW "
            f"{bytes_moved / t_p / 1e9:.0f} GB/s (in+out only)"
        )


def bench_model():
    from gance_tpu.models.stylegan2 import (
        GeneratorConfig,
        generator_apply,
        images_to_uint8,
        init_generator_params,
    )

    config = GeneratorConfig(resolution=1024)
    with jax.default_device(jax.devices("cpu")[0]):
        params = init_generator_params(jax.random.PRNGKey(0), config)
    params = jax.device_put(params, jax.devices()[0])
    batch = 24
    z = jax.device_put(
        np.random.RandomState(0).randn(batch, config.latent_size).astype(np.float32)
    )

    def fwd(p, z, acc):
        images = images_to_uint8(
            generator_apply(p, z, config, truncation_psi=1.2, compute_dtype=jnp.bfloat16)
        )
        return acc + jnp.sum(images.astype(jnp.uint32)).astype(jnp.float32)

    t = _time_op(fwd, (params, z), iters=12, label=f"full model 1024 bf16 batch {batch}")
    print(f"    {batch / t:.1f} frames/sec")


def bench_conv1():
    from gance_tpu.ops.modulated_conv import modulated_conv2d

    b, h, cin, cout, wdim = 24, 1024, 64, 64, 512
    rng = np.random.RandomState(0)
    x = jax.device_put(jnp.asarray(rng.randn(b, h, h, cin), jnp.bfloat16))
    w = jax.device_put(jnp.asarray(rng.randn(3, 3, cin, cout), jnp.float32))
    mw = jax.device_put(jnp.asarray(rng.randn(wdim, cin), jnp.float32))
    mb = jax.device_put(jnp.asarray(rng.randn(cin), jnp.float32))
    dl = jax.device_put(jnp.asarray(rng.randn(b, wdim), jnp.float32))

    def conv1(x, w, mw, mb, dl, acc):
        out = modulated_conv2d(
            x, dl, w, mw, mb, demodulate=True, compute_dtype=jnp.bfloat16
        )
        return acc + jnp.sum(out).astype(jnp.float32)

    t = _time_op(conv1, (x, w, mw, mb, dl), iters=20,
                 label=f"conv1@1024 mod-conv ({b},{h},{h},{cin})->{cout} bf16")
    flops = 2 * b * h * h * 9 * cin * cout
    traffic = 2 * b * h * h * (cin + cout) * 2
    print(f"    {flops / t / 1e12:.1f} TFLOPS | {traffic / t / 1e9:.0f} GB/s in+out")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    if which in ("blur", "all"):
        bench_blur()
    if which in ("conv1", "all"):
        bench_conv1()
    if which in ("model", "all"):
        bench_model()
