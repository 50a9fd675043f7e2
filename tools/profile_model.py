"""
Per-op profile of the full synthesis model (or the projection step) on the
real TPU.

Runs a jax.profiler trace around a few chained forward batches, parses the
written xplane protobuf and aggregates device self-time by HLO op category /
fusion name. This is the tool behind ROUND_NOTES.md's performance model table
and the batch-cliff diffs (r2 VERDICT item 7).

Usage: python tools/profile_model.py [trace_dir] [top_k]
Env:   PROFILE_BATCH=24   batch size
       PROFILE_MODE=synthesis | projection   (projection traces the jitted
       LPIPS step: synthesis fwd + perceptual fwd/bwd + Adam update)
"""

import collections
import glob
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import gance_tpu  # noqa: F401
import jax
import jax.numpy as jnp
import numpy as np


def run_trace(trace_dir: str, iters: int = 3, batch: int = 24) -> None:
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
    z = jax.device_put(
        np.random.RandomState(0).randn(batch, config.latent_size).astype(np.float32)
    )

    # PROFILE_EPILOGUE=fused (default) traces the production serving program
    # (phase-domain uint8 quantization, the path bench.py times); "fine" keeps
    # the pre-r4 interleave-in-bf16-then-quantize form.
    fused = os.environ.get("PROFILE_EPILOGUE", "fused") == "fused"

    @jax.jit
    def fwd(p, z, acc):
        if fused:
            images = generator_apply(
                p, z, config, truncation_psi=1.2, compute_dtype=jnp.bfloat16,
                uint8_output=True,
            )
        else:
            images = images_to_uint8(
                generator_apply(
                    p, z, config, truncation_psi=1.2, compute_dtype=jnp.bfloat16
                )
            )
        return acc + jnp.sum(images.astype(jnp.uint32))

    acc = jnp.zeros((), jnp.uint32)
    t0 = time.time()
    acc = fwd(params, z, acc)
    _ = int(acc)
    print(f"compile+first: {time.time() - t0:.1f}s", file=sys.stderr)

    with jax.profiler.trace(trace_dir):
        for _ in range(iters):
            acc = fwd(params, z, acc)
        _ = int(acc)
    print(f"traced {iters} iters", file=sys.stderr)


def summarize(trace_dir: str, iters: int, top_k: int = 30) -> None:
    import json
    import os

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.xplane.pb"))
    if not paths:
        raise SystemExit(f"no xplane.pb under {trace_dir}")
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())

    totals: dict = collections.Counter()
    details: dict = {}
    total_device = 0
    for plane in space.planes:
        # device planes carry an "XLA Ops" line with per-op events
        if "TPU" not in plane.name:
            continue
        stat_names = {sid: sm.name for sid, sm in plane.stat_metadata.items()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for event in line.events:
                meta = plane.event_metadata[event.metadata_id]
                dur = event.duration_ps / 1e9  # -> ms
                totals[meta.name] += dur
                total_device += dur
                if meta.name not in details:
                    # keep the op's HLO expression / category stats for the
                    # fusion-name -> model-block mapping (tools/roofline.py)
                    stats = {}
                    for stat in list(event.stats) + list(meta.stats):
                        key = stat_names.get(stat.metadata_id, str(stat.metadata_id))
                        value = (
                            stat.str_value
                            or stat.bytes_value
                            or stat.int64_value
                            or stat.uint64_value
                            or stat.double_value
                        )
                        if key in ("hlo_op", "expression", "long_name",
                                   "hlo_category", "tf_op", "equation"):
                            stats[key] = str(value)[:400]
                    details[meta.name] = stats

    print(f"\ntotal device op time: {total_device / iters:.2f} ms/iter over {iters} iters")
    print(f"{'op':78s} {'ms/iter':>9s} {'%':>6s}")
    for name, ms in totals.most_common(top_k):
        print(f"{name[:78]:78s} {ms / iters:9.3f} {100 * ms / total_device:5.1f}%")

    json_out = os.environ.get("PROFILE_JSON", "")
    if json_out:
        records = [
            {"op": name, "ms_per_iter": round(ms / iters, 4),
             "pct": round(100 * ms / total_device, 2), **details.get(name, {})}
            for name, ms in totals.most_common()
        ]
        with open(json_out, "w") as f:
            json.dump({"total_ms_per_iter": round(total_device / iters, 3),
                       "iters": iters, "ops": records}, f, indent=1)
        print(f"wrote {json_out}", file=sys.stderr)


def run_trace_projection(trace_dir: str, iters: int, batch: int) -> None:
    """
    Trace the jitted projection step (synthesis fwd + LPIPS fwd/bwd + Adam) at
    full config-f scale (bf16), driving `TPUProjector._step_fn` directly so the
    trace holds ONLY the compiled step — project_batch's final eager synthesis
    pass would otherwise pollute the op totals.
    """
    from gance_tpu.models.stylegan2 import GeneratorConfig, init_generator_params
    from gance_tpu.projection.lpips import downsample_to
    from gance_tpu.projection.projector import ProjectorSettings, TPUProjector

    config = GeneratorConfig(resolution=1024)
    with jax.default_device(jax.devices("cpu")[0]):
        params = init_generator_params(jax.random.PRNGKey(0), config)
    params = jax.device_put(params, jax.devices()[0])
    settings = ProjectorSettings(compute_dtype="bfloat16", dlatent_avg_samples=512)
    projector = TPUProjector(
        params, config, settings=settings, expected_time_per_step=None
    )
    targets = (
        np.random.RandomState(0).rand(batch, 1024, 1024, 3) * 255
    ).astype(np.uint8)

    target = jnp.asarray(targets, jnp.float32) / 127.5 - 1.0
    target_proc = downsample_to(target, settings.perceptual_size)
    rng = jax.random.PRNGKey(settings.seed)
    w = jnp.tile(jnp.asarray(projector.dlatent_avg), (batch, 1))
    noise_rng, rng = jax.random.split(rng)
    noises = [
        jax.random.normal(
            jax.random.fold_in(noise_rng, i),
            (batch,) + tuple(params["synthesis"]["noise"][name].shape[1:]),
        )
        for i, name in enumerate(projector._noise_names)
    ]
    opt_state = projector._optimizer.init((w, noises))

    perceptual = {k: jnp.asarray(v) for k, v in projector._perceptual_params.items()}

    noise_factor = jnp.asarray(settings.initial_noise_factor, jnp.float32)

    def one_step(w, noises, opt_state, rng, step_number):
        t = jnp.asarray(step_number / 1000.0, jnp.float32)
        rng, step_rng = jax.random.split(rng)
        w, noises, opt_state, dist, _ = projector._step_fn(
            w, noises, opt_state, target_proc, t, step_rng, perceptual,
            noise_factor,
        )
        return w, noises, opt_state, rng, dist

    t0 = time.time()
    w, noises, opt_state, rng, dist = one_step(w, noises, opt_state, rng, 0)
    dist.block_until_ready()
    print(f"compile+first step: {time.time() - t0:.1f}s", file=sys.stderr)

    with jax.profiler.trace(trace_dir):
        for step_number in range(1, iters + 1):
            w, noises, opt_state, rng, dist = one_step(
                w, noises, opt_state, rng, step_number
            )
        dist.block_until_ready()
    print(f"traced {iters} projection steps", file=sys.stderr)


if __name__ == "__main__":
    import os

    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/gance_profile"
    top_k = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    iters = 3
    batch = int(os.environ.get("PROFILE_BATCH", "24"))
    mode = os.environ.get("PROFILE_MODE", "synthesis")
    print(f"device: {jax.devices()[0]} mode={mode} batch={batch}", file=sys.stderr)
    if mode == "projection":
        run_trace_projection(trace_dir, iters=iters, batch=batch)
    else:
        run_trace(trace_dir, iters=iters, batch=batch)
    summarize(trace_dir, iters, top_k)
