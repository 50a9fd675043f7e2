"""
Projection quality bound: random-VGG vs learned-lin LPIPS metrics
(r2 VERDICT item 5 — "the fallback's quality cost is a number, not a hope").

No pretrained VGG weights exist on this host (zero egress), so true-LPIPS
parity with Zhang's metric is unmeasurable here. What IS measurable — and what
this tool measures — is the sensitivity of projection results to the choice of
perceptual metric: project the same generator-produced targets under

  A. the default deterministic random-VGG metric (lpips.random_vgg_params), and
  B. an independent NVlabs-layout LPIPS metric (different conv filters, Zhang
     scaling constants, positive learned-style lin weights) built through the
     production import path (vgg_import.convert_nvlabs_lpips),

then cross-evaluate every result under BOTH metrics plus pixel-space PSNR
against the target. The cross-metric gap (how much worse metric A's optimum
scores under metric B, relative to projecting under B directly) bounds how far
the random-VGG fallback's projections can sit from any fixed VGG-family
metric's optimum — including the real one, once its weights are available.

Prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def _fabricated_nvlabs_metric(seed: int):
    """An independent LPIPS metric through the production NVlabs import path."""
    import numpy as np

    from gance_tpu.projection.vgg_import import (
        convert_nvlabs_lpips,
        fabricate_nvlabs_lpips_variables,
    )

    return convert_nvlabs_lpips(
        fabricate_nvlabs_lpips_variables(np.random.RandomState(seed), he_scaled=True)
    )


def main() -> None:
    import gance_tpu  # noqa: F401
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gance_tpu.models.stylegan2 import (
        GeneratorConfig,
        generator_apply,
        images_to_uint8,
        init_generator_params,
    )
    from gance_tpu.projection.lpips import (
        downsample_to,
        lpips_distance,
        random_vgg_params,
    )
    from gance_tpu.projection.projector import ProjectorSettings, TPUProjector

    resolution = int(os.environ.get("BENCH_RESOLUTION", "1024"))
    steps = int(os.environ.get("BENCH_STEPS", "250"))
    batch = int(os.environ.get("BENCH_BATCH", "2"))

    config = GeneratorConfig(resolution=resolution)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        gen_params = init_generator_params(jax.random.PRNGKey(0), config)
    gen_params = jax.device_put(gen_params, jax.devices()[0])

    # Targets from the SAME generator (held-out z): reachable optima, so the
    # metrics' quality difference is measurable. (Cross-generator targets were
    # tried first: at practical step counts both optima stall in the same
    # shallow basin ~w_avg and every aggregate coincides to 4 decimals —
    # the experiment separates nothing.)
    z = jax.device_put(
        np.random.RandomState(7).randn(batch, config.latent_size).astype(np.float32)
    )
    targets = np.asarray(
        images_to_uint8(generator_apply(gen_params, z, config,
                                        compute_dtype=jnp.bfloat16))
    )

    metric_a = random_vgg_params(seed=0)
    metric_b = _fabricated_nvlabs_metric(seed=1234)

    results = {}
    finals = {}
    for label, metric in (("random_vgg", metric_a), ("lin_lpips", metric_b)):
        settings = ProjectorSettings(num_steps=steps, compute_dtype="bfloat16")
        projector = TPUProjector(
            gen_params, config, settings=settings, expected_time_per_step=None
        )
        # metric weights are a step ARGUMENT; structure changes retrace cleanly
        projector._perceptual_params = metric
        t0 = time.time()
        out = projector.project_batch(targets, want_step_images=False)
        elapsed = time.time() - t0
        finals[label] = np.stack([r.final_image for r in out])
        results[label] = {
            "final_distance_own_metric": [round(r.final_distance, 4) for r in out],
            "seconds": round(elapsed, 1),
        }
        print(f"{label}: projected {batch} frames in {elapsed:.1f}s",
              file=sys.stderr, flush=True)

    # Cross-evaluation on the perceptual grid + pixel PSNR vs the target.
    target_f = jnp.asarray(targets, jnp.float32) / 127.5 - 1.0
    target_proc = downsample_to(target_f, 256)
    for label, images in finals.items():
        images_f = jnp.asarray(images, jnp.float32) / 127.5 - 1.0
        proc = downsample_to(images_f, 256)
        for metric_label, metric in (("random_vgg", metric_a), ("lin_lpips", metric_b)):
            d = np.asarray(lpips_distance(metric, proc, target_proc))
            results[label][f"distance_under_{metric_label}"] = [
                round(float(v), 4) for v in d
            ]
        mse = np.mean(
            (images.astype(np.float64) - targets.astype(np.float64)) ** 2,
            axis=(1, 2, 3),
        )
        results[label]["pixel_psnr_db"] = [
            round(10 * np.log10(255.0**2 / m), 2) for m in mse
        ]

    # Sanity: the two optima must actually differ (a bit-identical pair means a
    # caching/aliasing bug upstream, not a measurement).
    finals_diff = int(
        np.abs(
            finals["random_vgg"].astype(np.int64) - finals["lin_lpips"].astype(np.int64)
        ).max()
    )
    print(f"max |final_A - final_B| = {finals_diff} uint8 steps", file=sys.stderr)

    # The headline: metric A's optimum judged under B, relative to B's optimum.
    a_under_b = np.mean(results["random_vgg"]["distance_under_lin_lpips"])
    b_under_b = np.mean(results["lin_lpips"]["distance_under_lin_lpips"])
    b_under_a = np.mean(results["lin_lpips"]["distance_under_random_vgg"])
    a_under_a = np.mean(results["random_vgg"]["distance_under_random_vgg"])
    print(
        json.dumps(
            {
                "metric": f"{resolution}px projection cross-metric quality gap "
                          f"({steps} steps, batch {batch})",
                "results": results,
                "cross_gap_a_optimum_under_b": round(float(a_under_b / b_under_b), 3),
                "cross_gap_b_optimum_under_a": round(float(b_under_a / a_under_a), 3),
                # 0 here means the two optimizations produced bit-identical
                # images — a compile/caching fault upstream, not a valid
                # measurement (observed once on freshly remote-compiled
                # program pairs over the tunnel; cache-served runs behave).
                "finals_max_abs_diff": finals_diff,
            }
        )
    )


if __name__ == "__main__":
    main()
