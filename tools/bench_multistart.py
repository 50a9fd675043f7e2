"""
Projection quality headroom: single cold start vs the reachable floor vs
best-of-K random w starts.

The r3 sign-locking measurements showed the NVlabs schedule dominates the
trajectory — cold runs land near the same w regardless of target. If the
optimizer is schedule-bound, the single-start distance may sit far above
what the generator can express. This measures, on ONE reachable target
(rendered from a known w):

  A. standard cold start (the reference's exact behavior);
  B. warm start at the TRUE w, jitter-free — an upper bound on the floor;
  C. best-of-K: the same target replicated K times, each replica started at
     the mapped w of a different random z, jitter-free — restart diversity
     that rides the batch dimension (K starts cost what K frames cost, and
     chips are underutilized at batch 1 anyway);
  D. the FIRST of arm C's random starts alone at batch 1 — a consistency
     check: frames optimize independently, so D must match C's first entry.
     (An r3 hardware run saw batch-1 arms land at the cold distance while
     every batch-8 start reached ~0.07 — not reproducible on CPU, where
     batch-1/batch-N trajectories agree per-start to 3 decimals with the
     phase path on or off; tests/test_projection.py pins that. Arm D exists
     to re-discriminate on hardware: it ran during the session in which the
     tunnel progressively wedged, so stale-executable/tunnel corruption is
     the standing explanation until a clean-device rerun.)

Usage: tools/tpu_retry.sh /tmp/ms.log python tools/bench_multistart.py \
           [resolution] [steps] [K]
Prints one JSON line.
"""

import json
import sys


def main() -> None:
    resolution = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    sys.path.insert(0, "/root/repo")
    import gance_tpu  # noqa: F401
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gance_tpu.models.stylegan2 import (
        GeneratorConfig,
        images_to_uint8,
        init_generator_params,
        mapping_apply,
        synthesis_apply,
    )
    from gance_tpu.projection.projector import ProjectorSettings, TPUProjector

    config = GeneratorConfig(resolution=resolution)
    with jax.default_device(jax.devices("cpu")[0]):
        params = init_generator_params(jax.random.PRNGKey(0), config)
    params = jax.device_put(params, jax.devices()[0])

    w_true = mapping_apply(
        params, jax.random.normal(jax.random.PRNGKey(1), (1, 512)), config
    )
    dlat = jnp.tile(w_true[:, None, :], (1, config.num_style_rows, 1))
    target = np.asarray(
        images_to_uint8(synthesis_apply(params, dlat, config, noise_mode="const"))
    )[0]
    print("target ready", file=sys.stderr, flush=True)

    projector = TPUProjector(
        params, config,
        settings=ProjectorSettings(
            num_steps=steps, compute_dtype="bfloat16",
            scan_segment=min(steps, 250),
        ),
        expected_time_per_step=None,
    )

    # A: standard cold start
    cold = projector.project(target, want_step_images=False)
    print(f"A cold@{steps}: {cold.final_distance:.4f}", file=sys.stderr, flush=True)

    # B: true-w start, jitter-free (floor estimate)
    floor = projector.project(
        target, want_step_images=False,
        initial_latents=np.asarray(w_true)[0], noise_factor=0.0,
    )
    print(f"B true-w@{steps}: {floor.final_distance:.4f}", file=sys.stderr, flush=True)

    # C: best-of-K random mapped-w starts, jitter-free, one batched optimization.
    # Noise buffers are pinned explicitly as (1, h, w, 1) — broadcast over the
    # batch — so arm D (batch 1) optimizes from IDENTICAL inputs; default
    # drawing would give C shape-(K,...) and D shape-(1,...) draws whose
    # element-0 equality is PRNG-implementation-dependent, and a benign
    # mismatch would false-flag the consistency check.
    noise_rs = np.random.RandomState(7)
    shared_noises = [
        noise_rs.randn(
            1, *params["synthesis"]["noise"][name].shape[1:]
        ).astype(np.float32)
        for name in projector._noise_names
    ]
    z = jax.random.normal(jax.random.PRNGKey(99), (k, 512))
    w_starts = np.asarray(mapping_apply(params, z, config))  # (K, 512)
    results = projector.project_batch(
        np.repeat(target[None], k, axis=0),
        want_step_images=False, per_step_noises=False,
        initial_latents=w_starts, initial_noises=shared_noises,
        noise_factor=0.0,
    )
    k_dists = [r.final_distance for r in results]
    print(
        f"C best-of-{k}@{steps}: min={min(k_dists):.4f} "
        f"dists={[round(d, 4) for d in k_dists]}",
        file=sys.stderr, flush=True,
    )

    # D: arm C's first start alone at batch 1 — must match C[0] (frames are
    # independent); a mismatch indicts the device/executable, not the math.
    solo = projector.project(
        target, want_step_images=False,
        initial_latents=w_starts[0], initial_noises=shared_noises,
        noise_factor=0.0,
    )
    print(
        f"D rand0-batch1@{steps}: {solo.final_distance:.4f} "
        f"(C[0] was {k_dists[0]:.4f})",
        file=sys.stderr, flush=True,
    )

    print(
        json.dumps(
            {
                "metric": f"{resolution}px projection quality headroom @{steps} steps",
                "cold_distance": round(float(cold.final_distance), 4),
                "true_w_start_distance": round(float(floor.final_distance), 4),
                "best_of_k_distance": round(float(min(k_dists)), 4),
                "k": k,
                "k_distances": [round(float(d), 4) for d in k_dists],
                "rand0_batch1_distance": round(float(solo.final_distance), 4),
                "batch_consistency_abs_diff": round(
                    abs(float(solo.final_distance) - float(k_dists[0])), 4
                ),
                "steps": steps,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
