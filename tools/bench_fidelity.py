"""
Full-scale fidelity certification on the real TPU: production path (bf16
compute, phase top block) vs the exact path (fp32, standard formulation,
GANCE_TPU_PHASE1024=off) on config-f 1024px uint8 outputs.

Reports mean |diff| in uint8 steps, PSNR, and worst-pixel deviation — the
numbers recorded in ROUND_NOTES.md (round-2 cert: PSNR 41-43 dB).

Usage: python tools/bench_fidelity.py [n_seeds] [batch]
"""


import sys
import time

sys.path.insert(0, "/root/repo")
import gance_tpu  # noqa: F401
import jax
import jax.numpy as jnp
import numpy as np


def main(n_seeds: int = 3, batch: int = 4) -> None:
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

    def make_fwd(compute_dtype, phase: bool):
        def fwd(p, z):
            return images_to_uint8(
                generator_apply(
                    p, z, config, truncation_psi=1.2, compute_dtype=compute_dtype,
                    phase_top_block_mode=phase,
                )
            )

        return jax.jit(fwd)

    fwd_fast = make_fwd(jnp.bfloat16, phase=True)     # production path
    fwd_exact = make_fwd(jnp.float32, phase=False)    # reference-exact path

    diffs, psnrs, worsts = [], [], []
    for seed in range(n_seeds):
        z = jax.device_put(
            np.random.RandomState(seed).randn(batch, config.latent_size).astype(
                np.float32
            )
        )
        t0 = time.time()
        a = np.asarray(fwd_fast(params, z)).astype(np.float64)
        b = np.asarray(fwd_exact(params, z)).astype(np.float64)
        d = np.abs(a - b)
        mse = float(np.mean((a - b) ** 2))
        psnr = 10 * np.log10(255.0**2 / mse) if mse > 0 else float("inf")
        diffs.append(float(d.mean()))
        psnrs.append(psnr)
        worsts.append(float(d.max()))
        print(
            f"seed {seed}: mean|d|={d.mean():.3f} uint8 steps, "
            f"PSNR={psnr:.1f} dB, worst={d.max():.0f} ({time.time()-t0:.0f}s)",
            file=sys.stderr,
        )

    print(
        f"SUMMARY bf16-phase vs fp32-standard @1024 config-f: "
        f"mean|d| {np.mean(diffs):.3f} steps, PSNR {min(psnrs):.1f}-{max(psnrs):.1f} dB, "
        f"worst pixel {max(worsts):.0f} steps over {n_seeds * batch} images"
    )


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    main(n, b)
