"""
Quantify the bf16-compute quality tradeoff: synthesized uint8 frames from the same
latents under float32 vs bfloat16 compute must agree closely (style/demod math is
fp32 in both). This bounds what the fast path costs in fidelity.
"""

import jax
import numpy as np

from gance_tpu.models.stylegan2 import (
    GeneratorConfig,
    generator_apply,
    images_to_uint8,
    init_generator_params,
)

TINY = GeneratorConfig(resolution=32, fmap_base=512, fmap_max=64, latent_size=64,
                       dlatent_size=64, mapping_layers=2, mapping_fmaps=64)


def test_bf16_close_to_fp32():
    import jax.numpy as jnp

    params = init_generator_params(jax.random.PRNGKey(0), TINY)
    z = jax.random.normal(jax.random.PRNGKey(1), (4, TINY.latent_size))

    f32 = np.asarray(
        images_to_uint8(generator_apply(params, z, TINY, compute_dtype=jnp.float32))
    ).astype(int)
    bf16 = np.asarray(
        images_to_uint8(generator_apply(params, z, TINY, compute_dtype=jnp.bfloat16))
    ).astype(int)

    diff = np.abs(f32 - bf16)
    # Mean per-pixel deviation stays small and there are no gross outliers.
    assert diff.mean() < 2.0, diff.mean()
    assert np.percentile(diff, 99) <= 8, np.percentile(diff, 99)
    assert diff.max() <= 64, diff.max()
