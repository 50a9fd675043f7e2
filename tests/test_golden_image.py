"""
Golden-image regression: a deterministic tiny-generator render pinned by
checksum, so any silent numerics drift anywhere in the synthesis stack (mapping,
truncation, modulated conv, upfirdn, bias-act epilogue, uint8 conversion) fails
CI — the reference's pinned-golden pattern (test_dynamic_model_switching.py:38
RMS scalar; test_video_common.py image checksum 299876727).
"""

import zlib

import jax
import jax.numpy as jnp
import numpy as np

from gance_tpu.models.stylegan2 import (
    GeneratorConfig,
    generator_apply,
    images_to_uint8,
    init_generator_params,
)

GOLDEN_CRC32 = 2968496281
GOLDEN_SUM = 1128256
GOLDEN_PIXELS = {
    (0, 0, 0): (90, 117, 147),
    (1, 16, 16): (24, 139, 0),
    (3, 31, 31): (108, 121, 81),
}


def _render(phase_top_block_mode=None) -> np.ndarray:
    config = GeneratorConfig(
        resolution=32, fmap_base=512, fmap_max=64, latent_size=32,
        dlatent_size=32, mapping_layers=2, mapping_fmaps=32,
    )
    params = init_generator_params(jax.random.PRNGKey(0), config)
    z = np.random.RandomState(1234).randn(4, 32).astype(np.float32)
    return np.asarray(
        images_to_uint8(
            generator_apply(
                params, jnp.asarray(z), config, truncation_psi=1.2,
                phase_top_block_mode=phase_top_block_mode,
            )
        )
    )


def test_generator_render_matches_golden():
    images = _render()
    assert images.shape == (4, 32, 32, 3) and images.dtype == np.uint8
    # diagnostic first: sampled pixels localize a drift before the crc fails
    for (b, y, x), want in GOLDEN_PIXELS.items():
        got = tuple(int(v) for v in images[b, y, x])
        assert got == want, f"pixel[{b},{y},{x}] drifted: {got} != {want}"
    assert int(images.astype(np.int64).sum()) == GOLDEN_SUM
    assert zlib.crc32(images.tobytes()) == GOLDEN_CRC32


def test_generator_render_is_deterministic():
    """Two renders in one process must be bit-identical (const noise, fixed z)."""
    np.testing.assert_array_equal(_render(), _render())


def test_phase_path_matches_same_golden():
    """The polyphase top block rounds to the SAME uint8 goldens at this scale
    (fp reassociation stays below the quantization step here), so the phase
    path is pinned against the identical constants."""
    images = _render(phase_top_block_mode=True)
    for (b, y, x), want in GOLDEN_PIXELS.items():
        got = tuple(int(v) for v in images[b, y, x])
        assert got == want, f"pixel[{b},{y},{x}] drifted: {got} != {want}"
    assert int(images.astype(np.int64).sum()) == GOLDEN_SUM
    assert zlib.crc32(images.tobytes()) == GOLDEN_CRC32
