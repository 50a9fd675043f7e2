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


def test_phase_path_matches_golden_within_quantization():
    """
    The polyphase top block must match the standard path's goldens to within the
    uint8 quantization step. PRIMARY assert: float-domain parity is covered by
    tests/test_phase_block.py (atol 5e-5); here the uint8 render may flip a pixel
    sitting exactly on a rounding boundary under a different fp association
    order (or a future XLA version), so the pin is a <=1-step bound plus a small
    cap on how many pixels flip — not a bit-exact CRC (round-2 advisor finding:
    a shared-CRC pin tests fp luck, not parity).
    """
    standard = _render()
    images = _render(phase_top_block_mode=True)
    diff = np.abs(images.astype(np.int64) - standard.astype(np.int64))
    assert int(diff.max()) <= 1
    flipped = int((diff > 0).sum())
    assert flipped <= images.size // 100, f"{flipped} pixels flipped vs standard"
    for (b, y, x), want in GOLDEN_PIXELS.items():
        got = tuple(int(v) for v in images[b, y, x])
        assert all(abs(g - w) <= 1 for g, w in zip(got, want)), (
            f"pixel[{b},{y},{x}] drifted beyond quantization: {got} != {want}"
        )
