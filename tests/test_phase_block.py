"""
Phase-space top-block parity: the folded polyphase forms must reproduce the
standard ops exactly (same linear operator, different association order).

Reference behavior being preserved: stylegan2 upfirdn_2d upsample_conv_2d +
3x3 SAME conv + 1x1 ToRGB (SURVEY.md §2.9); the phase rewrite is a TPU
performance formulation only.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from gance_tpu.ops.phase_block import (
    fold_conv1_weights,
    fold_upconv_blur_weights,
    interleave_phases_nchw,
    interleave_phases_nhwc,
    phase_conv,
    phase_split_fine,
    phase_split_fine_shifted,
    resample_root,
)
from gance_tpu.ops.upfirdn2d import upsample_conv_2d

RK = (1, 3, 3, 1)


def _rand(key, shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


class TestUpconvFold:
    @pytest.mark.parametrize("h,cin,cout", [(8, 5, 4), (16, 3, 7), (12, 8, 8)])
    def test_matches_upsample_conv_2d(self, h, cin, cout):
        x = _rand(0, (2, h, h, cin))
        w = _rand(1, (3, 3, cin, cout))
        expected = upsample_conv_2d(x, w, kernel=RK)  # (2, 2h, 2h, cout)

        root = resample_root(RK)
        folded = fold_upconv_blur_weights(w, root)  # (3,3,cin,4*cout)
        ph = phase_conv(x, folded, ((1, 1), (1, 1)), jnp.float32)
        got = interleave_phases_nhwc(ph, 2 * h, 2 * h)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-5)

    def test_rectangular_input(self):
        x = _rand(2, (1, 6, 10, 4))
        w = _rand(3, (3, 3, 4, 6))
        expected = upsample_conv_2d(x, w, kernel=RK)
        folded = fold_upconv_blur_weights(w, resample_root(RK))
        ph = phase_conv(x, folded, ((1, 1), (1, 1)), jnp.float32)
        got = interleave_phases_nhwc(ph, 12, 20)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-5)


def unphase_conv1_numpy(z_ph: np.ndarray, h: int, w: int) -> np.ndarray:
    """Conv1-convention phases (B, h/2+1, w/2+1, 4*C) -> fine (B, h, w, C),
    literal per-pixel indexing (independent reference for the interleave)."""
    b, _, _, c4 = z_ph.shape
    c = c4 // 4
    z = z_ph.reshape(b, h // 2 + 1, w // 2 + 1, 4, c)
    out = np.zeros((b, h, w, c), z_ph.dtype)
    for p in range(h):
        sig_h, m = (0, p // 2) if p % 2 == 0 else (1, (p + 1) // 2)
        for q in range(w):
            sig_w, n = (0, q // 2) if q % 2 == 0 else (1, (q + 1) // 2)
            out[:, p, q] = z[:, m, n, sig_h * 2 + sig_w]
    return out


def phase_stack_fine(y_fine: jnp.ndarray) -> jnp.ndarray:
    """Fine NHWC -> upconv-convention phase planes (B, h/2, w/2, 4*C)."""
    b, h, w, c = y_fine.shape
    planes = jnp.stack(
        [y_fine[:, dh::2, dw::2, :] for dh in range(2) for dw in range(2)], axis=3
    )  # (B, h/2, w/2, 4, C)
    return planes.reshape(b, h // 2, w // 2, 4 * c)


class TestConv1Fold:
    @pytest.mark.parametrize("h,c", [(16, 4), (24, 6)])
    def test_matches_same_conv(self, h, c):
        """Phase-split input -> folded 2x2 conv -> interleave == 3x3 SAME conv."""
        y_fine = _rand(4, (2, h, h, c))
        v = _rand(5, (3, 3, c, c))
        expected = lax.conv_general_dilated(
            y_fine, v, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

        y_ph = phase_stack_fine(y_fine)
        folded = fold_conv1_weights(v)
        z_ph = phase_conv(y_ph, folded, ((1, 1), (1, 1)), jnp.float32)
        assert z_ph.shape == (2, h // 2 + 1, h // 2 + 1, 4 * c)

        got = unphase_conv1_numpy(np.asarray(z_ph), h, h)
        np.testing.assert_allclose(got, np.asarray(expected), atol=2e-5)

    def test_interleave_phases_nchw_matches_literal(self):
        """The vectorized RGB interleave equals the literal per-pixel one."""
        h = 12
        z_ph = _rand(7, (2, h // 2 + 1, h // 2 + 1, 12))
        got = interleave_phases_nchw(z_ph, h, h)
        expected = unphase_conv1_numpy(np.asarray(z_ph), h, h)  # (B,h,w,3)
        np.testing.assert_array_equal(
            np.asarray(got), np.transpose(expected, (0, 3, 1, 2))
        )

    def test_full_fine_block_path(self):
        """upconv fold -> conv1 fold -> interleave == standard two-conv chain."""
        h, cin, cout = 8, 6, 4
        x = _rand(8, (2, h, h, cin))
        w_up = _rand(9, (3, 3, cin, cout))
        v = _rand(10, (3, 3, cout, cout))

        ref = upsample_conv_2d(x, w_up, kernel=RK)
        ref = lax.conv_general_dilated(
            ref, v, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

        ph = phase_conv(
            x, fold_upconv_blur_weights(w_up, resample_root(RK)),
            ((1, 1), (1, 1)), jnp.float32,
        )
        z_ph = phase_conv(ph, fold_conv1_weights(v), ((1, 1), (1, 1)), jnp.float32)
        got = unphase_conv1_numpy(np.asarray(z_ph), 2 * h, 2 * h)
        np.testing.assert_allclose(got, np.asarray(ref), atol=3e-5)


class TestGeneratorParity:
    """Full synthesis with the phase top block vs the standard path."""

    def _outputs(self, monkeypatch, mode, noise_mode, rng=None):
        from gance_tpu.models.stylegan2 import (
            GeneratorConfig,
            init_generator_params,
            synthesis_apply,
            broadcast_dlatents,
            mapping_apply,
        )

        monkeypatch.setenv("GANCE_TPU_PHASE1024", mode)
        config = GeneratorConfig(resolution=64, fmap_base=1024)
        assert config.nf(config.resolution_log2 - 1) < 128  # phase path eligible
        params = init_generator_params(jax.random.PRNGKey(0), config)
        z = _rand(11, (2, config.latent_size))
        w = mapping_apply(params, z, config)
        dl = broadcast_dlatents(w, config)
        return synthesis_apply(
            params, dl, config, noise_mode=noise_mode, rng=rng,
            compute_dtype=jnp.float32,
        )

    @pytest.mark.parametrize("noise_mode", ["const", "none"])
    def test_parity(self, monkeypatch, noise_mode):
        ref = self._outputs(monkeypatch, "off", noise_mode)
        got = self._outputs(monkeypatch, "on", noise_mode)
        assert got.shape == ref.shape == (2, 64, 64, 3)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5)

    def test_explicit_mode_arg_overrides_env(self, monkeypatch):
        """phase_top_block_mode=True/False controls the path regardless of the
        env flag (programmatic, jit-cache-stable control)."""
        from gance_tpu.models.stylegan2 import (
            GeneratorConfig,
            broadcast_dlatents,
            init_generator_params,
            mapping_apply,
            synthesis_apply,
        )

        monkeypatch.setenv("GANCE_TPU_PHASE1024", "off")
        config = GeneratorConfig(resolution=64, fmap_base=1024)
        params = init_generator_params(jax.random.PRNGKey(0), config)
        dl = broadcast_dlatents(
            mapping_apply(params, _rand(11, (2, config.latent_size)), config), config
        )
        ref = synthesis_apply(params, dl, config, phase_top_block_mode=False)
        got = synthesis_apply(params, dl, config, phase_top_block_mode=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5)

    @pytest.mark.parametrize(
        "resolution,fmap_base",
        [
            (8, 256),     # minimum model: top block is the first loop block
            (32, 768),    # cout = 48: non-power-of-two channels
            (64, 512),    # cout = 16: tiny channels
        ],
    )
    def test_parity_across_configs(self, monkeypatch, resolution, fmap_base):
        """Phase parity holds for odd channel counts and the smallest models."""
        from gance_tpu.models.stylegan2 import (
            GeneratorConfig,
            broadcast_dlatents,
            init_generator_params,
            mapping_apply,
            synthesis_apply,
        )

        config = GeneratorConfig(resolution=resolution, fmap_base=fmap_base)
        assert config.nf(config.resolution_log2 - 1) < 128
        params = init_generator_params(jax.random.PRNGKey(3), config)
        dl = broadcast_dlatents(
            mapping_apply(params, _rand(14, (2, config.latent_size)), config), config
        )
        ref = synthesis_apply(params, dl, config, phase_top_block_mode=False)
        got = synthesis_apply(params, dl, config, phase_top_block_mode=True)
        assert got.shape == ref.shape == (2, resolution, resolution, 3)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5)

    def test_unsupported_resample_kernel_falls_back(self, monkeypatch):
        """A non-4-tap FIR can't be phase-folded: forced phase mode must fall
        back to the standard path instead of crashing (code-review finding)."""
        from gance_tpu.models.stylegan2 import (
            GeneratorConfig,
            broadcast_dlatents,
            init_generator_params,
            mapping_apply,
            synthesis_apply,
        )

        monkeypatch.setenv("GANCE_TPU_PHASE1024", "on")
        config = GeneratorConfig(
            resolution=32, fmap_base=256, resample_kernel=(1, 2, 1)
        )
        assert config.nf(config.resolution_log2 - 1) < 128
        params = init_generator_params(jax.random.PRNGKey(0), config)
        dl = broadcast_dlatents(
            mapping_apply(params, _rand(12, (1, config.latent_size)), config), config
        )
        out_on = synthesis_apply(params, dl, config)
        monkeypatch.setenv("GANCE_TPU_PHASE1024", "off")
        out_off = synthesis_apply(params, dl, config)
        np.testing.assert_array_equal(np.asarray(out_on), np.asarray(out_off))

    def test_non_rgb_channel_count(self, monkeypatch):
        """num_channels != 3 must work under the phase path (the interleave
        is channel-count generic; code-review finding)."""
        from gance_tpu.models.stylegan2 import (
            GeneratorConfig,
            broadcast_dlatents,
            init_generator_params,
            mapping_apply,
            synthesis_apply,
        )

        config = GeneratorConfig(resolution=32, fmap_base=256, num_channels=1)
        assert config.nf(config.resolution_log2 - 1) < 128
        params = init_generator_params(jax.random.PRNGKey(0), config)
        dl = broadcast_dlatents(
            mapping_apply(params, _rand(13, (1, config.latent_size)), config), config
        )
        monkeypatch.setenv("GANCE_TPU_PHASE1024", "on")
        got = synthesis_apply(params, dl, config)
        monkeypatch.setenv("GANCE_TPU_PHASE1024", "off")
        ref = synthesis_apply(params, dl, config)
        assert got.shape == ref.shape == (1, 32, 32, 1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5)

    def test_parity_random_noise(self, monkeypatch):
        rng = jax.random.PRNGKey(42)
        ref = self._outputs(monkeypatch, "off", "random", rng)
        got = self._outputs(monkeypatch, "on", "random", rng)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5)

    def test_large_channel_top_block_keeps_standard_path(self, monkeypatch):
        """cout >= 128 at the top: phase mode must not change anything."""
        from gance_tpu.models.stylegan2 import _phase_top_block_enabled

        monkeypatch.setenv("GANCE_TPU_PHASE1024", "on")
        assert not _phase_top_block_enabled(128, jnp.bfloat16)
        assert _phase_top_block_enabled(64, jnp.bfloat16)
        assert _phase_top_block_enabled(64, jnp.float32)  # explicit 'on' wins
        monkeypatch.setenv("GANCE_TPU_PHASE1024", "off")
        assert not _phase_top_block_enabled(64, jnp.bfloat16)

    def test_auto_mode_gates_on_dtype_and_backend(self, monkeypatch):
        """auto: phase only on TPU backends AND sub-fp32 compute dtypes (the
        fp32-HIGHEST fold measured 1.26x slower; see _phase_top_block_enabled)."""
        from gance_tpu.models.stylegan2 import _phase_top_block_enabled

        monkeypatch.setenv("GANCE_TPU_PHASE1024", "auto")
        # tests run on the CPU backend: auto is always off here
        assert not _phase_top_block_enabled(64, jnp.bfloat16)
        assert not _phase_top_block_enabled(64, jnp.float32)


class TestPhaseSplits:
    def test_phase_split_fine(self):
        fine = jnp.arange(2 * 8 * 6).reshape(2, 8, 6, 1).astype(jnp.float32)
        ph = phase_split_fine(fine)
        assert ph.shape == (2, 4, 3, 4)
        for dh in range(2):
            for dw in range(2):
                np.testing.assert_array_equal(
                    np.asarray(ph[..., dh * 2 + dw]),
                    np.asarray(fine[:, dh::2, dw::2, 0]),
                )

    def test_phase_split_fine_shifted(self):
        fine = jnp.arange(1 * 8 * 8).reshape(1, 8, 8, 1).astype(jnp.float32)
        ph = phase_split_fine_shifted(fine)
        assert ph.shape == (1, 5, 5, 4)
        f = np.asarray(fine[0, :, :, 0])
        for sig_h in range(2):
            for sig_w in range(2):
                plane = np.asarray(ph[0, :, :, sig_h * 2 + sig_w])
                for m in range(5):
                    for n in range(5):
                        fr, fc = 2 * m - sig_h, 2 * n - sig_w
                        if 0 <= fr < 8 and 0 <= fc < 8:
                            assert plane[m, n] == f[fr, fc], (sig_h, sig_w, m, n)
                        else:
                            assert plane[m, n] == 0.0

    def test_interleave_phases_nhwc_roundtrip(self):
        fine = _rand(6, (2, 10, 14, 5))
        planes = jnp.stack(
            [fine[:, dh::2, dw::2, :] for dh in range(2) for dw in range(2)], axis=3
        )  # (B, 5, 7, 4, C)
        ph = planes.reshape(2, 5, 7, 20)
        got = interleave_phases_nhwc(ph, 10, 14)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(fine))


class TestPhaseEnvJitKeying:
    """VERDICT r2 item 9: env flips must key the runtime's jit cache."""

    def test_env_flip_between_calls_serves_both_paths(self, monkeypatch):
        """
        A SynthesisNetwork call after flipping GANCE_TPU_PHASE1024 must trace
        and run the newly selected path (the resolved bool is a static jit arg),
        never serve the stale program.
        """
        import gance_tpu.ops.phase_block as phase_block_mod
        from gance_tpu.models.stylegan2 import GeneratorConfig, init_generator_params
        from gance_tpu.synthesis.runtime import SynthesisNetwork

        # Distinct architecture so this test owns its jit cache entries.
        config = GeneratorConfig(
            resolution=64, fmap_base=1152, fmap_max=96, latent_size=48,
            dlatent_size=48, mapping_layers=2, mapping_fmaps=48,
        )
        assert config.nf(config.resolution_log2 - 1) < 128
        params = init_generator_params(jax.random.PRNGKey(5), config)
        net = SynthesisNetwork(params=params, config=config, compute_dtype=jnp.float32)
        z = np.asarray(_rand(21, (2, config.latent_size)))

        phase_traces = []
        real_phase_top_block = phase_block_mod.phase_top_block
        real_phase_top_block_uint8 = phase_block_mod.phase_top_block_uint8

        def spy(*args, **kwargs):
            phase_traces.append(True)
            return real_phase_top_block(*args, **kwargs)

        def spy_uint8(*args, **kwargs):
            # the serving path uses the fused uint8 epilogue variant
            phase_traces.append(True)
            return real_phase_top_block_uint8(*args, **kwargs)

        monkeypatch.setattr(phase_block_mod, "phase_top_block", spy)
        monkeypatch.setattr(phase_block_mod, "phase_top_block_uint8", spy_uint8)

        monkeypatch.setenv("GANCE_TPU_PHASE1024", "off")
        images_off = net.images_from_vectors(z)
        assert not phase_traces

        monkeypatch.setenv("GANCE_TPU_PHASE1024", "on")
        images_on = net.images_from_vectors(z)
        assert phase_traces, "flipping the env did not retrace onto the phase path"

        # parity between the two programs (uint8 boundary pixels may flip by 1)
        assert int(np.abs(images_on.astype(int) - images_off.astype(int)).max()) <= 1

        # flipping back must serve the standard path again (cached, no new trace)
        phase_traces.clear()
        monkeypatch.setenv("GANCE_TPU_PHASE1024", "off")
        images_off_again = net.images_from_vectors(z)
        assert not phase_traces
        np.testing.assert_array_equal(images_off_again, images_off)

    def test_unknown_env_value_raises(self, monkeypatch):
        from gance_tpu.models.stylegan2 import phase_mode_from_env

        monkeypatch.setenv("GANCE_TPU_PHASE1024", "ON")  # case-insensitive ok
        assert phase_mode_from_env() == "on"
        monkeypatch.setenv("GANCE_TPU_PHASE1024", "1")
        with pytest.raises(ValueError, match="GANCE_TPU_PHASE1024"):
            phase_mode_from_env()


def test_auto_mode_includes_non_highest_precision(monkeypatch):
    """auto: the phase fold also engages for fp32 when the conv precision is
    not HIGHEST (bf16x3 runs the folded FLOPs cheaply; measured 65.9 vs
    59.3 f/s with identical 1-uint8-step parity). CPU backends stay off."""
    import jax as jax_mod

    from gance_tpu.models.stylegan2 import _phase_top_block_enabled
    from gance_tpu.ops import precision as precision_mod

    monkeypatch.setenv("GANCE_TPU_PHASE1024", "auto")
    monkeypatch.setattr(precision_mod, "CONV_PRECISION", jax_mod.lax.Precision.HIGH)
    # CPU backend: still off regardless of precision
    assert not _phase_top_block_enabled(64, jnp.float32)
    # TPU backend (simulated): fp32 + HIGH precision -> on
    monkeypatch.setattr(jax_mod, "default_backend", lambda: "tpu")
    assert _phase_top_block_enabled(64, jnp.float32)
    monkeypatch.setattr(
        precision_mod, "CONV_PRECISION", jax_mod.lax.Precision.HIGHEST
    )
    assert not _phase_top_block_enabled(64, jnp.float32)
    assert _phase_top_block_enabled(64, jnp.bfloat16)


class TestUint8Epilogue:
    """The fused uint8 serving epilogue (phase_top_block_uint8) must be
    BIT-identical to images_to_uint8 of the float output: same adds on the
    same operands in the same order, only the interleave moves to uint8."""

    def _setup(self):
        from gance_tpu.models.stylegan2 import (
            GeneratorConfig,
            broadcast_dlatents,
            init_generator_params,
            mapping_apply,
        )

        config = GeneratorConfig(resolution=64, fmap_base=1024)
        assert config.nf(config.resolution_log2 - 1) < 128  # phase-eligible
        params = init_generator_params(jax.random.PRNGKey(0), config)
        z = _rand(11, (2, config.latent_size))
        dl = broadcast_dlatents(mapping_apply(params, z, config), config)
        return config, params, dl

    @pytest.mark.parametrize("compute_dtype", [jnp.float32, jnp.bfloat16])
    @pytest.mark.parametrize("noise_mode", ["const", "none"])
    @pytest.mark.parametrize("rgb_form", ["split", "blockdiag"])
    def test_bit_identical_on_phase_path(
        self, compute_dtype, noise_mode, rgb_form, monkeypatch
    ):
        from gance_tpu.models.stylegan2 import images_to_uint8, synthesis_apply

        monkeypatch.setenv("GANCE_TPU_UINT8_RGB", rgb_form)
        config, params, dl = self._setup()
        ref = images_to_uint8(
            synthesis_apply(
                params, dl, config, noise_mode=noise_mode,
                compute_dtype=compute_dtype, phase_top_block_mode=True,
            )
        )
        got = synthesis_apply(
            params, dl, config, noise_mode=noise_mode,
            compute_dtype=compute_dtype, phase_top_block_mode=True,
            uint8_output=True,
        )
        assert got.dtype == jnp.uint8 and got.shape == (2, 64, 64, 3)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_bit_identical_random_noise(self):
        from gance_tpu.models.stylegan2 import images_to_uint8, synthesis_apply

        config, params, dl = self._setup()
        rng = jax.random.PRNGKey(3)
        ref = images_to_uint8(
            synthesis_apply(
                params, dl, config, noise_mode="random", rng=rng,
                phase_top_block_mode=True,
            )
        )
        got = synthesis_apply(
            params, dl, config, noise_mode="random", rng=rng,
            phase_top_block_mode=True, uint8_output=True,
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_standard_path_fallback(self):
        """uint8_output on the non-phase path = images_to_uint8 in-program."""
        from gance_tpu.models.stylegan2 import images_to_uint8, synthesis_apply

        config, params, dl = self._setup()
        ref = images_to_uint8(
            synthesis_apply(params, dl, config, phase_top_block_mode=False)
        )
        got = synthesis_apply(
            params, dl, config, phase_top_block_mode=False, uint8_output=True
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_phases_upsample_matches_interleaved(self):
        from gance_tpu.ops.upfirdn2d import (
            upsample2x_phases_nchw,
            upsample2x_polyphase_nchw,
        )

        x = _rand(7, (2, 3, 9, 13))
        root = resample_root(RK)
        fine = upsample2x_polyphase_nchw(x, root)
        phases = upsample2x_phases_nchw(x, root)
        for index, (i, j) in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
            np.testing.assert_array_equal(
                np.asarray(phases[index]), np.asarray(fine[:, :, i::2, j::2])
            )
