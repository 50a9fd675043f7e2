"""
StyleGAN2 model tests on a tiny config (32px) — shapes, determinism, truncation
algebra, uint8 epilogue, discriminator forward, config inference.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gance_tpu.models.stylegan2 import (
    GeneratorConfig,
    broadcast_dlatents,
    config_from_params,
    discriminator_apply,
    generator_apply,
    images_to_uint8,
    init_discriminator_params,
    init_generator_params,
    mapping_apply,
    minibatch_stddev,
    synthesis_apply,
    truncate_dlatents,
)

TINY = GeneratorConfig(resolution=32, fmap_base=512, fmap_max=64, latent_size=32,
                       dlatent_size=32, mapping_layers=2, mapping_fmaps=32)


@pytest.fixture(scope="module")
def g_params():
    return init_generator_params(jax.random.PRNGKey(0), TINY)


def test_num_style_rows():
    assert GeneratorConfig(resolution=1024).num_style_rows == 18
    assert TINY.num_style_rows == 8


def test_mapping_shapes_and_determinism(g_params):
    z = jax.random.normal(jax.random.PRNGKey(1), (4, TINY.latent_size))
    w1 = mapping_apply(g_params, z, TINY)
    w2 = mapping_apply(g_params, z, TINY)
    assert w1.shape == (4, TINY.dlatent_size)
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))


def test_synthesis_shapes(g_params):
    dl = jax.random.normal(jax.random.PRNGKey(2), (3, TINY.num_style_rows, TINY.dlatent_size))
    img = synthesis_apply(g_params, dl, TINY)
    assert img.shape == (3, 32, 32, 3)
    assert img.dtype == jnp.float32
    assert bool(jnp.all(jnp.isfinite(img)))


def test_generator_end_to_end(g_params):
    z = jax.random.normal(jax.random.PRNGKey(3), (2, TINY.latent_size))
    img = generator_apply(g_params, z, TINY, truncation_psi=1.2)
    assert img.shape == (2, 32, 32, 3)
    # different z -> different images
    z2 = jax.random.normal(jax.random.PRNGKey(4), (2, TINY.latent_size))
    img2 = generator_apply(g_params, z2, TINY, truncation_psi=1.2)
    assert not np.allclose(np.asarray(img), np.asarray(img2))


def test_noise_modes(g_params):
    dl = jax.random.normal(jax.random.PRNGKey(5), (1, TINY.num_style_rows, TINY.dlatent_size))
    img_const1 = synthesis_apply(g_params, dl, TINY, noise_mode="const")
    img_const2 = synthesis_apply(g_params, dl, TINY, noise_mode="const")
    np.testing.assert_array_equal(np.asarray(img_const1), np.asarray(img_const2))
    img_rand = synthesis_apply(
        g_params, dl, TINY, noise_mode="random", rng=jax.random.PRNGKey(6)
    )
    assert img_rand.shape == img_const1.shape


def test_truncation_algebra():
    avg = jnp.ones((8,)) * 2.0
    w = jnp.ones((1, 4, 8)) * 4.0
    out = truncate_dlatents(w, avg, psi=0.5)
    np.testing.assert_allclose(np.asarray(out), 3.0)
    # psi > 1 expands (the reference's 1.2 setting)
    out = truncate_dlatents(w, avg, psi=2.0)
    np.testing.assert_allclose(np.asarray(out), 6.0)
    # cutoff: rows >= cutoff untouched
    out = truncate_dlatents(w, avg, psi=0.5, cutoff=2)
    np.testing.assert_allclose(np.asarray(out)[0, :2], 3.0)
    np.testing.assert_allclose(np.asarray(out)[0, 2:], 4.0)


def test_images_to_uint8():
    imgs = jnp.array([[[[-1.0, 0.0, 1.0]]]])
    out = images_to_uint8(imgs)
    assert out.dtype == jnp.uint8
    # TF's convert_images_to_uint8: x*127.5 + 128 then truncate -> 0.0 maps to 128.
    np.testing.assert_array_equal(np.asarray(out)[0, 0, 0], [0, 128, 255])
    # out-of-range values clamp
    out = images_to_uint8(jnp.array([[[[-5.0, 5.0, 0.5]]]]))
    np.testing.assert_array_equal(np.asarray(out)[0, 0, 0], [0, 255, 191])


def test_minibatch_stddev_constant_batch():
    # identical samples -> stddev feature exactly 0
    x = jnp.ones((4, 4, 4, 8))
    y = minibatch_stddev(x, group_size=4)
    assert y.shape == (4, 4, 4, 9)
    np.testing.assert_allclose(np.asarray(y[..., -1]), 0.0, atol=1e-4)


def test_discriminator_forward(g_params):
    d_params = init_discriminator_params(jax.random.PRNGKey(7), TINY)
    imgs = jax.random.normal(jax.random.PRNGKey(8), (4, 32, 32, 3))
    logits = discriminator_apply(d_params, imgs, TINY)
    assert logits.shape == (4, 1)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_config_from_params(g_params):
    cfg = config_from_params(g_params)
    assert cfg.resolution == 32
    assert cfg.latent_size == 32
    assert cfg.mapping_layers == 2
    assert cfg.nf(1) == TINY.nf(1)


def test_broadcast(g_params):
    w = jnp.arange(64.0).reshape(2, 32)
    dl = broadcast_dlatents(w, TINY)
    assert dl.shape == (2, 8, 32)
    np.testing.assert_array_equal(np.asarray(dl[:, 0]), np.asarray(dl[:, 7]))
