"""
Network quality metrics: Fréchet math against the closed-form gaussian case,
streaming moment accumulation against numpy, PPL semantics and determinism,
and the CLI surfaces end-to-end on a fabricated network.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gance_tpu.metrics.frechet import (
    FeatureMoments,
    gaussian_frechet_distance,
    pooled_vgg_features,
)
from gance_tpu.metrics.ppl import PPLResult, perceptual_path_length, slerp
from gance_tpu.models.stylegan2 import GeneratorConfig, init_generator_params
from gance_tpu.projection.lpips import random_vgg_params

MODEL = GeneratorConfig(
    resolution=32, fmap_base=256, fmap_max=32, latent_size=32,
    dlatent_size=32, mapping_layers=2, mapping_fmaps=32,
)


@pytest.fixture(scope="module")
def small_network():
    return init_generator_params(jax.random.PRNGKey(0), MODEL)


@pytest.fixture(scope="module")
def perceptual():
    return random_vgg_params(seed=0)


# ---- Fréchet math ----


def test_frechet_identical_gaussians_is_zero():
    rng = np.random.RandomState(0)
    mu = rng.randn(6)
    a = rng.randn(6, 6)
    cov = a @ a.T + np.eye(6)
    assert gaussian_frechet_distance(mu, cov, mu, cov) == pytest.approx(0.0, abs=1e-8)


def test_frechet_matches_closed_form_diagonal_case():
    # For diagonal covariances the Fréchet distance has the closed form
    # |mu_a - mu_b|^2 + sum_i (sqrt(va_i) - sqrt(vb_i))^2.
    rng = np.random.RandomState(1)
    mu_a, mu_b = rng.randn(5), rng.randn(5)
    va, vb = rng.rand(5) + 0.5, rng.rand(5) + 0.5
    expected = np.sum((mu_a - mu_b) ** 2) + np.sum((np.sqrt(va) - np.sqrt(vb)) ** 2)
    got = gaussian_frechet_distance(mu_a, np.diag(va), mu_b, np.diag(vb))
    assert got == pytest.approx(expected, rel=1e-9)


def test_feature_moments_match_numpy():
    rng = np.random.RandomState(2)
    data = rng.randn(37, 4)
    moments = FeatureMoments(dim=4)
    # stream in uneven chunks
    for chunk in np.array_split(data, [5, 9, 30]):
        moments.update(chunk)
    mu, cov = moments.finalize()
    np.testing.assert_allclose(mu, data.mean(axis=0), rtol=1e-12)
    np.testing.assert_allclose(cov, np.cov(data, rowvar=False), rtol=1e-10)


def test_feature_moments_shape_guard():
    moments = FeatureMoments(dim=3)
    with pytest.raises(ValueError):
        moments.update(np.zeros((4, 2)))
    with pytest.raises(ValueError):
        FeatureMoments(dim=3).finalize()


def test_pooled_vgg_features_shape(perceptual):
    images = jnp.zeros((2, 32, 32, 3), jnp.float32)
    feats = pooled_vgg_features(perceptual, images)
    assert feats.shape == (2, 64 + 128 + 256 + 512 + 512)


# ---- slerp / PPL ----


def test_slerp_endpoints_and_unit_norm():
    rng = np.random.RandomState(3)
    a = jnp.asarray(rng.randn(4, 8), jnp.float32)
    b = jnp.asarray(rng.randn(4, 8), jnp.float32)
    t0 = slerp(a, b, jnp.zeros((4, 1)))
    t1 = slerp(a, b, jnp.ones((4, 1)))
    unit_a = np.asarray(a / jnp.linalg.norm(a, axis=-1, keepdims=True))
    unit_b = np.asarray(b / jnp.linalg.norm(b, axis=-1, keepdims=True))
    np.testing.assert_allclose(np.asarray(t0), unit_a, atol=1e-5)
    np.testing.assert_allclose(np.asarray(t1), unit_b, atol=1e-5)
    mid = np.asarray(slerp(a, b, jnp.full((4, 1), 0.5)))
    np.testing.assert_allclose(np.linalg.norm(mid, axis=-1), 1.0, atol=1e-5)


@pytest.mark.parametrize("space", ["w", "z"])
def test_ppl_runs_and_is_deterministic(small_network, perceptual, space):
    kwargs = dict(
        num_samples=6, batch_size=4, space=space, sampling="full",
        epsilon=1e-2, seed=7,
    )
    a = perceptual_path_length(small_network, MODEL, perceptual, **kwargs)
    b = perceptual_path_length(small_network, MODEL, perceptual, **kwargs)
    assert isinstance(a, PPLResult)
    assert np.isfinite(a.ppl) and a.ppl >= 0.0
    assert a.ppl == b.ppl  # same seed, same chunking -> bitwise identical
    assert a.num_samples == 6
    assert 0 < a.num_filtered <= 6
    different_seed = perceptual_path_length(
        small_network, MODEL, perceptual, **{**kwargs, "seed": 8}
    )
    assert different_seed.ppl != a.ppl


def test_ppl_end_sampling_and_crop(small_network, perceptual):
    result = perceptual_path_length(
        small_network, MODEL, perceptual,
        num_samples=4, batch_size=4, sampling="end", crop=True, epsilon=1e-2,
    )
    assert np.isfinite(result.ppl)
    assert result.sampling == "end" and result.crop


def test_ppl_validates_options(small_network, perceptual):
    with pytest.raises(ValueError):
        perceptual_path_length(small_network, MODEL, perceptual, space="bogus")
    with pytest.raises(ValueError):
        perceptual_path_length(small_network, MODEL, perceptual, sampling="bogus")


# ---- CLI end-to-end ----


@pytest.fixture(scope="module")
def network_pkl(tmp_path_factory, small_network):
    from gance_tpu.models.pickle_loader import save_generator_pickle

    path = tmp_path_factory.mktemp("metrics") / "net.pkl"
    save_generator_pickle(small_network, path)
    return path


def test_ppl_cli(network_pkl):
    from click.testing import CliRunner

    from gance_tpu.cli.network_metrics import cli

    result = CliRunner().invoke(
        cli,
        [
            "ppl", "--network", str(network_pkl), "--num-samples", "4",
            "--batch-size", "4", "--epsilon", "1e-2",
        ],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    payload = json.loads(result.output.strip().splitlines()[-1])
    assert payload["metric"] == "ppl_w_full"
    assert np.isfinite(payload["value"])
    assert payload["perceptual"] == "random-vgg"


def test_frechet_cli_self_distance_is_small(network_pkl, tmp_path):
    """
    Feed the network's OWN samples as the 'real' folder: the two sides then
    draw from one distribution, so the Fréchet distance (noisy at tiny sample
    counts) must land far below the distance to a disjoint noise folder.
    """
    from click.testing import CliRunner
    from PIL import Image

    from gance_tpu.cli.network_metrics import cli
    from gance_tpu.models.pickle_loader import load_generator
    from gance_tpu.models.stylegan2 import generator_apply, images_to_uint8

    params, config = load_generator(network_pkl)
    z = jax.random.normal(jax.random.PRNGKey(0), (16, config.latent_size))
    samples = np.asarray(
        images_to_uint8(generator_apply(params, z, config, noise_mode="const"))
    )
    own = tmp_path / "own"
    own.mkdir()
    for i, image in enumerate(samples):
        Image.fromarray(image).save(own / f"sample_{i}.png")
    noise_dir = tmp_path / "noise"
    noise_dir.mkdir()
    rng = np.random.RandomState(5)
    for i in range(16):
        Image.fromarray(
            rng.randint(0, 255, size=(32, 32, 3), dtype=np.uint8)
        ).save(noise_dir / f"noise_{i}.png")

    def run(directory):
        result = CliRunner().invoke(
            cli,
            [
                "frechet", "--network", str(network_pkl),
                "--dataset-directory", str(directory),
                "--num-samples", "16", "--batch-size", "8",
            ],
            catch_exceptions=False,
        )
        assert result.exit_code == 0, result.output
        return json.loads(result.output.strip().splitlines()[-1])

    own_payload = run(own)
    noise_payload = run(noise_dir)
    assert own_payload["num_fake"] == own_payload["num_real"] == 16
    assert own_payload["feature_dim"] == 1472
    assert np.isfinite(own_payload["value"]) and own_payload["value"] >= 0.0
    assert own_payload["value"] < noise_payload["value"]


def test_frechet_pluggable_feature_fn(small_network, perceptual, tmp_path):
    """The extractor slot is a real parameter: a custom feature_fn replaces the
    VGG stack on BOTH streams (feature_dim follows it, distance stays sane)."""
    from PIL import Image

    from gance_tpu.metrics.frechet import frechet_distance_network_vs_images

    rng = np.random.RandomState(9)
    real = tmp_path / "real"
    real.mkdir()
    for i in range(8):
        Image.fromarray(
            rng.randint(0, 255, size=(32, 32, 3), dtype=np.uint8)
        ).save(real / f"r_{i}.png")

    def mean_rgb(params, images):  # ignores extractor params entirely
        del params
        return jnp.mean(images, axis=(1, 2))

    result = frechet_distance_network_vs_images(
        small_network,
        MODEL,
        perceptual,
        real,
        num_samples=8,
        batch_size=4,
        feature_fn=mean_rgb,
    )
    assert result["feature_dim"] == 3
    assert np.isfinite(result["distance"]) and result["distance"] >= 0.0
    assert "custom feature_fn" in result["note"]


def test_frechet_sampling_defaults_to_untruncated(small_network, perceptual, tmp_path):
    """
    FID convention (ADVICE r3): the generated side samples UNTRUNCATED by
    default — the default run must equal an explicit psi=1.0 run and differ
    from a strongly truncated one (truncation collapses diversity).
    """
    from PIL import Image

    from gance_tpu.metrics.frechet import frechet_distance_network_vs_images

    rng = np.random.RandomState(11)
    real = tmp_path / "real"
    real.mkdir()
    for i in range(8):
        Image.fromarray(
            rng.randint(0, 255, size=(32, 32, 3), dtype=np.uint8)
        ).save(real / f"r_{i}.png")

    def mean_rgb(params, images):
        del params
        return jnp.mean(images, axis=(1, 2))

    def run(**kwargs):
        return frechet_distance_network_vs_images(
            small_network, MODEL, perceptual, real,
            num_samples=8, batch_size=4, feature_fn=mean_rgb, **kwargs
        )["distance"]

    default = run()
    assert default == pytest.approx(run(truncation_psi=1.0), rel=1e-6)
    assert default != pytest.approx(run(truncation_psi=0.2), rel=1e-6)


def test_frechet_complex_sqrtm_warns(caplog):
    """A significantly complex matrix sqrt (rank-deficient / invalid
    covariances) must be flagged, not silently absorbed (ADVICE r3)."""
    import logging

    mu = np.zeros(2)
    good = np.eye(2)
    indefinite = np.diag([-1.0, 1.0])  # sqrtm(diag(-1,1)) = diag(i, 1)
    with caplog.at_level(logging.WARNING, logger="gance_tpu"):
        value = gaussian_frechet_distance(mu, good, mu, indefinite)
    assert np.isfinite(value)
    assert any("complex" in rec.message for rec in caplog.records)


def test_frechet_warns_on_rank_deficient_sample_count(
    small_network, perceptual, tmp_path, caplog
):
    """num_samples <= feature_dim gives rank-deficient covariances; the
    documented regime guard must log it (ADVICE r3)."""
    import logging

    from PIL import Image

    from gance_tpu.metrics.frechet import frechet_distance_network_vs_images

    rng = np.random.RandomState(13)
    real = tmp_path / "real"
    real.mkdir()
    for i in range(3):
        Image.fromarray(
            rng.randint(0, 255, size=(32, 32, 3), dtype=np.uint8)
        ).save(real / f"r_{i}.png")

    def mean_rgb(params, images):
        del params
        return jnp.mean(images, axis=(1, 2))

    with caplog.at_level(logging.WARNING, logger="gance_tpu"):
        result = frechet_distance_network_vs_images(
            small_network, MODEL, perceptual, real,
            num_samples=3, batch_size=4, feature_fn=mean_rgb,
        )
    assert np.isfinite(result["distance"])
    assert any("rank-deficient" in rec.message for rec in caplog.records)
