"""
Real-hardware integration tests, the TPU analog of the reference's @gpu suite
(reference test/test_network_functions.py:102-119 and test_projection_file.py:
36-170: load a real network, synthesize, project, check convergence). Opt-in:

    GANCE_TPU_HW_TESTS=1 python -m pytest tests/ -m tpu -q

Without the env var these are skipped (and the regular suite keeps forcing the
virtual-CPU backend — see conftest.py). Small configs keep the remote-compile
cost to a couple of minutes via the persistent cache; run ONE pytest process at
a time against a tunneled TPU (concurrent remote compiles can 500).
"""

import os

import numpy as np
import pytest

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        os.environ.get("GANCE_TPU_HW_TESTS") != "1",
        reason="hardware tests are opt-in: set GANCE_TPU_HW_TESTS=1",
    ),
]

def _small_config():
    # Constructed per-call so CPU-only collection never imports the models.
    from gance_tpu.models.stylegan2 import GeneratorConfig

    return GeneratorConfig(
        resolution=64, fmap_base=1024, fmap_max=64, latent_size=512,
        dlatent_size=512, mapping_layers=2, mapping_fmaps=512,
    )


@pytest.fixture(scope="module")
def tpu_device():
    import jax

    device = jax.devices()[0]
    if device.platform == "cpu":
        pytest.skip("no TPU visible in this process")
    return device


@pytest.fixture(scope="module")
def small_network(tmp_path_factory, tpu_device):
    import jax

    from gance_tpu.models.pickle_loader import save_generator_pickle
    from gance_tpu.models.stylegan2 import init_generator_params

    config = _small_config()
    params = init_generator_params(jax.random.PRNGKey(7), config)
    path = tmp_path_factory.mktemp("hw") / "net.pkl"
    save_generator_pickle(params, path)
    return path


def test_synthesis_on_tpu(tpu_device, small_network):
    """pkl -> device -> uint8 NHWC frames; deterministic across calls
    (reference test_network_functions.py:102-119's shape/sum/clean-stop)."""
    from gance_tpu.synthesis.runtime import SynthesisNetwork

    network = SynthesisNetwork.from_pkl(small_network)
    assert network.expected_vector_length == 512
    vectors = np.random.RandomState(0).standard_normal((4, 512)).astype(np.float32)
    images = network.images_from_vectors(vectors)
    assert images.shape == (4, 64, 64, 3)
    assert images.dtype == np.uint8
    assert int(images.sum()) > 0
    again = network.images_from_vectors(vectors)
    np.testing.assert_array_equal(images, again)


def test_projection_converges_on_tpu(tpu_device, small_network):
    """Short LPIPS projection on the chip: the projected distance beats the
    w_avg starting point and per-step latents stream through the callback
    (reference test_projection_file.py's convergence property, scaled down)."""
    import jax.numpy as jnp

    from gance_tpu.models.pickle_loader import load_generator
    from gance_tpu.models.stylegan2 import generator_apply, images_to_uint8
    from gance_tpu.projection.lpips import downsample_to, lpips_distance
    from gance_tpu.projection.projector import ProjectorSettings, TPUProjector

    import jax

    params, config = load_generator(small_network)
    settings = ProjectorSettings(
        num_steps=6, dlatent_avg_samples=256, perceptual_size=64,
    )
    projector = TPUProjector(
        params, config, settings=settings, expected_time_per_step=None
    )
    # a generator-produced target is reachable, so distance must drop
    z = jax.random.normal(jax.random.PRNGKey(3), (1, config.latent_size))
    target = np.asarray(images_to_uint8(generator_apply(params, z, config)))[0]

    target_f = jnp.asarray(target, jnp.float32)[None] / 127.5 - 1.0
    start_img = projector._synthesis_from_w(
        projector.dlatent_avg,
        [
            jnp.asarray(params["synthesis"]["noise"][n])
            for n in projector._noise_names
        ],
    )
    start_dist = float(
        lpips_distance(
            projector._perceptual_params,
            downsample_to(start_img, settings.perceptual_size),
            downsample_to(target_f, settings.perceptual_size),
        )[0]
    )

    steps = []
    result = projector.project(
        target,
        step_callback=lambda s, lat, noi, img: steps.append(s),
        want_step_images=False,
    )
    assert steps == list(range(6))
    assert result.final_latents.shape == (1, config.num_style_rows, 512)
    assert np.array_equal(result.final_latents[0, 0], result.final_latents[0, -1])
    assert np.isfinite(result.final_distance)
    assert result.final_distance < start_dist

def test_train_step_on_tpu(tpu_device):
    """The full config-f objective (D w/ lazy R1, G w/ lazy path-length reg,
    style mixing, w_avg tracking, EMA) executes on the chip: finite losses,
    both regularizers fire, params and the running stats move. Tiny config
    bounds the remote-compile cost (the second-order PL graph is included)."""
    import jax

    from gance_tpu.models.stylegan2 import GeneratorConfig
    from gance_tpu.parallel.training import (
        TrainingConfig,
        init_training_state,
        make_train_step,
    )

    config = GeneratorConfig(
        resolution=32, fmap_base=512, fmap_max=32, latent_size=64,
        dlatent_size=64, mapping_layers=2, mapping_fmaps=64,
    )
    train_config = TrainingConfig(r1_interval=1, pl_interval=1)
    with jax.default_device(jax.devices("cpu")[0]):
        state = init_training_state(jax.random.PRNGKey(0), config, train_config)
    state = jax.device_put(state, tpu_device)
    step = make_train_step(config, train_config)

    reals = (
        np.random.RandomState(0).rand(4, 32, 32, 3).astype(np.float32) * 2 - 1
    )
    weight_before = np.asarray(state.g_params["mapping"]["Dense0"]["weight"]).copy()
    for i in range(2):
        state, metrics = step(state, reals, jax.random.PRNGKey(5 + i))
    m = {k: float(v) for k, v in metrics.items()}
    assert np.isfinite(m["d_loss"]) and np.isfinite(m["g_loss"]), m
    assert m["r1"] > 0.0 and m["pl"] > 0.0, m
    assert int(state.step) == 2
    assert float(state.pl_mean) > 0.0
    assert np.any(np.asarray(state.g_params["dlatent_avg"]) != 0.0)
    weight_after = np.asarray(state.g_params["mapping"]["Dense0"]["weight"])
    assert not np.allclose(weight_before, weight_after)
