"""
Pickle loader roundtrip: params -> NVlabs-format .pkl -> params, with identical
synthesis output. Also covers network discovery / CLI path merging.
"""

import json
import pickle

import jax
import numpy as np
import pytest

from gance_tpu.models.pickle_loader import (
    load_generator,
    parse_network_paths,
    read_network_pickle,
    save_generator_pickle,
    sorted_networks_in_directory,
)
from gance_tpu.models.stylegan2 import (
    GeneratorConfig,
    generator_apply,
    init_generator_params,
)

TINY = GeneratorConfig(resolution=16, fmap_base=256, fmap_max=32, latent_size=16,
                       dlatent_size=16, mapping_layers=2, mapping_fmaps=16)


@pytest.fixture(scope="module")
def pkl_path(tmp_path_factory):
    params = init_generator_params(jax.random.PRNGKey(42), TINY)
    path = tmp_path_factory.mktemp("nets") / "tiny_network.pkl"
    save_generator_pickle(params, path)
    return path, params


def test_roundtrip_structure(pkl_path):
    path, _ = pkl_path
    nets = read_network_pickle(path)
    assert nets.generator_ema is not None
    comps = nets.generator_ema.components
    assert set(comps) == {"mapping", "synthesis"}
    assert "dlatent_avg" in nets.generator_ema.variables


def test_roundtrip_output_identical(pkl_path):
    path, params = pkl_path
    loaded_params, config = load_generator(path)
    assert config.resolution == 16
    assert config.num_style_rows == TINY.num_style_rows

    z = jax.random.normal(jax.random.PRNGKey(1), (2, TINY.latent_size))
    img_orig = np.asarray(generator_apply(params, z, TINY, truncation_psi=1.2))
    img_loaded = np.asarray(generator_apply(loaded_params, z, config, truncation_psi=1.2))
    np.testing.assert_allclose(img_orig, img_loaded, rtol=1e-6, atol=1e-6)


def test_tf_layout_in_pickle(pkl_path):
    """The on-disk format must use TF layouts (NCHW const, (1,1,H,W) noise)."""
    path, _ = pkl_path
    nets = read_network_pickle(path)
    syn_vars = nets.generator_ema.components["synthesis"].variables
    const = syn_vars["4x4/Const/const"]
    assert const.shape == (1, TINY.nf(1), 4, 4)
    noise0 = syn_vars["noise0"]
    assert noise0.shape == (1, 1, 4, 4)
    conv_w = syn_vars["4x4/Conv/weight"]
    assert conv_w.shape == (3, 3, TINY.nf(1), TINY.nf(1))  # HWIO as in TF


def test_unpickler_blocks_unknown_globals(tmp_path):
    evil = tmp_path / "evil.pkl"
    evil.write_bytes(pickle.dumps({"fn": print}))
    with pytest.raises(Exception, match="Blocked global"):
        read_network_pickle(evil)


def test_sorted_networks_in_directory(tmp_path):
    for name in ["b.pkl", "a.pkl", "c.txt", "10_x.pkl"]:
        (tmp_path / name).write_bytes(b"")
    found = sorted_networks_in_directory(tmp_path)
    assert [p.name for p in found] == ["10_x.pkl", "a.pkl", "b.pkl"]


def test_parse_network_paths(tmp_path):
    d = tmp_path / "dir"
    d.mkdir()
    (d / "n1.pkl").write_bytes(b"")
    (d / "n0.pkl").write_bytes(b"")
    extra = tmp_path / "extra.pkl"
    extra.write_bytes(b"")
    jblob = tmp_path / "nets.json"
    jblob.write_text(json.dumps({"networks": [str(extra)]}))

    paths = parse_network_paths(d, [extra], jblob)
    assert [p.name for p in paths] == ["n0.pkl", "n1.pkl", "extra.pkl", "extra.pkl"]

    with pytest.raises(ValueError):
        parse_network_paths(None, None, None)

    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps({"networks": [str(tmp_path / "missing.pkl")]}))
    with pytest.raises(ValueError, match="not a file"):
        parse_network_paths(None, None, bad)


def test_loader_tolerates_extra_variables(tmp_path):
    """Real NVlabs pickles can carry extra variables (e.g. training-era 'lod');
    the loader must ignore them gracefully."""
    import numpy as np

    from gance_tpu.models.pickle_loader import (
        captured_state_from_generator_params,
        generator_params_from_captured,
    )
    from gance_tpu.models.stylegan2 import generator_apply

    params = init_generator_params(jax.random.PRNGKey(5), TINY)
    state = captured_state_from_generator_params(params)
    # inject extra top-level + synthesis variables like a training pickle would have
    state["variables"].append(("lod", np.float32(0.0)))
    syn_state = state["components"]["synthesis"].state
    syn_state["variables"].append(("lod", np.float32(0.0)))

    captured = type(state["components"]["synthesis"])()
    captured.__setstate__(state)
    loaded = generator_params_from_captured(captured)

    z = jax.random.normal(jax.random.PRNGKey(6), (1, TINY.latent_size))
    from gance_tpu.models.stylegan2 import config_from_params

    cfg = config_from_params(loaded)
    img = generator_apply(loaded, z, cfg)
    assert img.shape == (1, 16, 16, 3)
