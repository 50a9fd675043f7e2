"""
Non-circular .pkl weight-compat proof.

The fixture below hand-authors the REAL NVlabs StyleGAN2 pickle layout from the
published format — (G, D, Gs) `dnnlib.tflib.network.Network` triple, version-4
state dicts (name / static_kwargs EasyDict / components / build_module_src /
build_func_name / variables list), TF variable names and TF array layouts
(NCHW const, (1,1,H,W) noise buffers, NCHW-flatten Dense0 rows), `lod`-style
extra variables, pickle protocol 4 (NVlabs misc.save_pkl used
HIGHEST_PROTOCOL on py3.6) — WITHOUT touching the repo's save-side writer
(`save_generator_pickle`), so a naming or transpose error in the loader can no
longer pass via shared assumptions. Reference contract:
network_functions.py:93-111 (pickle.load(f)[2] = Gs) and :160-168.
"""

import pickle
import sys
import types
from typing import Any, Dict, List, Tuple

import jax.numpy as jnp
import numpy as np
import pytest

from gance_tpu.models.pickle_loader import (
    discriminator_params_from_captured,
    load_generator,
    read_network_pickle,
)
from gance_tpu.models.stylegan2 import (
    discriminator_apply,
    generator_apply,
    synthesis_apply,
    broadcast_dlatents,
)

# ---------------------------------------------------------------------------
# Hand-authored dnnlib surface (a test-local mirror of the NVlabs classes; NOT
# imported from gance_tpu.models.pickle_loader).
# ---------------------------------------------------------------------------


class _NvlabsEasyDict(dict):
    """Pickles under dnnlib.EasyDict like the real class (a plain dict subclass)."""


class _NvlabsNetwork:
    """Pickles under dnnlib.tflib.network.Network with a version-4 state dict."""

    def __init__(self, state: Dict[str, Any]) -> None:
        self._state = state

    def __getstate__(self) -> Dict[str, Any]:
        return self._state

    def __setstate__(self, state: Dict[str, Any]) -> None:  # pragma: no cover
        self._state = state


def _install_test_dnnlib() -> None:
    dnnlib = types.ModuleType("dnnlib")
    tflib = types.ModuleType("dnnlib.tflib")
    network = types.ModuleType("dnnlib.tflib.network")
    _NvlabsNetwork.__module__ = "dnnlib.tflib.network"
    _NvlabsNetwork.__qualname__ = "Network"
    network.Network = _NvlabsNetwork
    _NvlabsEasyDict.__module__ = "dnnlib"
    _NvlabsEasyDict.__qualname__ = "EasyDict"
    dnnlib.EasyDict = _NvlabsEasyDict
    dnnlib.tflib = tflib
    tflib.network = network
    sys.modules["dnnlib"] = dnnlib
    sys.modules["dnnlib.tflib"] = tflib
    sys.modules["dnnlib.tflib.network"] = network


def _network_state(
    name: str,
    build_func: str,
    variables: List[Tuple[str, np.ndarray]],
    components: Dict[str, _NvlabsNetwork],
    **static_kwargs: Any,
) -> Dict[str, Any]:
    """A version-4 Network state dict exactly as dnnlib's __getstate__ emits it."""
    return {
        "version": 4,
        "name": name,
        "static_kwargs": _NvlabsEasyDict(static_kwargs),
        "components": _NvlabsEasyDict(components),
        "build_module_src": "# full networks_stylegan2.py source would be here\n"
        "def G_main(*args, **kwargs): raise RuntimeError('never executed')\n",
        "build_func_name": build_func,
        "variables": variables,
    }


# ---------------------------------------------------------------------------
# 512px / 16-style-row generator with tiny channels (config-e-shaped tree:
# blocks 4x4..512x512). Channels constant at 8 => fmap inference must still work.
# ---------------------------------------------------------------------------

RESOLUTION = 512
RES_LOG2 = 9
NUM_ROWS = 2 * RES_LOG2 - 2  # 16
C = 8  # channels everywhere
LATENT = 8


def _rng_var(rng: np.random.RandomState, *shape: int) -> np.ndarray:
    return rng.randn(*shape).astype(np.float32)


def _mod_conv_vars(
    rng: np.random.RandomState, prefix: str, kernel: int, cin: int, cout: int,
    with_noise: bool,
) -> List[Tuple[str, np.ndarray]]:
    out = [
        (f"{prefix}/weight", _rng_var(rng, kernel, kernel, cin, cout)),  # TF is HWIO
        (f"{prefix}/mod_weight", _rng_var(rng, LATENT, cin)),
        (f"{prefix}/mod_bias", _rng_var(rng, cin)),
        (f"{prefix}/bias", _rng_var(rng, cout)),
    ]
    if with_noise:
        out.append((f"{prefix}/noise_strength", np.float32(rng.randn() * 0.1)))
    return out


def _author_generator_states(
    rng: np.random.RandomState, include_noise: bool
) -> Dict[str, Any]:
    mapping_vars: List[Tuple[str, np.ndarray]] = []
    fan_in = LATENT
    for i in range(2):
        mapping_vars.append((f"Dense{i}/weight", _rng_var(rng, fan_in, LATENT)))
        mapping_vars.append((f"Dense{i}/bias", _rng_var(rng, LATENT)))
        fan_in = LATENT
    # extra variable a labeled-condition network would carry: must be tolerated
    mapping_vars.append(("LabelConcat/weight", _rng_var(rng, 4, LATENT)))

    synthesis_vars: List[Tuple[str, np.ndarray]] = [
        # TF stores the const NCHW
        ("4x4/Const/const", _rng_var(rng, 1, C, 4, 4)),
    ]
    synthesis_vars += _mod_conv_vars(rng, "4x4/Conv", 3, C, C, True)
    synthesis_vars += _mod_conv_vars(rng, "4x4/ToRGB", 1, C, 3, False)
    for res in range(3, RES_LOG2 + 1):
        block = f"{2 ** res}x{2 ** res}"
        synthesis_vars += _mod_conv_vars(rng, f"{block}/Conv0_up", 3, C, C, True)
        synthesis_vars += _mod_conv_vars(rng, f"{block}/Conv1", 3, C, C, True)
        synthesis_vars += _mod_conv_vars(rng, f"{block}/ToRGB", 1, C, 3, False)
    if include_noise:
        for layer_idx in range(NUM_ROWS - 1):
            size = 2 ** ((layer_idx + 5) // 2)
            synthesis_vars.append(
                # TF stores noise buffers (1, 1, H, W)
                (f"noise{layer_idx}", _rng_var(rng, 1, 1, size, size))
            )
    # progressive-growing-era leftover some checkpoints carry: must be ignored
    synthesis_vars.append(("lod", np.float32(0.0)))

    mapping = _NvlabsNetwork(
        _network_state(
            "G_mapping", "G_mapping", mapping_vars, {},
            latent_size=LATENT, dlatent_size=LATENT, mapping_layers=2,
        )
    )
    synthesis = _NvlabsNetwork(
        _network_state(
            "G_synthesis", "G_synthesis_stylegan2", synthesis_vars, {},
            resolution=RESOLUTION,
        )
    )
    top_vars: List[Tuple[str, np.ndarray]] = [
        ("lod", np.float32(0.0)),  # extra top-level var: ignored
        ("dlatent_avg", _rng_var(rng, LATENT)),
    ]
    return _network_state(
        "Gs", "G_main", top_vars,
        {"mapping": mapping, "synthesis": synthesis},
        truncation_psi=0.5, randomize_noise=False,
    )


def _author_discriminator_state(rng: np.random.RandomState) -> Dict[str, Any]:
    d_vars: List[Tuple[str, np.ndarray]] = [
        (f"{RESOLUTION}x{RESOLUTION}/FromRGB/weight", _rng_var(rng, 1, 1, 3, C)),
        (f"{RESOLUTION}x{RESOLUTION}/FromRGB/bias", _rng_var(rng, C)),
    ]
    for res in range(RES_LOG2, 2, -1):
        block = f"{2 ** res}x{2 ** res}"
        d_vars += [
            (f"{block}/Conv0/weight", _rng_var(rng, 3, 3, C, C)),
            (f"{block}/Conv0/bias", _rng_var(rng, C)),
            (f"{block}/Conv1_down/weight", _rng_var(rng, 3, 3, C, C)),
            (f"{block}/Conv1_down/bias", _rng_var(rng, C)),
            (f"{block}/Skip/weight", _rng_var(rng, 1, 1, C, C)),
        ]
    d_vars += [
        ("4x4/Conv/weight", _rng_var(rng, 3, 3, C + 1, C)),  # +1 mbstd feature
        ("4x4/Conv/bias", _rng_var(rng, C)),
        ("4x4/Dense0/weight", _rng_var(rng, C * 16, C)),
        ("4x4/Dense0/bias", _rng_var(rng, C)),
        ("Output/weight", _rng_var(rng, C, 1)),
        ("Output/bias", _rng_var(rng, 1)),
    ]
    return _network_state("D", "D_stylegan2", d_vars, {}, resolution=RESOLUTION)


@pytest.fixture(scope="module")
def nvlabs_pickle(tmp_path_factory):
    """(G, D, Gs) triple pickled exactly as NVlabs' misc.save_pkl would emit it."""
    _install_test_dnnlib()
    rng = np.random.RandomState(1234)
    gs = _NvlabsNetwork(_author_generator_states(rng, include_noise=True))
    g = _NvlabsNetwork(_author_generator_states(rng, include_noise=True))
    d = _NvlabsNetwork(_author_discriminator_state(rng))
    path = tmp_path_factory.mktemp("nvlabs") / "network-snapshot-000000.pkl"
    with open(path, "wb") as f:
        pickle.dump((g, d, gs), f, protocol=4)  # HIGHEST_PROTOCOL on py3.6
    return path


@pytest.fixture(scope="module")
def nvlabs_pickle_no_noise(tmp_path_factory):
    """Same layout but without per-layer noise buffers (loader tolerance)."""
    _install_test_dnnlib()
    rng = np.random.RandomState(4321)
    gs = _NvlabsNetwork(_author_generator_states(rng, include_noise=False))
    path = tmp_path_factory.mktemp("nvlabs_nn") / "no_noise.pkl"
    with open(path, "wb") as f:
        pickle.dump((None, None, gs), f, protocol=4)
    return path


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------


def test_load_generator_from_hand_authored_nvlabs_pickle(nvlabs_pickle):
    params, config = load_generator(nvlabs_pickle)
    assert config.resolution == RESOLUTION
    assert config.num_style_rows == NUM_ROWS
    assert config.latent_size == LATENT
    assert config.mapping_layers == 2

    # layout conversions happened: const NCHW->NHWC, noise (1,1,H,W)->(1,H,W,1)
    assert params["synthesis"]["4x4"]["Const"]["const"].shape == (1, 4, 4, C)
    assert params["synthesis"]["noise"]["noise0"].shape == (1, 4, 4, 1)
    assert params["synthesis"]["noise"][f"noise{NUM_ROWS - 2}"].shape == (
        1, RESOLUTION, RESOLUTION, 1,
    )
    assert params["dlatent_avg"].shape == (LATENT,)

    # extra variables tolerated, not silently mistaken for real layers
    assert "lod" not in params  # top-level lod ignored
    # forward pass through the whole 512px stack produces a well-formed image
    z = np.random.RandomState(0).randn(2, LATENT).astype(np.float32)
    images = generator_apply(params, jnp.asarray(z), config, truncation_psi=0.7)
    assert images.shape == (2, RESOLUTION, RESOLUTION, 3)
    assert np.isfinite(np.asarray(images)).all()


def test_const_and_noise_transposes_preserve_values(nvlabs_pickle):
    """The conversions must be pure transposes of the authored TF arrays."""
    nets = read_network_pickle(nvlabs_pickle)
    gs = nets.generator_ema
    params, _ = load_generator(nvlabs_pickle)

    tf_vars = dict(gs.components["synthesis"].variables)
    np.testing.assert_array_equal(
        params["synthesis"]["4x4"]["Const"]["const"],
        np.transpose(tf_vars["4x4/Const/const"], (0, 2, 3, 1)),
    )
    np.testing.assert_array_equal(
        params["synthesis"]["noise"]["noise3"],
        np.transpose(tf_vars["noise3"], (0, 2, 3, 1)),
    )
    # HWIO conv weights pass through untouched
    np.testing.assert_array_equal(
        params["synthesis"]["64x64"]["Conv0_up"]["weight"],
        tf_vars["64x64/Conv0_up/weight"],
    )
    # mapping weights pass through untouched
    tf_mapping = dict(gs.components["mapping"].variables)
    np.testing.assert_array_equal(
        params["mapping"]["Dense1"]["weight"], tf_mapping["Dense1/weight"]
    )


def test_triple_ordering_matches_reference_contract(nvlabs_pickle):
    """Element 2 is Gs (the EMA generator the reference loads), element 1 is D."""
    nets = read_network_pickle(nvlabs_pickle)
    assert nets.generator is not None and nets.generator.name == "Gs"
    assert nets.discriminator is not None and nets.discriminator.name == "D"
    assert nets.generator_ema is not None and nets.generator_ema.name == "Gs"
    # static_kwargs survived as a plain mapping
    assert nets.generator_ema.static_kwargs["truncation_psi"] == 0.5


def test_missing_noise_buffers_tolerated(nvlabs_pickle_no_noise):
    params, config = load_generator(nvlabs_pickle_no_noise)
    assert params["synthesis"].get("noise", {}) == {}
    w = np.random.RandomState(1).randn(1, LATENT).astype(np.float32)
    dlatents = broadcast_dlatents(jnp.asarray(w), config)
    # const-noise mode simply skips injection when buffers are absent
    images = synthesis_apply(params, dlatents, config, noise_mode="const")
    assert images.shape == (1, RESOLUTION, RESOLUTION, 3)
    assert np.isfinite(np.asarray(images)).all()


def test_discriminator_conversion_and_forward(nvlabs_pickle):
    nets = read_network_pickle(nvlabs_pickle)
    d_params = discriminator_params_from_captured(nets.discriminator)
    _, config = load_generator(nvlabs_pickle)

    # Dense0 row permutation invariant: TF flattens NCHW, we flatten NHWC; the
    # converted weight must produce identical dense outputs for the same tensor.
    tf_dense0 = dict(nets.discriminator.variables)["4x4/Dense0/weight"]
    ours_dense0 = d_params["4x4"]["Dense0"]["weight"]
    rng = np.random.RandomState(7)
    x_nhwc = rng.randn(3, 4, 4, C).astype(np.float32)
    x_nchw = np.transpose(x_nhwc, (0, 3, 1, 2))
    out_tf = x_nchw.reshape(3, -1) @ tf_dense0
    out_ours = x_nhwc.reshape(3, -1) @ ours_dense0
    np.testing.assert_allclose(out_ours, out_tf, rtol=1e-5)

    # full D forward on the converted tree
    images = rng.randn(2, RESOLUTION, RESOLUTION, 3).astype(np.float32)
    logits = discriminator_apply(d_params, jnp.asarray(images), config)
    assert logits.shape == (2, 1)
    assert np.isfinite(np.asarray(logits)).all()
