"""
Network-parallel serving: N networks resident on N device groups at once
(gance_tpu/parallel/network_parallel.py — the SURVEY §2.10 "one network per
device" mode replacing the reference's kill-and-respawn network switch,
network_visualization.py:653-674).

Equality bar: the sharded all-networks program must match the plain
single-device per-network render to within ONE uint8 quantization step on a
small fraction of pixels. Bit-exactness is NOT granted: XLA picks different
conv tilings for different batch shapes (serial batch-1 vs grouped batch-G vs
per-device batch-G/data), which legally reassociates the fp reduction — the
same slack the golden-image phase test documents (tests/test_golden_image.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gance_tpu.models.stylegan2 import (
    GeneratorConfig,
    generator_apply,
    images_to_uint8,
    init_generator_params,
    synthesis_apply,
)
from gance_tpu.parallel.network_parallel import (
    NetworkParallelSynthesis,
    create_network_mesh,
    stack_network_params,
)

CONFIG = GeneratorConfig(
    resolution=32, fmap_base=512, fmap_max=64, latent_size=512,
    dlatent_size=512, mapping_layers=2, mapping_fmaps=512,
)
N_NETWORKS = 4


@pytest.fixture(scope="module")
def params_list():
    return [
        init_generator_params(jax.random.PRNGKey(i), CONFIG)
        for i in range(N_NETWORKS)
    ]


def _assert_quantization_parity(got: np.ndarray, want: np.ndarray) -> None:
    """<=1 uint8 step everywhere, and only a small fraction of pixels flip."""
    assert got.shape == want.shape and got.dtype == want.dtype
    diff = np.abs(got.astype(np.int64) - want.astype(np.int64))
    assert int(diff.max()) <= 1, f"max diff {diff.max()} exceeds quantization"
    flipped = int((diff > 0).sum())
    assert flipped <= max(1, got.size // 100), f"{flipped}/{got.size} pixels flipped"


def _serial_reference(params_list, frame_data, network_indices):
    """Plain single-device render, one frame at a time, in stream order."""
    out = []
    for frame, index in zip(frame_data, network_indices):
        batch = jnp.asarray(frame)[None]
        if batch.ndim == 2:  # (1, 512) z
            images = generator_apply(
                params_list[index], batch, CONFIG, truncation_psi=1.2,
                noise_mode="const",
            )
        else:  # (1, rows, 512) dlatents
            images = synthesis_apply(
                params_list[index], batch, CONFIG, noise_mode="const"
            )
        out.append(np.asarray(images_to_uint8(images))[0])
    return np.stack(out)


def test_mesh_uses_divisible_device_prefix():
    mesh = create_network_mesh(3)  # 8 virtual devices -> 3x2 grid, 2 unused
    assert mesh.shape == {"network": 3, "data": 2}
    mesh = create_network_mesh(4)
    assert mesh.shape == {"network": 4, "data": 2}
    with pytest.raises(ValueError, match="at least"):
        create_network_mesh(16)


def test_stack_rejects_mismatched_architectures(params_list):
    other = init_generator_params(
        jax.random.PRNGKey(9),
        GeneratorConfig(
            resolution=64, fmap_base=512, fmap_max=64, latent_size=512,
            dlatent_size=512, mapping_layers=2, mapping_fmaps=512,
        ),
    )
    with pytest.raises(ValueError, match="different param structure"):
        stack_network_params([params_list[0], other])


def test_z_stream_matches_serial_within_quantization(params_list):
    serving = NetworkParallelSynthesis(params_list, CONFIG, truncation_psi=1.2)
    rng = np.random.RandomState(0)
    frames = rng.randn(30, CONFIG.latent_size).astype(np.float32)
    indices = rng.randint(0, N_NETWORKS, size=30)
    got = serving.synthesize(frames, indices, batch_size=8)
    want = _serial_reference(params_list, frames, indices)
    _assert_quantization_parity(got, want)


def test_matrix_stream_matches_serial_within_quantization(params_list):
    serving = NetworkParallelSynthesis(params_list, CONFIG)
    rows = CONFIG.num_style_rows
    rng = np.random.RandomState(1)
    frames = rng.randn(12, rows, CONFIG.dlatent_size).astype(np.float32)
    indices = rng.randint(0, N_NETWORKS, size=12)
    got = serving.synthesize(frames, indices, batch_size=8)
    want = _serial_reference(params_list, frames, indices)
    _assert_quantization_parity(got, want)


def test_imbalanced_indices_and_multi_round_dispatch(params_list):
    """All frames on one network forces the worst-case imbalance AND, with a
    tiny batch_size, the multi-round path — results must still be exact."""
    serving = NetworkParallelSynthesis(params_list, CONFIG, truncation_psi=1.2)
    rng = np.random.RandomState(2)
    frames = rng.randn(13, CONFIG.latent_size).astype(np.float32)
    indices = np.full((13,), 2)
    got = serving.synthesize(frames, indices, batch_size=1)  # cap 2/round -> 7 rounds
    want = _serial_reference(params_list, frames, indices)
    _assert_quantization_parity(got, want)


def test_single_network_degenerates_to_data_parallel(params_list):
    serving = NetworkParallelSynthesis(params_list[:1], CONFIG, truncation_psi=1.2)
    assert serving.mesh.shape == {"network": 1, "data": 8}
    rng = np.random.RandomState(3)
    frames = rng.randn(9, CONFIG.latent_size).astype(np.float32)
    got = serving.synthesize(frames, batch_size=4)
    want = _serial_reference(params_list[:1], frames, np.zeros((9,), int))
    _assert_quantization_parity(got, want)


def test_index_validation(params_list):
    serving = NetworkParallelSynthesis(params_list, CONFIG)
    frames = np.zeros((3, CONFIG.latent_size), np.float32)
    with pytest.raises(ValueError, match="out of range"):
        serving.synthesize(frames, np.array([0, 1, 7]))
    with pytest.raises(ValueError, match="shape"):
        serving.synthesize(frames, np.array([0, 1]))


def test_empty_input(params_list):
    serving = NetworkParallelSynthesis(params_list, CONFIG)
    out = serving.synthesize(np.zeros((0, CONFIG.latent_size), np.float32))
    assert out.shape == (0, CONFIG.resolution, CONFIG.resolution, 3)


def test_multinetwork_network_parallel_stream(tmp_path):
    """MultiNetwork(network_parallel=True): the stream surface routes whole
    windows through the all-networks SPMD program and matches the default
    resident-network stream within uint8 quantization; the single-image compat
    surface works through the member views."""
    from gance_tpu.models.pickle_loader import save_generator_pickle
    from gance_tpu.synthesis.runtime import MultiNetwork

    paths = []
    for i in range(4):
        p = tmp_path / f"{i}_net.pkl"
        save_generator_pickle(
            init_generator_params(jax.random.PRNGKey(i), CONFIG), p
        )
        paths.append(p)

    rng = np.random.RandomState(4)
    frames = rng.randn(21, CONFIG.latent_size).astype(np.float32)
    indices = rng.randint(0, 4, size=21)

    with MultiNetwork(paths, network_parallel=True) as np_mode:
        got = np_mode.synthesize_all(frames, indices, batch_size=4, lookahead=2)
        one = np_mode.indexed_create_image_vector(1, frames[0])
        assert np_mode.expected_vector_length == CONFIG.latent_size
        assert np_mode.network(2).resolution == CONFIG.resolution
    with MultiNetwork(paths) as plain:
        want = plain.synthesize_all(frames, indices, batch_size=4, lookahead=2)
        one_want = plain.indexed_create_image_vector(1, frames[0])

    _assert_quantization_parity(got, want)
    _assert_quantization_parity(one, one_want)


def test_multinetwork_placement_flags_mutually_exclusive(tmp_path):
    from gance_tpu.synthesis.runtime import MultiNetwork

    with pytest.raises(ValueError, match="mutually exclusive"):
        MultiNetwork([tmp_path / "x.pkl"], device_per_network=True, network_parallel=True)


def test_pipeline_guard_degrades_when_devices_short(monkeypatch):
    """More networks than devices -> the pipelines fall back loudly instead of
    crashing inside mesh construction."""
    from gance_tpu.pipelines.noise_blend import _check_network_parallel

    assert _check_network_parallel(True, [object()] * 4) is True  # 8 devices
    assert _check_network_parallel(True, [object()] * 9) is False
    assert _check_network_parallel(False, [object()] * 2) is False


def test_output_side_length_fused(params_list):
    serving = NetworkParallelSynthesis(
        params_list, CONFIG, truncation_psi=1.2, output_side_length=16
    )
    rng = np.random.RandomState(5)
    frames = rng.randn(8, CONFIG.latent_size).astype(np.float32)
    out = serving.synthesize(frames, np.arange(8) % 4, batch_size=4)
    assert out.shape == (8, 16, 16, 3)


def test_phase_top_block_under_network_parallel(params_list):
    """The production polyphase top block must survive shard_map over the
    'network' axis: phase-on output matches the standard path within uint8
    quantization (same bound as tests/test_golden_image.py)."""
    rng = np.random.RandomState(6)
    frames = rng.randn(16, CONFIG.latent_size).astype(np.float32)
    indices = rng.randint(0, N_NETWORKS, size=16)
    phase_on = NetworkParallelSynthesis(
        params_list, CONFIG, truncation_psi=1.2, phase_top_block_mode=True
    ).synthesize(frames, indices, batch_size=4)
    standard = NetworkParallelSynthesis(
        params_list, CONFIG, truncation_psi=1.2, phase_top_block_mode=False
    ).synthesize(frames, indices, batch_size=4)
    _assert_quantization_parity(phase_on, standard)


def test_pipeline_placement_conflict_errors():
    """Conflicting placement flags must ERROR (the CLI help promises mutual
    exclusion); only insufficient-device cases degrade."""
    from gance_tpu.pipelines.noise_blend import _resolve_placement

    with pytest.raises(ValueError, match="mutually exclusive"):
        _resolve_placement(2, True, False, [object()] * 2)
    with pytest.raises(ValueError, match="mutually exclusive"):
        _resolve_placement(None, True, True, [object()] * 2)
    mesh, dpn, npar = _resolve_placement(None, False, True, [object()] * 2)
    assert mesh is None and not dpn and npar


def test_stacking_stays_on_host(params_list):
    """stack_network_params must not commit the full N-network stack to one
    device (the mode exists so no chip holds all N param sets)."""
    from gance_tpu.parallel.network_parallel import stack_network_params

    stacked = stack_network_params(params_list)
    assert all(isinstance(leaf, np.ndarray) for leaf in jax.tree.leaves(stacked))
