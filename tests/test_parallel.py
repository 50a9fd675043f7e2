"""
Multi-chip tests on the 8-device virtual CPU mesh: mesh construction, sharded
synthesis correctness vs single-device, and the full sharded training step
(losses finite, params move, EMA tracks, checkpoint/resume roundtrip).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gance_tpu.models.stylegan2 import GeneratorConfig, generator_apply, images_to_uint8, init_generator_params
from gance_tpu.parallel.mesh import create_mesh, generator_param_sharding
from gance_tpu.parallel.sharded_synthesis import make_sharded_synthesis
from gance_tpu.parallel.training import (
    TrainingConfig,
    init_training_state,
    load_checkpoint,
    make_train_step,
    save_checkpoint,
    shard_training_state,
)

TINY = GeneratorConfig(resolution=16, fmap_base=256, fmap_max=32, latent_size=16,
                       dlatent_size=16, mapping_layers=2, mapping_fmaps=16)
TRAIN = TrainingConfig(r1_interval=2)


def test_mesh_shapes():
    mesh = create_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data", "model")
    # default policy: pure DP (frame synthesis is embarrassingly data-parallel)
    assert mesh.shape == {"data": 8, "model": 1}
    mesh = create_mesh(n_devices=4, data_parallel=4)
    assert mesh.shape == {"data": 4, "model": 1}
    mesh = create_mesh(n_devices=8, data_parallel=4)
    assert mesh.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        create_mesh(n_devices=8, data_parallel=3)


def test_param_sharding_policy():
    params = init_generator_params(jax.random.PRNGKey(0), TINY)
    mesh = create_mesh(data_parallel=4)
    shardings = generator_param_sharding(mesh, params)
    # tiny params -> everything replicated (below the size threshold)
    leaves = jax.tree.leaves(shardings)
    assert all(s.spec == jax.sharding.PartitionSpec() for s in leaves)

    # a big config shards conv weights on the model axis
    big = GeneratorConfig(resolution=32, fmap_base=8192, fmap_max=512,
                          latent_size=512, dlatent_size=512, mapping_layers=2)
    big_params = init_generator_params(jax.random.PRNGKey(0), big)
    big_shardings = generator_param_sharding(mesh, big_params)
    conv_spec = big_shardings["synthesis"]["4x4"]["Conv"]["weight"].spec
    assert conv_spec == jax.sharding.PartitionSpec(None, None, None, "model")


def test_sharded_synthesis_matches_single_device():
    params = init_generator_params(jax.random.PRNGKey(0), TINY)
    mesh = create_mesh(data_parallel=8)
    synthesize = make_sharded_synthesis(mesh, params, TINY)
    z = jax.random.normal(jax.random.PRNGKey(1), (8, TINY.latent_size))

    sharded = np.asarray(synthesize(z))
    single = np.asarray(
        images_to_uint8(generator_apply(params, z, TINY, truncation_psi=1.2))
    )
    assert sharded.shape == (8, 16, 16, 3)
    diff = np.abs(sharded.astype(int) - single.astype(int))
    assert diff.max() <= 1  # uint8 rounding under different reduction orders


def test_sharded_synthesis_tensor_parallel():
    """dp=4 x tp=2 mesh must produce the same images as single-device."""
    params = init_generator_params(jax.random.PRNGKey(0), TINY)
    mesh = create_mesh(data_parallel=4)  # (4, 2)
    assert mesh.shape == {"data": 4, "model": 2}
    synthesize = make_sharded_synthesis(mesh, params, TINY)
    z = jax.random.normal(jax.random.PRNGKey(2), (4, TINY.latent_size))
    sharded = np.asarray(synthesize(z))
    single = np.asarray(
        images_to_uint8(generator_apply(params, z, TINY, truncation_psi=1.2))
    )
    diff = np.abs(sharded.astype(int) - single.astype(int))
    assert diff.max() <= 1


def test_train_step_runs_and_learns():
    state = init_training_state(jax.random.PRNGKey(0), TINY, TRAIN)
    mesh = create_mesh(data_parallel=4)
    state = shard_training_state(mesh, state, TRAIN)
    train_step = make_train_step(TINY, TRAIN, mesh=mesh)

    reals = jax.random.uniform(jax.random.PRNGKey(1), (8, 16, 16, 3)) * 2 - 1
    # dlatent_avg (the alphabetically-first leaf) has no gradient; check a weight.
    before = np.asarray(state.g_params["mapping"]["Dense0"]["weight"]).copy()

    metrics_log = []
    for i in range(3):
        state, metrics = train_step(state, reals, jax.random.PRNGKey(10 + i))
        metrics_log.append({k: float(v) for k, v in metrics.items()})

    assert int(state.step) == 3
    for m in metrics_log:
        assert np.isfinite(m["d_loss"]) and np.isfinite(m["g_loss"])
    # r1 applied on steps where step % interval == 0 (steps 0 and 2)
    assert metrics_log[0]["r1"] != 0.0
    assert metrics_log[1]["r1"] == 0.0
    assert metrics_log[2]["r1"] != 0.0

    after = np.asarray(state.g_params["mapping"]["Dense0"]["weight"])
    assert not np.allclose(before, after)  # G actually updated
    # EMA tracks but lags
    ema_leaf = np.asarray(state.ema_params["mapping"]["Dense0"]["weight"])
    assert not np.allclose(ema_leaf, after)


def test_train_step_mixed_precision_bf16():
    """bf16 compute_dtype: fwd/bwd run in bf16, master state stays fp32, and
    one step lands close to the fp32 step (same seeds, looser tolerance)."""
    import dataclasses

    bf16_cfg = dataclasses.replace(TRAIN, compute_dtype="bfloat16")
    mesh = create_mesh(data_parallel=4)
    reals = jax.random.uniform(jax.random.PRNGKey(1), (8, 16, 16, 3)) * 2 - 1

    results = {}
    for name, cfg in (("fp32", TRAIN), ("bf16", bf16_cfg)):
        state = init_training_state(jax.random.PRNGKey(0), TINY, cfg)
        state = shard_training_state(mesh, state, cfg)
        step = make_train_step(TINY, cfg, mesh=mesh)
        state, metrics = step(state, reals, jax.random.PRNGKey(10))
        results[name] = (state, {k: float(v) for k, v in metrics.items()})

    state_bf16, m_bf16 = results["bf16"]
    state_fp32, m_fp32 = results["fp32"]
    # master weights / Adam moments / EMA stay fp32
    for leaf in jax.tree.leaves(
        (state_bf16.g_params, state_bf16.d_params, state_bf16.ema_params)
    ):
        assert leaf.dtype == jnp.float32, leaf.dtype
    assert np.isfinite(m_bf16["d_loss"]) and np.isfinite(m_bf16["g_loss"])
    # losses in the same ballpark as the exact step (bf16 rounding only)
    assert abs(m_bf16["d_loss"] - m_fp32["d_loss"]) < 0.15, (m_bf16, m_fp32)
    assert abs(m_bf16["g_loss"] - m_fp32["g_loss"]) < 0.15, (m_bf16, m_fp32)
    w_b = np.asarray(state_bf16.g_params["mapping"]["Dense0"]["weight"])
    w_f = np.asarray(state_fp32.g_params["mapping"]["Dense0"]["weight"])
    assert np.abs(w_b - w_f).max() < 0.05  # one Adam step, lr 2e-3


def test_train_step_remat_is_numerically_identical():
    """jax.checkpoint recomputes the same ops: losses and updated params must
    match the non-remat step bit-for-bit (same seeds, same dtype)."""
    import dataclasses

    remat_cfg = dataclasses.replace(TRAIN, remat=True)
    mesh = create_mesh(data_parallel=4)
    reals = jax.random.uniform(jax.random.PRNGKey(1), (8, 16, 16, 3)) * 2 - 1

    results = {}
    for name, cfg in (("plain", TRAIN), ("remat", remat_cfg)):
        state = init_training_state(jax.random.PRNGKey(0), TINY, cfg)
        state = shard_training_state(mesh, state, cfg)
        step = make_train_step(TINY, cfg, mesh=mesh)
        state, metrics = step(state, reals, jax.random.PRNGKey(10))
        results[name] = (state, metrics)

    s_plain, m_plain = results["plain"]
    s_remat, m_remat = results["remat"]
    np.testing.assert_allclose(
        float(m_remat["d_loss"]), float(m_plain["d_loss"]), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(m_remat["g_loss"]), float(m_plain["g_loss"]), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(s_remat.g_params["mapping"]["Dense0"]["weight"]),
        np.asarray(s_plain.g_params["mapping"]["Dense0"]["weight"]),
        atol=1e-6,
    )


def test_checkpoint_resume(tmp_path):
    state = init_training_state(jax.random.PRNGKey(0), TINY, TRAIN)
    train_step = make_train_step(TINY, TRAIN)
    reals = jax.random.uniform(jax.random.PRNGKey(1), (4, 16, 16, 3)) * 2 - 1
    state, _ = train_step(state, reals, jax.random.PRNGKey(2))

    path = tmp_path / "ckpt.pkl"
    save_checkpoint(path, state)
    restored = load_checkpoint(path)
    assert int(restored.step) == 1

    # resuming produces the same next state as continuing
    cont, m1 = train_step(state, reals, jax.random.PRNGKey(3))
    res, m2 = train_step(restored, reals, jax.random.PRNGKey(3))
    np.testing.assert_allclose(float(m1["g_loss"]), float(m2["g_loss"]), rtol=1e-5)
    a = np.asarray(jax.tree.leaves(cont.g_params)[0])
    b = np.asarray(jax.tree.leaves(res.g_params)[0])
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_multi_network_over_mesh(tmp_path):
    """The production MultiNetwork serves over a mesh: params tensor-parallel,
    batches data-parallel, outputs equal to single-device within uint8 rounding."""
    from gance_tpu.models.pickle_loader import save_generator_pickle
    from gance_tpu.synthesis.runtime import MultiNetwork

    paths = []
    for i in range(2):
        params = init_generator_params(jax.random.PRNGKey(i), TINY)
        p = tmp_path / f"{i}.pkl"
        save_generator_pickle(params, p)
        paths.append(p)

    mesh = create_mesh(data_parallel=4)  # (4, 2): dp x tp
    sharded = MultiNetwork(paths, load=True, mesh=mesh)
    plain = MultiNetwork(paths, load=True)

    rng = np.random.RandomState(0)
    frames = rng.randn(8, TINY.latent_size).astype(np.float32)
    indices = np.array([0, 0, 0, 0, 1, 1, 1, 1])
    got = sharded.synthesize_all(frames, indices, batch_size=4)
    want = plain.synthesize_all(frames, indices, batch_size=4)
    assert got.shape == want.shape == (8, 16, 16, 3)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1

    # batch_size NOT divisible by the data axis (and smaller than it): the
    # stream rounds its effective batch to a data-axis multiple internally —
    # the bucket cap must never emit a shard-incompatible shape (regression:
    # _bucket_size capped at the raw batch_size, crashing device_put).
    for awkward_batch in (3, 6):
        got = sharded.synthesize_all(frames, indices, batch_size=awkward_batch)
        assert got.shape == (8, 16, 16, 3)
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 1

    # The single-frame compat surface (the reference's ImageFunction protocol)
    # must work on a mesh network: batch 1 pads to the data axis at the device
    # boundary and the pads are sliced off (regression: crashed in device_put).
    one_sharded = sharded.network(0).create_image_vector(frames[0])
    one_plain = plain.network(0).create_image_vector(frames[0])
    assert one_sharded.shape == (16, 16, 3)
    assert np.abs(one_sharded.astype(int) - one_plain.astype(int)).max() <= 1


def test_one_network_per_device_serving(tmp_path):
    """
    device_per_network places each network wholly on its own device (true DP
    over frames, SURVEY §2.10): params land on distinct devices, per-index frame
    groups compute concurrently, output matches single-device within rounding.
    """
    import jax

    from gance_tpu.models.pickle_loader import save_generator_pickle
    from gance_tpu.models.stylegan2 import init_generator_params
    from gance_tpu.synthesis.runtime import MultiNetwork

    paths = []
    for i in range(3):
        params = init_generator_params(jax.random.PRNGKey(i), TINY)
        p = tmp_path / f"{i}.pkl"
        save_generator_pickle(params, p)
        paths.append(p)

    per_device = MultiNetwork(paths, load=True, device_per_network=True)
    placements = {
        next(iter(jax.tree.leaves(per_device.network(i).params))).devices().pop()
        for i in range(3)
    }
    assert len(placements) == 3  # three distinct devices

    plain = MultiNetwork(paths, load=True)
    rng = np.random.RandomState(1)
    frames = rng.randn(9, TINY.latent_size).astype(np.float32)
    indices = np.array([0, 1, 2, 0, 1, 2, 2, 1, 0])
    got = per_device.synthesize_all(frames, indices, batch_size=4)
    want = plain.synthesize_all(frames, indices, batch_size=4)
    assert got.shape == want.shape == (9, 16, 16, 3)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1

    import pytest as _pytest

    with _pytest.raises(ValueError, match="mutually exclusive"):
        from gance_tpu.parallel.mesh import create_mesh

        MultiNetwork(paths, mesh=create_mesh(), device_per_network=True)


def test_hybrid_grid_keeps_model_axis_on_ici():
    """
    Multi-slice layout (SURVEY §2.10 distributed-backend row): the 'model' axis
    must never cross a slice boundary (per-layer collectives ride ICI) and the
    'data' axis varies slice index slowest (only the batch axis touches DCN).
    Tested against stub devices — multi-slice hardware doesn't exist here.
    """
    from dataclasses import dataclass

    from gance_tpu.parallel.mesh import _hybrid_device_grid

    @dataclass(frozen=True)
    class StubDevice:
        id: int
        slice_index: int

    devices = [StubDevice(id=s * 4 + i, slice_index=s) for s in range(2) for i in range(4)]

    grid = _hybrid_device_grid(devices, data_parallel=4, model_parallel=2)
    assert grid.shape == (4, 2)
    # every 'model' row is within one slice
    for row in grid:
        assert len({device.slice_index for device in row}) == 1
    # 'data' axis: slice 0 rows first, slice 1 rows after (slice varies slowest)
    assert [row[0].slice_index for row in grid] == [0, 0, 1, 1]

    # model axis larger than a slice must refuse (would put tp on DCN)
    with pytest.raises(ValueError, match="ICI"):
        _hybrid_device_grid(devices, data_parallel=1, model_parallel=8)

    # uneven slices refuse
    with pytest.raises(ValueError, match="Uneven"):
        _hybrid_device_grid(devices[:7], data_parallel=7, model_parallel=1)


def test_train_scan_matches_per_step():
    """
    The device-side scanned training loop must reproduce the per-step jit's
    trajectory (same batches, same host-derived per-step keys): params and
    EMA agree to fp tolerance, R1's lazy interval fires on the same steps.
    """
    from gance_tpu.parallel.training import (
        init_training_state,
        make_train_scan,
        make_train_step,
    )

    cfg = TRAIN  # module-level tiny TrainingConfig
    steps = 4
    rng = np.random.RandomState(5)
    reals = rng.rand(steps, 4, TINY.resolution, TINY.resolution, 3).astype(np.float32) * 2 - 1
    keys = np.stack([np.asarray(jax.random.PRNGKey(1000 + s)) for s in range(steps)])

    state_a = init_training_state(jax.random.PRNGKey(0), TINY, cfg)
    step_fn = make_train_step(TINY, cfg)
    metrics_a = None
    for s in range(steps):
        state_a, metrics_a = step_fn(state_a, jnp.asarray(reals[s]), jnp.asarray(keys[s]))

    state_b = init_training_state(jax.random.PRNGKey(0), TINY, cfg)
    scan_fn = make_train_scan(TINY, cfg)
    state_b, stacked = scan_fn(state_b, jnp.asarray(reals), jnp.asarray(keys))

    assert int(state_a.step) == int(state_b.step) == steps
    # final metrics of the scan = the per-step path's last metrics
    for key_name in ("d_loss", "g_loss", "r1"):
        assert abs(float(np.asarray(stacked[key_name])[-1]) - float(metrics_a[key_name])) < 1e-3
    for leaf_a, leaf_b in zip(
        jax.tree.leaves(state_a.g_params), jax.tree.leaves(state_b.g_params)
    ):
        np.testing.assert_allclose(np.asarray(leaf_a), np.asarray(leaf_b), atol=5e-4)
    for leaf_a, leaf_b in zip(
        jax.tree.leaves(state_a.ema_params), jax.tree.leaves(state_b.ema_params)
    ):
        np.testing.assert_allclose(np.asarray(leaf_a), np.asarray(leaf_b), atol=5e-4)


def test_path_length_regularization_lazy_schedule():
    """PL reg (config-f's G regularizer): applied on step % pl_interval == 0,
    penalty nonzero, pl_mean EMA advances only on applied steps."""
    import dataclasses

    cfg = dataclasses.replace(TRAIN, pl_interval=2)
    state = init_training_state(jax.random.PRNGKey(0), TINY, cfg)
    step = make_train_step(TINY, cfg)
    reals = jax.random.uniform(jax.random.PRNGKey(1), (4, 16, 16, 3)) * 2 - 1

    # NOTE: the step donates its input state, so read pl_mean BEFORE stepping on.
    s1, m1 = step(state, reals, jax.random.PRNGKey(10))  # step 0: applied
    pl_mean_1 = float(s1.pl_mean)
    assert float(m1["pl"]) > 0.0
    assert pl_mean_1 > 0.0

    s2, m2 = step(s1, reals, jax.random.PRNGKey(11))  # step 1: skipped
    pl_mean_2 = float(s2.pl_mean)
    assert float(m2["pl"]) == 0.0
    assert pl_mean_2 == pl_mean_1

    s3, m3 = step(s2, reals, jax.random.PRNGKey(12))  # step 2: applied
    pl_mean_3 = float(s3.pl_mean)
    assert float(m3["pl"]) > 0.0
    assert pl_mean_3 != pl_mean_2
    # EMA moves toward the measured lengths at pl_decay per applied step
    assert np.isfinite(pl_mean_3)


def test_path_length_disabled_statically():
    """pl_weight=0 keeps the old objective: pl metric pinned at zero, pl_mean
    never advances (and no second-order graph exists to pay for)."""
    import dataclasses

    cfg = dataclasses.replace(TRAIN, pl_weight=0.0)
    state = init_training_state(jax.random.PRNGKey(0), TINY, cfg)
    step = make_train_step(TINY, cfg)
    reals = jax.random.uniform(jax.random.PRNGKey(1), (4, 16, 16, 3)) * 2 - 1
    for i in range(2):
        state, metrics = step(state, reals, jax.random.PRNGKey(20 + i))
        assert float(metrics["pl"]) == 0.0
    assert float(state.pl_mean) == 0.0


def test_pre_pl_checkpoint_loads_with_default_pl_mean():
    """Checkpoints written before pl_mean existed reconstruct with the default
    (NamedTuple trailing-field default), so old training runs resume cleanly."""
    import pickle as _pickle

    from gance_tpu.parallel.training import TrainingState

    state = init_training_state(jax.random.PRNGKey(0), TINY, TRAIN)
    old_style = TrainingState(*tuple(state)[:6])  # the 6-field layout
    assert old_style.pl_mean == 0.0
    restored = _pickle.loads(_pickle.dumps(old_style))
    assert restored.pl_mean == 0.0
    # and the restored state steps without error (PL resumes from a cold mean)
    step = make_train_step(TINY, TRAIN)
    reals = jax.random.uniform(jax.random.PRNGKey(1), (4, 16, 16, 3)) * 2 - 1
    new_state, metrics = step(restored, reals, jax.random.PRNGKey(30))
    assert np.isfinite(float(metrics["g_loss"]))
    assert float(metrics["pl"]) > 0.0  # step 0 of TRAIN's pl_interval


def test_dlatent_avg_tracks_mapping_mean():
    """Training advances the w_avg running mean (beta 0.995) so inference-time
    truncation contracts toward the trained distribution's center, and the
    exported EMA network carries the CURRENT running value (copied, not EMA'd)."""
    state = init_training_state(jax.random.PRNGKey(0), TINY, TRAIN)
    assert not np.any(np.asarray(state.g_params["dlatent_avg"]))  # zero init
    step = make_train_step(TINY, TRAIN)
    reals = jax.random.uniform(jax.random.PRNGKey(1), (4, 16, 16, 3)) * 2 - 1
    for i in range(2):
        state, _ = step(state, reals, jax.random.PRNGKey(40 + i))
    avg = np.asarray(state.g_params["dlatent_avg"])
    assert np.any(avg != 0.0) and np.all(np.isfinite(avg))
    np.testing.assert_array_equal(avg, np.asarray(state.ema_params["dlatent_avg"]))
