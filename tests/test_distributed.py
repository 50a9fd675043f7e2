"""
Executed multi-process certification of the distributed backend.

The reference is single-GPU/single-host (SURVEY §2.10: no NCCL/MPI/
torch.distributed anywhere); multi-host training is net-new capability. The
virtual 8-device mesh the rest of the suite uses lives in ONE process, so it
can never exercise the process-spanning half of the runtime
(jax.distributed init, cross-process Gloo/DCN collectives,
make_array_from_process_local_data). This test does: it launches two real OS
processes with 4 virtual CPU devices each, joins them over a coordinator into
one 8-device ('data'=4, 'model'=2) mesh — the data axis crossing the process
boundary exactly as it crosses DCN on multi-slice hardware — runs three real
sharded train steps (R1 and path-length branches included), and asserts the
final training state equals a single-process 8-device run of the same global
batches.
"""

import os
import pickle
import socket
import subprocess
import sys
from pathlib import Path

import jax
import numpy as np
import pytest

from gance_tpu.models.stylegan2 import GeneratorConfig
from gance_tpu.parallel.mesh import create_mesh
from gance_tpu.parallel.training import (
    TrainingConfig,
    init_training_state,
    make_train_step,
    shard_training_state,
)

MODEL = GeneratorConfig(
    resolution=16, fmap_base=256, fmap_max=32, latent_size=16,
    dlatent_size=16, mapping_layers=2, mapping_fmaps=16,
)
TRAIN = TrainingConfig(r1_interval=2, pl_interval=2)


def _free_port() -> int:
    with socket.socket() as sock:
        sock.bind(("localhost", 0))
        return sock.getsockname()[1]


def _run_workers(tmp_path: Path, num_processes: int = 2) -> dict:
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    repo_root = Path(__file__).resolve().parent.parent
    workers = [
        subprocess.Popen(
            [
                sys.executable, "-m", "tests.distributed_worker",
                str(process_id), str(num_processes), str(port), str(tmp_path),
            ],
            cwd=repo_root,
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for process_id in range(num_processes)
    ]
    outputs = []
    failed = False
    for worker in workers:
        try:
            out, _ = worker.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            worker.kill()
            out, _ = worker.communicate()
            failed = True
        outputs.append(out.decode(errors="replace"))
        failed = failed or worker.returncode != 0
    if failed:
        pytest.fail("distributed worker failed:\n" + "\n=== worker ===\n".join(outputs))
    with open(tmp_path / "result.pkl", "rb") as f:
        return pickle.load(f)


@pytest.mark.skipif(
    jax.default_backend() != "cpu", reason="subprocess workers are CPU-only"
)
def test_two_process_training_matches_single_process(tmp_path):
    result = _run_workers(tmp_path)
    batches = result["batches"]
    assert len(batches) == 3 and batches[0].shape == (4, 16, 16, 3)

    # Single-process replay on this process's 8 virtual devices: same mesh
    # shape, same initial state, the exact global batches the workers ran.
    mesh = create_mesh(data_parallel=4)
    state = init_training_state(jax.random.PRNGKey(0), MODEL, TRAIN)
    state = shard_training_state(mesh, state, TRAIN)
    train_step = make_train_step(MODEL, TRAIN, mesh=mesh)
    for step, reals in enumerate(batches):
        state, metrics = train_step(state, reals, np.asarray(jax.random.PRNGKey(step)))

    want = jax.tree.map(np.asarray, state)
    got = result["state"]
    assert int(got.step) == int(want.step) == 3

    flat_want, _ = jax.tree_util.tree_flatten(want)
    flat_got, _ = jax.tree_util.tree_flatten(got)
    assert len(flat_want) == len(flat_got)
    for array_want, array_got in zip(flat_want, flat_got):
        # Cross-process Gloo reductions may associate differently than the
        # single-process ring: allow float round-off, nothing more.
        np.testing.assert_allclose(array_got, array_want, rtol=2e-4, atol=2e-5)

    for key, value in result["metrics"].items():
        np.testing.assert_allclose(
            value, np.asarray(metrics[key]), rtol=2e-4, atol=2e-5, err_msg=key
        )


@pytest.mark.skipif(
    jax.default_backend() != "cpu", reason="subprocess workers are CPU-only"
)
def test_projection_multiprocess_matches_single_process(tmp_path):
    """
    The real projection CLI as two coordinated processes: the frame batch
    shards over a process-spanning pure-DP mesh (collective host fetches via
    process_allgather), only the coordinator writes the HDF5 file, and the
    resulting projection file matches a single-process 8-device run of the
    same command.
    """
    import h5py

    from gance_tpu.media.video import write_source_to_disk_consume
    from gance_tpu.models.pickle_loader import save_generator_pickle
    from gance_tpu.models.stylegan2 import init_generator_params

    params = init_generator_params(jax.random.PRNGKey(0), MODEL)
    save_generator_pickle(params, tmp_path / "net.pkl")
    rng = np.random.RandomState(3)
    write_source_to_disk_consume(
        iter([rng.randint(0, 255, size=(16, 16, 3), dtype=np.uint8) for _ in range(4)]),
        tmp_path / "source.mp4",
        video_fps=30.0,
    )

    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    repo_root = Path(__file__).resolve().parent.parent
    workers = [
        subprocess.Popen(
            [
                sys.executable, "-m", "tests.distributed_projection_worker",
                str(process_id), "2", str(port), str(tmp_path),
            ],
            cwd=repo_root,
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for process_id in range(2)
    ]
    outputs = []
    failed = False
    for worker in workers:
        try:
            out, _ = worker.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            worker.kill()
            out, _ = worker.communicate()
            failed = True
        outputs.append(out.decode(errors="replace"))
        failed = failed or worker.returncode != 0
    if failed:
        pytest.fail(
            "projection worker failed:\n" + "\n=== worker ===\n".join(outputs)
        )
    assert (tmp_path / "multi.hdf5").exists()

    # Single-process reference run: same CLI, same 8-device pure-DP mesh.
    from click.testing import CliRunner

    from gance_tpu.cli.project_video_to_file import cli as projection_cli

    result = CliRunner().invoke(
        projection_cli,
        [
            "videos",
            "--path-to-network", str(tmp_path / "net.pkl"),
            "--steps-per-projection", "4",
            "--projection-batch", "4",
            "--data-parallel", "8",
            "--video-output", str(tmp_path / "source.mp4"), str(tmp_path / "single.hdf5"),
        ],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output

    with h5py.File(tmp_path / "multi.hdf5", "r") as multi, h5py.File(
        tmp_path / "single.hdf5", "r"
    ) as single:
        assert multi.attrs["complete"] and single.attrs["complete"]
        assert sorted(multi["final_latents"]) == sorted(single["final_latents"])
        for name in multi["final_latents"]:
            np.testing.assert_allclose(
                multi["final_latents"][name][()],
                single["final_latents"][name][()],
                rtol=2e-4,
                atol=2e-5,
                err_msg=name,
            )
        # latents histories streamed per step from the scanned device loop
        multi_frames = sorted(multi["latents_histories"])
        assert multi_frames == sorted(single["latents_histories"])
        for frame in multi_frames:
            assert sorted(multi["latents_histories"][frame]) == sorted(
                single["latents_histories"][frame]
            )


@pytest.mark.skipif(
    jax.default_backend() != "cpu", reason="subprocess workers are CPU-only"
)
def test_serving_multiprocess_matches_single_process(tmp_path):
    """
    The real `noise-blend` CLI as two coordinated processes (the multi-host
    SERVING leg): frame batches shard over a process-spanning pure-DP mesh,
    host fetches allgather, only the coordinator writes the video — and the
    result matches a single-process 8-device run of the same render exactly
    (pure DP synthesis has no reductions, so frames are bit-identical).
    """
    import cv2

    from gance_tpu.models.pickle_loader import save_generator_pickle
    from gance_tpu.models.stylegan2 import GeneratorConfig, init_generator_params

    # latent 512 like real networks (the RMS reducer's librosa hop-512 quirk
    # needs enough samples for its savgol window)
    serving_model = GeneratorConfig(
        resolution=16, fmap_base=256, fmap_max=32, latent_size=512,
        dlatent_size=512, mapping_layers=2, mapping_fmaps=512,
    )
    params = init_generator_params(jax.random.PRNGKey(0), serving_model)
    save_generator_pickle(params, tmp_path / "net.pkl")

    from gance_tpu.audio.io import WavFileProperties, write_wav_file

    rng = np.random.RandomState(1)
    write_wav_file(
        tmp_path / "sound.wav",
        WavFileProperties(
            sample_rate=16000,
            wav_data=(rng.randn(16000) * 3000).astype(np.int16),
            name="sound",
        ),
    )

    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    repo_root = Path(__file__).resolve().parent.parent
    workers = [
        subprocess.Popen(
            [
                sys.executable, "-m", "tests.distributed_serving_worker",
                str(process_id), "2", str(port), str(tmp_path),
            ],
            cwd=repo_root,
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for process_id in range(2)
    ]
    outputs = []
    failed = False
    for worker in workers:
        try:
            out, _ = worker.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            worker.kill()
            out, _ = worker.communicate()
            failed = True
        outputs.append(out.decode(errors="replace"))
        failed = failed or worker.returncode != 0
    if failed:
        pytest.fail("serving worker failed:\n" + "\n=== worker ===\n".join(outputs))
    assert (tmp_path / "multi.mp4").exists()

    # Single-process reference: same render over the same 8-device pure-DP mesh.
    from click.testing import CliRunner

    from gance_tpu.cli.music_into_networks import cli as music_cli

    result = CliRunner().invoke(
        music_cli,
        [
            "noise-blend",
            "--wav", str(tmp_path / "sound.wav"),
            "--output-path", str(tmp_path / "single.mp4"),
            "--network-path", str(tmp_path / "net.pkl"),
            "--frames-to-visualize", "12",
            "--output-fps", "30",
            "--output-side-length", "32",
            "--data-parallel", "8",
        ],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output

    def read_frames(path):
        cap = cv2.VideoCapture(str(path))
        frames = []
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            frames.append(frame)
        cap.release()
        return frames

    multi = read_frames(tmp_path / "multi.mp4")
    single = read_frames(tmp_path / "single.mp4")
    assert len(multi) == len(single) == 12
    for index, (got, want) in enumerate(zip(multi, single)):
        np.testing.assert_array_equal(got, want, err_msg=f"frame {index}")


@pytest.mark.skipif(
    jax.default_backend() != "cpu", reason="subprocess workers are CPU-only"
)
def test_projection_coordinator_writer_failure_aborts_peers(tmp_path):
    """
    A coordinator-side writer failure (here: the HDF5 path's parent directory
    does not exist) must tear down the distributed runtime so the peer process
    fails fast instead of hanging in its next collective host fetch
    (ADVICE r3: file_writer.py coordinator exception containment).
    """
    from gance_tpu.media.video import write_source_to_disk_consume
    from gance_tpu.models.pickle_loader import save_generator_pickle
    from gance_tpu.models.stylegan2 import init_generator_params

    params = init_generator_params(jax.random.PRNGKey(0), MODEL)
    save_generator_pickle(params, tmp_path / "net.pkl")
    rng = np.random.RandomState(3)
    write_source_to_disk_consume(
        iter([rng.randint(0, 255, size=(16, 16, 3), dtype=np.uint8) for _ in range(4)]),
        tmp_path / "source.mp4",
        video_fps=30.0,
    )

    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    repo_root = Path(__file__).resolve().parent.parent
    workers = [
        subprocess.Popen(
            [
                sys.executable, "-m", "tests.distributed_projection_worker",
                str(process_id), "2", str(port), str(tmp_path),
                # only the coordinator opens the file; the missing parent dir
                # makes h5py raise there while the peer heads into collectives
                "no_such_directory/multi.hdf5",
            ],
            cwd=repo_root,
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for process_id in range(2)
    ]
    outputs = []
    hung = False
    for worker in workers:
        try:
            out, _ = worker.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            worker.kill()
            out, _ = worker.communicate()
            hung = True
        outputs.append(out.decode(errors="replace"))
    assert not hung, (
        "peer hung after coordinator writer failure:\n"
        + "\n=== worker ===\n".join(outputs)
    )
    for worker, out in zip(workers, outputs):
        assert worker.returncode != 0, (
            "every process must fail loudly, got success:\n" + out
        )
    assert "shutting down the distributed runtime" in outputs[0]


@pytest.mark.skipif(
    jax.default_backend() != "cpu", reason="subprocess workers are CPU-only"
)
def test_train_cli_multiprocess_smoke(tmp_path):
    """
    The real `train` CLI as two coordinated processes: per-host dataset shards,
    --dist-* flags, the scanned (global_scan_block) path, multi-host checkpoint
    write, and the coordinator-only EMA .pkl export — then the exported network
    loads back through the standard pickle loader.
    """
    from PIL import Image

    dataset = tmp_path / "dataset"
    dataset.mkdir()
    rng = np.random.RandomState(7)
    for index in range(8):
        Image.fromarray(
            rng.randint(0, 255, size=(16, 16, 3), dtype=np.uint8)
        ).save(dataset / f"img_{index}.png")

    checkpoint = tmp_path / "ckpt.pkl"
    network = tmp_path / "trained.pkl"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    repo_root = Path(__file__).resolve().parent.parent
    # The axon plugin ignores JAX_PLATFORMS, so pin the platform via jax.config
    # before the CLI touches devices (exactly what conftest.py does in-process).
    shim = (
        "import sys, jax; jax.config.update('jax_platforms', 'cpu'); "
        "from gance_tpu.cli.train import cli; cli(args=sys.argv[1:])"
    )

    def run_pair():
        port = _free_port()
        workers = [
            subprocess.Popen(
                [
                    sys.executable, "-c", shim,
                    "--dataset-directory", str(dataset),
                    "--resolution", "16",
                    "--batch-size", "4",
                    "--total-steps", "2",
                    "--checkpoint-every", "2",
                    "--scan-segment", "2",
                    "--fmap-base", "256",
                    "--fmap-max", "32",
                    "--latent-size", "16",
                    "--pl-weight", "0",
                    "--checkpoint-path", str(checkpoint),
                    "--output-network", str(network),
                    "--dist-coordinator", f"localhost:{port}",
                    "--dist-num-processes", "2",
                    "--dist-process-id", str(process_id),
                ],
                cwd=repo_root,
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
            )
            for process_id in range(2)
        ]
        outputs = []
        failed = False
        for worker in workers:
            try:
                out, _ = worker.communicate(timeout=600)
            except subprocess.TimeoutExpired:
                worker.kill()
                out, _ = worker.communicate()
                failed = True
            outputs.append(out.decode(errors="replace"))
            failed = failed or worker.returncode != 0
        return failed, outputs

    failed, outputs = run_pair()
    if failed and any("Shutdown barrier" in out for out in outputs):
        # Known slow-host contention mode, NOT a code defect: under heavy
        # load one process can lag the other past jax.distributed's 5-minute
        # shutdown barrier (the laggard is still compiling when the fast one
        # exits). A quiet-host run completes in ~40s; retry once.
        checkpoint.unlink(missing_ok=True)
        network.unlink(missing_ok=True)
        failed, outputs = run_pair()
    if failed:
        pytest.fail("train CLI worker failed:\n" + "\n=== worker ===\n".join(outputs))

    assert checkpoint.exists() and network.exists()

    from gance_tpu.models.pickle_loader import load_generator

    params, config = load_generator(network)
    assert config.resolution == 16
    assert params["dlatent_avg"].shape == (16,)
