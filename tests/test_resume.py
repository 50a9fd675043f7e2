"""
Resumable synthesis renders (media/resume.py): chunked durable output,
kill -9 + resume equivalence for both pipelines, input slicing, and the
fingerprint guard. The reference cannot resume synthesis runs (SURVEY §5).
"""

import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

import numpy as np
import pytest

from gance_tpu.audio.io import WavFileProperties, write_wav_file

REPO_ROOT = Path(__file__).resolve().parent.parent


def _read_frames(path: Path) -> list:
    import cv2

    cap = cv2.VideoCapture(str(path))
    frames = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
    cap.release()
    return frames


def _make_wav(path: Path, seconds: float = 1.0) -> Path:
    rng = np.random.RandomState(1)
    rate = 16000
    pcm = (rng.randn(int(rate * seconds)) * 3000).astype(np.int16)
    write_wav_file(path, WavFileProperties(sample_rate=rate, wav_data=pcm, name=path.stem))
    return path


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    """Tiny network + wav + a tiny projection file for the flagship pipeline."""
    import jax

    from gance_tpu.media.video import write_source_to_disk_consume
    from gance_tpu.models.pickle_loader import save_generator_pickle
    from gance_tpu.models.stylegan2 import GeneratorConfig, init_generator_params
    from gance_tpu.projection.file_writer import project_video_to_file

    d = tmp_path_factory.mktemp("resume_assets")
    # latent 512 like real networks: the RMS reducer's librosa hop-512 quirk
    # needs vector_length * frames >= ~7 hops for the savgol smoothing window
    config = GeneratorConfig(
        resolution=16, fmap_base=256, fmap_max=32, latent_size=512,
        dlatent_size=512, mapping_layers=2, mapping_fmaps=512,
    )
    params = init_generator_params(jax.random.PRNGKey(0), config)
    pkl = d / "net.pkl"
    save_generator_pickle(params, pkl)
    wav = _make_wav(d / "sound.wav")

    rng = np.random.RandomState(3)
    video = d / "source.mp4"
    write_source_to_disk_consume(
        iter([(rng.rand(16, 16, 3) * 255).astype(np.uint8) for _ in range(8)]),
        video, video_fps=30.0,
    )
    projection = d / "projection.hdf5"
    project_video_to_file(
        path_to_video=video,
        path_to_network=pkl,
        projection_file_path=projection,
        steps_per_projection=2,
        projection_batch=4,
        latents_histories_enabled=False,
    )
    return d, pkl, wav, projection


def _noise_blend_args(pkl: Path, wav: Path, output: Path) -> list:
    return [
        "noise-blend",
        "--wav", str(wav),
        "--output-path", str(output),
        "--network-path", str(pkl),
        "--frames-to-visualize", "16",
        "--output-fps", "30",
        "--output-side-length", "32",
        "--resumable",
        "--resume-chunk-frames", "4",
    ]


def _flagship_args(pkl: Path, wav: Path, projection: Path, output: Path) -> list:
    return [
        "projection-file-blend",
        "--wav", str(wav),
        "--output-path", str(output),
        "--network-path", str(pkl),
        "--projection-file-path", str(projection),
        "--blend-depth", "3",
        "--output-fps", "30",
        "--output-side-length", "32",
        "--phash-distance", "30",
        "--bbox-distance", "50",
        "--track-length", "1",
        "--resumable",
        "--resume-chunk-frames", "3",
    ]


def _run_cli(args: list) -> None:
    from click.testing import CliRunner

    from gance_tpu.cli.music_into_networks import cli

    result = CliRunner().invoke(cli, args, catch_exceptions=False)
    assert result.exit_code == 0, result.output


def _spawn_cli(args: list) -> subprocess.Popen:
    shim = (
        "import sys, jax; jax.config.update('jax_platforms', 'cpu'); "
        "from gance_tpu.cli.music_into_networks import cli; cli(args=sys.argv[1:])"
    )
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # widen the between-chunks window so SIGKILL lands mid-render
    # deterministically (tiny test renders otherwise finish in milliseconds)
    env["GANCE_TPU_RESUME_CHUNK_DELAY"] = "0.5"
    return subprocess.Popen(
        [sys.executable, "-c", shim, *args],
        cwd=REPO_ROOT, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )


def _kill_after_first_chunk(proc: subprocess.Popen, manifest: Path, timeout: float = 600.0) -> None:
    """SIGKILL the render once at least one chunk is durable (mid-render)."""
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        if proc.poll() is not None:
            out = proc.stdout.read().decode(errors="replace")
            raise AssertionError(
                f"render finished before it could be killed — shrink the "
                f"chunk size or add frames:\n{out}"
            )
        if manifest.exists():
            try:
                chunks = json.loads(manifest.read_text())["chunks"]
            except (json.JSONDecodeError, KeyError):
                chunks = []
            if chunks:
                os.kill(proc.pid, signal.SIGKILL)
                proc.wait()
                return
        time.sleep(0.05)
    os.kill(proc.pid, signal.SIGKILL)
    proc.wait()
    raise AssertionError("no chunk became durable within the timeout")


def test_noise_blend_kill9_resume_matches_uninterrupted(assets, tmp_path):
    _, pkl, wav, _ = assets

    # uninterrupted resumable run = the reference output
    reference_out = tmp_path / "uninterrupted.mp4"
    _run_cli(_noise_blend_args(pkl, wav, reference_out))
    reference_frames = _read_frames(reference_out)
    assert len(reference_frames) == 16

    # killed mid-render, then resumed
    killed_out = tmp_path / "killed.mp4"
    manifest = killed_out.with_name(killed_out.name + ".resume.json")
    proc = _spawn_cli(_noise_blend_args(pkl, wav, killed_out))
    _kill_after_first_chunk(proc, manifest)
    assert manifest.exists() and not killed_out.exists()

    _run_cli(_noise_blend_args(pkl, wav, killed_out))  # resume
    assert not manifest.exists()  # scaffolding cleaned up
    assert not manifest.with_name(killed_out.name + ".parts").exists()

    resumed_frames = _read_frames(killed_out)
    assert len(resumed_frames) == len(reference_frames)
    for index, (got, want) in enumerate(zip(resumed_frames, reference_frames)):
        np.testing.assert_array_equal(got, want, err_msg=f"frame {index}")


def test_flagship_kill9_resume_matches_uninterrupted(assets, tmp_path):
    """The flagship pipeline with overlay enabled: decisions checkpoint to the
    jsonl sidecar and the resumed output equals an uninterrupted run's."""
    _, pkl, wav, projection = assets

    reference_out = tmp_path / "uninterrupted.mp4"
    _run_cli(_flagship_args(pkl, wav, projection, reference_out))
    reference_frames = _read_frames(reference_out)
    assert len(reference_frames) == 8

    killed_out = tmp_path / "killed.mp4"
    manifest = killed_out.with_name(killed_out.name + ".resume.json")
    proc = _spawn_cli(_flagship_args(pkl, wav, projection, killed_out))
    _kill_after_first_chunk(proc, manifest)
    # overlay decisions were checkpointed before any chunk was written
    decisions = killed_out.with_name(killed_out.name + ".overlay.jsonl")
    assert decisions.exists()
    assert len(decisions.read_text().splitlines()) >= 2  # header + >=1 frame

    _run_cli(_flagship_args(pkl, wav, projection, killed_out))  # resume
    assert not manifest.exists() and not decisions.exists()

    resumed_frames = _read_frames(killed_out)
    assert len(resumed_frames) == len(reference_frames)
    for index, (got, want) in enumerate(zip(resumed_frames, reference_frames)):
        np.testing.assert_array_equal(got, want, err_msg=f"frame {index}")


def test_resume_fingerprint_mismatch_refuses(assets, tmp_path):
    _, pkl, wav, _ = assets
    out = tmp_path / "out.mp4"
    manifest = out.with_name(out.name + ".resume.json")
    proc = _spawn_cli(_noise_blend_args(pkl, wav, out))
    _kill_after_first_chunk(proc, manifest)

    changed = _noise_blend_args(pkl, wav, out)
    changed[changed.index("--output-side-length") + 1] = "64"  # different render
    from click.testing import CliRunner

    from gance_tpu.cli.music_into_networks import cli

    result = CliRunner().invoke(cli, changed)
    assert result.exit_code != 0
    assert isinstance(result.exception, ValueError)
    assert "different parameters" in str(result.exception)


def test_resumable_rejects_debug_video(assets, tmp_path):
    _, pkl, wav, _ = assets
    args = _noise_blend_args(pkl, wav, tmp_path / "out.mp4") + [
        "--debug-path", str(tmp_path / "debug.mp4"),
        "--debug-window", "10",
        "--debug-side-length", "32",
    ]
    from click.testing import CliRunner

    from gance_tpu.cli.music_into_networks import cli

    result = CliRunner().invoke(cli, args)
    assert result.exit_code != 0
    assert "debug" in str(result.exception)


def test_slice_visualization_input_indexing():
    """Frame f of the slice equals frame start+f of the original, across the
    flat-vector, matrix, and index streams."""
    from gance_tpu.synthesis.inputs import VisualizationInput, slice_visualization_input
    from gance_tpu.types import DataLabel, MatricesLabel, ResultLayers, VectorsLabel

    rng = np.random.RandomState(0)
    frames, vl, rows = 6, 4, 3
    flat = rng.randn(frames * vl)
    matrix = rng.randn(rows, frames * vl)
    indices = rng.randint(0, 2, size=frames)
    original = VisualizationInput(
        a_vectors=VectorsLabel(data=flat, vector_length=vl, label="a"),
        b_vectors=VectorsLabel(data=flat + 1, vector_length=vl, label="b"),
        combined=MatricesLabel(data=matrix, vector_length=vl, label="c"),
        network_indices=ResultLayers(
            result=DataLabel(data=indices, label="idx"),
            layers=[DataLabel(data=indices * 2.0, label="layer")],
        ),
    )
    sliced = slice_visualization_input(original, 2)
    np.testing.assert_array_equal(sliced.a_vectors.data, flat[2 * vl :])
    np.testing.assert_array_equal(sliced.combined.data, matrix[:, 2 * vl :])
    np.testing.assert_array_equal(sliced.network_indices.result.data, indices[2:])
    np.testing.assert_array_equal(
        sliced.network_indices.layers[0].data, indices[2:] * 2.0
    )
    assert slice_visualization_input(original, 0) is original
