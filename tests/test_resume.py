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


def _crashy(frames: list, crash_after: int):
    """A source that dies (like the process would) after yielding N frames."""
    for index, frame in enumerate(frames):
        if index == crash_after:
            raise RuntimeError("simulated crash")
        yield frame


@pytest.mark.parametrize("parts_format", ["raw-avi", "mp4v"])
def test_raw_parts_crash_resume(parts_format, tmp_path):
    """Crash mid-render, resume, and compare against an uninterrupted
    non-resumable encode of the same frames. raw-avi parts are bit-exact, so
    the finalized deliverable must EQUAL the non-resumable run frame-for-frame
    (the mp4v arm only pins resumable==resumable, its documented contract)."""
    import more_itertools

    from gance_tpu.media.resume import durable_frames, write_source_resumable
    from gance_tpu.media.video import write_source_to_disk_forward

    rng = np.random.RandomState(7)
    frames = [(rng.rand(32, 32, 3) * 255).astype(np.uint8) for _ in range(10)]
    fingerprint = {"test": "raw-parts", "frames": 10}

    out = tmp_path / "render.mp4"
    with pytest.raises(RuntimeError, match="simulated crash"):
        write_source_resumable(
            _crashy(frames, crash_after=6), out, 30.0, fingerprint,
            chunk_frames=4, parts_format=parts_format,
        )
    durable = durable_frames(out, fingerprint)
    assert durable == 4  # one finished chunk; the in-flight one is lost
    assert not out.exists()

    total = write_source_resumable(
        iter(frames[durable:]), out, 30.0, fingerprint,
        chunk_frames=4, parts_format=parts_format,
    )
    assert total == 10
    assert not (tmp_path / "render.mp4.resume.json").exists()
    resumed = _read_frames(out)
    assert len(resumed) == 10

    if parts_format == "raw-avi":
        # bit-exact parts -> the single finalize encode sees the original
        # frames -> output identical to a non-resumable render
        direct = tmp_path / "direct.mp4"
        more_itertools.consume(
            write_source_to_disk_forward(
                source=iter(frames), video_path=direct, video_fps=30.0,
                high_quality=True,
            )
        )
        want = _read_frames(direct)
        for index, (got, ref) in enumerate(zip(resumed, want)):
            np.testing.assert_array_equal(got, ref, err_msg=f"frame {index}")


def _direct_encode(frames: list, path: Path) -> list:
    """A non-resumable high_quality encode of `frames`, decoded back."""
    import more_itertools

    from gance_tpu.media.video import write_source_to_disk_forward

    more_itertools.consume(
        write_source_to_disk_forward(
            source=iter(frames), video_path=path, video_fps=30.0,
            high_quality=True,
        )
    )
    return _read_frames(path)


def test_raw_parts_byte_cap(tmp_path, monkeypatch):
    """Chunks re-slice under the raw byte budget so a part never hits the
    muxer's segment roll (which would break the one-file-per-part manifest)."""
    from gance_tpu.media import resume as resume_mod

    monkeypatch.setattr(resume_mod, "RAW_PART_BYTE_BUDGET", 32 * 32 * 3 * 2)
    rng = np.random.RandomState(8)
    frames = [(rng.rand(32, 32, 3) * 255).astype(np.uint8) for _ in range(5)]
    out = tmp_path / "capped.mp4"
    total = resume_mod.write_source_resumable(
        iter(frames), out, 30.0, {"t": 1}, chunk_frames=4,
        parts_format="raw-avi",
    )
    assert total == 5
    np.testing.assert_array_equal(
        np.stack(_read_frames(out)),
        np.stack(_direct_encode(frames, tmp_path / "direct.mp4")),
    )


def test_resume_keeps_manifest_parts_format(tmp_path):
    """A resume keeps the format recorded in the manifest even when the
    current default/argument differs (one render's parts stay uniform)."""
    from gance_tpu.media.resume import (
        load_manifest,
        write_source_resumable,
    )

    rng = np.random.RandomState(9)
    frames = [(rng.rand(32, 32, 3) * 255).astype(np.uint8) for _ in range(8)]
    out = tmp_path / "mixed.mp4"
    fingerprint = {"t": 2}
    with pytest.raises(RuntimeError):
        write_source_resumable(
            _crashy(frames, 5), out, 30.0, fingerprint,
            chunk_frames=4, parts_format="raw-avi",
        )
    manifest = load_manifest(out, fingerprint)
    assert manifest["parts_format"] == "raw-avi"
    write_source_resumable(  # resume asking for mp4v: manifest wins
        iter(frames[4:]), out, 30.0, fingerprint,
        chunk_frames=4, parts_format="mp4v",
    )
    # all parts stayed raw-avi -> bit-exact finalize input -> output equals
    # the non-resumable encode
    np.testing.assert_array_equal(
        np.stack(_read_frames(out)),
        np.stack(_direct_encode(frames, tmp_path / "direct.mp4")),
    )


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


def test_resumable_rejects_multiprocess(assets, tmp_path, monkeypatch):
    """--resumable has no multi-host coordinator story: every process would
    race the same manifest. Refuse loudly instead of corrupting."""
    import jax

    from gance_tpu.pipelines.noise_blend import noise_blend_api

    _, pkl, wav, _ = assets
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    with pytest.raises(ValueError, match="single-process only"):
        noise_blend_api(
            wav=[wav], output_path=tmp_path / "o.mp4", network_paths=[pkl],
            frames_to_visualize=8, output_fps=30.0, output_side_length=32,
            debug_path=None, debug_window=None, debug_side_length=None,
            alpha=0.5, fft_roll_enabled=False, fft_amplitude_range=(-1.0, 1.0),
            resumable=True,
        )


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


def test_torn_overlay_sidecar_tail_dropped(tmp_path):
    """A kill -9 mid-flush leaves a torn final jsonl line; the loader must drop
    (and truncate) it so the resume proceeds from the intact prefix instead of
    crashing — and a later append must not weld onto the torn bytes."""
    from gance_tpu.pipelines.projection_file_blend import (
        _checkpoint_decisions,
        _load_overlay_decisions,
    )
    from gance_tpu.types import BoundingBox

    fingerprint = {"pipeline": "test"}
    path = tmp_path / "out.mp4.overlay.jsonl"
    path.write_text(
        json.dumps({"fingerprint": fingerprint}) + "\n"
        + json.dumps({"boxes": [[1, 2, 3, 4]]}) + "\n"
        + json.dumps({"boxes": None}) + "\n"
        + '{"boxes": [[5, 6,'  # torn mid-write, no trailing newline
    )
    decisions = _load_overlay_decisions(path, fingerprint)
    assert decisions == [[BoundingBox(1, 2, 3, 4)], None]
    # torn bytes were truncated out of the file itself
    assert path.read_text().endswith('{"boxes": null}\n')

    # appending resumes cleanly after the intact prefix
    list(_checkpoint_decisions(path, fingerprint, 2, iter([[BoundingBox(9, 9, 2, 2)]])))
    assert _load_overlay_decisions(path, fingerprint) == [
        [BoundingBox(1, 2, 3, 4)], None, [BoundingBox(9, 9, 2, 2)],
    ]

    # a torn HEADER (killed during the very first write) means no usable cache
    torn_header = tmp_path / "torn_header.overlay.jsonl"
    torn_header.write_text('{"fingerprint":')
    assert _load_overlay_decisions(torn_header, fingerprint) == []
    assert not torn_header.exists()

    # corruption in the MIDDLE is outside the crash model: recompute all
    corrupt = tmp_path / "corrupt.overlay.jsonl"
    corrupt.write_text(
        json.dumps({"fingerprint": fingerprint}) + "\n"
        + "garbage\n"
        + json.dumps({"boxes": None}) + "\n"
    )
    assert _load_overlay_decisions(corrupt, fingerprint) == []
    assert not corrupt.exists()


def test_overwritten_input_refuses_resume(assets, tmp_path):
    """Fingerprints carry file identity (size + mtime), not just the path: a
    network/wav overwritten between the crash and the resume must refuse
    rather than silently stitching frames from two different models."""
    import shutil

    _, pkl, wav, _ = assets
    # private copies: this test mutates them
    pkl2 = tmp_path / "net.pkl"
    wav2 = tmp_path / "sound.wav"
    shutil.copy2(pkl, pkl2)
    shutil.copy2(wav, wav2)

    out = tmp_path / "out.mp4"
    manifest = out.with_name(out.name + ".resume.json")
    proc = _spawn_cli(_noise_blend_args(pkl2, wav2, out))
    _kill_after_first_chunk(proc, manifest)

    # "retrain": same path, different bytes/mtime
    payload = pkl2.read_bytes()
    pkl2.write_bytes(payload + b"x")

    from click.testing import CliRunner

    from gance_tpu.cli.music_into_networks import cli

    result = CliRunner().invoke(cli, _noise_blend_args(pkl2, wav2, out))
    assert result.exit_code != 0
    assert isinstance(result.exception, ValueError)
    assert "different parameters" in str(result.exception)


def test_smoothed_decisions_replay_invariant():
    """The resume warm-up's correctness claim: _smoothed_decisions' state at
    frame k is a pure function of the last `window` frames' records, so a
    replay starting `window` frames early yields identical decisions from
    frame k onward — including across resets (skips, center jumps)."""
    from gance_tpu.overlay.common import DistanceBoxes
    from gance_tpu.overlay.eye_tracking import _DetectionRecord, _smoothed_decisions
    from gance_tpu.types import BoundingBox

    def rec(x, phash=1):
        a = BoundingBox(x, 10, 8, 8)
        b = BoundingBox(x + 2, 12, 8, 8)
        return _DetectionRecord(
            skip=False,
            foreground_boxes=[a],
            distance_boxes=DistanceBoxes(distance=3.0, a_box=a, b_box=b),
            bbox_phash_distance=phash,
        )

    window = 3
    records = (
        [rec(10), rec(11), rec(13), rec(12)]
        + [_DetectionRecord(skip=True)]          # reset via skip
        + [rec(14), rec(15), rec(16)]
        + [rec(60)]                               # center jump > 2x box size: reset
        + [rec(61), rec(62), rec(63)]
    )

    full = list(_smoothed_decisions(records, window, 8, 50.0))
    for k in range(window, len(records)):
        replay = list(_smoothed_decisions(records[k - window :], window, 8, 50.0))
        assert replay[window:] == full[k:], f"divergence replaying from frame {k}"


def test_flagship_smoothing_kill9_mid_detection_resume(assets, tmp_path):
    """Kill -9 DURING detection (decisions partially checkpointed, no chunk
    durable yet) with temporal smoothing on: the resume must warm the smoothing
    history and produce output equal to an uninterrupted run's."""
    _, pkl, wav, projection = assets
    smooth_args = lambda out: _flagship_args(pkl, wav, projection, out) + [
        "--overlay-smoothing", "3",
    ]

    reference_out = tmp_path / "uninterrupted.mp4"
    _run_cli(smooth_args(reference_out))
    reference_frames = _read_frames(reference_out)
    assert len(reference_frames) == 8

    killed_out = tmp_path / "killed.mp4"
    decisions = killed_out.with_name(killed_out.name + ".overlay.jsonl")
    manifest = killed_out.with_name(killed_out.name + ".resume.json")

    shim = (
        "import sys, jax; jax.config.update('jax_platforms', 'cpu'); "
        "from gance_tpu.cli.music_into_networks import cli; cli(args=sys.argv[1:])"
    )
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["GANCE_TPU_RESUME_DECISION_DELAY"] = "0.4"
    proc = subprocess.Popen(
        [sys.executable, "-c", shim, *smooth_args(killed_out)],
        cwd=REPO_ROOT, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )
    # kill once >=4 decisions are durable (> the 3-frame smoothing window, so
    # the resume actually exercises the warm-up replay) but before any chunk
    deadline = time.monotonic() + 600.0
    while time.monotonic() < deadline:
        if proc.poll() is not None:
            out = proc.stdout.read().decode(errors="replace")
            raise AssertionError(f"render finished before the kill:\n{out}")
        if decisions.exists() and len(decisions.read_text().splitlines()) >= 5:
            os.kill(proc.pid, signal.SIGKILL)
            proc.wait()
            break
        time.sleep(0.05)
    else:
        os.kill(proc.pid, signal.SIGKILL)
        proc.wait()
        raise AssertionError("decisions never reached the kill threshold")
    assert not manifest.exists() and not killed_out.exists()

    _run_cli(smooth_args(killed_out))  # resume
    assert not decisions.exists()

    resumed_frames = _read_frames(killed_out)
    assert len(resumed_frames) == len(reference_frames)
    for index, (got, want) in enumerate(zip(resumed_frames, reference_frames)):
        np.testing.assert_array_equal(got, want, err_msg=f"frame {index}")
