"""
End-to-end pipeline + CLI tests on tiny real networks: noise_blend and
projection_file_blend produce playable videos; the synthesize/check/process CLIs
run through click runners; synthesis-file format roundtrips (incl. the v0 asset
from the reference's test suite).
"""

import json
from pathlib import Path

import jax
import numpy as np
import pytest
from click.testing import CliRunner

from gance_tpu.media.video import frames_in_video, write_source_to_disk_consume
from gance_tpu.models.pickle_loader import save_generator_pickle
from gance_tpu.models.stylegan2 import GeneratorConfig, init_generator_params

CLAPS = Path("/root/reference/test/assets/claps.wav")
SAMPLE_SYNTHESIS_FILE = Path("/root/reference/test/assets/sample_synthesis_file.json")

TINY = GeneratorConfig(resolution=16, fmap_base=256, fmap_max=32, latent_size=512,
                       dlatent_size=512, mapping_layers=2, mapping_fmaps=512)


@pytest.fixture(scope="module")
def networks_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("nets")
    for i in range(2):
        params = init_generator_params(jax.random.PRNGKey(i), TINY)
        save_generator_pickle(params, d / f"{i}_net.pkl")
    return d


@pytest.fixture(scope="module")
def tiny_projection_file(tmp_path_factory, networks_dir):
    """A small completed projection file made from a tiny video."""
    from gance_tpu.projection.file_writer import project_video_to_file

    d = tmp_path_factory.mktemp("proj")
    # >= 7 frames: the spectrogram's savgol(7) needs that many output frames,
    # exactly like the reference (scipy interp-mode window constraint).
    rng = np.random.RandomState(3)
    frames = [(rng.rand(16, 16, 3) * 255).astype(np.uint8) for _ in range(8)]
    video = d / "source.mp4"
    write_source_to_disk_consume(iter(frames), video, video_fps=30.0)
    out = d / "projection.hdf5"
    project_video_to_file(
        path_to_video=video,
        path_to_network=sorted(networks_dir.glob("*.pkl"))[0],
        projection_file_path=out,
        steps_per_projection=3,
        latents_histories_enabled=False,
    )
    return out


def test_noise_blend_end_to_end(tmp_path, networks_dir):
    from gance_tpu.pipelines.noise_blend import noise_blend_api

    out = tmp_path / "noise_blend.avi"
    noise_blend_api(
        wav=[CLAPS],
        output_path=out,
        network_paths=sorted(networks_dir.glob("*.pkl")),
        frames_to_visualize=6,
        output_fps=30.0,
        output_side_length=32,
        debug_path=None,
        debug_window=None,
        debug_side_length=None,
        alpha=0.25,
        fft_roll_enabled=False,
        fft_amplitude_range=(-1.0, 1.0),
    )
    assert out.exists()
    video = frames_in_video(out)
    frames = list(video.frames)
    assert len(frames) == 6
    assert frames[0].shape == (32, 32, 3)


def test_noise_blend_data_parallel_mesh(tmp_path, networks_dir):
    """
    Full noise-blend pipeline over a dp x tp device mesh (8 virtual CPU
    devices): output must match the single-device render within uint8 rounding.
    """
    from gance_tpu.pipelines.noise_blend import noise_blend_api

    common = dict(
        wav=[CLAPS],
        network_paths=sorted(networks_dir.glob("*.pkl")),
        frames_to_visualize=8,
        output_fps=30.0,
        output_side_length=32,
        debug_path=None,
        debug_window=None,
        debug_side_length=None,
        alpha=0.25,
        fft_roll_enabled=False,
        fft_amplitude_range=(-1.0, 1.0),
    )
    sharded_out = tmp_path / "sharded.avi"
    noise_blend_api(output_path=sharded_out, data_parallel=4, **common)
    single_out = tmp_path / "single.avi"
    noise_blend_api(output_path=single_out, **common)

    sharded = np.stack(list(frames_in_video(sharded_out).frames))
    single = np.stack(list(frames_in_video(single_out).frames))
    assert sharded.shape == single.shape == (8, 32, 32, 3)
    # mp4v is lossy but deterministic: identical inputs encode identically, so
    # any difference beyond rounding-induced codec jitter is a sharding bug
    assert np.abs(sharded.astype(int) - single.astype(int)).mean() < 2.0


def test_noise_blend_with_debug(tmp_path, networks_dir):
    from gance_tpu.pipelines.noise_blend import noise_blend_api

    out = tmp_path / "hero.avi"
    debug = tmp_path / "debug.avi"
    noise_blend_api(
        wav=[CLAPS],
        output_path=out,
        network_paths=sorted(networks_dir.glob("*.pkl"))[:1],
        frames_to_visualize=3,
        output_fps=30.0,
        output_side_length=32,
        debug_path=debug,
        debug_window=10,
        debug_side_length=64,
        alpha=0.5,
        fft_roll_enabled=True,
        fft_amplitude_range=(-1.0, 1.0),
    )
    assert out.exists() and debug.exists()
    debug_video = frames_in_video(debug)
    frames = list(debug_video.frames)
    assert len(frames) == 3
    # hconcat of hero (64) + viz (64)
    assert frames[0].shape == (64, 128, 3)


def test_projection_file_blend_end_to_end(tmp_path, networks_dir, tiny_projection_file):
    from gance_tpu.pipelines.projection_file_blend import projection_file_blend_api

    out = tmp_path / "blend.avi"
    projection_file_blend_api(
        wav=[CLAPS],
        output_path=out,
        network_paths=sorted(networks_dir.glob("*.pkl")),
        frames_to_visualize=None,
        output_fps=30.0,
        output_side_length=32,
        debug_path=None,
        debug_window=10,
        debug_side_length=64,
        alpha=0.5,
        fft_roll_enabled=False,
        fft_amplitude_range=(-1.0, 1.0),
        projection_file_path=tiny_projection_file,
        blend_depth=3,
    )
    assert out.exists()
    frames = list(frames_in_video(out).frames)
    assert len(frames) == 8  # matches projection frame count (fps multiplier 1)
    assert frames[0].shape == (32, 32, 3)


def test_projection_file_blend_with_overlay_and_debug(
    tmp_path, networks_dir, tiny_projection_file
):
    from gance_tpu.pipelines.projection_file_blend import projection_file_blend_api

    out = tmp_path / "blend_overlay.avi"
    debug = tmp_path / "debug_overlay.avi"
    projection_file_blend_api(
        wav=[CLAPS],
        output_path=out,
        network_paths=sorted(networks_dir.glob("*.pkl"))[:1],
        frames_to_visualize=None,
        output_fps=30.0,
        output_side_length=32,
        debug_path=debug,
        debug_window=10,
        debug_side_length=64,
        alpha=0.5,
        fft_roll_enabled=False,
        fft_amplitude_range=(-1.0, 1.0),
        projection_file_path=tiny_projection_file,
        blend_depth=3,
        phash_distance=30,
        bbox_distance=50.0,
        track_length=1,
    )
    assert out.exists() and debug.exists()
    assert len(list(frames_in_video(out).frames)) == 8
    debug_frames = list(frames_in_video(debug).frames)
    assert len(debug_frames) == 8


def test_projection_blend_rejects_incomplete(tmp_path, networks_dir):
    """Readers refuse incomplete projection files (reference :140-141)."""
    import h5py

    from gance_tpu.pipelines.projection_file_blend import projection_file_blend_api
    from gance_tpu.projection.file_writer import ProjectionFileWriter
    from gance_tpu.projection.projection_types import LATEST_VERSION, ProjectionAttributes

    attrs = ProjectionAttributes(
        version_number=LATEST_VERSION, complete=False, original_target_path="t",
        original_width_height=(16, 16), projection_width_height=(16, 16),
        target_md5_hash="0" * 32, original_network_path="n",
        network_md5_hash="0" * 32, steps_in_projection=1, noises_shapes=np.nan,
        latents_histories_enabled=False, noises_histories_enabled=False,
        images_histories_enabled=False, original_fps=30.0, projection_fps=30.0,
        original_frame_count=1, projection_frame_count=1,
    )
    bad = tmp_path / "incomplete.hdf5"
    writer = ProjectionFileWriter(bad, attrs)
    with writer.frame_writer() as fw:
        target = np.zeros((16, 16, 3), np.uint8)
        fw.finish(target, np.zeros((1, 8, 512), np.float32), target)
    writer.close(complete=False)

    with pytest.raises(ValueError, match="Invalid Projection File"):
        projection_file_blend_api(
            wav=[CLAPS], output_path=tmp_path / "x.avi",
            network_paths=sorted(networks_dir.glob("*.pkl"))[:1],
            frames_to_visualize=None, output_fps=30.0, output_side_length=32,
            debug_path=None, debug_window=10, debug_side_length=64, alpha=0.5,
            fft_roll_enabled=False, fft_amplitude_range=(-1.0, 1.0),
            projection_file_path=bad, blend_depth=3,
        )


# --------------------------------------------------------------------- CLIs


def test_synthesis_file_roundtrip(tmp_path):
    from gance_tpu.pipelines.synthesis_file import (
        read_vector_in_file,
        write_synthesis_file,
    )

    vector = np.random.RandomState(0).randn(512).astype(np.float32)
    path = tmp_path / "synth.json"
    write_synthesis_file(
        destination_path=path, vector=vector, network_path=Path("net.pkl"),
        network_hash="a" * 32, image_path=Path("img.png"), image_hash="b" * 32,
    )
    back = read_vector_in_file(path)
    np.testing.assert_allclose(back, vector, rtol=1e-6)
    blob = json.loads(path.read_text())
    assert blob["version"] == 2
    assert blob["network_hash"] == "a" * 32


def test_synthesis_file_v0_asset():
    """The reference's sample synthesis file is v0 (model_* fields, (1,512) shape)."""
    from gance_tpu.pipelines.synthesis_file import read_vector_in_file

    vector = read_vector_in_file(SAMPLE_SYNTHESIS_FILE)
    assert vector.shape == (512,)


def test_synthesize_images_cli(tmp_path, networks_dir):
    from gance_tpu.cli.synthesize_images import cli

    out_dir = tmp_path / "images"
    result = CliRunner().invoke(
        cli,
        [
            "images-from-network",
            "--networks-directory", str(networks_dir),
            "--output-directory", str(out_dir),
            "--num-faces", "0",
            "--no-faces", "1",
        ],
        catch_exceptions=False,
    )
    assert result.exit_code == 0
    pngs = list(out_dir.glob("*.png"))
    jsons = list(out_dir.glob("*.json"))
    assert len(pngs) == 2  # one no-face image per network
    assert len(jsons) == 2


def test_synthesis_file_into_networks_cli(tmp_path, networks_dir):
    from gance_tpu.cli.synthesize_images import cli
    from gance_tpu.pipelines.synthesis_file import write_synthesis_file

    synth_dir = tmp_path / "synth"
    synth_dir.mkdir()
    vector = np.random.RandomState(1).randn(512).astype(np.float32)
    write_synthesis_file(
        destination_path=synth_dir / "v.json", vector=vector,
        network_path=Path("x.pkl"), network_hash="a" * 32,
        image_path=Path("x.png"), image_hash="b" * 32,
    )
    out_dir = tmp_path / "replay"
    result = CliRunner().invoke(
        cli,
        [
            "synthesis-file-into-networks",
            "--synthesis-files-dir", str(synth_dir),
            "--networks-dir", str(networks_dir),
            "--output-directory", str(out_dir),
        ],
        catch_exceptions=False,
    )
    assert result.exit_code == 0
    assert len(list(out_dir.glob("*.png"))) == 2  # 2 networks x 1 vector


def test_check_move_networks_cli(tmp_path, networks_dir):
    from gance_tpu.cli.check_move_networks import cli

    out_dir = tmp_path / "validated"
    (networks_dir / "submit_config.pkl").write_bytes(b"not a network")
    result = CliRunner().invoke(
        cli,
        [
            "--networks-directory", str(networks_dir),
            "--output-directory", str(out_dir),
        ],
        catch_exceptions=False,
    )
    assert result.exit_code == 0
    copied = sorted(out_dir.glob("*.pkl"))
    assert len(copied) == 2
    assert copied[0].name.startswith("0_")
    # idempotence: second run copies nothing new (reference --network-directory
    # spelling exercised here; --networks-directory above is the alias)
    result = CliRunner().invoke(
        cli,
        ["--network-directory", str(networks_dir), "--output-directory", str(out_dir)],
        catch_exceptions=False,
    )
    assert len(list(out_dir.glob("*.pkl"))) == 2


def test_process_images_cli(tmp_path):
    """Reference option spellings: scale to {w}_{h}_{name}, delete-by-default scan."""
    from gance_tpu.cli.process_images import cli
    from gance_tpu.media.images import write_image

    src = tmp_path / "src"
    src.mkdir()
    rng = np.random.RandomState(0)
    for i in range(3):
        write_image(
            (rng.rand(20, 30, 3) * 255).astype(np.uint8), src / f"img_{i}.png"
        )
    (src / "broken.jpeg").write_bytes(b"not an image")

    out = tmp_path / "scaled"
    result = CliRunner().invoke(
        cli,
        [
            "scale-images",
            "--original-images-directory", str(src),
            "--image-file-extension", "png",
            "--output-directory", str(out),
            "--scaled-image-width", "16",
            "--scaled-image-height", "16",
        ],
        catch_exceptions=False,
    )
    assert result.exit_code == 0
    scaled = sorted(out.glob("*.png"))
    assert len(scaled) == 3
    # reference naming: {width}_{height}_{original name}
    assert scaled[0].name == "16_16_img_0.png"

    # scan defaults: *.jpeg only, deletion is the default (reference :146-190)
    result = CliRunner().invoke(
        cli,
        ["scan-for-broken-images", "--directory", str(src)],
        catch_exceptions=False,
    )
    assert result.exit_code == 0
    assert not (src / "broken.jpeg").exists()
    assert len(list(src.glob("*.png"))) == 3  # non-jpeg untouched


def test_process_images_cli_aliases_and_no_delete(tmp_path):
    """The earlier short spellings remain as aliases; --no-delete lists only."""
    from gance_tpu.cli.process_images import cli
    from gance_tpu.media.images import write_image

    src = tmp_path / "src"
    src.mkdir()
    write_image(
        (np.random.RandomState(1).rand(8, 8, 3) * 255).astype(np.uint8),
        src / "a.jpeg",
    )
    (src / "broken.jpeg").write_bytes(b"nope")

    out = tmp_path / "scaled"
    result = CliRunner().invoke(
        cli,
        [
            "scale-images",
            "--input-directory", str(src),
            "--image-file-extension", "jpeg",
            "--output-directory", str(out),
            "--side-length", "16",
        ],
        catch_exceptions=False,
    )
    assert result.exit_code == 0
    assert sorted(p.name for p in out.iterdir()) == ["16_16_a.jpeg"]

    result = CliRunner().invoke(
        cli,
        ["scan-for-broken-images", "--directory", str(src), "--no-delete"],
        catch_exceptions=False,
    )
    assert result.exit_code == 0
    assert (src / "broken.jpeg").exists()


def test_music_into_networks_cli_overlay_group(tmp_path, networks_dir, tiny_projection_file):
    """All-or-none overlay option group enforcement."""
    from gance_tpu.cli.music_into_networks import cli

    result = CliRunner().invoke(
        cli,
        [
            "projection-file-blend",
            "--wav", str(CLAPS),
            "--output-path", str(tmp_path / "o.avi"),
            "--networks-directory", str(networks_dir),
            "--projection-file-path", str(tiny_projection_file),
            "--phash-distance", "30",
        ],
    )
    assert result.exit_code != 0
    assert "must be given together" in result.output


def test_noise_blend_bf16_and_trace(tmp_path, networks_dir):
    """--compute-dtype bfloat16 + --trace-dir produce a video and a profiler trace."""
    from gance_tpu.pipelines.noise_blend import noise_blend_api

    out = tmp_path / "bf16.avi"
    trace_dir = tmp_path / "trace"
    noise_blend_api(
        wav=[CLAPS], output_path=out,
        network_paths=sorted(networks_dir.glob("*.pkl"))[:1],
        frames_to_visualize=3, output_fps=30.0, output_side_length=32,
        debug_path=None, debug_window=None, debug_side_length=None,
        alpha=0.25, fft_roll_enabled=False, fft_amplitude_range=(-1.0, 1.0),
        compute_dtype="bfloat16", trace_dir=trace_dir,
    )
    assert out.exists()
    assert len(list(frames_in_video(out).frames)) == 3
    assert any(trace_dir.rglob("*.pb")) or any(trace_dir.rglob("*.json.gz"))


def test_overlay_detection_side_reaches_pipeline(tmp_path, monkeypatch):
    """--overlay-detection-side plumbs through the CLI into the pipeline API."""
    from gance_tpu.cli import music_into_networks as cli_mod
    import gance_tpu.pipelines.projection_file_blend as pfb

    seen = {}
    monkeypatch.setattr(
        pfb, "projection_file_blend_api", lambda **kw: seen.update(kw)
    )
    result = CliRunner().invoke(
        cli_mod.cli,
        [
            "projection-file-blend",
            "--wav", str(CLAPS),
            "--output-path", str(tmp_path / "o.avi"),
            "--network-path", "/dev/null",
            "--projection-file-path", str(CLAPS),  # existence-checked only
            "--phash-distance", "30",
            "--bbox-distance", "50",
            "--track-length", "2",
            "--overlay-detection-side", "512",
        ],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    assert seen["overlay_detection_side"] == 512
    assert seen["phash_distance"] == 30


def test_reference_readme_nova_command_shape(tmp_path, networks_dir, monkeypatch):
    """
    The reference README's production command (README.md:27-45, the Won Pound
    NOVA render) must parse VERBATIM against this CLI — option names, flag
    forms, and the two-value --fft-amplitude-range included.
    """
    from gance_tpu.cli import music_into_networks as cli_mod
    import gance_tpu.pipelines.projection_file_blend as pfb

    seen = {}
    monkeypatch.setattr(
        pfb, "projection_file_blend_api", lambda **kw: seen.update(kw)
    )
    networks_json = tmp_path / "prod_networks.json"
    networks_json.write_text(
        json.dumps({"networks": [str(p) for p in sorted(networks_dir.glob("*.pkl"))]})
    )
    result = CliRunner().invoke(
        cli_mod.cli,
        [
            "projection-file-blend",
            "--wav", str(CLAPS),
            "--output-path", str(tmp_path / "nova.mp4"),
            "--debug-path", str(tmp_path / "nova_debug.mp4"),
            "--debug-side-length", "1000",
            "--debug-window", "200",
            "--run-config", str(tmp_path / "nova_config.json"),
            "--log", str(tmp_path / "log.txt"),
            "--projection-file-path", str(CLAPS),  # existence-checked only
            "--networks-json", str(networks_json),
            "--output-fps", "60",
            "--output-side-length", "2160",
            "--alpha", "0.25",
            "--fft-roll-enabled",
            "--fft-amplitude-range", "-5", "5",
            "--blend-depth", "12",
            "--phash-distance", "25",
            "--bbox-distance", "50",
            "--track-length", "5",
        ],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    assert seen["blend_depth"] == 12
    assert seen["fft_amplitude_range"] == (-5.0, 5.0)
    assert seen["output_side_length"] == 2160
    assert (tmp_path / "nova_config.json").exists()


def test_overlay_detection_side_requires_overlay(tmp_path, networks_dir):
    """--overlay-detection-side without the overlay trio errors instead of
    silently doing nothing."""
    from gance_tpu.cli import music_into_networks as cli_mod

    result = CliRunner().invoke(
        cli_mod.cli,
        [
            "projection-file-blend",
            "--wav", str(CLAPS),
            "--output-path", str(tmp_path / "o.avi"),
            "--networks-directory", str(networks_dir),
            "--projection-file-path", str(CLAPS),
            "--overlay-detection-side", "512",
        ],
    )
    assert result.exit_code != 0
    assert "requires the overlay" in result.output
