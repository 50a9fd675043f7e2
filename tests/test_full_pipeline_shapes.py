"""
The "Won Pound" acceptance shape (BASELINE.json config 5): multi-network dynamic
switching from a networks-json, projection-file blend at an fps multiple of the
projection fps (frame duplication), upscaled output — exercised end-to-end on tiny
networks, plus a parameter sweep of the synthesis orchestration (the reference's
test_network_visualization.py sweep, on the fake backend).
"""

import json
from pathlib import Path

import jax
import numpy as np
import pytest

from gance_tpu.media.video import frames_in_video, write_source_to_disk_consume
from gance_tpu.models.pickle_loader import save_generator_pickle
from gance_tpu.models.stylegan2 import GeneratorConfig, init_generator_params

CLAPS = Path("/root/reference/test/assets/claps.wav")

TINY = GeneratorConfig(resolution=16, fmap_base=256, fmap_max=32, latent_size=512,
                       dlatent_size=512, mapping_layers=2, mapping_fmaps=512)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    d = tmp_path_factory.mktemp("wonpound")
    paths = []
    for i in range(3):
        params = init_generator_params(jax.random.PRNGKey(i), TINY)
        path = d / f"{i}_net.pkl"
        save_generator_pickle(params, path)
        paths.append(path)
    nets_json = d / "networks.json"
    nets_json.write_text(json.dumps({"networks": [str(p) for p in paths]}))

    rng = np.random.RandomState(3)
    frames = [(rng.rand(16, 16, 3) * 255).astype(np.uint8) for _ in range(8)]
    video = d / "source.mp4"
    write_source_to_disk_consume(iter(frames), video, video_fps=30.0)
    projection = d / "projection.hdf5"
    from gance_tpu.projection.file_writer import project_video_to_file

    project_video_to_file(
        path_to_video=video, path_to_network=paths[0],
        projection_file_path=projection, steps_per_projection=2,
    )
    return d, nets_json, projection


def test_multi_network_fps_multiplied_blend(setup, tmp_path):
    """60fps output from a 30fps projection file: frame multiplier 2, three
    networks from networks-json, upscaled output."""
    from click.testing import CliRunner

    from gance_tpu.cli.music_into_networks import cli

    d, nets_json, projection = setup
    out = tmp_path / "wonpound.avi"
    result = CliRunner().invoke(
        cli,
        [
            "projection-file-blend",
            "--wav", str(CLAPS),
            "--output-path", str(out),
            "--networks-json", str(nets_json),
            "--projection-file-path", str(projection),
            "--blend-depth", "4",
            "--output-fps", "60",
            "--output-side-length", "64",
        ],
        catch_exceptions=False,
    )
    assert result.exit_code == 0
    video = frames_in_video(out)
    frames = list(video.frames)
    assert len(frames) == 16  # 8 projection frames x multiplier 2
    assert frames[0].shape == (64, 64, 3)
    assert video.original_fps == 60.0


def test_fps_multiplier_must_divide(setup, tmp_path):
    from gance_tpu.pipelines.projection_file_blend import projection_file_blend_api

    d, nets_json, projection = setup
    with pytest.raises(ValueError, match="not exact"):
        projection_file_blend_api(
            wav=[CLAPS], output_path=tmp_path / "x.avi",
            network_paths=[d / "0_net.pkl"], frames_to_visualize=None,
            output_fps=45.0, output_side_length=32, debug_path=None,
            debug_window=10, debug_side_length=64, alpha=0.5,
            fft_roll_enabled=False, fft_amplitude_range=(-1.0, 1.0),
            projection_file_path=projection, blend_depth=3,
        )


@pytest.mark.parametrize("n_networks", [1, 3])
@pytest.mark.parametrize("frames_cap", [None, 5])
@pytest.mark.parametrize("with_viz", [False, True])
def test_orchestration_sweep(n_networks, frames_cap, with_viz):
    """Output counts/resolutions across the orchestration parameter grid
    (reference test_network_visualization.py's sweep, fake backend)."""
    from gance_tpu.synthesis.inputs import alpha_blend_vectors_max_rms_power_audio
    from gance_tpu.synthesis.orchestration import vector_synthesis
    from gance_tpu.synthesis.runtime import FakeSynthesisNetwork, MultiNetwork

    vl = 512
    rng = np.random.RandomState(7)
    audio = rng.randn(10 * vl).astype(np.float32) * 0.1
    viz_input = alpha_blend_vectors_max_rms_power_audio(
        alpha=0.5, fft_roll_enabled=False, fft_amplitude_range=(-1.0, 1.0),
        time_series_audio_vectors=audio, vector_length=vl,
        network_indices=list(range(n_networks)),
    )
    multi = MultiNetwork.from_networks(
        [FakeSynthesisNetwork(resolution=8, expected_vector_length=vl)
         for _ in range(n_networks)]
    )
    visualizer = None
    if with_viz:
        from gance_tpu.viz.panels import synthesis_visualizer

        visualizer = synthesis_visualizer(side_length=32)

    output = vector_synthesis(
        multi, viz_input, frames_to_visualize=frames_cap, visualizer=visualizer,
        batch_size=3,
    )
    images = list(output.synthesized_images)
    expected = 10 if frames_cap is None else frames_cap
    assert len(images) == expected
    assert images[0].shape == (8, 8, 3)
    if with_viz:
        viz_frames = list(output.visualization_images)
        assert len(viz_frames) == expected
        assert viz_frames[0].shape == (32, 32, 3)
    else:
        assert output.visualization_images is None


def test_music_complexity_mask_path(setup, tmp_path):
    """The gzip-complexity overlay mask (reference CHANGELOG 0.20.0): enabled
    alongside overlay, it gates which frames get the eye-tracking computation."""
    from gance_tpu.pipelines.projection_file_blend import projection_file_blend_api

    d, nets_json, projection = setup
    out = tmp_path / "masked.avi"
    projection_file_blend_api(
        wav=[CLAPS], output_path=out,
        network_paths=[d / "0_net.pkl"], frames_to_visualize=None,
        output_fps=30.0, output_side_length=32, debug_path=None,
        debug_window=10, debug_side_length=64, alpha=0.5,
        fft_roll_enabled=False, fft_amplitude_range=(-1.0, 1.0),
        projection_file_path=projection, blend_depth=3,
        complexity_change_rolling_sum_window=3,
        complexity_change_threshold=1e9,  # everything "calm" -> no frames skipped
        phash_distance=30, bbox_distance=50.0, track_length=1,
    )
    assert out.exists()
    assert len(list(frames_in_video(out).frames)) == 8


def test_music_mask_requires_overlay(setup, tmp_path):
    from gance_tpu.pipelines.projection_file_blend import projection_file_blend_api

    d, nets_json, projection = setup
    with pytest.raises(ValueError, match="without overlay"):
        projection_file_blend_api(
            wav=[CLAPS], output_path=tmp_path / "x.avi",
            network_paths=[d / "0_net.pkl"], frames_to_visualize=None,
            output_fps=30.0, output_side_length=32, debug_path=None,
            debug_window=10, debug_side_length=64, alpha=0.5,
            fft_roll_enabled=False, fft_amplitude_range=(-1.0, 1.0),
            projection_file_path=projection, blend_depth=3,
            complexity_change_rolling_sum_window=3,
            complexity_change_threshold=5.0,
        )
