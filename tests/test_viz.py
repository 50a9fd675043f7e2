"""
Visualization smoke tests: every renderer produces correctly-shaped RGB frames
(the reference's own viz tests are "output file size >= golden bytes" proxies;
shape + content-varies assertions are the equivalent here).
"""

import numpy as np
import pytest

from gance_tpu.audio.primitives import Sigmas, gaussian_data
from gance_tpu.synthesis.orchestration import FrameInput
from gance_tpu.types import DataLabel, ResultLayers, VectorsLabel
from gance_tpu.viz.overlay_viz import VisualizeOverlayThresholds, visualize_overlay_computation
from gance_tpu.viz.panels import synthesis_visualizer, vector_visualizer
from gance_tpu.viz.reduction_viz import visualize_result_layers
from gance_tpu.viz.vectors_3d import (
    multi_plot_vectors,
    plot_vectors_3d,
    reshape_vectors_for_3d_plotting,
    visualize_data_with_spectrogram_and_3d_vectors,
)


def test_synthesis_visualizer_frame(rng):
    render = synthesis_visualizer(side_length=128)
    frame = FrameInput(
        frame_index=3, vector_length=32,
        a_sample=rng.randn(32), b_sample=rng.randn(32),
        combined_sample=rng.randn(4, 32), network_index=1,
        index_window=np.array([0, 1, 1, 0]), index_window_start=2,
    )
    out = render(frame)
    assert out.shape == (128, 128, 3) and out.dtype == np.uint8
    assert out.std() > 0  # actually drew something


def test_synthesis_visualizer_with_waterfall(rng):
    """The optional 3D waterfall column renders for vector AND matrix streams."""
    frame = FrameInput(
        frame_index=2, vector_length=32,
        a_sample=rng.randn(32), b_sample=rng.randn(32),
        combined_sample=rng.randn(32), network_index=0,
        index_window=np.array([0, 0, 1]), index_window_start=0,
    )
    flat = VectorsLabel(data=rng.randn(6 * 32), vector_length=32, label="combined")
    out = synthesis_visualizer(side_length=128, waterfall_vectors=flat)(frame)
    assert out.shape == (128, 128, 3) and out.std() > 0

    mats = VectorsLabel(data=rng.randn(4, 6 * 32), vector_length=32, label="mats")
    out_m = synthesis_visualizer(side_length=128, waterfall_vectors=mats)(frame)
    assert out_m.shape == (128, 128, 3) and out_m.std() > 0
    # the waterfall column must actually change the render
    plain = synthesis_visualizer(side_length=128)(frame)
    assert not np.array_equal(out, plain)


def test_visualize_reducer_output(tmp_path):
    from gance_tpu.audio.reduction import reduce_vector_rms_rolling_average
    from gance_tpu.viz.reduction_viz import visualize_reducer_output

    png = tmp_path / "reducer.png"
    out = visualize_reducer_output(
        "/root/reference/test/assets/claps.wav",
        reduce_vector_rms_rolling_average,
        output_image_path=png,
        vector_length=1000,
    )
    assert png.exists() and png.stat().st_size > 1000
    assert out.ndim == 3 and out.std() > 0


def test_vector_visualizer(rng):
    render = vector_visualizer(output_width=64, output_height=64)
    out = render(rng.randn(32))
    assert out.shape == (64, 64, 3)
    out_m = render(rng.randn(4, 32))
    assert out_m.shape == (64, 64, 3)


def test_visualize_result_layers():
    layers = ResultLayers(
        result=DataLabel(np.arange(10.0), "result"),
        layers=[DataLabel(np.arange(10.0) * 2, "layer")],
    )
    frames = list(visualize_result_layers(layers, frames_per_context=4,
                                          video_height=64, horizontal_line=5.0))
    assert len(frames) == 10
    assert frames[0].shape == (64, 64, 3)


def test_visualize_overlay_computation():
    from gance_tpu.overlay.eye_tracking import OverlayContext

    contexts = [
        OverlayContext(overlay_written=True, bbox_distance=1.0,
                       bbox_perceptual_hash_distance=2),
        OverlayContext(overlay_written=False, bbox_distance=None,
                       bbox_perceptual_hash_distance=None),
    ]
    frames = list(
        visualize_overlay_computation(
            iter(contexts), frames_per_context=5, video_square_side_length=64,
            horizontal_lines=VisualizeOverlayThresholds(phash_line=3, bbox_distance_line=2.0),
        )
    )
    assert len(frames) == 2
    assert frames[0].shape == (64, 64, 3)


def test_reshape_vectors_for_3d_matches_naive(rng):
    """The fast reshape equals the naive per-point loop (reference
    test_vector_visualization.py contract)."""
    data = rng.randn(4 * 8)
    x, y, z = reshape_vectors_for_3d_plotting(data, 8)
    naive = [
        (xi, yi, data.reshape(4, 8)[yi, xi])
        for yi in range(4)
        for xi in range(8)
    ]
    np.testing.assert_array_equal(x, [p[0] for p in naive])
    np.testing.assert_array_equal(y, [p[1] for p in naive])
    np.testing.assert_allclose(z, [p[2] for p in naive])


def test_3d_waterfall_renderers():
    data = gaussian_data(vector_length=32, num_vectors=10, sigmas=Sigmas(3, 0))
    label = VectorsLabel(data=data, vector_length=32, label="test")
    out = plot_vectors_3d(label, current_index=5, side_length=96)
    assert out.shape == (96, 96, 3)
    multi = multi_plot_vectors([label, label], side_length=96)
    assert multi.shape == (96, 192, 3)


def test_spectrogram_3d_composite():
    data = gaussian_data(vector_length=64, num_vectors=8, sigmas=Sigmas(3, 0))
    label = VectorsLabel(data=data, vector_length=64, label="composite")
    out = visualize_data_with_spectrogram_and_3d_vectors(label, side_length=96)
    assert out.shape == (96, 288, 3)


def test_examples(tmp_path):
    from gance_tpu.viz.examples import sigmas_demo, vertical_sweep_demo, waterfall_demo

    assert sigmas_demo(tmp_path, vector_length=64).exists()
    assert vertical_sweep_demo(tmp_path, vector_length=64).exists()
    assert waterfall_demo(tmp_path).exists()


def test_examples_audio_and_quicklook(tmp_path):
    """The full reference demo set runs headless on the real claps.wav asset
    (reference visualization_examples.py demos)."""
    from pathlib import Path

    from gance_tpu.viz.examples import (
        quick_look_demo,
        reducer_demo,
        rotation_demo,
        smoothing_demo,
        synthesis_frame_demo,
    )

    wav = Path("/root/reference/test/assets/claps.wav")
    if not wav.is_file():
        pytest.skip("reference audio asset not present on this host")
    assert smoothing_demo(tmp_path, wav, vector_length=256).exists()
    assert rotation_demo(tmp_path, wav, vector_length=256).exists()
    assert (tmp_path / "rotation_demo.mp4").exists()
    assert reducer_demo(tmp_path, wav).exists()
    assert synthesis_frame_demo(tmp_path, wav, vector_length=256).exists()
    assert quick_look_demo(tmp_path).exists()
    assert (tmp_path / "quick_look.mp4").exists()


def test_blog_media_demo(tmp_path):
    """The blog_post_media suite renders from fabricated assets (reference
    visualization_examples.py:175-278)."""
    from gance_tpu.viz.examples import blog_media_demo

    assert blog_media_demo(tmp_path).exists()
    for name in (
        "projection_final_small.png", "projection_final_large.png",
        "line_to_image.png", "sine_wav_to_image.png", "noise_image.png",
        "original_step.png",
    ):
        assert (tmp_path / name).exists()


def test_stage_timer():
    from gance_tpu.utils.profiling import StageTimer

    timer = StageTimer("test", log_every=2)
    for _ in range(5):
        timer.tick()
    stats = timer.summary()
    assert stats["count"] == 5
    assert stats["rate_per_sec"] > 0


def test_one_shot_vectors_video(tmp_path, rng):
    """vectors_single_network_visualization writes a 2:1 quick-look video
    (reference network_visualization.py:704-758)."""
    from gance_tpu.media.video import frames_in_video
    from gance_tpu.synthesis.runtime import FakeSynthesisNetwork
    from gance_tpu.types import VectorsLabel
    from gance_tpu.viz.one_shot import vectors_single_network_visualization

    network = FakeSynthesisNetwork(resolution=64, expected_vector_length=16)
    data = rng.randn(5 * 16).astype(np.float32)
    out = tmp_path / "quicklook.mp4"
    vectors_single_network_visualization(
        vectors_label=VectorsLabel(data=data, vector_length=16, label="demo"),
        output_video_path=out,
        network=network,
        video_height=64,
        video_fps=10.0,
    )
    assert out.is_file()
    video = frames_in_video(out)
    frames = list(video.frames)
    assert len(frames) == 5
    assert frames[0].shape == (64, 128, 3)  # [scatter | synthesis], 2:1


def test_one_shot_single_vector_image(tmp_path, rng):
    """single_vector_single_network_visualization writes one 2:1 image
    (reference network_visualization.py:761-800)."""
    from gance_tpu.media.images import read_image
    from gance_tpu.synthesis.runtime import FakeSynthesisNetwork
    from gance_tpu.viz.one_shot import single_vector_single_network_visualization

    network = FakeSynthesisNetwork(resolution=32, expected_vector_length=16)
    out = tmp_path / "single.png"
    single_vector_single_network_visualization(
        vector=rng.randn(16).astype(np.float32),
        title="one vector",
        output_image_path=out,
        network=network,
        image_height=64,
        y_range=(-3.0, 3.0),
    )
    image = read_image(out)
    assert image.shape == (64, 128, 3)
