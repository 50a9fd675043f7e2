"""
Coverage for the remaining surfaces: face-prioritized training-set selection,
select-images-copy CLI, the projection visualize-final-latents CLI, partial-history
visualization, and convergence analytics.
"""

from pathlib import Path

import jax
import numpy as np
import pytest
from click.testing import CliRunner

from gance_tpu.media.images import read_image, write_image
from gance_tpu.media.video import frames_in_video, write_source_to_disk_consume
from gance_tpu.models.pickle_loader import save_generator_pickle
from gance_tpu.models.stylegan2 import GeneratorConfig, init_generator_params

FACE_IMAGE = Path("/root/reference/test/assets/face_image.jpeg")
NO_FACE_IMAGE = Path("/root/reference/test/assets/no_face_image.jpeg")

TINY = GeneratorConfig(resolution=16, fmap_base=256, fmap_max=32, latent_size=32,
                       dlatent_size=32, mapping_layers=2, mapping_fmaps=32)


@pytest.fixture(scope="module")
def capture_dirs(tmp_path_factory):
    """Primary/secondary capture dirs with Pi-style timestamped names."""
    import cv2

    base = tmp_path_factory.mktemp("captures")
    primary = base / "primary"
    secondary = base / "secondary"
    primary.mkdir()
    secondary.mkdir()

    face = cv2.resize(read_image(FACE_IMAGE), (100, 100))
    no_face = cv2.resize(read_image(NO_FACE_IMAGE), (100, 100))

    # timestamped sequence: no-face, no-face, FACE, no-face, no-face
    for i, img in enumerate([no_face, no_face, face, no_face, no_face]):
        write_image(img, primary / f"cam_01-0{i + 1}-2021_10-00-0{i}-000000.jpeg")
    write_image(face, secondary / "extra_face.jpeg")
    write_image(no_face, secondary / "extra_no_face.jpeg")
    return primary, secondary


def test_selection_priority(capture_dirs):
    from gance_tpu.overlay.selection import select_images_for_training

    primary, secondary = capture_dirs
    result = select_images_for_training(
        primary_directories=[primary], secondary_directories=[secondary], num_images=5
    )
    assert len(result.selected) == 5
    # the primary face image is selected first
    assert result.num_primary_faces == 1
    assert "10-00-02" in result.selected[0].name
    # then the secondary face
    assert result.num_secondary_faces == 1
    assert result.selected[1].name == "extra_face.jpeg"
    # then temporal neighbors of the primary face
    assert result.num_neighbors >= 2


def test_timestamp_ordering(capture_dirs):
    from gance_tpu.overlay.selection import images_in_directory, timestamp_from_filename

    primary, _ = capture_dirs
    ordered = images_in_directory(primary)
    stamps = [timestamp_from_filename(p) for p in ordered]
    assert all(s is not None for s in stamps)
    assert stamps == sorted(stamps)


def test_select_images_copy_cli(capture_dirs, tmp_path):
    from gance_tpu.cli.process_images import cli

    primary, secondary = capture_dirs
    out = tmp_path / "selected"
    result = CliRunner().invoke(
        cli,
        [
            "select-images-copy",
            "--primary-directory", str(primary),
            "--secondary-directory", str(secondary),
            "--output-directory", str(out),
            "--num-images", "3",
        ],
        catch_exceptions=False,
    )
    assert result.exit_code == 0
    copied = [p for p in out.iterdir() if p.suffix == ".jpeg"]
    assert len(copied) == 3
    assert (out / "selection_summary.json").exists()


def test_select_images_copy_cli_reference_spellings(capture_dirs, tmp_path):
    """
    Reference option names (process_images.py:193-337): --destination-directory,
    --summary, and an omitted --target-num-images selecting every image.
    """
    import json

    from gance_tpu.cli.process_images import cli

    primary, secondary = capture_dirs
    out = tmp_path / "dest"
    summary_path = tmp_path / "summary.json"
    result = CliRunner().invoke(
        cli,
        [
            "select-images-copy",
            "--primary-directory", str(primary),
            "--secondary-directory", str(secondary),
            "--destination-directory", str(out),
            "--summary", str(summary_path),
        ],
        catch_exceptions=False,
    )
    assert result.exit_code == 0
    # no target -> everything (5 primary + 2 secondary)
    copied = [p for p in out.iterdir() if p.suffix == ".jpeg"]
    assert len(copied) == 7
    summary = json.loads(summary_path.read_text())
    assert summary["num_selected"] == 7
    # explicit --summary replaces the default in-destination summary file
    assert not (out / "selection_summary.json").exists()


@pytest.fixture(scope="module")
def projection_with_histories(tmp_path_factory):
    from gance_tpu.projection.file_writer import project_video_to_file

    d = tmp_path_factory.mktemp("projviz")
    params = init_generator_params(jax.random.PRNGKey(0), TINY)
    pkl = d / "net.pkl"
    save_generator_pickle(params, pkl)
    rng = np.random.RandomState(1)
    frames = [(rng.rand(16, 16, 3) * 255).astype(np.uint8) for _ in range(2)]
    video = d / "src.mp4"
    write_source_to_disk_consume(iter(frames), video, video_fps=30.0)
    out = d / "proj.hdf5"
    project_video_to_file(
        path_to_video=video, path_to_network=pkl, projection_file_path=out,
        steps_per_projection=3, latents_histories_enabled=True,
    )
    return d, pkl, out


def test_visualize_final_latents_cli(projection_with_histories, tmp_path):
    from gance_tpu.cli.project_video_to_file import cli

    _, _, proj = projection_with_histories
    out = tmp_path / "triptych.avi"
    result = CliRunner().invoke(
        cli,
        [
            "visualize-final-latents",
            "--projection-file", str(proj),
            "--output-path", str(out),
            "--video-height", "64",
        ],
        catch_exceptions=False,
    )
    assert result.exit_code == 0
    frames = list(frames_in_video(out).frames)
    assert len(frames) == 2
    assert frames[0].shape == (64, 192, 3)  # latents | target | final


def test_partial_history_and_convergence(projection_with_histories, tmp_path):
    from gance_tpu.projection.visualization import (
        projection_convergence,
        visualize_partial_projection_history,
        visualize_projection_convergence,
    )

    d, pkl, proj = projection_with_histories
    curves = projection_convergence(proj)
    assert len(curves) == 2 and len(curves[0]) == 3

    png = tmp_path / "convergence.png"
    visualize_projection_convergence(proj, png)
    assert png.exists() and png.stat().st_size > 1000

    # frame cap + the spline-derivative / percent-projected analytics
    from gance_tpu.projection.visualization import percent_projected_steps

    capped = projection_convergence(proj, consider_first_n_frames=1)
    assert len(capped) == 1
    steps = percent_projected_steps(curves)
    assert len(steps) == 2 and all(0 <= s < 3 for s in steps)
    png2 = tmp_path / "convergence_capped.png"
    visualize_projection_convergence(proj, png2, consider_first_n_frames=1)
    assert png2.exists() and png2.stat().st_size > 1000

    vid = tmp_path / "partial.mp4"
    visualize_partial_projection_history(proj, vid, pkl, step=1)
    frames = list(frames_in_video(vid).frames)
    assert len(frames) == 2
    assert frames[0].shape == (16, 32, 3)

    # wrong network hash is rejected
    other = d / "other.pkl"
    save_generator_pickle(init_generator_params(jax.random.PRNGKey(9), TINY), other)
    with pytest.raises(ValueError, match="hash"):
        visualize_partial_projection_history(proj, tmp_path / "x.mp4", other, step=0)


def test_visualize_projection_history(projection_with_histories, tmp_path):
    from gance_tpu.projection.visualization import visualize_projection_history

    _, pkl, proj = projection_with_histories
    vid = tmp_path / "history.mp4"
    visualize_projection_history(proj, vid, pkl, steps_stride=2)
    frames = list(frames_in_video(vid).frames)
    assert len(frames) == 4  # 2 frames x ceil(3/2) steps
