"""
Projection analytics + visualizations (reference gance/projection/
projection_visualization.py): convergence analysis of latent histories, the
[latents plot | target | final image] triptych video, and history re-synthesis.
"""

from pathlib import Path
from typing import List, Optional

import cv2
import numpy as np

from gance_tpu.media.video import add_wavs_to_video, write_source_to_disk_consume
from gance_tpu.projection.file_reader import ProjectionFileReader, load_projection_file
from gance_tpu.utils.hashing import hash_file
from gance_tpu.utils.logging import LOGGER


def visualize_final_latents(
    projection_file_path: Path,
    output_video_path: Path,
    audio_paths: Optional[List[Path]] = None,
    video_height: int = 400,
    video_fps: Optional[float] = None,
) -> None:
    """
    Per frame: [scatter of the final latent rows | target image | final image]
    hconcat video (reference :214-267).
    """
    from gance_tpu.media.images import horizontal_concat_images
    from gance_tpu.viz.panels import vector_visualizer

    with load_projection_file(projection_file_path) as reader:
        attrs = reader.projection_attributes
        fps = video_fps or attrs.projection_fps or 30.0

        def frames():
            render = vector_visualizer(
                y_range=(-12.0, 12.0),
                title="final latents",
                output_width=video_height,
                output_height=video_height,
            )
            for latents, target, final in zip(
                reader.final_latents, reader.target_images, reader.final_images
            ):
                tiles = [
                    render(latents),
                    cv2.resize(target, (video_height, video_height)),
                    cv2.resize(final, (video_height, video_height)),
                ]
                yield horizontal_concat_images(tiles)

        write_source_to_disk_consume(
            source=frames(),
            video_path=output_video_path,
            video_fps=fps,
            audio_paths=audio_paths,
        )


def projection_convergence(
    projection_file_path: Path,
) -> List[np.ndarray]:
    """
    Per-frame L1 distance of each history latent to the final latent — the signal
    behind the reference's "how many steps are enough" analysis (:59-211).
    :return: one distance-per-step array per frame.
    """
    with load_projection_file(projection_file_path) as reader:
        if not reader.projection_attributes.latents_histories_enabled:
            raise ValueError("Projection file has no latent histories to analyze.")
        finals = list(reader.final_latents)
        out: List[np.ndarray] = []
        for final, history in zip(finals, reader.latents_histories):
            distances = np.array([np.abs(step - final).sum() for step in history])
            out.append(distances)
        return out


def visualize_projection_convergence(
    projection_file_path: Path,
    output_image_path: Path,
    percent_projected: float = 0.8,
) -> None:
    """
    Plot per-frame convergence curves + the mean step at which `percent_projected`
    of the total distance has been covered (reference :59-211, used to pick
    production step counts per CHANGELOG 0.14.0).
    """
    import matplotlib.pyplot as plt

    curves = projection_convergence(projection_file_path)
    thresholds = []
    figure, axis = plt.subplots(1, 1, figsize=(12, 8), dpi=100)
    for frame_index, distances in enumerate(curves):
        axis.plot(distances, linewidth=1, alpha=0.6, label=f"frame {frame_index}")
        total_drop = distances[0] - distances[-1]
        if total_drop > 0:
            covered = (distances[0] - distances) / total_drop
            crossed = np.argmax(covered >= percent_projected)
            thresholds.append(int(crossed))
    if thresholds:
        mean_step = float(np.mean(thresholds))
        axis.axvline(mean_step, color="red", linestyle="--",
                     label=f"{percent_projected:.0%} projected (mean step {mean_step:.0f})")
    axis.set_xlabel("projection step")
    axis.set_ylabel("L1 distance to final latent")
    axis.legend(fontsize=6)
    figure.savefig(str(output_image_path))
    plt.close(figure)
    LOGGER.info("Wrote convergence analysis to %s", output_image_path)


def visualize_projection_history(
    projection_file_path: Path,
    output_video_path: Path,
    network_path: Path,
    network_not_matching_ok: bool = False,
    video_fps: float = 30.0,
    steps_stride: int = 1,
) -> None:
    """
    Re-synthesize every latent-history step through a network next to the target
    (reference :308-381; verifies the network md5 against the file attrs unless
    `network_not_matching_ok`).
    """
    from gance_tpu.media.images import horizontal_concat_images
    from gance_tpu.synthesis.runtime import SynthesisNetwork

    with load_projection_file(projection_file_path) as reader:
        attrs = reader.projection_attributes
        actual_hash = hash_file(Path(network_path))
        if actual_hash != attrs.network_md5_hash and not network_not_matching_ok:
            raise ValueError(
                f"Network hash {actual_hash} != projection file's "
                f"{attrs.network_md5_hash}; pass network_not_matching_ok to override."
            )
        network = SynthesisNetwork.from_pkl(Path(network_path))
        side = network.resolution

        def frames():
            for target, history in zip(reader.target_images, reader.latents_histories):
                target_tile = cv2.resize(target, (side, side))
                for step_index, latents in enumerate(history):
                    if step_index % steps_stride:
                        continue
                    image = network.images_from_matrices(latents[None])[0]
                    yield horizontal_concat_images([target_tile, image])

        write_source_to_disk_consume(
            source=frames(), video_path=output_video_path, video_fps=video_fps
        )


def visualize_partial_projection_history(
    projection_file_path: Path,
    output_video_path: Path,
    network_path: Path,
    step: int,
    network_not_matching_ok: bool = False,
    video_fps: float = 30.0,
) -> None:
    """
    Re-synthesize a single chosen history step across all frames next to the
    targets (reference :384-451).
    """
    from gance_tpu.media.images import horizontal_concat_images
    from gance_tpu.projection.file_reader import network_outputs_at_projection_step
    from gance_tpu.synthesis.runtime import SynthesisNetwork

    with load_projection_file(projection_file_path) as reader:
        attrs = reader.projection_attributes
        actual_hash = hash_file(Path(network_path))
        if actual_hash != attrs.network_md5_hash and not network_not_matching_ok:
            raise ValueError(
                f"Network hash {actual_hash} != projection file's "
                f"{attrs.network_md5_hash}; pass network_not_matching_ok to override."
            )
        network = SynthesisNetwork.from_pkl(Path(network_path))
        side = network.resolution
        resynth = network_outputs_at_projection_step(reader, network, step)

        def frames():
            for target, image in zip(reader.target_images, resynth):
                yield horizontal_concat_images(
                    [cv2.resize(target, (side, side)), image]
                )

        write_source_to_disk_consume(
            source=frames(), video_path=output_video_path, video_fps=video_fps
        )
