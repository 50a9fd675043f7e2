"""
Doc-by-example invocations of the visualization stack (reference gance/
data_into_network_visualization/visualization_examples.py + the primitives' demo
functions). Each example renders to files under an output directory instead of
opening interactive windows (no display on TPU hosts).
"""

from pathlib import Path

from gance_tpu.audio.primitives import Sigmas, gaussian_data, square_wave_sweep_vertical
from gance_tpu.media.images import write_image
from gance_tpu.types import VectorsLabel
from gance_tpu.viz.vectors_3d import (
    multi_plot_vectors,
    plot_vectors_3d,
    visualize_data_with_spectrogram_and_3d_vectors,
)


def sigmas_demo(output_directory: Path, vector_length: int = 256) -> Path:
    """Visualize the effect of the gaussian-noise sigma parameter (reference
    primatives.py sigmas_demo)."""
    frame = multi_plot_vectors(
        [
            VectorsLabel(
                data=gaussian_data(
                    vector_length=vector_length, num_vectors=50,
                    sigmas=Sigmas(sigma, sigma),
                ),
                label=f"gaussian, sigma: {sigma}",
                vector_length=vector_length,
            )
            for sigma in (1, 20, 80)
        ],
        side_length=300,
    )
    out = Path(output_directory) / "sigmas_demo.png"
    write_image(frame, out)
    return out


def vertical_sweep_demo(output_directory: Path, vector_length: int = 100) -> Path:
    """Square-wave sweep composite (reference primatives.py vertical_sweep_demo)."""
    data = square_wave_sweep_vertical(
        vector_length=vector_length, rising_edge_x=0, pulse_width=50,
        y_offset=0, y_amplitude=5,
    )
    frame = visualize_data_with_spectrogram_and_3d_vectors(
        VectorsLabel(data=data, vector_length=vector_length, label="Vertical Sweep"),
        side_length=300,
    )
    out = Path(output_directory) / "vertical_sweep_demo.png"
    write_image(frame, out)
    return out


def waterfall_demo(output_directory: Path) -> Path:
    """Single 3D waterfall of smoothed noise."""
    data = gaussian_data(vector_length=128, num_vectors=60, sigmas=Sigmas(30, 0))
    frame = plot_vectors_3d(
        VectorsLabel(data=data, vector_length=128, label="smoothed noise"),
        current_index=30,
    )
    out = Path(output_directory) / "waterfall_demo.png"
    write_image(frame, out)
    return out
