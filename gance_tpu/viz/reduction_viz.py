"""
Streaming visualization of reducer outputs + provenance layers (reference
gance/data_into_network_visualization/visualize_vector_reduction.py): windowed line
plots of each ResultLayers signal with a moving per-frame cursor. Used for the
music-complexity overlay-mask debug tile.
"""

from typing import Iterator, Optional

import matplotlib.pyplot as plt
import numpy as np

from gance_tpu.types import ResultLayers
from gance_tpu.viz.panels import render_figure_to_rgb


def visualize_result_layers(
    result_layers: ResultLayers,
    frames_per_context: int,
    video_height: int,
    title: str = "",
    horizontal_line: Optional[float] = None,
) -> Iterator[np.ndarray]:
    """
    Yield one debug frame per sample: the result + layer signals plotted in windows
    of `frames_per_context`, with a red cursor at the current frame.
    """
    signals = [result_layers.result] + list(result_layers.layers)
    length = len(np.asarray(result_layers.result.data))

    for frame_index in range(length):
        window_start = (frame_index // frames_per_context) * frames_per_context
        window_end = min(window_start + frames_per_context, length)
        xs = np.arange(window_start, window_end)

        figure, axis = plt.subplots(1, 1, figsize=(10, 10), dpi=100)
        for signal in signals:
            data = np.asarray(signal.data, dtype=float)
            axis.plot(xs, data[window_start:window_end], label=signal.label, linewidth=1)
        if horizontal_line is not None:
            axis.axhline(horizontal_line, color="black", linestyle="--", linewidth=1)
        axis.axvline(frame_index, color="red", linewidth=1)
        axis.set_title(title, fontsize=9)
        axis.legend(fontsize=6)
        axis.tick_params(labelsize=6)

        out = render_figure_to_rgb(figure, video_height)
        plt.close(figure)
        yield out
