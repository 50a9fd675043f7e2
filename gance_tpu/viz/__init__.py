"""
Matplotlib debug visualizations — the reference's L3 debug-viz stack
(gance/data_into_network_visualization/ + overlay_visualization.py), kept host-side
and optional: these render diagnostic panels, not product frames, so they stay off
the TPU path entirely and only run when a --debug-path is requested.
"""

import matplotlib

matplotlib.use("Agg")

from gance_tpu.viz.panels import (  # noqa: E402
    render_figure_to_rgb,
    synthesis_visualizer,
    vector_visualizer,
)
from gance_tpu.viz.reduction_viz import visualize_result_layers  # noqa: E402
from gance_tpu.viz.overlay_viz import (  # noqa: E402
    VisualizeOverlayThresholds,
    visualize_overlay_computation,
)

__all__ = [
    "render_figure_to_rgb",
    "synthesis_visualizer",
    "vector_visualizer",
    "visualize_result_layers",
    "visualize_overlay_computation",
    "VisualizeOverlayThresholds",
]
