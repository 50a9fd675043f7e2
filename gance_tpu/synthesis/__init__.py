"""
Synthesis runtime + orchestration — the reference's L1 network interface
(network_functions.py) and L3 synthesis engine (network_visualization.py) rebuilt
TPU-first:

  * No child processes: jitted JAX functions are pure; "unloading" a network is
    dropping its param arrays (the reference's process-kill dance existed only
    because TF1 graphs leak — SURVEY.md §2.10 row 1).
  * No per-frame Python: frames are synthesized in fixed-size batches; per-frame
    network switching becomes run-length segmentation of the index stream, with all
    candidate networks' params resident in HBM (the reference's sort-by-index +
    disk-spill optimization at network_visualization.py:653-674 is unnecessary —
    switching params costs nothing when they're all on device).
  * Streaming order is preserved: batches are emitted in frame order, so media
    writers consume a constant-memory stream exactly like the reference's iterators.
"""

from gance_tpu.synthesis.runtime import FakeSynthesisNetwork, MultiNetwork, SynthesisNetwork
from gance_tpu.synthesis.inputs import (
    VisualizationInput,
    alpha_blend_projection_file,
    alpha_blend_vectors_max_rms_power_audio,
)
from gance_tpu.synthesis.orchestration import SynthesisOutput, vector_synthesis

__all__ = [
    "SynthesisNetwork",
    "FakeSynthesisNetwork",
    "MultiNetwork",
    "VisualizationInput",
    "alpha_blend_vectors_max_rms_power_audio",
    "alpha_blend_projection_file",
    "SynthesisOutput",
    "vector_synthesis",
]
