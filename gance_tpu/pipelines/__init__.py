"""
Top-level pipelines — the reference's L6 (SURVEY.md §2.8): audio → video assemblies
wiring the DSP, synthesis runtime, projection files, overlay, and media IO together.
"""

from gance_tpu.pipelines.noise_blend import noise_blend_api
from gance_tpu.pipelines.projection_file_blend import projection_file_blend_api

__all__ = ["noise_blend_api", "projection_file_blend_api"]
