"""
Projection subsystem — the reference's L4 (SURVEY.md §2.5): LPIPS-style latent
projection of video frames on TPU, plus the HDF5 "projection file" format v2
(reader/writer/verifier) kept schema-compatible with the reference.
"""

from gance_tpu.projection.projection_types import (
    ProjectionAttributes,
    complete_latents_to_matrix,
)
from gance_tpu.projection.file_reader import (
    ProjectionFileReader,
    final_latents_matrices_label,
    load_projection_file,
    verify_projection_file_assumptions,
)
from gance_tpu.projection.file_writer import ProjectionFileWriter, project_video_to_file

__all__ = [
    "ProjectionAttributes",
    "complete_latents_to_matrix",
    "ProjectionFileReader",
    "load_projection_file",
    "final_latents_matrices_label",
    "verify_projection_file_assumptions",
    "ProjectionFileWriter",
    "project_video_to_file",
]
