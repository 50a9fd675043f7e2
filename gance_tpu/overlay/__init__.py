"""
Face/eye overlay subsystem — the reference's L5b (SURVEY.md §2.7): find eyes in the
projection-target (foreground) and synthesized (background) frames, gate on bbox
distance + perceptual-hash similarity of the eye crops, and composite the foreground
eye regions over the background.

Backend note: the reference uses dlib via face_recognition; neither exists on this
machine class, so detection runs on OpenCV Haar cascades behind the same proxy API
(gance_tpu.overlay.faces). The perceptual hash is a batched JAX DCT (imagehash.phash
semantics) instead of per-frame PIL/scipy.
"""

from gance_tpu.overlay.common import (
    BoundingBox,
    OverlayResult,
    bounding_box_distance,
    landmarks_to_bounding_boxes,
    write_boxes_onto_image,
)
from gance_tpu.overlay.eye_tracking import OverlayContext, compute_eye_tracking_overlay
from gance_tpu.overlay.phash import phash, phash_distance

__all__ = [
    "BoundingBox",
    "OverlayResult",
    "OverlayContext",
    "bounding_box_distance",
    "landmarks_to_bounding_boxes",
    "write_boxes_onto_image",
    "compute_eye_tracking_overlay",
    "phash",
    "phash_distance",
]
