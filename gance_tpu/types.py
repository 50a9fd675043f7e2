"""
Canonical array/type aliases for the framework.

The reference encodes its latent taxonomy as numpy NewTypes (gance/vector_sources/
vector_types.py:19-36) and admits in its README (README.md:88-112) that they are
type-unsound. Here the taxonomy is kept as documented aliases plus runtime shape
helpers; arrays are jnp/np interchangeable (everything accepts ArrayLike).

Shape taxonomy (dim V = latent/vector length, usually 512; R = style rows, 18 @1024px):
  SingleVector          (V,)
  ConcatenatedVectors   (N*V,)   — N vectors laid out flat along time
  DividedVectors        (N, V)
  SingleMatrix          (R, V)
  ConcatenatedMatrices  (R, N*V) — per-row flat time layout
  DividedMatrices       (N, R, V)

Image taxonomy (reference gance/gance_types.py:31-34):
  RGBInt8Image          (H, W, 3) uint8
  ImageBatch            (B, H, W, 3) uint8  — the TPU-native unit of synthesis
  ImageSourceType       Iterator[RGBInt8Image] — kept for streaming media IO
"""

from typing import Iterator, List, NamedTuple, Optional, Tuple, Union

import numpy as np

# --- array aliases (documentation-grade; runtime checks via helpers below) -----------
ArrayLike = Union[np.ndarray, "jax.Array"]  # noqa: F821 - avoid importing jax here

SingleVector = np.ndarray
ConcatenatedVectors = np.ndarray
DividedVectors = np.ndarray
SingleMatrix = np.ndarray
ConcatenatedMatrices = np.ndarray
DividedMatrices = np.ndarray

RGBInt8Image = np.ndarray
ImageBatch = np.ndarray
ImageSourceType = Iterator[np.ndarray]


def is_vector(data: ArrayLike) -> bool:
    """True when `data` is vector-shaped (ndim < 2). Reference vector_types.py:58."""
    return np.ndim(data) < 2


def underlying_length(data: ArrayLike) -> int:
    """
    Vector length of flat vector data, or row length of matrix data.
    Reference vector_sources_common.py:124-133.
    """
    shape = np.shape(data)
    return int(shape[0] if len(shape) < 2 else shape[1])


class VectorsLabel(NamedTuple):
    """Flat vector data + its sub-vector length + a display label."""

    data: ConcatenatedVectors
    vector_length: int
    label: str


class MatricesLabel(NamedTuple):
    """Matrix data (R, N*V) + sub-vector length + a display label."""

    data: ConcatenatedMatrices
    vector_length: int
    label: str


class LabeledCoordinates(NamedTuple):
    """A bounding box as (top, right, bottom, left). Reference gance_types.py:10."""

    top: int
    right: int
    bottom: int
    left: int


class BoundingBox(NamedTuple):
    """A bounding box as (x, y, width, height). Reference overlay_common.py:19."""

    x: int
    y: int
    width: int
    height: int


class PathAndBoundingBoxes(NamedTuple):
    """A file path + the bounding boxes found within. Reference gance_types.py:21."""

    path_to_file: str
    bounding_boxes: Optional[Tuple[LabeledCoordinates, ...]]


class ImageResolution(NamedTuple):
    """(width, height) of an image. Reference image_sources_common.py."""

    width: int
    height: int


def image_resolution(image: np.ndarray) -> ImageResolution:
    """Resolution of an (H, W, C) image array."""
    return ImageResolution(width=int(image.shape[1]), height=int(image.shape[0]))


class DataLabel(NamedTuple):
    """A scalar-per-frame signal + label. Reference visualization_common.py:30."""

    data: np.ndarray
    label: str


class ResultLayers(NamedTuple):
    """
    A reducer output: `result` is consumed downstream, `layers` record the provenance
    signals for debug visualization. Reference visualization_common.py:40-47.
    """

    result: DataLabel
    layers: List[DataLabel]
