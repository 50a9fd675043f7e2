"""
Still-image IO + compositing helpers (reference gance/image_sources/
still_image_common.py).
"""

from pathlib import Path
from typing import Iterable

import cv2
import numpy as np
from PIL import Image

PNG = "png"


def read_image(image_path: Path) -> np.ndarray:
    """Read an image file to an RGB uint8 array (reference :19-30)."""
    with Image.open(str(image_path)) as img:
        return np.asarray(img.convert("RGB"))


def write_image(image: np.ndarray, path: Path) -> None:
    """Write an RGB uint8 array as PNG/JPEG by extension (reference :33-45)."""
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(np.asarray(image, np.uint8)).save(str(path))


def horizontal_concat_images(images: Iterable[np.ndarray]) -> np.ndarray:
    """hconcat a list of same-height images (reference :48-60)."""
    images = list(images)
    if not images:
        raise ValueError("No images to concatenate")
    return cv2.hconcat([np.asarray(i, np.uint8) for i in images])
