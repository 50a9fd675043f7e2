"""
Overlay subsystem tests: phash semantics vs a numpy re-derivation, bbox math,
mask compositing, face/eye detection on the reference's real face asset, and the
end-to-end eye-tracking gating stream.
"""

import numpy as np
import pytest

from gance_tpu.media.images import read_image
from gance_tpu.overlay.common import (
    bounding_box_center,
    bounding_box_distance,
    draw_mask,
    landmarks_to_bounding_boxes,
    write_boxes_onto_image,
)
from gance_tpu.overlay.eye_tracking import compute_eye_tracking_overlay
from gance_tpu.overlay.faces import FaceFinderProxy
from gance_tpu.overlay.phash import phash, phash_batch, phash_distance
from gance_tpu.types import BoundingBox, ImageResolution

FACE_IMAGE = "/root/reference/test/assets/face_image.jpeg"
NO_FACE_IMAGE = "/root/reference/test/assets/no_face_image.jpeg"


def test_phash_matches_numpy_derivation(rng):
    import cv2
    import scipy.fftpack

    img = (rng.rand(50, 60, 3) * 255).astype(np.uint8)
    got = phash(img)

    gray = (img[..., 0] * 0.299 + img[..., 1] * 0.587 + img[..., 2] * 0.114).astype(
        np.float32
    )
    resized = cv2.resize(gray, (32, 32), interpolation=cv2.INTER_AREA)
    dct = scipy.fftpack.dct(scipy.fftpack.dct(resized, axis=0), axis=1)
    low = dct[:8, :8].flatten()
    want = low > np.median(low)
    np.testing.assert_array_equal(got, want)


def test_phash_identical_and_different(rng):
    a = (rng.rand(40, 40, 3) * 255).astype(np.uint8)
    b = (rng.rand(40, 40, 3) * 255).astype(np.uint8)
    assert phash_distance(phash(a), phash(a)) == 0
    assert phash_distance(phash(a), phash(b)) > 0
    # batch == individual
    batch = phash_batch([a, b])
    np.testing.assert_array_equal(batch[0], phash(a))
    np.testing.assert_array_equal(batch[1], phash(b))


def test_landmarks_to_bounding_boxes():
    landmarks = [{
        "left_eye": [(10, 20), (14, 18), (18, 20), (14, 22)],
        "right_eye": [(30, 20), (34, 18), (38, 20), (34, 22)],
    }]
    boxes = landmarks_to_bounding_boxes(landmarks)
    assert len(boxes) == 1
    box = boxes[0]
    assert (box.x, box.y) == (10, 18)
    assert box.width == 29 and box.height == 5  # cv2.boundingRect is inclusive+1


def test_bounding_box_distance():
    a = [BoundingBox(0, 0, 10, 10)]
    b = [BoundingBox(0, 0, 10, 10), BoundingBox(100, 100, 10, 10)]
    result = bounding_box_distance(a, b)
    assert result.distance == 0.0
    assert result.b_box == b[0]
    assert bounding_box_distance([], b) is None
    assert bounding_box_center(BoundingBox(0, 0, 10, 20)) == (5.0, 10.0)


def test_draw_mask_and_composite():
    resolution = ImageResolution(width=100, height=80)
    boxes = [BoundingBox(40, 30, 20, 10)]
    mask = draw_mask(resolution, boxes)
    assert mask.shape == (80, 100)
    assert mask[35, 50] == 255  # inside the box
    assert mask[5, 5] == 0  # far corner

    fg = np.full((80, 100, 3), 200, np.uint8)
    bg = np.zeros((80, 100, 3), np.uint8)
    out = write_boxes_onto_image(fg, bg, boxes)
    assert out[35, 50, 0] == 200
    assert out[5, 5, 0] == 0


def test_face_finder_on_real_assets():
    finder = FaceFinderProxy()
    face_img = read_image(FACE_IMAGE)
    locations = finder.face_locations(face_img)
    assert len(locations) >= 1
    landmarks = finder.face_landmarks(face_img)
    assert len(landmarks) >= 1
    assert "left_eye" in landmarks[0] and "right_eye" in landmarks[0]
    boxes = landmarks_to_bounding_boxes(landmarks)
    assert boxes[0].width > 0 and boxes[0].height > 0

    no_face = finder.face_locations(read_image(NO_FACE_IMAGE))
    assert len(no_face) == 0


def test_eye_tracking_overlay_identical_frames():
    """Identical face frames -> bbox distance 0, phash distance 0 -> overlay on."""
    face_img = read_image(FACE_IMAGE)
    frames = [face_img] * 3
    result = compute_eye_tracking_overlay(
        iter(frames), iter(frames), min_phash_distance=30, min_bbox_distance=50.0
    )
    boxes = list(result.bbox_lists)
    contexts = list(result.contexts)
    assert len(boxes) == len(contexts) == 3
    for box_list, ctx in zip(boxes, contexts):
        assert ctx.overlay_written
        assert ctx.bbox_distance == 0.0
        assert ctx.bbox_perceptual_hash_distance == 0
        assert box_list


def test_eye_tracking_overlay_no_faces(rng):
    noise = [(rng.rand(64, 64, 3) * 255).astype(np.uint8) for _ in range(2)]
    result = compute_eye_tracking_overlay(
        iter(noise), iter(noise), min_phash_distance=30, min_bbox_distance=50.0
    )
    contexts = list(result.contexts)
    assert all(not c.overlay_written for c in contexts)
    assert all(b is None for b in result.bbox_lists)


def test_eye_tracking_overlay_skip_mask():
    face_img = read_image(FACE_IMAGE)
    frames = [face_img] * 2
    result = compute_eye_tracking_overlay(
        iter(frames), iter(frames), min_phash_distance=30, min_bbox_distance=50.0,
        skip_mask=[True, False],
    )
    contexts = list(result.contexts)
    assert not contexts[0].overlay_written
    assert contexts[1].overlay_written
