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


def test_eye_detection_is_real_not_fabricated():
    """
    Landmarks come from actual eye-cascade detections by default: the boxes must
    sit inside the detected face and differ from the geometric prior a
    fabricating finder would emit on an eyeless input.
    """
    finder = FaceFinderProxy()  # fabricate_missing_eyes defaults to False
    face_img = read_image(FACE_IMAGE)
    faces = finder.face_locations(face_img)
    landmarks = finder.face_landmarks(face_img)
    assert len(landmarks) >= 1
    top, right, bottom, left = faces[0]
    for marks in landmarks:
        for eye in ("left_eye", "right_eye"):
            xs = [p[0] for p in marks[eye]]
            ys = [p[1] for p in marks[eye]]
            assert left <= min(xs) and max(xs) <= right
            assert top <= min(ys) and max(ys) <= bottom

    # a flat gray face-shaped blob: the face cascade can't fire -> no landmarks,
    # and even if a false face fired, zero detected eyes must emit nothing
    flat = np.full((256, 256, 3), 128, np.uint8)
    assert finder.face_landmarks(flat) == []


def test_fabricate_missing_eyes_opt_in(monkeypatch):
    """With zero eye detections: default emits no landmarks; opt-in fabricates."""
    from gance_tpu.overlay import faces as faces_mod

    gated = FaceFinderProxy()
    fabricating = FaceFinderProxy(fabricate_missing_eyes=True)
    for finder in (gated, fabricating):
        finder._ensure_loaded()

    # force the eye stage to find nothing while keeping the real face detection
    real_detect = faces_mod.haar.detect

    def no_eyes(gray, cascade, **kwargs):
        if cascade is gated._eye or cascade is fabricating._eye:
            return []
        return real_detect(gray, cascade, **kwargs)

    monkeypatch.setattr(faces_mod.haar, "detect", no_eyes)
    face_img = read_image(FACE_IMAGE)
    assert gated.face_landmarks(face_img) == []
    fabricated = fabricating.face_landmarks(face_img)
    assert len(fabricated) == 1
    assert "left_eye" in fabricated[0]


@pytest.mark.slow
def test_overlay_gating_on_devon_video():
    """
    End-to-end gate on the reference's real face video
    (devon_face_sample_short.mp4): same-frame pairs must overlay on real eye
    detections; face frames against pure noise must not.
    """
    from gance_tpu.media.video import frames_in_video

    video = frames_in_video(
        "/root/reference/test/assets/devon_face_sample_short.mp4"
    )
    frames = [f for f, _ in zip(video.frames, range(3))]
    assert frames[0].ndim == 3

    finder = FaceFinderProxy()
    detections = [landmarks_to_bounding_boxes(finder.face_landmarks(f)) for f in frames]
    frames_with_eyes = [f for f, d in zip(frames, detections) if d]
    # the clip is a closeup face video: eyes must actually be found
    assert len(frames_with_eyes) >= 1

    pairs = frames_with_eyes[:2] if len(frames_with_eyes) >= 2 else frames_with_eyes
    result = compute_eye_tracking_overlay(
        iter(pairs), iter(pairs), min_phash_distance=30, min_bbox_distance=50.0
    )
    contexts = list(result.contexts)
    assert all(c.overlay_written for c in contexts)

    rng = np.random.RandomState(0)
    noise = [(rng.rand(*pairs[0].shape) * 255).astype(np.uint8) for _ in pairs]
    result = compute_eye_tracking_overlay(
        iter(pairs), iter(noise), min_phash_distance=30, min_bbox_distance=50.0
    )
    assert all(not c.overlay_written for c in result.contexts)


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


def test_detection_side_matches_full_resolution_boxes():
    """
    The opt-in downscaled-detection mode must return eye boxes in FULL-resolution
    coordinates, close to the full-resolution detection on a real face (the
    gating thresholds are calibrated in full-res pixels).
    """
    import cv2

    from gance_tpu.overlay.eye_tracking import _landmarks_at_detection_side

    finder = FaceFinderProxy()
    face_img = cv2.resize(read_image(FACE_IMAGE), (1024, 1024))
    full = landmarks_to_bounding_boxes(
        _landmarks_at_detection_side(finder, face_img, None)
    )
    small = landmarks_to_bounding_boxes(
        _landmarks_at_detection_side(finder, face_img, 512)
    )
    assert len(full) == len(small) == 1
    fx, fy = full[0].x + full[0].width / 2, full[0].y + full[0].height / 2
    sx, sy = small[0].x + small[0].width / 2, small[0].y + small[0].height / 2
    # centers within 5% of the frame side of each other
    assert abs(fx - sx) <= 51 and abs(fy - sy) <= 51


def test_eye_tracking_overlay_detection_side_still_gates():
    """detection_side active: identical frames still pass both overlay gates."""
    face_img = read_image(FACE_IMAGE)
    frames = [face_img] * 2
    result = compute_eye_tracking_overlay(
        iter(frames), iter(frames), min_phash_distance=30, min_bbox_distance=50.0,
        detection_side=512,
    )
    contexts = list(result.contexts)
    boxes = list(result.bbox_lists)
    assert all(c.overlay_written for c in contexts)
    assert all(b for b in boxes)


def test_eye_tracking_overlay_threaded_matches_sequential():
    """
    detection_workers>1 must produce frame-ordered, identical decisions to the
    sequential path (frames are independent; the detector is stateless).
    """
    face_img = read_image(FACE_IMAGE)
    fg = [face_img] * 4
    bg = [face_img] * 4

    def run(workers):
        r = compute_eye_tracking_overlay(
            iter(fg), iter(bg), min_phash_distance=30, min_bbox_distance=50.0,
            skip_mask=[False, True, False, False], detection_workers=workers,
        )
        return list(r.bbox_lists), list(r.contexts)

    seq_boxes, seq_ctx = run(1)
    par_boxes, par_ctx = run(3)
    assert seq_ctx == par_ctx
    assert seq_boxes == par_boxes
    assert not seq_ctx[1].overlay_written  # skip_mask respected in both


class TestTemporalSmoothing:
    """The --overlay-smoothing plateau: geometry averages over a trailing
    window, history resets on gaps and scene cuts, decisions stabilize."""

    @staticmethod
    def _record(x, phash=0, fg_extra=()):
        from gance_tpu.overlay.common import DistanceBoxes
        from gance_tpu.overlay.eye_tracking import _DetectionRecord
        from gance_tpu.types import BoundingBox

        a = BoundingBox(x, 10, 20, 10)
        b = BoundingBox(x + 4, 12, 20, 10)
        return _DetectionRecord(
            skip=False,
            foreground_boxes=[a, *fg_extra],
            distance_boxes=DistanceBoxes(
                distance=float(np.hypot(4, 2)), a_box=a, b_box=b
            ),
            bbox_phash_distance=phash,
        )

    def test_smoothing_averages_boxes(self):
        from gance_tpu.overlay.eye_tracking import _smoothed_decisions

        records = [self._record(x) for x in (10, 14, 18)]
        results = list(
            _smoothed_decisions(
                iter(records), window=3, min_phash_distance=5,
                min_bbox_distance=100.0,
            )
        )
        assert all(r.context.overlay_written for r in results)
        # frame 2's drawn box x = mean(10, 14, 18) = 14
        assert results[2].foreground_bounding_boxes[0].x == 14
        # frame 0 has no history: its own box
        assert results[0].foreground_bounding_boxes[0].x == 10

    def test_history_resets_on_gap_and_jump(self):
        from gance_tpu.overlay.eye_tracking import _DetectionRecord, _smoothed_decisions

        gap = _DetectionRecord(skip=True)
        # 500px jump >> 2 * box size: scene cut
        records = [self._record(10), gap, self._record(12), self._record(512)]
        results = list(
            _smoothed_decisions(
                iter(records), window=5, min_phash_distance=5,
                min_bbox_distance=100.0,
            )
        )
        assert results[1].foreground_bounding_boxes is None  # the gap frame
        assert results[2].foreground_bounding_boxes[0].x == 12  # fresh history
        assert results[3].foreground_bounding_boxes[0].x == 512  # reset on jump

    def test_smoothing_suppresses_single_frame_distance_spike(self):
        """One jittered frame pushes the raw pair past the distance gate; the
        windowed mean keeps the decision stable (the flip the reference's
        track-length filter can't prevent, only mask)."""
        from gance_tpu.overlay.common import DistanceBoxes
        from gance_tpu.overlay.eye_tracking import (
            _DetectionRecord,
            _decide,
            _smoothed_decisions,
        )
        from gance_tpu.types import BoundingBox

        def pair_record(b_offset):
            a = BoundingBox(100, 100, 20, 10)
            b = BoundingBox(100 + b_offset, 100, 20, 10)
            return _DetectionRecord(
                skip=False,
                foreground_boxes=[a],
                distance_boxes=DistanceBoxes(
                    distance=float(b_offset), a_box=a, b_box=b
                ),
                bbox_phash_distance=0,
            )

        # offsets: stable 5px, one 25px spike (gate at 15px), stable again
        records = [pair_record(o) for o in (5, 5, 25, 5, 5)]
        raw = [
            _decide(record, min_phash_distance=5, min_bbox_distance=15.0)
            for record in records
        ]
        assert [r.context.overlay_written for r in raw] == [
            True, True, False, True, True,
        ]
        smoothed = list(
            _smoothed_decisions(
                iter(records), window=3, min_phash_distance=5,
                min_bbox_distance=15.0,
            )
        )
        assert all(r.context.overlay_written for r in smoothed)

    def test_zero_smoothing_is_reference_behavior(self, monkeypatch):
        """compute_eye_tracking_overlay(temporal_smoothing=0) must keep the
        lazy-phash reference semantics: no phash computed when the raw
        distance gate fails."""
        import gance_tpu.overlay.eye_tracking as et

        calls = []
        original = et.phash_batch

        def counting(images):
            calls.append(1)
            return original(images)

        monkeypatch.setattr(et, "phash_batch", counting)
        rng = np.random.RandomState(0)
        frames = [rng.randint(0, 255, (64, 64, 3), np.uint8) for _ in range(2)]
        result = et.compute_eye_tracking_overlay(
            foreground_images=iter(frames),
            background_images=iter(frames),
            min_phash_distance=5,
            min_bbox_distance=1.0,
            temporal_smoothing=0,
        )
        list(result.bbox_lists)
        # noise frames: no faces detected -> no pairs -> no phash either way
        assert calls == []


class TestEyeRefinement:
    """Gradient-based eye-center refinement (overlay/eye_refine.py): the
    landmark-point precision layer over the Haar boxes, standing in for the
    reference's dlib landmarks (gance/faces.py:12-68)."""

    @staticmethod
    def _synthetic_eye(center=(52, 33), shape=(60, 80)):
        import cv2

        img = np.full(shape, 220, np.uint8)
        cv2.circle(img, center, 9, 40, -1)
        return cv2.GaussianBlur(img, (5, 5), 0)

    def test_locates_dark_disk_center(self):
        from gance_tpu.overlay.eye_refine import locate_eye_center

        center = locate_eye_center(self._synthetic_eye())
        assert center is not None
        assert abs(center[0] - 52) <= 2 and abs(center[1] - 33) <= 2

    def test_recenter_offset_box(self):
        """A box offset from the true eye re-centers onto it; size is kept."""
        from gance_tpu.overlay.eye_refine import refine_eye_box
        from gance_tpu.types import BoundingBox

        img = self._synthetic_eye()
        box = BoundingBox(x=52 - 15 - 8, y=33 - 10 - 6, width=30, height=20)
        refined = refine_eye_box(img, box)
        assert (refined.width, refined.height) == (30, 20)
        assert abs(refined.x + 15 - 52) <= 2 and abs(refined.y + 10 - 33) <= 2

    def test_abstains_on_flat_roi(self):
        from gance_tpu.overlay.eye_refine import locate_eye_center, refine_eye_box
        from gance_tpu.types import BoundingBox

        flat = np.full((40, 40), 128, np.uint8)
        assert locate_eye_center(flat) is None
        box = BoundingBox(x=5, y=5, width=20, height=15)
        assert refine_eye_box(flat, box) == box

    def test_shift_guard_keeps_detector_geometry(self):
        """When the only gradient evidence is implausibly far from the box,
        the refinement must return the detector's box unchanged."""
        import cv2

        from gance_tpu.overlay.eye_refine import refine_eye_box
        from gance_tpu.types import BoundingBox

        img = np.full((80, 120), 220, np.uint8)
        cv2.circle(img, (105, 70), 8, 30, -1)  # distractor far from the box
        img = cv2.GaussianBlur(img, (5, 5), 0)
        box = BoundingBox(x=10, y=10, width=24, height=16)
        assert refine_eye_box(img, box) == box

    def test_env_kill_switch(self, monkeypatch):
        """GANCE_TPU_EYE_REFINE=0 restores raw Haar geometry; default is on."""
        from gance_tpu.overlay.faces import FaceFinderProxy

        monkeypatch.setenv("GANCE_TPU_EYE_REFINE", "0")
        assert FaceFinderProxy().refine_eye_centers is False
        monkeypatch.delenv("GANCE_TPU_EYE_REFINE")
        assert FaceFinderProxy().refine_eye_centers is True
        assert FaceFinderProxy(refine_eye_centers=False).refine_eye_centers is False
