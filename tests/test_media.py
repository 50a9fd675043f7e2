"""
Media IO tests (modeled on the reference's test_video_common.py /
test_iterator_on_disk.py): write→read roundtrips preserving fps/resolution/frames,
fps reduction, tee-through forwarding, audio mux (native AVI path), disk tee, images.
"""

from pathlib import Path

import numpy as np
import pytest

from gance_tpu.media.disk_tee import HDF5_SERIALIZER, iterator_on_disk
from gance_tpu.media.images import horizontal_concat_images, read_image, write_image
from gance_tpu.media.video import (
    add_wavs_to_video,
    frames_in_video,
    reduce_fps_take_every,
    resize_source,
    scale_square_source_duplicate,
    write_source_to_disk_consume,
    write_source_to_disk_forward,
)

CLAPS = Path("/root/reference/test/assets/claps.wav")


def _frames(n: int, size: int = 32) -> list:
    rng = np.random.RandomState(5)
    return [
        (rng.rand(size, size, 3) * 255).astype(np.uint8) for _ in range(n)
    ]


def test_write_read_roundtrip(tmp_path):
    path = tmp_path / "out.mp4"
    frames = _frames(10)
    write_source_to_disk_consume(iter(frames), path, video_fps=30.0)
    video = frames_in_video(path)
    assert video.original_fps == 30.0
    assert video.total_frame_count == 10
    assert video.original_resolution == (32, 32)
    read_back = list(video.frames)
    assert len(read_back) == 10
    assert read_back[0].shape == (32, 32, 3)


def test_forward_re_yields(tmp_path):
    path = tmp_path / "out.mp4"
    frames = _frames(5)
    forwarded = list(write_source_to_disk_forward(iter(frames), path, video_fps=30.0))
    assert len(forwarded) == 5
    for a, b in zip(forwarded, frames):
        np.testing.assert_array_equal(a, b)
    assert path.exists()


def test_threaded_writer_roundtrip_and_errors(tmp_path):
    from gance_tpu.media.video import (
        VideoWriterHandle,
        create_video_writer,
        threaded_writer,
    )
    from gance_tpu.types import ImageResolution

    # roundtrip: background-thread encode produces the same file contents
    path = tmp_path / "threaded.mp4"
    frames = _frames(12)
    writer = threaded_writer(
        create_video_writer(path, 30.0, ImageResolution(width=32, height=32))
    )
    for frame in frames:
        writer.write(frame)
    writer.finish()
    assert frames_in_video(path).total_frame_count == 12

    # encoder errors surface on finish (and on subsequent writes)
    def boom(_frame):
        raise RuntimeError("encoder exploded")

    failing = threaded_writer(VideoWriterHandle(write=boom, finish=lambda: None))
    failing.write(frames[0])
    with pytest.raises(RuntimeError, match="exploded"):
        failing.finish()


def test_fps_reduction(tmp_path):
    path = tmp_path / "out.mp4"
    write_source_to_disk_consume(iter(_frames(12)), path, video_fps=30.0)
    video = frames_in_video(path, reduce_fps_to=15.0)
    # originals describe the source file (the reference's provenance contract)
    assert video.original_fps == 30.0
    assert video.total_frame_count == 12
    assert video.effective_fps == 15.0
    assert video.effective_frame_count == 6
    assert len(list(video.frames)) == 6
    with pytest.raises(ValueError):
        frames_in_video(path, reduce_fps_to=7.0)  # 30/7 not exact


def test_fps_reduction_ceil(tmp_path):
    """islice(step=k) yields ceil(n/k) frames; the metadata must agree."""
    path = tmp_path / "out10.mp4"
    write_source_to_disk_consume(iter(_frames(10)), path, video_fps=30.0)
    video = frames_in_video(path, video_fps=30.0, reduce_fps_to=10.0)
    frames = list(video.frames)
    assert len(frames) == 4  # frames 0, 3, 6, 9
    assert video.effective_frame_count == 4


def test_reduce_fps_take_every():
    assert reduce_fps_take_every(60.0, 30.0) == 2
    assert reduce_fps_take_every(60.0, None) is None
    with pytest.raises(ValueError):
        reduce_fps_take_every(60.0, 25.0)
    # inexact rates must raise, not silently round (reference divisor semantics:
    # 29.97 -> 30 is NOT an exact division)
    with pytest.raises(ValueError):
        reduce_fps_take_every(29.97, 30.0)
    with pytest.raises(ValueError):
        reduce_fps_take_every(59.94, 29.97001)
    # exact float division is still fine
    assert reduce_fps_take_every(59.94, 29.97) == 2


def test_fps_override(tmp_path):
    path = tmp_path / "out.mp4"
    write_source_to_disk_consume(iter(_frames(4)), path, video_fps=30.0)
    video = frames_in_video(path, video_fps=99.0)
    assert video.original_fps == 99.0


def test_resize_and_duplicate():
    frames = _frames(3, size=16)
    resized = list(resize_source(iter(frames), (8, 8)))
    assert resized[0].shape == (8, 8, 3)
    duplicated = list(scale_square_source_duplicate(iter(frames), 24, frame_multiplier=2))
    assert len(duplicated) == 6
    assert duplicated[0].shape == (24, 24, 3)
    np.testing.assert_array_equal(duplicated[0], duplicated[1])


def test_audio_mux_native(tmp_path):
    """No ffmpeg on this machine -> exercises the native C++ AVI muxer."""
    import cv2

    video_path = tmp_path / "silent.mp4"
    write_source_to_disk_consume(iter(_frames(8)), video_path, video_fps=4.0)
    out = tmp_path / "muxed.avi"
    add_wavs_to_video(video_path, [CLAPS], out)
    assert out.exists() and out.stat().st_size > 1000

    cap = cv2.VideoCapture(str(out))
    assert cap.isOpened()
    n = 0
    while True:
        ret, frame = cap.read()
        if not ret:
            break
        assert frame.shape == (32, 32, 3)
        n += 1
    cap.release()
    assert n == 8


def test_empty_source(tmp_path):
    out = list(write_source_to_disk_forward(iter(()), tmp_path / "e.mp4", 30.0))
    assert out == []


def test_iterator_on_disk_roundtrip():
    items = _frames(4)
    primary, secondary = iterator_on_disk(iter(items), copies=1)
    collected_p, collected_s = [], []
    for p in primary:
        collected_p.append(p)
    for s in secondary:
        collected_s.append(s)
    assert len(collected_s) == 4
    for a, b in zip(collected_p, collected_s):
        np.testing.assert_array_equal(a, b)


def test_iterator_on_disk_lockstep():
    items = list(range(6))
    primary, s1, s2 = iterator_on_disk(iter(items), copies=2)
    for value in primary:
        assert next(s1) == value
        assert next(s2) == value


def test_iterator_on_disk_hdf5():
    items = _frames(3)
    primary, secondary = iterator_on_disk(iter(items), copies=1, serializer=HDF5_SERIALIZER)
    list(primary)
    out = list(secondary)
    np.testing.assert_array_equal(out[1], items[1])


def test_iterator_on_disk_npy():
    """The pipelines' frame-tee serializer (raw .npy — the tee is scratch, so
    it must cost I/O, not gzip-9 CPU) roundtrips frames exactly."""
    from gance_tpu.media.disk_tee import NPY_SERIALIZER

    items = _frames(3)
    primary, secondary = iterator_on_disk(iter(items), copies=1, serializer=NPY_SERIALIZER)
    collected = list(primary)
    out = list(secondary)
    assert len(out) == 3
    for a, b in zip(collected, out):
        np.testing.assert_array_equal(a, b)
        assert a.dtype == b.dtype


def test_timed_iterator_passthrough_and_stats(tmp_path, monkeypatch):
    """timed_iterator is transparent to the stream and appends its summary as a
    JSON line to $GANCE_TPU_STAGE_STATS when set."""
    import json

    from gance_tpu.utils.profiling import STAGE_STATS_ENV, timed_iterator

    sink = tmp_path / "stages.jsonl"
    monkeypatch.setenv(STAGE_STATS_ENV, str(sink))
    items = _frames(4)
    out = list(timed_iterator("unit_stage", iter(items)))
    assert len(out) == 4
    np.testing.assert_array_equal(out[2], items[2])
    records = [json.loads(line) for line in sink.read_text().splitlines()]
    record = next(r for r in records if r["stage"] == "unit_stage")
    assert record["count"] == 4
    assert record["busy_sec"] >= 0
    assert record["busy_rate_per_sec"] > 0


def test_image_roundtrip(tmp_path):
    img = _frames(1, size=16)[0]
    path = tmp_path / "img.png"
    write_image(img, path)
    back = read_image(path)
    np.testing.assert_array_equal(img, back)


def test_horizontal_concat():
    a, b = _frames(2, size=16)
    out = horizontal_concat_images([a, b])
    assert out.shape == (16, 32, 3)
    with pytest.raises(ValueError):
        horizontal_concat_images([])


class TestRawAviSpill:
    """Uncompressed BI_RGB AVI spill mode (native O_DIRECT egress path)."""

    def test_raw_roundtrip_pixel_exact(self, tmp_path):
        """Raw frames read back bit-exact (no codec), including a width whose
        rows need DWORD stride padding (30*3=90 -> 92)."""
        import cv2

        from gance_tpu.media.native import RawAviWriter

        rng = np.random.RandomState(3)
        frames = [(rng.rand(24, 30, 3) * 255).astype(np.uint8) for _ in range(5)]
        out = tmp_path / "raw.avi"
        writer = RawAviWriter(out, width=30, height=24, fps=30.0)
        for frame in frames:
            writer.write_frame_rgb(frame)
        writer.finalize()
        assert writer.segment_paths == [out]

        cap = cv2.VideoCapture(str(out))
        assert cap.isOpened()
        got = []
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            got.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
        cap.release()
        assert len(got) == 5
        for a, b in zip(got, frames):
            np.testing.assert_array_equal(a, b)

    def test_raw_bgr_fast_path_matches(self, tmp_path):
        """The zero-transform BGR entry point writes the same container bytes a
        pre-swizzled producer expects."""
        import cv2

        from gance_tpu.media.native import RawAviWriter

        rng = np.random.RandomState(4)
        frame_rgb = (rng.rand(16, 16, 3) * 255).astype(np.uint8)
        out = tmp_path / "bgr.avi"
        writer = RawAviWriter(out, width=16, height=16, fps=30.0)
        writer.write_frame_bgr(frame_rgb[:, :, ::-1])  # pre-swizzled
        writer.finalize()

        cap = cv2.VideoCapture(str(out))
        ok, got = cap.read()
        cap.release()
        assert ok
        np.testing.assert_array_equal(cv2.cvtColor(got, cv2.COLOR_BGR2RGB), frame_rgb)

    def test_raw_segments_below_avi_limit(self, tmp_path):
        """A tiny segment budget forces rollover; every segment is a playable
        AVI and the frame total is preserved."""
        import cv2

        from gance_tpu.media.native import RawAviWriter

        rng = np.random.RandomState(5)
        frames = [(rng.rand(32, 32, 3) * 255).astype(np.uint8) for _ in range(9)]
        frame_bytes = 32 * 32 * 3 + 16
        out = tmp_path / "seg.avi"
        writer = RawAviWriter(
            out, width=32, height=32, fps=30.0,
            segment_bytes=6 * frame_bytes,  # ~4-5 frames per segment
        )
        for frame in frames:
            writer.write_frame_rgb(frame)
        writer.finalize()

        assert len(writer.segment_paths) >= 2
        assert writer.segment_paths[0] == out
        assert writer.segment_paths[1].name == "seg.part001.avi"
        total, recovered = 0, []
        for segment in writer.segment_paths:
            cap = cv2.VideoCapture(str(segment))
            assert cap.isOpened(), segment
            while True:
                ok, frame = cap.read()
                if not ok:
                    break
                recovered.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
            cap.release()
        assert len(recovered) == 9
        for a, b in zip(recovered, frames):
            np.testing.assert_array_equal(a, b)

    def test_raw_spill_writer_handle(self, tmp_path):
        """The VideoWriterHandle factory enforces resolution and finalizes."""
        import cv2

        from gance_tpu.media.video import create_raw_spill_writer
        from gance_tpu.types import ImageResolution

        out = tmp_path / "handle.avi"
        handle = create_raw_spill_writer(out, 30.0, ImageResolution(32, 32))
        frame = np.full((32, 32, 3), 99, np.uint8)
        handle.write(frame)
        with pytest.raises(ValueError, match="resolution"):
            handle.write(np.zeros((16, 16, 3), np.uint8))
        handle.finish()
        cap = cv2.VideoCapture(str(out))
        ok, got = cap.read()
        cap.release()
        assert ok and got.shape == (32, 32, 3)

    def test_egress_env_routes_all_writers_to_spill(self, tmp_path, monkeypatch):
        """GANCE_TPU_EGRESS=raw-spill makes the standard writer factory (and so
        every pipeline) emit raw AVI content; unknown values raise."""
        import cv2

        from gance_tpu.media.video import create_video_writer, write_source_to_disk_consume
        from gance_tpu.types import ImageResolution

        monkeypatch.setenv("GANCE_TPU_EGRESS", "raw-spill")
        out = tmp_path / "pipeline.mp4"  # pipelines ask for mp4; content is AVI
        frames = [np.full((32, 32, 3), v, np.uint8) for v in (10, 200)]
        write_source_to_disk_consume(iter(frames), out, video_fps=30.0)
        cap = cv2.VideoCapture(str(out))
        ok, got = cap.read()
        cap.release()
        assert ok
        np.testing.assert_array_equal(cv2.cvtColor(got, cv2.COLOR_BGR2RGB), frames[0])

        monkeypatch.setenv("GANCE_TPU_EGRESS", "fast")
        with pytest.raises(ValueError, match="GANCE_TPU_EGRESS"):
            create_video_writer(tmp_path / "x.mp4", 30.0, ImageResolution(8, 8))


class TestSpillReadback:
    """media/spill.py: segment enumeration, whole-spill reading, re-encode."""

    @staticmethod
    def _write_spill(tmp_path, n_frames=9, size=32):
        from gance_tpu.media.native import RawAviWriter

        rng = np.random.RandomState(7)
        frames = [(rng.rand(size, size, 3) * 255).astype(np.uint8) for _ in range(n_frames)]
        out = tmp_path / "render.avi"
        frame_bytes = size * size * 3 + 16
        writer = RawAviWriter(
            out, width=size, height=size, fps=30.0,
            segment_bytes=4 * frame_bytes,  # a few frames per segment
        )
        for frame in frames:
            writer.write_frame_rgb(frame)
        writer.finalize()
        assert len(writer.segment_paths) >= (3 if n_frames >= 9 else 2)
        return out, frames

    def test_segment_paths_ordered_and_contiguous(self, tmp_path):
        from gance_tpu.media.spill import spill_segment_paths

        out, _ = self._write_spill(tmp_path)
        segments = spill_segment_paths(out)
        assert segments[0] == out
        assert [p.name for p in segments[1:]] == [
            f"render.part{i:03d}.avi" for i in range(1, len(segments))
        ]

    def test_missing_middle_segment_raises(self, tmp_path):
        from gance_tpu.media.spill import spill_segment_paths

        out, _ = self._write_spill(tmp_path)
        (tmp_path / "render.part001.avi").unlink()
        with pytest.raises(ValueError, match="non-contiguous"):
            spill_segment_paths(out)
        with pytest.raises(ValueError, match="does not exist"):
            spill_segment_paths(tmp_path / "nope.avi")

    def test_frames_in_spill_spans_segments_pixel_exact(self, tmp_path):
        from gance_tpu.media.spill import frames_in_spill

        out, frames = self._write_spill(tmp_path)
        video = frames_in_spill(out)
        assert video.original_fps == 30.0
        assert video.total_frame_count == len(frames)
        assert video.original_resolution == (32, 32)
        read_back = list(video.frames)
        assert len(read_back) == len(frames)
        for a, b in zip(read_back, frames):
            np.testing.assert_array_equal(a, b)  # BI_RGB: no codec loss

    def test_frames_in_spill_fps_reduction_crosses_segments(self, tmp_path):
        from gance_tpu.media.spill import frames_in_spill

        out, frames = self._write_spill(tmp_path)
        video = frames_in_spill(out, reduce_fps_to=15.0)  # keep every 2nd
        assert video.reduced_fps == 15.0
        read_back = list(video.frames)
        assert video.reduced_frame_count == len(read_back) == -(-len(frames) // 2)
        for i, frame in enumerate(read_back):
            np.testing.assert_array_equal(frame, frames[2 * i])

    def test_reencode_spill_single_deliverable(self, tmp_path, monkeypatch):
        import cv2

        from gance_tpu.media.spill import reencode_spill, spill_segment_paths

        out, frames = self._write_spill(tmp_path)
        # env raw-spill must NOT make the re-encode spill again
        monkeypatch.setenv("GANCE_TPU_EGRESS", "raw-spill")
        deliverable = tmp_path / "final.mp4"
        reencode_spill(out, deliverable, delete_segments=True)
        assert deliverable.exists()
        assert not (tmp_path / "final.part001.mp4").exists()
        cap = cv2.VideoCapture(str(deliverable))
        count = 0
        while cap.read()[0]:
            count += 1
        cap.release()
        assert count == len(frames)
        # delete_segments removed every spill segment
        assert not out.exists()
        with pytest.raises(ValueError, match="does not exist"):
            spill_segment_paths(out)

    def test_reencode_spill_with_audio(self, tmp_path):
        import cv2

        from gance_tpu.media.spill import reencode_spill

        out, frames = self._write_spill(tmp_path, n_frames=6)
        deliverable = tmp_path / "final.avi"
        reencode_spill(out, deliverable, audio_paths=[CLAPS])
        assert deliverable.exists() and out.exists()  # segments kept by default
        cap = cv2.VideoCapture(str(deliverable))
        count = 0
        while cap.read()[0]:
            count += 1
        cap.release()
        assert count == len(frames)

    def test_cli_spill_info_and_reencode(self, tmp_path):
        from click.testing import CliRunner

        from gance_tpu.cli.media_tools import cli

        out, frames = self._write_spill(tmp_path)
        runner = CliRunner()
        info = runner.invoke(cli, ["spill-info", "--spill-path", str(out)])
        assert info.exit_code == 0, info.output
        assert f"{len(frames)} frames" in info.output
        assert "32x32" in info.output

        deliverable = tmp_path / "cli_out.mp4"
        result = runner.invoke(
            cli,
            [
                "reencode-spill",
                "--spill-path", str(out),
                "--output-path", str(deliverable),
            ],
        )
        assert result.exit_code == 0, result.output
        assert deliverable.exists()


def _install_fake_ffmpeg(tmp_path, monkeypatch):
    """A fake ffmpeg on PATH that records its argv and drains stdin — the host
    has no real ffmpeg, so the x264 profile is pinned at the argv level."""
    import os

    record = tmp_path / "ffmpeg_argv.txt"
    bin_dir = tmp_path / "fakebin"
    bin_dir.mkdir()
    script = bin_dir / "ffmpeg"
    script.write_text(
        "#!/bin/sh\n"
        f'printf \'%s\\n\' "$@" > "{record}"\n'
        "cat > /dev/null\n"
    )
    script.chmod(0o755)
    monkeypatch.setenv("PATH", f"{bin_dir}:{os.environ.get('PATH', '')}")
    return record


def test_high_quality_writer_x264_argv_golden(tmp_path, monkeypatch):
    """
    The reference's exact YouTube-tuned x264 profile
    (gance/image_sources/video_common.py:108-140): yadif+scale filter, crf 18,
    2 B-frames, no edit list, faststart, yuv422p — pinned argv-for-argv.
    """
    from gance_tpu.media.video import create_video_writer
    from gance_tpu.types import ImageResolution

    record = _install_fake_ffmpeg(tmp_path, monkeypatch)
    out = tmp_path / "out.mp4"
    handle = create_video_writer(
        out, 60.0, ImageResolution(width=32, height=16), high_quality=True
    )
    frame = np.zeros((16, 32, 3), np.uint8)
    handle.write(frame)
    handle.write(frame)
    handle.finish()

    assert record.read_text().splitlines() == [
        "-y",
        "-f", "rawvideo",
        "-pix_fmt", "rgb24",
        "-s", "32x16",
        "-r", "60.0",
        "-i", "-",
        "-vf", "yadif,scale=32:16",
        "-vcodec", "libx264",
        "-crf", "18",
        "-bf", "2",
        "-use_editlist", "0",
        "-movflags", "+faststart",
        "-pix_fmt", "yuv422p",
        str(out),
    ]


def test_high_quality_writer_non_mp4_omits_mov_private_options(tmp_path, monkeypatch):
    """-use_editlist / -movflags are mov/mp4-muxer PRIVATE options; on any
    other container ffmpeg aborts at startup with 'Option not found', so the
    writer must omit them for e.g. .mkv output (the x264 settings stay)."""
    from gance_tpu.media.video import create_video_writer
    from gance_tpu.types import ImageResolution

    record = _install_fake_ffmpeg(tmp_path, monkeypatch)
    out = tmp_path / "out.mkv"
    handle = create_video_writer(
        out, 30.0, ImageResolution(width=16, height=16), high_quality=True
    )
    handle.write(np.zeros((16, 16, 3), np.uint8))
    handle.finish()

    argv = record.read_text().splitlines()
    assert "-use_editlist" not in argv
    assert "-movflags" not in argv
    assert argv[argv.index("-vcodec") + 1] == "libx264"
    assert argv[argv.index("-crf") + 1] == "18"
    assert argv[-1] == str(out)


def test_high_quality_writer_scales_mismatched_source(tmp_path, monkeypatch):
    """Reference semantics: a source that doesn't match the declared output
    resolution is SCALED by the filter chain (WriteGear takes the input size
    from the first frame), not rejected — but a mid-stream size change still
    raises (it would misalign the rawvideo pipe)."""
    from gance_tpu.media.video import create_video_writer
    from gance_tpu.types import ImageResolution

    record = _install_fake_ffmpeg(tmp_path, monkeypatch)
    handle = create_video_writer(
        tmp_path / "out.mp4", 30.0,
        ImageResolution(width=16, height=16), high_quality=True,
    )
    handle.write(np.zeros((32, 32, 3), np.uint8))  # larger source: OK
    with pytest.raises(ValueError, match="first"):
        handle.write(np.zeros((8, 8, 3), np.uint8))  # mid-stream change: no
    handle.write(np.zeros((32, 32, 3), np.uint8))
    handle.finish()

    argv = record.read_text().splitlines()
    assert argv[argv.index("-s") + 1] == "32x32"  # input size = first frame
    assert argv[argv.index("-vf") + 1] == "yadif,scale=16:16"  # output scaled


def test_high_quality_writer_zero_frames_is_clean(tmp_path, monkeypatch):
    from gance_tpu.media.video import create_video_writer
    from gance_tpu.types import ImageResolution

    _install_fake_ffmpeg(tmp_path, monkeypatch)
    handle = create_video_writer(
        tmp_path / "out.mp4", 30.0,
        ImageResolution(width=16, height=16), high_quality=True,
    )
    handle.finish()  # no ffmpeg ever started; must not raise


def test_threaded_writer_encoder_error_does_not_deadlock():
    """An encoder error with a FULL bounded queue must surface, not hang: the
    drain thread keeps consuming (discarding) after the error so producers
    blocked in put() unblock and see the error (review finding: the old drain
    returned immediately, deadlocking write() and finish() forever)."""
    from gance_tpu.media.video import VideoWriterHandle, threaded_writer

    def bad_write(frame):
        raise ValueError("boom")

    finished = []
    tw = threaded_writer(
        VideoWriterHandle(write=bad_write, finish=lambda: finished.append(True)),
        queue_depth=2,
    )
    frame = np.zeros((4, 4, 3), np.uint8)
    with pytest.raises(ValueError, match="boom"):
        for _ in range(64):  # far past the queue depth
            tw.write(frame)
        tw.finish()
    # finish() after the error re-raises but still attempts finalize
    with pytest.raises(ValueError, match="boom"):
        tw.finish()
    assert finished == [True]
