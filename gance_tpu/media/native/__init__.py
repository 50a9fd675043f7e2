"""
ctypes bindings for the native media components (native/avi_muxer.cpp).

The shared library is built on demand with `make` (g++ is a baked-in dependency);
the build happens at most once per checkout and is cached as
native/libgance_media.so.
"""

import ctypes
import subprocess
from pathlib import Path
from typing import List, Optional

import numpy as np

from gance_tpu.utils.logging import LOGGER

_NATIVE_DIR = Path(__file__).resolve().parents[3] / "native"
_LIB_PATH = _NATIVE_DIR / "libgance_media.so"

_lib: Optional[ctypes.CDLL] = None


def _load_library() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        LOGGER.info("Building native media library in %s", _NATIVE_DIR)
        subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True, capture_output=True)
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.avi_create.restype = ctypes.c_void_p
    lib.avi_create.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_double,
        ctypes.c_int, ctypes.c_int,
    ]
    lib.avi_create_ex.restype = ctypes.c_void_p
    lib.avi_create_ex.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_double,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.avi_write_video_frame.restype = ctypes.c_int
    lib.avi_write_video_frame.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int
    ]
    lib.avi_write_video_frame_raw_rgb.restype = ctypes.c_int
    lib.avi_write_video_frame_raw_rgb.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8)
    ]
    lib.avi_write_video_frame_raw_bgr.restype = ctypes.c_int
    lib.avi_write_video_frame_raw_bgr.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8)
    ]
    lib.avi_bytes_written.restype = ctypes.c_int64
    lib.avi_bytes_written.argtypes = [ctypes.c_void_p]
    lib.avi_write_audio.restype = ctypes.c_int
    lib.avi_write_audio.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int16), ctypes.c_int
    ]
    lib.avi_finalize.restype = ctypes.c_int
    lib.avi_finalize.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


class AviWriter:
    """Streaming MJPEG+PCM16 AVI writer over the native muxer."""

    def __init__(
        self,
        path: Path,
        width: int,
        height: int,
        fps: float,
        audio_rate: int = 0,
        audio_channels: int = 0,
        jpeg_quality: int = 95,
    ) -> None:
        self._lib = _load_library()
        self._ctx = self._lib.avi_create(
            str(path).encode(), width, height, float(fps), audio_rate, audio_channels
        )
        if not self._ctx:
            raise ValueError(f"Couldn't create AVI file at {path}")
        self._quality = jpeg_quality

    def write_frame_bgr(self, frame: np.ndarray) -> None:
        """Encode a BGR uint8 frame (cv2's native order) as JPEG and append it."""
        import cv2

        ok, jpeg = cv2.imencode(
            ".jpg", np.asarray(frame, np.uint8),
            [cv2.IMWRITE_JPEG_QUALITY, self._quality],
        )
        if not ok:
            raise ValueError("JPEG encode failed")
        data = np.ascontiguousarray(jpeg.reshape(-1))
        self._lib.avi_write_video_frame(
            self._ctx, data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), data.size
        )

    def write_frame_rgb(self, frame: np.ndarray) -> None:
        """Encode an RGB uint8 frame as JPEG and append it."""
        import cv2

        self.write_frame_bgr(cv2.cvtColor(np.asarray(frame, np.uint8), cv2.COLOR_RGB2BGR))

    def write_audio(self, samples: np.ndarray) -> None:
        """Append interleaved int16 PCM samples."""
        data = np.ascontiguousarray(np.asarray(samples, np.int16).reshape(-1))
        self._lib.avi_write_audio(
            self._ctx, data.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), data.size
        )

    def finalize(self) -> None:
        if self._ctx:
            self._lib.avi_finalize(self._ctx)
            self._ctx = None


class RawAviWriter:
    """
    Uncompressed (BI_RGB) AVI spill writer for maximum-rate egress: frames are
    appended as raw top-down BGR rows through the muxer's O_DIRECT buffered
    writer (measured ~760 MB/s on the production host vs ~51 MB/s buffered —
    the 4K/60 lever when a single core can't JPEG-encode fast enough). Files
    are playable AVIs; re-encode offline where compute exists.

    AVI's RIFF size field caps one file at 4 GiB, so the writer transparently
    segments: `out.avi`, `out.part001.avi`, `out.part002.avi`, ... Each segment
    is a complete, independently playable AVI.
    """

    SEGMENT_BYTES_DEFAULT = int(3.5 * 1024**3)

    def __init__(
        self,
        path: Path,
        width: int,
        height: int,
        fps: float,
        direct_io: bool = True,
        segment_bytes: int = SEGMENT_BYTES_DEFAULT,
    ) -> None:
        # RIFF sizes and idx1 offsets are uint32: past 4 GiB they silently wrap
        # and the segment becomes unplayable, so refuse budgets near the limit.
        if segment_bytes > int(3.9 * 1024**3):
            raise ValueError(
                f"segment_bytes {segment_bytes} exceeds the AVI uint32 ceiling; "
                "use <= 3.9 GiB per segment"
            )
        self._lib = _load_library()
        self._base = Path(path)
        self._width = int(width)
        self._height = int(height)
        self._fps = float(fps)
        self._direct_io = direct_io
        self._segment_bytes = int(segment_bytes)
        stride = (self._width * 3 + 3) & ~3
        self._frame_bytes = stride * self._height + 16  # chunk + idx1 entry
        self._segment_index = 0
        self.segment_paths: List[Path] = []
        self._ctx = self._open_segment()

    def _segment_path(self, index: int) -> Path:
        if index == 0:
            return self._base
        return self._base.with_name(
            f"{self._base.stem}.part{index:03d}{self._base.suffix}"
        )

    def _open_segment(self):
        path = self._segment_path(self._segment_index)
        ctx = self._lib.avi_create_ex(
            str(path).encode(), self._width, self._height, self._fps,
            0, 0, 1, 1 if self._direct_io else 0,
        )
        if not ctx:
            raise ValueError(f"Couldn't create raw AVI segment at {path}")
        self.segment_paths.append(path)
        return ctx

    def _roll_if_needed(self) -> None:
        used = int(self._lib.avi_bytes_written(self._ctx))
        if used + self._frame_bytes > self._segment_bytes:
            if self._lib.avi_finalize(self._ctx) != 0:
                self._ctx = None
                raise IOError(
                    f"finalizing raw AVI segment {self.segment_paths[-1]} failed "
                    "(disk full?)"
                )
            self._segment_index += 1
            self._ctx = self._open_segment()

    def write_frame_rgb(self, frame: np.ndarray) -> None:
        """Append a top-down RGB uint8 (H, W, 3) frame (BGR swizzle in native)."""
        frame = np.ascontiguousarray(np.asarray(frame, np.uint8))
        if frame.shape != (self._height, self._width, 3):
            raise ValueError(
                f"frame {frame.shape} != declared {(self._height, self._width, 3)}"
            )
        self._roll_if_needed()
        rc = self._lib.avi_write_video_frame_raw_rgb(
            self._ctx, frame.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        )
        if rc != 0:
            raise IOError("raw AVI frame write failed")

    def write_frame_bgr(self, frame: np.ndarray) -> None:
        """Append a frame already in top-down BGR order (pure memcpy path —
        use when the producer swizzled channels on-device before egress)."""
        frame = np.ascontiguousarray(np.asarray(frame, np.uint8))
        if frame.shape != (self._height, self._width, 3):
            raise ValueError(
                f"frame {frame.shape} != declared {(self._height, self._width, 3)}"
            )
        self._roll_if_needed()
        rc = self._lib.avi_write_video_frame_raw_bgr(
            self._ctx, frame.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        )
        if rc != 0:
            raise IOError("raw AVI frame write failed")

    def finalize(self) -> None:
        if self._ctx:
            rc = self._lib.avi_finalize(self._ctx)
            self._ctx = None
            if rc != 0:
                raise IOError(
                    f"finalizing raw AVI {self.segment_paths[-1]} failed: the tail "
                    "flush or header patches did not land (disk full?)"
                )


def _audio_as_int16(path: Path) -> tuple:
    from scipy.io import wavfile

    rate, data = wavfile.read(str(path))
    if data.dtype == np.int16:
        pcm = data
    elif data.dtype == np.int32:
        pcm = (data / 65536).astype(np.int16)
    elif data.dtype in (np.float32, np.float64):
        pcm = np.clip(data * 32767.0, -32768, 32767).astype(np.int16)
    elif data.dtype == np.uint8:
        pcm = ((data.astype(np.int16) - 128) * 256).astype(np.int16)
    else:
        raise ValueError(f"Unsupported wav dtype {data.dtype}")
    return rate, pcm


def mux_video_with_audio(
    video_path: Path, audio_paths: List[Path], output_path: Path
) -> None:
    """
    Re-mux an existing video file with concatenated audio tracks into an MJPEG+PCM
    AVI. The ffmpeg-less fallback for `add_wavs_to_video` — frames are re-encoded
    as JPEG (quality 95), audio as PCM16, interleaved one frame's worth at a time.
    """
    import cv2

    cap = cv2.VideoCapture(str(video_path))
    if not cap.isOpened():
        raise ValueError(f"Couldn't open {video_path}")
    fps = float(cap.get(cv2.CAP_PROP_FPS))
    width = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    height = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))

    rates_pcm = [_audio_as_int16(p) for p in audio_paths]
    rates = {r for r, _ in rates_pcm}
    if len(rates) > 1:
        raise ValueError("Audio tracks must share a sample rate for native muxing")
    rate = rates.pop() if rates else 0
    pcm = (
        np.concatenate([p if p.ndim > 1 else p[:, None] for _, p in rates_pcm])
        if rates_pcm
        else np.zeros((0, 1), np.int16)
    )
    channels = pcm.shape[1] if pcm.size else 0

    out = Path(output_path)
    if out.suffix.lower() != ".avi":
        LOGGER.warning(
            "Native mux writes AVI content; output %s keeps its requested name.", out
        )
    writer = AviWriter(out, width, height, fps, audio_rate=rate, audio_channels=channels)

    samples_per_frame = int(round(rate / fps)) if rate else 0
    cursor = 0
    try:
        while True:
            ret, frame = cap.read()
            if not ret:
                break
            writer.write_frame_bgr(frame)  # cv2 decodes BGR; no roundtrip
            if samples_per_frame and cursor < pcm.shape[0]:
                chunk = pcm[cursor : cursor + samples_per_frame]
                writer.write_audio(chunk)
                cursor += samples_per_frame
        if cursor < pcm.shape[0]:
            writer.write_audio(pcm[cursor:])
    finally:
        cap.release()
        writer.finalize()
