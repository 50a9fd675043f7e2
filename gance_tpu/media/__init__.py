"""
Media I/O layer — the reference's L5 (SURVEY.md §2.6: gance/image_sources/ +
iterator_on_disk.py): streaming video read/write, still images, audio muxing, and
the disk-backed iterator tee.

Backend reality on this machine: OpenCV is the only video codec stack (no ffmpeg
binary, no VidGear). The writer API keeps both of the reference's profiles:
`high_quality=True` uses the ffmpeg/libx264 crf-18 pipeline when an ffmpeg binary
exists and degrades to cv2 mp4v otherwise; audio muxing prefers ffmpeg and falls
back to the native C++ AVI muxer (gance_tpu/media/native).
"""

from gance_tpu.media.images import horizontal_concat_images, read_image, write_image
from gance_tpu.media.video import (
    VideoFrames,
    add_wavs_to_video,
    create_video_writer,
    frames_in_video,
    reduce_fps_take_every,
    resize_source,
    scale_square_source_duplicate,
    write_source_to_disk_consume,
    write_source_to_disk_forward,
)
from gance_tpu.media.disk_tee import (
    HDF5_SERIALIZER,
    NPY_SERIALIZER,
    PICKLE_SERIALIZER,
    iterator_on_disk,
)

__all__ = [
    "VideoFrames",
    "frames_in_video",
    "reduce_fps_take_every",
    "create_video_writer",
    "write_source_to_disk_forward",
    "write_source_to_disk_consume",
    "add_wavs_to_video",
    "resize_source",
    "scale_square_source_duplicate",
    "read_image",
    "write_image",
    "horizontal_concat_images",
    "iterator_on_disk",
    "PICKLE_SERIALIZER",
    "HDF5_SERIALIZER",
    "NPY_SERIALIZER",
]
