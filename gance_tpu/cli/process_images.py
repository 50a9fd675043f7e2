"""
CLI: training-set preparation (reference process_images.py): scale images to the
square training resolution, scan for and delete broken images, and run the
face-prioritized selection + copy.
"""

import json
import shutil
from pathlib import Path
from typing import Tuple

import click

from gance_tpu.utils.logging import LOGGER

_IMAGE_SUFFIXES = (".jpg", ".jpeg", ".png")


@click.group()
def cli() -> None:
    """Prepare image datasets for training."""


@cli.command(name="scale-images")
@click.option("--input-directory", type=click.Path(exists=True, file_okay=False), required=True)
@click.option("--output-directory", type=click.Path(file_okay=False), required=True)
@click.option("--side-length", type=click.IntRange(min=1), default=1024)
def scale_images(input_directory: str, output_directory: str, side_length: int) -> None:
    """Resize every image to a square training resolution (reference :103-127)."""
    import cv2

    from gance_tpu.media.images import read_image, write_image

    out_dir = Path(output_directory)
    out_dir.mkdir(parents=True, exist_ok=True)
    count = 0
    for path in sorted(Path(input_directory).iterdir()):
        if path.suffix.lower() not in _IMAGE_SUFFIXES:
            continue
        try:
            image = read_image(path)
        except Exception as e:
            LOGGER.warning("Skipping unreadable image %s: %s", path, e)
            continue
        resized = cv2.resize(
            image, (side_length, side_length), interpolation=cv2.INTER_CUBIC
        )
        write_image(resized, out_dir / f"{path.stem}.png")
        count += 1
    LOGGER.info("Scaled %d images to %dpx", count, side_length)


@cli.command(name="scan-for-broken-images")
@click.option("--directory", type=click.Path(exists=True, file_okay=False), required=True)
@click.option("--delete/--no-delete", default=False)
def scan_for_broken_images(directory: str, delete: bool) -> None:
    """Find (and optionally delete) unreadable images (reference :146-190)."""
    from PIL import Image

    broken = []
    for path in sorted(Path(directory).iterdir()):
        if path.suffix.lower() not in _IMAGE_SUFFIXES:
            continue
        try:
            with Image.open(str(path)) as img:
                img.load()
        except Exception as e:
            LOGGER.warning("Broken image %s: %s", path, e)
            broken.append(path)
    for path in broken:
        if delete:
            path.unlink()
    LOGGER.info("Found %d broken images (deleted: %s)", len(broken), delete)


@cli.command(name="select-images-copy")
@click.option(
    "--primary-directory", type=click.Path(exists=True, file_okay=False),
    multiple=True, required=True,
)
@click.option(
    "--secondary-directory", type=click.Path(exists=True, file_okay=False), multiple=True
)
@click.option("--output-directory", type=click.Path(file_okay=False), required=True)
@click.option("--num-images", type=click.IntRange(min=1), required=True)
def select_images_copy(
    primary_directory: Tuple[str, ...],
    secondary_directory: Tuple[str, ...],
    output_directory: str,
    num_images: int,
) -> None:
    """Face-prioritized selection + copy with a summary JSON (reference :193-337)."""
    from gance_tpu.overlay.selection import select_images_for_training

    out_dir = Path(output_directory)
    out_dir.mkdir(parents=True, exist_ok=True)

    result = select_images_for_training(
        primary_directories=[Path(p) for p in primary_directory],
        secondary_directories=[Path(p) for p in secondary_directory],
        num_images=num_images,
    )
    for path in result.selected:
        shutil.copy2(path, out_dir / path.name)

    summary = {
        "num_selected": len(result.selected),
        "num_primary_faces": result.num_primary_faces,
        "num_secondary_faces": result.num_secondary_faces,
        "num_neighbors": result.num_neighbors,
        "num_random": result.num_random,
        "selected": [str(p) for p in result.selected],
    }
    (out_dir / "selection_summary.json").write_text(json.dumps(summary, indent=2))
    LOGGER.info("Selected %d images -> %s", len(result.selected), out_dir)


if __name__ == "__main__":
    cli()
