"""
CLI: synthesize still images from networks (reference synthesize_images.py).

  * images-from-network: per network, seeded random z images filtered into
    face-containing / face-free sets (rejection sampling through the face
    detector), written as PNG + synthesis-file JSON sidecars with md5 provenance.
  * synthesis-file-into-networks: replay vectors from synthesis files through every
    network (networks-outer loop, the reference's swap-minimizing order at :176-179
    — free here since params are all resident, kept for output layout parity).
"""

from pathlib import Path
from typing import List, Optional, Tuple

import click
import numpy as np

from gance_tpu.utils.hashing import hash_file
from gance_tpu.utils.logging import LOGGER

DEFAULT_RANDOM_SEED = 1234


@click.group()
def cli() -> None:
    """Create still images with networks."""


def _generate_filtered_images(
    network, wanted_faces: bool, count: int, rng: np.random.RandomState,
    max_attempts_per_image: int = 100, batch_size: int = 8,
) -> List[Tuple[np.ndarray, np.ndarray]]:
    """
    Rejection-sample (vector, image) pairs until `count` images with (or without)
    faces are found (reference create_images :215-256) — but batched: each round
    synthesizes a batch and filters it, instead of one image per round trip.
    """
    from gance_tpu.overlay.faces import FaceFinderProxy

    finder = FaceFinderProxy()
    results: List[Tuple[np.ndarray, np.ndarray]] = []
    attempts = 0
    while len(results) < count and attempts < max_attempts_per_image * count:
        vectors = rng.standard_normal(
            (batch_size, network.expected_vector_length)
        ).astype(np.float32)
        images = network.images_from_vectors(vectors)
        for vector, image in zip(vectors, images):
            has_face = len(finder.face_locations(image)) > 0
            if has_face == wanted_faces:
                results.append((vector, image))
                if len(results) >= count:
                    break
        attempts += batch_size
    if len(results) < count:
        LOGGER.warning(
            "Only found %d/%d images with faces=%s", len(results), count, wanted_faces
        )
    return results


@cli.command(name="images-from-network")
@click.option(
    "--networks-directory", type=click.Path(exists=True, file_okay=False), required=True
)
@click.option(
    "--output-directory", type=click.Path(file_okay=False), required=True
)
@click.option("--num-faces", type=click.IntRange(min=0), default=1)
@click.option("--no-faces", type=click.IntRange(min=0), default=1)
@click.option("--random-seed", type=int, default=DEFAULT_RANDOM_SEED)
def images_from_network(
    networks_directory: str,
    output_directory: str,
    num_faces: int,
    no_faces: int,
    random_seed: int,
) -> None:
    """Generate random z images per network, filtered by face presence."""
    from gance_tpu.media.images import write_image
    from gance_tpu.models.pickle_loader import sorted_networks_in_directory
    from gance_tpu.pipelines.synthesis_file import write_synthesis_file
    from gance_tpu.synthesis.runtime import SynthesisNetwork

    out_dir = Path(output_directory)
    out_dir.mkdir(parents=True, exist_ok=True)

    for network_path in sorted_networks_in_directory(Path(networks_directory)):
        LOGGER.info("Synthesizing images from %s", network_path)
        network = SynthesisNetwork.from_pkl(network_path)
        network_hash = hash_file(network_path)
        rng = np.random.RandomState(random_seed)

        for label, wanted, count in [("face", True, num_faces), ("no_face", False, no_faces)]:
            pairs = _generate_filtered_images(network, wanted, count, rng)
            for index, (vector, image) in enumerate(pairs):
                stem = f"{network_path.stem}_{network_hash}_{label}_{index}"
                image_path = out_dir / f"{stem}.png"
                write_image(image, image_path)
                write_synthesis_file(
                    destination_path=out_dir / f"{stem}.json",
                    vector=vector,
                    network_path=network_path,
                    network_hash=network_hash,
                    image_path=image_path,
                    image_hash=hash_file(image_path),
                )


@cli.command(name="synthesis-file-into-networks")
@click.option(
    "--synthesis-files-dir", type=click.Path(exists=True, file_okay=False), default=None
)
@click.option(
    "--synthesis-file", type=click.Path(exists=True, dir_okay=False), multiple=True
)
@click.option("--networks-dir", type=click.Path(exists=True, file_okay=False), default=None)
@click.option("--network", type=click.Path(exists=True, dir_okay=False), multiple=True)
@click.option("--output-directory", type=click.Path(file_okay=False), required=True)
def synthesis_file_into_networks(
    synthesis_files_dir: Optional[str],
    synthesis_file: Tuple[str, ...],
    networks_dir: Optional[str],
    network: Tuple[str, ...],
    output_directory: str,
) -> None:
    """Replay synthesis-file vectors through every given network."""
    from gance_tpu.media.images import write_image
    from gance_tpu.models.pickle_loader import (
        parse_network_paths,
        sorted_networks_in_directory,
    )
    from gance_tpu.pipelines.synthesis_file import read_vector_in_file
    from gance_tpu.synthesis.runtime import SynthesisNetwork

    synthesis_paths: List[Path] = []
    if synthesis_files_dir:
        synthesis_paths.extend(sorted(Path(synthesis_files_dir).glob("*.json")))
    synthesis_paths.extend(Path(p) for p in synthesis_file)
    if not synthesis_paths:
        raise click.UsageError("No synthesis files given.")

    network_paths = parse_network_paths(
        networks_directory=Path(networks_dir) if networks_dir else None,
        network_paths=[Path(p) for p in network] if network else None,
        networks_json=None,
    )

    out_dir = Path(output_directory)
    out_dir.mkdir(parents=True, exist_ok=True)

    vectors = [(p, read_vector_in_file(p)) for p in synthesis_paths]

    # networks-outer loop (one batched synthesis per network over all vectors)
    for network_path in network_paths:
        net = SynthesisNetwork.from_pkl(network_path)
        batch = np.stack([v for _, v in vectors])
        images = net.images_from_vectors(batch)
        for (source_path, _), image in zip(vectors, images):
            write_image(
                image, out_dir / f"{network_path.stem}_{source_path.stem}.png"
            )
        LOGGER.info("Replayed %d vectors through %s", len(vectors), network_path)


if __name__ == "__main__":
    cli()
