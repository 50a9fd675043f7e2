"""
CLI: validate network pickles and copy the good ones into a production directory
(reference check_move_networks.py:32-90): for each sorted .pkl in the given
directories, push a gaussian vector through it (bit-rot check), copy valid ones
renamed `{count}_{parent}_{name}`, skipping submit_config.pkl and anything whose
md5 was already copied.
"""

import shutil
from pathlib import Path
from typing import Tuple

import click
import numpy as np

from gance_tpu.utils.hashing import hash_file
from gance_tpu.utils.logging import LOGGER


@click.command()
@click.option(
    "--network-directory", "--networks-directory", "networks_directory",
    type=click.Path(exists=True, file_okay=False),
    multiple=True, required=True,
    help="Directories scanned for *.pkl networks (reference spelling: "
    "--network-directory; --networks-directory kept as an alias).",
)
@click.option("--output-directory", type=click.Path(file_okay=False), required=True)
def cli(networks_directory: Tuple[str, ...], output_directory: str) -> None:
    """Validate + copy networks."""
    from gance_tpu.models.pickle_loader import sorted_networks_in_directory
    from gance_tpu.synthesis.runtime import SynthesisNetwork

    out_dir = Path(output_directory)
    out_dir.mkdir(parents=True, exist_ok=True)
    already_copied = {hash_file(p) for p in out_dir.glob("*.pkl")}

    count = 0
    for directory in networks_directory:
        for pkl in sorted_networks_in_directory(Path(directory)):
            if pkl.name == "submit_config.pkl":
                continue
            digest = hash_file(pkl)
            if digest in already_copied:
                LOGGER.info("Skipping already-copied %s", pkl)
                continue
            try:
                network = SynthesisNetwork.from_pkl(pkl)
                vector = np.random.RandomState(0).standard_normal(
                    (1, network.expected_vector_length)
                ).astype(np.float32)
                image = network.images_from_vectors(vector)
                if image.sum() == 0:
                    raise ValueError("Network produced an all-zero image")
            except Exception as e:
                LOGGER.warning("Rejecting %s: %s", pkl, e)
                continue
            destination = out_dir / f"{count}_{pkl.parent.name}_{pkl.name}"
            shutil.copy2(pkl, destination)
            already_copied.add(digest)
            LOGGER.info("Copied %s -> %s", pkl, destination)
            count += 1
    LOGGER.info("Copied %d networks", count)


if __name__ == "__main__":
    cli()
