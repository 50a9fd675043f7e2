"""
"Synthesis files" — JSON sidecars recording the vector fed into a network, the
network used, and the resulting image, with md5 provenance
(reference gance/synthesis_file.py; format-compatible including the v0/v1 field
migration and the v0 shape-bug fix where vectors were stored as (1, 512)).
"""

import json
from dataclasses import asdict, dataclass
from enum import IntEnum
from pathlib import Path
from typing import List, Optional, Union

import numpy as np

SYNTHESIS_FILE_SUFFIX = ".json"


class Version(IntEnum):
    """Synthesis file versions (v2 renamed model_* fields to network_*)."""

    version_0 = 0
    version_1 = 1
    version_2 = 2


@dataclass
class SynthesisFileDict:
    """Properties of one synthesis run (field-compatible with the reference)."""

    vector: Union[List[List[float]], List[float]]
    network_path: str
    network_hash: str
    image_path: str
    image_hash: str
    version: Optional[int] = None


def write_synthesis_file(
    destination_path: Path,
    vector: np.ndarray,
    network_path: Path,
    network_hash: str,
    image_path: Path,
    image_hash: str,
) -> None:
    """Write a v2 synthesis file."""
    with open(str(destination_path), "w") as file:
        json.dump(
            asdict(
                SynthesisFileDict(
                    network_path=str(network_path),
                    network_hash=network_hash,
                    image_path=str(image_path),
                    image_hash=image_hash,
                    vector=np.asarray(vector).tolist(),
                    version=int(Version.version_2),
                )
            ),
            file,
        )


def read_synthesis_file(path_to_json: Path) -> SynthesisFileDict:
    """Read + migrate a synthesis file of any version."""
    with open(str(path_to_json), "r") as file:
        raw = json.load(file)
    if "version" not in raw or (raw["version"] or 0) < Version.version_2:
        raw["network_path"] = raw.pop("model_path")
        raw["network_hash"] = raw.pop("model_hash")
    return SynthesisFileDict(**{k: raw.get(k) for k in SynthesisFileDict.__annotations__})


def read_vector_in_file(path_to_json: Path) -> np.ndarray:
    """
    Read only the input vector, fixing the v0 shape bug (vectors were stored in the
    (1, 512) network-input form).
    """
    loaded = read_synthesis_file(path_to_json)
    version = loaded.version if loaded.version is not None else Version.version_0
    vector = np.array(loaded.vector)
    if version == Version.version_0:
        vector = vector[0]
    return vector
