"""
Chunked file hashing for provenance fields.

Capability parity: reference gance/hash_file.py:9 — MD5 of a file read in chunks; the
hash lands in projection-file attrs and synthesis-file JSON sidecars.
"""

import hashlib
from pathlib import Path

_CHUNK_SIZE = 4 * 1024 * 1024


def hash_file(path: Path) -> str:
    """Chunked MD5 hex digest of the file at `path`."""
    digest = hashlib.md5()
    with open(str(path), "rb") as infile:
        while True:
            chunk = infile.read(_CHUNK_SIZE)
            if not chunk:
                break
            digest.update(chunk)
    return digest.hexdigest()
