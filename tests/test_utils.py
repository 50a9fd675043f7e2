"""Small utility coverage: hashing (provenance fields) and logging handlers."""

import hashlib
import logging

import numpy as np

from gance_tpu.utils.hashing import hash_file
from gance_tpu.utils.logging import LOGGER, add_log_file


def test_hash_file_matches_hashlib(tmp_path):
    """Chunked MD5 equals a one-shot digest (reference hash_file.py contract)."""
    payload = np.random.RandomState(0).bytes(10_000_000)  # spans multiple chunks
    path = tmp_path / "blob.bin"
    path.write_bytes(payload)
    assert hash_file(path) == hashlib.md5(payload).hexdigest()


def test_hash_file_empty(tmp_path):
    path = tmp_path / "empty.bin"
    path.write_bytes(b"")
    assert hash_file(path) == hashlib.md5(b"").hexdigest()


def test_add_log_file_attaches_handler(tmp_path):
    """--log contract: records land in the file with the PID-bearing format."""
    log_path = tmp_path / "run.log"
    root = logging.getLogger()
    old_level = root.level
    root.setLevel(logging.INFO)  # pytest may have raised the root level
    add_log_file(log_path)
    try:
        LOGGER.info("utils-test marker %d", 1234)
        for handler in logging.getLogger().handlers:
            handler.flush()
        text = log_path.read_text()
        assert "utils-test marker 1234" in text
        assert "gance_tpu" in text and "INFO" in text
    finally:
        root.setLevel(old_level)
        for handler in list(root.handlers):
            if isinstance(handler, logging.FileHandler) and handler.baseFilename == str(log_path):
                root.removeHandler(handler)
                handler.close()


def test_add_log_file_none_is_noop():
    before = list(logging.getLogger().handlers)
    add_log_file(None)
    assert logging.getLogger().handlers == before


def test_version_strings_agree():
    """pyproject.toml, gance_tpu.__version__, and the CHANGELOG head must not drift."""
    import re
    from pathlib import Path

    import gance_tpu

    root = Path(__file__).resolve().parents[1]
    pyproject = (root / "pyproject.toml").read_text()
    toml_version = re.search(r'^version = "([^"]+)"', pyproject, re.M).group(1)
    changelog_head = re.search(
        r"^## (\d+\.\d+\.\d+)", (root / "CHANGELOG.md").read_text(), re.M
    ).group(1)
    assert gance_tpu.__version__ == toml_version == changelog_head
