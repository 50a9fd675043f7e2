"""
Shared logger configuration.

Capability parity: reference gance/logger_common.py:8-17 (single root logger, PID in the
format so child workers are distinguishable; CLIs attach FileHandlers for --log).
Here there are no child processes to distinguish, but the PID field is kept so log
formats stay drop-in comparable.
"""

import logging
import sys
from pathlib import Path
from typing import Optional

LOGGER_FORMAT = "%(asctime)s - %(process)d - %(name)s - %(levelname)s - %(message)s"

logging.basicConfig(level=logging.INFO, format=LOGGER_FORMAT, stream=sys.stderr)

LOGGER = logging.getLogger("gance_tpu")


def add_log_file(path: Optional[Path]) -> None:
    """Attach a FileHandler to the shared logger (the --log CLI contract)."""
    if path is None:
        return
    handler = logging.FileHandler(str(path))
    handler.setFormatter(logging.Formatter(LOGGER_FORMAT))
    logging.getLogger().addHandler(handler)
