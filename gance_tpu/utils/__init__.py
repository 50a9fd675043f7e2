"""Cross-cutting utilities: logging, integer division guards, file hashing."""

from gance_tpu.utils.divisor import divide_no_remainder
from gance_tpu.utils.hashing import hash_file
from gance_tpu.utils.logging import LOGGER

__all__ = ["LOGGER", "divide_no_remainder", "hash_file"]
