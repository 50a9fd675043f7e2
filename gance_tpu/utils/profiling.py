"""
Tracing + per-stage throughput counters — first-class observability the reference
lacks (SURVEY.md §5: "no formal tracing; per-frame INFO logs only; the TPU build
should add real tracing as a first-class subsystem").

Two tools:
  * `trace(log_dir)` — context manager around jax.profiler for device traces
    viewable in TensorBoard/Perfetto.
  * `StageTimer` — lightweight frames/sec counter for pipeline stages; logs
    rolling rates and produces a final summary dict (consumed by logs and tests).
"""

import contextlib
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, Iterator, Optional

from gance_tpu.utils.logging import LOGGER


@contextlib.contextmanager
def trace(log_dir: Optional[Path]) -> Iterator[None]:
    """jax.profiler trace when a directory is given; no-op otherwise."""
    if log_dir is None:
        yield
        return
    import jax

    with jax.profiler.trace(str(log_dir)):
        yield
    LOGGER.info("Wrote profiler trace to %s", log_dir)


@dataclass
class StageTimer:
    """Rolling throughput counter for one pipeline stage."""

    name: str
    log_every: int = 100
    _start: float = field(default_factory=time.monotonic)
    _last_log: float = field(default_factory=time.monotonic)
    _count: int = 0
    _count_at_last_log: int = 0

    def tick(self, n: int = 1) -> None:
        self._count += n
        if self._count - self._count_at_last_log >= self.log_every:
            now = time.monotonic()
            window = self._count - self._count_at_last_log
            rate = window / max(now - self._last_log, 1e-9)
            LOGGER.info(
                "[%s] %d items, %.2f items/sec (rolling)", self.name, self._count, rate
            )
            self._last_log = now
            self._count_at_last_log = self._count

    def summary(self) -> Dict[str, float]:
        elapsed = max(time.monotonic() - self._start, 1e-9)
        stats = {
            "stage": self.name,
            "count": self._count,
            "elapsed_sec": round(elapsed, 3),
            "rate_per_sec": round(self._count / elapsed, 3),
        }
        LOGGER.info(
            "[%s] complete: %d items in %.2fs (%.2f items/sec)",
            self.name, self._count, elapsed, stats["rate_per_sec"],
        )
        return stats
