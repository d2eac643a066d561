"""Structured logging + stage timing (replaces the reference's ProgressMeter
bars and @warn strings, SURVEY §5)."""

from __future__ import annotations

import logging
import time
from contextlib import contextmanager
from typing import Dict, Iterator

_LOGGER = logging.getLogger("gbm_tpu")


def get_logger() -> logging.Logger:
    if not _LOGGER.handlers:
        h = logging.StreamHandler()
        h.setFormatter(logging.Formatter("%(asctime)s %(name)s %(levelname)s %(message)s"))
        _LOGGER.addHandler(h)
        _LOGGER.setLevel(logging.INFO)
    return _LOGGER


class StageTimer:
    """Accumulates wall-clock per named stage; cheap enough for hot loops."""

    def __init__(self) -> None:
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {"total_s": self.totals[k], "count": self.counts[k],
                "mean_s": self.totals[k] / self.counts[k]}
            for k in self.totals
        }


@contextmanager
def jax_profile(logdir: str) -> Iterator[None]:
    """jax.profiler trace context; view with TensorBoard/xprof."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
