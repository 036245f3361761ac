"""Tracing, profiling and structured logging.

The reference's observability is bare ``print`` with a "[SDMatte]" prefix for
download events only (SURVEY.md §5 — reference sdmatte_nodes.py:57,75,97,...).
Here: structured logging, ``jax.profiler`` trace capture for TPU timelines,
and a lightweight metrics registry the pipeline/bench can report into.
"""

from __future__ import annotations

import contextlib
import dataclasses
import json
import logging
import os
import time
from collections import defaultdict, deque
from typing import Deque, Dict, Iterator, List, Optional

_LOGGERS: Dict[str, logging.Logger] = {}


def get_logger(name: str = "sdmatte_tpu") -> logging.Logger:
    if name in _LOGGERS:
        return _LOGGERS[name]
    logger = logging.getLogger(name)
    if not logger.handlers:
        h = logging.StreamHandler()
        h.setFormatter(logging.Formatter(
            "%(asctime)s %(name)s %(levelname)s %(message)s"))
        logger.addHandler(h)
        logger.setLevel(os.environ.get("SDMATTE_TPU_LOG_LEVEL", "INFO"))
        logger.propagate = False
    _LOGGERS[name] = logger
    return logger


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None) -> Iterator[None]:
    """Capture a jax.profiler trace (viewable in TensorBoard / Perfetto).

    Usage: ``with observability.trace("/tmp/tb"): pipe(img, tri, ...)``
    """
    import jax
    log_dir = log_dir or os.environ.get("SDMATTE_TPU_TRACE_DIR",
                                        "/tmp/sdmatte_tpu_trace")
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        get_logger().info("profiler trace written to %s", log_dir)


# Per-series window: percentiles are computed over the most recent
# _SERIES_CAP observations so a long-lived serving process holds bounded
# memory (the batcher observes per request — unbounded lists would grow
# for the life of the server).  Totals keep the true observation count.
_SERIES_CAP = 4096


@dataclasses.dataclass
class Metrics:
    """Process-local metric registry: counters and timing histograms."""

    counters: Dict[str, float] = dataclasses.field(
        default_factory=lambda: defaultdict(float))
    timings_ms: Dict[str, Deque[float]] = dataclasses.field(
        default_factory=lambda: defaultdict(
            lambda: deque(maxlen=_SERIES_CAP)))
    values: Dict[str, Deque[float]] = dataclasses.field(
        default_factory=lambda: defaultdict(
            lambda: deque(maxlen=_SERIES_CAP)))
    totals: Dict[str, int] = dataclasses.field(
        default_factory=lambda: defaultdict(int))

    def count(self, name: str, value: float = 1.0):
        self.counters[name] += value

    def observe_ms(self, name: str, ms: float):
        self.timings_ms[name].append(ms)
        self.totals[name] += 1

    def observe(self, name: str, value: float):
        """Unitless distribution (e.g. batch sizes, queue depths)."""
        self.values[name].append(value)
        self.totals[name] += 1

    def summary(self) -> dict:
        import numpy as np
        out: dict = {"counters": dict(self.counters)}
        out["timings"] = {
            k: {"n": self.totals[k],
                "p50_ms": float(np.percentile(v, 50)),
                "p99_ms": float(np.percentile(v, 99)) if len(v) > 1 else float(v[0])}
            for k, v in ((k, list(v)) for k, v in self.timings_ms.items()) if v
        }
        out["values"] = {
            k: {"n": self.totals[k], "p50": float(np.percentile(v, 50)),
                "max": float(max(v))}
            for k, v in ((k, list(v)) for k, v in self.values.items()) if v
        }
        return out

    def dump(self) -> str:
        return json.dumps(self.summary())


METRICS = Metrics()


@contextlib.contextmanager
def timed(name: str, metrics: Metrics = METRICS) -> Iterator[None]:
    t0 = time.perf_counter()
    try:
        yield
    finally:
        metrics.observe_ms(name, (time.perf_counter() - t0) * 1e3)
