"""Observability: named scopes, roofline counters, sampling monitors.

The reference has no tracing/profiling affordances (SURVEY.md section
5.1).  Here the op dispatcher wraps every tier entry point in
``jax.named_scope("celerite2.<op>.<backend>")`` (see ops/dispatch.py —
visible in the JAX profiler / Perfetto), scan-kernel roofline estimates
are available for sizing, and ``sampling_monitor`` receives per-chunk
statistics from the chunked samplers
(``inference.sampler.run_nuts(..., monitor=...)``).
"""

from __future__ import annotations

import contextlib
import dataclasses
import logging
import time

import jax

logger = logging.getLogger("celerite2_tpu")

__all__ = [
    "logger",
    "scope",
    "roofline",
    "Timer",
    "sampling_monitor",
]

scope = jax.named_scope  # re-export: `with scope("factor"): ...`


@dataclasses.dataclass(frozen=True)
class Roofline:
    flops: float
    bytes: float
    intensity: float

    def seconds_at(self, *, flops_per_s: float, bytes_per_s: float):
        return max(self.flops / flops_per_s, self.bytes / bytes_per_s)


def roofline(n: int, j: int, nrhs: int = 1, *, dtype_bytes: int = 4,
             backend: str = "scan") -> Roofline:
    """FLOPs / bytes estimate for one fused loglik+grad evaluation.

    scan:  ~10 N J^2 flops fwd + ~20 N J^2 bwd, one read of (t,a,U,V,y)
           plus the S-cache write/read (N J^2).
    assoc: ~2 log2(N) passes over N J^2 elements (factor) and N J nrhs
           (sweeps).
    """
    import math

    base_bytes = n * (3 + 2 * j + nrhs) * dtype_bytes
    if backend == "scan":
        flops = 30.0 * n * j * j * max(1, nrhs)
        byts = base_bytes + 2 * n * j * j * dtype_bytes
    else:
        levels = max(1, math.ceil(math.log2(max(n, 2))))
        flops = 8.0 * n * j**3 * levels
        byts = base_bytes + 2 * levels * n * j * j * dtype_bytes
    return Roofline(flops=flops, bytes=byts, intensity=flops / byts)


class Timer:
    """Wall-clock timer that blocks on device results."""

    def __init__(self, label: str = ""):
        self.label = label
        self.elapsed = None

    def __enter__(self):
        self._start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self._start
        if self.label:
            logger.info("%s: %.4fs", self.label, self.elapsed)
        return False


@contextlib.contextmanager
def sampling_monitor(log_every: int = 100):
    """Host-callback-free monitor: collects summaries the runner emits."""
    records = []

    def emit(step, stats):
        records.append((int(step), jax.tree_util.tree_map(float, stats)))
        if log_every and len(records) % log_every == 0:
            logger.info("step %d: %s", step, stats)

    yield emit, records
