"""Typed runtime configuration for celerite2-tpu.

The reference library configures itself through C++ macros
(``CELERITE_MAX_WIDTH``, ``CELERITE2_FAST_RUN`` — /root/reference
c++/include/celerite2/terms.hpp:10-12, python/celerite2/driver.hpp:36) and
import-time global flag mutation (forcing ``jax_enable_x64`` —
python/celerite2/jax/__init__.py:7-19).  Here everything lives in a single
dataclass that is read at trace time; nothing is mutated on import.
"""

from __future__ import annotations

import dataclasses
from typing import Literal

# The reference caps the celerite width at 32 (terms.hpp:10-12).  We keep the
# same contract: ops are specialized per (padded) J and J-padding keeps the
# number of XLA recompiles bounded, mirroring the reference's UNWRAP_CASES
# J-bucketing (driver.hpp:27-101).
MAX_WIDTH = 32

# Pad J to one of these buckets before handing matrices to the fast kernels.
J_BUCKETS = (1, 2, 4, 8, 16, 32)


@dataclasses.dataclass(frozen=True)
class Config:
    """Global solver configuration.

    Attributes:
        backend: which op implementation family to use.
            - "auto": heuristic dispatch — on TPU, "pallas" above
              ``pallas_threshold`` rows else "scan"; on CPU/GPU,
              "assoc" above ``assoc_threshold`` else "scan".
            - "scan": plain ``lax.scan`` recursions (always correct; best
              when heavily vmapped, e.g. thousands of NUTS chains).
            - "assoc": ``lax.associative_scan`` formulations (log-depth;
              best for single large-N evaluations on CPU/GPU — the
              TPU XLA pipeline compiles these pathologically slowly,
              so "auto" never picks assoc on TPU).
            - "pallas": blockwise-sequential Pallas TPU kernels with
              VMEM-resident carries (~100x lower per-row overhead than
              ``lax.scan`` on TPU; interpret mode elsewhere).
        block_size: rows per grid step for the pallas backend.
        assoc_threshold: minimum N for "auto" to pick assoc (CPU/GPU).
        pallas_threshold: minimum N for "auto" to pick pallas (TPU).
    """

    backend: Literal["auto", "scan", "assoc", "pallas"] = "auto"
    block_size: int = 1024
    assoc_threshold: int = 2048
    pallas_threshold: int = 512


_config = Config()


def get_config() -> Config:
    return _config


def set_config(**kwargs) -> Config:
    """Replace fields of the global config; returns the new config."""
    global _config
    _config = dataclasses.replace(_config, **kwargs)
    return _config


def pad_width(j: int) -> int:
    """Round ``j`` up to the nearest J bucket (bounded recompiles)."""
    for b in J_BUCKETS:
        if j <= b:
            return b
    raise ValueError(
        f"celerite width J={j} exceeds the maximum supported width "
        f"{MAX_WIDTH}"
    )
