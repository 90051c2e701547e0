"""Mesh construction helpers.

The framework's two parallel axes (SURVEY.md section 2.4):
  * ``chains`` — data parallelism over NUTS chains / SMC particles
    (embarrassingly parallel; collectives only for adaptation stats),
  * ``seq`` — sequence parallelism over the length-N recursions
    (O(J^2) boundary carries exchanged between neighbor devices).

Multi-host: call ``jax.distributed.initialize()`` before building the
mesh; ``make_mesh`` then spans all processes' devices.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "chain_sharding", "seq_sharding", "P"]


def make_mesh(chains: int = 1, seq: int = 1, *, devices=None) -> Mesh:
    """Build a (chains, seq) mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = chains * seq
    if n > len(devices):
        raise ValueError(
            f"mesh ({chains} x {seq}) needs {n} devices, have "
            f"{len(devices)}"
        )
    dev = np.asarray(devices[:n]).reshape(chains, seq)
    return Mesh(dev, axis_names=("chains", "seq"))


def chain_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis = chains."""
    return NamedSharding(mesh, P("chains"))


def seq_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis = time/sequence."""
    return NamedSharding(mesh, P("seq"))
