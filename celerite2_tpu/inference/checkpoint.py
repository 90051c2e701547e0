"""Sampler-state checkpointing (orbax-backed, sharding-aware).

The reference has no checkpoint/resume at all (SURVEY.md section 5.4);
long multi-host runs (N = 1e6 x 4096 chains) need durable chain state:
positions, RNG keys, step sizes, mass matrices, draw counters.  Orbax
restores arrays with their shardings, so a resumed run lands back on
the same mesh layout.
"""

from __future__ import annotations

from typing import Any, Optional

import jax

__all__ = ["save_state", "restore_state", "CheckpointManager"]


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


def save_state(path: str, state: Any, *, force: bool = True) -> None:
    """Write a pytree of (possibly sharded) arrays to ``path``."""
    ocp = _ocp()
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=force)
    ckptr.wait_until_finished()


def restore_state(path: str, template: Optional[Any] = None) -> Any:
    """Restore a pytree saved by :func:`save_state`.

    ``template`` (a pytree of arrays or ShapeDtypeStructs, with
    shardings) restores arrays onto their original mesh layout.
    """
    ocp = _ocp()
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        template = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(
                x.shape, x.dtype, sharding=getattr(x, "sharding", None)
            )
            if hasattr(x, "shape")
            else x,
            template,
        )
        return ckptr.restore(path, template)
    return ckptr.restore(path)


class CheckpointManager:
    """Rolling checkpoints for a long sampling run."""

    def __init__(self, directory: str, *, max_to_keep: int = 3):
        ocp = _ocp()
        self._mgr = ocp.CheckpointManager(
            directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep
            ),
        )

    def save(self, step: int, state: Any) -> None:
        ocp = _ocp()
        self._mgr.save(step, args=ocp.args.StandardSave(state))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, step: Optional[int] = None, template: Any = None):
        ocp = _ocp()
        step = self.latest_step() if step is None else step
        if template is not None:
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(template)
            )
        return self._mgr.restore(step)

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()
