"""Probabilistic-programming integration layer.

The reference ships backend distributions for numpyro and PyMC
(jax/distribution.py:10-27, pymc/distribution.py:32-128).  This framework
ships its *own* inference engine (:mod:`celerite2_tpu.inference`), and a
numpyro adapter that activates when numpyro is importable.

The adapter's behavior lives in :class:`_CeleriteNormalCore`, which is
independent of numpyro so the full contract (event shape, sample-shape
handling, log_prob parity with the GP) is tested even when numpyro is
absent from the environment: the fallback base :class:`_StubBase`
replicates numpyro ``Distribution``'s construction contract, and
``tests/test_distributions.py`` exercises the core through it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from celerite2_tpu.gp import gp_dot_tril, gp_log_likelihood

__all__ = ["CeleriteNormal", "gp_numpyro_dist"]


class _CeleriteNormalCore:
    """numpyro-`Distribution`-shaped wrapper over a computed GP
    (role of reference jax/distribution.py:10-27).

    Mixin: the concrete class composes this with a base supplying
    ``__init__(batch_shape=, event_shape=, validate_args=)`` and the
    ``event_shape`` attribute — numpyro's ``Distribution`` when
    installed, :class:`_StubBase` otherwise.
    """

    def __init__(self, gp, validate_args=None):
        self.gp = gp
        super().__init__(
            batch_shape=(),
            event_shape=jnp.shape(gp.state.t),
            validate_args=validate_args,
        )

    def sample(self, key, sample_shape=()):
        n = 1
        for s in sample_shape:
            n *= int(s)
        samp = jax.vmap(
            lambda k: gp_dot_tril(
                self.gp.state,
                jax.random.normal(
                    k,
                    self.gp.state.t.shape,
                    dtype=self.gp.state.t.dtype,
                ),
            )
        )(jax.random.split(key, n))
        samp = samp + self.gp.state.mean_value
        return samp.reshape(tuple(sample_shape) + tuple(self.event_shape))

    def log_prob(self, value):
        # the real numpyro base stores `_validate_args`; the stub keeps
        # the constructor kwarg name — accept either spelling
        if getattr(self, "validate_args", None) or getattr(
            self, "_validate_args", None
        ):
            ev = tuple(self.event_shape)
            if tuple(jnp.shape(value))[-len(ev) :] != ev:
                raise ValueError(
                    f"log_prob value trailing shape "
                    f"{tuple(jnp.shape(value))} does not match "
                    f"event_shape {ev}"
                )
        return gp_log_likelihood(self.gp.state, value)


class _StubBase:
    """Stand-in replicating numpyro ``Distribution``'s construction
    contract (jax/distribution.py inherits it), used when numpyro is
    absent so the adapter core stays fully testable.

    Mirrors the pieces of the real base that adapter subclasses lean
    on: ``batch_shape``/``event_shape`` storage, ``event_dim``,
    ``shape(sample_shape)``, and event-shape validation of ``log_prob``
    inputs under ``validate_args`` — the contract surface a stub most
    easily gets silently wrong."""

    support = None

    def __init__(self, batch_shape=(), event_shape=(), validate_args=None):
        self.batch_shape = tuple(batch_shape)
        self.event_shape = tuple(event_shape)
        self.validate_args = validate_args

    @property
    def event_dim(self):
        return len(self.event_shape)

    def shape(self, sample_shape=()):
        return tuple(sample_shape) + self.batch_shape + self.event_shape


try:  # pragma: no cover - numpyro is optional and absent in this image
    import numpyro.distributions as _numpyro_dist

    HAS_NUMPYRO = True

    class CeleriteNormal(_CeleriteNormalCore, _numpyro_dist.Distribution):
        support = _numpyro_dist.constraints.real_vector

except ImportError:  # numpyro not installed

    HAS_NUMPYRO = False

    class CeleriteNormal(_CeleriteNormalCore, _StubBase):  # type: ignore[no-redef]
        """Fallback when numpyro is absent: identical construction
        contract and behavior via :class:`_StubBase`.  Constructing it
        raises a clear error pointing at the built-in engine unless
        ``_allow_without_numpyro`` is set (tests set it to exercise
        the adapter core without the dependency)."""

        _allow_without_numpyro = False

        def __init__(self, gp, validate_args=None):
            if not self._allow_without_numpyro:
                raise ImportError(
                    "numpyro is not installed; use the built-in "
                    "inference engine (celerite2_tpu.inference) instead"
                )
            super().__init__(gp, validate_args)


def gp_numpyro_dist(gp):
    return CeleriteNormal(gp)
