"""Probabilistic-programming integration layer.

The reference ships backend distributions for numpyro and PyMC
(jax/distribution.py:10-27, pymc/distribution.py:32-128).  This framework
ships its *own* inference engine (:mod:`celerite2_tpu.inference`), and a
numpyro adapter that activates when numpyro is importable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from celerite2_tpu.gp import gp_dot_tril, gp_log_likelihood

__all__ = ["CeleriteNormal", "gp_numpyro_dist"]

try:  # pragma: no cover - numpyro is optional and absent in this image
    import numpyro.distributions as _numpyro_dist

    class CeleriteNormal(_numpyro_dist.Distribution):
        """numpyro distribution wrapping a computed GP
        (reference jax/distribution.py:10-27)."""

        support = _numpyro_dist.constraints.real_vector

        def __init__(self, gp, validate_args=None):
            self.gp = gp
            super().__init__(
                batch_shape=(),
                event_shape=jnp.shape(gp.state.t),
                validate_args=validate_args,
            )

        def sample(self, key, sample_shape=()):
            samp = jax.vmap(
                lambda k: gp_dot_tril(
                    self.gp.state,
                    jax.random.normal(
                        k,
                        self.gp.state.t.shape,
                        dtype=self.gp.state.t.dtype,
                    ),
                )
            )(jax.random.split(key, max(1, int(jnp.prod(jnp.asarray(sample_shape or (1,)))))))
            samp = samp + self.gp.state.mean_value
            return samp.reshape(sample_shape + self.event_shape)

        def log_prob(self, value):
            return gp_log_likelihood(self.gp.state, value)

except ImportError:  # numpyro not installed

    class CeleriteNormal:  # type: ignore[no-redef]
        """Placeholder raising a clear error when numpyro is absent."""

        def __init__(self, *args, **kwargs):
            raise ImportError(
                "numpyro is not installed; use the built-in inference "
                "engine (celerite2_tpu.inference) instead"
            )


def gp_numpyro_dist(gp):
    return CeleriteNormal(gp)
