"""Parameter transforms for unconstrained sampling.

GP hyperparameters are positive (S0, w0, Q, sigma, rho, ...); samplers
work in log-space.  Each transform maps unconstrained -> constrained and
supplies the log-Jacobian correction.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["LogTransform", "IdentityTransform", "transform_logdensity"]


class IdentityTransform:
    def forward(self, x):
        return x

    def inverse(self, y):
        return y

    def log_det_jacobian(self, x):
        return jnp.zeros(())


class LogTransform:
    """y = exp(x): unconstrained x -> positive y; log|dy/dx| = x."""

    def forward(self, x):
        return jnp.exp(x)

    def inverse(self, y):
        return jnp.log(y)

    def log_det_jacobian(self, x):
        return jnp.sum(x)


def transform_logdensity(logdensity_fn, transform):
    """Wrap a constrained log-density into unconstrained space."""

    def wrapped(x):
        y = transform.forward(x)
        return logdensity_fn(y) + transform.log_det_jacobian(x)

    return wrapped
