"""Mean-field ADVI (automatic differentiation variational inference).

The reference ecosystem gets VI from PyMC; here it is a small optax loop
over a diagonal-Gaussian variational family with the reparameterization
trick, vmappable over parallel restarts.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

__all__ = ["ADVIResult", "run_advi"]


class ADVIResult(NamedTuple):
    mean: jax.Array  # (dim,) variational mean (unconstrained space)
    log_sigma: jax.Array  # (dim,)
    elbo_trace: jax.Array  # (num_steps,)

    def sample(self, key, shape=()):
        eps = jax.random.normal(
            key, shape + self.mean.shape, self.mean.dtype
        )
        return self.mean + jnp.exp(self.log_sigma) * eps


def run_advi(
    logdensity_fn: Callable,
    init_params: jax.Array,
    key: jax.Array,
    *,
    num_steps: int = 2000,
    num_mc_samples: int = 8,
    learning_rate: float = 2e-2,
) -> ADVIResult:
    """Maximize ELBO(q) = E_q[logp] + H[q] for q = N(mu, diag(sigma^2))."""
    init_params = jnp.asarray(init_params)
    dim = init_params.shape[0]
    dtype = init_params.dtype

    params = {
        "mu": init_params,
        "log_sigma": jnp.full((dim,), -2.0, dtype),
    }
    opt = optax.adam(learning_rate)
    opt_state = opt.init(params)

    logp_batched = jax.vmap(logdensity_fn)

    def neg_elbo(p, k):
        eps = jax.random.normal(k, (num_mc_samples, dim), dtype)
        z = p["mu"] + jnp.exp(p["log_sigma"]) * eps
        entropy = jnp.sum(p["log_sigma"]) + 0.5 * dim * (
            1.0 + jnp.log(2.0 * jnp.pi)
        )
        return -(jnp.mean(logp_batched(z)) + entropy)

    @jax.jit
    def step(carry, k):
        p, s = carry
        loss, g = jax.value_and_grad(neg_elbo)(p, k)
        updates, s = opt.update(g, s, p)
        p = optax.apply_updates(p, updates)
        return (p, s), -loss

    keys = jax.random.split(key, num_steps)
    (params, _), elbo = jax.lax.scan(step, (params, opt_state), keys)
    return ADVIResult(
        mean=params["mu"],
        log_sigma=params["log_sigma"],
        elbo_trace=elbo,
    )
