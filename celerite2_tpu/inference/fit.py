"""MAP / maximum-likelihood fitting of GP hyperparameters.

The reference delegates MAP to scipy.optimize (docs tutorial "first":
``minimize(neg_log_like, ...)``); here optimization runs on-device with
optax (L-BFGS with Adam fallback), fully jit-compiled.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

__all__ = ["MAPResult", "fit_map"]


class MAPResult(NamedTuple):
    params: jax.Array  # optimum (unconstrained space)
    log_prob: jax.Array  # value at optimum
    converged: jax.Array  # bool: gradient norm below tolerance
    num_steps: jax.Array
    trace: jax.Array  # per-step objective values


def fit_map(
    logdensity_fn: Callable,
    init_params,
    *,
    num_steps: int = 500,
    method: str = "lbfgs",
    learning_rate: float = 1e-2,
    gtol: float = 1e-8,
) -> MAPResult:
    """Maximize ``logdensity_fn`` starting from ``init_params``."""
    x0 = jnp.asarray(init_params)

    def loss_fn(x):
        return -logdensity_fn(x)

    if method == "lbfgs":
        opt = optax.lbfgs()
    elif method == "adam":
        opt = optax.adam(learning_rate)
    else:
        raise ValueError(f"unknown method {method!r}")

    value_and_grad = optax.value_and_grad_from_state(loss_fn)

    @jax.jit
    def run(x0):
        opt_state = opt.init(x0)

        def step(carry, _):
            x, state = carry
            value, grad = value_and_grad(x, state=state)
            updates, state = opt.update(
                grad,
                state,
                x,
                value=value,
                grad=grad,
                value_fn=loss_fn,
            )
            x = optax.apply_updates(x, updates)
            return (x, state), value

        (x, state), trace = jax.lax.scan(
            step, (x0, opt_state), None, length=num_steps
        )
        g = jax.grad(loss_fn)(x)
        return x, -loss_fn(x), jnp.linalg.norm(g) < gtol, trace

    x, logp, converged, trace = run(x0)
    return MAPResult(
        params=x,
        log_prob=logp,
        converged=converged,
        num_steps=jnp.asarray(num_steps),
        trace=-trace,
    )
