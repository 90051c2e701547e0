"""Warmup adaptation: dual-averaging step size + Welford diagonal mass.

Stan-style windowed schedule: an initial fast window (step size only),
doubling slow windows (mass matrix), and a final fast window.  All pure
functions over NamedTuple states, vmappable across chains.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

__all__ = [
    "DualAveragingState",
    "da_init",
    "da_update",
    "WelfordState",
    "welford_init",
    "welford_update",
    "welford_variance",
    "build_schedule",
]


class DualAveragingState(NamedTuple):
    log_eps: jnp.ndarray
    log_eps_avg: jnp.ndarray
    h_avg: jnp.ndarray
    mu: jnp.ndarray
    count: jnp.ndarray


def da_init(eps0):
    log_eps0 = jnp.log(eps0)
    return DualAveragingState(
        log_eps=log_eps0,
        log_eps_avg=jnp.zeros_like(log_eps0),
        h_avg=jnp.zeros_like(log_eps0),
        mu=jnp.log(10.0) + log_eps0,
        count=jnp.zeros_like(log_eps0),
    )


def da_update(
    state: DualAveragingState,
    accept_prob,
    *,
    target=0.8,
    gamma=0.05,
    t0=10.0,
    kappa=0.75,
):
    """Nesterov dual averaging on log step size (Hoffman & Gelman 2014)."""
    count = state.count + 1
    w = 1.0 / (count + t0)
    h_avg = (1.0 - w) * state.h_avg + w * (target - accept_prob)
    log_eps = state.mu - jnp.sqrt(count) / gamma * h_avg
    eta = count ** (-kappa)
    log_eps_avg = eta * log_eps + (1.0 - eta) * state.log_eps_avg
    return DualAveragingState(
        log_eps=log_eps,
        log_eps_avg=log_eps_avg,
        h_avg=h_avg,
        mu=state.mu,
        count=count,
    )


class WelfordState(NamedTuple):
    mean: jnp.ndarray
    m2: jnp.ndarray
    count: jnp.ndarray


def welford_init(dim, dtype=jnp.float64):
    return WelfordState(
        mean=jnp.zeros((dim,), dtype),
        m2=jnp.zeros((dim,), dtype),
        count=jnp.zeros((), dtype),
    )


def welford_update(state: WelfordState, x):
    count = state.count + 1
    delta = x - state.mean
    mean = state.mean + delta / count
    m2 = state.m2 + delta * (x - mean)
    return WelfordState(mean=mean, m2=m2, count=count)


def welford_variance(state: WelfordState, *, regularize=True):
    var = state.m2 / jnp.maximum(state.count - 1, 1)
    if regularize:
        # Stan's shrinkage towards unit scale for short windows
        n = state.count
        var = (n / (n + 5.0)) * var + 1e-3 * (5.0 / (n + 5.0))
    return var


def build_schedule(num_warmup, *, init_frac=0.15, final_frac=0.1):
    """Per-step flags: (in_slow_window, window_end) as numpy arrays.

    Mirrors Stan's 75/25/... doubling slow windows between an initial
    and final fast (step-size-only) window.
    """
    import numpy as np

    num_warmup = int(num_warmup)
    init_n = max(1, int(init_frac * num_warmup))
    final_n = max(1, int(final_frac * num_warmup))
    slow_total = max(0, num_warmup - init_n - final_n)

    in_slow = np.zeros(num_warmup, dtype=bool)
    win_end = np.zeros(num_warmup, dtype=bool)
    if slow_total > 0:
        in_slow[init_n : init_n + slow_total] = True
        # doubling windows: 25, 50, 100, ... scaled to fit
        w = max(1, slow_total // 15)
        pos = init_n
        while pos < init_n + slow_total:
            w_eff = min(w, init_n + slow_total - pos)
            # merge a too-small tail into the last window
            if init_n + slow_total - (pos + w_eff) < w * 2:
                w_eff = init_n + slow_total - pos
            pos += w_eff
            win_end[pos - 1] = True
            w *= 2
    return in_slow, win_end
