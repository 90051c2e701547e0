"""Sampling diagnostics: split R-hat and bulk effective sample size.

The reference has no diagnostics of its own (delegated to ArviZ via
PyMC/numpyro); here they are part of the engine so that multi-host runs
can stream ESS/R-hat without leaving the device (SURVEY.md section 5.5).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["split_rhat", "effective_sample_size", "summary"]


def _split_chains(x):
    """(C, N, ...) -> (2C, N//2, ...)"""
    C, N = x.shape[:2]
    half = N // 2
    x = x[:, : 2 * half]
    return jnp.concatenate([x[:, :half], x[:, half:]], axis=0)


def split_rhat(samples):
    """Gelman-Rubin split R-hat.  ``samples (C, N, dim)`` -> ``(dim,)``."""
    x = _split_chains(samples)
    C, N = x.shape[:2]
    chain_mean = jnp.mean(x, axis=1)  # (2C, dim)
    chain_var = jnp.var(x, axis=1, ddof=1)  # (2C, dim)
    W = jnp.mean(chain_var, axis=0)
    B = N * jnp.var(chain_mean, axis=0, ddof=1)
    var_plus = (N - 1) / N * W + B / N
    return jnp.sqrt(var_plus / W)


def _autocov(x, max_lag):
    """Per-chain autocovariance up to max_lag via FFT. x (C, N, dim)."""
    C, N, dim = x.shape
    xc = x - jnp.mean(x, axis=1, keepdims=True)
    n_fft = 2 * N
    f = jnp.fft.rfft(xc, n=n_fft, axis=1)
    acov = jnp.fft.irfft(f * jnp.conj(f), n=n_fft, axis=1)[:, : max_lag + 1]
    return jnp.real(acov) / N


def effective_sample_size(samples, *, max_lag=None):
    """Bulk ESS via Geyer's initial monotone sequence.
    ``samples (C, N, dim)`` -> ``(dim,)``."""
    acc_dtype = (
        jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    )
    x = _split_chains(jnp.asarray(samples, acc_dtype))
    C, N, dim = x.shape
    if max_lag is None:
        max_lag = min(N - 1, 1000)

    acov = _autocov(x, max_lag)  # (C, L+1, dim)
    chain_var = acov[:, 0]  # biased (ddof=0) per-chain variance
    mean_var = jnp.mean(chain_var * N / (N - 1), axis=0)
    var_plus = mean_var * (N - 1) / N + jnp.var(
        jnp.mean(x, axis=1), axis=0, ddof=1
    )

    rho = 1.0 - (mean_var - jnp.mean(acov, axis=0)) / var_plus  # (L+1, dim)

    # Geyer: sum consecutive pairs, keep while positive and decreasing
    L = rho.shape[0] - (rho.shape[0] % 2)
    pair = rho[:L].reshape(L // 2, 2, dim).sum(axis=1)  # (L/2, dim)
    pos = pair > 0
    # prefix-AND to find the initial positive sequence
    keep = jnp.cumprod(pos.astype(jnp.int32), axis=0).astype(bool)
    pair = jnp.where(keep, pair, 0.0)
    # enforce monotone decrease
    pair = jnp.minimum.accumulate(
        jnp.where(keep, pair, 0.0), axis=0
    )
    tau = -1.0 + 2.0 * jnp.sum(pair, axis=0)
    tau = jnp.maximum(
        tau, 1.0 / jnp.log10(jnp.asarray(C * N, acc_dtype))
    )
    return C * N / tau


def summary(samples):
    """Posterior summary dict: mean, sd, 5/95%, ESS, R-hat."""
    s = jnp.asarray(samples)
    flat = s.reshape(-1, s.shape[-1])
    return {
        "mean": jnp.mean(flat, axis=0),
        "sd": jnp.std(flat, axis=0),
        "q05": jnp.percentile(flat, 5.0, axis=0),
        "q95": jnp.percentile(flat, 95.0, axis=0),
        "ess": effective_sample_size(s),
        "rhat": split_rhat(s),
    }
