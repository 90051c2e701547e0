"""Fleet ChEES-HMC correctness: known-Gaussian recovery, GP
hyperparameter recovery, and structural checks (shared adaptation,
static compile shape)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from celerite2_tpu import terms
from celerite2_tpu.gp import gp_compute, gp_log_likelihood
from celerite2_tpu.inference import run_hmc, split_rhat, summary


@pytest.fixture(scope="module")
def gaussian_target():
    dim = 3
    rng = np.random.default_rng(11)
    A = rng.normal(size=(dim, dim))
    cov = A @ A.T + dim * np.eye(dim)
    prec = jnp.asarray(np.linalg.inv(cov))
    mu = jnp.asarray([1.0, -2.0, 0.5])

    def logp(q):
        r = q - mu
        return -0.5 * r @ prec @ r

    return logp, np.asarray(mu), cov


def test_hmc_gaussian(gaussian_target):
    logp, mu, cov = gaussian_target
    res = run_hmc(
        logp,
        jnp.zeros(3),
        jax.random.PRNGKey(0),
        num_warmup=500,
        num_samples=500,
        num_chains=16,
        max_leapfrog=128,
    )
    s = summary(res.samples)
    np.testing.assert_allclose(np.asarray(s["mean"]), mu, atol=0.3)
    np.testing.assert_allclose(
        np.asarray(s["sd"]), np.sqrt(np.diag(cov)), rtol=0.25
    )
    assert np.all(np.asarray(s["rhat"]) < 1.05)
    assert np.all(np.asarray(s["ess"]) > 400)
    assert float(jnp.mean(res.diverging)) < 0.01
    # ChEES should have grown the trajectory past a single step
    assert float(res.trajectory_length) > float(res.step_size)


@pytest.mark.slow
def test_hmc_gp_hyperparameters():
    """Config-1-style recovery through the GP likelihood."""
    rng = np.random.default_rng(1234)
    N = 64
    t = np.sort(rng.uniform(0, 20, N))
    yerr = np.full(N, 0.3)
    true = dict(sigma=1.2, rho=4.0, tau=3.0)

    kernel = terms.SHOTerm(**true)
    import celerite2_tpu as c2

    gp = c2.GaussianProcess(kernel, t=t, yerr=yerr)
    y = np.asarray(gp.sample(jax.random.PRNGKey(7)))

    def logpost(theta):
        sigma, rho, tau = jnp.exp(theta)
        k = terms.SHOTerm(sigma=sigma, rho=rho, tau=tau)
        state = gp_compute(k, t, yerr=yerr)
        lp = gp_log_likelihood(state, y)
        prior = -0.5 * jnp.sum((theta / 3.0) ** 2)
        return lp + prior

    init = jnp.log(jnp.asarray([1.0, 3.0, 2.0]))
    res = run_hmc(
        logpost,
        init,
        jax.random.PRNGKey(3),
        num_warmup=400,
        num_samples=400,
        num_chains=8,
        max_leapfrog=64,
    )
    assert np.all(np.asarray(split_rhat(res.samples)) < 1.1)
    q = np.exp(np.asarray(res.samples).reshape(-1, 3))
    lo, hi = np.percentile(q, [2.5, 97.5], axis=0)
    truth = np.asarray([true["sigma"], true["rho"], true["tau"]])
    assert np.all(lo < truth) and np.all(truth < hi), (lo, truth, hi)
    assert float(jnp.mean(res.diverging)) < 0.05


def test_hmc_shared_adaptation_outputs(gaussian_target):
    """Step size / trajectory / mass are shared across the fleet."""
    logp, _, _ = gaussian_target
    res = run_hmc(
        logp,
        jnp.zeros(3),
        jax.random.PRNGKey(5),
        num_warmup=100,
        num_samples=50,
        num_chains=4,
        max_leapfrog=32,
    )
    assert res.step_size.shape == ()
    assert res.trajectory_length.shape == ()
    assert res.inv_mass.shape == (3,)
    assert res.samples.shape == (4, 50, 3)
    assert res.num_steps.shape == (50,)
    assert np.all(np.asarray(res.num_steps) >= 1)
    assert np.all(np.asarray(res.num_steps) <= 32)


def test_hmc_compile_flat_in_chains(gaussian_target):
    """The kernel program must be chain-count independent: jaxpr sizes
    for 4 vs 256 chains stay identical (the fleet-compile property NUTS
    lacks)."""
    from celerite2_tpu.inference.hmc import (
        _HMCCarry,
        _adam_init,
        _hmc_segment,
    )
    from celerite2_tpu.inference import adapt as _adapt

    logp, _, _ = gaussian_target

    def build(C):
        q0 = jnp.zeros((C, 3))
        carry = _HMCCarry(
            q=q0,
            logp=jnp.zeros((C,)),
            g=jnp.zeros((C, 3)),
            da=_adapt.da_init(jnp.asarray(0.1)),
            adam=_adam_init(q0.dtype),
            log_T=jnp.log(jnp.asarray(0.1)),
            wf=_adapt.welford_init(3, q0.dtype),
            inv_mass=jnp.ones((3,)),
            eps_frozen=jnp.asarray(0.1),
            key=jax.random.PRNGKey(0),
        )
        sched = tuple(
            jnp.asarray(x)
            for x in (
                np.ones(3, bool),
                np.ones(3, bool),
                np.zeros(3, bool),
                np.zeros(3, bool),
                np.asarray([0.5, 0.25, 0.75]),
            )
        )
        jaxpr = jax.make_jaxpr(
            lambda c, s: _hmc_segment(
                logp, c, s, max_leapfrog=16, target_accept=0.8
            )
        )(carry, sched)
        import re

        # identical program modulo the chain-count literal in shapes
        # (and the line wrapping it changes)
        s = re.sub(r"\d+", "#", jaxpr.jaxpr.pretty_print())
        return re.sub(r"\s+", "", s)

    assert build(4) == build(256)
