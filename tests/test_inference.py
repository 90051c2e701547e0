"""Inference engine correctness vs analytic oracles.

NUTS/VI/SMC must recover known Gaussian posteriors; NUTS must also
recover GP hyperparameters on simulated data (the BASELINE.json config-1
scenario: SHOTerm GP on a simulated series)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from celerite2_tpu import terms
from celerite2_tpu.gp import gp_compute, gp_log_likelihood
from celerite2_tpu.inference import (
    effective_sample_size,
    run_advi,
    run_nuts,
    run_smc,
    split_rhat,
    summary,
)


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


def test_nuts_gaussian(gaussian_target):
    logp, mu, cov = gaussian_target
    res = run_nuts(
        logp,
        jnp.zeros(3),
        jax.random.PRNGKey(0),
        num_warmup=400,
        num_samples=400,
        num_chains=4,
    )
    s = summary(res.samples)
    np.testing.assert_allclose(np.asarray(s["mean"]), mu, atol=0.3)
    np.testing.assert_allclose(
        np.asarray(s["sd"]), np.sqrt(np.diag(cov)), rtol=0.2
    )
    assert np.all(np.asarray(s["rhat"]) < 1.05)
    assert np.all(np.asarray(s["ess"]) > 150)
    assert float(jnp.mean(res.diverging)) < 0.01


@pytest.mark.slow
def test_nuts_dense_mass():
    """Dense metric: a strongly correlated target sampled with
    dense_mass=True recovers moments AND the adapted inv_mass
    approximates the posterior covariance (off-diagonals included) —
    role of PyMC/numpyro dense_mass."""
    rho = 0.95
    cov = np.asarray(
        [[1.0, rho, 0.0], [rho, 1.0, 0.0], [0.0, 0.0, 2.0]]
    )
    prec = jnp.asarray(np.linalg.inv(cov))
    mu = jnp.asarray([1.0, -2.0, 0.5])

    def logp(q):
        r = q - mu
        return -0.5 * r @ prec @ r

    res = run_nuts(
        logp,
        jnp.zeros(3),
        jax.random.PRNGKey(3),
        num_warmup=500,
        num_samples=500,
        num_chains=4,
        dense_mass=True,
    )
    assert res.inv_mass.shape == (4, 3, 3)
    s = summary(res.samples)
    np.testing.assert_allclose(np.asarray(s["mean"]), np.asarray(mu), atol=0.3)
    np.testing.assert_allclose(
        np.asarray(s["sd"]), np.sqrt(np.diag(cov)), rtol=0.25
    )
    assert np.all(np.asarray(s["rhat"]) < 1.05)
    assert float(jnp.mean(res.diverging)) < 0.01
    # the adapted metric learned the correlation structure
    m = np.mean(np.asarray(res.inv_mass), axis=0)
    corr = m[0, 1] / np.sqrt(m[0, 0] * m[1, 1])
    assert corr > 0.7, corr


def test_mass_metric_helpers():
    """Dense-metric primitives: unrolled Cholesky matches numpy, and
    momenta have covariance inv(Sigma)."""
    from celerite2_tpu.inference import adapt as _adapt

    rng = np.random.default_rng(5)
    A = rng.normal(size=(4, 4))
    S = jnp.asarray(A @ A.T + 4 * np.eye(4))
    L = np.asarray(_adapt.chol_small(S))
    np.testing.assert_allclose(
        L, np.linalg.cholesky(np.asarray(S)), rtol=1e-10
    )
    keys = jax.random.split(jax.random.PRNGKey(0), 4000)
    ps = jax.vmap(
        lambda k: _adapt.mass_momentum(k, S, jnp.float64)
    )(keys)
    emp = np.cov(np.asarray(ps).T)
    np.testing.assert_allclose(
        emp, np.linalg.inv(np.asarray(S)), atol=0.02
    )
    p = ps[0]
    np.testing.assert_allclose(
        float(_adapt.mass_kinetic(S, p)),
        0.5 * float(p @ (S @ p)),
        rtol=1e-12,
    )


def test_advi_gaussian(gaussian_target):
    logp, mu, cov = gaussian_target
    res = run_advi(
        logp, jnp.zeros(3), jax.random.PRNGKey(1), num_steps=1500
    )
    np.testing.assert_allclose(np.asarray(res.mean), mu, atol=0.2)
    # mean-field sd underestimates correlated sd; check the right order
    sd = np.exp(np.asarray(res.log_sigma))
    assert np.all(sd > 0.3 * np.sqrt(np.diag(cov)))
    assert np.all(sd < 1.5 * np.sqrt(np.diag(cov)))
    # ELBO increased
    elbo = np.asarray(res.elbo_trace)
    assert np.mean(elbo[-100:]) > np.mean(elbo[:100])


def test_smc_gaussian(gaussian_target):
    logp, mu, cov = gaussian_target

    # prior N(0, 9 I); likelihood = target / prior implied via tempering
    def log_prior(q):
        return -0.5 * jnp.sum(q**2) / 9.0

    def log_like(q):
        return logp(q) - log_prior(q)

    def sample_prior(key, n):
        return 3.0 * jax.random.normal(key, (n, 3), jnp.float64)

    res = run_smc(
        log_prior,
        log_like,
        sample_prior,
        jax.random.PRNGKey(2),
        num_particles=2048,
        mutation_steps=15,
        mutation_eps=0.5,
    )
    assert float(res.final_beta) == 1.0
    p = np.asarray(res.particles)
    np.testing.assert_allclose(p.mean(axis=0), mu, atol=0.35)
    np.testing.assert_allclose(
        p.std(axis=0), np.sqrt(np.diag(cov)), rtol=0.3
    )
    # the Gaussian/Gaussian evidence IS analytic here: the estimator
    # targets  Z = int N(q; 0, 9 I) * exp(logp - log_prior) dq
    #            = (2 pi)^{3/2} |cov|^{1/2} / (18 pi)^{3/2}
    # (both logp and log_prior are unnormalized exponents)
    logZ_true = (
        1.5 * np.log(2 * np.pi)
        + 0.5 * np.linalg.slogdet(cov)[1]
        - 1.5 * np.log(18 * np.pi)
    )
    assert abs(float(res.log_evidence) - logZ_true) < 0.15, (
        float(res.log_evidence),
        logZ_true,
    )
    # the mutation step size adapted away from its seed
    assert float(res.mutation_eps) > 0


@pytest.mark.slow
def test_nuts_gp_hyperparameters():
    """Config-1 scenario: recover SHOTerm hyperparameters (SURVEY 7.3)."""
    rng = np.random.default_rng(1234)
    N = 64
    t = np.sort(rng.uniform(0, 20, N))
    yerr = np.full(N, 0.3)
    true = dict(sigma=1.2, rho=4.0, tau=3.0)

    kernel = terms.SHOTerm(**true)
    import celerite2_tpu as c2

    gp = c2.GaussianProcess(kernel, t=t, yerr=yerr)
    y = np.asarray(gp.sample(jax.random.PRNGKey(7)))

    # sample log-parameters with weak normal priors
    def logpost(theta):
        sigma, rho, tau = jnp.exp(theta)
        k = terms.SHOTerm(sigma=sigma, rho=rho, tau=tau)
        state = gp_compute(k, t, yerr=yerr)
        lp = gp_log_likelihood(state, y)
        prior = -0.5 * jnp.sum((theta / 3.0) ** 2)
        return lp + prior

    init = jnp.log(jnp.asarray([1.0, 3.0, 2.0]))
    res = run_nuts(
        logpost,
        init,
        jax.random.PRNGKey(3),
        num_warmup=300,
        num_samples=300,
        num_chains=4,
        max_depth=7,
    )
    assert np.all(np.asarray(split_rhat(res.samples)) < 1.1)
    q = np.exp(np.asarray(res.samples).reshape(-1, 3))
    lo, hi = np.percentile(q, [2.5, 97.5], axis=0)
    truth = np.asarray([true["sigma"], true["rho"], true["tau"]])
    # truth within the 95% credible interval for each parameter
    assert np.all(lo < truth) and np.all(truth < hi), (lo, truth, hi)
    assert float(jnp.mean(res.diverging)) < 0.05


def test_diagnostics_iid():
    """ESS of iid samples should be ~ C*N; R-hat ~ 1."""
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 500, 2))
    ess = np.asarray(effective_sample_size(x))
    assert np.all(ess > 1000)
    rhat = np.asarray(split_rhat(x))
    np.testing.assert_allclose(rhat, 1.0, atol=0.02)
