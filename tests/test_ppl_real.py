"""Integration tests against the REAL PPL dependencies.

These are skipped when numpyro / pymc are not installed (they are not
in the base image); the CI `ppl-integration` job installs the
`.[numpyro,pymc]` extras and runs this file, matching the reference's
integration-test tier (python/test/jax/test_jax_celerite2.py:30-92,
python/test/pymc/test_pymc_ops.py:247-274).

Everything here runs on CPU (tests/conftest.py forces the platform)
with tiny N — the point is exercising the real adapter shells, not
performance.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from celerite2_tpu import GaussianProcess, terms
from celerite2_tpu.gp import gp_loglik

try:  # pragma: no cover - exercised only in the CI ppl job
    import pymc
    import pytensor
except ImportError:
    pymc = None

try:  # pragma: no cover - exercised only in the CI ppl job
    import numpyro
except ImportError:
    numpyro = None

requires_pymc = pytest.mark.skipif(pymc is None, reason="pymc not installed")
requires_numpyro = pytest.mark.skipif(
    numpyro is None, reason="numpyro not installed"
)


@pytest.fixture(scope="module")
def dataset():
    rng = np.random.default_rng(42)
    t = np.sort(rng.uniform(0, 10, 50))
    yerr = np.full(50, 0.2)
    true = terms.SHOTerm(sigma=1.0, rho=3.0, tau=2.0)
    gp = GaussianProcess(true, t=t, yerr=yerr)
    y = np.asarray(gp.sample(jax.random.PRNGKey(0)))
    return t, yerr, y


def _mk(sigma, rho):
    return terms.SHOTerm(sigma=sigma, rho=rho, tau=rho)


# ================================================================ numpyro


@requires_numpyro
def test_numpyro_dist_log_prob_matches_gp(dataset):
    t, yerr, y = dataset
    gp = GaussianProcess(_mk(1.0, 3.0), t=t, yerr=yerr)
    dist = gp.numpyro_dist()
    lp = dist.log_prob(jnp.asarray(y))
    np.testing.assert_allclose(
        float(lp), float(gp.log_likelihood(y)), rtol=1e-8
    )
    # sampling from the distribution works and has the right shape
    s = dist.sample(jax.random.PRNGKey(1), sample_shape=(3,))
    assert s.shape == (3, len(t))


@requires_numpyro
def test_numpyro_nuts_smoke(dataset):
    from numpyro.infer import MCMC, NUTS

    t, yerr, y = dataset

    def model(t, yerr, y=None):
        sigma = numpyro.sample(
            "sigma", numpyro.distributions.LogNormal(0.0, 0.5)
        )
        rho = numpyro.sample(
            "rho", numpyro.distributions.LogNormal(1.0, 0.5)
        )
        gp = GaussianProcess(_mk(sigma, rho), t=t, yerr=yerr)
        numpyro.sample("obs", gp.numpyro_dist(), obs=y)

    mcmc = MCMC(
        NUTS(model), num_warmup=25, num_samples=25, num_chains=1,
        progress_bar=False,
    )
    mcmc.run(jax.random.PRNGKey(2), t, yerr, y=jnp.asarray(y))
    samples = mcmc.get_samples()
    assert samples["sigma"].shape == (25,)
    assert np.all(np.isfinite(np.asarray(samples["rho"])))


# =================================================================== pymc


@requires_pymc
def test_pymc_potential_op_perform_and_grad(dataset):
    """The black-box Op under pytensor's default (perform) linker:
    value + grad through pm.Potential."""
    import pymc as pm
    import pytensor.tensor as pt

    from celerite2_tpu.pymc_support import celerite_loglik_op

    t, yerr, y = dataset
    op = celerite_loglik_op(_mk, t, y, yerr=yerr)

    s = pt.dscalar("s")
    r = pt.dscalar("r")
    ll = op(s, r)
    f = pytensor.function([s, r], [ll, pytensor.grad(ll, s),
                                   pytensor.grad(ll, r)])
    got_ll, gs, gr = f(1.0, 3.0)
    want = float(gp_loglik(_mk(1.0, 3.0), t, y, yerr=yerr))
    np.testing.assert_allclose(float(got_ll), want, rtol=1e-7)
    wgs, wgr = jax.grad(
        lambda a, b: gp_loglik(_mk(a, b), t, y, yerr=yerr), argnums=(0, 1)
    )(1.0, 3.0)
    np.testing.assert_allclose(float(gs), float(wgs), rtol=1e-6)
    np.testing.assert_allclose(float(gr), float(wgr), rtol=1e-6)


@requires_pymc
def test_pymc_sample_perform_linker(dataset):
    import pymc as pm

    from celerite2_tpu.pymc_support import marginal

    t, yerr, y = dataset
    with pm.Model():
        sigma = pm.HalfNormal("sigma", 1.0)
        rho = pm.HalfNormal("rho", 5.0)
        marginal("obs", _mk, (sigma, rho), t, yerr=yerr, observed=y)
        idata = pm.sample(
            draws=25, tune=25, chains=1, cores=1, progressbar=False,
            compute_convergence_checks=False, random_seed=3,
        )
    post = idata.posterior
    assert post["sigma"].shape == (1, 25)
    assert np.all(np.isfinite(np.asarray(post["rho"])))


@requires_pymc
def test_pymc_sample_jax_linker(dataset):
    """The jax_funcify registration: the whole model compiles to one
    XLA program through pymc's JAX sampler."""
    import pymc as pm

    from celerite2_tpu.pymc_support import marginal

    sampling_jax = pytest.importorskip("pymc.sampling.jax")

    t, yerr, y = dataset
    with pm.Model():
        sigma = pm.HalfNormal("sigma", 1.0)
        rho = pm.HalfNormal("rho", 5.0)
        marginal("obs", _mk, (sigma, rho), t, yerr=yerr, observed=y)
        idata = sampling_jax.sample_numpyro_nuts(
            draws=25, tune=25, chains=1, progressbar=False,
            random_seed=4,
        )
    assert idata.posterior["sigma"].shape == (1, 25)


@requires_pymc
def test_pymc_prior_predictive(dataset):
    """marginal() is a real RV: sample_prior_predictive draws data
    (reference pymc/distribution.py:46-93 capability)."""
    import pymc as pm

    from celerite2_tpu.pymc_support import marginal

    t, yerr, y = dataset
    with pm.Model():
        sigma = pm.HalfNormal("sigma", 1.0)
        rho = pm.HalfNormal("rho", 5.0)
        marginal("obs", _mk, (sigma, rho), t, yerr=yerr, observed=y)
        prior = pm.sample_prior_predictive(draws=7, random_seed=5)
    draws = np.asarray(prior.prior_predictive["obs"])
    assert draws.shape == (1, 7, len(t))
    assert np.all(np.isfinite(draws))


@requires_pymc
def test_pymc_conditional_model_variable(dataset):
    """conditional() adds a predictive MvNormal to the model
    (reference pymc/celerite2.py:108-155)."""
    import pymc as pm

    from celerite2_tpu.pymc_support import conditional

    t, yerr, y = dataset
    t_new = np.linspace(0, 10, 11)
    with pm.Model():
        sigma = pm.HalfNormal("sigma", 1.0)
        rho = pm.HalfNormal("rho", 5.0)
        pred = conditional(
            "pred", _mk, (sigma, rho), t, y, t_new=t_new, yerr=yerr
        )
        # the draw path (prior predictive through the MvNormal)
        prior = pm.sample_prior_predictive(draws=5, random_seed=6)
    vals = np.asarray(prior.prior["pred"])
    assert vals.shape == (1, 5, 11)
    assert np.all(np.isfinite(vals))


@requires_pymc
def test_pymc_conditional_moments_match_library(dataset):
    """The symbolic (mu, cov) equal the library's conditional at fixed
    parameters, including through pytensor.grad."""
    import pytensor.tensor as pt

    from celerite2_tpu.pymc_support import (
        ConditionalMomentsCore,
        CeleriteConditionalMomentsOp,
    )

    t, yerr, y = dataset
    t_new = np.linspace(0, 10, 9)
    core = ConditionalMomentsCore(_mk, t, y, t_new=t_new, yerr=yerr)
    op = CeleriteConditionalMomentsOp(core)

    s = pt.dscalar("s")
    r = pt.dscalar("r")
    mu, cov = op(s, r)
    loss = pt.sum(mu**2) + pt.sum(cov)
    f = pytensor.function([s, r], [mu, cov, pytensor.grad(loss, s)])
    mu_v, cov_v, gs = f(1.0, 3.0)

    gp = GaussianProcess(_mk(1.0, 3.0), t=t, yerr=yerr)
    cond = gp.condition(y, t=t_new)
    np.testing.assert_allclose(mu_v, np.asarray(cond.mean), rtol=1e-6)
    np.testing.assert_allclose(
        cov_v, np.asarray(cond.covariance), rtol=1e-5, atol=1e-8
    )

    def scalar(a, b):
        m, c = core.fn(a, b)
        return jnp.sum(m**2) + jnp.sum(c)

    want = jax.grad(scalar)(1.0, 3.0)
    np.testing.assert_allclose(float(gs), float(want), rtol=1e-5)
