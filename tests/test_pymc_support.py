"""PyMC bridge: the pytensor-independent core must reproduce
gp_loglik and its gradients exactly, and the Op perform plumbing must
follow pytensor's output-storage contract (reference counterpart:
python/test/pymc/test_pymc_ops.py, run here without the dependency via
the stubbed shell — the real pytensor classes are import-gated)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from celerite2_tpu import terms
from celerite2_tpu.gp import gp_loglik
from celerite2_tpu.pymc_support import (
    HAS_PYTENSOR,
    CeleriteLoglikOp,
    LoglikCore,
    celerite_loglik_op,
    make_gp_loglik_fn,
    perform_grad,
    perform_value,
)


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(42)
    t = np.sort(rng.uniform(0, 10, 60))
    yerr = np.full(60, 0.2)
    y = np.sin(t) + 0.1 * rng.normal(size=60)
    return t, yerr, y


def make_kernel(sigma, rho, tau):
    return terms.SHOTerm(sigma=sigma, rho=rho, tau=tau)


def test_core_value_matches_gp_loglik(problem):
    t, yerr, y = problem
    fn = make_gp_loglik_fn(make_kernel, t, y, yerr=yerr)
    core = LoglikCore(fn)
    got = core.value(1.5, 3.4, 2.345)
    want = gp_loglik(
        make_kernel(1.5, 3.4, 2.345), jnp.asarray(t), jnp.asarray(y),
        yerr=jnp.asarray(yerr),
    )
    np.testing.assert_allclose(float(got), float(want), rtol=1e-12)


def test_core_grad_matches_jax_grad(problem):
    t, yerr, y = problem
    fn = make_gp_loglik_fn(make_kernel, t, y, yerr=yerr)
    core = LoglikCore(fn)
    params = (1.5, 3.4, 2.345)
    got = core.grad(np.asarray(1.0), *params)
    want = jax.grad(fn, argnums=(0, 1, 2))(*map(jnp.asarray, params))
    assert len(got) == 3
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, np.asarray(w), rtol=1e-10)
    # cotangent scaling: vjp, not bare grad
    scaled = core.grad(np.asarray(-2.0), *params)
    for s, w in zip(scaled, want):
        np.testing.assert_allclose(s, -2.0 * np.asarray(w), rtol=1e-10)


def test_core_array_parameters(problem):
    """Parameters may be arrays (e.g. a packed theta vector)."""
    t, yerr, y = problem

    def mk(theta):
        return make_kernel(theta[0], theta[1], theta[2])

    core = LoglikCore(make_gp_loglik_fn(mk, t, y, yerr=yerr))
    theta = np.asarray([1.5, 3.4, 2.345])
    (g,) = core.grad(np.asarray(1.0), theta)
    assert g.shape == (3,)
    want = jax.grad(core.fn)(jnp.asarray(theta))
    np.testing.assert_allclose(g, np.asarray(want), rtol=1e-10)


def test_perform_contract(problem):
    """perform_* write into pytensor-style output storage (list of
    one-element lists), preserving parameter dtypes."""
    t, yerr, y = problem
    core = LoglikCore(make_gp_loglik_fn(make_kernel, t, y, yerr=yerr))
    params = [np.float64(1.5), np.float64(3.4), np.float64(2.345)]

    storage = [[None]]
    perform_value(core, params, storage)
    assert storage[0][0].shape == ()
    assert storage[0][0].dtype == np.float64

    gstorage = [[None], [None], [None]]
    perform_grad(core, [np.asarray(1.0), *params], gstorage)
    for slot, p in zip(gstorage, params):
        assert slot[0].dtype == np.asarray(p).dtype
        assert np.isfinite(slot[0])


def test_quiet_minus_inf(problem):
    """Non-PD kernels keep the library's branchless -inf (the PyMC
    rejection contract, reference pymc/distribution.py:123-128)."""
    t, yerr, y = problem

    def mk(a, c):
        return terms.RealTerm(a=a, c=c)

    core = LoglikCore(make_gp_loglik_fn(mk, t, y, diag=np.zeros_like(t)))
    val = core.value(-25.0, 0.01)
    assert np.isneginf(val)
    assert not np.isnan(val)


def test_gated_shell(problem):
    """Without pytensor the Op is constructible (core reachable) but
    symbolic use raises with a pointer at the built-in engine."""
    t, yerr, y = problem
    op = celerite_loglik_op(make_kernel, t, y, yerr=yerr)
    assert isinstance(op, CeleriteLoglikOp)
    got = op.core.value(1.5, 3.4, 2.345)
    assert np.isfinite(got)
    if not HAS_PYTENSOR:
        with pytest.raises(ImportError, match="inference"):
            op(1.5, 3.4, 2.345)


# ------------------------------------------- marginal / conditional cores


def test_marginal_core_logp_and_prior_draw_law(problem):
    """MarginalCore: logp(value, *params) == gp_loglik, and the prior
    sampler is affine in z with A A^T == the dense kernel matrix (the
    exact law check, no Monte Carlo)."""
    from celerite2_tpu.pymc_support import MarginalCore

    t, yerr, y = problem
    core = MarginalCore(make_kernel, t, yerr=yerr)
    lp = core.logp.value(np.asarray(y), 1.5, 3.4, 2.345)
    want = gp_loglik(
        make_kernel(1.5, 3.4, 2.345), jnp.asarray(t), jnp.asarray(y),
        yerr=jnp.asarray(yerr),
    )
    np.testing.assert_allclose(float(lp), float(want), rtol=1e-10)

    params = tuple(map(jnp.asarray, (1.5, 3.4, 2.345)))
    A = jax.jacrev(lambda z: core._draw(z[None, :], *params)[0])(
        jnp.zeros(core.n)
    )
    K = make_kernel(*params).to_dense(jnp.asarray(t), jnp.asarray(yerr) ** 2)
    np.testing.assert_allclose(
        np.asarray(A @ A.T), np.asarray(K), rtol=1e-6, atol=1e-8
    )

    rng = np.random.default_rng(0)
    d = core.prior_draws(rng, None, 1.5, 3.4, 2.345)
    assert d.shape == (len(t),)
    d2 = core.prior_draws(rng, (3, 2), 1.5, 3.4, 2.345)
    assert d2.shape == (3, 2, len(t))
    assert np.all(np.isfinite(d2))


@pytest.mark.slow
def test_conditional_moments_core_matches_condition(problem):
    from celerite2_tpu import GaussianProcess
    from celerite2_tpu.pymc_support import (
        ConditionalMomentsCore,
        perform_moments,
        perform_moments_grad,
    )

    t, yerr, y = problem
    t_new = np.linspace(-0.5, 10.5, 9)
    core = ConditionalMomentsCore(
        make_kernel, t, y, t_new=t_new, yerr=yerr, mean=0.4
    )
    mu, cov = core.values(1.5, 3.4, 2.345)
    gp = GaussianProcess(
        make_kernel(1.5, 3.4, 2.345), t=t, yerr=yerr, mean=0.4
    )
    cond = gp.condition(y, t=t_new)
    np.testing.assert_allclose(mu, np.asarray(cond.mean), rtol=1e-6)
    np.testing.assert_allclose(
        cov, np.asarray(cond.covariance), rtol=1e-5, atol=1e-8
    )

    # VJP matches autodiff of a scalar functional of (mu, cov)
    gmu = np.linspace(0.5, 1.0, core.m)
    gcov = np.eye(core.m) * 0.1
    got = core.vjp(gmu, gcov, 1.5, 3.4, 2.345)

    def scalar(*ps):
        m, c = core.fn(*ps)
        return jnp.sum(m * gmu) + jnp.sum(c * gcov)

    want = jax.grad(scalar, argnums=(0, 1, 2))(
        *map(jnp.asarray, (1.5, 3.4, 2.345))
    )
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, np.asarray(w), rtol=1e-5, atol=1e-8)

    # perform plumbing (pytensor output-storage contract)
    storage = [[None], [None]]
    perform_moments(core, [np.float64(1.5), np.float64(3.4),
                           np.float64(2.345)], storage)
    assert storage[0][0].shape == (core.m,)
    assert storage[1][0].shape == (core.m, core.m)
    gstorage = [[None], [None], [None]]
    perform_moments_grad(
        core,
        [gmu, gcov, np.float64(1.5), np.float64(3.4), np.float64(2.345)],
        gstorage,
    )
    assert all(np.isfinite(s[0]) for s in gstorage)


def test_conditional_moments_core_component(problem):
    """component= selects a sub-kernel (the reference's kernel=)."""
    from celerite2_tpu import GaussianProcess
    from celerite2_tpu.pymc_support import ConditionalMomentsCore

    t, yerr, y = problem

    def mk(s1, r1, s2, c2):
        return terms.SHOTerm(sigma=s1, rho=r1, tau=3.0) + terms.RealTerm(
            a=s2, c=c2
        )

    t_new = np.linspace(0.0, 10.0, 7)
    core = ConditionalMomentsCore(
        mk, t, y, t_new=t_new, yerr=yerr,
        component=lambda s1, r1, s2, c2: terms.SHOTerm(
            sigma=s1, rho=r1, tau=3.0
        ),
        include_mean=False,
    )
    mu, cov = core.values(1.2, 2.5, 0.4, 0.9)
    gp = GaussianProcess(mk(1.2, 2.5, 0.4, 0.9), t=t, yerr=yerr)
    cond = gp.condition(
        y, t=t_new, include_mean=False,
        kernel=terms.SHOTerm(sigma=1.2, rho=2.5, tau=3.0),
    )
    np.testing.assert_allclose(mu, np.asarray(cond.mean), rtol=1e-6)
    np.testing.assert_allclose(
        cov, np.asarray(cond.covariance), rtol=1e-5, atol=1e-8
    )


def test_vector_signature():
    from celerite2_tpu.pymc_support import _vector_signature

    assert _vector_signature((1.0, 2.0)) == "(),()->(n)"
    assert (
        _vector_signature((np.zeros(3),)) == "(p0d0)->(n)"
    )
