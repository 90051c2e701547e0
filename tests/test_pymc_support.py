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
