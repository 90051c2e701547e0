"""Parity of the fused slab-resident loglik pipeline (ops/fused_slab)
against the factor_solve custom_vjp pipeline, on CPU in pallas
interpret mode.

Small N keeps interpret mode cheap; geometries are chosen to exercise
block-boundary shifts (NB > 1), step padding (L < LP), lane padding
(GB < TOT) and the one-hot n = 0 masks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from celerite2_tpu import terms
from celerite2_tpu.config import get_config, set_config
from celerite2_tpu.ops.fused_slab import loglik_slab, slab_wanted


@pytest.fixture
def slab_env():
    prior = get_config()
    set_config(backend="assoc", fused_slab="off")
    try:
        yield
    finally:
        set_config(**prior.__dict__)


def _system(N, J=2, seed=0, nonpd=False):
    rng = np.random.default_rng(seed)
    t = jnp.asarray(np.sort(rng.uniform(0, 10, N)))
    if J == 1:
        kernel = terms.RealTerm(a=1.1, c=0.7)
    elif J == 2:
        kernel = terms.SHOTerm(sigma=1.3, rho=3.4, tau=2.9)
    elif J == 3:
        kernel = terms.RealTerm(a=1.1, c=0.7) + terms.SHOTerm(
            sigma=1.3, rho=3.4, tau=2.9
        )
    else:
        kernel = terms.SHOTerm(sigma=1.3, rho=3.4, tau=2.9) + terms.SHOTerm(
            sigma=0.7, rho=1.1, tau=5.0
        )
    diag = jnp.full(N, -2.0 if nonpd else 0.04)
    c, a, U, V = kernel.get_celerite_matrices(t, diag)
    y = jnp.asarray(np.sin(np.asarray(t)) + 0.2 * rng.normal(size=N))
    return t, c, a, U, V, y


def _ll_ref(t, c, a, U, V, y):
    from celerite2_tpu import ops

    d, _, z = ops.factor_solve(t, c, a, U, V, y[:, None])
    ok = jnp.all(d > 0)
    safe_d = jnp.where(d > 0, d, jnp.ones_like(d))
    ll = -0.5 * (
        jnp.sum(jnp.log(safe_d))
        + jnp.sum(z[:, 0] ** 2 / safe_d)
        + t.shape[0] * np.log(2 * np.pi)
    )
    return jnp.where(ok, ll, -jnp.inf)


# N = 65: NB > 1 with a ragged last block; N = 130: lane padding;
# N = 1040: multiple of L with TOT > GB and LP > L
@pytest.mark.parametrize(
    "N",
    [pytest.param(65, marks=pytest.mark.slow), 130,
     pytest.param(1040, marks=pytest.mark.slow)],
)
@pytest.mark.parametrize(
    "J", [pytest.param(1, marks=pytest.mark.slow), 2]
)
def test_value_and_grad_parity(slab_env, N, J):
    _check_parity(N, J)


# J = 3 (odd: bordered plane inverses) and J = 4 exercise the
# structured A/B/C factor adjoint instead of the dense-in-kernel one
@pytest.mark.slow
@pytest.mark.parametrize("J", [3, 4])
def test_value_and_grad_parity_wide(slab_env, J):
    _check_parity(130, J)


def _check_parity(N, J):
    args = _system(N, J=J)
    v0 = loglik_slab(*args)
    v1 = _ll_ref(*args)
    np.testing.assert_allclose(
        np.asarray(v0), np.asarray(v1), rtol=1e-10
    )
    g0 = jax.grad(loglik_slab, argnums=tuple(range(6)))(*args)
    g1 = jax.grad(_ll_ref, argnums=tuple(range(6)))(*args)
    for name, x0, x1 in zip(["bt", "bc", "ba", "bU", "bV", "by"], g0, g1):
        scale = np.max(np.abs(np.asarray(x1))) + 1e-300
        np.testing.assert_allclose(
            np.asarray(x0) / scale,
            np.asarray(x1) / scale,
            atol=1e-9,
            err_msg=name,
        )


def test_nonpd_quiet_minus_inf(slab_env):
    args = _system(80, nonpd=True)
    v = loglik_slab(*args)
    assert np.isneginf(np.asarray(v))
    g = jax.grad(loglik_slab, argnums=(2,))(*args)[0]
    np.testing.assert_array_equal(np.asarray(g), 0.0)


def test_gp_loglik_routing(slab_env):
    """fused_slab='on' routes gp_loglik through the slab pipeline with
    identical value + theta-gradient."""
    from celerite2_tpu.gp import gp_loglik

    rng = np.random.default_rng(3)
    N = 130
    t = jnp.asarray(np.sort(rng.uniform(0, 10, N)))
    yerr = jnp.full(N, 0.2)
    y = jnp.asarray(np.sin(np.asarray(t)) + 0.2 * rng.normal(size=N))

    def ll(theta):
        k = terms.SHOTerm(
            sigma=jnp.exp(theta[0]),
            rho=jnp.exp(theta[1]),
            tau=jnp.exp(theta[2]),
        )
        return gp_loglik(k, t, y, yerr=yerr)

    theta = jnp.asarray([0.1, 1.2, 1.0])
    set_config(fused_slab="off")
    v0, g0 = jax.value_and_grad(ll)(theta)
    set_config(fused_slab="on")
    assert slab_wanted(t, jnp.zeros((N, 2)), y)
    v1, g1 = jax.value_and_grad(ll)(theta)
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(g0), np.asarray(g1), rtol=1e-8
    )


def test_routing_guards(slab_env):
    """vmapped traces, K > 1, wide J and tiny N stay off the slab path."""
    set_config(fused_slab="auto")
    t = jnp.linspace(0, 1, 100)
    y = jnp.zeros(100)
    assert not slab_wanted(t, jnp.zeros((100, 5)), y)  # J > 4
    assert not slab_wanted(t, jnp.zeros((100, 2)), jnp.zeros((100, 2)))
    assert not slab_wanted(t[:32], jnp.zeros((32, 2)), y[:32])  # tiny

    def probe(tv):
        return jnp.asarray(
            slab_wanted(tv, jnp.zeros((100, 2)), y), jnp.int32
        )

    out = jax.vmap(probe)(jnp.stack([t, t]))
    np.testing.assert_array_equal(np.asarray(out), 0)
