"""Fused factor+solve op: element-action correctness, tier parity with
the unfused pipeline, and gradient parity of the fused log-likelihood."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# compile-heavy tier-parity sweeps: excluded from the CI fast tier
pytestmark = pytest.mark.slow

from celerite2_tpu import ops, terms
from celerite2_tpu.config import get_config, set_config
from celerite2_tpu.gp import gp_compute, gp_log_likelihood, gp_loglik
from celerite2_tpu.ops import assoc, scan
from celerite2_tpu.testing import get_matrices


@pytest.fixture
def restore_config():
    prior = get_config()
    yield
    set_config(**dataclasses.asdict(prior))


def _apply_kalman(e, S, F):
    """Reference action of one fused element on the (S, F) state."""
    A, Q, R, b, eta = e
    J = A.shape[0]
    M = np.linalg.solve(np.eye(J) + S @ R, np.concatenate([S, F + S @ eta], axis=1))
    Sh = M[:, :J]
    Fh = M[:, J:]
    return A @ Sh @ A.T + Q, A @ Fh + b


def test_kalman_combine_matches_sequential_action():
    """combine(e1, e2) acting once == e2 acting after e1."""
    rng = np.random.default_rng(0)
    J, K = 3, 2

    def rand_el():
        A = 0.3 * rng.normal(size=(J, J))
        Q = 0.2 * np.eye(J) + 0.05 * rng.normal(size=(J, J))
        Q = 0.5 * (Q + Q.T)
        R = -0.1 * np.eye(J) + 0.02 * rng.normal(size=(J, J))
        R = 0.5 * (R + R.T)
        b = rng.normal(size=(J, K))
        eta = rng.normal(size=(J, K))
        return (A, Q, R, b, eta)

    e1, e2 = rand_el(), rand_el()
    S0 = 0.1 * np.eye(J)
    F0 = rng.normal(size=(J, K))

    seq = _apply_kalman(e2, *_apply_kalman(e1, S0, F0))
    e12 = assoc._kalman_combine(
        tuple(jnp.asarray(x) for x in e1), tuple(jnp.asarray(x) for x in e2)
    )
    comb = _apply_kalman(tuple(np.asarray(x) for x in e12), S0, F0)
    np.testing.assert_allclose(comb[0], seq[0], rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(comb[1], seq[1], rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("tier", ["scan", "assoc"])
def test_factor_solve_matches_unfused(tier):
    t, c, a, U, V, Y = (
        jnp.asarray(x) for x in get_matrices(size=128)
    )
    if tier == "scan":
        d, W, Z, S, F = scan.factor_solve_scan(t, c, a, U, V, Y)
    else:
        d, W, Z, S, F = assoc.factor_solve_assoc(t, c, a, U, V, Y)
    d0, W0, S0 = scan.factor_scan(t, c, a, U, V)
    Z0, F0 = scan.solve_lower_scan(t, c, U, W0, Y)
    np.testing.assert_allclose(d, d0, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(W, W0, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(Z, Z0, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(S, S0, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(F, F0, rtol=1e-9, atol=1e-11)


@pytest.mark.parametrize("backend", ["scan", "assoc"])
def test_gp_loglik_fused_matches_state_path(backend, restore_config):
    set_config(backend=backend, assoc_threshold=1)
    kernel = terms.SHOTerm(S0=1.3, w0=1.05, Q=3.0) + terms.SHOTerm(
        S0=0.5, w0=2.0, Q=0.2
    )
    rng = np.random.default_rng(42)
    N = 96
    t = np.sort(rng.uniform(0, 10, N))
    yerr = rng.uniform(0.1, 0.3, N)
    y = np.sin(t) + yerr * rng.normal(size=N)

    state = gp_compute(kernel, t, yerr=yerr)
    ll_ref = gp_log_likelihood(state, y)
    ll_fused = gp_loglik(kernel, t, y, yerr=yerr)
    np.testing.assert_allclose(ll_fused, ll_ref, rtol=1e-10)


@pytest.mark.parametrize("backend", ["scan", "assoc"])
def test_gp_loglik_fused_grad_parity(backend, restore_config):
    """Gradients through the fused path == gradients through the
    composed factor + solve custom VJPs (incl. time gradients)."""
    set_config(backend=backend, assoc_threshold=1)
    rng = np.random.default_rng(3)
    N = 80
    t = np.sort(rng.uniform(0, 10, N))
    yerr = np.full(N, 0.25)
    y = np.sin(t)

    def fused(theta, tt, yy):
        k = terms.SHOTerm(
            sigma=jnp.exp(theta[0]),
            rho=jnp.exp(theta[1]),
            tau=jnp.exp(theta[2]),
        )
        return gp_loglik(k, tt, yy, yerr=yerr)

    def composed(theta, tt, yy):
        k = terms.SHOTerm(
            sigma=jnp.exp(theta[0]),
            rho=jnp.exp(theta[1]),
            tau=jnp.exp(theta[2]),
        )
        return gp_log_likelihood(gp_compute(k, tt, yerr=yerr), yy)

    theta = jnp.log(jnp.asarray([1.0, 3.0, 2.0]))
    args = (theta, jnp.asarray(t), jnp.asarray(y))
    v1, g1 = jax.value_and_grad(fused, argnums=(0, 1, 2))(*args)
    v2, g2 = jax.value_and_grad(composed, argnums=(0, 1, 2))(*args)
    np.testing.assert_allclose(v1, v2, rtol=1e-10)
    for a1, a2 in zip(g1, g2):
        np.testing.assert_allclose(a1, a2, rtol=1e-7, atol=1e-9)


def test_gp_loglik_quiet_neg_inf(restore_config):
    """Non-PD systems give -inf without poisoning gradients."""
    kernel = terms.RealTerm(a=1.0, c=0.5)
    t = np.linspace(0, 10, 30)

    def f(s):
        k = terms.RealTerm(a=s, c=0.5)
        # negative diag makes the system non-PD
        return gp_loglik(k, t, np.sin(t), diag=-2.0 * np.ones_like(t))

    val = f(jnp.asarray(1.0))
    assert np.isneginf(float(val))
    del kernel


@pytest.mark.parametrize("size", [40, 200])
def test_paired_reverse_matches_two_pass(size):
    """factor_solve_rev_assoc == sweep_rev then factor_rev, including
    sizes above the engine block (exercises block padding, which is NOT
    an identity on the deferral components)."""
    t, c, a, U, V, Y = (
        jnp.asarray(x) for x in get_matrices(size=size, vector=True)
    )
    Y = Y[:, None]
    d, W, Z, S, F = scan.factor_solve_scan(t, c, a, U, V, Y)
    rng = np.random.default_rng(0)
    bd = jnp.asarray(rng.normal(size=d.shape))
    bWp = jnp.asarray(rng.normal(size=W.shape))
    bZ = jnp.asarray(rng.normal(size=Z.shape))

    bt1, bc1, bU1, bW1, bY = scan.sweep_rev_scan(
        t, c, U, W, Y, Z, F, bZ, is_solve=True, upper=False
    )
    bt2, bc2, ba, bU2, bV = scan.factor_rev_scan(
        t, c, a, U, V, d, W, S, bd, bWp + bW1
    )
    ref = (bt1 + bt2, bc1 + bc2, ba, bU1 + bU2, bV, bY)
    out = assoc.factor_solve_rev_assoc(
        t, c, a, U, V, Y, d, W, Z, S, F, bd, bWp, bZ
    )
    for name, r, o in zip(["bt", "bc", "ba", "bU", "bV", "bY"], ref, out):
        np.testing.assert_allclose(
            o, r, rtol=1e-9, atol=1e-11, err_msg=name
        )
