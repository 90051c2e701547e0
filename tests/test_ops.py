"""Tier-1 op correctness vs dense linear-algebra oracles
(pattern of reference python/test/test_driver.py and c++/test/)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from celerite2_tpu import ops
from celerite2_tpu.config import set_config
from celerite2_tpu.ops import assoc, scan
from celerite2_tpu.testing import get_matrices


@pytest.fixture(autouse=True)
def _force_scan_backend():
    set_config(backend="scan")
    yield
    set_config(backend="auto")


def test_to_dense():
    t, c, a, U, V, Y, K = get_matrices(include_dense=True)
    K2 = ops.to_dense(t, c, a, U, V)
    np.testing.assert_allclose(K2, K, atol=1e-12)


def test_factor_vs_dense_cholesky():
    t, c, a, U, V, Y, K = get_matrices(include_dense=True)
    d, W = ops.factor(t, c, a, U, V)

    # Reconstruct L from the semiseparable rep and check K = L d L^T
    N, J = U.shape
    L = np.eye(N)
    phi = np.asarray(scan.transport(t, c))
    P = np.cumprod(
        np.concatenate([np.ones((1, J)), phi[1:]], axis=0), axis=0
    )
    with np.errstate(divide="ignore", invalid="ignore"):
        pass
    for n in range(N):
        for m in range(n):
            trans = np.exp(-np.asarray(c) * (t[n] - t[m]))
            L[n, m] = np.sum(np.asarray(U)[n] * np.asarray(W)[m] * trans)
    rec = L @ np.diag(np.asarray(d)) @ L.T
    np.testing.assert_allclose(rec, K, atol=1e-10)

    # log-det parity with dense
    sign, logdet = np.linalg.slogdet(K)
    assert sign > 0
    np.testing.assert_allclose(np.sum(np.log(d)), logdet, atol=1e-10)


def test_solve_lower_upper_vs_dense():
    t, c, a, U, V, Y, K = get_matrices(include_dense=True)
    d, W = ops.factor(t, c, a, U, V)

    N, J = U.shape
    L = np.eye(N)
    for n in range(N):
        for m in range(n):
            trans = np.exp(-np.asarray(c) * (t[n] - t[m]))
            L[n, m] = np.sum(np.asarray(U)[n] * np.asarray(W)[m] * trans)

    Z = ops.solve_lower(t, c, U, W, Y)
    np.testing.assert_allclose(Z, np.linalg.solve(L, Y), atol=1e-9)

    Zu = ops.solve_upper(t, c, U, W, Y)
    np.testing.assert_allclose(Zu, np.linalg.solve(L.T, Y), atol=1e-9)

    # full K solve: L^{-T} d^{-1} L^{-1}
    x = ops.solve_upper(
        t, c, U, W, ops.solve_lower(t, c, U, W, Y) / np.asarray(d)[:, None]
    )
    np.testing.assert_allclose(x, np.linalg.solve(K, Y), atol=1e-8)


def test_matmul_vs_dense():
    t, c, a, U, V, Y, K = get_matrices(include_dense=True)
    Klow = np.tril(np.asarray(K) - np.diag(np.asarray(a)), -1)

    Z = ops.matmul_lower(t, c, U, V, Y)
    np.testing.assert_allclose(Z, Klow @ Y, atol=1e-10)

    Zu = ops.matmul_upper(t, c, U, V, Y)
    np.testing.assert_allclose(Zu, Klow.T @ Y, atol=1e-10)

    full = np.asarray(a)[:, None] * Y + Z + Zu
    np.testing.assert_allclose(full, K @ Y, atol=1e-9)


def test_general_matmul_vs_dense():
    (t, c, a, U, V, Y, t2, U2, V2, K, Kstar) = get_matrices(
        conditional=True, include_dense=True
    )
    # Z = K*(t2, t) @ Y — prediction at new points t2 from sources t
    Zl = ops.general_matmul_lower(t2, t, c, U2, V, Y)
    Zu = ops.general_matmul_upper(t2, t, c, V2, U, Y)
    np.testing.assert_allclose(Zl + Zu, Kstar.T @ Y, atol=1e-9)


def test_general_matmul_assoc_tier_parity():
    """The assoc-tier transported cumulative (prefix engine) matches
    the sequential-scan form for the general matmuls (the single-chip
    prediction path; role of reference forward.hpp:285-392)."""
    from celerite2_tpu.config import get_config, set_config

    (t, c, a, U, V, Y, t2, U2, V2, K, Kstar) = get_matrices(
        conditional=True, include_dense=True
    )
    t, t2 = jnp.asarray(t), jnp.asarray(t2)
    prior = get_config()
    try:
        set_config(backend="scan")
        Zl0 = ops.general_matmul_lower(t2, t, c, U2, V, Y)
        Zu0 = ops.general_matmul_upper(t2, t, c, V2, U, Y)
        set_config(backend="assoc")
        Zl1, Zu1 = jax.jit(
            lambda: (
                ops.general_matmul_lower(t2, t, c, U2, V, Y),
                ops.general_matmul_upper(t2, t, c, V2, U, Y),
            )
        )()
    finally:
        set_config(**prior.__dict__)
    np.testing.assert_allclose(Zl1, Zl0, rtol=1e-10, atol=1e-13)
    np.testing.assert_allclose(Zu1, Zu0, rtol=1e-10, atol=1e-13)


def test_nonpd_detection():
    t, c, a, U, V, Y = get_matrices()
    a_bad = np.asarray(a).copy()
    a_bad[:] = -1.0  # forces negative pivots
    d, W = ops.factor(t, c, jnp.asarray(a_bad), U, V)
    assert not bool(jnp.all(d > 0))
    assert bool(jnp.all(jnp.isfinite(W)))  # guarded division, no NaNs


# ---------------------------------------------------------------- assoc


@pytest.mark.parametrize("vector", [False])
def test_assoc_matches_scan(vector):
    t, c, a, U, V, Y = get_matrices(vector=vector)

    d1, W1, S1 = scan.factor_scan(t, c, a, U, V)
    d2, W2, S2 = assoc.factor_assoc(t, c, a, U, V)
    np.testing.assert_allclose(d2, d1, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(W2, W1, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(S2, S1, rtol=1e-8, atol=1e-10)

    Z1, F1 = scan.solve_lower_scan(t, c, U, W1, Y)
    Z2, F2 = assoc.solve_lower_assoc(t, c, U, W1, Y)
    np.testing.assert_allclose(Z2, Z1, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(F2, F1, rtol=1e-8, atol=1e-11)

    Z1, F1 = scan.solve_upper_scan(t, c, U, W1, Y)
    Z2, F2 = assoc.solve_upper_assoc(t, c, U, W1, Y)
    np.testing.assert_allclose(Z2, Z1, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(F2, F1, rtol=1e-8, atol=1e-11)

    Z1, F1 = scan.matmul_lower_scan(t, c, U, V, Y)
    Z2, F2 = assoc.matmul_lower_assoc(t, c, U, V, Y)
    np.testing.assert_allclose(Z2, Z1, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(F2, F1, rtol=1e-8, atol=1e-11)

    Z1, F1 = scan.matmul_upper_scan(t, c, U, V, Y)
    Z2, F2 = assoc.matmul_upper_assoc(t, c, U, V, Y)
    np.testing.assert_allclose(Z2, Z1, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(F2, F1, rtol=1e-8, atol=1e-11)


def test_ops_jit_and_vmap():
    t, c, a, U, V, Y = get_matrices(size=40)

    @jax.jit
    def run(a):
        d, W = ops.factor(t, c, a, U, V)
        return jnp.sum(jnp.log(d))

    v = run(jnp.asarray(a))
    assert jnp.isfinite(v)

    batch_a = jnp.stack([jnp.asarray(a)] * 3)
    out = jax.vmap(lambda aa: run(aa))(batch_a)
    np.testing.assert_allclose(out, np.full(3, float(v)), rtol=1e-12)
