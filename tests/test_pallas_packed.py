"""Lane-packed Pallas kernels vs the lax.scan oracle tier.

Interpret mode on CPU (compiled on TPU).  Covers J padding to a power
of two (the default test kernel has J=4; a SHO+Real mix gives J=3),
row padding, upper/lower, forward/reverse, and dispatch-level grads.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from celerite2_tpu.config import set_config
from celerite2_tpu.ops import pallas_packed as pp
from celerite2_tpu.ops import scan
from celerite2_tpu.models.terms import RealTerm, SHOTerm
from celerite2_tpu.testing import get_matrices

BLOCK = 16


def _sys(size=100, J3=False):
    kernel = (
        SHOTerm(S0=5.0, w0=0.1, Q=3.45) + RealTerm(a=1.3, c=0.4)
        if J3
        else None
    )
    t, c, a, U, V, Y = get_matrices(size=size, kernel=kernel, vector=True)
    t, c, a, U, V = map(jnp.asarray, (t, c, a, U, V))
    Y = jnp.asarray(Y)[:, None]
    return t, c, a, U, V, Y


@pytest.mark.parametrize("J3", [False, True])
def test_factor_packed(J3):
    t, c, a, U, V, Y = _sys(J3=J3)
    d, W, S = scan.factor_scan(t, c, a, U, V)
    d2, W2, (Sh, ShT) = pp.factor_packed(t, c, a, U, V, block_size=BLOCK)
    np.testing.assert_allclose(d2, d, rtol=1e-12)
    np.testing.assert_allclose(W2, W, rtol=1e-11, atol=1e-13)
    J = U.shape[1]
    Jp = pp._pow2_width(J)
    Sh_std = Sh.reshape(-1, Jp, Jp)[:, :J, :J]
    np.testing.assert_allclose(Sh_std, S, rtol=1e-11, atol=1e-13)
    ShT_std = ShT.reshape(-1, Jp, Jp)[:, :J, :J]
    np.testing.assert_allclose(
        ShT_std, jnp.swapaxes(S, 1, 2) * 0 + jnp.einsum("njk->nkj", S),
        rtol=1e-11, atol=1e-13,
    )


@pytest.mark.parametrize("op", ["solve_lower", "solve_upper",
                                "matmul_lower", "matmul_upper"])
def test_sweeps_packed(op):
    t, c, a, U, V, Y = _sys()
    d, W, S = scan.factor_scan(t, c, a, U, V)
    B2 = W if op.startswith("solve") else V
    Zr, Fr = getattr(scan, op + "_scan")(t, c, U, B2, Y)
    Z2, F2 = getattr(pp, op + "_packed")(t, c, U, B2, Y, block_size=BLOCK)
    np.testing.assert_allclose(Z2, Zr, rtol=1e-11, atol=1e-13)
    np.testing.assert_allclose(F2, Fr, rtol=1e-11, atol=1e-13)


@pytest.mark.parametrize("J3", [False, True])
def test_factor_rev_packed(J3):
    t, c, a, U, V, Y = _sys(J3=J3)
    d, W, S = scan.factor_scan(t, c, a, U, V)
    _, _, S_pair = pp.factor_packed(t, c, a, U, V, block_size=BLOCK)
    rng = np.random.default_rng(3)
    bd = jnp.asarray(rng.normal(size=d.shape))
    bW = jnp.asarray(rng.normal(size=W.shape))
    ref = scan.factor_rev_scan(t, c, a, U, V, d, W, S, bd, bW)
    out = pp.factor_rev_packed(
        t, c, a, U, V, d, W, S_pair, bd, bW, block_size=BLOCK
    )
    for r, o, name in zip(ref, out, ["bt", "bc", "ba", "bU", "bV"]):
        np.testing.assert_allclose(
            o, r, rtol=1e-9, atol=1e-11, err_msg=name
        )


@pytest.mark.parametrize("is_solve", [True, False])
@pytest.mark.parametrize("upper", [True, False])
def test_sweep_rev_packed(is_solve, upper):
    t, c, a, U, V, Y = _sys()
    d, W, S = scan.factor_scan(t, c, a, U, V)
    rng = np.random.default_rng(4)
    if is_solve:
        A, B2 = (W, U) if upper else (U, W)
    else:
        A, B2 = (V, U) if upper else (U, V)
    Z, F = scan._sweep(t, c, A, B2, Y, is_solve=is_solve, upper=upper)
    bZ = jnp.asarray(rng.normal(size=Z.shape))
    ref = scan.sweep_rev_scan(
        t, c, A, B2, Y, Z, F, bZ, is_solve=is_solve, upper=upper
    )
    out = pp.sweep_rev_packed(
        t, c, A, B2, Y, Z, F, bZ, is_solve=is_solve, upper=upper,
        block_size=BLOCK,
    )
    for r, o, name in zip(ref, out, ["bt", "bc", "bA", "bB", "bY"]):
        np.testing.assert_allclose(
            o, r, rtol=1e-9, atol=1e-11, err_msg=name
        )


@pytest.mark.slow
def test_packed_grad_and_vmap_dispatch():
    """End-to-end loglik grad through the packed dispatch + the
    custom_vmap scan fallback."""
    from celerite2_tpu.gp import gp_compute, gp_log_likelihood

    rng = np.random.default_rng(5)
    t = jnp.asarray(np.sort(rng.uniform(0, 10, 60)))
    yerr = jnp.full(60, 0.3)
    y = jnp.asarray(np.sin(np.asarray(t)))

    def ll(theta, t, yerr, y):
        k = SHOTerm(
            sigma=jnp.exp(theta[0]),
            rho=jnp.exp(theta[1]),
            tau=jnp.exp(theta[2]),
        )
        return gp_log_likelihood(gp_compute(k, t, yerr=yerr), y)

    th = jnp.log(jnp.asarray([1.0, 3.0, 2.0]))
    try:
        set_config(backend="pallas", pallas_threshold=1)
        v1, g1 = jax.value_and_grad(ll)(th, t, yerr, y)
        # batched: falls back to vmapped scan inside custom_vmap
        ths = jnp.stack([th, th + 0.05])
        vb = jax.vmap(lambda p: ll(p, t, yerr, y))(ths)
        gb = jax.vmap(lambda p: jax.grad(ll)(p, t, yerr, y))(ths)
        set_config(backend="scan")
        v2, g2 = jax.value_and_grad(ll)(th, t, yerr, y)
        vb2 = jax.vmap(lambda p: ll(p, t, yerr, y))(ths)
        gb2 = jax.vmap(lambda p: jax.grad(ll)(p, t, yerr, y))(ths)
    finally:
        set_config(backend="auto", pallas_threshold=512)

    np.testing.assert_allclose(v1, v2, rtol=1e-10)
    np.testing.assert_allclose(g1, g2, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(vb, vb2, rtol=1e-10)
    np.testing.assert_allclose(gb, gb2, rtol=1e-8, atol=1e-10)
