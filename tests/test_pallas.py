"""Pallas kernel tier vs the lax.scan oracle tier.

Runs in interpret mode on CPU (compiled on real TPU); exercises padding
(N not a multiple of the block), multiple right-hand sides, upper/lower
and forward/reverse sweeps, and the custom_vmap fallback.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from celerite2_tpu.config import set_config
from celerite2_tpu.ops import pallas_kernels as pk
from celerite2_tpu.ops import scan
from celerite2_tpu.testing import get_matrices

BLOCK = 16  # small block so several grid steps + padding are exercised


@pytest.fixture(scope="module")
def sys100():
    t, c, a, U, V, Y = get_matrices(size=100)
    t, c, a, U, V, Y = map(jnp.asarray, (t, c, a, U, V, Y))
    d, W, S = scan.factor_scan(t, c, a, U, V)
    return t, c, a, U, V, Y, d, W, S


def test_factor_pallas(sys100):
    t, c, a, U, V, Y, d, W, S = sys100
    d2, W2, S2 = pk.factor_pallas(t, c, a, U, V, block_size=BLOCK)
    np.testing.assert_allclose(d2, d, rtol=1e-12)
    np.testing.assert_allclose(W2, W, rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(S2, S, rtol=1e-12, atol=1e-14)


@pytest.mark.parametrize("op", ["solve_lower", "solve_upper",
                                "matmul_lower", "matmul_upper"])
def test_sweeps_pallas(sys100, op):
    t, c, a, U, V, Y, d, W, S = sys100
    B2 = W if op.startswith("solve") else V
    ref = getattr(scan, op + "_scan")(t, c, U, B2, Y)
    out = getattr(pk, op + "_pallas")(t, c, U, B2, Y, block_size=BLOCK)
    np.testing.assert_allclose(out[0], ref[0], rtol=1e-11, atol=1e-13)
    np.testing.assert_allclose(out[1], ref[1], rtol=1e-11, atol=1e-13)


def test_factor_rev_pallas(sys100):
    t, c, a, U, V, Y, d, W, S = sys100
    rng = np.random.default_rng(3)
    bd = jnp.asarray(rng.normal(size=d.shape))
    bW = jnp.asarray(rng.normal(size=W.shape))
    ref = scan.factor_rev_scan(t, c, a, U, V, d, W, S, bd, bW)
    out = pk.factor_rev_pallas(
        t, c, a, U, V, d, W, S, bd, bW, block_size=BLOCK
    )
    for r, o, name in zip(ref, out, ["bt", "bc", "ba", "bU", "bV"]):
        np.testing.assert_allclose(
            o, r, rtol=1e-10, atol=1e-12, err_msg=name
        )


@pytest.mark.parametrize("is_solve", [True, False])
@pytest.mark.parametrize("upper", [True, False])
def test_sweep_rev_pallas(sys100, is_solve, upper):
    t, c, a, U, V, Y, d, W, S = sys100
    rng = np.random.default_rng(4)
    if is_solve:
        A, B2 = (W, U) if upper else (U, W)
    else:
        A, B2 = (V, U) if upper else (U, V)
    fwd = scan._sweep(t, c, A, B2, Y, is_solve=is_solve, upper=upper)
    Z, F = fwd
    bZ = jnp.asarray(rng.normal(size=Z.shape))
    ref = scan.sweep_rev_scan(
        t, c, A, B2, Y, Z, F, bZ, is_solve=is_solve, upper=upper
    )
    out = pk.sweep_rev_pallas(
        t, c, A, B2, Y, Z, F, bZ, is_solve=is_solve, upper=upper,
        block_size=BLOCK,
    )
    for r, o, name in zip(ref, out, ["bt", "bc", "bA", "bB", "bY"]):
        np.testing.assert_allclose(
            o, r, rtol=1e-9, atol=1e-11, err_msg=name
        )


def test_vector_rhs_and_odd_n():
    # N=37 (padding path), K=1
    t, c, a, U, V, Y = get_matrices(size=37, vector=True)
    t, c, a, U, V = map(jnp.asarray, (t, c, a, U, V))
    Y = jnp.asarray(Y)[:, None]
    d, W, S = scan.factor_scan(t, c, a, U, V)
    d2, W2, S2 = pk.factor_pallas(t, c, a, U, V, block_size=BLOCK)
    np.testing.assert_allclose(d2, d, rtol=1e-12)
    Z, F = scan.solve_lower_scan(t, c, U, W, Y)
    Z2, F2 = pk.solve_lower_pallas(t, c, U, W, Y, block_size=BLOCK)
    np.testing.assert_allclose(Z2, Z, rtol=1e-11, atol=1e-13)
    np.testing.assert_allclose(F2, F, rtol=1e-11, atol=1e-13)


def test_pallas_backend_vmap_fallback():
    """backend='pallas' must stay correct under vmap (falls back to the
    vmapped scan tier via custom_vmap)."""
    from celerite2_tpu import ops

    t, c, a, U, V, Y = get_matrices(size=40)
    t, c, a, U, V = map(jnp.asarray, (t, c, a, U, V))
    set_config(backend="pallas", pallas_threshold=1)
    try:
        batch_a = jnp.stack([a, 1.1 * a, 0.9 * a])

        def logdet(aa):
            d, W = ops.factor(t, c, aa, U, V)
            return jnp.sum(jnp.log(d))

        out = jax.vmap(logdet)(batch_a)
        set_config(backend="scan")
        ref = jax.vmap(logdet)(batch_a)
        np.testing.assert_allclose(out, ref, rtol=1e-10)
    finally:
        set_config(backend="auto")


def test_pallas_grad_path():
    """End-to-end custom_vjp through the pallas dispatch."""
    from celerite2_tpu import ops

    t, c, a, U, V, Y = get_matrices(size=50)
    t, c, a, U, V, Y = map(jnp.asarray, (t, c, a, U, V, Y))

    def loss(backend):
        set_config(backend=backend)

        def f(t, c, a, U, V):
            d, W = ops.factor(t, c, a, U, V)
            Z = ops.solve_lower(t, c, U, W, Y)
            Zu = ops.solve_upper(t, c, U, W, Z)
            m = ops.matmul_lower(t, c, U, V, Zu)
            mu = ops.matmul_upper(t, c, U, V, Zu)
            return (
                jnp.sum(jnp.log(d))
                + jnp.sum(Z**2)
                + jnp.sum(m * mu)
            )

        return jax.grad(f, argnums=(0, 1, 2, 3, 4))(t, c, a, U, V)

    try:
        set_config(pallas_threshold=1)
        g_pal = loss("pallas")
        g_ref = loss("scan")
        for gp, gr, name in zip(
            g_pal, g_ref, ["bt", "bc", "ba", "bU", "bV"]
        ):
            np.testing.assert_allclose(
                gp, gr, rtol=1e-8, atol=1e-10, err_msg=name
            )
    finally:
        set_config(backend="auto", pallas_threshold=512)
