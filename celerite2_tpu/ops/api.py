"""Public differentiable ops.

Each op is a ``jax.custom_vjp`` whose backward pass is the hand-derived
O(N J^2) adjoint recursion (math of /root/reference/c++/include/celerite2/
reverse.hpp), so reverse-mode autodiff never differentiates *through* the
scans (which would cost extra memory and FLOPs).  This replaces the
reference's dummy-JVP + transpose-to-custom-primitive pattern
(python/celerite2/jax/ops.py:115-151) — in a JAX-native framework the ops
are plain functions with custom VJPs; no XLA custom-call layer exists.

Gradients w.r.t. the input times ``t`` are included (the easy-to-forget
``bt`` terms, reference internal.hpp:236-240, reverse.hpp:70-74).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from celerite2_tpu.ops import scan as _scan
from celerite2_tpu.ops import dispatch as _dispatch
from celerite2_tpu.ops.spec import validate_call

__all__ = [
    "factor",
    "solve_lower",
    "solve_upper",
    "matmul_lower",
    "matmul_upper",
    "general_matmul_lower",
    "general_matmul_upper",
    "to_dense",
]


# ============================================================== factor


@jax.custom_vjp
def factor(t, c, a, U, V):
    """LDL^T factorization: returns ``(d, W)``.

    ``K = L diag(d) L^T`` with ``L = I + tril_strict(U W^T (x) transport)``.
    A non-positive entry of ``d`` means the matrix is not positive
    definite (reference forward.hpp:128 returns the failing row; traced
    code checks ``jnp.all(d > 0)`` instead).
    """
    d, W, _ = _dispatch.factor_impl(t, c, a, U, V)
    return d, W


def _factor_fwd(t, c, a, U, V):
    d, W, S = _dispatch.factor_impl(t, c, a, U, V)
    return (d, W), (t, c, a, U, V, d, W, S)


def _factor_bwd(res, grads):
    t, c, a, U, V, d, W, S = res
    bd, bW = grads
    bt, bc, ba, bU, bV = _dispatch.factor_rev_impl(
        t, c, a, U, V, d, W, S, bd, bW
    )
    return bt, bc, ba, bU, bV


factor.defvjp(_factor_fwd, _factor_bwd)


# =============================================================== solves


@jax.custom_vjp
def solve_lower(t, c, U, W, Y):
    """Z = L^{-1} Y (unit lower-triangular semiseparable solve)."""
    Z, _ = _dispatch.solve_lower_impl(t, c, U, W, Y)
    return Z


def _solve_lower_fwd(t, c, U, W, Y):
    Z, F = _dispatch.solve_lower_impl(t, c, U, W, Y)
    return Z, (t, c, U, W, Y, Z, F)


def _solve_lower_bwd(res, bZ):
    t, c, U, W, Y, Z, F = res
    bt, bc, bU, bW, bY = _dispatch.sweep_rev_impl(
        t, c, U, W, Y, Z, F, bZ, is_solve=True, upper=False
    )
    return bt, bc, bU, bW, bY


solve_lower.defvjp(_solve_lower_fwd, _solve_lower_bwd)


@jax.custom_vjp
def solve_upper(t, c, U, W, Y):
    """Z = L^{-T} Y."""
    Z, _ = _dispatch.solve_upper_impl(t, c, U, W, Y)
    return Z


def _solve_upper_fwd(t, c, U, W, Y):
    Z, F = _dispatch.solve_upper_impl(t, c, U, W, Y)
    return Z, (t, c, U, W, Y, Z, F)


def _solve_upper_bwd(res, bZ):
    t, c, U, W, Y, Z, F = res
    # forward used A=W (projection), B=U (carry); adjoint mirrors that.
    bt, bc, bW, bU, bY = _dispatch.sweep_rev_impl(
        t, c, W, U, Y, Z, F, bZ, is_solve=True, upper=True
    )
    return bt, bc, bU, bW, bY


solve_upper.defvjp(_solve_upper_fwd, _solve_upper_bwd)


# ============================================================== matmuls


@jax.custom_vjp
def matmul_lower(t, c, U, V, Y):
    """Z = tril_strict(U V^T (x) transport) @ Y."""
    Z, _ = _dispatch.matmul_lower_impl(t, c, U, V, Y)
    return Z


def _matmul_lower_fwd(t, c, U, V, Y):
    Z, F = _dispatch.matmul_lower_impl(t, c, U, V, Y)
    return Z, (t, c, U, V, Y, Z, F)


def _matmul_lower_bwd(res, bZ):
    t, c, U, V, Y, Z, F = res
    bt, bc, bU, bV, bY = _dispatch.sweep_rev_impl(
        t, c, U, V, Y, Z, F, bZ, is_solve=False, upper=False
    )
    return bt, bc, bU, bV, bY


matmul_lower.defvjp(_matmul_lower_fwd, _matmul_lower_bwd)


@jax.custom_vjp
def matmul_upper(t, c, U, V, Y):
    """Z = triu_strict(V U^T (x) transport) @ Y."""
    Z, _ = _dispatch.matmul_upper_impl(t, c, U, V, Y)
    return Z


def _matmul_upper_fwd(t, c, U, V, Y):
    Z, F = _dispatch.matmul_upper_impl(t, c, U, V, Y)
    return Z, (t, c, U, V, Y, Z, F)


def _matmul_upper_bwd(res, bZ):
    t, c, U, V, Y, Z, F = res
    bt, bc, bV, bU, bY = _dispatch.sweep_rev_impl(
        t, c, V, U, Y, Z, F, bZ, is_solve=False, upper=True
    )
    return bt, bc, bU, bV, bY


matmul_upper.defvjp(_matmul_upper_fwd, _matmul_upper_bwd)


# ===================================================== general matmuls
#
# Rectangular cross-covariance products (prediction at new points);
# forward-only like the reference (definitions.json:264 — no adjoint).
# The reference uses a sequential two-pointer merge over sorted t1/t2
# (forward.hpp:285-392); TPU-natively the merge is a vectorized
# searchsorted + gather against the scanned carry.


def general_matmul_lower(t1, t2, c, U, V, Y):
    """Z[n] = sum_{m: t2[m] <= t1[n]} U[n] . diag(e^{-c (t1[n]-t2[m])}) V[m] Y[m].

    ``t1 (N,)`` target points, ``t2 (M,)`` source points (both sorted),
    ``U (N, J)``, ``V (M, J)``, ``Y (M, K)`` -> ``Z (N, K)``.
    """
    validate_call("general_matmul_lower", t1, t2, c, U, V, Y)
    # F[m] = sum_{l <= m} diag(e^{-c (t2[m]-t2[l])}) V[l]^T Y[l], via the
    # inclusive transported cumulative (a diagonal affine scan).
    phi = _scan.transport(t2, c)
    G = V[:, :, None] * Y[:, None, :]  # (M, J, K)

    def step(F, inp):
        p, g = inp
        F = p[:, None] * F + g
        return F, F

    J, K = c.shape[0], Y.shape[1]
    _, F = jax.lax.scan(
        step, jnp.zeros((J, K), dtype=Y.dtype), (phi, G)
    )

    # index of the last source point with t2[m] <= t1[n]
    idx = jnp.searchsorted(t2, t1, side="right") - 1
    has_src = idx >= 0
    idx_c = jnp.clip(idx, 0, t2.shape[0] - 1)
    decay = jnp.exp(-c[None, :] * (t1 - t2[idx_c])[:, None])  # (N, J)
    Fg = F[idx_c]  # (N, J, K)
    Z = jnp.einsum("nj,njk->nk", U * decay, Fg)
    return jnp.where(has_src[:, None], Z, jnp.zeros_like(Z))


def general_matmul_upper(t1, t2, c, U, V, Y):
    """Z[n] = sum_{m: t2[m] > t1[n]} U[n] . diag(e^{-c (t2[m]-t1[n])}) V[m] Y[m]."""
    validate_call("general_matmul_upper", t1, t2, c, U, V, Y)
    # reverse-time cumulative: F[m] = sum_{l >= m} transported V^T Y
    phi_up = _scan.transport_up(t2, c)
    G = V[:, :, None] * Y[:, None, :]

    def step(F, inp):
        p, g = inp
        F = p[:, None] * F + g
        return F, F

    J, K = c.shape[0], Y.shape[1]
    _, F = jax.lax.scan(
        step,
        jnp.zeros((J, K), dtype=Y.dtype),
        (phi_up, G),
        reverse=True,
    )

    # first source point with t2[m] > t1[n]
    idx = jnp.searchsorted(t2, t1, side="right")
    has_src = idx < t2.shape[0]
    idx_c = jnp.clip(idx, 0, t2.shape[0] - 1)
    decay = jnp.exp(-c[None, :] * (t2[idx_c] - t1)[:, None])
    Fg = F[idx_c]
    Z = jnp.einsum("nj,njk->nk", U * decay, Fg)
    return jnp.where(has_src[:, None], Z, jnp.zeros_like(Z))


# ============================================================= to_dense


def to_dense(t, c, a, U, V):
    """Materialize the dense celerite matrix (O(N^2 J); oracle only —
    reference forward.hpp:19-42)."""
    validate_call("to_dense", t, c, a, U, V)
    tau = t[:, None] - t[None, :]
    decay = jnp.exp(-c[None, None, :] * jnp.abs(tau)[:, :, None])
    K = jnp.einsum("nj,mj,nmj->nm", U, V, decay)
    lower = jnp.tril(K, k=-1)
    return lower + lower.T + jnp.diag(a)
