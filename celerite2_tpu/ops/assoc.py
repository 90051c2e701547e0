"""Tier-2 op implementations: log-depth associative scans.

The reference's recursions are strictly sequential over N
(forward.hpp:111, internal.hpp:138,181).  On TPU, sequential depth is the
enemy for single large-N evaluations, so every op is reformulated as a
``jax.lax.associative_scan``:

* **matmuls** — the carry update ``F_n = diag(phi_n) (F_{n-1} + g_{n-1})``
  is a *diagonal* affine recurrence: elements ``(alpha, beta)`` combine
  elementwise.  O(N J K) work, log-depth.

* **solves** — substituting the output feedback turns the carry into a
  dense affine recurrence ``F_n = A_n F_{n-1} + b_n`` with
  ``A_n = diag(phi_n)(I - w_{n-1} u_{n-1}^T)`` (J x J).  Elements combine
  by matrix multiplication: O(N J^3) work, log-depth.

* **factor** — the Cholesky carry
  ``S_n = diag(phi_n)(S_{n-1} + (v - S u)(v - S u)^T / (a - u^T S u))diag(phi_n)``
  is a *Riccati flow*.  Verified identity (rank-one matrix-inversion
  lemma; cf. temporal-parallelization-of-Kalman-smoothers literature):

      S_plus = Q + A S (I + R S)^{-1} A^T
      A = diag(phi)(I - v u^T / a),  Q = diag(phi) v v^T/a diag(phi),
      R = -u u^T / a

  Riccati maps compose associatively (they are Moebius actions of 2J x 2J
  matrices on symmetric J x J matrices), with the combination

      Gamma = (I + Q1 R2)^{-1}
      A12 = A2 Gamma A1
      Q12 = Q2 + A2 Gamma Q1 A2^T
      R12 = R1 + A1^T R2 Gamma A1        (R2 Gamma == (I + R2 Q1)^{-1} R2)

  so the LDL^T factorization itself runs in log-depth — this framework's
  replacement for the reference's "THE hot loop" (forward.hpp:111-132).

All functions return exactly the same (value, cache) pairs as the tier-1
scans in :mod:`celerite2_tpu.ops.scan`, and are cross-validated against
them in the test suite.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from celerite2_tpu.ops.scan import _safe, transport, transport_up

__all__ = [
    "factor_assoc",
    "solve_lower_assoc",
    "solve_upper_assoc",
    "matmul_lower_assoc",
    "matmul_upper_assoc",
]


# ===================================================== diagonal affine


def _diag_affine_scan(alpha, beta, *, reverse=False):
    """Prefix (or suffix) solutions of f_n = alpha_n * f_{prev} + beta_n.

    ``fn(a, b)`` in ``associative_scan`` always composes "a applied first,
    b applied after" — with ``reverse=True`` jax flips the operands and
    runs the same forward scan, so the combine is identical.
    """

    def combine(e1, e2):
        a1, b1 = e1
        a2, b2 = e2
        return a2 * a1, a2 * b1 + b2

    _, f = lax.associative_scan(combine, (alpha, beta), reverse=reverse)
    return f


def matmul_lower_assoc(t, c, U, V, Y):
    phi = transport(t, c)  # (N, J); row 0 = 0
    G = V[:, :, None] * Y[:, None, :]  # (N, J, K)
    # F_n = phi_n * (F_{n-1} + G_{n-1}) ->
    #   alpha_n = phi_n, beta_n = phi_n * G_{n-1}
    G_prev = jnp.concatenate([jnp.zeros_like(G[:1]), G[:-1]], axis=0)
    alpha = phi[:, :, None]
    beta = alpha * G_prev
    F_post = _diag_affine_scan(
        jnp.broadcast_to(alpha, G.shape), beta
    )
    Z = jnp.einsum("nj,njk->nk", U, F_post)
    # pre-transport cache (reference workspace convention)
    F_pre = (
        jnp.concatenate([jnp.zeros_like(F_post[:1]), F_post[:-1]], axis=0)
        + G_prev
    )
    return Z, F_pre


def matmul_upper_assoc(t, c, U, V, Y):
    phi = transport_up(t, c)  # (N, J); row N-1 = 0
    G = U[:, :, None] * Y[:, None, :]
    G_next = jnp.concatenate([G[1:], jnp.zeros_like(G[:1])], axis=0)
    alpha = phi[:, :, None]
    beta = alpha * G_next
    F_post = _diag_affine_scan(
        jnp.broadcast_to(alpha, G.shape), beta, reverse=True
    )
    Z = jnp.einsum("nj,njk->nk", V, F_post)
    F_pre = (
        jnp.concatenate([F_post[1:], jnp.zeros_like(F_post[:1])], axis=0)
        + G_next
    )
    return Z, F_pre


# ======================================================= dense affine


def _mat_affine_combine(e1, e2):
    """(A, b) composition for F' = A2 (A1 F + b1) + b2 (e1 earlier)."""
    A1, b1 = e1
    A2, b2 = e2
    return A2 @ A1, A2 @ b1 + b2


def solve_lower_assoc(t, c, U, W, Y):
    N, J = U.shape
    phi = transport(t, c)
    I = jnp.eye(J, dtype=U.dtype)
    # elements for n >= 1; element 0 annihilates (F_0 = 0)
    A_body = phi[1:, :, None] * (
        I[None] - jnp.einsum("nj,nk->njk", W[:-1], U[:-1])
    )
    A = jnp.concatenate([jnp.zeros((1, J, J), U.dtype), A_body], axis=0)
    b_body = phi[1:, :, None] * jnp.einsum(
        "nj,nk->njk", W[:-1], Y[:-1]
    )
    b = jnp.concatenate(
        [jnp.zeros((1, J, Y.shape[1]), Y.dtype), b_body], axis=0
    )
    A_pref, b_pref = lax.associative_scan(_mat_affine_combine, (A, b))
    F_post = b_pref  # applied to F_init = 0
    Z = Y - jnp.einsum("nj,njk->nk", U, F_post)
    F_prev = jnp.concatenate(
        [jnp.zeros_like(F_post[:1]), F_post[:-1]], axis=0
    )
    Z_prev = jnp.concatenate([jnp.zeros_like(Z[:1]), Z[:-1]], axis=0)
    W_prev = jnp.concatenate([jnp.zeros_like(W[:1]), W[:-1]], axis=0)
    F_pre = F_prev + jnp.einsum("nj,nk->njk", W_prev, Z_prev)
    return Z, F_pre


def solve_upper_assoc(t, c, U, W, Y):
    N, J = U.shape
    phi = transport_up(t, c)
    I = jnp.eye(J, dtype=U.dtype)
    # F_n = diag(phi_n)(I - u_{n+1} w_{n+1}^T) F_{n+1}
    #       + diag(phi_n) u_{n+1} y_{n+1}^T
    A_body = phi[:-1, :, None] * (
        I[None] - jnp.einsum("nj,nk->njk", U[1:], W[1:])
    )
    A = jnp.concatenate([A_body, jnp.zeros((1, J, J), U.dtype)], axis=0)
    b_body = phi[:-1, :, None] * jnp.einsum("nj,nk->njk", U[1:], Y[1:])
    b = jnp.concatenate(
        [b_body, jnp.zeros((1, J, Y.shape[1]), Y.dtype)], axis=0
    )

    A_pref, b_pref = lax.associative_scan(
        _mat_affine_combine, (A, b), reverse=True
    )
    F_post = b_pref
    Z = Y - jnp.einsum("nj,njk->nk", W, F_post)
    F_next = jnp.concatenate(
        [F_post[1:], jnp.zeros_like(F_post[:1])], axis=0
    )
    Z_next = jnp.concatenate([Z[1:], jnp.zeros_like(Z[:1])], axis=0)
    U_next = jnp.concatenate([U[1:], jnp.zeros_like(U[:1])], axis=0)
    F_pre = F_next + jnp.einsum("nj,nk->njk", U_next, Z_next)
    return Z, F_pre


# ============================================================= factor


def _mT(x):
    return jnp.swapaxes(x, -1, -2)


def _small_solve(M, B):
    """Batched J x J linear solve via Gauss-Jordan with partial pivoting.

    TPU-native: only elementwise ops, selects and tiny matmuls — works in
    f64 on TPU (XLA's LuDecomposition custom call is f32-only there) and
    fuses well.  J is static and small (<= 32), so the Python loop
    unrolls at trace time.
    """
    J = M.shape[-1]
    A = jnp.concatenate([M, B], axis=-1)  # (..., J, J+Kb)
    rows = jnp.arange(J)

    for k in range(J):
        # partial pivot: swap row k with argmax |A[:, k]| among rows >= k
        col = jnp.abs(A[..., :, k])
        piv = jnp.argmax(jnp.where(rows >= k, col, -jnp.inf), axis=-1)
        onehot_p = rows == piv[..., None]  # (..., J)
        onehot_k = rows == k  # (J,)
        row_p = jnp.sum(jnp.where(onehot_p[..., None], A, 0.0), axis=-2)
        row_k = A[..., k, :]
        A = jnp.where(onehot_k[:, None], row_p[..., None, :], A)
        A = jnp.where(onehot_p[..., None], row_k[..., None, :], A)
        # normalize pivot row, then eliminate it from all other rows
        pivval = A[..., k, k][..., None, None]
        A = jnp.where(onehot_k[:, None], A / pivval, A)
        factors = A[..., :, k][..., None]
        elim = jnp.where(onehot_k[:, None], 0.0, factors)
        A = A - elim * A[..., k:k + 1, :]
    return A[..., J:]


def _riccati_combine(e1, e2):
    """Compose Riccati elements (e1 earlier, e2 later)."""
    A1, Q1, R1 = e1
    A2, Q2, R2 = e2
    J = A1.shape[-1]
    I = jnp.eye(J, dtype=A1.dtype)
    # Gamma = (I + Q1 R2)^{-1}; R2 Gamma = (I + R2 Q1)^{-1} R2
    GAQ = _small_solve(I + Q1 @ R2, jnp.concatenate([A1, Q1], axis=-1))
    GA1 = GAQ[..., :J]
    GQ1 = GAQ[..., J:]
    R2G = _small_solve(I + R2 @ Q1, R2)
    A12 = A2 @ GA1
    Q12 = Q2 + A2 @ GQ1 @ _mT(A2)
    R12 = R1 + _mT(A1) @ R2G @ A1
    # symmetrize to fight drift over long products
    Q12 = 0.5 * (Q12 + _mT(Q12))
    R12 = 0.5 * (R12 + _mT(R12))
    return A12, Q12, R12


def factor_assoc(t, c, a, U, V):
    """Associative-scan LDL^T.  Returns ``(d, W, S_half)`` identical to
    :func:`celerite2_tpu.ops.scan.factor_scan`."""
    N, J = U.shape
    phi = transport(t, c)
    I = jnp.eye(J, dtype=U.dtype)

    ar = _safe(a)
    # elements n >= 1 built from row n-1 and phi_n
    u, v = U[:-1], V[:-1]
    al = ar[:-1, None, None]
    p = phi[1:]
    A_body = p[:, :, None] * (
        I[None] - jnp.einsum("nj,nk->njk", v, u) / al
    )
    Q_body = (
        p[:, :, None]
        * (jnp.einsum("nj,nk->njk", v, v) / al)
        * p[:, None, :]
    )
    R_body = -jnp.einsum("nj,nk->njk", u, u) / al
    # element 0 = identity map
    A = jnp.concatenate([I[None], A_body], axis=0)
    Q = jnp.concatenate([jnp.zeros((1, J, J), U.dtype), Q_body], axis=0)
    R = jnp.concatenate([jnp.zeros((1, J, J), U.dtype), R_body], axis=0)

    _, S_full, _ = lax.associative_scan(_riccati_combine, (A, Q, R))
    # S applied to S_init = 0 is just the combined Q
    d = a - jnp.einsum("nj,njk,nk->n", U, S_full, U)
    W = (V - jnp.einsum("njk,nk->nj", S_full, U)) / _safe(d)[:, None]

    # one-sided cache: S_half_n = diag(phi_n)(S_full_{n-1} + d W W^T)
    S_prev = jnp.concatenate(
        [jnp.zeros_like(S_full[:1]), S_full[:-1]], axis=0
    )
    d_prev = jnp.concatenate([jnp.zeros_like(d[:1]), d[:-1]])
    W_prev = jnp.concatenate([jnp.zeros_like(W[:1]), W[:-1]], axis=0)
    S_half = phi[:, :, None] * (
        S_prev
        + d_prev[:, None, None]
        * jnp.einsum("nj,nk->njk", W_prev, W_prev)
    )
    return d, W, S_half
