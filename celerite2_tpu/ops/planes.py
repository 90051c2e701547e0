"""Entry-planes algebra for the prefix engines.

The generic two-level engine stores monoid elements as ``(N, J, J)``
arrays; on TPU the trailing ``(J, J)`` dims land on the (8, 128)
vector-register tile, so every combine op wastes ``1 - J*J/1024`` of
the VPU and each ``lax.scan`` step pays ~2.5 us of while-loop overhead
on dozens of padded micro-ops (measured; CLAUDE.md perf ledger).

This module flips the layout: every matrix ENTRY becomes its own
"plane" whose array shape is the *batch* axis (blocks of the two-level
scheme).  A J x J matrix is a J-list of J-lists of planes; all algebra
(matmul, inverse, transpose, ...) is unrolled in Python over entries,
so each primitive is a full-tile elementwise op with **zero cross-lane
or cross-sublane data movement** — the exact layout contract the
Mosaic VPU wants, usable both inside Pallas kernels and in plain XLA
(where the batch axis rides the trailing dims and tiles perfectly).

The combine formulas mirror ``ops/assoc.py`` exactly (same clamping,
same push-through-identity inverse sharing); parity is enforced by
``tests/test_planes.py``.  Role of the reference's sequential Cholesky
hot loops (celerite2 ``c++/include/celerite2/internal.hpp:55-160``),
re-laid-out for the TPU register file.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "PlanesSpec",
    "mat_affine_spec",
    "diag_affine_spec",
    "riccati_spec",
    "kalman_spec",
]


# ------------------------------------------------------ plane algebra
#
# A "matrix" is a tuple of row-tuples of planes; a "vector"/"diag" is a
# tuple of planes.  Planes are jnp arrays of identical shape (the batch
# axis), or Python scalars (identity constants — jnp broadcasting
# folds them for free).


def p_mm(A, B):
    """Matrix product of plane matrices: (n x m) @ (m x k)."""
    n, m, k = len(A), len(B), len(B[0])
    assert len(A[0]) == m
    out = []
    for i in range(n):
        row = []
        for j in range(k):
            s = A[i][0] * B[0][j]
            for l in range(1, m):
                s = s + A[i][l] * B[l][j]
            row.append(s)
        out.append(tuple(row))
    return tuple(out)


def p_mv(A, x):
    """(n x m) plane matrix times length-m plane vector."""
    out = []
    for i in range(len(A)):
        s = A[i][0] * x[0]
        for l in range(1, len(x)):
            s = s + A[i][l] * x[l]
        out.append(s)
    return tuple(out)


def p_madd(A, B):
    return tuple(
        tuple(a + b for a, b in zip(ra, rb)) for ra, rb in zip(A, B)
    )


def p_msub(A, B):
    return tuple(
        tuple(a - b for a, b in zip(ra, rb)) for ra, rb in zip(A, B)
    )


def p_mscale(s, A):
    return tuple(tuple(s * a for a in ra) for ra in A)


def p_mT(A):
    n, m = len(A), len(A[0])
    return tuple(tuple(A[i][j] for i in range(n)) for j in range(m))


def p_sym(A):
    """0.5 (A + A^T) — drift symmetrization, as in _riccati_combine."""
    n = len(A)
    return tuple(
        tuple(0.5 * (A[i][j] + A[j][i]) for j in range(n))
        for i in range(n)
    )


def p_eye(n, like):
    """Identity plane matrix; diagonal = ones_like(like)."""
    one = jnp.ones_like(like)
    zero = jnp.zeros_like(like)
    return tuple(
        tuple(one if i == j else zero for j in range(n))
        for i in range(n)
    )


def p_meye_add(A):
    """I + A without materializing I (adds 1.0 on the diagonal)."""
    n = len(A)
    return tuple(
        tuple(A[i][j] + 1.0 if i == j else A[i][j] for j in range(n))
        for i in range(n)
    )


def _det2_clamped(a, b, c, d, dtype):
    """Scale-aware determinant floor (mirror of assoc._small_inv)."""
    det = a * d - b * c
    fin = jnp.finfo(dtype)
    floor = fin.eps * (jnp.abs(a * d) + jnp.abs(b * c)) + fin.tiny
    return jnp.where(
        jnp.abs(det) >= floor,
        det,
        jnp.where(det < 0, -floor, floor),
    )


def p_inv(M, dtype):
    """Closed-form inverse of a plane matrix (mirror of
    ``assoc._small_inv``: 1x1, clamped 2x2, even sizes via 2x2-block
    Schur recursion, odd sizes bordered with an identity row/col)."""
    J = len(M)
    if J == 1:
        return ((1.0 / M[0][0],),)
    if J == 2:
        a, b = M[0]
        c, d = M[1]
        det = _det2_clamped(
            jnp.asarray(a, dtype), b, c, d, dtype
        )
        r = 1.0 / det
        return ((d * r, -b * r), (-c * r, a * r))
    if J % 2:
        # border to even size with an identity block (exact)
        zero = jnp.zeros_like(M[0][0]) if hasattr(M[0][0], "shape") else 0.0
        one = zero + 1.0
        Mp = tuple(tuple(M[i]) + (zero,) for i in range(J)) + (
            tuple(zero for _ in range(J)) + (one,),
        )
        inv = p_inv(Mp, dtype)
        return tuple(tuple(inv[i][:J]) for i in range(J))
    h = J // 2
    A = tuple(tuple(M[i][:h]) for i in range(h))
    B = tuple(tuple(M[i][h:]) for i in range(h))
    C = tuple(tuple(M[i][:h]) for i in range(h, J))
    D = tuple(tuple(M[i][h:]) for i in range(h, J))
    Ai = p_inv(A, dtype)
    AiB = p_mm(Ai, B)
    Si = p_inv(p_msub(D, p_mm(C, AiB)), dtype)
    CAi = p_mm(C, Ai)
    AiBSi = p_mm(AiB, Si)
    TL = p_madd(Ai, p_mm(AiBSi, CAi))
    TR = p_mscale(-1.0, AiBSi)
    BL = p_mscale(-1.0, p_mm(Si, CAi))
    top = tuple(TL[i] + TR[i] for i in range(h))
    bot = tuple(BL[i] + Si[i] for i in range(h))
    return top + bot


# --------------------------------------------------- pack / unpack


def mat_to_planes(arr, n, m):
    """(..., n, m) array -> plane matrix (leading dims stay on planes)."""
    return tuple(
        tuple(arr[..., i, j] for j in range(m)) for i in range(n)
    )


def planes_to_mat(P):
    """Plane matrix -> (..., n, m) array."""
    return jnp.stack(
        [jnp.stack(list(row), axis=-1) for row in P], axis=-2
    )


# ----------------------------------------------------- element specs
#
# A PlanesSpec adapts one monoid-element family to the planes engine:
#   to_planes / from_planes: array-pytree <-> planes-pytree (leaves of
#     the planes pytree are single planes; the engine flattens them)
#   combine(e1, e2): e1 earlier, e2 later — same convention as
#     ops/assoc.py
#   distribute: optional reduced combine for the distribute phase (the
#     engine falls back to ``combine``)
#   identity_scalars: flat list (tree_leaves order) of the identity
#     element's per-plane constant (0.0 or 1.0) — used for padding and
#     the exclusive shift.


class PlanesSpec:
    def __init__(self, to_planes, from_planes, combine,
                 identity_scalars, distribute=None):
        self.to_planes = to_planes
        self.from_planes = from_planes
        self.combine = combine
        self.distribute = distribute or combine
        self.identity_scalars = identity_scalars


def mat_affine_spec(D, K, dtype, *, full=False):
    """(A (N,D,D), b (N,D,K)) affine maps x -> A x + b
    (mirror of assoc._mat_affine_combine).  ``full=True`` keeps every
    leaf valid in the distribute phase."""

    def to_planes(elems):
        A, b = elems
        return (mat_to_planes(A, D, D), mat_to_planes(b, D, K))

    def from_planes(pl):
        A, b = pl
        return (planes_to_mat(A), planes_to_mat(b))

    def combine(e1, e2):
        A1, b1 = e1
        A2, b2 = e2
        return (p_mm(A2, A1), p_madd(p_mm(A2, b1), b2))

    def distribute(e1, e2):
        # only b is valid downstream (assoc._affine_distribute_b)
        A1, b1 = e1
        A2, b2 = e2
        return (A2, p_madd(p_mm(A2, b1), b2))

    ident = [1.0 if i == j else 0.0 for i in range(D) for j in range(D)]
    ident += [0.0] * (D * K)
    return PlanesSpec(
        to_planes, from_planes, combine, ident,
        combine if full else distribute,
    )


def diag_affine_spec(shape_tail, dtype, *, full=False):
    """(alpha, beta) elementwise affine f -> alpha * f + beta with
    trailing component dims ``shape_tail`` (e.g. (J, K)); mirror of
    assoc._diag_affine combine.  ``full=True`` keeps EVERY leaf valid
    in the distribute phase (for callers that consume the maps
    themselves, e.g. the sharded three-phase ops)."""
    import numpy as np

    idx = list(np.ndindex(*shape_tail)) if shape_tail else [()]

    def to_planes(elems):
        alpha, beta = elems
        return (
            tuple(alpha[(...,) + i] for i in idx),
            tuple(beta[(...,) + i] for i in idx),
        )

    def from_planes(pl):
        import numpy as np

        alpha, beta = pl

        def back(planes):
            flat = jnp.stack(list(planes), axis=-1)
            return flat.reshape(flat.shape[:-1] + tuple(shape_tail))

        return (back(alpha), back(beta))

    def combine(e1, e2):
        a1, b1 = e1
        a2, b2 = e2
        return (
            tuple(x2 * x1 for x1, x2 in zip(a1, a2)),
            tuple(x2 * y1 + y2 for x2, y1, y2 in zip(a2, b1, b2)),
        )

    def distribute(e1, e2):
        a1, b1 = e1
        a2, b2 = e2
        return (
            a2,
            tuple(x2 * y1 + y2 for x2, y1, y2 in zip(a2, b1, b2)),
        )

    n = len(idx)
    return PlanesSpec(
        to_planes, from_planes, combine,
        [1.0] * n + [0.0] * n, combine if full else distribute,
    )


def riccati_spec(J, dtype, *, full=False):
    """(A, Q, R) Riccati elements (mirror of assoc._riccati_combine,
    incl. the shared push-through inverse and drift symmetrization).
    ``full=True`` keeps every leaf valid in the distribute phase."""

    def to_planes(elems):
        A, Q, R = elems
        return tuple(mat_to_planes(x, J, J) for x in (A, Q, R))

    def from_planes(pl):
        return tuple(planes_to_mat(x) for x in pl)

    def combine(e1, e2):
        A1, Q1, R1 = e1
        A2, Q2, R2 = e2
        G = p_inv(p_meye_add(p_mm(Q1, R2)), dtype)
        GA1 = p_mm(G, A1)
        GQ1 = p_mm(G, Q1)
        R2G = p_mm(R2, G)
        A12 = p_mm(A2, GA1)
        Q12 = p_madd(Q2, p_mm(p_mm(A2, GQ1), p_mT(A2)))
        R12 = p_madd(R1, p_mm(p_mm(p_mT(A1), R2G), A1))
        return (A12, p_sym(Q12), p_sym(R12))

    def distribute(e1, e2):
        # only Q valid downstream (assoc._riccati_distribute_Q)
        A1, Q1, R1 = e1
        A2, Q2, R2 = e2
        GQ1 = p_mm(p_inv(p_meye_add(p_mm(Q1, R2)), dtype), Q1)
        Q12 = p_madd(Q2, p_mm(p_mm(A2, GQ1), p_mT(A2)))
        return (A2, p_sym(Q12), R2)

    eyeJ = [1.0 if i == j else 0.0 for i in range(J) for j in range(J)]
    zJ = [0.0] * (J * J)
    return PlanesSpec(
        to_planes, from_planes, combine, eyeJ + zJ + zJ,
        combine if full else distribute,
    )


def kalman_spec(J, K, dtype):
    """(A, Q, R, b, eta) fused factor+solve elements (mirror of
    assoc._kalman_combine)."""

    def to_planes(elems):
        A, Q, R, b, eta = elems
        return (
            mat_to_planes(A, J, J),
            mat_to_planes(Q, J, J),
            mat_to_planes(R, J, J),
            mat_to_planes(b, J, K),
            mat_to_planes(eta, J, K),
        )

    def from_planes(pl):
        return tuple(planes_to_mat(x) for x in pl)

    def combine(e1, e2):
        A1, Q1, R1, b1, eta1 = e1
        A2, Q2, R2, b2, eta2 = e2
        G = p_inv(p_meye_add(p_mm(Q1, R2)), dtype)
        GA1 = p_mm(G, A1)
        GQ1 = p_mm(G, Q1)
        Gb = p_mm(G, p_madd(b1, p_mm(Q1, eta2)))
        R2G = p_mm(R2, G)
        vE = p_msub(eta2, p_mm(R2, b1))
        Eeta = p_msub(vE, p_mm(R2G, p_mm(Q1, vE)))
        A12 = p_mm(A2, GA1)
        Q12 = p_madd(Q2, p_mm(p_mm(A2, GQ1), p_mT(A2)))
        R12 = p_madd(R1, p_mm(p_mm(p_mT(A1), R2G), A1))
        b12 = p_madd(b2, p_mm(A2, Gb))
        eta12 = p_madd(eta1, p_mm(p_mT(A1), Eeta))
        return (A12, p_sym(Q12), p_sym(R12), b12, eta12)

    def distribute(e1, e2):
        # only Q (covariance state) and b (mean state) valid downstream
        A1, Q1, R1, b1, eta1 = e1
        A2, Q2, R2, b2, eta2 = e2
        G = p_inv(p_meye_add(p_mm(Q1, R2)), dtype)
        GQ1 = p_mm(G, Q1)
        Gb = p_mm(G, p_madd(b1, p_mm(Q1, eta2)))
        Q12 = p_madd(Q2, p_mm(p_mm(A2, GQ1), p_mT(A2)))
        b12 = p_madd(b2, p_mm(A2, Gb))
        return (A2, p_sym(Q12), R2, b12, eta2)

    eyeJ = [1.0 if i == j else 0.0 for i in range(J) for j in range(J)]
    zJJ = [0.0] * (J * J)
    zJK = [0.0] * (J * K)
    return PlanesSpec(
        to_planes, from_planes, combine,
        eyeJ + zJJ + zJJ + zJK + zJK, distribute,
    )
