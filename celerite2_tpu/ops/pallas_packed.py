"""Tier-3b: lane-packed Pallas TPU kernels (the fast path for J <= 8).

The straightforward (J, J)-tiled kernels in :mod:`pallas_kernels` spend
~790 cycles/row — almost all of it in Mosaic *relayouts* (transposes,
sublane<->lane moves, (J,)->(1,J) reshapes), not arithmetic.  These
kernels eliminate relayouts entirely by packing every J x J carry into
the **lanes of a single sublane row**: lane ``l = j*J + k`` holds
``S[j, k]``.  All per-row operations become lane-wise multiplies/adds
plus a few ``pltpu.roll``-based butterfly reductions:

  * ``rep`` form of a J-vector:  lane l holds x[l // J]  (j-indexed)
  * ``tile`` form:               lane l holds x[l % J]   (k-indexed)
  * group sums (``sum_k S[j, k] x[k]``) via a log2(J)-step XOR butterfly
    of circular lane rolls — no sublane traffic at all.

Symmetry is load-bearing: the factorization carry ``S`` is symmetric,
so both row-sums and column-sums reduce to the same butterfly; the
non-symmetric reverse carry ``bS`` is kept in both layouts (M, M^T),
each updated analytically (the transpose of a rank-one update is a
rank-one update).

Measured on v5e at N=1e5, J=2: ~0.6 ms/sweep vs ~84 ms for the tiled
kernel — the difference between ~5 and ~790 cycles per row.

Constraints: J is zero-padded to a power of two <= 8 (J^2 <= 64 lanes);
sweeps take a single right-hand side (K = 1 — the log-likelihood path).
Wider J or K falls back to :mod:`pallas_kernels` in the dispatcher.

Cache conventions (consumed only by the matching `_rev` kernels via the
custom_vjp residuals in ops/api.py):
  * factor cache = a PAIR ``(Sh_pack, ShT_pack)`` of the one-sided
    transported carry and its transpose, each packed (N, Jp^2).
    ``Sh`` equals the scan tier's ``S_half``; its transpose is stored
    too because a lane-packed kernel cannot transpose (that is the
    relayout these kernels exist to avoid), and rebuilding ``Sh^T``
    from ``Sh`` would multiply by ``phi_k / phi_j``, which
    over/underflows across large time gaps.  The pair is cheap: two
    lane multiplies in the forward.  Under vmap (scan fallback), the
    pair is reproduced from ``S_half`` by an XLA pad + transpose.
  * sweep cache = the standard pre-transport ``F_acc`` rows (N, J, 1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "MAX_PACKED_J",
    "packable",
    "factor_packed",
    "solve_lower_packed",
    "solve_upper_packed",
    "matmul_lower_packed",
    "matmul_upper_packed",
    "factor_rev_packed",
    "sweep_rev_packed",
]

MAX_PACKED_J = 8
# VMEM: every (B, lanes<=128) stream physically occupies B*128 lanes and
# is double-buffered, i.e. ~1 KiB/row/stream; block sizes are sized so
# each kernel's streams fit the ~16 MiB scoped budget.
DEFAULT_BLOCK = 1024
REV_BLOCK = 512


def packable(j: int, k: int | None = None) -> bool:
    """Can (J [, nrhs]) use the lane-packed kernels?"""
    return j <= MAX_PACKED_J and (k is None or k == 1)


def _pow2_width(j: int) -> int:
    p = 1
    while p < j:
        p *= 2
    return p


def _interpret(interpret):
    if interpret is None:
        return jax.default_backend() != "tpu"
    return interpret


def _transport(t, c):
    dt = jnp.diff(t)
    phi = jnp.exp(-c[None, :] * dt[:, None])
    return jnp.concatenate(
        [jnp.zeros((1, c.shape[0]), dtype=phi.dtype), phi], axis=0
    )


def _rep(x, J):
    """(N, J) -> (N, J^2) with lane l = x[:, l // J] (j-indexed)."""
    return jnp.repeat(x, J, axis=1)


def _tile(x, J):
    """(N, J) -> (N, J^2) with lane l = x[:, l % J] (k-indexed)."""
    return jnp.tile(x, (1, J))


def _pad_rows(n, block):
    return (-n) % block


def _padJ(x, J, Jp, fill=0.0):
    if J == Jp:
        return x
    padder = jnp.full(x.shape[:-1] + (Jp - J,), fill, x.dtype)
    return jnp.concatenate([x, padder], axis=-1)


# ------------------------------------------------ in-kernel reductions


def _butterfly_masks(J, J2, *, axis_j: bool):
    """Per-level (shift, bit-mask) pairs for the XOR butterfly.

    Build these ONCE per kernel invocation (before the row loop): the
    iota/div/mod chain is loop-invariant, and leaving it inside the
    per-row body costs more than the butterfly itself.
    """
    masks = []
    b = 1
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, J2), 1)
    while b < J:
        s = b * J if axis_j else b
        masks.append((s, (lane // s) % 2 == 1))
        b *= 2
    return masks


def _butterfly(x, masks):
    """Group sums, replicated across each group, via XOR butterfly.

    With k-direction masks: out[l] = sum_k x[j(l)*J + k];
    with j-direction masks: out[l] = sum_j x[j*J + k(l)].
    log2(J) levels of two circular rolls + select.
    """
    J2 = x.shape[-1]
    out = x
    for s, bit in masks:
        out = out + jnp.where(
            bit,
            pltpu.roll(out, s, 1),
            pltpu.roll(out, J2 - s, 1),
        )
    return out


def _allsum_masks(width):
    """Masks for a full-width butterfly: total sum replicated on every
    lane.  NEVER reduce a carried quantity to (1, 1): the lane->scalar->
    broadcast roundtrip costs ~500 cycles of latency on the critical
    path (measured); the replicated form is pure lane arithmetic."""
    return _butterfly_masks(width, width, axis_j=False)


# ===================================================== factor (forward)


def _factor_kernel(pr_ref, pt_ref, a_ref, ur_ref, ut_ref, vr_ref, vt_ref,
                   d_ref, w_ref, sh_ref, sht_ref,
                   Sf, dprev, wr, wt, *, J):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        Sf[...] = jnp.zeros_like(Sf)
        dprev[...] = jnp.zeros_like(dprev)
        wr[...] = jnp.zeros_like(wr)
        wt[...] = jnp.zeros_like(wt)

    B = a_ref.shape[0]
    J2 = J * J
    mk = _butterfly_masks(J, J2, axis_j=False)
    mj = _butterfly_masks(J, J2, axis_j=True)
    ma = _allsum_masks(J2)

    def row(n, _):
        sl = pl.ds(n, 1)
        Pr = pr_ref[sl, :]
        Pt = pt_ref[sl, :]
        Ur = ur_ref[sl, :]
        Ut = ut_ref[sl, :]

        # dprev is carried REPLICATED (1, J2): no scalar roundtrips
        S_acc = Sf[...] + dprev[...] * (wr[...] * wt[...])
        Sh = Pr * S_acc
        sh_ref[sl, :] = Sh
        sht_ref[sl, :] = Pt * S_acc
        Sfn = Pt * Sh
        q = Sfn * Ut
        d_n = a_ref[sl, :] - _butterfly(q * Ur, ma)
        d_safe = jnp.where(d_n > 0, d_n, jnp.ones_like(d_n))
        inv_d = 1.0 / d_safe
        tmp_r = _butterfly(q, mk)
        tmp_t = _butterfly(Sfn * Ur, mj)
        w_r = (vr_ref[sl, :] - tmp_r) * inv_d
        w_t = (vt_ref[sl, :] - tmp_t) * inv_d

        d_ref[sl, :] = d_n
        w_ref[sl, :] = w_t
        Sf[...] = Sfn
        dprev[...] = d_n
        wr[...] = w_r
        wt[...] = w_t
        return 0

    jax.lax.fori_loop(0, B, row, 0)


def factor_packed(t, c, a, U, V, *, block_size=None, interpret=None):
    """LDL^T; returns (d, W, S_acc_packed (N, Jp^2))."""
    N, J = U.shape
    Jp = _pow2_width(J)
    B = block_size or DEFAULT_BLOCK
    B = min(B, max(8, N))
    pad = _pad_rows(N, B)
    dtype = U.dtype

    phi = _padJ(_transport(t, c), J, Jp, 1.0)
    U2 = _padJ(U, J, Jp)
    V2 = _padJ(V, J, Jp)

    def padcat(x, fill=0.0):
        if not pad:
            return x
        shape = (pad,) + x.shape[1:]
        return jnp.concatenate(
            [x, jnp.full(shape, fill, x.dtype)], axis=0
        )

    NP = N + pad
    J2 = Jp * Jp
    # every "scalar" stream is replicated across J2 lanes (see
    # _allsum_masks): a is broadcast here, d comes back packed
    a2 = padcat(jnp.broadcast_to(a[:, None], (N, J2)), 1.0)
    phi = padcat(phi, 1.0)
    U2 = padcat(U2)
    V2 = padcat(V2)

    grid = (NP // B,)
    rowP = pl.BlockSpec((B, J2), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)

    d, W, Sh, ShT = pl.pallas_call(
        functools.partial(_factor_kernel, J=Jp),
        grid=grid,
        in_specs=[rowP] * 7,
        out_specs=[rowP] * 4,
        out_shape=[
            jax.ShapeDtypeStruct((NP, J2), dtype),
            jax.ShapeDtypeStruct((NP, J2), dtype),
            jax.ShapeDtypeStruct((NP, J2), dtype),
            jax.ShapeDtypeStruct((NP, J2), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, J2), dtype),
            pltpu.VMEM((1, J2), dtype),
            pltpu.VMEM((1, J2), dtype),
            pltpu.VMEM((1, J2), dtype),
        ],
        interpret=_interpret(interpret),
    )(_rep(phi, Jp), _tile(phi, Jp), a2, _rep(U2, Jp), _tile(U2, Jp),
      _rep(V2, Jp), _tile(V2, Jp))
    return d[:N, 0], W[:N, :J], (Sh[:N], ShT[:N])


# ================================================ lower sweep (forward)


def _sweep_kernel(phi_ref, a_ref, bprev_ref, y_ref, yprev_ref,
                  z_ref, f_ref, F, rfeed, *, is_solve, J):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        F[...] = jnp.zeros_like(F)
        rfeed[...] = jnp.zeros_like(rfeed)

    B = y_ref.shape[0]
    sign = -1.0 if is_solve else 1.0
    ma = _allsum_masks(J)

    def row(n, _):
        sl = pl.ds(n, 1)
        # r (the scalar rhs feed) is kept REPLICATED across J lanes
        if is_solve:
            r_p = rfeed[...]
        else:
            r_p = yprev_ref[sl, :]
        F_acc = F[...] + bprev_ref[sl, :] * r_p
        f_ref[sl, :] = F_acc
        F_new = phi_ref[sl, :] * F_acc
        proj = _butterfly(F_new * a_ref[sl, :], ma)
        y_n = y_ref[sl, :]
        z_n = y_n + sign * proj if is_solve else proj
        z_ref[sl, :] = z_n
        F[...] = F_new
        if is_solve:
            rfeed[...] = z_n
        return 0

    jax.lax.fori_loop(0, B, row, 0)


def _sweep_lower(t, c, A, Bfeed, Y, *, is_solve, block_size=None,
                 interpret=None):
    N, J = A.shape
    assert Y.shape[1] == 1
    Jp = _pow2_width(J)
    B = block_size or DEFAULT_BLOCK
    B = min(B, max(8, N))
    pad = _pad_rows(N, B)
    dtype = Y.dtype

    phi = _padJ(_transport(t, c), J, Jp, 1.0)
    A2 = _padJ(A, J, Jp)
    B_prev = jnp.concatenate(
        [jnp.zeros((1, Jp), A.dtype), _padJ(Bfeed, J, Jp)[:-1]], axis=0
    )
    # the rhs streams are replicated across Jp lanes (see _allsum_masks)
    Yb = jnp.broadcast_to(Y, (N, Jp))
    Y_prev = jnp.concatenate(
        [jnp.zeros((1, Jp), dtype), Yb[:-1]], axis=0
    )

    def padcat(x, fill=0.0):
        if not pad:
            return x
        shape = (pad,) + x.shape[1:]
        return jnp.concatenate(
            [x, jnp.full(shape, fill, x.dtype)], axis=0
        )

    NP = N + pad
    grid = (NP // B,)
    rowJ = pl.BlockSpec((B, Jp), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)

    Z, F = pl.pallas_call(
        functools.partial(_sweep_kernel, is_solve=is_solve, J=Jp),
        grid=grid,
        in_specs=[rowJ] * 5,
        out_specs=[rowJ, rowJ],
        out_shape=[
            jax.ShapeDtypeStruct((NP, Jp), dtype),
            jax.ShapeDtypeStruct((NP, Jp), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, Jp), dtype),
            pltpu.VMEM((1, Jp), dtype),
        ],
        interpret=_interpret(interpret),
    )(padcat(phi, 1.0), padcat(A2), padcat(B_prev), padcat(Yb),
      padcat(Y_prev))
    # standard cache shape (N, J, K=1)
    return Z[:N, :1], F[:N, :J, None]


def solve_lower_packed(t, c, U, W, Y, **kw):
    return _sweep_lower(t, c, U, W, Y, is_solve=True, **kw)


def matmul_lower_packed(t, c, U, V, Y, **kw):
    return _sweep_lower(t, c, U, V, Y, is_solve=False, **kw)


def _flip(x):
    return None if x is None else x[::-1]


def solve_upper_packed(t, c, U, W, Y, **kw):
    Z, F = _sweep_lower(
        -t[::-1], c, _flip(W), _flip(U), _flip(Y), is_solve=True, **kw
    )
    return _flip(Z), _flip(F)


def matmul_upper_packed(t, c, U, V, Y, **kw):
    Z, F = _sweep_lower(
        -t[::-1], c, _flip(V), _flip(U), _flip(Y), is_solve=False, **kw
    )
    return _flip(Z), _flip(F)


# ===================================================== factor (reverse)


def _factor_rev_kernel(pr_ref, pt_ref, ur_ref, ut_ref, wt_ref,
                       wpr_ref, wpt_ref, sh_ref, sht_ref, bd_ref,
                       bv0r_ref, bv0t_ref, mask_ref,
                       ba_ref, bv_ref, bu_ref, bp_ref,
                       dba_ref, dbv_ref,
                       M, MT, dba, dbvr, dbvt, *, J):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        M[...] = jnp.zeros_like(M)
        MT[...] = jnp.zeros_like(MT)
        dba[...] = jnp.zeros_like(dba)
        dbvr[...] = jnp.zeros_like(dbvr)
        dbvt[...] = jnp.zeros_like(dbvt)

    B = bd_ref.shape[0]
    J2 = J * J
    invJ = 1.0 / J
    mk = _butterfly_masks(J, J2, axis_j=False)
    mj = _butterfly_masks(J, J2, axis_j=True)
    ma = _allsum_masks(J2)

    def row(k_, _):
        n = B - 1 - k_
        sl = pl.ds(n, 1)
        msk = mask_ref[sl, :]           # replicated 1.0 / 0.0

        Pr = pr_ref[sl, :]
        Pt = pt_ref[sl, :]
        Ur = ur_ref[sl, :]
        Ut = ut_ref[sl, :]
        Wt_n = wt_ref[sl, :]
        Sh = sh_ref[sl, :]
        ShT = sht_ref[sl, :]

        bv_r = bv0r_ref[sl, :] + dbvr[...]
        bv_t = bv0t_ref[sl, :] + dbvt[...]
        ba_n = (
            bd_ref[sl, :]
            + dba[...]
            - invJ * _butterfly(Wt_n * bv_t, ma)
        )

        Sf = Pt * Sh
        x_r = bv_r + 2.0 * ba_n * Ur
        bU_t = -_butterfly(Sf * x_r, mj)

        uu = Ur * Ut
        M2 = M[...] - Ur * bv_t - ba_n * uu
        M2T = MT[...] - bv_r * Ut - ba_n * uu

        # bp = diag(M2 @ Sh + Sh^T @ M2) * p  (rep form)
        bp_r = (
            _butterfly(M2 * ShT, mk)
            + _butterfly(ShT * M2T, mk)
        ) * Pr

        PrPt = Pr * Pt
        M3 = PrPt * M2
        M3T = PrPt * M2T
        Wpr = wpr_ref[sl, :]
        Wpt = wpt_ref[sl, :]
        dba_new = _butterfly(M3 * Wpr * Wpt, ma)
        Ysym = M3 + M3T
        dbvr_new = _butterfly(Ysym * Wpt, mk)
        dbvt_new = _butterfly(Ysym * Wpr, mj)

        # unconditional stores (inactive rows are cleaned outside);
        # branchless masked carries keep the critical path lane-only
        ba_ref[sl, :] = ba_n
        bv_ref[sl, :] = bv_t
        bu_ref[sl, :] = bU_t
        bp_ref[sl, :] = bp_r
        inv = 1.0 - msk
        M[...] = msk * M3 + inv * M[...]
        MT[...] = msk * M3T + inv * MT[...]
        dba[...] = msk * dba_new + inv * dba[...]
        dbvr[...] = msk * dbvr_new + inv * dbvr[...]
        dbvt[...] = msk * dbvt_new + inv * dbvt[...]
        return 0

    jax.lax.fori_loop(0, B, row, 0)
    # final carry = the step-1 deferrals (consumed by the boundary
    # row 0 outside); last grid step's write persists
    dba_ref[...] = dba[...]
    dbv_ref[...] = dbvt[...]


def factor_rev_packed(t, c, a, U, V, d, W, S_pair, bd, bW, *,
                      block_size=None, interpret=None):
    """Adjoint of factor_packed; S_pair is its (Sh, ShT) packed cache."""
    del a, V
    block_size = min(block_size or REV_BLOCK, REV_BLOCK)
    Sh_packed, ShT_packed = S_pair
    N, J = U.shape
    Jp = _pow2_width(J)
    J2 = Jp * Jp
    B = min(block_size, max(8, N))
    pad = _pad_rows(N, B)
    dtype = U.dtype

    phi = _padJ(_transport(t, c), J, Jp, 1.0)
    U2 = _padJ(U, J, Jp)
    W2 = _padJ(W, J, Jp)
    bW2 = _padJ(bW, J, Jp)
    dts = jnp.concatenate([jnp.zeros((1,), t.dtype), -jnp.diff(t)])
    bv0 = bW2 / d[:, None]
    W_prev = jnp.concatenate(
        [jnp.zeros((1, Jp), dtype), W2[:-1]], axis=0
    )
    rowmask = jnp.concatenate(
        [jnp.zeros((1,), dtype), jnp.ones((N - 1,), dtype)]
    )

    def padcat(x, fill=0.0):
        if not pad:
            return x
        shape = (pad,) + x.shape[1:]
        return jnp.concatenate(
            [x, jnp.full(shape, fill, x.dtype)], axis=0
        )

    NP = N + pad
    NB = NP // B
    grid = (NB,)
    rev = lambda i: (NB - 1 - i, 0)  # noqa: E731
    rowP = pl.BlockSpec((B, J2), rev, memory_space=pltpu.VMEM)
    fix = pl.BlockSpec((1, J2), lambda i: (0, 0),
                       memory_space=pltpu.VMEM)

    bd_r = jnp.broadcast_to(bd[:, None], (N, J2))
    mask_r = jnp.broadcast_to(rowmask[:, None], (N, J2))

    ba_s, bv_s, bu_s, bp_s, dba0_o, dbv0_o = pl.pallas_call(
        functools.partial(_factor_rev_kernel, J=Jp),
        grid=grid,
        in_specs=[rowP] * 13,
        out_specs=[rowP] * 4 + [fix, fix],
        out_shape=[jax.ShapeDtypeStruct((NP, J2), dtype)] * 4
        + [jax.ShapeDtypeStruct((1, J2), dtype)] * 2,
        scratch_shapes=[pltpu.VMEM((1, J2), dtype)] * 5,
        interpret=_interpret(interpret),
    )(
        padcat(_rep(phi, Jp), 1.0), padcat(_tile(phi, Jp), 1.0),
        padcat(_rep(U2, Jp)), padcat(_tile(U2, Jp)),
        padcat(_tile(W2, Jp)),
        padcat(_rep(W_prev, Jp)), padcat(_tile(W_prev, Jp)),
        padcat(Sh_packed), padcat(ShT_packed), padcat(bd_r),
        padcat(_rep(bv0, Jp)), padcat(_tile(bv0, Jp)),
        padcat(mask_r),
    )

    m = rowmask[:, None]
    ba = ba_s[:N, 0] * rowmask
    bV = bv_s[:N, :J] * m
    bU = bu_s[:N, :J] * m
    bp = bp_s[:N, ::Jp][:, :J] * m

    # boundary row 0
    dba0 = dba0_o[0, 0]
    dbv0 = dbv0_o[0, :J]
    bv_0 = bv0[0, :J] + dbv0
    ba_0 = bd[0] + dba0 - bv_0 @ W[0]
    ba = ba.at[0].set(ba_0)
    bV = bV.at[0].set(bv_0)

    bc = jnp.sum(bp * dts[:, None], axis=0)
    ft = bp @ c
    ft_full = jnp.concatenate([ft, jnp.zeros((1,), t.dtype)])
    bt = ft_full[1:] - ft_full[:-1]
    return bt, bc, ba, bU, bV


# ================================================ sweep reverse (lower)


def _sweep_rev_kernel(phi_ref, a_ref, bfeed_ref, f_ref,
                      rprev_ref, bz_ref, mask_ref,
                      bA_ref, bp_ref, dbB_ref, dbR_ref, bzeff_ref,
                      bF, dbr, *, is_solve, J):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        bF[...] = jnp.zeros_like(bF)
        dbr[...] = jnp.zeros_like(dbr)

    B = bz_ref.shape[0]
    sign = -1.0 if is_solve else 1.0
    ma = _allsum_masks(J)

    def row(k_, _):
        n = B - 1 - k_
        sl = pl.ds(n, 1)
        msk = mask_ref[sl, :]

        p = phi_ref[sl, :]
        a_n = a_ref[sl, :]
        F_n = f_ref[sl, :]
        bz_in = bz_ref[sl, :]
        if is_solve:
            bz_n = bz_in + dbr[...]
        else:
            bz_n = bz_in

        bA_n = sign * (p * F_n) * bz_n
        Mv = bF[...] + sign * a_n * bz_n
        bp_n = F_n * Mv * p
        M2 = p * Mv
        dbB_n = M2 * rprev_ref[sl, :]
        dbR_n = _butterfly(M2 * bfeed_ref[sl, :], ma)

        bA_ref[sl, :] = bA_n
        bp_ref[sl, :] = bp_n
        dbB_ref[sl, :] = dbB_n
        dbR_ref[sl, :] = dbR_n
        bzeff_ref[sl, :] = bz_n
        inv = 1.0 - msk
        bF[...] = msk * M2 + inv * bF[...]
        dbr[...] = msk * dbR_n + inv * dbr[...]
        return 0

    jax.lax.fori_loop(0, B, row, 0)


def _sweep_rev_lower(t, c, A, Bfeed, Y, Z, F, bZ, *, is_solve,
                     block_size=None, interpret=None):
    N, J = A.shape
    assert Y.shape[1] == 1
    Jp = _pow2_width(J)
    B = block_size or DEFAULT_BLOCK
    B = min(B, max(8, N))
    pad = _pad_rows(N, B)
    dtype = Y.dtype

    phi = _padJ(_transport(t, c), J, Jp, 1.0)
    A2 = _padJ(A, J, Jp)
    dts = jnp.concatenate([jnp.zeros((1,), t.dtype), -jnp.diff(t)])
    R_rows = Z if is_solve else Y
    R_prev = jnp.concatenate(
        [jnp.zeros((1, 1), dtype), R_rows[:-1]], axis=0
    )
    B_prev = jnp.concatenate(
        [jnp.zeros((1, Jp), dtype), _padJ(Bfeed, J, Jp)[:-1]], axis=0
    )
    F2 = _padJ(F[:, :, 0], J, Jp)
    rowmask = jnp.concatenate(
        [jnp.zeros((1,), dtype), jnp.ones((N - 1,), dtype)]
    )

    def padcat(x, fill=0.0):
        if not pad:
            return x
        shape = (pad,) + x.shape[1:]
        return jnp.concatenate(
            [x, jnp.full(shape, fill, x.dtype)], axis=0
        )

    NP = N + pad
    NB = NP // B
    grid = (NB,)
    rev = lambda i: (NB - 1 - i, 0)  # noqa: E731
    rowJ = pl.BlockSpec((B, Jp), rev, memory_space=pltpu.VMEM)

    Rp = jnp.broadcast_to(R_prev, (N, Jp))
    bZr = jnp.broadcast_to(bZ, (N, Jp))
    mask_r = jnp.broadcast_to(rowmask[:, None], (N, Jp))

    bA_s, bp_s, dbB_s, dbR_s, bz_s = pl.pallas_call(
        functools.partial(_sweep_rev_kernel, is_solve=is_solve, J=Jp),
        grid=grid,
        in_specs=[rowJ] * 7,
        out_specs=[rowJ] * 5,
        out_shape=[jax.ShapeDtypeStruct((NP, Jp), dtype)] * 5,
        scratch_shapes=[
            pltpu.VMEM((1, Jp), dtype),
            pltpu.VMEM((1, Jp), dtype),
        ],
        interpret=_interpret(interpret),
    )(padcat(phi, 1.0), padcat(A2), padcat(B_prev), padcat(F2),
      padcat(Rp), padcat(bZr), padcat(mask_r))

    m = rowmask[:, None]
    bA = bA_s[:N, :J] * m
    bp = bp_s[:N, :J] * m
    dbB = dbB_s[:N, :J] * m
    dbR = dbR_s[:N, :1] * m
    bz_eff = bz_s[:N, :1]

    zJ = jnp.zeros((1, J), dtype)
    bB = jnp.concatenate([dbB[1:], zJ])
    if is_solve:
        bY = bz_eff.at[0].set(bZ[0] + dbR[1] if N > 1 else bZ[0])
    else:
        bY = jnp.concatenate([dbR[1:], jnp.zeros((1, 1), dtype)])

    bc = jnp.sum(bp * dts[:, None], axis=0)
    ft = bp @ c
    ft_full = jnp.concatenate([ft, jnp.zeros((1,), t.dtype)])
    bt = ft_full[1:] - ft_full[:-1]
    return bt, bc, bA, bB, bY


def sweep_rev_packed(t, c, A, Bfeed, Y, Z, F, bZ, *, is_solve, upper,
                     **kw):
    if not upper:
        return _sweep_rev_lower(
            t, c, A, Bfeed, Y, Z, F, bZ, is_solve=is_solve, **kw
        )
    bt, bc, bA, bB, bY = _sweep_rev_lower(
        -t[::-1], c, _flip(A), _flip(Bfeed), _flip(Y), _flip(Z),
        _flip(F), _flip(bZ), is_solve=is_solve, **kw
    )
    return -_flip(bt), bc, _flip(bA), _flip(bB), _flip(bY)
