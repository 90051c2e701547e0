"""Fused slab-resident log-likelihood: value + gradient as three Mosaic
scan kernels with ALL inter-pass glue in the kernels' slab layout.

Why this module exists (round-5 measurements, v5e, N=1e5, J=2):

* The entry-planes engine (``ops/planes_engine.py``) reduced the J=2
  loglik+grad from 1.32 to ~0.89 ms/eval, but its remaining cost is
  NOT the sequential scan: each of its ~4 engine passes spends
  ~0.10-0.15 ms/eval on XLA-side layout work — packing (N,)-laid
  planes into the kernel's (T, LP, E, s, 128) slab and back — while
  the level-0 kernel itself costs ~0.03-0.05 ms
  (``benchmarks/probe_planes_glue_tpu.py``).  Batching the layout ops
  into single fat XLA ops does NOT help (0.156 -> 0.140 ms: the copies
  are bandwidth-inefficient, not dispatch-bound), and a Pallas
  transpose kernel moves the same data in ~4 us
  (``benchmarks/probe_transpose_tpu.py``).

* Therefore: pack ONCE per log-likelihood evaluation, not once per
  engine pass.  Raw per-row quantities (dt, U, V, y, a) are laid out
  into slab form a single time; the three sequential flows of the
  fused loglik+grad —

    1. the Kalman-element forward (factor + lower solve in one pass,
       ``assoc.factor_solve_assoc`` math),
    2. the solve adjoint (``assoc.sweep_rev_assoc`` is_solve math),
    3. the factor adjoint (``assoc._frev_suffix_states_dense`` math) —

  each run as ONE Pallas kernel that builds its monoid elements
  IN-KERNEL from the raw planes (A = diag(p)(I - v u^T / a) etc. are a
  few VPU ops per entry), composes them through a VMEM scratch carry,
  and emits within-block prefixes + block maps.  The tiny level-1
  recursion (<= ~1025 block maps) runs as a Hillis-Steele doubling
  prefix in XLA; the distribute is a broadcast along the slab's step
  axis (free); consumers (d, W, Z, the cotangent seeds, the shifted
  caches S_half / F_pre) are elementwise slab ops that XLA fuses into
  the stacks feeding the next kernel.  Only the final per-row
  cotangents make the one trip back to (N,) layout.

Padding is value-engineered so no masking is needed inside the
kernels: raw planes pad with (u, v, y, dt -> 0; a, 1/a -> 1), which
makes every out-of-range element compose as an EXACT monoid identity
(A = I, Q = R = b = eta = 0) — garbage never forms, so no NaN can leak
into valid lanes.  The single exception is the n = 0 element of the
two reverse flows (whose step n uses row n's own u/w), handled by one
in-kernel one-hot mask on u.

Scope: K = 1 (the log-likelihood RHS), J <= 4 (SHO/real terms and
their mixtures incl. RotationTerm — the sampler hot paths), unbatched
traces, runs compiled on TPU and in interpret mode elsewhere (the CPU
parity-test path).  J <= 2 uses dense-in-kernel reverse elements;
J = 3..4 the structured A/B/C factor adjoint.  Other shapes keep the
per-pass planes/generic engines.

Role of the reference's fused likelihood path (celerite2
``c++/include/celerite2/core.hpp norm + forward.hpp:111-132`` plus the
reverse sweeps of ``reverse.hpp``), re-architected so the whole
value+gradient is three kernel launches instead of ~10^5 sequential
steps.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from celerite2_tpu.ops.planes import (
    kalman_spec,
    mat_affine_spec,
)
from celerite2_tpu.ops import planes_engine as _pe

__all__ = ["loglik_slab", "slab_wanted"]

_SUBS = 8
_LANES = 128
LOG2PI = float(np.log(2.0 * np.pi))


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ============================================================ geometry


class Geom:
    """Slab geometry shared by every pass of one loglik evaluation.

    Row n of the sequence lives at block b = n // L, step l = n % L;
    block b rides (tile, sublane, lane) = (b // 1024, (b % 1024) //
    128, b % 128); the step axis is padded to LP (a multiple of 16 so
    per-kernel chunk sizes of 8/16 both divide it).
    """

    def __init__(self, N: int, dtype):
        self.N = int(N)
        self.dtype = dtype
        self.L = max(8, min(self.N, -(-self.N // (_SUBS * _LANES))))
        self.NB = -(-self.N // self.L)
        self.GB = self.NB
        self.T = -(-self.GB // (_SUBS * _LANES))
        self.s = _SUBS if self.T > 1 else -(-self.GB // _LANES)
        self.TOT = self.T * self.s * _LANES
        self.LP = -(-self.L // 16) * 16

    def chunk_for(self, n_stream_planes: int) -> int:
        """Steps per grid index: amortize the ~2.5 us grid-step floor
        within a ~2 MB VMEM stream budget (in + out blocks)."""
        if _interpret():
            return 1
        per_step = n_stream_planes * self.s * _LANES * 4
        c = max(8, min(16, (2 << 20) // max(1, per_step)))
        return 8 if c < 16 else 16


# ====================================================== pack / unpack


def _pack(g: Geom, planes, pads):
    """(N,) planes -> ONE (T, LP, E, s, 128) slab; four fat XLA ops.

    ``pads`` gives each plane's out-of-range fill value, chosen so
    padded rows form exact identity elements in every kernel.
    """
    E = len(planes)
    x = jnp.stack([jnp.asarray(p, g.dtype) for p in planes], axis=0)
    pv = jnp.asarray(list(pads), g.dtype)[:, None]
    pad_rows = g.NB * g.L - g.N
    if pad_rows:
        x = jnp.concatenate(
            [x, jnp.broadcast_to(pv, (E, pad_rows))], axis=-1
        )
    x = x.reshape(E, g.GB, g.L)
    if g.TOT > g.GB:
        x = jnp.concatenate(
            [
                x,
                jnp.broadcast_to(pv[:, :, None], (E, g.TOT - g.GB, g.L)),
            ],
            axis=1,
        )
    x = x.reshape(E, g.T, g.s, _LANES, g.L)
    x = jnp.transpose(x, (1, 4, 0, 2, 3))  # (T, L, E, s, 128)
    if g.LP > g.L:
        x = jnp.concatenate(
            [
                x,
                jnp.broadcast_to(
                    jnp.asarray(list(pads), g.dtype)[
                        None, None, :, None, None
                    ],
                    (g.T, g.LP - g.L, E, g.s, _LANES),
                ),
            ],
            axis=1,
        )
    return x


def _unpack(g: Geom, planes):
    """List of (T, LP, s, 128) planes -> list of (N,) arrays."""
    E = len(planes)
    x = jnp.stack(planes, axis=0)[:, :, : g.L]
    x = jnp.transpose(x, (0, 1, 3, 4, 2)).reshape(E, g.TOT, g.L)
    x = x[:, : g.GB].reshape(E, g.GB * g.L)[:, : g.N]
    return [x[e] for e in range(E)]


# =============================================== slab shifts and masks
#
# Shifting along the SEQUENCE in slab layout: within a block the step
# axis shifts; at block boundaries the neighbour lives one LANE over
# (in global-block order), handled by one tiny roll of the boundary
# row.  One concatenate per shifted plane; everything fuses.


def _roll_blocks(g: Geom, row, shift_right: bool, fill):
    """Shift a (T, 1, s, 128) per-block row by one block."""
    flat = row.reshape(g.T * g.s * _LANES)
    f = jnp.full((1,), fill, row.dtype)
    if shift_right:
        flat = jnp.concatenate([f, flat[:-1]])
    else:
        flat = jnp.concatenate([flat[1:], f])
    return flat.reshape(g.T, 1, g.s, _LANES)


def shift_bwd(g: Geom, x, fill=0.0):
    """Row n receives row n-1's value (row 0 gets ``fill``)."""
    bnd = _roll_blocks(g, x[:, g.L - 1 : g.L], True, fill)
    return jnp.concatenate([bnd, x[:, : g.LP - 1]], axis=1)


def shift_fwd(g: Geom, x, fill=0.0):
    """Row n receives row n+1's value (row N-1 reads the pad region,
    whose per-row values this pipeline keeps at exact zero)."""
    bnd = _roll_blocks(g, x[:, 0:1], False, fill)
    return jnp.concatenate([x[:, 1 : g.L], bnd, x[:, g.L :]], axis=1)


def _row_l_ids(g: Geom):
    shape = (g.T, g.LP, g.s, _LANES)
    it = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    il = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    isub = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    ilane = jax.lax.broadcasted_iota(jnp.int32, shape, 3)
    blk = (it * g.s + isub) * _LANES + ilane
    return blk * g.L + il, il


def _valid_mask(g: Geom):
    n, l = _row_l_ids(g)
    return (l < g.L) & (n < g.N)


def _row0_mask(g: Geom):
    n, _ = _row_l_ids(g)
    return n == 0


def _msum(x, mask):
    return jnp.sum(jnp.where(mask, x, jnp.zeros_like(x)))


# ======================================================== scan kernels


def _body(in_ref, out_ref, acc_ref, *, build, combine, treedef, E_in,
          E_out, idents, chunk, NC, reverse, python_loop):
    """One grid step: ``chunk`` sequential element-build + combine
    iterations on VMEM-resident (s, 128) tiles; the running composition
    is carried as VALUES, with only the cross-grid-step carry in VMEM
    scratch.  ``reverse`` iterates the SAME combine over the elements
    in descending order (suffix composition: the accumulated later
    steps are applied first, so the operand order is unchanged)."""
    tpid = pl.program_id(0)
    lc = pl.program_id(1)
    cp = NC - 1 - lc if reverse else lc

    @pl.when(lc == 0)
    def _():
        for e in range(E_out):
            acc_ref[e] = jnp.full(
                acc_ref.shape[1:], idents[e], acc_ref.dtype
            )

    def step(j, acc):
        i = chunk - 1 - j if reverse else j
        raw = tuple(in_ref[0, i, e] for e in range(E_in))
        el = tuple(
            jax.tree_util.tree_leaves(build(raw, tpid, cp * chunk + i))
        )
        new = tuple(
            jax.tree_util.tree_leaves(
                combine(
                    jax.tree_util.tree_unflatten(treedef, acc),
                    jax.tree_util.tree_unflatten(treedef, el),
                )
            )
        )
        for e in range(E_out):
            out_ref[0, i, e] = new[e]
        return new

    acc = tuple(acc_ref[e] for e in range(E_out))
    if python_loop:
        for j in range(chunk):
            acc = step(j, acc)
    else:
        acc = jax.lax.fori_loop(0, chunk, step, acc)
    for e in range(E_out):
        acc_ref[e] = acc[e]


def _scan_pass(g: Geom, stream, build, spec, *, reverse):
    """Run one flow end-to-end: in-kernel element build + within-block
    composition, level-1 block-map recursion, slab-resident distribute.

    ``stream`` — (T, LP, E_in, s, 128) raw planes (jnp.stack of slab
    expressions: XLA fuses all elementwise producers into the stack).
    ``build(raw, t, l)`` — element pytree from the E_in raw tiles.
    Returns the distribute output leaves as (T, LP, s, 128) planes
    (valid leaves per ``spec.distribute``'s contract).
    """
    E_in = stream.shape[2]
    el0 = build(tuple(0.0 for _ in range(E_in)), 0, 0)
    flat0, treedef = jax.tree_util.tree_flatten(el0)
    E_out = len(flat0)
    idents = tuple(spec.identity_scalars)
    chunk = g.chunk_for(E_in + E_out)
    NC = g.LP // chunk

    kern = functools.partial(
        _body, build=build, combine=spec.combine, treedef=treedef,
        E_in=E_in, E_out=E_out, idents=idents, chunk=chunk, NC=NC,
        reverse=reverse, python_loop=_interpret(),
    )
    if reverse:
        imap = lambda t, lc: (t, NC - 1 - lc, 0, 0, 0)  # noqa: E731
    else:
        imap = lambda t, lc: (t, lc, 0, 0, 0)  # noqa: E731
    out = pl.pallas_call(
        kern,
        grid=(g.T, NC),
        in_specs=[pl.BlockSpec((1, chunk, E_in, g.s, _LANES), imap)],
        out_specs=pl.BlockSpec((1, chunk, E_out, g.s, _LANES), imap),
        out_shape=jax.ShapeDtypeStruct(
            (g.T, g.LP, E_out, g.s, _LANES), g.dtype
        ),
        scratch_shapes=[pltpu.VMEM((E_out, g.s, _LANES), g.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")
        ),
        interpret=_interpret(),
    )(stream)

    # block maps: the full within-block composition sits at the last
    # step composed (l = L-1 forward, l = 0 reverse)
    at_l = 0 if reverse else g.L - 1
    xm = jnp.transpose(out[:, at_l], (1, 0, 2, 3)).reshape(
        E_out, g.TOT
    )[:, : g.GB]
    maps = [xm[e][None] for e in range(E_out)]  # (1, NB) each

    # level-1: compose the <= ~1025 block maps with a Hillis-Steele
    # doubling prefix (log2(NB) full-width combines, graph-size lean)
    if reverse:
        maps = [m[:, ::-1] for m in maps]
    incl = _pe._leaf_scan(maps, idents, treedef, spec.combine)
    if reverse:
        incl = [m[:, ::-1] for m in incl]
        excl = [
            jnp.concatenate(
                [m[:, 1:], jnp.full((1, 1), iv, m.dtype)], axis=1
            )
            for m, iv in zip(incl, idents)
        ]
    else:
        excl = [
            jnp.concatenate(
                [jnp.full((1, 1), iv, m.dtype), m[:, :-1]], axis=1
            )
            for m, iv in zip(incl, idents)
        ]

    # exclusive block states -> (T, 1, s, 128), broadcast along LP in
    # the distribute (constant within a block: free in slab layout)
    excl_slab = []
    for m, iv in zip(excl, idents):
        v = m[0]
        if g.TOT > g.GB:
            v = jnp.concatenate(
                [v, jnp.full((g.TOT - g.GB,), iv, v.dtype)]
            )
        excl_slab.append(v.reshape(g.T, 1, g.s, _LANES))

    prefixes = [out[:, :, e] for e in range(E_out)]
    full = spec.distribute(
        jax.tree_util.tree_unflatten(treedef, tuple(excl_slab)),
        jax.tree_util.tree_unflatten(treedef, tuple(prefixes)),
    )
    return jax.tree_util.tree_leaves(full)


# ===================================================== element builds
#
# All builds receive E_in raw (s, 128) tiles and return the element
# pytree in the spec's structure.  Padded rows form exact identities by
# the pack fill values; only the reverse flows need the one-hot n = 0
# mask (their step n uses row n's OWN u, nonzero at n = 0).


def _first_row_gate(tpid, l, s):
    """Boolean (s, 128) tile that is True only at global row n = 0
    (tile 0, step 0, sublane 0, lane 0) — built from iotas in-kernel
    (pallas kernels cannot capture array constants)."""
    isub = jax.lax.broadcasted_iota(jnp.int32, (s, _LANES), 0)
    ilane = jax.lax.broadcasted_iota(jnp.int32, (s, _LANES), 1)
    return ((isub == 0) & (ilane == 0)) & ((tpid == 0) & (l == 0))


def _build_kalman(raw, tpid, l, *, J):
    # raw = p(J), u_prev(J), v_prev(J), ainv_prev, y_prev
    p = raw[:J]
    up = raw[J : 2 * J]
    vp = raw[2 * J : 3 * J]
    ainvp = raw[3 * J]
    yp = raw[3 * J + 1]
    A = tuple(
        tuple(
            p[i] * ((1.0 if i == j else 0.0) - vp[i] * up[j] * ainvp)
            for j in range(J)
        )
        for i in range(J)
    )
    Q = tuple(
        tuple(p[i] * vp[i] * vp[j] * ainvp * p[j] for j in range(J))
        for i in range(J)
    )
    R = tuple(
        tuple(-up[i] * up[j] * ainvp for j in range(J)) for i in range(J)
    )
    b = tuple((p[i] * vp[i] * yp * ainvp,) for i in range(J))
    eta = tuple((-up[i] * yp * ainvp,) for i in range(J))
    return (A, Q, R, b, eta)


def _masked_u(raw_u, tpid, l, s, J):
    """Zero row 0's u so the n = 0 element is the identity (the reverse
    flows' step n consumes row n's own data; step 0 does not exist)."""
    oh = _first_row_gate(tpid, l, s)
    return tuple(
        jnp.where(oh, jnp.zeros_like(raw_u[j] + 0.0), raw_u[j] + 0.0)
        for j in range(J)
    )


def _build_solve_rev(raw, tpid, l, *, J, s):
    # raw = p(J), u(J), w(J), bZ
    p = raw[:J]
    u = _masked_u(raw[J : 2 * J], tpid, l, s, J)
    w = raw[2 * J : 3 * J]
    bz = raw[3 * J]
    A = tuple(
        tuple(
            p[i] * ((1.0 if i == j else 0.0) - u[i] * w[j])
            for j in range(J)
        )
        for i in range(J)
    )
    b = tuple((-p[i] * u[i] * bz,) for i in range(J))
    return (A, b)


def _build_factor_rev(raw, tpid, l, *, J, s):
    # raw = p(J), u(J), w(J), bv0(J), bdp
    p = raw[:J]
    u = _masked_u(raw[J : 2 * J], tpid, l, s, J)
    w = raw[2 * J : 3 * J]
    bv0 = raw[3 * J : 4 * J]
    bdp = raw[4 * J]
    # linear part: dM'[jk]/dM[lm] = p_j p_k [d_jl d_km
    #   - u_j (d_kl w_m + d_km w_l) + u_j u_k w_l w_m]
    # (assoc._frev_suffix_states_dense's closed form, entry-planes)
    rows = []
    for jj in range(J):
        for kk in range(J):
            row = []
            for ll in range(J):
                for mm in range(J):
                    term = 1.0 if (jj == ll and kk == mm) else 0.0
                    t2 = 0.0
                    if kk == ll:
                        t2 = t2 + w[mm]
                    if kk == mm:
                        t2 = t2 + w[ll]
                    val = term - u[jj] * t2 + u[jj] * u[kk] * w[ll] * w[mm]
                    row.append(p[jj] * p[kk] * val)
            rows.append(tuple(row))
    L = tuple(rows)
    # constant part: the step applied to M = 0
    C = tuple(
        (p[jj] * (-u[jj] * bv0[kk] - bdp * u[jj] * u[kk]) * p[kk],)
        for jj in range(J)
        for kk in range(J)
    )
    return (L, C)


# ==================== structured factor adjoint (J > 2, phases A/B/C)
#
# At J > 2 the dense reverse-factor element (J^4 + J^2 planes PER ROW)
# is untenable; instead the adjoint stays STRUCTURED (O(J^2) to apply,
# assoc._frev_apply math) and only per-BLOCK composed maps densify:
#
#   A. one kernel pushes the J^2 basis matrices + the affine constant
#      through each block's steps (descending), emitting one dense
#      (J^2 x J^2 | J^2) affine map per block;
#   B. the <= ~1025 block maps compose as augmented (D+1, D+1) matrix
#      suffix products in XLA (Hillis-Steele doubling, real matmuls —
#      a handful of HLO ops, full matmul precision), giving each
#      block's incoming state (the exclusive composition applied to
#      the zero init);
#   C. a second kernel re-runs each block's structured recursion from
#      that seed, emitting the state entering every step.
#
# This is assoc._frev_suffix_states re-architected for slab residency.


def _structured_apply(M, par, J, affine):
    """One reverse-factor step on a J^2-plane state (row-major (j,k)).

    math of assoc._frev_apply:  bv = (M + M^T) w (+bv0),
    ba = -w^T M w (+bdp),  M' = p (.) [M - u (x) bv - ba u (x) u] (.) p
    """
    p, u, w, bv0, bdp = par
    Mw = [
        sum(M[i * J + k] * w[k] for k in range(J)) for i in range(J)
    ]
    MTw = [
        sum(M[k * J + i] * w[k] for k in range(J)) for i in range(J)
    ]
    bv = [Mw[i] + MTw[i] for i in range(J)]
    ba = -sum(w[i] * Mw[i] for i in range(J))
    if affine:
        bv = [bv[i] + bv0[i] for i in range(J)]
        ba = ba + bdp
    return [
        p[i] * (M[i * J + k] - u[i] * bv[k] - ba * u[i] * u[k]) * p[k]
        for i in range(J)
        for k in range(J)
    ]


def _frev_par(raw, tpid, l, J, s):
    p = raw[:J]
    u = _masked_u(raw[J : 2 * J], tpid, l, s, J)
    w = raw[2 * J : 3 * J]
    bv0 = raw[3 * J : 4 * J]
    bdp = raw[4 * J]
    return (p, u, w, bv0, bdp)


def _phaseA_body(in_ref, out_ref, acc_ref, *, J, s, chunk, NC,
                 python_loop):
    """Densify one block's composed affine map: carry = (J^2 basis
    columns each J^2 planes, constant J^2 planes); steps applied
    descending; the final map is written to the per-block out slot."""
    tpid = pl.program_id(0)
    lc = pl.program_id(1)
    cp = NC - 1 - lc
    D = J * J
    E = D * D + D

    @pl.when(lc == 0)
    def _():
        for k in range(D):
            for i in range(D):
                acc_ref[k * D + i] = jnp.full(
                    acc_ref.shape[1:],
                    1.0 if i == k else 0.0,
                    acc_ref.dtype,
                )
        for i in range(D):
            acc_ref[D * D + i] = jnp.zeros(
                acc_ref.shape[1:], acc_ref.dtype
            )

    def step(j, acc):
        i = chunk - 1 - j
        raw = tuple(in_ref[0, i, e] for e in range(in_ref.shape[2]))
        par = _frev_par(raw, tpid, cp * chunk + i, J, s)
        new = []
        # composed-so-far f; new = step ∘ f: columns map through the
        # LINEAR part, the constant through the full affine step
        for k in range(D):
            col = [acc[k * D + m] for m in range(D)]
            new.extend(_structured_apply(col, par, J, affine=False))
        con = [acc[D * D + m] for m in range(D)]
        new.extend(_structured_apply(con, par, J, affine=True))
        return tuple(new)

    acc = tuple(acc_ref[e] for e in range(E))
    if python_loop:
        for j in range(chunk):
            acc = step(j, acc)
    else:
        acc = jax.lax.fori_loop(0, chunk, step, acc)
    for e in range(E):
        acc_ref[e] = acc[e]
        out_ref[0, 0, e] = acc[e]


def _phaseC_body(in_ref, seed_ref, out_ref, acc_ref, *, J, s, chunk,
                 NC, python_loop):
    """Re-run one block's structured recursion from its incoming state,
    emitting the state ENTERING every step (= M_in; at the n = 0 row,
    whose element is the identity, this is exactly the state after all
    real steps — the boundary value the row formulas need)."""
    tpid = pl.program_id(0)
    lc = pl.program_id(1)
    cp = NC - 1 - lc
    D = J * J

    @pl.when(lc == 0)
    def _():
        for e in range(D):
            acc_ref[e] = seed_ref[0, 0, e]

    def step(j, acc):
        i = chunk - 1 - j
        for e in range(D):
            out_ref[0, i, e] = acc[e]
        raw = tuple(in_ref[0, i, e] for e in range(in_ref.shape[2]))
        par = _frev_par(raw, tpid, cp * chunk + i, J, s)
        return tuple(_structured_apply(list(acc), par, J, affine=True))

    acc = tuple(acc_ref[e] for e in range(D))
    if python_loop:
        for j in range(chunk):
            acc = step(j, acc)
    else:
        acc = jax.lax.fori_loop(0, chunk, step, acc)
    for e in range(D):
        acc_ref[e] = acc[e]


def _factor_adjoint_structured(g: Geom, stream, J):
    """M_in planes (J^2, each (T, LP, s, 128)) for the J > 2 factor
    adjoint, via the A/B/C scheme above."""
    D = J * J
    E_in = stream.shape[2]
    EA = D * D + D
    chunk = g.chunk_for(E_in + D)
    NC = g.LP // chunk
    interp = _interpret()

    # ---- phase A: per-block dense maps
    kernA = functools.partial(
        _phaseA_body, J=J, s=g.s, chunk=chunk, NC=NC,
        python_loop=interp,
    )
    maps_slab = pl.pallas_call(
        kernA,
        grid=(g.T, NC),
        in_specs=[
            pl.BlockSpec(
                (1, chunk, E_in, g.s, _LANES),
                lambda t, lc: (t, NC - 1 - lc, 0, 0, 0),
            )
        ],
        out_specs=pl.BlockSpec(
            (1, 1, EA, g.s, _LANES), lambda t, lc: (t, 0, 0, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct(
            (g.T, 1, EA, g.s, _LANES), g.dtype
        ),
        scratch_shapes=[pltpu.VMEM((EA, g.s, _LANES), g.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")
        ),
        interpret=interp,
    )(stream)

    # ---- phase B: augmented-matrix suffix products over blocks
    nat = jnp.transpose(maps_slab[:, 0], (1, 0, 2, 3)).reshape(
        EA, g.TOT
    )[:, : g.GB]
    # column k of the block map = image of basis e_k; build (GB, D, D)
    # with A[:, i, k] = image_k[i] in TWO fat ops (a stack-of-slices
    # formulation here cost ~1 ms/eval of tiny-op dispatch — measured)
    A = jnp.transpose(nat[: D * D].reshape(D, D, g.GB), (2, 1, 0))
    cvec = nat[D * D :].T  # (GB, D)
    eye1 = jnp.zeros((g.GB, 1, D + 1), g.dtype).at[:, 0, D].set(1.0)
    Maug = jnp.concatenate(
        [jnp.concatenate([A, cvec[:, :, None]], axis=-1), eye1], axis=-2
    )
    with jax.default_matmul_precision("highest"):
        S = Maug
        k = 1
        eye = jnp.broadcast_to(
            jnp.eye(D + 1, dtype=g.dtype)[None], (g.GB, D + 1, D + 1)
        )
        while k < g.GB:
            shifted = jnp.concatenate([S[k:], eye[:k]], axis=0)
            S = jnp.matmul(S, shifted)
            k *= 2
    # barrier: consuming the product chain ONLY through the seed slice
    # makes XLA:TPU lower the whole chain ~10x slower (measured 4.9 vs
    # 0.5 ms/eval — the narrowing rewrites the batched matmuls); the
    # barrier pins the standard lowering
    S = jax.lax.optimization_barrier(S)
    # exclusive suffix applied to the zero init -> per-block seed state
    seeds = jnp.concatenate(
        [S[1:, :D, D], jnp.zeros((1, D), g.dtype)], axis=0
    )  # (GB, D)

    if g.TOT > g.GB:
        seeds = jnp.concatenate(
            [seeds, jnp.zeros((g.TOT - g.GB, D), g.dtype)], axis=0
        )
    seed_slab = jnp.transpose(
        seeds.T.reshape(D, g.T, g.s, _LANES), (1, 0, 2, 3)
    )[:, None]  # (T, 1, D, s, 128)

    # ---- phase C: seeded per-row states
    kernC = functools.partial(
        _phaseC_body, J=J, s=g.s, chunk=chunk, NC=NC,
        python_loop=interp,
    )
    out = pl.pallas_call(
        kernC,
        grid=(g.T, NC),
        in_specs=[
            pl.BlockSpec(
                (1, chunk, E_in, g.s, _LANES),
                lambda t, lc: (t, NC - 1 - lc, 0, 0, 0),
            ),
            pl.BlockSpec(
                (1, 1, D, g.s, _LANES), lambda t, lc: (t, 0, 0, 0, 0)
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, chunk, D, g.s, _LANES),
            lambda t, lc: (t, NC - 1 - lc, 0, 0, 0),
        ),
        out_shape=jax.ShapeDtypeStruct(
            (g.T, g.LP, D, g.s, _LANES), g.dtype
        ),
        scratch_shapes=[pltpu.VMEM((D, g.s, _LANES), g.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")
        ),
        interpret=interp,
    )(stream, seed_slab)
    return [out[:, :, e] for e in range(D)]


# ============================================================ pipeline


def _planes_of(stack, idx):
    return [stack[:, :, e] for e in idx]


def _forward(g: Geom, t, c, a, U, V, y):
    """Slab forward: returns (ll, ok, raw slab, result slab)."""
    J = U.shape[1]
    dtype = g.dtype
    N = g.N

    dt = jnp.concatenate([jnp.zeros((1,), t.dtype), jnp.diff(t)])
    # scan._safe convention: non-PD rows divide by 1 (quiet failure)
    ainv = 1.0 / jnp.where(a > 0, a, jnp.ones_like(a))

    # raw slab: [dt, u(J), v(J), y, a, ainv]  (pads: dt,u,v,y -> 0;
    # a, ainv -> 1: padded rows then build exact identity elements)
    raw_planes = (
        [dt]
        + [U[:, j] for j in range(J)]
        + [V[:, j] for j in range(J)]
        + [y, a, ainv]
    )
    pads = [0.0] + [0.0] * (2 * J) + [0.0, 1.0, 1.0]
    R0 = _pack(g, raw_planes, pads)

    dt_s = R0[:, :, 0]
    u_s = _planes_of(R0, range(1, 1 + J))
    v_s = _planes_of(R0, range(1 + J, 1 + 2 * J))
    y_s = R0[:, :, 1 + 2 * J]
    a_s = R0[:, :, 2 + 2 * J]
    ainv_s = R0[:, :, 3 + 2 * J]

    p_s = [jnp.exp(-c[j] * dt_s) for j in range(J)]
    up = [shift_bwd(g, u_s[j]) for j in range(J)]
    vp = [shift_bwd(g, v_s[j]) for j in range(J)]
    ainvp = shift_bwd(g, ainv_s)
    yp = shift_bwd(g, y_s)

    stream1 = jnp.stack(p_s + up + vp + [ainvp, yp], axis=2)
    spec1 = kalman_spec(J, 1, dtype)
    leaves = _scan_pass(
        g, stream1, functools.partial(_build_kalman, J=J), spec1,
        reverse=False,
    )
    # kalman element structure: (A JxJ, Q JxJ, R JxJ, b Jx1, eta Jx1)
    # distribute validity: Q (covariance state), b (mean state)
    S = [leaves[J * J + e] for e in range(J * J)]  # row-major (j, k)
    F = [leaves[3 * J * J + j] for j in range(J)]

    Su = [
        sum(S[i * J + k] * u_s[k] for k in range(J)) for i in range(J)
    ]
    dd = a_s - sum(u_s[j] * Su[j] for j in range(J))
    vmask = _valid_mask(g)
    ok = jnp.all(jnp.where(vmask, dd, jnp.ones_like(dd)) > 0)
    safe_dd = jnp.where(dd > 0, dd, jnp.ones_like(dd))
    W = [(v_s[j] - Su[j]) / safe_dd for j in range(J)]
    Z = y_s - sum(u_s[j] * F[j] for j in range(J))

    ll = -0.5 * (
        _msum(jnp.log(safe_dd), vmask)
        + _msum(Z * Z / safe_dd, vmask)
        + N * LOG2PI
    )
    ll = jnp.where(ok, ll, -jnp.inf)

    RES = jnp.stack(S + F + [dd] + W + [Z], axis=2)
    return ll, ok, R0, RES


def _backward(g: Geom, c, R0, RES, ok, bll):
    """Slab backward: the solve + factor adjoints as two reverse scan
    kernels; returns (bt, bc, ba, bU, bV, by) in natural layout."""
    J = (R0.shape[2] - 4) // 2
    dtype = g.dtype

    dt_s = R0[:, :, 0]
    u_s = _planes_of(R0, range(1, 1 + J))
    S = _planes_of(RES, range(J * J))
    F = _planes_of(RES, range(J * J, J * J + J))
    dd = RES[:, :, J * J + J]
    W = _planes_of(RES, range(J * J + J + 1, J * J + 2 * J + 1))
    Z = RES[:, :, J * J + 2 * J + 1]

    p_s = [jnp.exp(-c[j] * dt_s) for j in range(J)]
    vmask = _valid_mask(g)
    row0 = _row0_mask(g)
    smask = vmask & (~row0)
    zero = jnp.zeros_like(dd)

    okf = jnp.where(ok, 1.0, 0.0).astype(dtype) * bll
    safe_dd = jnp.where(dd > 0, dd, jnp.ones_like(dd))
    dinv = 1.0 / safe_dd
    bd = jnp.where(
        vmask, (-0.5) * okf * (dinv - Z * Z * dinv * dinv), zero
    )
    bZt = jnp.where(vmask, -okf * Z * dinv, zero)

    # ---------------- solve adjoint (sweep_rev is_solve, lower) ------
    stream2 = jnp.stack(p_s + u_s + W + [bZt], axis=2)
    spec2 = mat_affine_spec(J, 1, dtype)
    leaves2 = _scan_pass(
        g, stream2,
        functools.partial(_build_solve_rev, J=J, s=g.s),
        spec2, reverse=True,
    )
    # mat-affine distribute validity: b (the composed state)
    Rst = [leaves2[J * J + j] for j in range(J)]

    W_prev = [shift_bwd(g, W[j]) for j in range(J)]
    Z_prev = shift_bwd(g, Z)
    F_pre = [
        shift_bwd(g, F[j]) + W_prev[j] * Z_prev for j in range(J)
    ]
    bF_in = [shift_fwd(g, Rst[j]) for j in range(J)]
    bz_eff = bZt + sum(bF_in[j] * W[j] for j in range(J))
    mid = [bF_in[j] - u_s[j] * bz_eff for j in range(J)]
    post = [p_s[j] * mid[j] for j in range(J)]
    bU1 = [
        jnp.where(smask, -p_s[j] * F_pre[j] * bz_eff, zero)
        for j in range(J)
    ]
    bp1 = [
        jnp.where(smask, F_pre[j] * mid[j] * p_s[j], zero)
        for j in range(J)
    ]
    dbR = sum(post[j] * W_prev[j] for j in range(J))
    dbB = [post[j] * Z_prev for j in range(J)]
    bY = jnp.where(row0, bZt + shift_fwd(g, dbR), bz_eff)
    bW_tot = [shift_fwd(g, dbB[j]) for j in range(J)]

    # ---------------- factor adjoint --------------------------------
    bv0 = [bW_tot[j] * dinv for j in range(J)]
    bdp = bd - sum(W[j] * bv0[j] for j in range(J))
    stream3 = jnp.stack(p_s + u_s + W + bv0 + [bdp], axis=2)
    if J <= 2:
        # dense J^2-affine elements built in-kernel (20 planes at J=2)
        spec3 = mat_affine_spec(J * J, 1, dtype)
        leaves3 = _scan_pass(
            g, stream3,
            functools.partial(_build_factor_rev, J=J, s=g.s),
            spec3, reverse=True,
        )
        Mst = [leaves3[J ** 4 + e] for e in range(J * J)]
        # row n >= 1 uses the state ENTERING step n; row 0 uses the
        # state after ALL steps (exactly Mst's row-0 value)
        MX = [
            jnp.where(row0, Mst[e], shift_fwd(g, Mst[e]))
            for e in range(J * J)
        ]
    else:
        # structured A/B/C scheme: phase C emits M_in directly (at the
        # identity n = 0 element, M_in == state after all real steps)
        MX = _factor_adjoint_structured(g, stream3, J)
    bv = [
        bv0[j]
        + sum((MX[j * J + k] + MX[k * J + j]) * W[k] for k in range(J))
        for j in range(J)
    ]
    ba = bdp - sum(
        W[j] * sum(MX[j * J + k] * W[k] for k in range(J))
        for j in range(J)
    )
    dd_prev = shift_bwd(g, dd)
    S_half = [
        p_s[j]
        * (
            shift_bwd(g, S[j * J + k])
            + dd_prev * W_prev[j] * W_prev[k]
        )
        for j in range(J)
        for k in range(J)
    ]
    bU2 = [
        jnp.where(
            smask,
            -sum(
                S_half[j * J + k] * p_s[k] * (bv[k] + 2.0 * ba * u_s[k])
                for k in range(J)
            ),
            zero,
        )
        for j in range(J)
    ]
    mid3 = [
        MX[j * J + k] - u_s[j] * bv[k] - ba * u_s[j] * u_s[k]
        for j in range(J)
        for k in range(J)
    ]
    bp2 = [
        jnp.where(
            smask,
            sum(
                mid3[i * J + k] * S_half[k * J + i]
                + S_half[k * J + i] * mid3[k * J + i]
                for k in range(J)
            )
            * p_s[i],
            zero,
        )
        for i in range(J)
    ]

    # ---------------- assemble cotangents ----------------------------
    ft = sum((bp1[j] + bp2[j]) * c[j] for j in range(J))
    bt_s = -ft + shift_fwd(g, ft)
    bc = jnp.stack(
        [_msum((bp1[j] + bp2[j]) * (-dt_s), smask) for j in range(J)]
    )
    bU_s = [bU1[j] + bU2[j] for j in range(J)]

    outs = _unpack(
        g, [bt_s, ba, bY] + bU_s + bv
    )
    bt = outs[0]
    ba_nat = outs[1]
    by = outs[2]
    bU = jnp.stack(outs[3 : 3 + J], axis=1)
    bV = jnp.stack(outs[3 + J : 3 + 2 * J], axis=1)
    return bt, bc, ba_nat, bU, bV, by


# ========================================================== public op


@jax.custom_vjp
def loglik_slab(t, c, a, U, V, y):
    """Gaussian-process log-likelihood via the fused slab pipeline.

    Semantics match ``gp._loglik_core``'s factor_solve-based form:
    ``-0.5 (sum log d + z^T d^{-1} z + N log 2pi)``, with quiet
    ``-inf`` (and zero gradients) on non-positive-definite systems.
    """
    g = Geom(t.shape[0], U.dtype)
    ll, _, _, _ = _forward(g, t, c, a, U, V, y)
    return ll


def _loglik_slab_fwd(t, c, a, U, V, y):
    g = Geom(t.shape[0], U.dtype)
    ll, ok, R0, RES = _forward(g, t, c, a, U, V, y)
    return ll, (c, ok, R0, RES, t.shape[0])


def _loglik_slab_bwd(res, bll):
    c, ok, R0, RES, N = res
    g = Geom(N, R0.dtype)
    bt, bc, ba, bU, bV, by = _backward(g, c, R0, RES, ok, bll)
    return bt, bc, ba, bU, bV, by


loglik_slab.defvjp(_loglik_slab_fwd, _loglik_slab_bwd)


def slab_wanted(t, U, y) -> bool:
    """Routing decision for the fused pipeline (see Config.fused_slab).

    'auto': TPU, an assoc-tier-sized system, unbatched trace, J <= 4,
    1-D RHS.  'on' forces (interpret mode off-TPU); 'off' disables.
    """
    from celerite2_tpu.config import get_config
    from celerite2_tpu.ops.assoc import _vmapped
    from celerite2_tpu.ops.dispatch import _backend

    mode = getattr(get_config(), "fused_slab", "off")
    if mode == "off":
        return False
    if y.ndim != 1 or U.shape[1] > 4 or t.shape[0] < 64:
        return False
    if any(_vmapped(x) for x in (t, U, y)):
        return False
    if mode == "on":
        return True
    if jax.default_backend() != "tpu":
        return False
    return _backend(t.shape[0], y) == "assoc"
