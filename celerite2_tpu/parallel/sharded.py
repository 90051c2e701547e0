"""Sequence-parallel GP log-likelihood over a device mesh.

The reference's recursions are single-threaded over N
(forward.hpp:111-132); the TPU-native equivalent shards N over the
``seq`` mesh axis and exchanges only O(J^2) carries between devices —
the celerite analogue of ring-attention's blockwise pass (SURVEY.md
section 5.7), built on ``shard_map`` + ``all_gather``/``psum``.

Algorithm (three phases, two passes over local data):

1. **Boundary exchange** — each device sends its last row's
   ``(t, a, U, V)`` to its right neighbor (``ppermute``), so the
   neighbor can build the Riccati/affine element that crosses the shard
   boundary.
2. **Block-map composition + carry exchange** — each device composes its
   local Riccati elements (factorization) into a single block map
   ``(A, Q, R)`` (J x J each), all-gathers the n_dev block maps, and
   prefix-composes the maps before its own index to obtain the incoming
   carry ``S_in``.  The solve pass does the same with affine
   ``(A, b)`` elements.
3. **Local evaluation** — the plain O(B J^2) recursions run from the
   incoming carry; ``psum`` reduces log-det and the quadratic form.

Total cross-device traffic per likelihood: O(n_dev J^2) floats —
independent of N.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from celerite2_tpu.gp import LOG2PI
from celerite2_tpu.ops.assoc import _riccati_combine
from celerite2_tpu.ops.scan import _safe

__all__ = ["sharded_loglik", "make_sharded_logdensity"]


def _local_riccati_block(phi, a_prev, u_prev, v_prev):
    """Compose the block's Riccati elements into one (A, Q, R) map.

    Inputs are per-row arrays (B, ...) where row r's element transports
    the carry over the gap ending at local row r, built from the
    *previous* row's (a, u, v) (already shifted / boundary-exchanged by
    the caller).
    """
    B, J = u_prev.shape
    I = jnp.eye(J, dtype=u_prev.dtype)
    al = _safe(a_prev)[:, None, None]
    A = phi[:, :, None] * (
        I[None] - jnp.einsum("nj,nk->njk", v_prev, u_prev) / al
    )
    Q = (
        phi[:, :, None]
        * (jnp.einsum("nj,nk->njk", v_prev, v_prev) / al)
        * phi[:, None, :]
    )
    R = -jnp.einsum("nj,nk->njk", u_prev, u_prev) / al

    def comp(acc, el):
        return _riccati_combine(acc, el), None

    # the scan inputs vary over the mesh axes; the carry must match, so
    # derive its varying-ness from the data (a varying one)
    one = u_prev[0, 0] * 0.0 + 1.0
    init = (
        I * one,
        jnp.zeros((J, J), u_prev.dtype) * one,
        jnp.zeros((J, J), u_prev.dtype) * one,
    )
    with jax.default_matmul_precision("highest"):
        (Ab, Qb, Rb), _ = lax.scan(comp, init, (A, Q, R))
    return Ab, Qb, Rb


def _local_factor(S_in, boundary, phi, a, U, V):
    """Plain factor recursion from an incoming carry (B rows).

    ``boundary = (a_in, u_in, v_in)`` is the previous shard's last row;
    its (d, w) — needed for this shard's first rank-one update — are
    recovered from ``S_in`` (d = a - u S u, w = (v - S u)/d).  For the
    first shard phi[0] = 0 annihilates the carry, so the garbage
    boundary values are harmless.
    """
    a_in, u_in, v_in = boundary
    tmp0 = S_in @ u_in
    d_in = a_in - u_in @ tmp0
    w_in = (v_in - tmp0) / _safe(d_in)

    def body(carry, inp):
        S, d_prev, w_prev = carry
        p, a_n, u, v = inp
        S = S + d_prev * jnp.outer(w_prev, w_prev)
        S = p[:, None] * S * p[None, :]
        tmp = S @ u
        d = a_n - u @ tmp
        w = (v - tmp) / _safe(d)
        return (S, d, w), (d, w)

    init = (S_in, d_in, w_in)
    (_, _, _), (d, W) = lax.scan(body, init, (phi, a, U, V))
    return d, W


def _local_affine_block(A_el, b_el):
    """Compose per-row affine elements (A (B,J,J), b (B,J)) into one."""
    J = A_el.shape[-1]

    def comp(acc, el):
        Aa, ba = acc
        Ae, be = el
        return (Ae @ Aa, Ae @ ba + be), None

    one = A_el[0, 0, 0] * 0.0 + 1.0
    init = (
        jnp.eye(J, dtype=A_el.dtype) * one,
        jnp.zeros((J,), A_el.dtype) * one,
    )
    with jax.default_matmul_precision("highest"):
        (Ab, bb), _ = lax.scan(comp, init, (A_el, b_el))
    return Ab, bb


def _prefix_incoming(blocks, idx, combine, identity):
    """Fold block maps 0..idx-1 (n_dev is small: unrolled masked fold)."""
    n = jax.tree_util.tree_leaves(blocks)[0].shape[0]
    acc = identity

    for k in range(n):
        el = jax.tree_util.tree_map(lambda x: x[k], blocks)
        new = combine(acc, el)
        take = k < idx
        acc = jax.tree_util.tree_map(
            lambda new_l, old_l: jnp.where(take, new_l, old_l), new, acc
        )
    return acc


def sharded_loglik(t, c, a, U, V, resid, *, axis_name="seq"):
    """Fused GP log-likelihood on sequence-sharded inputs.

    Must run inside ``shard_map`` with ``t (B,)``, ``a (B,)``,
    ``U/V (B, J)``, ``resid (B,)`` local shards (global N = B * n_dev)
    and replicated ``c (J,)``.  Returns the replicated scalar
    log-likelihood.
    """
    B, J = U.shape
    dtype = U.dtype
    idx = lax.axis_index(axis_name)
    n_dev = lax.axis_size(axis_name)

    # ---- phase 1: boundary exchange (previous shard's last row)
    right = [(k, k + 1) for k in range(n_dev - 1)]
    t_in = lax.ppermute(t[-1], axis_name, right)
    a_in = lax.ppermute(a[-1], axis_name, right)
    u_in = lax.ppermute(U[-1], axis_name, right)
    v_in = lax.ppermute(V[-1], axis_name, right)

    is_first = idx == 0
    # previous-row arrays aligned with local rows
    t_prev = jnp.concatenate([t_in[None], t[:-1]])
    a_prev = jnp.concatenate([a_in[None], a[:-1]])
    U_prev = jnp.concatenate([u_in[None], U[:-1]])
    V_prev = jnp.concatenate([v_in[None], V[:-1]])

    dt = t - t_prev
    phi = jnp.exp(-c[None, :] * dt[:, None])
    # the very first row globally has no predecessor: identity transport
    # with zero source (phi = 0 kills the incoming element)
    phi = jnp.where(
        jnp.logical_and(is_first, jnp.arange(B)[:, None] == 0),
        jnp.zeros_like(phi),
        phi,
    )

    # ---- phase 2a: factor block maps + carry exchange
    Ab, Qb, Rb = _local_riccati_block(phi, a_prev, U_prev, V_prev)
    blocks = (
        lax.all_gather(Ab, axis_name),
        lax.all_gather(Qb, axis_name),
        lax.all_gather(Rb, axis_name),
    )
    I = jnp.eye(J, dtype=dtype)
    S_identity = (I, jnp.zeros((J, J), dtype), jnp.zeros((J, J), dtype))
    e_in = _prefix_incoming(blocks, idx, _riccati_combine, S_identity)
    S_in = e_in[1]  # map applied to S0 = 0 is the combined Q

    # ---- phase 3a: local factor from S_in
    d, W = _local_factor(S_in, (a_in, u_in, v_in), phi, a, U, V)
    ok_local = jnp.all(d > 0)
    logdet_local = jnp.sum(jnp.log(_safe(d)))

    # ---- phase 2b: solve block maps (affine) + carry exchange
    w_in = lax.ppermute(W[-1], axis_name, right)
    r_in = lax.ppermute(resid[-1], axis_name, right)
    W_prev = jnp.concatenate([w_in[None], W[:-1]])
    resid_prev = jnp.concatenate([r_in[None], resid[:-1]])

    A_el = phi[:, :, None] * (
        I[None] - jnp.einsum("nj,nk->njk", W_prev, U_prev)
    )
    b_el = phi * (W_prev * resid_prev[:, None])
    Af, bf = _local_affine_block(A_el, b_el)
    blocksF = (lax.all_gather(Af, axis_name), lax.all_gather(bf, axis_name))

    def aff_combine(acc, el):
        Aa, ba = acc
        Ae, be = el
        return Ae @ Aa, Ae @ ba + be

    F_identity = (I, jnp.zeros((J,), dtype))
    _, F_in = _prefix_incoming(blocksF, idx, aff_combine, F_identity)

    # ---- phase 3b: local solve from F_in
    def solve_body(F, inp):
        A_n, b_n, u_n, y_n = inp
        F = A_n @ F + b_n
        z = y_n - u_n @ F
        return F, z

    _, z = lax.scan(solve_body, F_in, (A_el, b_el, U, resid))
    quad_local = jnp.sum(z**2 / _safe(d))

    # ---- reduce
    logdet = lax.psum(logdet_local, axis_name)
    quad = lax.psum(quad_local, axis_name)
    ok = lax.psum(ok_local.astype(jnp.int32), axis_name) == n_dev
    n_total = B * n_dev
    ll = -0.5 * (logdet + quad + n_total * LOG2PI)
    return jnp.where(ok, ll, -jnp.inf)


def make_sharded_logdensity(
    kernel_builder,
    t,
    y,
    yerr,
    mesh: Mesh,
    *,
    seq_axis: str = "seq",
):
    """Build ``logdensity(theta)`` whose data axis is sharded over
    ``mesh[seq_axis]``.

    ``kernel_builder(theta) -> Term``.  ``t, y, yerr`` are global arrays
    whose length must divide evenly over the axis.  The returned
    function is jit/grad-compatible and replicated in theta.
    """
    from jax import shard_map
    import numpy as np

    # numpy (not device) arrays: the returned closure is jitted by the
    # caller, and concrete closure values must become HLO literals —
    # device-array constants cost ~40 ms/call on the axon TPU runtime
    t = np.asarray(t)
    y = np.asarray(y)
    yerr = np.broadcast_to(np.asarray(yerr), t.shape)

    seq_spec = P(seq_axis)
    rep = P()

    def logdensity(theta):
        kernel = kernel_builder(theta)
        c, a, U, V = kernel.get_celerite_matrices(t, yerr**2)
        resid = y  # mean handled by the caller via kernel_builder

        fn = shard_map(
            lambda tt, aa, UU, VV, rr, cc: sharded_loglik(
                tt, cc, aa, UU, VV, rr, axis_name=seq_axis
            ),
            mesh=mesh,
            in_specs=(seq_spec, seq_spec, seq_spec, seq_spec, seq_spec, rep),
            out_specs=rep,
        )
        return fn(t, a, U, V, resid, c)

    return logdensity
