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
from celerite2_tpu.ops.assoc import (
    _bmm,
    _bmv,
    _engine_scan,
    _id_affine,
    _id_riccati,
    _mat_affine_combine,
    _riccati_combine,
    _small_inv,
)
from celerite2_tpu.ops.scan import _safe

__all__ = ["sharded_loglik", "make_sharded_logdensity"]


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

    # ---- phase 2a: local factor prefix maps (parallel engine) +
    #      block-map exchange
    I = jnp.eye(J, dtype=dtype)
    al = _safe(a_prev)[:, None, None]
    A_r = phi[:, :, None] * (
        I[None] - V_prev[:, :, None] * U_prev[:, None, :] / al
    )
    Q_r = (
        phi[:, :, None]
        * (V_prev[:, :, None] * V_prev[:, None, :] / al)
        * phi[:, None, :]
    )
    R_r = -U_prev[:, :, None] * U_prev[:, None, :] / al
    pref = _engine_scan(_riccati_combine, (A_r, Q_r, R_r), _id_riccati)
    blocks = jax.tree_util.tree_map(
        lambda x: lax.all_gather(x[-1], axis_name), pref
    )
    S_identity = (I, jnp.zeros((J, J), dtype), jnp.zeros((J, J), dtype))
    e_in = _prefix_incoming(blocks, idx, _riccati_combine, S_identity)
    S_in = e_in[1]  # map applied to S0 = 0 is the combined Q

    # ---- phase 3a: per-row state = prefix map applied to S_in
    Ap, Qp, Rp = pref
    G = _small_inv(I[None] + _bmm(Rp, jnp.broadcast_to(S_in, Rp.shape)))
    S_full = Qp + _bmm(
        _bmm(Ap, _bmm(jnp.broadcast_to(S_in, Rp.shape), G)),
        jnp.swapaxes(Ap, -1, -2),
    )
    d = a - jnp.sum(_bmv(S_full, U) * U, axis=-1)
    W = (V - _bmv(S_full, U)) / _safe(d)[:, None]
    ok_local = jnp.all(d > 0)
    logdet_local = jnp.sum(jnp.log(_safe(d)))

    # ---- phase 2b: solve prefix maps (affine) + carry exchange
    w_in = lax.ppermute(W[-1], axis_name, right)
    r_in = lax.ppermute(resid[-1], axis_name, right)
    W_prev = jnp.concatenate([w_in[None], W[:-1]])
    resid_prev = jnp.concatenate([r_in[None], resid[:-1]])

    A_el = phi[:, :, None] * (
        I[None] - W_prev[:, :, None] * U_prev[:, None, :]
    )
    b_el = phi * (W_prev * resid_prev[:, None])
    prefF = _engine_scan(
        _mat_affine_combine, (A_el, b_el[..., None]), _id_affine
    )
    blocksF = jax.tree_util.tree_map(
        lambda x: lax.all_gather(x[-1], axis_name), prefF
    )

    def aff_combine(acc, el):
        Aa, ba = acc
        Ae, be = el
        return _bmm(Ae, Aa), _bmv(Ae, ba) + be

    F_identity = (I, jnp.zeros((J,), dtype))
    _, F_in = _prefix_incoming(
        (blocksF[0], blocksF[1][..., 0]), idx, aff_combine, F_identity
    )

    # ---- phase 3b: per-row solve from F_in
    ApF, bpF = prefF
    F_post = _bmv(ApF, jnp.broadcast_to(F_in, (B, J))) + bpF[..., 0]
    z = resid - jnp.sum(U * F_post, axis=-1)
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
