"""EXPERIMENTAL: Pallas kernel for the in-block affine prefix scan.

Status (measured, v5e, N=1e5): NOT faster than the generic two-level
engine — ~320-510 us/pass vs ~255-275 us/pass generic at D=2..4 — so
it is not wired into dispatch.  The hypothesis was that the level-1
`lax.scan` per-step overhead (~2 us) dominates; it does, but the naive
in-kernel contraction processes the D^2 map rows as single-sublane
(1, 128) ops, wasting 7/8 of the VPU, and the sequentially-executed
lane tiles eat the difference.  A win would need full-(8, 128)-tile
inner steps (sublane-gather contraction patterns), which Pallas TPU
cannot express cheaply today (no scatter/gather lowering).  Kept as a
correct, tested reference for a future attempt; see
benchmarks/RESULTS.md.

Design: for AFFINE elements ``x -> A x + b`` — the solve forward, the
solve reverse sweep, and the dense factor-reverse flows — the
composition is a few multiply-adds per (D, D) map, so one Pallas kernel
runs the whole in-block scan with the loop ON-CORE: blocks ride the 128
lanes, the D^2 map entries ride sublanes, and the D^3 contraction is a
static unroll of row multiply-adds.

Layout contract (the caller transposes): elements arrive as
``A (L, D*D, NBp)``, ``b (L, D*K, NBp)`` with NBp a multiple of 128
(lane tiles); outputs are the INCLUSIVE prefixes in the same layout,
where prefix l = combine(elements 0..l) and combine(earlier, later) =
(A_later @ A_earlier, A_later @ b_earlier + b_later) — matching
``ops.assoc._mat_affine_combine`` with time running along L.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["affine_prefix_blocks", "two_level_prefix_affine"]

_LANES = 128


def _compose_rows(elA, accA, accb, elb, D, K):
    """One combine on row-major (D*D, TB)/(D*K, TB) stacks:
    new = el AFTER acc (A_el @ A_acc, A_el @ b_acc + b_el)."""
    rowsA = []
    for i in range(D):
        for j in range(D):
            s = elA[i * D] * accA[j]
            for k in range(1, D):
                s = s + elA[i * D + k] * accA[k * D + j]
            rowsA.append(s)
    rowsb = []
    for i in range(D):
        for m in range(K):
            s = elA[i * D] * accb[m]
            for k in range(1, D):
                s = s + elA[i * D + k] * accb[k * K + m]
            rowsb.append(s + elb[i * K + m])
    return jnp.stack(rowsA), jnp.stack(rowsb)


def _affine_kernel(A_ref, b_ref, Aout_ref, bout_ref, *, L, D, K):
    DD = D * D
    DK = D * K
    TB = A_ref.shape[-1]
    # identity map rows: row i*D+i = i*(D+1) is 1 (no scatter — Pallas
    # TPU has no scatter lowering; an iota mask is elementwise)
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (DD, TB), 0)
    eye_rows = jnp.where(row_idx % (D + 1) == 0, 1.0, 0.0).astype(
        A_ref.dtype
    )
    accb0 = jnp.zeros((DK, TB), b_ref.dtype)

    def body(l, carry):
        accA, accb = carry
        elA = A_ref[l]
        elb = b_ref[l]
        newA, newb = _compose_rows(elA, accA, accb, elb, D, K)
        Aout_ref[l] = newA
        bout_ref[l] = newb
        return newA, newb

    jax.lax.fori_loop(0, L, body, (eye_rows, accb0))


def affine_prefix_blocks(A, b, D, K, interpret=False):
    """Inclusive in-block prefixes of affine elements.

    ``A (L, D*D, NBp)``, ``b (L, D*K, NBp)`` (NBp % 128 == 0) ->
    prefixes in the same layout.
    """
    L = A.shape[0]
    NBp = A.shape[-1]
    grid = (NBp // _LANES,)
    kern = functools.partial(_affine_kernel, L=L, D=D, K=K)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((L, D * D, _LANES), lambda i: (0, 0, i)),
            pl.BlockSpec((L, D * K, _LANES), lambda i: (0, 0, i)),
        ],
        out_specs=[
            pl.BlockSpec((L, D * D, _LANES), lambda i: (0, 0, i)),
            pl.BlockSpec((L, D * K, _LANES), lambda i: (0, 0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(A.shape, A.dtype),
            jax.ShapeDtypeStruct(b.shape, b.dtype),
        ],
        interpret=interpret,
    )(A, b)


def _to_lanes(x, L, NB, rows):
    """(L, NB, ...) -> (L, rows, NBp) with NB padded to lane tiles."""
    x = x.reshape(L, NB, rows)
    pad = (-NB) % _LANES
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    return jnp.swapaxes(x, 1, 2)


def _from_lanes(x, NB):
    """(L, rows, NBp) -> (L, NB, rows)."""
    return jnp.swapaxes(x, 1, 2)[:, :NB]


def two_level_prefix_affine(A, b, *, block=None, reverse=False,
                            interpret=None):
    """Drop-in twin of ``two_level_prefix(_mat_affine_combine, (A, b))``
    with the level-1 in-block scan running as a Pallas kernel.

    ``A (N, D, D)``, ``b (N, D, K)``.  Levels above the blocks recurse
    through the generic engine (tiny), and the distribute phase is one
    fat batched combine.
    """
    from celerite2_tpu.config import get_config
    from celerite2_tpu.ops.assoc import (
        _id_affine,
        _mat_affine_combine,
        two_level_prefix,
    )

    if reverse:
        out = two_level_prefix_affine(
            A[::-1], b[::-1], block=block, interpret=interpret
        )
        return out[0][::-1], out[1][::-1]

    if block is None:
        block = get_config().engine_block
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    N, D, _ = A.shape
    K = b.shape[-1]
    L = min(block, N) or 1
    NB = -(-N // L)
    pad = L * NB - N
    if pad:
        eye = jnp.broadcast_to(jnp.eye(D, dtype=A.dtype), (pad, D, D))
        A = jnp.concatenate([A, eye], axis=0)
        b = jnp.concatenate(
            [b, jnp.zeros((pad, D, K), b.dtype)], axis=0
        )

    # time-major within blocks: (N,) -> (NB, L) -> (L, NB)
    A_lm = jnp.swapaxes(A.reshape(NB, L, D, D), 0, 1)
    b_lm = jnp.swapaxes(b.reshape(NB, L, D, K), 0, 1)

    A_ln = _to_lanes(A_lm, L, NB, D * D)
    b_ln = _to_lanes(b_lm, L, NB, D * K)
    Ap_ln, bp_ln = affine_prefix_blocks(A_ln, b_ln, D, K, interpret)
    A_pref = _from_lanes(Ap_ln, NB).reshape(L, NB, D, D)
    b_pref = _from_lanes(bp_ln, NB).reshape(L, NB, D, K)

    # block maps -> recurse (generic engine: NB is small)
    blockA = A_pref[-1]
    blockb = b_pref[-1]
    incA, incb = two_level_prefix(
        _mat_affine_combine, (blockA, blockb), _id_affine, block=block
    )
    exclA = jnp.concatenate(
        [jnp.broadcast_to(jnp.eye(D, dtype=A.dtype), (1, D, D)),
         incA[:-1]],
        axis=0,
    )
    exclb = jnp.concatenate(
        [jnp.zeros((1, D, K), b.dtype), incb[:-1]], axis=0
    )

    # distribute: one fat batched combine
    fullA, fullb = _mat_affine_combine(
        (jnp.broadcast_to(exclA[None], A_pref.shape),
         jnp.broadcast_to(exclb[None], b_pref.shape)),
        (A_pref, b_pref),
    )
    fullA = jnp.swapaxes(fullA, 0, 1).reshape(NB * L, D, D)[:N]
    fullb = jnp.swapaxes(fullb, 0, 1).reshape(NB * L, D, K)[:N]
    return fullA, fullb
