"""Pallas planes prefix engine: the two-level blocked prefix scheme
with (a) monoid elements stored entry-planes-wise (see ``planes.py``)
and (b) the sequential level-0/leaf loops run INSIDE one Mosaic kernel.

Why: the generic ``two_level_prefix`` pays ~2.5 us of ``lax.scan``
while-loop overhead per sequential step (~400 steps/eval at N=1e5 ->
~1 ms of pure overhead, the round-2 perf wall), and its (NB, J, J)
element layout wastes >99% of each (8, 128) VPU tile.  Here each grid
step streams one (E, s, 128) slab of entry planes through a VMEM
scratch carry — the combine is a Python-unrolled chain of full-tile
elementwise ops with zero cross-lane/sublane movement, and the "loop"
is the Pallas grid (double-buffered DMA, no while-loop overhead).

Layout: element n lives at block b = n // L, step l = n % L; block b
rides tile slot (t, s, lane) = (b // 1024, (b % 1024) // 128, b % 128).
Grid (T, L) iterates l fastest; the scratch carry resets at l == 0.

The first Pallas attempt (``ops/pallas_engine.py``, deleted in round 3)
lost because its in-kernel contraction used single-sublane row ops
(measured v5e, N=1e5: ~320-510 us/pass vs ~255-275 us generic at
D=2..4 — the D^2 map rows ran as (1, 128) ops, wasting 7/8 of the
VPU); the entry-planes layout here is the sublane-gather-free
formulation it called for.  Role of the reference's sequential hot loops
(``c++/include/celerite2/internal.hpp:55-160``) at TPU register speed.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["prefix_planes", "planes_enabled"]

# Below _LEAF the Hillis-Steele doubling prefix (log2(N) full-width
# elementwise combines in plain XLA) replaces a pallas level: its
# N log N work is trivial at this size while its graph is log(N) x
# combine.  2048 means the N/L block maps of a single level-1 kernel
# are always HS-composed — exactly ONE pallas level for any N <= 2M.
# Tests shrink this to force the kernel + recursion paths at small N.
_LEAF = 2048
_LANES = 128
_SUBS = 8


def planes_enabled(vmapped: bool) -> bool:
    """Planes engine routing: 'on' forces it (interpret mode off-TPU);
    'auto' is currently OFF everywhere — the kernel is parity-verified
    in interpret mode but not yet measured on real TPU hardware (the
    axon tunnel was down when it landed); flip 'auto' to TPU+unbatched
    once hardware numbers exist.  Batched traces always use the
    generic engine (pallas batching would prepend a parallel grid dim
    around the sequential scratch carry — unproven)."""
    from celerite2_tpu.config import get_config

    mode = getattr(get_config(), "planes", "auto")
    if mode == "off" or vmapped:
        return False
    return mode == "on"


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _kernel(el_ref, out_ref, acc_ref, *, treedef, combine, E):
    el = tuple(el_ref[0, 0, e] for e in range(E))
    l = pl.program_id(1)

    @pl.when(l == 0)
    def _():
        for e in range(E):
            acc_ref[e] = el[e]

    @pl.when(l > 0)
    def _():
        acc = tuple(acc_ref[e] for e in range(E))
        new = jax.tree_util.tree_leaves(
            combine(
                jax.tree_util.tree_unflatten(treedef, acc),
                jax.tree_util.tree_unflatten(treedef, el),
            )
        )
        for e in range(E):
            acc_ref[e] = new[e]

    for e in range(E):
        out_ref[0, 0, e] = acc_ref[e]


def _pad_with(x, n, value):
    if n == 0:
        return x
    fill = jnp.full((n,), value, x.dtype)
    return jnp.concatenate([x, fill])


def _block_prefix_kernel(flat, idents, treedef, combine, L, NB):
    """In-block inclusive prefixes of (N,) planes via one pallas call.

    Returns (within-block prefixes as (NBL,) planes trimmed to NB*L,
    block maps as (NB,) planes)."""
    E = len(flat)
    dtype = flat[0].dtype
    T = -(-NB // (_SUBS * _LANES))
    s = _SUBS if T > 1 else -(-NB // _LANES)
    TOT = T * s * _LANES

    slabs = []
    for x, iv in zip(flat, idents):
        x = _pad_with(x, NB * L - x.shape[0], iv)
        x = x.reshape(NB, L).T  # (L, NB)
        x = jnp.concatenate(
            [x, jnp.full((L, TOT - NB), iv, dtype)], axis=1
        )
        slabs.append(x.reshape(L, T, s, _LANES))
    slab = jnp.stack(slabs, axis=2)  # (L, T, E, s, 128)
    slab = jnp.transpose(slab, (1, 0, 2, 3, 4))  # (T, L, E, s, 128)

    kern = functools.partial(
        _kernel, treedef=treedef, combine=combine, E=E
    )
    out = pl.pallas_call(
        kern,
        grid=(T, L),
        in_specs=[
            pl.BlockSpec(
                (1, 1, E, s, _LANES), lambda t, l: (t, l, 0, 0, 0)
            )
        ],
        out_specs=pl.BlockSpec(
            (1, 1, E, s, _LANES), lambda t, l: (t, l, 0, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct(slab.shape, dtype),
        scratch_shapes=[pltpu.VMEM((E, s, _LANES), dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")
        ),
        interpret=_interpret(),
    )(slab)

    prefixes = []
    maps = []
    for e in range(E):
        x = out[:, :, e]  # (T, L, s, 128)
        xm = x[:, L - 1].reshape(TOT)[:NB]
        maps.append(xm)
        x = jnp.transpose(x, (1, 0, 2, 3)).reshape(L, TOT)
        prefixes.append(x.T.reshape(TOT * L))
    return prefixes, maps, TOT


def _leaf_scan(flat, idents, treedef, combine):
    """Hillis–Steele doubling prefix for the recursion bottom.

    log2(N) levels, each ONE full-width elementwise combine over the
    plane arrays (shift-in identity, combine with self).  Work is
    N log N instead of the two-level's ~2N, but N <= _LEAF here so the
    extra flops are nil — while the *graph size* is log(N) x combine
    instead of N x combine, which is what keeps XLA compile time sane
    for fat combines (an unrolled J=4 Riccati leaf is a ~40k-op module
    that takes XLA:CPU tens of minutes)."""
    N = flat[0].shape[0]
    k = 1
    while k < N:
        shifted = tuple(
            jnp.concatenate([jnp.full((k,), iv, x.dtype), x[:-k]])
            for x, iv in zip(flat, idents)
        )
        new = combine(
            jax.tree_util.tree_unflatten(treedef, shifted),
            jax.tree_util.tree_unflatten(treedef, tuple(flat)),
        )
        flat = list(jax.tree_util.tree_leaves(new))
        k *= 2
    return flat


def _two_level(flat, idents, treedef, combine, distribute):
    N = flat[0].shape[0]
    if N <= _LEAF:
        return _leaf_scan(flat, idents, treedef, combine)

    # one-tile level-0: L chosen so all blocks fit a single (8, 128)
    # tile set; grid steps = T * L ~= N / 1024 regardless of the split
    L = max(8, -(-N // (_SUBS * _LANES)))
    NB = -(-N // L)

    prefixes, maps, TOT = _block_prefix_kernel(
        flat, idents, treedef, combine, L, NB
    )

    incl = _two_level(maps, idents, treedef, combine, combine)
    # exclusive block prefixes: shift right, identity first
    excl = [
        jnp.concatenate([jnp.full((1,), iv, x.dtype), x[:-1]])
        for x, iv in zip(incl, idents)
    ]
    # distribute: row n gets combine(excl[block(n)], prefix_n)
    excl_rows = [jnp.repeat(x, L)[:N] for x in excl]
    pref_rows = [x[:N] for x in prefixes]
    full = distribute(
        jax.tree_util.tree_unflatten(treedef, tuple(excl_rows)),
        jax.tree_util.tree_unflatten(treedef, tuple(pref_rows)),
    )
    return list(jax.tree_util.tree_leaves(full))


def prefix_planes(spec, elems, *, reverse=False):
    """Inclusive prefix composition of array-laid-out ``elems`` through
    the planes engine.  Drop-in twin of ``two_level_prefix`` for
    element families with a :class:`~celerite2_tpu.ops.planes.PlanesSpec`;
    the distribute phase uses ``spec.distribute`` (same validity
    contract as ``two_level_prefix``'s ``distribute_combine``)."""
    planes = spec.to_planes(elems)
    flat, treedef = jax.tree_util.tree_flatten(planes)
    flat = [jnp.asarray(x) for x in flat]
    if reverse:
        flat = [x[::-1] for x in flat]
    out = _two_level(
        flat, spec.identity_scalars, treedef, spec.combine,
        spec.distribute,
    )
    if reverse:
        out = [x[::-1] for x in out]
    return spec.from_planes(
        jax.tree_util.tree_unflatten(treedef, tuple(out))
    )
