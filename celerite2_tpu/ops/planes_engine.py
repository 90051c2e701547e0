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

BATCHING (vmap over chains): blocks are independent at level 0, so a
batch axis simply means MORE blocks — chain c's block b rides global
block index c * NB + b on the same lane/tile axis, and the level-1
recursion + distribute run per-chain on (C, NB) planes (elementwise,
so they batch for free).  Exposed through ``jax.custom_batching
.custom_vmap`` so ``vmap(gp_loglik)`` folds chains into the kernel's
lane axis instead of relying on pallas auto-batching around the
sequential scratch carry.  (Only ONE vmap level is intercepted;
doubly-vmapped calls fall back to pallas auto-batching —
parity-pinned by tests/test_planes.py::test_doubly_vmapped_factor_parity.)

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

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["prefix_planes", "planes_enabled", "planes_wanted"]

# Below _LEAF the Hillis-Steele doubling prefix (log2(N) full-width
# elementwise combines in plain XLA) replaces a pallas level: its
# N log N work is trivial at this size while its graph is log(N) x
# combine.  2048 means the N/L block maps of a single level-1 kernel
# are always HS-composed — exactly ONE pallas level for any N <= 2M.
# Tests shrink this to force the kernel + recursion paths at small N.
_LEAF = 2048
_LANES = 128
_SUBS = 8


def planes_enabled() -> bool:
    """True when planes routing is force-enabled (``planes='on'``):
    engages the engine for both unbatched and vmapped traces
    (interpret mode off-TPU; vmap via the custom_vmap batch-folding
    rule).  The shipping default is ``'auto'`` — see
    :func:`planes_wanted` for the measured per-flow rule."""
    from celerite2_tpu.config import get_config

    return getattr(get_config(), "planes", "auto") == "on"


def planes_wanted(spec, elems) -> bool:
    """Per-flow routing decision for the planes engine.

    'on'/'off' force globally.  'auto' applies the round-4 TPU A/B
    decision rule (benchmarks/probe_planes_tpu.py, pre-registered in
    benchmarks/ANALYSIS_planes.md): the engine wins only for UNBATCHED
    traces of element families with few planes —

    - J=2 loglik+grad: 1.44x the generic engine (N=1e5, in-graph);
    - J=4 (48-plane riccati): 0.77x — the fat combine turns level-0
      compute-bound;
    - vmapped fleets: 0.70x (C=32, N=3e4) — level-0 must run
      C*N/1024 sequential tile combines while the generic engine
      batches chains inside ~100 fat scan steps.

    So: TPU, not under vmap (BatchTracer leaves), and
    len(spec.identity_scalars) <= config.planes_max_planes.
    """
    from celerite2_tpu.config import get_config

    mode = getattr(get_config(), "planes", "auto")
    if mode == "on":
        return True
    if mode == "off":
        return False
    if jax.default_backend() != "tpu":
        return False
    if len(spec.identity_scalars) > get_config().planes_max_planes:
        return False
    return not any(
        _under_vmap(x) for x in jax.tree_util.tree_leaves(elems)
    )


def _under_vmap(x) -> bool:
    try:
        from jax._src.interpreters.batching import BatchTracer
    except ImportError:  # pragma: no cover - moved across jax versions
        return False
    return isinstance(x, BatchTracer)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _kernel(el_ref, out_ref, acc_ref, *, treedef, combine, E, idents,
            chunk, python_loop=False):
    """CHUNKED level-0 body: one grid step runs ``chunk`` sequential
    combines via an internal ``fori_loop`` over the VMEM-resident
    slab, with the running accumulator carried as VALUES (registers)
    and only the cross-grid-step carry in VMEM scratch.

    Round-4 measurement behind this shape: one Pallas grid step costs
    ~2.5 us — the same dispatch floor as a ``lax.scan`` step — so the
    round-3 one-step-per-grid-index kernel was exactly as
    step-overhead-bound as the generic engine it replaces (measured
    1.32 vs 1.38 ms/eval at N=1e5, J=2).  Chunking amortizes that
    floor ``chunk``-fold; the inner combine is ~150 VPU ops on (8,128)
    tiles (~0.2 us), so grid overhead drops from ~100 x 2.5 us to
    ~L/chunk x 2.5 us per level-0 pass.
    """
    lc = pl.program_id(1)

    @pl.when(lc == 0)
    def _():
        # the monoid identity is a TRUE two-sided identity (the same
        # scalars pad blocks and shift into the leaf doubling scan),
        # so the first real element passes through combine unchanged
        for e in range(E):
            acc_ref[e] = jnp.full(
                acc_ref.shape[1:], idents[e], acc_ref.dtype
            )

    def step(i, acc):
        el = tuple(el_ref[0, i, e] for e in range(E))
        new = tuple(
            jax.tree_util.tree_leaves(
                combine(
                    jax.tree_util.tree_unflatten(treedef, acc),
                    jax.tree_util.tree_unflatten(treedef, el),
                )
            )
        )
        for e in range(E):
            out_ref[0, i, e] = new[e]
        return new

    acc = tuple(acc_ref[e] for e in range(E))
    if python_loop:
        # interpret mode: a fori_loop would be re-traced/compiled per
        # eager grid step (pathologically slow on the CPU test path);
        # a Python loop has identical semantics
        for i in range(chunk):
            acc = step(i, acc)
    else:
        acc = jax.lax.fori_loop(0, chunk, step, acc)
    for e in range(E):
        acc_ref[e] = acc[e]


def _pad_last(x, n, value):
    if n == 0:
        return x
    fill = jnp.full(x.shape[:-1] + (n,), value, x.dtype)
    return jnp.concatenate([x, fill], axis=-1)


def _pick_chunk(E, s, L, interpret):
    """Steps per grid index: amortize the ~2.5 us grid-step floor over
    as many inner combines as fit a ~1 MB input slab (double-buffered
    in + out stay well inside VMEM even for the fattest J=4 families),
    capped so short loops don't pad excessively.

    Interpret mode (the CPU test path) pins chunk=1: there the kernel
    body is traced into the enclosing XLA:CPU module, and a chunk of
    unrolled wide-J combines multiplies an already ~40k-op module
    chunk-fold (measured: test_wide_j_riccati_parity goes from minutes
    to >30 min).  Chunk>1 semantics (incl. the identity-row padding)
    are covered by a dedicated cheap test that monkeypatches this
    function (tests/test_planes.py::test_chunked_padding_parity)."""
    if interpret:
        return 1
    bytes_per_step = E * s * _LANES * 4
    c = max(8, min(64, (1 << 20) // max(1, bytes_per_step)))
    c = 1 << (int(c).bit_length() - 1)  # floor to a power of two
    while c > 8 and c >= 2 * L:
        c //= 2
    return int(c)


class _SlabGeom:
    """Geometry of the level-0 slab for (B, N) planes split into NB
    blocks of L rows: global block GB = B*NB rides (tile t, sublane s,
    lane) = (g // 1024, (g % 1024) // 128, g % 128); the L axis is
    chunked for the kernel grid."""

    def __init__(self, E, B, N, L, NB, interpret):
        self.E, self.B, self.N, self.L, self.NB = E, B, N, L, NB
        self.GB = B * NB
        self.T = -(-self.GB // (_SUBS * _LANES))
        self.s = _SUBS if self.T > 1 else -(-self.GB // _LANES)
        self.TOT = self.T * self.s * _LANES
        self.chunk = _pick_chunk(E, self.s, L, interpret)
        self.LP = -(-L // self.chunk) * self.chunk


def _pack_slab(g, flat, idents):
    """(B, N) planes -> ONE (T, LP, E, s, 128) slab in four fat ops
    (stack, two identity-pad concats, one transpose) instead of ~4 ops
    PER PLANE — the per-plane form was measured dispatch-bound at ~0.16
    ms/eval for a 12-plane pass (probe_planes_glue_tpu.py, round 5),
    i.e. most of the engine's cost was XLA op overhead in layout prep."""
    dtype = flat[0].dtype
    x = jnp.stack(flat, axis=0)  # (E, B, N)
    iv = jnp.asarray(list(idents), dtype)
    pad_rows = g.NB * g.L - g.N
    if pad_rows:
        # identity rows pad the tail of the last block: two-sided
        # identity => exact no-ops on the running prefix
        x = jnp.concatenate(
            [
                x,
                jnp.broadcast_to(
                    iv[:, None, None], (g.E, g.B, pad_rows)
                ),
            ],
            axis=-1,
        )
    x = x.reshape(g.E, g.GB, g.L)
    if g.TOT > g.GB:
        x = jnp.concatenate(
            [
                x,
                jnp.broadcast_to(
                    iv[:, None, None], (g.E, g.TOT - g.GB, g.L)
                ),
            ],
            axis=1,
        )
    x = x.reshape(g.E, g.T, g.s, _LANES, g.L)
    x = jnp.transpose(x, (1, 4, 0, 2, 3))  # (T, L, E, s, 128)
    if g.LP > g.L:
        # identity steps beyond L: exact no-ops on the running prefix
        x = jnp.concatenate(
            [
                x,
                jnp.broadcast_to(
                    iv[None, None, :, None, None],
                    (g.T, g.LP - g.L, g.E, g.s, _LANES),
                ),
            ],
            axis=1,
        )
    return x


def _unpack_slab(g, slab_planes):
    """List of E' (T, LP, s, 128) planes -> list of (B, N) planes, via
    one stack + one transpose (the inverse of :func:`_pack_slab`)."""
    x = jnp.stack(slab_planes, axis=0)  # (E', T, LP, s, 128)
    x = jnp.transpose(x[:, :, : g.L], (0, 1, 3, 4, 2))
    x = x.reshape(x.shape[0], g.TOT, g.L)[:, : g.GB]
    x = x.reshape(x.shape[0], g.B, g.NB * g.L)[..., : g.N]
    return [x[e] for e in range(x.shape[0])]


def _pack_blocks(g, flat, idents):
    """(B, NB) per-block planes -> (T, 1, s, 128) slab planes (the
    exclusive block prefixes, broadcast against the LP axis in the
    slab-resident distribute).  Tiny arrays (~N/L elements)."""
    out = []
    for x, iv in zip(flat, idents):
        x = x.reshape(g.GB)
        if g.TOT > g.GB:
            x = jnp.concatenate(
                [x, jnp.full((g.TOT - g.GB,), iv, x.dtype)]
            )
        out.append(x.reshape(g.T, 1, g.s, _LANES))
    return out


def _block_prefix_kernel(flat, idents, treedef, combine, L, NB):
    """In-block inclusive prefixes of (B, N) planes via one pallas call.

    Chain c's block b rides global block index c * NB + b on the
    lane/tile axis (all level-0 blocks are independent).  The L axis is
    processed ``chunk`` steps per grid index (see :func:`_kernel`).
    Returns (geometry, within-block prefix slab planes as E
    (T, LP, s, 128) arrays, block maps as (B, NB) planes)."""
    E = len(flat)
    B, N = flat[0].shape
    dtype = flat[0].dtype
    g = _SlabGeom(E, B, N, L, NB, _interpret())
    slab = _pack_slab(g, flat, idents)

    kern = functools.partial(
        _kernel, treedef=treedef, combine=combine, E=E,
        idents=tuple(idents), chunk=g.chunk, python_loop=_interpret(),
    )
    out = pl.pallas_call(
        kern,
        grid=(g.T, g.LP // g.chunk),
        in_specs=[
            pl.BlockSpec(
                (1, g.chunk, E, g.s, _LANES),
                lambda t, lc: (t, lc, 0, 0, 0),
            )
        ],
        out_specs=pl.BlockSpec(
            (1, g.chunk, E, g.s, _LANES), lambda t, lc: (t, lc, 0, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct(slab.shape, dtype),
        scratch_shapes=[pltpu.VMEM((E, g.s, _LANES), dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")
        ),
        interpret=_interpret(),
    )(slab)

    prefixes = [out[:, :, e] for e in range(E)]  # (T, LP, s, 128) each
    xm = jnp.transpose(out[:, L - 1], (1, 0, 2, 3))  # (E, T, s, 128)
    xm = xm.reshape(E, g.TOT)[:, : g.GB].reshape(E, B, NB)
    maps = [xm[e] for e in range(E)]
    return g, prefixes, maps


def _leaf_scan(flat, idents, treedef, combine):
    """Hillis–Steele doubling prefix for the recursion bottom, along
    the last axis of (B, N) planes.

    log2(N) levels, each ONE full-width elementwise combine over the
    plane arrays (shift-in identity, combine with self).  Work is
    N log N instead of the two-level's ~2N, but N <= _LEAF here so the
    extra flops are nil — while the *graph size* is log(N) x combine
    instead of N x combine, which is what keeps XLA compile time sane
    for fat combines (an unrolled J=4 Riccati leaf is a ~40k-op module
    that takes XLA:CPU tens of minutes)."""
    N = flat[0].shape[-1]
    k = 1
    while k < N:
        shifted = tuple(
            jnp.concatenate(
                [jnp.full(x.shape[:-1] + (k,), iv, x.dtype), x[..., :-k]],
                axis=-1,
            )
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
    """Two-level prefixes of (B, N) planes (B = folded batch)."""
    B, N = flat[0].shape
    if N <= _LEAF:
        return _leaf_scan(flat, idents, treedef, combine)

    # one-tile level-0: L chosen so all (global) blocks fit a single
    # (8, 128) tile set; sequential grid steps = T * L ~= B*N / 1024
    L = max(8, min(N, -(-(B * N) // (_SUBS * _LANES))))
    NB = -(-N // L)

    g, prefixes, maps = _block_prefix_kernel(
        flat, idents, treedef, combine, L, NB
    )

    incl = _two_level(maps, idents, treedef, combine, combine)
    # exclusive block prefixes: shift right along blocks, identity first
    excl = [
        jnp.concatenate(
            [jnp.full((B, 1), iv, x.dtype), x[:, :-1]], axis=-1
        )
        for x, iv in zip(incl, idents)
    ]
    # distribute IN SLAB LAYOUT: the exclusive block prefix is constant
    # within a block, i.e. constant along the slab's LP axis — a (T, 1,
    # s, 128) broadcast against the (T, LP, s, 128) prefixes, fused by
    # XLA into the combine, where the (B, N)-layout formulation needed a
    # materializing jnp.repeat per plane.  Only the combined output
    # makes the (one batched) trip back to (B, N) layout.
    excl_slab = _pack_blocks(g, excl, idents)
    full = distribute(
        jax.tree_util.tree_unflatten(treedef, tuple(excl_slab)),
        jax.tree_util.tree_unflatten(treedef, tuple(prefixes)),
    )
    full_planes = [
        jnp.broadcast_to(x, (g.T, g.LP, g.s, _LANES))
        for x in jax.tree_util.tree_leaves(full)
    ]
    return _unpack_slab(g, full_planes)


def _make_core(idents, treedef, combine, distribute):
    """custom_vmap boundary: the logical computation is over (N,)
    planes; a vmap folds its batch axis into the kernel's block/lane
    axis via the rule (chains are just more independent blocks)."""

    @jax.custom_batching.custom_vmap
    def core(*flat):
        out = _two_level(
            [x[None] for x in flat], idents, treedef, combine, distribute
        )
        return tuple(x[0] for x in out)

    @core.def_vmap
    def _core_vmap(axis_size, in_batched, *flat):
        flat = [
            x
            if b
            else jnp.broadcast_to(x, (axis_size,) + x.shape)
            for x, b in zip(flat, in_batched)
        ]
        out = _two_level(list(flat), idents, treedef, combine, distribute)
        return tuple(out), tuple(True for _ in out)

    return core


def prefix_planes(spec, elems, *, reverse=False):
    """Inclusive prefix composition of array-laid-out ``elems`` through
    the planes engine.  Drop-in twin of ``two_level_prefix`` for
    element families with a :class:`~celerite2_tpu.ops.planes.PlanesSpec`;
    the distribute phase uses ``spec.distribute`` (same validity
    contract as ``two_level_prefix``'s ``distribute_combine``).
    vmap-compatible (one level): the batch axis folds into the kernel's
    block/lane axis."""
    planes = spec.to_planes(elems)
    flat, treedef = jax.tree_util.tree_flatten(planes)
    flat = [jnp.asarray(x) for x in flat]
    if reverse:
        flat = [x[::-1] for x in flat]
    core = _make_core(
        spec.identity_scalars, treedef, spec.combine, spec.distribute
    )
    out = list(core(*flat))
    if reverse:
        out = [x[::-1] for x in out]
    return spec.from_planes(
        jax.tree_util.tree_unflatten(treedef, tuple(out))
    )
