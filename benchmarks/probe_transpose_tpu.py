"""Which mechanism moves (E, GB, L) natural-layout planes into the
level-0 kernel's (T, LP, E, s, 128) slab layout fastest on real TPU?

Round-5 context: probe_planes_glue_tpu measured the slab prep at
~0.14-0.16 ms/eval per 12-plane pass EVEN with all planes batched into
single fat XLA ops — the XLA transpose/relayout itself runs at ~7% of
HBM bandwidth for this shape, and it bookends EVERY engine pass.  Arms:

  xla-T      — one batched jnp.transpose (E,T,s,128,L)->(T,L,E,s,128)
  xla-T2d    — per-plane 2-d (GB, LP) -> (LP, GB) transposes
  pallas-T   — transpose kernel: in block (Eb,1024,128) -> XLU swapaxes
  pallas-rt  — pallas-T plus the inverse direction (round trip)
  copy       — stack+pad only (no transpose): the layout-free floor

All arms consume the same 12 (N,) planes and reduce to a scalar, chained
in-graph (chain evals inside one jit).

Usage: timeout 2400 python -u benchmarks/probe_transpose_tpu.py [N] [CHAIN]
"""

import functools
import sys
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

E = 12
SUBS = 8
LANES = 128


def _time(fn, args, chain, label):
    fn = jax.jit(fn)
    t0 = time.time()
    v = np.asarray(jax.block_until_ready(fn(*args)))
    comp = time.time() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        v = np.asarray(jax.block_until_ready(fn(*args)))
        best = min(best, time.perf_counter() - t0)
    print(
        f"{label}: {best / chain * 1e3:.3f} ms/eval"
        f"  (compile {comp:.0f}s, val={float(v):.4f})",
        flush=True,
    )
    return best / chain


def transpose_kernel(x_ref, o_ref, *, s):
    # in block (Eb, s*128, 128) -> out block (Eb, 128, s, 128)
    x = x_ref[...]
    y = jnp.swapaxes(x, 1, 2)  # (Eb, 128, s*128)
    o_ref[...] = y.reshape(y.shape[0], 128, s, 128)


def inv_transpose_kernel(x_ref, o_ref, *, s):
    # in block (Eb, 128, s, 128) -> out block (Eb, s*128, 128)
    x = x_ref[...]
    x = x.reshape(x.shape[0], 128, s * 128)
    o_ref[...] = jnp.swapaxes(x, 1, 2)


def main(N=100_000, chain=400, EB=4):
    L = max(8, min(N, -(-N // (SUBS * LANES))))
    NB = -(-N // L)
    GB = NB
    T = -(-GB // (SUBS * LANES))
    s = SUBS if T > 1 else -(-GB // LANES)
    TOT = T * s * LANES
    LP = -(-L // LANES) * LANES  # lane-aligned step axis
    print(f"N={N} L={L} NB={NB} TOT={TOT} LP={LP}", flush=True)

    rng = np.random.default_rng(0)
    flat = tuple(
        jnp.asarray(rng.normal(size=N), jnp.float32) for _ in range(E)
    )

    def pack_natural(*flat):
        x = jnp.stack(flat, axis=0)  # (E, N)
        x = jnp.concatenate(
            [x, jnp.zeros((E, NB * L - N), x.dtype)], axis=-1
        )
        x = x.reshape(E, GB, L)
        if TOT > GB:
            x = jnp.concatenate(
                [x, jnp.zeros((E, TOT - GB, L), x.dtype)], axis=1
            )
        if LP > L:
            x = jnp.concatenate(
                [x, jnp.zeros((E, TOT, LP - L), x.dtype)], axis=2
            )
        return x  # (E, TOT, LP)

    def copy_arm(*flat):
        return jnp.sum(pack_natural(*flat))

    def xla_T(*flat):
        x = pack_natural(*flat)
        x = x.reshape(E, T, s, LANES, LP)
        x = jnp.transpose(x, (1, 4, 0, 2, 3))  # (T, LP, E, s, 128)
        return jnp.sum(x)

    def xla_T2d(*flat):
        x = pack_natural(*flat)  # (E, TOT, LP)
        x = jnp.swapaxes(x, 1, 2)  # (E, LP, TOT) batched 2-d transpose
        return jnp.sum(x)

    def make_pallas_T():
        kern = functools.partial(transpose_kernel, s=s)
        return pl.pallas_call(
            kern,
            grid=(E // EB, T, LP // LANES),
            in_specs=[
                pl.BlockSpec(
                    (EB, s * LANES, LANES),
                    lambda e, t, lp: (e, t, lp),
                )
            ],
            out_specs=pl.BlockSpec(
                (EB, LANES, s, LANES), lambda e, t, lp: (e, lp, 0, 0)
            ),
            out_shape=jax.ShapeDtypeStruct((E, LP, s, LANES), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary", "arbitrary")
            ),
        )

    def pallas_T(*flat):
        x = pack_natural(*flat)
        y = make_pallas_T()(x)
        return jnp.sum(y)

    def make_pallas_inv():
        kern = functools.partial(inv_transpose_kernel, s=s)
        return pl.pallas_call(
            kern,
            grid=(E // EB, T, LP // LANES),
            in_specs=[
                pl.BlockSpec(
                    (EB, LANES, s, LANES), lambda e, t, lp: (e, lp, 0, 0)
                )
            ],
            out_specs=pl.BlockSpec(
                (EB, s * LANES, LANES), lambda e, t, lp: (e, t, lp)
            ),
            out_shape=jax.ShapeDtypeStruct((E, TOT, LP), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary", "arbitrary")
            ),
        )

    def pallas_rt(*flat):
        x = pack_natural(*flat)
        y = make_pallas_T()(x)
        z = make_pallas_inv()(y)
        return jnp.sum(z)

    def chained(step_fn):
        def many(*args):
            def body(carry, _):
                v = step_fn(carry, *args[1:])
                return carry + 1e-12 * v, v

            _, vs = jax.lax.scan(body, args[0], None, length=chain)
            return vs[-1]

        return many

    def noop_arm(*flat):
        return jnp.sum(flat[0]) + jnp.sum(flat[1])

    def sum_stacked(xs, *flat):
        return jnp.sum(xs)

    def stack_only(*flat):
        return jnp.sum(jnp.stack(flat, axis=0))

    def rowpad_only(*flat):
        x = jnp.stack(flat, axis=0)
        x = jnp.concatenate(
            [x, jnp.zeros((E, NB * L - N), x.dtype)], axis=-1
        )
        return jnp.sum(x.reshape(E, GB, L))

    xs0 = jnp.stack(flat, axis=0)
    _time(chained(noop_arm), flat, chain, "noop (2-plane sum)")
    _time(
        chained(sum_stacked), (xs0,) + flat, chain, "sum pre-stacked"
    )
    _time(chained(stack_only), flat, chain, "stack only")
    _time(chained(rowpad_only), flat, chain, "stack+rowpad")
    _time(chained(copy_arm), flat, chain, "copy (stack+pad only)")
    _time(chained(xla_T), flat, chain, "xla-T (batched 5d)")
    _time(chained(xla_T2d), flat, chain, "xla-T2d (batched 2d)")
    _time(chained(pallas_T), flat, chain, "pallas-T")
    _time(chained(pallas_rt), flat, chain, "pallas round trip")


if __name__ == "__main__":
    a = sys.argv[1:]
    main(
        int(float(a[0])) if len(a) > 0 else 100_000,
        int(a[1]) if len(a) > 1 else 400,
    )
