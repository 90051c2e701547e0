"""Probe: pallas factor kernel variants — scratch-ref carry vs value
carry vs unrolled rows."""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, J = 100_000, 2
rng = np.random.default_rng(0)
t = jnp.asarray(np.sort(rng.uniform(0, 1000, N)), jnp.float32)
a = jnp.asarray(1.0 + rng.uniform(0.1, 0.3, N), jnp.float32)
U = jnp.asarray(rng.normal(size=(N, J)) * 0.3, jnp.float32)
V = jnp.asarray(rng.normal(size=(N, J)) * 0.3, jnp.float32)
c = jnp.asarray([0.5, 0.1], jnp.float32)
dt = jnp.diff(t)
phi = jnp.exp(-c[None, :] * dt[:, None])
phi = jnp.concatenate([jnp.zeros((1, J), jnp.float32), phi], axis=0)


def run(kernel_fn, B, extra_scratch=(), name=""):
    NB = N // B
    row = pl.BlockSpec((B, J), lambda i: (i, 0), memory_space=pltpu.VMEM)
    col = pl.BlockSpec((B, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    cache = pl.BlockSpec((B, J, J), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    fn = jax.jit(lambda *args: pl.pallas_call(
        kernel_fn,
        grid=(NB,),
        in_specs=[row, col, row, row],
        out_specs=[col, row, cache],
        out_shape=[
            jax.ShapeDtypeStruct((N, 1), jnp.float32),
            jax.ShapeDtypeStruct((N, J), jnp.float32),
            jax.ShapeDtypeStruct((N, J, J), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((J, J), jnp.float32),
            pltpu.VMEM((1, 1), jnp.float32),
            pltpu.VMEM((1, J), jnp.float32),
        ] + list(extra_scratch),
    )(*args))
    t0 = time.perf_counter()
    out = fn(phi, a[:, None], U, V)
    jax.block_until_ready(out)
    t1 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        out = fn(phi, a[:, None], U, V)
        jax.block_until_ready(out)
    t2 = time.perf_counter()
    print(f"{name:24s} B={B:5d} compile={t1-t0:6.2f}s "
          f"run={(t2-t1)/reps*1000:8.2f}ms d[0]={float(out[0][0,0]):.4f} "
          f"d[-1]={float(out[0][-1,0]):.4f}", flush=True)
    return out


# ---- variant 1: current (scratch-ref carry per row)
def k_scratch(phi_ref, a_ref, u_ref, v_ref, d_ref, w_ref, sh_ref,
              S, dprev, wprev):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        S[...] = jnp.zeros_like(S)
        dprev[...] = jnp.zeros_like(dprev)
        wprev[...] = jnp.zeros_like(wprev)

    B = phi_ref.shape[0]

    def row(n, _):
        p = phi_ref[pl.ds(n, 1), :]
        u = u_ref[pl.ds(n, 1), :]
        v = v_ref[pl.ds(n, 1), :]
        a_n = a_ref[pl.ds(n, 1), :]
        w_p = wprev[...]
        S_acc = S[...] + dprev[...] * (w_p.T * w_p)
        Sh = p.T * S_acc
        Sf = Sh * p
        tmp = jnp.sum(Sf * u, axis=1)[None, :]
        d_n = a_n - jnp.sum(u * tmp, keepdims=True)
        d_safe = jnp.where(d_n > 0, d_n, jnp.ones_like(d_n))
        w_n = (v - tmp) / d_safe
        d_ref[pl.ds(n, 1), :] = d_n
        w_ref[pl.ds(n, 1), :] = w_n
        sh_ref[pl.ds(n, 1), :, :] = Sh[None]
        S[...] = Sf
        dprev[...] = d_n
        wprev[...] = w_n
        return 0

    jax.lax.fori_loop(0, B, row, 0)


# ---- variant 2: value carry through fori
def k_value(phi_ref, a_ref, u_ref, v_ref, d_ref, w_ref, sh_ref,
            S, dprev, wprev):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        S[...] = jnp.zeros_like(S)
        dprev[...] = jnp.zeros_like(dprev)
        wprev[...] = jnp.zeros_like(wprev)

    B = phi_ref.shape[0]

    def row(n, carry):
        Sv, dv, wv = carry
        p = phi_ref[pl.ds(n, 1), :]
        u = u_ref[pl.ds(n, 1), :]
        v = v_ref[pl.ds(n, 1), :]
        a_n = a_ref[pl.ds(n, 1), :]
        S_acc = Sv + dv * (wv.T * wv)
        Sh = p.T * S_acc
        Sf = Sh * p
        tmp = jnp.sum(Sf * u, axis=1)[None, :]
        d_n = a_n - jnp.sum(u * tmp, keepdims=True)
        d_safe = jnp.where(d_n > 0, d_n, jnp.ones_like(d_n))
        w_n = (v - tmp) / d_safe
        d_ref[pl.ds(n, 1), :] = d_n
        w_ref[pl.ds(n, 1), :] = w_n
        sh_ref[pl.ds(n, 1), :, :] = Sh[None]
        return (Sf, d_n, w_n)

    Sf, d_n, w_n = jax.lax.fori_loop(
        0, B, row, (S[...], dprev[...], wprev[...])
    )
    S[...] = Sf
    dprev[...] = d_n
    wprev[...] = w_n


# ---- variant 3: value carry + unroll 8
def k_unroll(phi_ref, a_ref, u_ref, v_ref, d_ref, w_ref, sh_ref,
             S, dprev, wprev, *, UNROLL=8):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        S[...] = jnp.zeros_like(S)
        dprev[...] = jnp.zeros_like(dprev)
        wprev[...] = jnp.zeros_like(wprev)

    B = phi_ref.shape[0]

    def chunk(m, carry):
        base = m * UNROLL
        Sv, dv, wv = carry
        for r in range(UNROLL):
            n = base + r
            p = phi_ref[pl.ds(n, 1), :]
            u = u_ref[pl.ds(n, 1), :]
            v = v_ref[pl.ds(n, 1), :]
            a_n = a_ref[pl.ds(n, 1), :]
            S_acc = Sv + dv * (wv.T * wv)
            Sh = p.T * S_acc
            Sf = Sh * p
            tmp = jnp.sum(Sf * u, axis=1)[None, :]
            d_n = a_n - jnp.sum(u * tmp, keepdims=True)
            d_safe = jnp.where(d_n > 0, d_n, jnp.ones_like(d_n))
            w_n = (v - tmp) / d_safe
            d_ref[pl.ds(n, 1), :] = d_n
            w_ref[pl.ds(n, 1), :] = w_n
            sh_ref[pl.ds(n, 1), :, :] = Sh[None]
            Sv, dv, wv = Sf, d_n, w_n
        return (Sv, dv, wv)

    Sf, d_n, w_n = jax.lax.fori_loop(
        0, B // UNROLL, chunk, (S[...], dprev[...], wprev[...])
    )
    S[...] = Sf
    dprev[...] = d_n
    wprev[...] = w_n


run(k_scratch, 1000, name="scratch-carry")
run(k_value, 1000, name="value-carry")
run(k_unroll, 1000, name="value+unroll8")
run(k_value, 5000, name="value-carry")
run(k_unroll, 5000, name="value+unroll8")
