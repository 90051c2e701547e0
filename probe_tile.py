"""Probe: factor kernel — per-row dynamic indexing vs 8-row tile loads
with static extracts. All timings forced with scalar-sum outputs."""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from celerite2_tpu import terms

N, J = 100_000, 2
rng = np.random.default_rng(0)
t = jnp.asarray(np.sort(rng.uniform(0, 1000, N)), jnp.float32)
diag = jnp.full(N, 0.0625, jnp.float32)
kernel = terms.SHOTerm(sigma=1.0, rho=5.0, tau=3.0)
c, a, U, V = map(jnp.asarray, kernel.get_celerite_matrices(t, diag))
dt = jnp.diff(t)
phi = jnp.exp(-c[None, :] * dt[:, None])
phi = jnp.concatenate([jnp.zeros((1, J), jnp.float32), phi], axis=0)


def run(kernel_fn, B, name=""):
    NB = N // B
    row = pl.BlockSpec((B, J), lambda i: (i, 0), memory_space=pltpu.VMEM)
    col = pl.BlockSpec((B, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    cache = pl.BlockSpec((B, J, J), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    inner = jax.jit(lambda *args: pl.pallas_call(
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
        ],
    )(*args))
    fn = jax.jit(
        lambda *args: jnp.sum(inner(*args)[0]) + jnp.sum(inner(*args)[1])
    )
    # simpler: single call, sum outputs
    fn = jax.jit(lambda *args: sum(jnp.sum(o) for o in inner(*args)))
    out = jax.block_until_ready(fn(phi, a[:, None], U, V))
    time.sleep(0.2)
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        out = jax.block_until_ready(fn(phi, a[:, None], U, V))
    print(f"{name:28s} B={B:5d} run={(time.perf_counter()-t0)/reps*1000:8.2f}ms "
          f"chk={float(out):.4f}", flush=True)


def k_perrow(phi_ref, a_ref, u_ref, v_ref, d_ref, w_ref, sh_ref,
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


def make_tile(R):
    def k_tile(phi_ref, a_ref, u_ref, v_ref, d_ref, w_ref, sh_ref,
               S, dprev, wprev):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            S[...] = jnp.zeros_like(S)
            dprev[...] = jnp.zeros_like(dprev)
            wprev[...] = jnp.zeros_like(wprev)

        B = phi_ref.shape[0]

        def tile(m, _):
            base = m * R
            pt = phi_ref[pl.ds(base, R), :]
            ut = u_ref[pl.ds(base, R), :]
            vt = v_ref[pl.ds(base, R), :]
            at = a_ref[pl.ds(base, R), :]

            Sv = S[...]
            dv = dprev[...]
            wv = wprev[...]
            ds, ws, shs = [], [], []
            for r in range(R):
                p = pt[r:r + 1, :]
                u = ut[r:r + 1, :]
                v = vt[r:r + 1, :]
                a_n = at[r:r + 1, :]
                S_acc = Sv + (dv * wv).T * wv
                Sh = p.T * S_acc
                Sf = Sh * p
                tmp = jnp.sum(Sf * u, axis=1)[None, :]
                d_n = a_n - jnp.sum(u * tmp, keepdims=True)
                d_safe = jnp.where(d_n > 0, d_n, jnp.ones_like(d_n))
                w_n = (v - tmp) / d_safe
                ds.append(d_n)
                ws.append(w_n)
                shs.append(Sh)
                Sv, dv, wv = Sf, d_n, w_n

            d_ref[pl.ds(base, R), :] = jnp.concatenate(ds, axis=0)
            w_ref[pl.ds(base, R), :] = jnp.concatenate(ws, axis=0)
            sh_ref[pl.ds(base, R), :, :] = jnp.stack(shs, axis=0)
            S[...] = Sv
            dprev[...] = dv
            wprev[...] = wv
            return 0

        jax.lax.fori_loop(0, B // R, tile, 0)

    return k_tile


#skip perrow
run(make_tile(8), 1000, name="tile-8 static")
run(make_tile(16), 1000, name="tile-16 static")
run(make_tile(8), 5000, name="tile-8 static")
