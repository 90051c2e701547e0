"""Packed kernels compiled on TPU: correctness vs scan + bench timing.
All timings force execution via scalar outputs."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from celerite2_tpu import set_config, terms
from celerite2_tpu.gp import gp_compute, gp_log_likelihood
from celerite2_tpu.ops import pallas_packed as pp
from celerite2_tpu.ops import scan
from celerite2_tpu.testing import get_matrices

print("backend:", jax.default_backend(), flush=True)

# ---- compiled correctness at J=4 (pow2) and J=3 (padding)
for J3 in (False, True):
    kernel = (
        terms.SHOTerm(S0=5.0, w0=0.1, Q=3.45)
        + terms.RealTerm(a=1.3, c=0.4)
        if J3 else None
    )
    t, c, a, U, V, Y = get_matrices(size=3000, kernel=kernel, vector=True)
    t, c, a, U, V = map(jnp.asarray, (t, c, a, U, V))
    Y = jnp.asarray(Y)[:, None]
    d, W, S = scan.factor_scan(t, c, a, U, V)
    d2, W2, S_pair = pp.factor_packed(t, c, a, U, V)
    print(f"J3={J3} factor d maxerr:", float(jnp.max(jnp.abs(d2 - d))),
          "W maxerr:", float(jnp.max(jnp.abs(W2 - W))), flush=True)
    Z, F = scan.solve_lower_scan(t, c, U, W, Y)
    Z2, F2 = pp.solve_lower_packed(t, c, U, W, Y)
    print(f"J3={J3} solve Z maxerr:", float(jnp.max(jnp.abs(Z2 - Z))),
          flush=True)
    rng = np.random.default_rng(3)
    bd = jnp.asarray(rng.normal(size=d.shape), d.dtype)
    bW = jnp.asarray(rng.normal(size=W.shape), W.dtype)
    ref = scan.factor_rev_scan(t, c, a, U, V, d, W, S, bd, bW)
    out = pp.factor_rev_packed(t, c, a, U, V, d, W, S_pair, bd, bW)
    for r, o, name in zip(ref, out, ["bt", "bc", "ba", "bU", "bV"]):
        scale = float(jnp.max(jnp.abs(r))) + 1e-9
        print(f"  J3={J3} factor_rev {name} relerr:",
              float(jnp.max(jnp.abs(o - r))) / scale, flush=True)
    bZ = jnp.asarray(rng.normal(size=Z.shape), Z.dtype)
    refs = scan.sweep_rev_scan(t, c, U, W, Y, Z, F, bZ,
                               is_solve=True, upper=False)
    outs = pp.sweep_rev_packed(t, c, U, W, Y, Z, F, bZ,
                               is_solve=True, upper=False)
    for r, o, name in zip(refs, outs, ["bt", "bc", "bA", "bB", "bY"]):
        scale = float(jnp.max(jnp.abs(r))) + 1e-9
        print(f"  J3={J3} solve_rev {name} relerr:",
              float(jnp.max(jnp.abs(o - r))) / scale, flush=True)

# ---- loglik+grad timing
N = 100_000
rng = np.random.default_rng(42)
tt = jnp.asarray(np.sort(rng.uniform(0, 1000, N)))
yerr = jnp.full(N, 0.25, tt.dtype)
y = jnp.asarray(np.sin(0.7 * np.asarray(tt)) + 0.25 * rng.normal(size=N))
theta = jnp.log(jnp.asarray([1.0, 5.0, 3.0], tt.dtype))
set_config(backend="pallas")


def ll(th, t_, ye_, y_):
    k = terms.SHOTerm(sigma=jnp.exp(th[0]), rho=jnp.exp(th[1]),
                      tau=jnp.exp(th[2]))
    return gp_log_likelihood(gp_compute(k, t_, yerr=ye_), y_)


fn = jax.jit(jax.value_and_grad(ll))
out = jax.block_until_ready(fn(theta, tt, yerr, y))
time.sleep(0.3)
t0 = time.perf_counter()
reps = 20
for _ in range(reps):
    out = jax.block_until_ready(fn(theta, tt, yerr, y))
dt = (time.perf_counter() - t0) / reps
print(f"loglik+grad N=1e5 packed: {dt*1000:.2f}ms "
      f"ll={float(out[0]):.3f} g0={float(out[1][0]):.4f}", flush=True)
set_config(backend="auto")
