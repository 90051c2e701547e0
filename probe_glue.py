"""Find the 88ms: bisect the loglik pipeline at N=1e5."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from celerite2_tpu import set_config, terms, ops
from celerite2_tpu.ops import pallas_kernels as pk

N = 100_000
rng = np.random.default_rng(0)
t = jnp.asarray(np.sort(rng.uniform(0, 1000, N)), jnp.float32)
yerr2 = jnp.full(N, 0.0625, jnp.float32)
y = jnp.asarray(rng.normal(size=N), jnp.float32)
theta = jnp.log(jnp.asarray([1.0, 5.0, 3.0], jnp.float32))
set_config(backend="pallas")


def timeit(name, fn, *args):
    fn = jax.jit(fn)
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:36s} {dt*1000:8.2f}ms", flush=True)
    return out


def mk_kernel(th):
    return terms.SHOTerm(
        sigma=jnp.exp(th[0]), rho=jnp.exp(th[1]), tau=jnp.exp(th[2])
    )


# 1. just the matrices
def f1(th):
    c, a, U, V = mk_kernel(th).get_celerite_matrices(t, yerr2)
    return jnp.sum(a) + jnp.sum(U) + jnp.sum(V) + jnp.sum(c)

timeit("get_celerite_matrices", f1, theta)


# 2. matrices + pk.factor directly (no dispatch/custom_vjp)
def f2(th):
    c, a, U, V = mk_kernel(th).get_celerite_matrices(t, yerr2)
    d, W, S = pk.factor_pallas(t, c, a, U, V)
    return jnp.sum(jnp.log(jnp.where(d > 0, d, 1.0)))

timeit("matrices + pk.factor direct", f2, theta)


# 3. matrices + ops.factor (dispatch + custom_vjp + custom_vmap)
def f3(th):
    c, a, U, V = mk_kernel(th).get_celerite_matrices(t, yerr2)
    d, W = ops.factor(t, c, a, U, V)
    return jnp.sum(jnp.log(jnp.where(d > 0, d, 1.0)))

timeit("matrices + ops.factor", f3, theta)


# 4. full forward: + solve
def f4(th):
    c, a, U, V = mk_kernel(th).get_celerite_matrices(t, yerr2)
    d, W, S = pk.factor_pallas(t, c, a, U, V)
    Z, F = pk.solve_lower_pallas(t, c, U, W, y[:, None])
    safe = jnp.where(d > 0, d, 1.0)
    return -0.5 * (jnp.sum(jnp.log(safe)) + jnp.sum(Z[:, 0] ** 2 / safe))

timeit("full fwd direct pk", f4, theta)

from celerite2_tpu.gp import gp_compute, gp_log_likelihood

def f5(th):
    state = gp_compute(mk_kernel(th), t, yerr=jnp.sqrt(yerr2))
    return gp_log_likelihood(state, y)

timeit("full fwd gp_*", f5, theta)
set_config(backend="auto")
