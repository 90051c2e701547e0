"""Per-op timing of the pallas tier at N=1e5 on TPU."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from celerite2_tpu import terms
from celerite2_tpu.ops import pallas_kernels as pk

N = 100_000
rng = np.random.default_rng(0)
t = jnp.asarray(np.sort(rng.uniform(0, 1000, N)), jnp.float32)
yerr = np.full(N, 0.25)
kernel = terms.SHOTerm(sigma=1.0, rho=5.0, tau=3.0)
c, a, U, V = kernel.get_celerite_matrices(t, jnp.asarray(yerr**2, jnp.float32))
Y = jnp.asarray(rng.normal(size=(N, 1)), jnp.float32)


def timeit(name, fn, *args):
    fn = jax.jit(fn)
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:28s} {dt*1000:8.2f}ms", flush=True)
    return out


d, W, S = timeit("factor fwd", lambda *a_: pk.factor_pallas(*a_), t, c, a, U, V)
Z, F = timeit("solve_lower fwd", lambda *a_: pk.solve_lower_pallas(*a_), t, c, U, W, Y)

bd = jnp.asarray(rng.normal(size=d.shape), jnp.float32)
bW = jnp.asarray(rng.normal(size=W.shape), jnp.float32)
bZ = jnp.asarray(rng.normal(size=Z.shape), jnp.float32)

timeit("factor rev", lambda *a_: pk.factor_rev_pallas(*a_),
       t, c, a, U, V, d, W, S, bd, bW)
timeit("solve_lower rev",
       lambda *a_: pk.sweep_rev_pallas(*a_, is_solve=True, upper=False),
       t, c, U, W, Y, Z, F, bZ)
timeit("matmul_upper fwd", lambda *a_: pk.matmul_upper_pallas(*a_),
       t, c, U, V, Y)

# full pipeline for reference
from celerite2_tpu import set_config
from celerite2_tpu.gp import gp_compute, gp_log_likelihood

set_config(backend="pallas")
y1 = Y[:, 0]

def ll(th):
    k = terms.SHOTerm(sigma=jnp.exp(th[0]), rho=jnp.exp(th[1]),
                      tau=jnp.exp(th[2]))
    state = gp_compute(k, t, yerr=jnp.asarray(yerr, jnp.float32))
    return gp_log_likelihood(state, y1)

theta = jnp.log(jnp.asarray([1.0, 5.0, 3.0], jnp.float32))
timeit("loglik fwd only", jax.jit(ll), theta)
timeit("loglik+grad", jax.jit(jax.value_and_grad(ll)), theta)
set_config(backend="auto")
