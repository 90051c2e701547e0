"""Where does the ms/eval live?  In-graph decomposition of the
loglik+grad pipeline per engine arm (planes on/off), so perf work aims
at the measured hot flow instead of the modeled one.

Round-4 motivation: chunking the planes level-0 kernel (grid steps
98 -> 7 per pass) moved J=2 loglik+grad only 1.32 -> 1.28 ms/eval,
falsifying ANALYSIS_planes.md's "level-0 grid-step overhead dominates"
model.  This probe times each stage chained in-graph (chain >= 50) to
find the real cost centers.

Usage (axon TPU, nothing else running):
    timeout 3600 python -u benchmarks/probe_decompose_tpu.py [N] [CHAIN]
"""

import sys
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _time(fn, args, chain, label):
    fn = jax.jit(fn)
    t0 = time.time()
    v = np.asarray(jax.block_until_ready(fn(*args)))
    compile_s = time.time() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        v = np.asarray(jax.block_until_ready(fn(*args)))
        best = min(best, time.perf_counter() - t0)
    print(
        f"{label}: {best / chain * 1e3:.3f} ms/eval"
        f"  (compile {compile_s:.0f}s, val={float(v):.4f})",
        flush=True,
    )
    return best / chain


def main(N=100_000, chain=400):
    from celerite2_tpu import get_config, set_config, terms
    from celerite2_tpu.gp import gp_loglik
    from celerite2_tpu.ops import api, assoc

    rng = np.random.default_rng(42)
    t = jnp.asarray(np.sort(rng.uniform(0, 1000, N)), jnp.float32)
    yerr = jnp.full(N, 0.25, t.dtype)
    y = jnp.asarray(
        np.sin(0.7 * np.asarray(t)) + 0.25 * rng.normal(size=N), t.dtype
    )
    theta = jnp.log(jnp.asarray([1.0, 5.0, 3.0], t.dtype))

    def make_kernel(th):
        return terms.SHOTerm(
            sigma=jnp.exp(th[0]), rho=jnp.exp(th[1]), tau=jnp.exp(th[2])
        )

    kern0 = make_kernel(theta)
    c0, a0, U0, V0 = kern0.get_celerite_matrices(t, yerr**2)
    d0, W0 = api.factor(t, c0, a0, U0, V0)
    Y0 = y[:, None]

    def chain_scan(step):
        """step: carry(theta-like array) -> (new_carry, scalar)."""

        def many(carry, *args):
            def body(cr, _):
                return step(cr, *args)

            out, vs = jax.lax.scan(body, carry, None, length=chain)
            return vs[-1]

        return many

    def ll_fwd(th, t, yerr, y):
        v = gp_loglik(make_kernel(th), t, y, yerr=yerr)
        return th + 1e-12 * v, v

    def ll_vag(th, t, yerr, y):
        v, g = jax.value_and_grad(
            lambda p: gp_loglik(make_kernel(p), t, y, yerr=yerr)
        )(th)
        return th + 1e-9 * g, v

    def matrices(th, t, yerr):
        c, a, U, V = make_kernel(th).get_celerite_matrices(t, yerr**2)
        s = jnp.sum(c) + jnp.sum(a) + jnp.sum(U) + jnp.sum(V)
        return th + 1e-12 * s, s

    def factor_fwd(a, t, c, U, V):
        d, W = api.factor(t, c, a, U, V)
        return a + 1e-12 * d, jnp.sum(jnp.log(d))

    def factor_vag(a, t, c, U, V):
        def f(a_):
            d, W = api.factor(t, c, a_, U, V)
            return jnp.sum(jnp.log(d)) + jnp.sum(W)

        v, g = jax.value_and_grad(f)(a)
        return a + 1e-9 * g, v

    def solve_fwd(Y, t, c, U, W):
        Z = api.solve_lower(t, c, U, W, Y)
        return Y + 1e-12 * Z, jnp.sum(Z)

    def solve_vag(Y, t, c, U, W):
        def f(Y_):
            Z = api.solve_lower(t, c, U, W, Y_)
            return jnp.sum(Z * Z)

        v, g = jax.value_and_grad(f)(Y)
        return Y + 1e-9 * g, v

    prior = get_config()
    for mode in ("off", "on"):
        set_config(planes=mode, backend="assoc")
        print(f"== planes={mode}", flush=True)
        try:
            _time(
                chain_scan(matrices), (theta, t, yerr), chain,
                f"planes={mode} matrices-only",
            )
            _time(
                chain_scan(factor_fwd), (a0, t, c0, U0, V0), chain,
                f"planes={mode} factor fwd",
            )
            _time(
                chain_scan(factor_vag), (a0, t, c0, U0, V0), chain,
                f"planes={mode} factor fwd+rev",
            )
            _time(
                chain_scan(solve_fwd), (Y0, t, c0, U0, W0), chain,
                f"planes={mode} solve_lower fwd",
            )
            _time(
                chain_scan(solve_vag), (Y0, t, c0, U0, W0), chain,
                f"planes={mode} solve_lower fwd+rev",
            )
            _time(
                chain_scan(ll_fwd), (theta, t, yerr, y), chain,
                f"planes={mode} loglik fwd",
            )
            _time(
                chain_scan(ll_vag), (theta, t, yerr, y), chain,
                f"planes={mode} loglik fwd+rev",
            )
        finally:
            set_config(**prior.__dict__)


if __name__ == "__main__":
    a = sys.argv[1:]
    main(
        int(float(a[0])) if len(a) > 0 else 100_000,
        int(a[1]) if len(a) > 1 else 400,
    )
