"""A/B the fused slab loglik pipeline against the shipping per-pass
engines on real TPU: J=2 loglik+grad, in-graph chains.

Usage: timeout 2400 python -u benchmarks/probe_slab_tpu.py [N] [CHAIN] [J]
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


def main(N=100_000, chain=1000, J=2):
    from celerite2_tpu import get_config, set_config, terms
    from celerite2_tpu.gp import gp_loglik

    rng = np.random.default_rng(42)
    t = jnp.asarray(np.sort(rng.uniform(0, 1000, N)), jnp.float32)
    yerr = jnp.full(N, 0.25, t.dtype)
    y = jnp.asarray(
        np.sin(0.7 * np.asarray(t)) + 0.25 * rng.normal(size=N), t.dtype
    )
    theta = jnp.log(jnp.asarray([1.0, 5.0, 3.0], t.dtype))

    def ll(th, t, yerr, y):
        k = terms.SHOTerm(
            sigma=jnp.exp(th[0]), rho=jnp.exp(th[1]), tau=jnp.exp(th[2])
        )
        if J == 4:
            k = k + terms.SHOTerm(
                sigma=0.5 * jnp.exp(th[0]), rho=1.1, Q=0.3
            )
        return gp_loglik(k, t, y, yerr=yerr)

    def chained(chain):
        def many(th, t, yerr, y):
            def body(carry, _):
                v, g = jax.value_and_grad(ll)(carry, t, yerr, y)
                return carry + 1e-9 * g, v

            _, vs = jax.lax.scan(body, th, None, length=chain)
            return vs[-1]

        return many

    def fwd_chained(chain):
        def many(th, t, yerr, y):
            def body(carry, _):
                v = ll(carry, t, yerr, y)
                return carry + 1e-12 * v, v

            _, vs = jax.lax.scan(body, th, None, length=chain)
            return vs[-1]

        return many

    prior = get_config()
    args = (theta, t, yerr, y)
    try:
        for mode, label in (
            ("off", "per-pass engines (planes auto)"),
            ("on", "fused slab pipeline"),
        ):
            set_config(backend="assoc", fused_slab=mode)
            _time(
                fwd_chained(chain), args, chain,
                f"slab={mode} loglik fwd       [{label}]",
            )
            _time(
                chained(chain), args, chain,
                f"slab={mode} loglik fwd+grad  [{label}]",
            )
    finally:
        set_config(**prior.__dict__)


if __name__ == "__main__":
    a = sys.argv[1:]
    main(
        int(float(a[0])) if len(a) > 0 else 100_000,
        int(a[1]) if len(a) > 1 else 1000,
        int(a[2]) if len(a) > 2 else 2,
    )
