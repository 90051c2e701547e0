"""Sweep ``engine_block`` (the structured reverse flows' sequential
block length) with planes on/off, timing loglik fwd+rev in-graph.

Round-4 decomposition (probe_decompose_tpu.py) found the reverse
sweeps dominate loglik+grad: the structured suffix engines run
2 x engine_block sequential ``lax.scan`` steps per flow (phases A/C),
~2.5-3.5 us each, while phase B (block-map composition) is nearly free
once it rides the planes kernel.  engine_block=32 was tuned in round 2
for the GENERIC engine, where phase B cost grew as blocks shrank; with
planes, a shorter block should trade ~free phase-B work for fewer
sequential steps.

Usage: timeout 3600 python -u benchmarks/probe_block_tpu.py [N] [CHAIN]
"""

import sys
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(N=100_000, chain=400):
    from celerite2_tpu import get_config, set_config, terms
    from celerite2_tpu.gp import gp_loglik

    rng = np.random.default_rng(42)
    t = jnp.asarray(np.sort(rng.uniform(0, 1000, N)), jnp.float32)
    yerr = jnp.full(N, 0.25, t.dtype)
    y = jnp.asarray(
        np.sin(0.7 * np.asarray(t)) + 0.25 * rng.normal(size=N), t.dtype
    )
    theta = jnp.log(jnp.asarray([1.0, 5.0, 3.0], t.dtype))
    args = (theta, t, yerr, y)

    def ll(th, t, yerr, y):
        k = terms.SHOTerm(
            sigma=jnp.exp(th[0]), rho=jnp.exp(th[1]), tau=jnp.exp(th[2])
        )
        return gp_loglik(k, t, y, yerr=yerr)

    def many(th, t, yerr, y):
        def body(cr, _):
            v, g = jax.value_and_grad(ll)(cr, t, yerr, y)
            return cr + 1e-9 * g, v

        _, vs = jax.lax.scan(body, th, None, length=chain)
        return vs[-1]

    prior = get_config()
    try:
        for mode in ("on", "off"):
            for blk in (8, 16, 32, 64):
                set_config(
                    planes=mode, backend="assoc", engine_block=blk
                )
                fn = jax.jit(many)
                t0 = time.time()
                v = np.asarray(jax.block_until_ready(fn(*args)))
                comp = time.time() - t0
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    v = np.asarray(jax.block_until_ready(fn(*args)))
                    best = min(best, time.perf_counter() - t0)
                print(
                    f"planes={mode} block={blk}: "
                    f"{best / chain * 1e3:.3f} ms/eval"
                    f"  (compile {comp:.0f}s, ll={float(v):.4f})",
                    flush=True,
                )
    finally:
        set_config(**prior.__dict__)


if __name__ == "__main__":
    a = sys.argv[1:]
    main(
        int(float(a[0])) if len(a) > 0 else 100_000,
        int(a[1]) if len(a) > 1 else 400,
    )
