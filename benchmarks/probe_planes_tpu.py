"""Real-TPU A/B probe: entry-planes Pallas prefix engine vs the
generic two-level engine, bench.py-style (in-graph chained
value_and_grad of gp_loglik).

Usage (on the axon TPU):
    timeout 1800 python -u benchmarks/probe_planes_tpu.py [N] [J] [CHAIN]

Prints one line per engine: engine, time/eval, agreement check.
"""

import sys
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(N=100_000, J=2, chain=100):
    from celerite2_tpu import get_config, set_config, terms
    from celerite2_tpu.gp import gp_loglik

    rng = np.random.default_rng(42)
    t = jnp.asarray(np.sort(rng.uniform(0, 1000, N)), jnp.float32)
    yerr = jnp.full(N, 0.25, t.dtype)
    y = jnp.asarray(
        np.sin(0.7 * np.asarray(t)) + 0.25 * rng.normal(size=N), t.dtype
    )
    theta = jnp.log(jnp.asarray([1.0, 5.0, 3.0], t.dtype))

    def make_kernel(theta):
        k = terms.SHOTerm(
            sigma=jnp.exp(theta[0]),
            rho=jnp.exp(theta[1]),
            tau=jnp.exp(theta[2]),
        )
        for j in range((J - 2) // 2):
            k = k + terms.SHOTerm(
                sigma=jnp.exp(theta[0]) * (0.5 + 0.2 * j),
                rho=jnp.exp(theta[1]) * (1.7 + j),
                Q=0.3 + 0.1 * j,
            )
        return k

    def ll(theta, t, yerr, y):
        return gp_loglik(make_kernel(theta), t, y, yerr=yerr)

    def many(theta, t, yerr, y):
        def body(carry, _):
            v, g = jax.value_and_grad(ll)(carry, t, yerr, y)
            return carry + 1e-9 * g, v

        _, vs = jax.lax.scan(body, theta, None, length=chain)
        return vs[-1]

    args = (theta, t, yerr, y)
    prior = get_config()
    out = {}
    # (off, fused) was measured neutral-to-slower on the generic engine
    # in round 2 (CLAUDE.md ledger); on planes, fusing factor+solve
    # saves one whole level-0 kernel pass (~40-55 us derived,
    # ANALYSIS_planes.md), so it gets its own arm here.
    modes = [("off", False), ("on", False), ("on", True)]
    for mode, fused in modes:
        key = f"planes={mode},fused={fused}"
        set_config(planes=mode, backend="assoc", fused_forward=fused)
        try:
            fn = jax.jit(many)
            t0 = time.time()
            v = jax.block_until_ready(fn(*args))
            print(
                f"{key}: compile+first {time.time() - t0:.0f}s",
                flush=True,
            )
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                # host transfer: block_until_ready alone is not a
                # reliable barrier through the axon tunnel
                v = np.asarray(jax.block_until_ready(fn(*args)))
                best = min(best, time.perf_counter() - t0)
            out[(mode, fused)] = (best / chain, float(v))
            print(
                f"{key}: {best / chain * 1e3:.3f} ms/eval"
                f"  loglik={float(v):.6f}",
                flush=True,
            )
        finally:
            set_config(**prior.__dict__)
    base = out[("off", False)]
    for mode, fused in modes[1:]:
        rel = abs(out[(mode, fused)][1] - base[1]) / max(1.0, abs(base[1]))
        print(
            f"planes={mode},fused={fused}: agreement rel={rel:.2e}"
            f"  speedup={base[0] / out[(mode, fused)][0]:.2f}x",
            flush=True,
        )


def main_fleet(N=30_000, C=32, chain=100):
    """Vmapped-fleet A/B: C chains of value_and_grad(gp_loglik) through
    vmap (planes: chains fold into the kernel lane axis via the
    custom_vmap rule; generic: vmapped two-level engine)."""
    from celerite2_tpu import get_config, set_config, terms
    from celerite2_tpu.gp import gp_loglik

    rng = np.random.default_rng(42)
    t = jnp.asarray(np.sort(rng.uniform(0, 1000, N)), jnp.float32)
    yerr = jnp.full(N, 0.25, t.dtype)
    y = jnp.asarray(
        np.sin(0.7 * np.asarray(t)) + 0.25 * rng.normal(size=N), t.dtype
    )
    thetas = jnp.log(
        jnp.asarray(
            rng.uniform(0.8, 4.0, size=(C, 3)), t.dtype
        )
    )

    def ll(theta, t, yerr, y):
        k = terms.SHOTerm(
            sigma=jnp.exp(theta[0]),
            rho=jnp.exp(theta[1]),
            tau=jnp.exp(theta[2]),
        )
        return gp_loglik(k, t, y, yerr=yerr)

    def many(thetas, t, yerr, y):
        def body(carry, _):
            v, g = jax.vmap(
                jax.value_and_grad(lambda th: ll(th, t, yerr, y))
            )(carry)
            return carry + 1e-9 * g, v

        _, vs = jax.lax.scan(body, thetas, None, length=chain)
        return vs[-1]

    args = (thetas, t, yerr, y)
    prior = get_config()
    out = {}
    for mode in ("off", "on"):
        set_config(planes=mode, backend="assoc")
        try:
            fn = jax.jit(many)
            t0 = time.time()
            v = jax.block_until_ready(fn(*args))
            print(
                f"fleet planes={mode}: compile+first {time.time() - t0:.0f}s",
                flush=True,
            )
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                v = np.asarray(jax.block_until_ready(fn(*args)))
                best = min(best, time.perf_counter() - t0)
            out[mode] = (best / chain, float(np.sum(v)))
            print(
                f"fleet planes={mode}: {best / chain * 1e3:.3f} ms/fleet-eval"
                f"  (C={C})  sum_ll={out[mode][1]:.4f}",
                flush=True,
            )
        finally:
            set_config(**prior.__dict__)
    rel = abs(out["on"][1] - out["off"][1]) / max(1.0, abs(out["off"][1]))
    print(
        f"fleet agreement rel={rel:.2e}"
        f"  speedup={out['off'][0] / out['on'][0]:.2f}x",
        flush=True,
    )


if __name__ == "__main__":
    a = sys.argv[1:]
    if "--cpu" in a:
        # smoke-test mode: force XLA:CPU (planes runs in interpret
        # mode); timings are then meaningless, only parity matters
        a.remove("--cpu")
        jax.config.update("jax_platforms", "cpu")
    if a and a[0] == "fleet":
        main_fleet(
            int(float(a[1])) if len(a) > 1 else 30_000,
            int(a[2]) if len(a) > 2 else 32,
            int(a[3]) if len(a) > 3 else 100,
        )
    else:
        main(
            int(float(a[0])) if len(a) > 0 else 100_000,
            int(a[1]) if len(a) > 1 else 2,
            int(a[2]) if len(a) > 2 else 100,
        )
