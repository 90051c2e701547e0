"""Benchmark: GP log-likelihood + gradient throughput (the NUTS inner
loop) at N = 1e5 on a SHOTerm kernel.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "evals/s", "vs_baseline": R}

``value``       — evals/s of the fast tier, measured IN-GRAPH: K
                  chained evaluations inside one jit, the way a
                  sampler actually consumes the log-density.  (Per-call
                  timing would mostly measure the host->TPU dispatch
                  latency, ~30 ms/call through the axon tunnel.)
``vs_baseline`` — speedup over the tier-1 sequential ``lax.scan``
                  recursion, i.e. over a faithful port of the
                  reference's single-thread algorithm
                  (forward.hpp:111-132) on the same chip, measured the
                  same way.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

import os as _os

# persistent compile cache: repeated driver invocations skip the
# 30-240 s tunnel compile where the runtime supports reuse
jax.config.update("jax_enable_compilation_cache", True)
jax.config.update(
    "jax_compilation_cache_dir",
    _os.path.join(
        _os.path.dirname(_os.path.abspath(__file__)), ".jax_cache_bench"
    ),
)


def make_fn(backend, chain_len):
    from celerite2_tpu import set_config, terms
    from celerite2_tpu.gp import gp_loglik

    # backend routing is read at TRACE time and participates in the
    # jit cache key (config fingerprint) — set it OUTSIDE the traced
    # function, or the fingerprint flip mid-trace forces a retrace on
    # the next call (i.e. inside the timed region)
    set_config(backend=backend)

    # data flows through ARGUMENTS, never closures: the axon TPU
    # runtime re-uploads closure device constants every call (~40ms)
    def ll(theta, t, yerr, y):
        kernel = terms.SHOTerm(
            sigma=jnp.exp(theta[0]),
            rho=jnp.exp(theta[1]),
            tau=jnp.exp(theta[2]),
        )
        # fused factor+solve: ONE engine pass for the forward
        return gp_loglik(kernel, t, y, yerr=yerr)

    def many(theta, t, yerr, y):
        def body(carry, _):
            v, g = jax.value_and_grad(ll)(carry, t, yerr, y)
            return carry + 1e-9 * g, v
        _, vs = jax.lax.scan(body, theta, None, length=chain_len)
        return vs[-1]

    return jax.jit(many)


def time_fn(fn, args, chain_len, *, reps, warmup=1):
    # np.asarray = host transfer of the scalar result:
    # block_until_ready alone is not a reliable barrier through the
    # axon tunnel (measured round 4: a N=1e6 chain "finished" in 26 us)
    for _ in range(warmup):
        v = np.asarray(jax.block_until_ready(fn(*args)))
    start = time.perf_counter()
    for _ in range(reps):
        v = np.asarray(jax.block_until_ready(fn(*args)))
    dt = (time.perf_counter() - start) / (reps * chain_len)
    return dt, float(v)


def _ensure_live_backend(probe_timeout=180):
    """The axon TPU tunnel can be hard-down for hours (jax.devices()
    then HANGS, not errors).  Probe it in a SUBPROCESS with a timeout
    — once the main process touches devices there is no recovery — and
    fall back to CPU so the bench still emits its JSON line (tagged
    with the platform it actually ran on)."""
    import subprocess
    import sys

    plats = jax.config.jax_platforms or _os.environ.get("JAX_PLATFORMS", "")
    if "axon" not in plats:
        return  # no tunnel in play (e.g. CI): nothing to probe
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=probe_timeout,
            capture_output=True,
        )
        ok = r.returncode == 0
    except subprocess.TimeoutExpired:
        ok = False
    if not ok:
        print(
            "# axon backend unavailable; falling back to CPU",
            file=sys.stderr,
            flush=True,
        )
        jax.config.update("jax_platforms", "cpu")


def main(smoke: bool = False):
    """Full benchmark, or ``--smoke``: a minutes-scale CI gate (small N,
    short chains, no fleet) that checks the metric pipeline end to end
    and still prints the one JSON line."""
    _ensure_live_backend()
    N = 4_096 if smoke else 100_000
    rng = np.random.default_rng(42)
    t = jnp.asarray(np.sort(rng.uniform(0, 1000, N)))
    yerr = jnp.full(N, 0.25, t.dtype)
    y = jnp.asarray(
        np.sin(0.7 * np.asarray(t)) + 0.25 * rng.normal(size=N)
    )
    theta = jnp.log(jnp.asarray([1.0, 5.0, 3.0], t.dtype))
    args = (theta, t, yerr, y)

    # the fast tier: the assoc formulations, which pick a platform-
    # appropriate engine (multi-level blocked scan on TPU, log-depth
    # lax.associative_scan elsewhere)
    # long chains amortize the ~30 ms/call axon dispatch latency so the
    # metric reflects device compute, not tunnel noise
    results = {}
    vals = {}
    # chain length must keep the ~30 ms/call tunnel dispatch below a
    # few % of the chain: at 0.28 ms/eval (round-5 fused slab) 150
    # evals carried ~40% noise; 600 carries ~15 us/eval
    plan = (
        (("scan", 2, 1), ("assoc", 10, 1))
        if smoke
        else (("scan", 2, 1), ("assoc", 600, 3))
    )
    for backend, chain_len, reps in plan:
        fn = make_fn(backend, chain_len)
        dt, val = time_fn(fn, args, chain_len, reps=reps)
        results[backend] = 1.0 / dt
        vals[backend] = val

    # sanity: both backends agree
    rel = abs(vals["scan"] - vals["assoc"]) / max(1.0, abs(vals["scan"]))
    assert rel < 1e-3, (vals, rel)

    best = max(results.values())
    baseline = results["scan"]
    payload = {
        "metric": (
            "gp_loglik_grad_evals_per_s_N4096_SHOTerm_smoke"
            if smoke
            else "gp_loglik_grad_evals_per_s_N1e5_SHOTerm"
        ),
        "value": round(best, 3),
        "unit": "evals/s",
        "vs_baseline": round(best / baseline, 3),
        "platform": jax.default_backend(),
    }
    if not smoke:
        fleet = _fleet_ess_rate()
        # headline fleet number: compile EXCLUDED (the compiled program
        # is reusable and chain-count independent; wall-with-compile
        # mixed 1.5-4 min of tunnel-dependent XLA time into a ~2 min
        # sampling measurement — the round-2..4 "regression" was mostly
        # this, see benchmarks/RESULTS.md round-5 fleet note)
        payload["ess_per_s_fleet_N3e4_C64"] = fleet["excl_compile"]
        payload["ess_per_s_fleet_incl_compile"] = fleet["incl_compile"]
        payload["fleet_min_ess"] = fleet["min_ess"]
    print(json.dumps(payload))


def _fleet_ess_rate():
    """min-ESS/s of the ChEES-HMC fleet path (64 chains, N=3e4,
    SHO-mixture), wall time including compile — the BASELINE config-3
    capability number."""
    from celerite2_tpu import GaussianProcess, set_config, terms
    from celerite2_tpu.gp import gp_loglik
    from celerite2_tpu.inference import effective_sample_size, run_hmc

    N = 30_000
    rng = np.random.default_rng(7)
    t = np.sort(rng.uniform(0, 300, N))
    yerr = np.full(N, 0.2)
    kernel = terms.SHOTerm(sigma=1.0, rho=8.0, tau=20.0) + terms.SHOTerm(
        sigma=0.6, rho=2.0, Q=0.3
    )
    gp = GaussianProcess(kernel, t=t, yerr=yerr)
    y = np.asarray(gp.sample(jax.random.PRNGKey(5)))

    tj, yj, yerrj = jnp.asarray(t), jnp.asarray(y), jnp.asarray(yerr)

    def logpost(theta):
        k = terms.SHOTerm(
            sigma=jnp.exp(theta[0]),
            rho=jnp.exp(theta[1]),
            tau=jnp.exp(theta[2]),
        ) + terms.SHOTerm(
            sigma=jnp.exp(theta[3]), rho=jnp.exp(theta[4]), Q=0.3
        )
        return gp_loglik(k, tj, yj, yerr=yerrj) - 0.5 * jnp.sum(
            (theta / 2.0) ** 2
        )

    init = jnp.asarray(
        [0.0, np.log(5.0), np.log(10.0), -0.5, np.log(3.0)], tj.dtype
    )
    # snapshot/restore the WHOLE config (ADVICE r2: don't clobber the
    # caller's assoc_threshold, and restore even on exceptions)
    from celerite2_tpu.config import get_config

    prior = get_config()
    stamps = []
    try:
        set_config(assoc_threshold=64)
        t0 = time.perf_counter()
        res = jax.block_until_ready(
            run_hmc(
                logpost,
                init,
                jax.random.PRNGKey(1),
                num_warmup=60,
                num_samples=60,
                num_chains=64,
                max_leapfrog=48,
                chunk_size=20,  # bounded device executions (CLAUDE.md)
                monitor=lambda step, stats: stamps.append(
                    time.perf_counter()
                ),
            )
        )
        wall = time.perf_counter() - t0
        ess = float(
            np.min(np.asarray(effective_sample_size(res.samples)))
        )
    finally:
        set_config(**prior.__dict__)
    # chunk 0's wall includes the one-off XLA compile; the remaining
    # chunks measure pure sampling throughput of the reusable program
    if len(stamps) > 1:
        per_chunk = (stamps[-1] - stamps[0]) / (len(stamps) - 1)
        wall_sampling = per_chunk * len(stamps)
    else:  # pragma: no cover - single-chunk fallback
        wall_sampling = wall
    return dict(
        incl_compile=round(ess / wall, 3),
        excl_compile=round(ess / wall_sampling, 3),
        min_ess=round(ess, 1),
    )


if __name__ == "__main__":
    import sys

    main(smoke="--smoke" in sys.argv[1:])
