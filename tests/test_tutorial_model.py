"""Posterior parity on the reference tutorial model.

The reference validates posteriors by running the same model through
emcee / PyMC / numpyro and comparing (first.ipynb "Comparison" cells);
none of those stacks can run here, so parity is established
cross-METHOD: the built-in NUTS and the fleet ChEES-HMC sampler must
agree on the tutorial posterior within Monte-Carlo error, and MAP must
sit inside the posterior bulk.  benchmarks/configs.py runs the full
version; this test runs a reduced-draw variant as a CPU regression.
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from benchmarks.configs import tutorial_data, tutorial_logpost  # noqa: E402

from celerite2_tpu.inference import (  # noqa: E402
    effective_sample_size,
    fit_map,
    run_hmc,
    run_nuts,
    split_rhat,
)


def test_tutorial_posterior_cross_method():
    t, yerr, y = tutorial_data()
    assert len(t) == 125  # the quickstart's exact data size
    logpost = tutorial_logpost(t, yerr, y)

    init = jnp.asarray(
        [0.0, 0.0, 0.0, np.log(10.0), 0.0, np.log(5.0), np.log(0.01)]
    )
    res_map = fit_map(logpost, init, num_steps=400)
    assert np.isfinite(float(res_map.log_prob))

    nuts = run_nuts(
        logpost,
        res_map.params,
        jax.random.PRNGKey(34923),
        num_warmup=300,
        num_samples=300,
        num_chains=2,
        max_depth=8,
    )
    assert float(jnp.mean(nuts.diverging)) < 0.1
    assert np.all(np.asarray(split_rhat(nuts.samples)) < 1.2)

    hmc = run_hmc(
        logpost,
        res_map.params,
        jax.random.PRNGKey(777),
        num_warmup=800,
        num_samples=600,
        num_chains=16,
        max_leapfrog=128,
    )
    # log_tau is weakly identified (tau ~ the baseline length): allow
    # slightly slower mixing than NUTS on the reduced budget
    assert np.all(np.asarray(split_rhat(hmc.samples)) < 1.3)

    qn = np.asarray(nuts.samples).reshape(-1, 7)
    qh = np.asarray(hmc.samples).reshape(-1, 7)

    # cross-method agreement within MC error: mean difference small
    # relative to the posterior sd, sds within 35%
    sd = qn.std(axis=0)
    assert np.all(np.abs(qn.mean(axis=0) - qh.mean(axis=0)) < 0.6 * sd), (
        qn.mean(axis=0),
        qh.mean(axis=0),
        sd,
    )
    ratio = qh.std(axis=0) / sd
    assert np.all((ratio > 0.65) & (ratio < 1.55)), ratio

    # MAP sits inside the posterior bulk
    lo, hi = np.percentile(qn, [0.5, 99.5], axis=0)
    p = np.asarray(res_map.params)
    assert np.all(p > lo - 0.5) and np.all(p < hi + 0.5), (lo, p, hi)

    # the quasi-periodic component is actually constrained: rho1
    # posterior concentrates near the ~2.1-day wiggle period
    rho1 = np.exp(qn[:, 2])
    assert 1.0 < np.median(rho1) < 4.0
