"""MAP fitting and checkpoint/restore."""

import jax
import jax.numpy as jnp
import numpy as np

from celerite2_tpu import terms
from celerite2_tpu.gp import gp_compute, gp_log_likelihood
from celerite2_tpu.inference import fit_map, restore_state, save_state


def test_fit_map_quadratic():
    mu = jnp.asarray([1.0, -2.0, 3.0])

    def logp(x):
        return -0.5 * jnp.sum((x - mu) ** 2 * jnp.asarray([1.0, 4.0, 0.25]))

    res = fit_map(logp, jnp.zeros(3), num_steps=100)
    np.testing.assert_allclose(np.asarray(res.params), np.asarray(mu), atol=1e-6)
    assert bool(res.converged)


def test_fit_map_gp_hyperparams():
    rng = np.random.default_rng(10)
    N = 120
    t = np.sort(rng.uniform(0, 20, N))
    yerr = np.full(N, 0.3)

    import celerite2_tpu as c2

    true_kernel = terms.SHOTerm(sigma=1.2, rho=4.0, tau=3.0)
    gp = c2.GaussianProcess(true_kernel, t=t, yerr=yerr)
    y = np.asarray(gp.sample(jax.random.PRNGKey(2)))

    def logp(theta):
        k = terms.SHOTerm(
            sigma=jnp.exp(theta[0]),
            rho=jnp.exp(theta[1]),
            tau=jnp.exp(theta[2]),
        )
        return gp_log_likelihood(gp_compute(k, t, yerr=yerr), y)

    init = jnp.log(jnp.asarray([1.0, 3.0, 2.0]))
    res = fit_map(logp, init, num_steps=200)
    # MAP improves on the init and is finite
    assert float(res.log_prob) > float(logp(init))
    assert np.all(np.isfinite(np.asarray(res.params)))
    # objective increased monotonically-ish (final > first)
    tr = np.asarray(res.trace)
    assert tr[-1] >= tr[0]


def test_checkpoint_roundtrip(tmp_path):
    state = {
        "q": jnp.arange(12.0).reshape(3, 4),
        "key": jax.random.PRNGKey(0),
        "step": jnp.asarray(7),
    }
    path = str(tmp_path / "ckpt")
    save_state(path, state)
    restored = restore_state(path, template=state)
    for k in state:
        np.testing.assert_array_equal(
            np.asarray(restored[k]), np.asarray(state[k])
        )
