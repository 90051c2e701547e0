"""The numpyro adapter (celerite2_tpu.distributions).

numpyro is an optional dependency and absent in this image; the
placeholder must raise a clear ImportError, and the real adapter is
exercised structurally against a minimal numpyro stub so its logic has
coverage without the dependency."""

import importlib
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import celerite2_tpu as c2
from celerite2_tpu import terms


def _gp(n=64):
    rng = np.random.default_rng(0)
    t = np.sort(rng.uniform(0, 10, n))
    yerr = np.full(n, 0.2)
    y = np.sin(t)
    gp = c2.GaussianProcess(
        terms.SHOTerm(sigma=1.0, rho=3.0, tau=2.0), t=t, yerr=yerr
    )
    return gp, y


def test_placeholder_raises_without_numpyro():
    import celerite2_tpu.distributions as D

    if hasattr(D.CeleriteNormal, "support"):
        pytest.skip("real numpyro present")
    gp, y = _gp()
    with pytest.raises(ImportError, match="numpyro is not installed"):
        gp.numpyro_dist()


def test_adapter_core_without_numpyro(monkeypatch):
    """The adapter core (construction contract, event shape, sample-
    shape handling, log_prob parity) runs against the in-module
    _StubBase without touching sys.modules."""
    import celerite2_tpu.distributions as D

    if D.HAS_NUMPYRO:
        pytest.skip("real numpyro present; the real path covers this")
    monkeypatch.setattr(
        D.CeleriteNormal, "_allow_without_numpyro", True
    )
    gp, y = _gp()
    dist = D.gp_numpyro_dist(gp)
    assert dist.batch_shape == ()
    assert dist.event_shape == (len(y),)
    np.testing.assert_allclose(
        float(dist.log_prob(jnp.asarray(y))),
        float(gp.log_likelihood(y)),
        rtol=1e-12,
    )
    for shape in [(), (3,), (2, 3)]:
        s = dist.sample(jax.random.PRNGKey(0), shape)
        assert s.shape == shape + (len(y),)
        assert np.all(np.isfinite(np.asarray(s)))


def test_adapter_with_stubbed_numpyro():
    """Install a minimal numpyro stub, reload the adapter, and check
    log_prob/sample semantics; restore the placeholder afterwards."""
    dist_mod = types.ModuleType("numpyro.distributions")

    class Distribution:
        def __init__(self, batch_shape=(), event_shape=(),
                     validate_args=None):
            self.batch_shape = batch_shape
            self.event_shape = event_shape

    class constraints:
        real_vector = object()

    dist_mod.Distribution = Distribution
    dist_mod.constraints = constraints
    numpyro_mod = types.ModuleType("numpyro")
    numpyro_mod.distributions = dist_mod

    import celerite2_tpu.distributions as D

    try:
        sys.modules["numpyro"] = numpyro_mod
        sys.modules["numpyro.distributions"] = dist_mod
        D = importlib.reload(D)
        assert hasattr(D.CeleriteNormal, "support")

        gp, y = _gp()
        dist = gp.numpyro_dist()
        lp = float(dist.log_prob(jnp.asarray(y)))
        np.testing.assert_allclose(
            lp, float(gp.log_likelihood(y)), rtol=1e-12
        )
        s = dist.sample(jax.random.PRNGKey(0), (3,))
        assert s.shape == (3, len(y))
        assert np.all(np.isfinite(np.asarray(s)))
        # draws have roughly the prior scale (not degenerate)
        assert 0.1 < float(jnp.std(s)) < 10.0
    finally:
        sys.modules.pop("numpyro", None)
        sys.modules.pop("numpyro.distributions", None)
        importlib.reload(D)
