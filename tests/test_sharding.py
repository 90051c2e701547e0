"""Multi-device parity on the 8-virtual-CPU mesh.

Tier (a)+(b) from SURVEY.md section 4.3: sharded-vs-unsharded
consistency of the blocked/sharded scan, and chain-sharded NUTS."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding

from celerite2_tpu import terms
from celerite2_tpu.gp import gp_compute, gp_log_likelihood
from celerite2_tpu.parallel import (
    P,
    chain_sharding,
    make_mesh,
    make_sharded_logdensity,
)


@pytest.fixture(scope="module")
def mesh8():
    assert jax.device_count() >= 8, "tests need 8 virtual devices"
    return make_mesh(chains=2, seq=4)


@pytest.fixture(scope="module")
def mesh_seq():
    return make_mesh(chains=1, seq=8)


def _data(n=256):
    rng = np.random.default_rng(99)
    t = np.sort(rng.uniform(0, 20, n))
    yerr = rng.uniform(0.1, 0.3, n)
    kernel = terms.SHOTerm(sigma=1.2, rho=4.0, tau=3.0)
    import celerite2_tpu as c2

    gp = c2.GaussianProcess(kernel, t=t, yerr=yerr)
    y = np.asarray(gp.sample(jax.random.PRNGKey(5)))
    return t, yerr, y


def test_sharded_loglik_matches_unsharded(mesh_seq):
    t, yerr, y = _data(256)

    def builder(theta):
        return terms.SHOTerm(
            sigma=theta[0], rho=theta[1], tau=theta[2]
        )

    logd = make_sharded_logdensity(builder, t, y, yerr, mesh_seq)
    theta = jnp.asarray([1.2, 4.0, 3.0])
    ll_sharded = jax.jit(logd)(theta)

    state = gp_compute(builder(theta), t, yerr=yerr)
    ll_ref = gp_log_likelihood(state, y)
    np.testing.assert_allclose(ll_sharded, ll_ref, rtol=1e-9)


def test_sharded_loglik_grad(mesh_seq):
    t, yerr, y = _data(128)

    def builder(theta):
        return terms.SHOTerm(sigma=theta[0], rho=theta[1], tau=theta[2])

    logd = make_sharded_logdensity(builder, t, y, yerr, mesh_seq)
    theta = jnp.asarray([1.2, 4.0, 3.0])
    g_sharded = jax.jit(jax.grad(logd))(theta)

    def ref(theta):
        state = gp_compute(builder(theta), t, yerr=yerr)
        return gp_log_likelihood(state, y)

    g_ref = jax.grad(ref)(theta)
    np.testing.assert_allclose(g_sharded, g_ref, rtol=1e-7, atol=1e-9)


def test_sharded_nonpd_minus_inf(mesh_seq):
    t, yerr, y = _data(128)

    def builder(theta):
        return terms.RealTerm(a=theta[0], c=theta[1])

    logd = make_sharded_logdensity(builder, t, 0.0 * np.asarray(y), 0.0 * yerr, mesh_seq)
    val = jax.jit(logd)(jnp.asarray([-5.0, 0.5]))
    assert np.isneginf(float(val))


def test_chain_sharded_nuts(mesh8):
    """Chains sharded over the mesh: same program, 8 chains on 8 devs."""
    from celerite2_tpu.inference import run_nuts, split_rhat

    dim = 3
    prec = jnp.asarray(np.diag([1.0, 2.0, 0.5]))
    mu = jnp.asarray([1.0, -1.0, 0.0])

    def logp(q):
        r = q - mu
        return -0.5 * r @ prec @ r

    sharding = NamedSharding(mesh8, P(("chains", "seq")))
    res = run_nuts(
        logp,
        jnp.zeros(dim),
        jax.random.PRNGKey(0),
        num_warmup=300,
        num_samples=300,
        num_chains=8,
        chain_axis=sharding,
    )
    assert res.samples.shape == (8, 300, 3)
    assert np.all(np.asarray(split_rhat(res.samples)) < 1.1)
    m = np.asarray(res.samples).reshape(-1, 3).mean(axis=0)
    np.testing.assert_allclose(m, np.asarray(mu), atol=0.3)


def test_two_level_engine_inside_shard_map():
    """The TPU multichip path runs two_level_prefix INSIDE shard_map;
    exercise that combination explicitly on the CPU mesh (the platform
    check would otherwise route CPU tests to lax.associative_scan)."""
    import jax
    from jax import lax
    from jax.sharding import Mesh, PartitionSpec as P

    from celerite2_tpu.ops.assoc import (
        _id_affine,
        _mat_affine_combine,
        two_level_prefix,
    )

    devs = np.array(jax.devices()[:4])
    mesh = Mesh(devs, ("seq",))
    rng = np.random.default_rng(0)
    N = 64
    A = jnp.asarray(np.eye(2) + 0.1 * rng.normal(size=(N, 2, 2)))
    b = jnp.asarray(rng.normal(size=(N, 2, 1)))

    def local_prefix_last(A_l, b_l):
        # per-shard inclusive prefix via the blocked engine, then
        # return each shard's composed block map
        Ap, bp = two_level_prefix(
            _mat_affine_combine, (A_l, b_l), _id_affine, block=8
        )
        return Ap[-1:], bp[-1:]

    fn = jax.jit(
        jax.shard_map(
            local_prefix_last,
            mesh=mesh,
            in_specs=(P("seq"), P("seq")),
            out_specs=(P("seq"), P("seq")),
        )
    )
    Ab, bb = fn(A, b)

    B = N // 4
    # shard k's block map composes rows [kB, (k+1)B): compute directly
    for k in range(4):
        Aref, bref = lax.associative_scan(
            _mat_affine_combine,
            (A[k * B:(k + 1) * B], b[k * B:(k + 1) * B]),
        )
        np.testing.assert_allclose(Ab[k], Aref[-1], rtol=1e-10)
        np.testing.assert_allclose(bb[k], bref[-1], rtol=1e-10)
