"""Parity of the entry-planes Pallas prefix engine (ops/planes_engine)
against the generic two-level engine, all element families.

Runs on CPU in pallas interpret mode (planes="on" forces the planes
routing; interpret is automatic off-TPU).  N is kept small: interpret
mode evaluates the kernel per grid step and the unrolled leaf is
compile-heavy on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from celerite2_tpu import terms
from celerite2_tpu.config import get_config, set_config
from celerite2_tpu.ops import assoc
from celerite2_tpu.ops import scan as scan_ops


@pytest.fixture
def planes_on(monkeypatch):
    from celerite2_tpu.ops import planes_engine

    # shrink the HS leaf so small-N tests exercise the pallas kernel
    # and the recursion, not just the doubling prefix
    monkeypatch.setattr(planes_engine, "_LEAF", 16)
    prior = get_config()
    set_config(planes="on")
    try:
        yield
    finally:
        set_config(**prior.__dict__)


def _system(N, J=2, seed=0):
    rng = np.random.default_rng(seed)
    t = np.sort(rng.uniform(0, 10, N))
    if J == 2:
        kernel = terms.SHOTerm(sigma=1.3, rho=3.4, tau=2.9)
    else:
        kernel = terms.SHOTerm(sigma=1.3, rho=3.4, tau=2.9) + terms.SHOTerm(
            sigma=0.7, rho=1.1, tau=5.0
        )
    c, a, U, V = kernel.get_celerite_matrices(
        jnp.asarray(t), jnp.full(N, 0.04)
    )
    Y = jnp.asarray(rng.normal(size=(N, 1)))
    return jnp.asarray(t), c, a, U, V, Y


# leaf-only (N < 48), one kernel level, and two kernel levels
@pytest.mark.parametrize(
    "N", [17, pytest.param(130, marks=pytest.mark.slow)]
)
def test_factor_solve_parity(planes_on, N):
    t, c, a, U, V, Y = _system(N)
    set_config(planes="off")
    d0, W0, S0 = assoc.factor_assoc(t, c, a, U, V)
    Z0, F0 = assoc.solve_lower_assoc(t, c, U, W0, Y)
    set_config(planes="on")
    d1, W1, S1 = assoc.factor_assoc(t, c, a, U, V)
    Z1, F1 = assoc.solve_lower_assoc(t, c, U, W1, Y)
    for x0, x1 in [(d0, d1), (W0, W1), (S0, S1), (Z0, Z1), (F0, F1)]:
        np.testing.assert_allclose(
            np.asarray(x1), np.asarray(x0), rtol=1e-9, atol=1e-12
        )


@pytest.mark.slow
def test_factor_solve_fused_parity(planes_on):
    t, c, a, U, V, Y = _system(120)
    set_config(planes="off")
    ref = assoc.factor_solve_assoc(t, c, a, U, V, Y)
    set_config(planes="on")
    out = assoc.factor_solve_assoc(t, c, a, U, V, Y)
    for x0, x1 in zip(ref, out):
        np.testing.assert_allclose(
            np.asarray(x1), np.asarray(x0), rtol=1e-9, atol=1e-12
        )


@pytest.mark.slow
def test_solve_upper_matmul_parity(planes_on):
    t, c, a, U, V, Y = _system(97)
    set_config(planes="off")
    d0, W0, _ = assoc.factor_assoc(t, c, a, U, V)
    su0 = assoc.solve_upper_assoc(t, c, U, W0, Y)
    ml0 = assoc.matmul_lower_assoc(t, c, U, V, Y)
    mu0 = assoc.matmul_upper_assoc(t, c, U, V, Y)
    set_config(planes="on")
    _, W1, _ = assoc.factor_assoc(t, c, a, U, V)
    su1 = assoc.solve_upper_assoc(t, c, U, W1, Y)
    ml1 = assoc.matmul_lower_assoc(t, c, U, V, Y)
    mu1 = assoc.matmul_upper_assoc(t, c, U, V, Y)
    for p0, p1 in [(su0, su1), (ml0, ml1), (mu0, mu1)]:
        for x0, x1 in zip(p0, p1):
            np.testing.assert_allclose(
                np.asarray(x1), np.asarray(x0), rtol=1e-9, atol=1e-12
            )


@pytest.mark.slow
def test_loglik_grad_parity(planes_on):
    """End-to-end: value_and_grad of the GP loglik through the planes
    engine (exercises factor_rev dense + sweep_rev paths)."""
    from celerite2_tpu.gp import gp_compute, gp_log_likelihood

    rng = np.random.default_rng(3)
    N = 110
    t = np.sort(rng.uniform(0, 10, N))
    y = rng.normal(size=N)
    yerr = np.full(N, 0.2)

    def ll(theta):
        kernel = terms.SHOTerm(
            sigma=theta[0], rho=theta[1], tau=theta[2]
        )
        state = gp_compute(kernel, jnp.asarray(t), yerr=jnp.asarray(yerr))
        return gp_log_likelihood(state, jnp.asarray(y))

    theta = jnp.asarray([1.2, 3.1, 2.4])
    prior = get_config()
    set_config(planes="off", backend="assoc")
    v0, g0 = jax.value_and_grad(ll)(theta)
    set_config(planes="on", backend="assoc")
    v1, g1 = jax.value_and_grad(ll)(theta)
    set_config(**prior.__dict__)
    np.testing.assert_allclose(float(v1), float(v0), rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(g1), np.asarray(g0), rtol=1e-8, atol=1e-11
    )


@pytest.mark.slow
def test_wide_j_riccati_parity(planes_on):
    """J=4 exercises the Schur-recursion p_inv base."""
    t, c, a, U, V, Y = _system(90, J=4)
    set_config(planes="off")
    d0, W0, S0 = assoc.factor_assoc(t, c, a, U, V)
    set_config(planes="on")
    d1, W1, S1 = assoc.factor_assoc(t, c, a, U, V)
    np.testing.assert_allclose(
        np.asarray(d1), np.asarray(d0), rtol=1e-9, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(W1), np.asarray(W0), rtol=1e-8, atol=1e-11
    )


def test_auto_routing_rule(monkeypatch):
    """'auto' routing (round-4 TPU A/B): planes only for unbatched
    traces of families with <= planes_max_planes planes, on TPU."""
    from celerite2_tpu.ops import planes_engine
    from celerite2_tpu.ops.planes import mat_affine_spec, riccati_spec

    prior = get_config()
    try:
        set_config(planes="auto")
        r2 = riccati_spec(2, jnp.float32)  # 12 planes
        r4 = riccati_spec(4, jnp.float32)  # 48 planes
        aff = mat_affine_spec(4, 1, jnp.float32)  # 20 planes
        el2 = tuple(jnp.zeros((5, 2, 2)) for _ in range(3))
        el4 = tuple(jnp.zeros((5, 4, 4)) for _ in range(3))

        # off-TPU: auto never engages
        assert not planes_engine.planes_wanted(r2, el2)

        # pretend TPU: small families yes, fat families no
        monkeypatch.setattr(
            planes_engine.jax, "default_backend", lambda: "tpu"
        )
        assert planes_engine.planes_wanted(r2, el2)
        assert planes_engine.planes_wanted(
            aff, (jnp.zeros((5, 4, 4)), jnp.zeros((5, 4, 1)))
        )
        assert not planes_engine.planes_wanted(r4, el4)

        # vmapped trace: generic engine (fleet case loses)
        seen = []

        def probe(x):
            seen.append(planes_engine.planes_wanted(r2, (x, x, x)))
            return x

        jax.vmap(probe)(jnp.zeros((3, 5, 2, 2)))
        assert seen == [False]

        # forcing still works both ways
        set_config(planes="on")
        assert planes_engine.planes_wanted(r4, el4)
        set_config(planes="off")
        assert not planes_engine.planes_wanted(r2, el2)
    finally:
        set_config(**prior.__dict__)


@pytest.mark.slow
def test_chunked_padding_parity(planes_on, monkeypatch):
    """Chunked level-0 semantics (chunk > 1, incl. the identity-row
    padding when chunk does not divide L): interpret mode normally pins
    chunk=1 for compile-time reasons, so force a chunk that (a) runs
    multiple combines per grid step and (b) pads L up to a whole number
    of chunks.  J=2 keeps the per-step combine cheap on the CPU path."""
    from celerite2_tpu.ops import planes_engine

    monkeypatch.setattr(
        planes_engine, "_pick_chunk", lambda E, s, L, interp: 3
    )
    t, c, a, U, V, Y = _system(130)
    set_config(planes="off")
    d0, W0, S0 = assoc.factor_assoc(t, c, a, U, V)
    Z0, F0 = assoc.solve_lower_assoc(t, c, U, W0, Y)
    set_config(planes="on")
    d1, W1, S1 = assoc.factor_assoc(t, c, a, U, V)
    Z1, F1 = assoc.solve_lower_assoc(t, c, U, W1, Y)
    for x0, x1 in [(d0, d1), (W0, W1), (S0, S1), (Z0, Z1), (F0, F1)]:
        np.testing.assert_allclose(
            np.asarray(x1), np.asarray(x0), rtol=1e-9, atol=1e-12
        )


@pytest.mark.slow
def test_planes_vs_scan_oracle(planes_on):
    """Planes-engine factorization against the sequential oracle."""
    t, c, a, U, V, Y = _system(75)
    set_config(planes="on")
    d1, W1, _ = assoc.factor_assoc(t, c, a, U, V)
    d2, W2, _ = scan_ops.factor_scan(t, c, a, U, V)
    np.testing.assert_allclose(
        np.asarray(d1), np.asarray(d2), rtol=1e-9, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(W1), np.asarray(W2), rtol=1e-8, atol=1e-11
    )


@pytest.mark.slow
def test_vmapped_factor_parity(planes_on):
    """vmap folds the chain axis into the kernel's block/lane axis
    (custom_vmap rule); parity vs the vmapped generic engine."""
    rng = np.random.default_rng(7)
    N, C = 70, 3
    t = np.sort(rng.uniform(0, 10, N))
    thetas = jnp.asarray(rng.uniform(0.8, 3.0, size=(C, 3)))

    def factor(theta):
        kernel = terms.SHOTerm(
            sigma=theta[0], rho=theta[1], tau=theta[2]
        )
        c, a, U, V = kernel.get_celerite_matrices(
            jnp.asarray(t), jnp.full(N, 0.04)
        )
        d, W, _ = assoc.factor_assoc(jnp.asarray(t), c, a, U, V)
        return d, W

    set_config(planes="off")
    d0, W0 = jax.vmap(factor)(thetas)
    set_config(planes="on")
    d1, W1 = jax.vmap(factor)(thetas)
    np.testing.assert_allclose(
        np.asarray(d1), np.asarray(d0), rtol=1e-9, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(W1), np.asarray(W0), rtol=1e-8, atol=1e-11
    )


@pytest.mark.slow
def test_vmapped_loglik_grad_parity(planes_on):
    """Fleet path end-to-end: vmap(value_and_grad(loglik)) through the
    planes engine matches the generic engine chain-for-chain."""
    from celerite2_tpu.gp import gp_loglik

    rng = np.random.default_rng(11)
    N, C = 90, 2
    t = np.sort(rng.uniform(0, 10, N))
    y = rng.normal(size=N)
    yerr = np.full(N, 0.2)

    def ll(theta):
        kernel = terms.SHOTerm(
            sigma=theta[0], rho=theta[1], tau=theta[2]
        )
        return gp_loglik(
            kernel, jnp.asarray(t), jnp.asarray(y), yerr=jnp.asarray(yerr)
        )

    thetas = jnp.asarray([[1.2, 3.1, 2.4], [0.9, 2.2, 4.0]])
    set_config(planes="off", backend="assoc")
    v0, g0 = jax.vmap(jax.value_and_grad(ll))(thetas)
    set_config(planes="on", backend="assoc")
    v1, g1 = jax.vmap(jax.value_and_grad(ll))(thetas)
    np.testing.assert_allclose(
        np.asarray(v1), np.asarray(v0), rtol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(g1), np.asarray(g0), rtol=1e-8, atol=1e-11
    )


@pytest.mark.slow
def test_sharded_ops_planes_parity(planes_on):
    """The sharded three-phase ops route their per-shard prefixes
    through the planes engine (full-distribute specs): value + grad
    parity on the 8-virtual-device mesh."""
    from celerite2_tpu.parallel import make_mesh, make_sharded_logdensity

    mesh = make_mesh(chains=1, seq=8)
    rng = np.random.default_rng(21)
    N = 128
    t = np.sort(rng.uniform(0, 20, N))
    yerr = np.full(N, 0.2)
    y = np.sin(t) + 0.1 * rng.normal(size=N)

    def builder(theta):
        return terms.SHOTerm(sigma=theta[0], rho=theta[1], tau=theta[2])

    theta = jnp.asarray([1.2, 4.0, 3.0])
    set_config(planes="off")
    logd0 = make_sharded_logdensity(builder, t, y, yerr, mesh)
    v0, g0 = jax.value_and_grad(logd0)(theta)
    set_config(planes="on")
    logd1 = make_sharded_logdensity(builder, t, y, yerr, mesh)
    v1, g1 = jax.value_and_grad(logd1)(theta)
    np.testing.assert_allclose(float(v1), float(v0), rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(g1), np.asarray(g0), rtol=1e-8, atol=1e-11
    )


@pytest.mark.slow
def test_sharded_solve_predict_planes_parity(planes_on):
    """Sharded solve/predict paths (matrix-affine + diag-affine
    transported-cumulative sites) under the planes routing."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from celerite2_tpu.parallel import make_mesh
    from celerite2_tpu.parallel import sharded as sh

    mesh = make_mesh(chains=1, seq=8)
    rng = np.random.default_rng(22)
    N = 64
    t = np.sort(rng.uniform(0, 20, N))
    kernel = terms.SHOTerm(sigma=1.2, rho=4.0, tau=3.0)
    c, a, U, V = kernel.get_celerite_matrices(
        jnp.asarray(t), jnp.full(N, 0.04)
    )
    from celerite2_tpu.ops import api as ops

    d, W = ops.factor(jnp.asarray(t), c, a, U, V)
    y = jnp.asarray(rng.normal(size=N))

    def run():
        fn = jax.shard_map(
            lambda tt, UU, WW, yy, cc: sh.sharded_solve_lower(
                tt, cc, UU, WW, yy, axis_name="seq"
            ),
            mesh=mesh,
            in_specs=(P("seq"),) * 4 + (P(),),
            out_specs=P("seq"),
        )
        return fn(jnp.asarray(t), U, W, y, c)

    set_config(planes="off")
    z0 = run()
    set_config(planes="on")
    z1 = run()
    np.testing.assert_allclose(
        np.asarray(z1), np.asarray(z0), rtol=1e-9, atol=1e-12
    )

    # general matmul (diag-affine transported cumulative, both sweeps)
    t_new = jnp.asarray(np.sort(rng.uniform(0, 20, N)))
    c2, _, U2, V2 = kernel.get_celerite_matrices(
        t_new, jnp.zeros(N)
    )

    def run_gm():
        # targets (t1, U1) replicated, sources (t2, V2, y) sharded
        fn = jax.shard_map(
            lambda t1, t2, U1, V2s, yy, cc: sh.sharded_general_matmul_lower(
                t1, t2, cc, U1, V2s, yy, axis_name="seq"
            ),
            mesh=mesh,
            in_specs=(P(), P("seq"), P(), P("seq"), P("seq"), P()),
            out_specs=P(),
        )
        return fn(t_new, jnp.asarray(t), U2, V, y, c)

    set_config(planes="off")
    m0 = run_gm()
    set_config(planes="on")
    m1 = run_gm()
    np.testing.assert_allclose(
        np.asarray(m1), np.asarray(m0), rtol=1e-9, atol=1e-12
    )


@pytest.mark.slow
def test_doubly_vmapped_factor_parity(planes_on):
    """Two nested vmap levels: the custom_vmap rule folds the first;
    the second falls back to pallas auto-batching (interpret mode on
    CPU).  Parity vs the generic engine closes the documented hole in
    planes_engine.py ('doubly-vmapped ... untested')."""
    rng = np.random.default_rng(17)
    N, C1, C2 = 40, 2, 3
    t = np.sort(rng.uniform(0, 10, N))
    thetas = jnp.asarray(rng.uniform(0.9, 3.0, size=(C1, C2, 3)))

    def factor(theta):
        kernel = terms.SHOTerm(
            sigma=theta[0], rho=theta[1], tau=theta[2]
        )
        c, a, U, V = kernel.get_celerite_matrices(
            jnp.asarray(t), jnp.full(N, 0.04)
        )
        d, W, _ = assoc.factor_assoc(jnp.asarray(t), c, a, U, V)
        return d, W

    set_config(planes="off")
    d0, W0 = jax.vmap(jax.vmap(factor))(thetas)
    set_config(planes="on")
    d1, W1 = jax.vmap(jax.vmap(factor))(thetas)
    np.testing.assert_allclose(
        np.asarray(d1), np.asarray(d0), rtol=1e-9, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(W1), np.asarray(W0), rtol=1e-8, atol=1e-11
    )
