"""Native CPU driver vs the JAX ops (cross-backend oracle tier)."""

import numpy as np
import pytest

from celerite2_tpu.testing import get_matrices
from celerite2_tpu.utils import LinAlgError

cpu = pytest.importorskip("celerite2_tpu.cpu")


@pytest.fixture(scope="module")
def system():
    return get_matrices(size=80, conditional=True)


def test_factor_matches_jax(system):
    import jax.numpy as jnp

    from celerite2_tpu.ops import scan

    t, c, a, U, V, Y, t2, U2, V2 = system
    d_c, W_c = cpu.driver.factor(t, c, a, U, V)
    d_j, W_j, _ = scan.factor_scan(*map(jnp.asarray, (t, c, a, U, V)))
    np.testing.assert_allclose(d_c, d_j, rtol=1e-12)
    np.testing.assert_allclose(W_c, W_j, rtol=1e-10, atol=1e-13)


def test_sweeps_match_jax(system):
    import jax.numpy as jnp

    from celerite2_tpu.ops import scan

    t, c, a, U, V, Y, t2, U2, V2 = system
    d, W = cpu.driver.factor(t, c, a, U, V)

    pairs = [
        ("solve_lower", scan.solve_lower_scan, (U, W)),
        ("solve_upper", scan.solve_upper_scan, (U, W)),
        ("matmul_lower", scan.matmul_lower_scan, (U, V)),
        ("matmul_upper", scan.matmul_upper_scan, (U, V)),
    ]
    for name, jax_fn, (A, B) in pairs:
        Z_c = getattr(cpu.driver, name)(t, c, A, B, Y)
        Z_j, _ = jax_fn(*map(jnp.asarray, (t, c, A, B, Y)))
        np.testing.assert_allclose(
            Z_c, Z_j, rtol=1e-10, atol=1e-12, err_msg=name
        )


def test_general_matmul_matches_jax(system):
    import jax.numpy as jnp

    from celerite2_tpu import ops

    t, c, a, U, V, Y, t2, U2, V2 = system
    Zl_c = cpu.driver.general_matmul_lower(t2, t, c, U2, V, Y)
    Zl_j = ops.general_matmul_lower(
        *map(jnp.asarray, (t2, t, c, U2, V, Y))
    )
    np.testing.assert_allclose(Zl_c, Zl_j, rtol=1e-10, atol=1e-12)

    Zu_c = cpu.driver.general_matmul_upper(t2, t, c, V2, U, Y)
    Zu_j = ops.general_matmul_upper(
        *map(jnp.asarray, (t2, t, c, V2, U, Y))
    )
    np.testing.assert_allclose(Zu_c, Zu_j, rtol=1e-10, atol=1e-12)


def test_matrices_fill(system):
    t, c, a, U, V, Y, *_ = system
    from celerite2_tpu import terms

    # overdamped (real) term first so coefficient order == term order
    kernel = terms.SHOTerm(S0=1.0, w0=2.5, Q=0.2) + terms.SHOTerm(
        S0=5.0, w0=0.1, Q=3.45
    )
    rng = np.random.default_rng(721)
    x = np.sort(rng.uniform(0, 10, 40))
    diag = rng.uniform(0.1, 0.3, 40)
    ar, cr, ac, bc, cc, dc = (np.asarray(v) for v in kernel.get_coefficients())
    c_c, a_c, U_c, V_c = cpu.driver.get_celerite_matrices(
        ar, cr, ac, bc, cc, dc, x, diag
    )
    c_j, a_j, U_j, V_j = (np.asarray(v) for v in kernel.get_celerite_matrices(x, diag))
    np.testing.assert_allclose(c_c, c_j, rtol=1e-12)
    np.testing.assert_allclose(a_c, a_j, rtol=1e-12)
    np.testing.assert_allclose(U_c, U_j, rtol=1e-12, atol=1e-13)
    np.testing.assert_allclose(V_c, V_j, rtol=1e-12, atol=1e-13)


def test_factor_raises_on_nonpd(system):
    t, c, a, U, V, Y, *_ = system
    bad_a = np.asarray(a).copy()
    bad_a[:] = -1.0
    with pytest.raises(LinAlgError):
        cpu.driver.factor(t, c, bad_a, U, V)


def test_inplace_outputs(system):
    t, c, a, U, V, Y, *_ = system
    N, J = np.shape(U)
    d_buf = np.empty(N)
    W_buf = np.empty((N, J))
    d, W = cpu.driver.factor(t, c, a, U, V, d_out=d_buf, W_out=W_buf)
    assert d is d_buf and W is W_buf


def test_numpy_gp_matches_jax_gp():
    """The eager CPU GaussianProcess must match the JAX GP across the
    full surface (the reference's NumPy-vs-JAX cross-backend parity,
    testing.py:183-201)."""
    import celerite2_tpu as c2
    from celerite2_tpu import terms
    from celerite2_tpu.cpu import NumpyGaussianProcess

    rng = np.random.default_rng(77)
    N = 120
    t = np.sort(rng.uniform(0, 10, N))
    yerr = rng.uniform(0.1, 0.3, N)
    y = np.sin(t) + yerr * rng.normal(size=N)
    t_new = np.linspace(-1, 11, 45)

    kernel = terms.SHOTerm(sigma=1.3, rho=3.1, tau=2.2) + terms.RealTerm(
        a=0.8, c=0.4
    )
    ref = c2.GaussianProcess(kernel, t=t, yerr=yerr, mean=0.1)
    gp = NumpyGaussianProcess(kernel, t=t, yerr=yerr, mean=0.1)

    np.testing.assert_allclose(
        gp.log_likelihood(y), float(ref.log_likelihood(y)), rtol=1e-10
    )
    np.testing.assert_allclose(
        gp.apply_inverse(y), np.asarray(ref.apply_inverse(y)),
        rtol=1e-9, atol=1e-11,
    )
    np.testing.assert_allclose(
        gp.dot_tril(y), np.asarray(ref.dot_tril(y)),
        rtol=1e-9, atol=1e-11,
    )
    np.testing.assert_allclose(
        gp.predict(y), np.asarray(ref.predict(y)), rtol=1e-9, atol=1e-10
    )
    mu, var = gp.predict(y, t=t_new, return_var=True)
    mu_ref, var_ref = ref.predict(y, t=t_new, return_var=True)
    np.testing.assert_allclose(mu, np.asarray(mu_ref), rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(
        var, np.asarray(var_ref), rtol=1e-7, atol=1e-9
    )

    # seeded prior draws have the right covariance structure
    s = gp.sample(size=4, rng=np.random.default_rng(0))
    assert s.shape == (4, N)
    assert np.all(np.isfinite(s))


def test_numpy_gp_error_contract():
    import pytest

    from celerite2_tpu import terms
    from celerite2_tpu.cpu import NumpyGaussianProcess
    from celerite2_tpu.utils import LinAlgError

    t = np.linspace(0, 10, 50)
    bad = terms.RealTerm(a=-5.0, c=0.5)
    gp = NumpyGaussianProcess(bad)
    with pytest.raises(LinAlgError):
        gp.compute(t, yerr=np.full(50, 1e-6))
    gp.compute(t, yerr=np.full(50, 1e-6), quiet=True)
    assert gp.log_likelihood(np.sin(t)) == -np.inf
    with pytest.raises(ValueError):
        gp.compute(t[::-1])
    with pytest.raises(ValueError):
        gp.compute(t, yerr=np.ones(50), diag=np.ones(50))


def test_numpy_gp_convolution_override():
    """Terms that override matrix construction (TermConvolution's diag
    correction) must route through their own method, not the raw
    coefficient fill."""
    import celerite2_tpu as c2
    from celerite2_tpu import terms
    from celerite2_tpu.cpu import NumpyGaussianProcess

    rng = np.random.default_rng(3)
    N = 60
    t = np.sort(rng.uniform(0, 10, N))
    yerr = np.full(N, 0.2)
    y = np.sin(t)
    kernel = terms.TermConvolution(
        terms.SHOTerm(sigma=1.0, rho=2.0, tau=1.5), 0.08
    )
    ref = c2.GaussianProcess(kernel, t=t, yerr=yerr)
    gp = NumpyGaussianProcess(kernel, t=t, yerr=yerr)
    np.testing.assert_allclose(
        gp.log_likelihood(y), float(ref.log_likelihood(y)), rtol=1e-10
    )


def test_numpy_gp_sample_conditional_moments():
    """Pathwise conditional sampling on the eager CPU backend: exact
    construction checked by moment-matching the dense conditional."""
    from celerite2_tpu import terms

    rng = np.random.default_rng(31)
    N, M = 64, 7
    t = np.sort(rng.uniform(0, 10, N))
    yerr = np.full(N, 0.25)
    y = np.sin(t) + yerr * rng.normal(size=N)
    t_new = np.linspace(1.0, 9.0, M)

    kernel = terms.SHOTerm(sigma=1.1, rho=3.3, tau=2.2)
    gp = cpu.NumpyGaussianProcess(kernel, t=t, yerr=yerr, mean=0.4)

    samps = gp.sample_conditional(
        y, t=t_new, size=4000, rng=np.random.default_rng(5)
    )
    assert samps.shape == (4000, M)

    # dense conditional moments (oracle)
    K = np.asarray(kernel.to_dense(t, yerr**2))
    Ks = np.asarray(kernel.get_value(t_new[:, None] - t[None, :]))
    Kss = np.asarray(kernel.get_value(t_new[:, None] - t_new[None, :]))
    alpha = np.linalg.solve(K, y - 0.4)
    mu = Ks @ alpha + 0.4
    cov = Kss - Ks @ np.linalg.solve(K, Ks.T)

    sd = np.sqrt(np.diag(cov))
    np.testing.assert_allclose(
        samps.mean(axis=0), mu, atol=4.5 * sd.max() / np.sqrt(4000)
    )
    np.testing.assert_allclose(
        np.cov(samps.T), cov, atol=6.0 * float(sd.max() ** 2) / 60.0
    )

    # vector (size=None) shape + duplicated-times contract
    s1 = gp.sample_conditional(y, t=t_new, rng=np.random.default_rng(6))
    assert s1.shape == (M,)
    with pytest.raises(LinAlgError):
        gp.sample_conditional(y)  # t=None duplicates every time
    s2 = gp.sample_conditional(
        y, regularize=1e-8, rng=np.random.default_rng(7)
    )
    assert s2.shape == (N,) and np.all(np.isfinite(s2))
