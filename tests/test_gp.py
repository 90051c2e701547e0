"""GP API end-to-end vs dense multivariate-normal oracle
(pattern of reference python/test/test_celerite2.py:55-237)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from celerite2_tpu import GaussianProcess, terms
from celerite2_tpu.gp import gp_compute, gp_log_likelihood
from celerite2_tpu.utils import LinAlgError


@pytest.fixture
def data():
    rng = np.random.default_rng(905)
    t = np.sort(rng.uniform(0, 10, 80))
    yerr = rng.uniform(0.1, 0.3, 80)
    y = np.sin(t) + yerr * rng.normal(size=80)
    return t, yerr, y


@pytest.fixture
def kernel():
    return terms.SHOTerm(S0=1.3, w0=1.05, Q=3.0) + terms.RealTerm(
        a=0.5, c=0.8
    )


def dense_loglike(kernel, t, yerr, y, mean=0.0):
    K = np.asarray(kernel.to_dense(t, yerr**2))
    r = y - mean
    sign, logdet = np.linalg.slogdet(K)
    return -0.5 * (
        logdet + r @ np.linalg.solve(K, r) + len(t) * np.log(2 * np.pi)
    )


def test_log_likelihood(data, kernel):
    t, yerr, y = data
    gp = GaussianProcess(kernel, t=t, yerr=yerr)
    np.testing.assert_allclose(
        gp.log_likelihood(y), dense_loglike(kernel, t, yerr, y), rtol=1e-9
    )


def test_mean_functions(data, kernel):
    t, yerr, y = data
    for mean in (1.5, lambda x: 0.3 * x):
        gp = GaussianProcess(kernel, t=t, yerr=yerr, mean=mean)
        mval = mean(t) if callable(mean) else mean
        np.testing.assert_allclose(
            gp.log_likelihood(y),
            dense_loglike(kernel, t, yerr, y, mean=mval),
            rtol=1e-9,
        )


def test_yerr_diag_equivalence(data, kernel):
    t, yerr, y = data
    gp1 = GaussianProcess(kernel, t=t, yerr=yerr)
    gp2 = GaussianProcess(kernel, t=t, diag=yerr**2)
    np.testing.assert_allclose(
        gp1.log_likelihood(y), gp2.log_likelihood(y), rtol=1e-12
    )
    with pytest.raises(ValueError):
        GaussianProcess(kernel, t=t, yerr=yerr, diag=yerr**2)


def test_apply_inverse_and_dot_tril(data, kernel):
    t, yerr, y = data
    gp = GaussianProcess(kernel, t=t, yerr=yerr)
    K = np.asarray(kernel.to_dense(t, yerr**2))

    x = gp.apply_inverse(y)
    np.testing.assert_allclose(x, np.linalg.solve(K, y), rtol=1e-7, atol=1e-9)

    Ym = np.stack([y, 2 * y], axis=1)
    Xm = gp.apply_inverse(Ym)
    np.testing.assert_allclose(
        Xm, np.linalg.solve(K, Ym), rtol=1e-7, atol=1e-9
    )

    # dot_tril: z z^T should reproduce K through the Cholesky identity
    z = gp.dot_tril(np.eye(len(t)))
    np.testing.assert_allclose(z @ z.T, K, rtol=1e-7, atol=1e-9)


def test_predict_mean_var_cov(data, kernel):
    t, yerr, y = data
    gp = GaussianProcess(kernel, t=t, yerr=yerr)
    K = np.asarray(kernel.to_dense(t, yerr**2))

    t_new = np.sort(np.random.default_rng(6).uniform(-1, 11, 45))
    Ks = np.asarray(kernel.get_value(t_new[:, None] - t[None, :]))
    alpha = np.linalg.solve(K, y)

    mu, var = gp.predict(y, t=t_new, return_var=True)
    mu2, cov = gp.predict(y, t=t_new, return_cov=True)

    np.testing.assert_allclose(mu, Ks @ alpha, rtol=1e-7, atol=1e-8)
    np.testing.assert_allclose(mu2, mu, rtol=1e-12)

    cov_exp = np.asarray(
        kernel.get_value(t_new[:, None] - t_new[None, :])
    ) - Ks @ np.linalg.solve(K, Ks.T)
    np.testing.assert_allclose(cov, cov_exp, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(var, np.diag(cov_exp), rtol=1e-6, atol=1e-8)


def test_predict_at_observed_fast_path(data, kernel):
    t, yerr, y = data
    gp = GaussianProcess(kernel, t=t, yerr=yerr)
    K = np.asarray(kernel.to_dense(t, yerr**2))
    Kno = K - np.diag(yerr**2)
    mu_exp = Kno @ np.linalg.solve(K, y)
    np.testing.assert_allclose(gp.predict(y), mu_exp, rtol=1e-7, atol=1e-9)

    # per-kernel component prediction (reference test_celerite2.py:156-179)
    k1 = terms.SHOTerm(S0=1.3, w0=1.05, Q=3.0)
    mu_k1 = gp.predict(y, kernel=k1)
    K1 = np.asarray(k1.to_dense(t, np.zeros_like(t)))
    np.testing.assert_allclose(
        mu_k1, K1 @ np.linalg.solve(K, y), rtol=1e-6, atol=1e-8
    )


def test_error_contracts(data, kernel):
    t, yerr, y = data
    gp = GaussianProcess(kernel)
    with pytest.raises(RuntimeError):
        gp.log_likelihood(y)

    with pytest.raises(ValueError):
        gp.compute(t[::-1], yerr=yerr)  # unsorted

    with pytest.raises(ValueError):
        gp.compute(np.stack([t, t]), yerr=yerr)  # 2d

    gp.compute(t, yerr=yerr)
    with pytest.raises(ValueError):
        gp.log_likelihood(y[:-1])  # shape mismatch
    with pytest.raises(ValueError):
        gp.log_likelihood(np.stack([y, y], axis=1))  # not a vector


def test_quiet_nonpd(data):
    t, yerr, y = data
    bad = terms.RealTerm(a=-10.0, c=0.5)  # not positive definite
    gp = GaussianProcess(bad)
    with pytest.raises(LinAlgError):
        gp.compute(t, yerr=0.0 * yerr)
    gp.compute(t, yerr=0.0 * yerr, quiet=True)
    assert np.isneginf(float(gp.log_likelihood(y)))


def test_traced_loglike_and_grad(data, kernel):
    t, yerr, y = data

    @jax.jit
    def ll(params):
        k = terms.SHOTerm(S0=params[0], w0=params[1], Q=params[2])
        state = gp_compute(k, t, yerr=yerr)
        return gp_log_likelihood(state, y)

    p = jnp.asarray([1.3, 1.05, 3.0])
    v = ll(p)
    gp = GaussianProcess(terms.SHOTerm(S0=1.3, w0=1.05, Q=3.0), t=t, yerr=yerr)
    np.testing.assert_allclose(v, gp.log_likelihood(y), rtol=1e-10)

    g = jax.grad(ll)(p)
    assert np.all(np.isfinite(g))

    # quiet -inf inside jit for non-PD params
    v_bad = ll(jnp.asarray([-10.0, 1.0, 3.0]))
    assert np.isneginf(float(v_bad))
    # ... and the pullback through -inf must not poison good params' grads
    assert np.all(np.isfinite(jax.grad(ll)(p)))


def test_prior_sample_moments(data, kernel):
    t, yerr, _ = data
    gp = GaussianProcess(kernel, t=t, yerr=yerr, mean=2.0)
    key = jax.random.PRNGKey(0)
    samples = gp.sample(key, size=4000)
    assert samples.shape == (4000, len(t))
    K = np.asarray(kernel.to_dense(t, yerr**2))
    emp_mean = np.mean(np.asarray(samples), axis=0)
    emp_cov = np.cov(np.asarray(samples).T)
    np.testing.assert_allclose(emp_mean, 2.0 * np.ones(len(t)), atol=0.15)
    np.testing.assert_allclose(emp_cov, K, atol=0.25)


def test_conditional_sample_shape(data, kernel):
    t, yerr, y = data
    gp = GaussianProcess(kernel, t=t, yerr=yerr)
    t_new = np.linspace(-1, 11, 20)
    cond = gp.condition(y, t=t_new)
    s = cond.sample(jax.random.PRNGKey(1), shape=(7,), regularize=1e-10)
    assert s.shape == (7, 20)


@pytest.mark.slow
def test_predict_mean_is_differentiable():
    """The conditional mean at new points flows gradients (through the
    general_matmul cumulative scans — the reference's general matmuls
    are forward-only, definitions.json:264; here autodiff covers them)."""
    rng = np.random.default_rng(8)
    N, M = 60, 17
    t = np.sort(rng.uniform(0, 10, N))
    yerr = np.full(N, 0.2)
    y = np.sin(t)
    t_new = np.linspace(0, 10, M)

    def f(log_rho):
        kernel = terms.SHOTerm(sigma=1.0, rho=jnp.exp(log_rho), tau=2.0)
        gp = GaussianProcess(kernel, t=t, yerr=yerr)
        mu = gp.predict(jnp.asarray(y), t=t_new)
        return jnp.sum(mu**2)

    g = jax.grad(f)(jnp.asarray(1.0))
    assert np.isfinite(float(g))
    # finite-difference cross-check
    eps = 1e-5
    fd = (f(jnp.asarray(1.0 + eps)) - f(jnp.asarray(1.0 - eps))) / (2 * eps)
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-4)


@pytest.mark.slow
def test_pathwise_conditional_exact_moments(data, kernel):
    """sample_pathwise is affine in its noise draws; its implied first
    and second moments must EXACTLY match the dense conditional
    (Matheron's rule) — no Monte Carlo tolerance involved."""
    t, yerr, y = data
    N = len(t)
    M = 13
    t_new = np.linspace(-0.5, 10.5, M)
    gp = GaussianProcess(kernel, t=t, yerr=yerr, mean=1.5)
    cond = gp.condition(y, t=t_new)

    def samp(noise):
        z, eps = noise[: N + M], noise[N + M :]
        return cond._pathwise_transform(z, eps)

    zero = jnp.zeros(N + M + N)
    mu = samp(zero)
    np.testing.assert_allclose(
        np.asarray(mu), np.asarray(cond.mean), rtol=1e-8, atol=1e-10
    )
    A = jax.jacrev(samp)(zero)  # (M, N+M+N)
    cov_implied = np.asarray(A @ A.T)
    np.testing.assert_allclose(
        cov_implied, np.asarray(cond.covariance), rtol=1e-6, atol=1e-8
    )


@pytest.mark.slow
def test_pathwise_conditional_shapes_and_dup_times(data, kernel):
    t, yerr, y = data
    gp = GaussianProcess(kernel, t=t, yerr=yerr)
    # targets that duplicate training times need the joint jitter
    t_new = np.concatenate([t[::7], np.linspace(2.0, 8.0, 5)])
    t_new = np.sort(t_new)
    cond = gp.condition(y, t=t_new)
    s = cond.sample_pathwise(
        jax.random.PRNGKey(3), shape=(6,), regularize=1e-8
    )
    assert s.shape == (6, len(t_new))
    assert np.all(np.isfinite(np.asarray(s)))


@pytest.mark.slow
def test_pathwise_component_conditional_exact_moments(data, kernel):
    """kernel= component pathwise draws have EXACTLY the dense
    component conditional's law (reference core.py:74-113 semantics):
    the map is affine in (z_joint, z_comp, eps), so mean and implied
    covariance are checked with no Monte Carlo tolerance."""
    t, yerr, y = data
    N = len(t)
    M = 11
    t_new = np.linspace(-0.5, 10.5, M)
    gp = GaussianProcess(kernel, t=t, yerr=yerr, mean=0.7)
    sub = gp.condition(y, t=t_new, kernel=gp.kernel.terms[0])

    def samp(noise):
        z = noise[: N + M]
        zc = noise[N + M : 2 * N + M]
        eps = noise[2 * N + M :]
        return sub._pathwise_transform(z, eps, z_comp=zc)

    zero = jnp.zeros(3 * N + M)  # (N+M) joint + N complement + N noise
    mu = samp(zero)
    np.testing.assert_allclose(
        np.asarray(mu), np.asarray(sub.mean), rtol=1e-7, atol=1e-9
    )
    A = jax.jacrev(samp)(zero)
    cov_implied = np.asarray(A @ A.T)
    np.testing.assert_allclose(
        cov_implied, np.asarray(sub.covariance), rtol=1e-6, atol=1e-8
    )
    # end-to-end draw path (keyed API, derived complement)
    s = sub.sample_pathwise(jax.random.PRNGKey(4), shape=(5,))
    assert s.shape == (5, M)
    assert np.all(np.isfinite(np.asarray(s)))


def test_pathwise_component_complement_derivation(data, kernel):
    from celerite2_tpu.gp import _complement_kernel

    t, yerr, y = data
    gp = GaussianProcess(kernel, t=t, yerr=yerr)
    comp = _complement_kernel(kernel, kernel.terms[1])
    # complement of the second summand is the first one
    tau = np.linspace(0, 3, 7)
    np.testing.assert_allclose(
        np.asarray(comp.get_value(tau)),
        np.asarray(kernel.terms[0].get_value(tau)),
    )
    # a kernel that is not a summand cannot be complemented
    stranger = terms.RealTerm(a=0.1, c=2.0)
    cond = gp.condition(y, t=np.linspace(0, 10, 5), kernel=stranger)
    with pytest.raises(ValueError, match="complement"):
        cond.sample_pathwise(jax.random.PRNGKey(0))


def test_gp_sample_conditional_functional_vmap(data, kernel):
    """The functional pathwise sampler vmaps over a posterior fleet
    (theta draws) as one program, matching per-theta calls."""
    from celerite2_tpu.gp import gp_sample_conditional

    t, yerr, y = data
    t_new = np.linspace(0.0, 10.0, 9)

    def draw(theta, key):
        k = terms.SHOTerm(sigma=theta[0], rho=theta[1], tau=theta[2])
        st = gp_compute(k, t, yerr=yerr)
        return gp_sample_conditional(st, k, y, t_new, key, mean=0.3)

    thetas = jnp.asarray([[1.0, 3.0, 2.0], [1.4, 4.5, 2.8]])
    keys = jax.random.split(jax.random.PRNGKey(9), 2)
    batched = jax.jit(jax.vmap(draw))(thetas, keys)
    assert batched.shape == (2, 9)
    for i in range(2):
        single = draw(thetas[i], keys[i])
        np.testing.assert_allclose(
            np.asarray(batched[i]), np.asarray(single),
            rtol=1e-6, atol=1e-9,
        )
