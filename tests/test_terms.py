"""Term DSL correctness (pattern of reference python/test/test_terms.py:
coefficient identities, get_value/get_psd consistency, dot vs dense,
algebra closure, alternative parameterizations, traceability)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from celerite2_tpu import terms
from celerite2_tpu import ops


TEST_TERMS = [
    terms.RealTerm(a=1.5, c=0.7),
    terms.ComplexTerm(a=1.5, b=0.7, c=0.7, d=0.5),
    terms.SHOTerm(S0=1.3, w0=1.05, Q=3.0),
    terms.SHOTerm(S0=1.3, w0=1.05, Q=0.2),
    terms.SHOTerm(sigma=1.5, rho=3.4, tau=2.345),
    terms.Matern32Term(sigma=1.5, rho=2.345),
    terms.RotationTerm(sigma=1.5, period=3.45, Q0=1.3, dQ=1.05, f=0.5),
    terms.RealTerm(a=1.5, c=0.7) + terms.ComplexTerm(a=1.0, b=0.3, c=0.5, d=0.4),
    terms.RealTerm(a=1.5, c=0.7) * terms.ComplexTerm(a=1.0, b=0.3, c=0.5, d=0.4),
    terms.SHOTerm(S0=1.3, w0=1.05, Q=3.0) + terms.SHOTerm(S0=0.5, w0=2.0, Q=0.3),
    terms.SHOTerm(S0=1.3, w0=1.05, Q=3.0) * terms.SHOTerm(S0=0.5, w0=2.0, Q=0.8),
    terms.TermDiff(terms.ComplexTerm(a=1.5, b=0.7, c=0.7, d=0.5)),
    terms.TermConvolution(terms.SHOTerm(S0=1.3, w0=1.05, Q=3.0), 0.3),
]


@pytest.mark.parametrize("term", TEST_TERMS)
def test_matrices_match_get_value(term):
    """K built from (c, a, U, V) must equal the dense kernel function.

    For TermConvolution the semiseparable representation is exact only
    for lags >= delta (the near-field of the boxcar integral is not a
    celerite function; the reference corrects the diagonal only,
    terms.py:350-382), so those pairs are compared loosely.
    """
    rng = np.random.default_rng(40582)
    t = np.sort(rng.uniform(0, 10, 60))
    diag = rng.uniform(0.1, 0.5, 60)

    c, a, U, V = term.get_celerite_matrices(t, diag)
    K_ss = np.asarray(ops.to_dense(jnp.asarray(t), c, a, U, V))
    K_fn = np.asarray(term.to_dense(t, diag))
    if isinstance(term, terms.TermConvolution):
        tau = np.abs(t[:, None] - t[None, :])
        far = (tau == 0.0) | (tau >= float(term.delta))
        np.testing.assert_allclose(
            K_ss[far], K_fn[far], rtol=1e-9, atol=1e-10
        )
        np.testing.assert_allclose(K_ss, K_fn, atol=2e-3)
    else:
        np.testing.assert_allclose(K_ss, K_fn, rtol=1e-9, atol=1e-10)


@pytest.mark.parametrize("term", TEST_TERMS)
def test_dot_vs_dense(term):
    rng = np.random.default_rng(3084)
    t = np.sort(rng.uniform(0, 10, 50))
    diag = rng.uniform(0.1, 0.5, 50)
    y = rng.normal(size=(50, 3))

    # near-field approximation for TermConvolution (see above)
    atol = 2e-2 if isinstance(term, terms.TermConvolution) else 1e-9
    rtol = 1e-3 if isinstance(term, terms.TermConvolution) else 1e-8

    z = term.dot(t, diag, y)
    K = np.asarray(term.to_dense(t, diag))
    np.testing.assert_allclose(z, K @ y, rtol=rtol, atol=atol)

    zv = term.dot(t, diag, y[:, 0])
    np.testing.assert_allclose(zv, K @ y[:, 0], rtol=rtol, atol=atol)


def test_psd_consistency():
    """PSD from coefficients must match the closed-form SHO PSD."""
    sho = terms.SHOTerm(S0=1.3, w0=1.05, Q=3.0)
    w = np.linspace(0.01, 10.0, 100)
    psd_closed = sho.get_psd(w)
    equiv = terms.ComplexTerm(
        a=float(sho.S0 * sho.w0 * sho.Q),
        b=float(sho.S0 * sho.w0 * sho.Q / np.sqrt(4 * 3.0**2 - 1)),
        c=float(0.5 * sho.w0 / sho.Q),
        d=float(0.5 * sho.w0 / sho.Q * np.sqrt(4 * 3.0**2 - 1)),
    )
    np.testing.assert_allclose(
        psd_closed, equiv.get_psd(w), rtol=1e-6, atol=1e-9
    )


def test_sho_parameterizations():
    w0, Q = 1.7, 2.3
    S0 = 0.9
    base = terms.SHOTerm(w0=w0, Q=Q, S0=S0)
    alt1 = terms.SHOTerm(rho=2 * np.pi / w0, Q=Q, S0=S0)
    alt2 = terms.SHOTerm(w0=w0, tau=2 * Q / w0, S0=S0)
    alt3 = terms.SHOTerm(w0=w0, Q=Q, sigma=np.sqrt(S0 * w0 * Q))
    tau = np.linspace(0, 5, 50)
    for alt in (alt1, alt2, alt3):
        np.testing.assert_allclose(
            alt.get_value(tau), base.get_value(tau), rtol=1e-12
        )

    with pytest.raises(ValueError):
        terms.SHOTerm(w0=w0, rho=1.0, Q=Q, S0=S0)
    with pytest.raises(ValueError):
        terms.SHOTerm(w0=w0, Q=Q)


def test_sho_q_half_continuity():
    """Branchless SHO must be continuous through Q = 1/2."""
    tau = np.linspace(0, 5, 100)
    lo = terms.SHOTerm(S0=1.0, w0=1.0, Q=0.5 - 1e-6).get_value(tau)
    hi = terms.SHOTerm(S0=1.0, w0=1.0, Q=0.5 + 1e-6).get_value(tau)
    np.testing.assert_allclose(lo, hi, atol=1e-4)


def test_sho_traceable_q():
    """Q must be traceable: grads flow through the branchless select."""
    t = np.sort(np.random.default_rng(0).uniform(0, 10, 30))

    def f(q):
        term = terms.SHOTerm(S0=1.0, w0=1.0, Q=q)
        c, a, U, V = term.get_celerite_matrices(t, jnp.full(30, 0.1))
        d, W = ops.factor(jnp.asarray(t), c, a, U, V)
        return jnp.sum(jnp.log(d))

    for q in (0.2, 0.7, 3.0):
        g = jax.grad(f)(jnp.asarray(q))
        assert np.isfinite(g)

    # jit with traced Q
    jf = jax.jit(f)
    np.testing.assert_allclose(jf(jnp.asarray(3.0)), f(3.0), rtol=1e-12)


def test_terms_are_pytrees():
    term = terms.SHOTerm(S0=1.3, w0=1.05, Q=3.0) + terms.RealTerm(a=1.0, c=0.5)
    leaves, treedef = jax.tree_util.tree_flatten(term)
    assert len(leaves) == 6  # S0, w0, Q, eps, a, c
    term2 = jax.tree_util.tree_unflatten(treedef, leaves)
    tau = np.linspace(0, 5, 10)
    np.testing.assert_allclose(term2.get_value(tau), term.get_value(tau))


def test_term_width():
    assert terms.RealTerm(a=1.0, c=0.5).width == 1
    assert terms.ComplexTerm(a=1.0, b=0.1, c=0.5, d=0.4).width == 2
    assert terms.SHOTerm(S0=1.0, w0=1.0, Q=3.0).width == 2
    assert terms.RotationTerm(
        sigma=1.5, period=3.45, Q0=1.3, dQ=1.05, f=0.5
    ).width == 4
    s = terms.SHOTerm(S0=1.0, w0=1.0, Q=3.0) + terms.RealTerm(a=1.0, c=0.5)
    assert s.width == 3
    p = terms.SHOTerm(S0=1.0, w0=1.0, Q=3.0) * terms.RealTerm(a=1.0, c=0.5)
    assert p.width == 2


def test_convolution_must_be_outer():
    conv = terms.TermConvolution(terms.RealTerm(a=1.0, c=0.5), 0.1)
    other = terms.RealTerm(a=1.0, c=0.5)
    with pytest.raises(TypeError):
        conv + other
    with pytest.raises(TypeError):
        conv * other
    with pytest.raises(TypeError):
        terms.TermDiff(conv)


def test_convolution_value_continuity():
    base = terms.SHOTerm(S0=1.3, w0=1.05, Q=3.0)
    conv = terms.TermConvolution(base, 0.5)
    lo = conv.get_value(np.asarray([0.5 - 1e-8]))
    hi = conv.get_value(np.asarray([0.5 + 1e-8]))
    np.testing.assert_allclose(lo, hi, rtol=1e-5)
    # converges to base kernel as delta -> 0
    small = terms.TermConvolution(base, 1e-5)
    tau = np.linspace(0.0, 4, 30)
    np.testing.assert_allclose(
        small.get_value(tau), base.get_value(tau), rtol=1e-4, atol=2e-6
    )
