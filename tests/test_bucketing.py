"""Width bucketing (J padded to config J_BUCKETS) must be exact: the
recursions are invariant to zero columns of U/V/W, so bucketed and
unbucketed results agree to float equality.  Mirrors the contract of the
reference's UNWRAP_CASES J-specialization (driver.hpp:27-101)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from celerite2_tpu import ops, terms
from celerite2_tpu.config import get_config, pad_width, set_config
from celerite2_tpu.testing import get_matrices


@pytest.fixture
def restore_config():
    import dataclasses

    prior = get_config()
    yield
    set_config(**dataclasses.asdict(prior))


def _j3_system(size=64):
    # J=3: one real + one complex column pair -> bucketed to 4
    kernel = terms.RealTerm(a=1.1, c=0.8) + terms.ComplexTerm(
        a=0.9, b=0.3, c=0.6, d=1.7
    )
    return get_matrices(size=size, kernel=kernel)


def test_pad_width_buckets():
    assert pad_width(1) == 1
    assert pad_width(3) == 4
    assert pad_width(5) == 8
    assert pad_width(17) == 32
    with pytest.raises(ValueError):
        pad_width(33)


def test_bucketing_bit_parity(restore_config):
    t, c, a, U, V, Y = (jnp.asarray(x) for x in _j3_system())
    assert U.shape[1] == 3

    def loss(t, c, a, U, V, Y):
        d, W = ops.factor(t, c, a, U, V)
        z = ops.solve_lower(t, c, U, W, Y)
        z = ops.solve_upper(t, c, U, W, z / d[:, None])
        m = ops.matmul_lower(t, c, U, V, Y)
        m = m + ops.matmul_upper(t, c, U, V, Y)
        return jnp.sum(jnp.log(d)) + jnp.sum(z * Y) + jnp.sum(m**2)

    grad_fn = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4)))

    set_config(bucket_widths=True)
    v1, g1 = grad_fn(t, c, a, U, V, Y)
    set_config(bucket_widths=False)
    v2, g2 = jax.jit(
        jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4))
    )(t, c, a, U, V, Y)

    np.testing.assert_allclose(v1, v2, rtol=1e-12)
    for a1, a2 in zip(g1, g2):
        np.testing.assert_allclose(a1, a2, rtol=1e-10, atol=1e-12)


def test_bucketing_shapes_unchanged(restore_config):
    """Public op outputs keep the caller's J, not the bucketed width."""
    set_config(bucket_widths=True)
    t, c, a, U, V, Y = (jnp.asarray(x) for x in _j3_system(40))
    d, W = ops.factor(t, c, a, U, V)
    assert W.shape == U.shape
    (bt, bc, ba, bU, bV) = jax.grad(
        lambda *args: jnp.sum(ops.factor(*args)[0]), argnums=(0, 1, 2, 3, 4)
    )(t, c, a, U, V)
    assert bc.shape == c.shape
    assert bU.shape == U.shape
    assert bV.shape == V.shape


def test_bucketing_gp_surface(restore_config):
    """End-to-end GP parity (loglik + conditional) at a non-bucket J."""
    from celerite2_tpu import GaussianProcess

    kernel = terms.RealTerm(a=1.1, c=0.8) + terms.ComplexTerm(
        a=0.9, b=0.3, c=0.6, d=1.7
    )
    rng = np.random.default_rng(99)
    t = np.sort(rng.uniform(0, 10, 80))
    yerr = rng.uniform(0.1, 0.2, 80)
    y = np.sin(t)

    outs = {}
    for flag in (True, False):
        set_config(bucket_widths=flag)
        gp = GaussianProcess(kernel, t=t, yerr=yerr)
        cond = gp.condition(y, t=np.linspace(0, 10, 31))
        outs[flag] = (
            np.asarray(gp.log_likelihood(y)),
            np.asarray(cond.mean),
            np.asarray(cond.variance),
        )
    for u, v in zip(outs[True], outs[False]):
        np.testing.assert_allclose(u, v, rtol=1e-10, atol=1e-12)
