"""The experimental Pallas affine-prefix engine (interpret mode on CPU)
must match the generic two-level engine exactly."""

import jax.numpy as jnp
import numpy as np
import pytest

from celerite2_tpu.ops.assoc import (
    _id_affine,
    _mat_affine_combine,
    two_level_prefix,
)
from celerite2_tpu.ops.pallas_engine import two_level_prefix_affine


@pytest.mark.parametrize(
    "N,D,K,blk",
    [(200, 2, 1, 16), (130, 4, 1, 32), (64, 2, 3, 8), (1000, 4, 4, 64)],
)
def test_pallas_affine_prefix_matches_generic(N, D, K, blk):
    rng = np.random.default_rng(0)
    A = jnp.asarray(0.9 * np.eye(D) + 0.05 * rng.normal(size=(N, D, D)))
    b = jnp.asarray(rng.normal(size=(N, D, K)))
    refA, refb = two_level_prefix(
        _mat_affine_combine, (A, b), _id_affine, block=blk
    )
    outA, outb = two_level_prefix_affine(A, b, block=blk, interpret=True)
    np.testing.assert_allclose(outA, refA, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(outb, refb, rtol=1e-10, atol=1e-12)


def test_pallas_affine_prefix_reverse():
    rng = np.random.default_rng(1)
    N, D, K = 100, 2, 1
    A = jnp.asarray(0.9 * np.eye(D) + 0.05 * rng.normal(size=(N, D, D)))
    b = jnp.asarray(rng.normal(size=(N, D, K)))
    refA, refb = two_level_prefix(
        _mat_affine_combine, (A, b), _id_affine, block=16, reverse=True
    )
    outA, outb = two_level_prefix_affine(
        A, b, block=16, reverse=True, interpret=True
    )
    np.testing.assert_allclose(outA, refA, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(outb, refb, rtol=1e-10, atol=1e-12)
