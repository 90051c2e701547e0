"""Associative reverse sweeps vs the scan reverse sweeps (exact parity)."""

import jax.numpy as jnp
import numpy as np
import pytest

from celerite2_tpu.ops import assoc, scan
from celerite2_tpu.testing import get_matrices


@pytest.fixture(scope="module")
def sys50():
    t, c, a, U, V, Y = get_matrices(size=50)
    args = tuple(map(jnp.asarray, (t, c, a, U, V)))
    d, W, S = scan.factor_scan(*args)
    return args, jnp.asarray(Y), d, W, S


def _rand_like(x, seed):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=np.shape(x)))


def test_factor_rev_assoc_matches_scan(sys50):
    (t, c, a, U, V), Y, d, W, S = sys50
    bd = _rand_like(d, 1)
    bW = _rand_like(W, 2)
    out1 = scan.factor_rev_scan(t, c, a, U, V, d, W, S, bd, bW)
    out2 = assoc.factor_rev_assoc(t, c, a, U, V, d, W, S, bd, bW)
    for x1, x2, name in zip(out1, out2, ["bt", "bc", "ba", "bU", "bV"]):
        np.testing.assert_allclose(
            x2, x1, rtol=1e-8, atol=1e-10, err_msg=name
        )


@pytest.mark.parametrize("upper", [False, True])
@pytest.mark.parametrize("is_solve", [False, True])
def test_sweep_rev_assoc_matches_scan(sys50, is_solve, upper):
    (t, c, a, U, V), Y, d, W, S = sys50

    if is_solve:
        A, B = (W, U) if upper else (U, W)
        Z, F = (
            scan.solve_upper_scan(t, c, U, W, Y)
            if upper
            else scan.solve_lower_scan(t, c, U, W, Y)
        )
    else:
        A, B = (V, U) if upper else (U, V)
        Z, F = (
            scan.matmul_upper_scan(t, c, U, V, Y)
            if upper
            else scan.matmul_lower_scan(t, c, U, V, Y)
        )

    bZ = _rand_like(Z, 3)
    out1 = scan.sweep_rev_scan(
        t, c, A, B, Y, Z, F, bZ, is_solve=is_solve, upper=upper
    )
    out2 = assoc.sweep_rev_assoc(
        t, c, A, B, Y, Z, F, bZ, is_solve=is_solve, upper=upper
    )
    for x1, x2, name in zip(out1, out2, ["bt", "bc", "bA", "bB", "bY"]):
        np.testing.assert_allclose(
            x2, x1, rtol=1e-8, atol=1e-10, err_msg=name
        )


@pytest.mark.slow
def test_two_level_prefix_matches_associative_scan():
    """The sqrt(N)-blocked engine must agree with lax.associative_scan
    for a non-commutative monoid, both directions, padded sizes."""
    import jax
    from jax import lax
    from celerite2_tpu.ops.assoc import (
        _id_affine,
        _mat_affine_combine,
        two_level_prefix,
    )

    rng = np.random.default_rng(0)
    for n in (1, 2, 17, 100, 257):
        A = jnp.asarray(
            np.eye(3) + 0.1 * rng.normal(size=(n, 3, 3))
        )
        b = jnp.asarray(rng.normal(size=(n, 3, 2)))
        for reverse in (False, True):
            ref = lax.associative_scan(
                _mat_affine_combine, (A, b), reverse=reverse
            )
            out = two_level_prefix(
                _mat_affine_combine, (A, b), _id_affine,
                reverse=reverse,
            )
            for r, o in zip(ref, out):
                np.testing.assert_allclose(
                    o, r, rtol=1e-12, atol=1e-13,
                    err_msg=f"n={n} reverse={reverse}",
                )


def test_small_inv_well_conditioned_matches_dense():
    import numpy as np

    from celerite2_tpu.ops.assoc import _small_inv

    rng = np.random.default_rng(7)
    for J in (1, 2, 3, 4, 5, 6, 8):
        M = np.eye(J) + 0.3 * rng.normal(size=(5, J, J))
        # keep them comfortably invertible
        M = M + 2.0 * np.eye(J)
        inv = np.asarray(_small_inv(jnp.asarray(M)))
        np.testing.assert_allclose(
            inv, np.linalg.inv(M), rtol=1e-9, atol=1e-10
        )


def test_small_inv_singular_leading_block_stays_finite():
    """Invertibility of the full matrix does not imply invertibility of
    its leading 2x2 block; the unpivoted Schur recursion must degrade to
    finite (quiet-failure) values, never inf/NaN."""
    import numpy as np

    from celerite2_tpu.ops.assoc import _small_inv

    # exactly singular leading 2x2 block, full matrix well-conditioned
    M = np.array(
        [
            [1.0, 2.0, 0.5, 0.0],
            [2.0, 4.0, 0.0, 0.5],
            [0.5, 0.0, 3.0, 0.1],
            [0.0, 0.5, 0.1, 3.0],
        ]
    )
    assert abs(np.linalg.det(M[:2, :2])) < 1e-12
    assert np.linalg.cond(M) < 1e3
    out = np.asarray(_small_inv(jnp.asarray(M)))
    assert np.all(np.isfinite(out))


@pytest.mark.parametrize("J_width", [6, 8])
def test_factor_rev_assoc_wide_J(J_width):
    """The structured reverse engine must match the scan reverse at wide
    J (the round-1 J<=4 materialization limit is gone).  J=6 exercises a
    SHO-mixture width; J=8 a TermProduct width."""
    from celerite2_tpu.models.terms import SHOTerm

    kern = SHOTerm(S0=1.0, w0=0.5, Q=2.0)
    for k in range(1, J_width // 2):
        kern = kern + SHOTerm(S0=0.5 / k, w0=0.5 + k, Q=1.0 + k)
    t, c, a, U, V, Y = get_matrices(size=80, kernel=kern)
    assert U.shape[1] == J_width

    args = tuple(map(jnp.asarray, (t, c, a, U, V)))
    d, W, S = scan.factor_scan(*args)
    rng = np.random.default_rng(5)
    bd = jnp.asarray(rng.normal(size=d.shape))
    bW = jnp.asarray(rng.normal(size=W.shape))

    ref = scan.factor_rev_scan(*args, d, W, S, bd, bW)
    out = assoc.factor_rev_assoc(*args, d, W, S, bd, bW)
    for r, o in zip(ref, out):
        np.testing.assert_allclose(o, r, rtol=1e-8, atol=1e-9)


@pytest.mark.slow
def test_frev_suffix_states_block_invariance():
    """The structured engine result must not depend on the block size."""
    from celerite2_tpu.ops.assoc import _frev_suffix_states

    rng = np.random.default_rng(9)
    M, J = 50, 3
    par = (
        jnp.asarray(rng.uniform(0.5, 1.0, (M, J))),
        jnp.asarray(0.3 * rng.normal(size=(M, J))),
        jnp.asarray(0.3 * rng.normal(size=(M, J))),
        jnp.asarray(rng.normal(size=(M, J))),
        jnp.asarray(rng.normal(size=(M,))),
    )
    ref = _frev_suffix_states(par, block=64)  # single block
    for blk in (1, 4, 16, 33):
        out = _frev_suffix_states(par, block=blk)
        np.testing.assert_allclose(out, ref, rtol=1e-9, atol=1e-11)
