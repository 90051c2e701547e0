"""Op-schema validation (role of the reference's definitions.json-driven
shape checks in jax/ops.py:75-102 and pymc/ops.py make_node)."""

import jax.numpy as jnp
import numpy as np
import pytest

from celerite2_tpu import ops
from celerite2_tpu.ops.spec import OPS, validate_call
from celerite2_tpu.testing import get_matrices


def test_every_op_has_spec_and_runs():
    t, c, a, U, V, Y = map(jnp.asarray, get_matrices(size=40))
    d, W = ops.factor(t, c, a, U, V)
    calls = {
        "factor": (t, c, a, U, V),
        "solve_lower": (t, c, U, W, Y),
        "solve_upper": (t, c, U, W, Y),
        "matmul_lower": (t, c, U, V, Y),
        "matmul_upper": (t, c, U, V, Y),
        "to_dense": (t, c, a, U, V),
    }
    t2 = jnp.linspace(-1.0, 11.0, 25)
    from celerite2_tpu.models.terms import SHOTerm

    k = SHOTerm(S0=5.0, w0=0.1, Q=3.45) + SHOTerm(S0=1.0, w0=2.5, Q=0.2)
    _, _, U2, V2 = k.get_celerite_matrices(t2, jnp.zeros_like(t2))
    calls["general_matmul_lower"] = (t2, t, c, U2, V, Y)
    calls["general_matmul_upper"] = (t2, t, c, V2, U, Y)

    for name, args in calls.items():
        bindings = validate_call(name, *args)
        assert bindings["N"] > 0 and bindings["J"] == U.shape[1]
        out = getattr(ops, name)(*args)
        leaf = out[0] if isinstance(out, tuple) else out
        assert np.all(np.isfinite(np.asarray(leaf)))
    assert set(calls) == set(OPS)


def test_shape_errors_are_informative():
    t, c, a, U, V, Y = map(jnp.asarray, get_matrices(size=40))
    with pytest.raises(ValueError, match="conflicts"):
        ops.factor(t, c, a[:-1], U, V)
    with pytest.raises(ValueError, match="rank"):
        ops.solve_lower(t, c, U, V, Y[:, 0])
    with pytest.raises(ValueError, match="arguments"):
        validate_call("factor", t, c, a)
