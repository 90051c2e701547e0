"""Shared test fixtures (role of reference python/celerite2/testing.py)."""

from __future__ import annotations

import numpy as np


def get_matrices(
    size=100,
    J=None,
    kernel=None,
    vector=False,
    conditional=False,
    include_dense=False,
    no_diag=False,
    seed=721,
):
    """Deterministic random celerite system (cf. reference
    testing.py:10-49).  Returns numpy arrays; tests promote to jnp."""
    random = np.random.default_rng(seed)
    t = np.sort(random.uniform(0, 10, size))
    if no_diag:
        diag = np.zeros_like(t)
    else:
        diag = random.uniform(0.1, 0.3, len(t))

    from celerite2_tpu.models.terms import SHOTerm

    if kernel is None:
        kernel = SHOTerm(S0=5.0, w0=0.1, Q=3.45) + SHOTerm(
            S0=1.0, w0=2.5, Q=0.2
        )
    c, a, U, V = (np.asarray(x) for x in kernel.get_celerite_matrices(t, diag))

    nrhs = 1 if vector else 4
    Y = random.normal(size=(len(t), nrhs))
    if vector:
        Y = Y[:, 0]

    out = [t, c, a, U, V, Y]

    if conditional:
        t2 = np.sort(random.uniform(-2, 12, 75))
        c2, a2, U2, V2 = (
            np.asarray(x)
            for x in kernel.get_celerite_matrices(t2, np.zeros_like(t2))
        )
        out += [t2, U2, V2]

    if include_dense:
        K = np.asarray(kernel.to_dense(t, diag))
        out.append(K)
        if conditional:
            tau = t[:, None] - t2[None, :]
            out.append(np.asarray(kernel.get_value(tau)))

    return tuple(out)
