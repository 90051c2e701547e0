"""Small shared utilities.

Equivalent of the reference's ``celerite2::utils::search_sorted``
(/root/reference/c++/include/celerite2/utils.hpp:13-26) and the
``LinAlgError`` raised by its bindings (driver.hpp:13-19).
"""

from __future__ import annotations

import jax.numpy as jnp


class LinAlgError(Exception):
    """Raised when the celerite matrix is not positive definite.

    Mirrors the error contract of the reference bindings
    (driver.cpp:62, driver.hpp:13-19): raised eagerly by the NumPy-style
    API; traced code paths use the ``quiet`` semantics (log_det -> -inf)
    instead.
    """


def search_sorted(a, v, *, side: str = "right"):
    """Vectorized sorted search; jnp.searchsorted with the celerite
    convention (first index where ``a[i] > v``)."""
    return jnp.searchsorted(a, v, side=side)


def as_f(x, dtype=None):
    """Convert to a floating-point jnp array (weak promotion preserved)."""
    x = jnp.asarray(x, dtype=dtype)
    if not jnp.issubdtype(x.dtype, jnp.floating):
        x = x.astype(jnp.result_type(float))
    return x
