"""Backend dispatch for the semiseparable ops.

Three regimes matter on TPU:

* **Heavily batched** (e.g. thousands of vmapped NUTS chains): the plain
  ``lax.scan`` recursions are best — every sequential step carries a full
  batch of (J,)/(J,J) work, so the chip stays busy and no parallel-scan
  overhead is paid.
* **Single / few large-N evaluations on TPU**: XLA's while-loop costs
  ~2.5 us/row (measured, v5e), so the Pallas blockwise kernels win by
  ~two orders of magnitude.
* **Large-N on CPU/GPU**: the log-depth associative-scan formulations.
  (XLA:TPU compiles those pathologically slowly — minutes at N=1e3 —
  so "auto" never selects assoc on TPU.)

``Config.backend`` picks explicitly; "auto" uses N and the platform.
The Pallas kernels keep their carry in VMEM scratch across sequential
grid steps, which is incompatible with vmap's batch-axis-prepends-grid
rule — each pallas entry point is therefore wrapped in
``jax.custom_batching.custom_vmap`` whose batch rule falls back to the
vmapped ``lax.scan`` tier (the right algorithm for batched work anyway).
"""

from __future__ import annotations

import functools

import jax

from celerite2_tpu.config import get_config
from celerite2_tpu.ops import scan as _scan


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _backend(n: int) -> str:
    cfg = get_config()
    if cfg.backend != "auto":
        return cfg.backend
    if _on_tpu():
        return "pallas" if n >= cfg.pallas_threshold else "scan"
    return "assoc" if n >= cfg.assoc_threshold else "scan"


def _batch_rule(scan_fn, axis_size, in_batched, *args):
    in_axes = tuple(0 if b else None for b in in_batched)
    out = jax.vmap(scan_fn, in_axes=in_axes)(*args)
    out_batched = jax.tree_util.tree_map(lambda _: True, out)
    return out, out_batched


@functools.cache
def _pallas_cv(name: str, block_size: int, **flags):
    """custom_vmap wrapper: pallas on the direct path, vmapped scan on
    any batched path."""
    from celerite2_tpu.ops import pallas_kernels as pk

    pallas_fn = functools.partial(
        getattr(pk, name), block_size=block_size, **flags
    )
    scan_name = {
        "factor_pallas": "factor_scan",
        "solve_lower_pallas": "solve_lower_scan",
        "solve_upper_pallas": "solve_upper_scan",
        "matmul_lower_pallas": "matmul_lower_scan",
        "matmul_upper_pallas": "matmul_upper_scan",
        "factor_rev_pallas": "factor_rev_scan",
        "sweep_rev_pallas": "sweep_rev_scan",
    }[name]
    scan_fn = functools.partial(getattr(_scan, scan_name), **flags)

    cv = jax.custom_batching.custom_vmap(pallas_fn)
    cv.def_vmap(functools.partial(_batch_rule, scan_fn))
    return cv


def _pallas(name: str, **flags):
    return _pallas_cv(name, get_config().block_size, **flags)


def factor_impl(t, c, a, U, V):
    b = _backend(t.shape[0])
    if b == "pallas":
        return _pallas("factor_pallas")(t, c, a, U, V)
    if b == "assoc":
        from celerite2_tpu.ops import assoc as _assoc

        return _assoc.factor_assoc(t, c, a, U, V)
    return _scan.factor_scan(t, c, a, U, V)


def solve_lower_impl(t, c, U, W, Y):
    b = _backend(t.shape[0])
    if b == "pallas":
        return _pallas("solve_lower_pallas")(t, c, U, W, Y)
    if b == "assoc":
        from celerite2_tpu.ops import assoc as _assoc

        return _assoc.solve_lower_assoc(t, c, U, W, Y)
    return _scan.solve_lower_scan(t, c, U, W, Y)


def solve_upper_impl(t, c, U, W, Y):
    b = _backend(t.shape[0])
    if b == "pallas":
        return _pallas("solve_upper_pallas")(t, c, U, W, Y)
    if b == "assoc":
        from celerite2_tpu.ops import assoc as _assoc

        return _assoc.solve_upper_assoc(t, c, U, W, Y)
    return _scan.solve_upper_scan(t, c, U, W, Y)


def matmul_lower_impl(t, c, U, V, Y):
    b = _backend(t.shape[0])
    if b == "pallas":
        return _pallas("matmul_lower_pallas")(t, c, U, V, Y)
    if b == "assoc":
        from celerite2_tpu.ops import assoc as _assoc

        return _assoc.matmul_lower_assoc(t, c, U, V, Y)
    return _scan.matmul_lower_scan(t, c, U, V, Y)


def matmul_upper_impl(t, c, U, V, Y):
    b = _backend(t.shape[0])
    if b == "pallas":
        return _pallas("matmul_upper_pallas")(t, c, U, V, Y)
    if b == "assoc":
        from celerite2_tpu.ops import assoc as _assoc

        return _assoc.matmul_upper_assoc(t, c, U, V, Y)
    return _scan.matmul_upper_scan(t, c, U, V, Y)


# ------------------------------------------------------ reverse sweeps


def factor_rev_impl(t, c, a, U, V, d, W, S, bd, bW):
    b = _backend(t.shape[0])
    if b == "pallas":
        return _pallas("factor_rev_pallas")(t, c, a, U, V, d, W, S, bd, bW)
    # the J^2-dim affine elements cost O(N J^4) memory; only worth it
    # (and affordable) for small J where latency dominates
    if b == "assoc" and U.shape[1] <= 4:
        from celerite2_tpu.ops import assoc as _assoc

        return _assoc.factor_rev_assoc(t, c, a, U, V, d, W, S, bd, bW)
    return _scan.factor_rev_scan(t, c, a, U, V, d, W, S, bd, bW)


def sweep_rev_impl(t, c, A, B, Y, Z, F, bZ, *, is_solve, upper):
    b = _backend(t.shape[0])
    if b == "pallas":
        return _pallas(
            "sweep_rev_pallas", is_solve=is_solve, upper=upper
        )(t, c, A, B, Y, Z, F, bZ)
    if b == "assoc":
        from celerite2_tpu.ops import assoc as _assoc

        return _assoc.sweep_rev_assoc(
            t, c, A, B, Y, Z, F, bZ, is_solve=is_solve, upper=upper
        )
    return _scan.sweep_rev_scan(
        t, c, A, B, Y, Z, F, bZ, is_solve=is_solve, upper=upper
    )
