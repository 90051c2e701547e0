"""Backend dispatch for the semiseparable ops.

Two regimes matter on TPU:

* **Heavily batched** (e.g. thousands of vmapped NUTS chains): the plain
  ``lax.scan`` recursions are best — every sequential step carries a full
  batch of (J,)/(J,J) work, so the chip stays busy and no parallel-scan
  overhead is paid.
* **Single / few large-N evaluations**: sequential depth dominates, so the
  log-depth associative-scan formulations win.

``Config.backend`` picks explicitly; "auto" uses N and the abstract batch
context (vmap adds leading dims before we get here, so plain heuristics on
N suffice — vmapped calls see the same N).
"""

from __future__ import annotations

from celerite2_tpu.config import get_config
from celerite2_tpu.ops import scan as _scan


def _use_parallel(n: int) -> bool:
    cfg = get_config()
    if cfg.backend == "scan":
        return False
    if cfg.backend in ("assoc", "blocked"):
        return True
    return n >= cfg.assoc_threshold


def factor_impl(t, c, a, U, V):
    if _use_parallel(t.shape[0]):
        from celerite2_tpu.ops import assoc as _assoc

        return _assoc.factor_assoc(t, c, a, U, V)
    return _scan.factor_scan(t, c, a, U, V)


def solve_lower_impl(t, c, U, W, Y):
    if _use_parallel(t.shape[0]):
        from celerite2_tpu.ops import assoc as _assoc

        return _assoc.solve_lower_assoc(t, c, U, W, Y)
    return _scan.solve_lower_scan(t, c, U, W, Y)


def solve_upper_impl(t, c, U, W, Y):
    if _use_parallel(t.shape[0]):
        from celerite2_tpu.ops import assoc as _assoc

        return _assoc.solve_upper_assoc(t, c, U, W, Y)
    return _scan.solve_upper_scan(t, c, U, W, Y)


def matmul_lower_impl(t, c, U, V, Y):
    if _use_parallel(t.shape[0]):
        from celerite2_tpu.ops import assoc as _assoc

        return _assoc.matmul_lower_assoc(t, c, U, V, Y)
    return _scan.matmul_lower_scan(t, c, U, V, Y)


def matmul_upper_impl(t, c, U, V, Y):
    if _use_parallel(t.shape[0]):
        from celerite2_tpu.ops import assoc as _assoc

        return _assoc.matmul_upper_assoc(t, c, U, V, Y)
    return _scan.matmul_upper_scan(t, c, U, V, Y)


# ------------------------------------------------------ reverse sweeps


def factor_rev_impl(t, c, a, U, V, d, W, S, bd, bW):
    # the J^2-dim affine elements cost O(N J^4) memory; only worth it
    # (and affordable) for small J where latency dominates
    if _use_parallel(t.shape[0]) and U.shape[1] <= 4:
        from celerite2_tpu.ops import assoc as _assoc

        return _assoc.factor_rev_assoc(t, c, a, U, V, d, W, S, bd, bW)
    return _scan.factor_rev_scan(t, c, a, U, V, d, W, S, bd, bW)


def sweep_rev_impl(t, c, A, B, Y, Z, F, bZ, *, is_solve, upper):
    if _use_parallel(t.shape[0]):
        from celerite2_tpu.ops import assoc as _assoc

        return _assoc.sweep_rev_assoc(
            t, c, A, B, Y, Z, F, bZ, is_solve=is_solve, upper=upper
        )
    return _scan.sweep_rev_scan(
        t, c, A, B, Y, Z, F, bZ, is_solve=is_solve, upper=upper
    )
