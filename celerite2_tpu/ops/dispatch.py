"""Backend dispatch for the semiseparable ops.

Measured regimes (v5e, N=1e5, J=2, f32, loglik+grad, in-graph):

* **"scan"** — plain ``lax.scan``, ~2.1 s/eval on TPU (the faithful
  port of the reference's sequential algorithm).  Right only for tiny
  N; even vmapped chain fleets run ~10x faster on the assoc tier.
* **"assoc"** — the parallel-composition formulations, ~2.3 ms/eval on
  TPU (~800x the sequential baseline; ~0.3 ms at N=1e3).  Internally
  picks an engine: ``two_level_prefix`` (recursive blocked plain
  scans) on TPU, where ``lax.associative_scan`` takes minutes to
  *compile*; the true log-depth associative scan elsewhere.
* **"pallas"** — hand-written sequential Mosaic kernels, ~170 ms/eval.
  Strictly per-row recursions are latency-bound at ~500+ cycles/row on
  TPU whenever a reduction sits on the carried dependency (measured:
  rolls and cross-lane reductions each cost ~100-600 cycles of carried
  latency), which is why the batched-across-blocks assoc tier wins.
  Kept as an explicit backend and as the wide-J reverse fallback.

``Config.backend`` picks explicitly; "auto" = assoc above
``assoc_threshold`` rows, else scan.  Pallas kernels keep carries in
VMEM scratch across sequential grid steps, which is incompatible with
vmap's batch-axis-prepends-grid rule — every pallas entry point is
wrapped in ``jax.custom_batching.custom_vmap`` whose batch rule falls
back to the vmapped ``lax.scan`` tier.

Cache pairing: the factor cache convention differs between the packed
(pre-transport symmetric, packed (N, Jp^2)) and tiled/scan/assoc tiers
(one-sided transported (N, J, J)); forward and reverse always route by
the same (platform, N, J, K), so a custom_vjp residual is produced and
consumed by a compatible tier.
"""

from __future__ import annotations

import functools
import logging

import jax

from celerite2_tpu.config import get_config
from celerite2_tpu.ops import scan as _scan
from celerite2_tpu.ops.spec import validate_call

_logger = logging.getLogger("celerite2_tpu")


@functools.cache
def _warn_unpacked(op: str, j: int, k) -> None:
    """One-time notice when a shape misses the fast packed kernels
    (no silent tier cliffs)."""
    _logger.warning(
        "%s with J=%d%s is outside the packed Pallas kernel limits "
        "(K=1, J<=8); falling back to the ~13x slower tiled kernels",
        op,
        j,
        "" if k is None else f", K={k}",
    )

_SCAN_TWIN = {
    "factor_pallas": "factor_scan",
    "solve_lower_pallas": "solve_lower_scan",
    "solve_upper_pallas": "solve_upper_scan",
    "matmul_lower_pallas": "matmul_lower_scan",
    "matmul_upper_pallas": "matmul_upper_scan",
    "factor_rev_pallas": "factor_rev_scan",
    "sweep_rev_pallas": "sweep_rev_scan",
    "factor_packed": "factor_scan",
    "solve_lower_packed": "solve_lower_scan",
    "solve_upper_packed": "solve_upper_scan",
    "matmul_lower_packed": "matmul_lower_scan",
    "matmul_upper_packed": "matmul_upper_scan",
    "factor_rev_packed": "factor_rev_scan",
    "sweep_rev_packed": "sweep_rev_scan",
}


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _backend(n: int, ref=None) -> str:
    cfg = get_config()
    if cfg.backend == "pallas":
        # grid setup dominates tiny systems; keep them on the scan tier
        return "pallas" if n >= cfg.pallas_threshold else "scan"
    if cfg.backend != "auto":
        return cfg.backend
    if ref is not None and not isinstance(ref, jax.core.Tracer):
        # eager call: the scan tier runs as ONE compiled loop, while
        # the assoc engine would dispatch hundreds of individual ops
        # through the (high-latency) device tunnel
        return "scan"
    # the assoc tier picks a platform-appropriate engine internally
    # (multi-level blocked scan on TPU, lax.associative_scan elsewhere)
    thr = cfg.assoc_threshold
    if thr is None:
        if _on_tpu():
            # The engine wins in-graph from N~256 up, but its graph
            # inside VMAPPED samplers with data-dependent while loops
            # (NUTS tree doubling) costs minutes of XLA compile — and
            # vmapped evaluation also amortizes the scan tier's
            # per-step latency across the batch.  So: batched traces
            # stay conservative; plain jit models get the fast tier
            # from N=256.  Set assoc_threshold explicitly (e.g. 64)
            # for long production runs at moderate N.
            from celerite2_tpu.ops.assoc import _vmapped

            thr = 4096 if _vmapped(ref) else 256
        else:
            thr = 1024
    return "assoc" if n >= thr else "scan"


def _batch_rule(scan_fn, axis_size, in_batched, *args):
    in_axes = tuple(0 if b else None for b in in_batched)
    out = jax.vmap(scan_fn, in_axes=in_axes)(*args)
    out_batched = jax.tree_util.tree_map(lambda _: True, out)
    return out, out_batched


def _factor_packed_rule(scan_fn, axis_size, in_batched, t, c, a, U, V):
    """Scan fallback for the packed factor: reproduce its (Sh, ShT)
    packed cache pair from the scan tier's S_half by pad + transpose."""
    import jax.numpy as jnp

    from celerite2_tpu.ops import pallas_packed as pp

    in_axes = tuple(0 if b else None for b in in_batched)
    d, W, S_half = jax.vmap(scan_fn, in_axes=in_axes)(t, c, a, U, V)
    J = U.shape[-1]
    Jp = pp._pow2_width(J)
    pad = Jp - J
    Sp = jnp.pad(S_half, ((0, 0), (0, 0), (0, pad), (0, pad)))
    b, n = Sp.shape[:2]
    Sh = Sp.reshape(b, n, Jp * Jp)
    ShT = jnp.swapaxes(Sp, -1, -2).reshape(b, n, Jp * Jp)
    return (d, W, (Sh, ShT)), (True, True, (True, True))


def _factor_rev_packed_rule(scan_fn, axis_size, in_batched,
                            t, c, a, U, V, d, W, S_pair, bd, bW):
    from celerite2_tpu.ops import pallas_packed as pp

    Sh_pack, _ = S_pair
    J = U.shape[-1]
    Jp = pp._pow2_width(J)
    shp = Sh_pack.shape
    S_std = Sh_pack.reshape(*shp[:-1], Jp, Jp)[..., :J, :J]
    args = (t, c, a, U, V, d, W, S_std, bd, bW)
    flat_batched = (
        tuple(in_batched[:7])
        + (in_batched[7][0],)
        + tuple(in_batched[8:])
    )
    in_axes = tuple(0 if b else None for b in flat_batched)
    out = jax.vmap(scan_fn, in_axes=in_axes)(*args)
    return out, jax.tree_util.tree_map(lambda _: True, out)


@functools.cache
def _pallas_cv(name: str, block_size: int, **flags):
    """custom_vmap wrapper: pallas on the direct path, vmapped scan on
    any batched path.  The packed factor's cache pair differs from the
    scan tier's S_half, so its rules convert; residuals stay consistent
    because the vjp forward and backward route identically."""
    from celerite2_tpu.ops import pallas_kernels as pk
    from celerite2_tpu.ops import pallas_packed as pp

    mod = pp if name.endswith("_packed") else pk
    pallas_fn = functools.partial(
        getattr(mod, name), block_size=block_size, **flags
    )
    scan_fn = functools.partial(
        getattr(_scan, _SCAN_TWIN[name]), **flags
    )

    cv = jax.custom_batching.custom_vmap(pallas_fn)
    if name == "factor_packed":
        cv.def_vmap(functools.partial(_factor_packed_rule, scan_fn))
    elif name == "factor_rev_packed":
        cv.def_vmap(functools.partial(_factor_rev_packed_rule, scan_fn))
    else:
        cv.def_vmap(functools.partial(_batch_rule, scan_fn))
    return cv


def _pallas(name: str, block: int | None = None, **flags):
    return _pallas_cv(
        name, block or get_config().block_size, **flags
    )


def _rev_block_for(J: int, itemsize: int = 4) -> int:
    """Clamp the reverse-kernel block so its (B, J, J) VMEM-resident
    cache stream stays within a ~4 MiB budget (double-buffered, plus
    the other streams, inside the ~16 MiB VMEM) — mirrors
    pallas_packed's REV_BLOCK clamp for the wide-J tiled fallback."""
    budget = 4 * 1024 * 1024
    return max(128, min(get_config().block_size, budget // (J * J * itemsize)))


def _packable(j: int, k: int | None = None) -> bool:
    from celerite2_tpu.ops import pallas_packed as pp

    return pp.packable(j, k)


def factor_impl(t, c, a, U, V):
    validate_call("factor", t, c, a, U, V)
    b = _backend(t.shape[0], a)
    with jax.named_scope(f"celerite2.factor.{b}"):
        if b == "pallas":
            if _packable(U.shape[1]):
                name = "factor_packed"
            else:
                name = "factor_pallas"
                _warn_unpacked("factor", U.shape[1], None)
            return _pallas(name)(t, c, a, U, V)
        if b == "assoc":
            from celerite2_tpu.ops import assoc as _assoc

            return _assoc.factor_assoc(t, c, a, U, V)
        return _scan.factor_scan(t, c, a, U, V)


def factor_solve_impl(t, c, a, U, V, Y):
    """Fused factor + lower solve (the log-likelihood forward)."""
    validate_call("factor", t, c, a, U, V)
    b = _backend(t.shape[0], a)
    with jax.named_scope(f"celerite2.factor_solve.{b}"):
        if b == "assoc":
            from celerite2_tpu.ops import assoc as _assoc

            if get_config().fused_forward:
                return _assoc.factor_solve_assoc(t, c, a, U, V, Y)
            # measured faster on v5e: two lean engine passes beat one
            # fat fused pass at small J
            d, W, S = _assoc.factor_assoc(t, c, a, U, V)
            Z, F = _assoc.solve_lower_assoc(t, c, U, W, Y)
            return d, W, Z, S, F
        if b == "pallas":
            # no fused pallas kernel: compose the two pallas passes
            d, W, S = factor_impl(t, c, a, U, V)
            Z, F = _sweep_fwd("solve_lower", t, c, U, W, Y)
            return d, W, Z, S, F
        return _scan.factor_solve_scan(t, c, a, U, V, Y)


def _sweep_fwd(op: str, t, c, A, B, Y):
    validate_call(op, t, c, A, B, Y)
    bk = _backend(t.shape[0], Y)
    with jax.named_scope(f"celerite2.{op}.{bk}"):
        if bk == "pallas":
            packed = _packable(A.shape[1], Y.shape[1])
            if not packed:
                _warn_unpacked(op, A.shape[1], Y.shape[1])
            name = f"{op}_packed" if packed else f"{op}_pallas"
            return _pallas(name)(t, c, A, B, Y)
        if bk == "assoc":
            from celerite2_tpu.ops import assoc as _assoc

            return getattr(_assoc, f"{op}_assoc")(t, c, A, B, Y)
        return getattr(_scan, f"{op}_scan")(t, c, A, B, Y)


def solve_lower_impl(t, c, U, W, Y):
    return _sweep_fwd("solve_lower", t, c, U, W, Y)


def solve_upper_impl(t, c, U, W, Y):
    return _sweep_fwd("solve_upper", t, c, U, W, Y)


def matmul_lower_impl(t, c, U, V, Y):
    return _sweep_fwd("matmul_lower", t, c, U, V, Y)


def matmul_upper_impl(t, c, U, V, Y):
    return _sweep_fwd("matmul_upper", t, c, U, V, Y)


# ------------------------------------------------------ reverse sweeps


def factor_rev_impl(t, c, a, U, V, d, W, S, bd, bW):
    b = _backend(t.shape[0], bd)
    with jax.named_scope(f"celerite2.factor_rev.{b}"):
        return _factor_rev_routed(b, t, c, a, U, V, d, W, S, bd, bW)


def _factor_rev_routed(b, t, c, a, U, V, d, W, S, bd, bW):
    if b == "pallas":
        if _packable(U.shape[1]):
            return _pallas("factor_rev_packed")(
                t, c, a, U, V, d, W, S, bd, bW
            )
        _warn_unpacked("factor_rev", U.shape[1], None)
        return _pallas(
            "factor_rev_pallas",
            block=_rev_block_for(U.shape[1], U.dtype.itemsize),
        )(t, c, a, U, V, d, W, S, bd, bW)
    if b == "assoc":
        # the structured reverse engine keeps steps O(J^2) to apply and
        # densifies only per-block maps, so it serves ALL widths (the
        # round-1 J<=4 materialization limit is gone)
        from celerite2_tpu.ops import assoc as _assoc

        return _assoc.factor_rev_assoc(t, c, a, U, V, d, W, S, bd, bW)
    return _scan.factor_rev_scan(t, c, a, U, V, d, W, S, bd, bW)


def factor_solve_rev_impl(
    t, c, a, U, V, Y, d, W, Z, S, F, bd, bW_pub, bZ
):
    """Reverse of the fused factor+solve: one paired engine pass on the
    assoc tier (K = 1), else the chained solve-then-factor adjoints."""
    b = _backend(t.shape[0], bZ)
    if (
        b == "assoc"
        and Y.shape[1] == 1
        and get_config().paired_reverse
    ):
        from celerite2_tpu.ops import assoc as _assoc

        with jax.named_scope("celerite2.factor_solve_rev.assoc"):
            return _assoc.factor_solve_rev_assoc(
                t, c, a, U, V, Y, d, W, Z, S, F, bd, bW_pub, bZ
            )
    bt1, bc1, bU1, bW1, bY = sweep_rev_impl(
        t, c, U, W, Y, Z, F, bZ, is_solve=True, upper=False
    )
    bt2, bc2, ba, bU2, bV = factor_rev_impl(
        t, c, a, U, V, d, W, S, bd, bW_pub + bW1
    )
    return bt1 + bt2, bc1 + bc2, ba, bU1 + bU2, bV, bY


def sweep_rev_impl(t, c, A, B, Y, Z, F, bZ, *, is_solve, upper):
    b = _backend(t.shape[0], bZ)
    with jax.named_scope(f"celerite2.sweep_rev.{b}"):
        if b == "pallas":
            packed = _packable(A.shape[1], Y.shape[1])
            name = "sweep_rev_packed" if packed else "sweep_rev_pallas"
            return _pallas(name, is_solve=is_solve, upper=upper)(
                t, c, A, B, Y, Z, F, bZ
            )
        if b == "assoc":
            from celerite2_tpu.ops import assoc as _assoc

            return _assoc.sweep_rev_assoc(
                t, c, A, B, Y, Z, F, bZ, is_solve=is_solve, upper=upper
            )
        return _scan.sweep_rev_scan(
            t, c, A, B, Y, Z, F, bZ, is_solve=is_solve, upper=upper
        )
