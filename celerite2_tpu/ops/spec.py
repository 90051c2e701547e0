"""The op schema: one table describing every semiseparable op.

Role of the reference's ``definitions.json`` + ``spec/generate.py``
(reference python/celerite2/definitions.json:1-383): a single source of
truth for op signatures.  The reference re-reads its JSON at runtime
for shape inference in two binding layers and emits C++ from it; here
the ops are plain JAX functions (shapes flow through tracing), so the
table serves (a) programmatic shape VALIDATION (:func:`validate_call`),
(b) test parametrization across every op and backend, and (c)
documentation of the dimension bindings.

Dimension symbols: ``N`` rows, ``J`` celerite width, ``K`` right-hand
sides, ``M`` secondary rows (general matmuls).
"""

from __future__ import annotations

from typing import NamedTuple

__all__ = ["OpSpec", "OPS", "validate_call"]


class OpSpec(NamedTuple):
    name: str
    inputs: tuple  # (arg_name, shape_symbols) pairs
    outputs: tuple
    has_rev: bool
    rev_extra_inputs: tuple = ()  # residuals consumed by the adjoint


_T = ("t", ("N",))
_C = ("c", ("J",))

OPS = {
    "factor": OpSpec(
        name="factor",
        inputs=(_T, _C, ("a", ("N",)), ("U", ("N", "J")),
                ("V", ("N", "J"))),
        outputs=(("d", ("N",)), ("W", ("N", "J"))),
        has_rev=True,
        rev_extra_inputs=(("S", ("N", "J", "J")),),
    ),
    "solve_lower": OpSpec(
        name="solve_lower",
        inputs=(_T, _C, ("U", ("N", "J")), ("W", ("N", "J")),
                ("Y", ("N", "K"))),
        outputs=(("Z", ("N", "K")),),
        has_rev=True,
        rev_extra_inputs=(("F", ("N", "J", "K")),),
    ),
    "solve_upper": OpSpec(
        name="solve_upper",
        inputs=(_T, _C, ("U", ("N", "J")), ("W", ("N", "J")),
                ("Y", ("N", "K"))),
        outputs=(("Z", ("N", "K")),),
        has_rev=True,
        rev_extra_inputs=(("F", ("N", "J", "K")),),
    ),
    "matmul_lower": OpSpec(
        name="matmul_lower",
        inputs=(_T, _C, ("U", ("N", "J")), ("V", ("N", "J")),
                ("Y", ("N", "K"))),
        outputs=(("Z", ("N", "K")),),
        has_rev=True,
        rev_extra_inputs=(("F", ("N", "J", "K")),),
    ),
    "matmul_upper": OpSpec(
        name="matmul_upper",
        inputs=(_T, _C, ("U", ("N", "J")), ("V", ("N", "J")),
                ("Y", ("N", "K"))),
        outputs=(("Z", ("N", "K")),),
        has_rev=True,
        rev_extra_inputs=(("F", ("N", "J", "K")),),
    ),
    # rectangular cross-covariance products: forward-only, like the
    # reference (definitions.json:264 — no adjoint)
    "general_matmul_lower": OpSpec(
        name="general_matmul_lower",
        inputs=(("t1", ("N",)), ("t2", ("M",)), _C,
                ("U", ("N", "J")), ("V", ("M", "J")),
                ("Y", ("M", "K"))),
        outputs=(("Z", ("N", "K")),),
        has_rev=False,
    ),
    "general_matmul_upper": OpSpec(
        name="general_matmul_upper",
        inputs=(("t1", ("N",)), ("t2", ("M",)), _C,
                ("U", ("N", "J")), ("V", ("M", "J")),
                ("Y", ("M", "K"))),
        outputs=(("Z", ("N", "K")),),
        has_rev=False,
    ),
    "to_dense": OpSpec(
        name="to_dense",
        inputs=(_T, _C, ("a", ("N",)), ("U", ("N", "J")),
                ("V", ("N", "J"))),
        outputs=(("K", ("N", "N")),),
        has_rev=False,
    ),
}


def _bind(sym, size, bindings, arg, errors):
    if sym in bindings:
        if bindings[sym] != size:
            errors.append(
                f"{arg}: dimension {sym}={size} conflicts with "
                f"{sym}={bindings[sym]}"
            )
    else:
        bindings[sym] = size


def validate_call(op_name: str, *args):
    """Check argument ranks and dimension consistency against the
    schema; returns the resolved ``{symbol: size}`` bindings."""
    spec = OPS[op_name]
    if len(args) != len(spec.inputs):
        raise ValueError(
            f"{op_name} expects {len(spec.inputs)} arguments "
            f"({', '.join(n for n, _ in spec.inputs)}), got {len(args)}"
        )
    bindings: dict = {}
    errors: list = []
    for (arg_name, symbols), value in zip(spec.inputs, args):
        shape = tuple(getattr(value, "shape", ()))
        if len(shape) != len(symbols):
            errors.append(
                f"{arg_name}: expected rank {len(symbols)} "
                f"{symbols}, got shape {shape}"
            )
            continue
        for sym, size in zip(symbols, shape):
            _bind(sym, size, bindings, arg_name, errors)
    if errors:
        raise ValueError(
            f"invalid arguments for {op_name}: " + "; ".join(errors)
        )
    return bindings
