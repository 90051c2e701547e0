from celerite2_tpu.ops.api import (
    factor,
    factor_solve,
    general_matmul_lower,
    general_matmul_upper,
    matmul_lower,
    matmul_upper,
    solve_lower,
    solve_upper,
    to_dense,
)

__all__ = [
    "factor",
    "factor_solve",
    "solve_lower",
    "solve_upper",
    "matmul_lower",
    "matmul_upper",
    "general_matmul_lower",
    "general_matmul_upper",
    "to_dense",
]
