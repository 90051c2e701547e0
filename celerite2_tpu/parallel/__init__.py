from celerite2_tpu.parallel.mesh import (
    P,
    chain_sharding,
    initialize_distributed,
    make_mesh,
    seq_sharding,
)
from celerite2_tpu.parallel.sharded import (
    make_sharded_logdensity,
    sharded_conditional_variance,
    sharded_apply_inverse,
    sharded_dot_tril,
    sharded_factor,
    sharded_loglik,
    sharded_matmul_lower,
    sharded_matmul_upper,
    sharded_predict_mean,
    sharded_solve_lower,
    sharded_solve_upper,
)

__all__ = [
    "initialize_distributed",
    "make_mesh",
    "chain_sharding",
    "seq_sharding",
    "P",
    "sharded_loglik",
    "sharded_factor",
    "sharded_solve_lower",
    "sharded_solve_upper",
    "sharded_matmul_lower",
    "sharded_matmul_upper",
    "sharded_apply_inverse",
    "sharded_dot_tril",
    "sharded_predict_mean",
    "sharded_conditional_variance",
    "make_sharded_logdensity",
]
