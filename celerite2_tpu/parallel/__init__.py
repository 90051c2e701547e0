from celerite2_tpu.parallel.mesh import (
    P,
    chain_sharding,
    make_mesh,
    seq_sharding,
)
from celerite2_tpu.parallel.sharded import (
    make_sharded_logdensity,
    sharded_loglik,
)

__all__ = [
    "make_mesh",
    "chain_sharding",
    "seq_sharding",
    "P",
    "sharded_loglik",
    "make_sharded_logdensity",
]
