"""The full multi-chip training step: sharded-chain HMC over a
(chains, seq) mesh.

Parallelism map for this framework (SURVEY.md section 2.4):
  * dp  = ``chains`` axis — each device group owns a slice of the
    MCMC chains (embarrassingly parallel).
  * sp/cp = ``seq`` axis — the length-N recursions are sharded with
    O(J^2) carry exchange (celerite2_tpu.parallel.sharded).
  * tp/pp/ep — intentionally out of scope: the model dimension is
    J <= 32 (reference terms.hpp:10-12), far too small to shard.

The step is one fixed-length-leapfrog HMC transition for every chain:
fixed iteration counts keep all ``seq`` peers in lockstep (a NUTS
step's data-dependent trajectory length is run with the chains axis
only; see inference/sampler.py).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from celerite2_tpu.parallel.sharded import sharded_loglik

__all__ = ["make_hmc_train_step"]


def make_hmc_train_step(
    kernel_builder: Callable,
    t,
    y,
    yerr,
    mesh: Mesh,
    *,
    step_size: float = 0.01,
    num_leapfrog: int = 3,
    prior_scale: float = 3.0,
):
    """Build ``(step_fn, init_fn)`` for sharded-chain HMC.

    ``kernel_builder(theta) -> Term`` maps an unconstrained parameter
    vector to a kernel.  ``step_fn(qs, keys) -> (qs', accept)`` is jit-
    compiled over the mesh with chains sharded on the ``chains`` axis
    and the data axis sharded on ``seq``.
    """
    t = jnp.asarray(t)
    y = jnp.asarray(y)
    yerr = jnp.broadcast_to(jnp.asarray(yerr), t.shape)
    dtype = t.dtype

    def local_logdensity(theta, t_l, y_l, yerr_l):
        """Per-chain log-posterior on the local sequence shard (the
        collectives inside sharded_loglik stitch shards together)."""
        kernel = kernel_builder(theta)
        c, a_l, U_l, V_l = kernel.get_celerite_matrices(
            t_l, yerr_l**2
        )
        ll = sharded_loglik(t_l, c, a_l, U_l, V_l, y_l, axis_name="seq")
        prior = -0.5 * jnp.sum((theta / prior_scale) ** 2)
        return ll + prior

    def body(qs, keys, t_l, y_l, yerr_l):
        """shard_map body: qs (C_local, dim), keys (C_local, 2)."""

        def one_chain(q, key):
            logd = lambda th: local_logdensity(  # noqa: E731
                th, t_l, y_l, yerr_l
            )
            val_grad = jax.value_and_grad(logd)
            k1, k2 = jax.random.split(key)
            p0 = jax.random.normal(k1, q.shape, dtype)
            logp0, g = val_grad(q)
            h0 = -logp0 + 0.5 * jnp.sum(p0**2)

            def leap(carry, _):
                q, p, g = carry
                p = p + 0.5 * step_size * g
                q = q + step_size * p
                logp, g = val_grad(q)
                p = p + 0.5 * step_size * g
                return (q, p, g), None

            (q1, p1, _), _ = lax.scan(
                leap, (q, p0, g), None, length=num_leapfrog
            )
            logp1 = logd(q1)
            h1 = -logp1 + 0.5 * jnp.sum(p1**2)
            accept = jnp.log(jax.random.uniform(k2, (), dtype)) < (
                h0 - h1
            )
            return jnp.where(accept, q1, q), accept

        return jax.vmap(one_chain)(qs, keys)

    step_fn = jax.jit(
        jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(
                P("chains", None),  # chain states
                P("chains", None),  # chain keys
                P("seq"),  # t
                P("seq"),  # y
                P("seq"),  # yerr
            ),
            out_specs=(P("chains", None), P("chains")),
        ),
        static_argnums=(),
    )

    chain_spec = NamedSharding(mesh, P("chains", None))

    def init_fn(num_chains, dim, key):
        qs = 0.1 * jax.random.normal(key, (num_chains, dim), dtype)
        keys = jax.vmap(jax.random.fold_in, (None, 0))(
            key, jnp.arange(num_chains)
        )
        return (
            jax.device_put(qs, chain_spec),
            jax.device_put(keys, chain_spec),
        )

    def run_step(qs, keys):
        return step_fn(qs, keys, t, y, yerr)

    return run_step, init_fn
