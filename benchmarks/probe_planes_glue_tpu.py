"""Isolate the planes engine's cost components on real TPU: slab prep
(layout transposes), the level-0 kernel, level-1 + distribute, and the
from_planes conversion — all chained in-graph.

Round-4 context: with routing flipped on, J=2 loglik+grad is 0.92
ms/eval, decomposing to ~0.19 ms factor fwd / ~0.39 ms factor rev
(net of dispatch noise), while the irreducible HBM traffic of each
planes pass is ~30 us.  This probe answers which stage eats the rest.

Arms (riccati J=2, E=12 planes, N=1e5):
  prep      — to_planes + slab layout only (sum the slab)
  kernel    — prep + level-0 pallas kernel (sum kernel output)
  full      — whole prefix_planes incl. recursion + distribute
  engine    — factor_assoc planes=on (adds element build + d/W extract)

Usage: timeout 1800 python -u benchmarks/probe_planes_glue_tpu.py [N] [CHAIN]
"""

import functools
import sys
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _time(fn, args, chain, label):
    fn = jax.jit(fn)
    t0 = time.time()
    v = np.asarray(jax.block_until_ready(fn(*args)))
    comp = time.time() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        v = np.asarray(jax.block_until_ready(fn(*args)))
        best = min(best, time.perf_counter() - t0)
    print(
        f"{label}: {best / chain * 1e3:.3f} ms/eval"
        f"  (compile {comp:.0f}s, val={float(v):.4f})",
        flush=True,
    )
    return best / chain


def main(N=100_000, chain=400):
    from celerite2_tpu import set_config, terms
    from celerite2_tpu.ops import assoc, planes_engine
    from celerite2_tpu.ops.planes import riccati_spec

    set_config(planes="on", backend="assoc")

    rng = np.random.default_rng(42)
    t = jnp.asarray(np.sort(rng.uniform(0, 1000, N)), jnp.float32)
    kernel = terms.SHOTerm(sigma=1.0, rho=5.0, tau=3.0)
    c0, a0, U0, V0 = kernel.get_celerite_matrices(
        t, jnp.full(N, 0.0625, t.dtype)
    )

    # riccati elements as the engine sees them (mirror factor_assoc's
    # construction shape: (N, J, J) A/Q/R)
    J = U0.shape[1]
    phi = assoc.transport(t, c0)
    A = phi[:, :, None] * jnp.eye(J, dtype=t.dtype)[None]
    Q = U0[:, :, None] * U0[:, None, :]
    R = V0[:, :, None] * V0[:, None, :] * 1e-3
    spec = riccati_spec(J, t.dtype)

    planes = spec.to_planes((A, Q, R))
    flat0, treedef = jax.tree_util.tree_flatten(planes)
    E = len(flat0)
    idents = spec.identity_scalars

    L = max(8, min(N, -(-N // (8 * 128))))
    NB = -(-N // L)

    def prep_only(*flat):
        """Slab layout only (the transposes), no kernel."""
        GB = NB
        T = -(-GB // (8 * 128))
        s = 8 if T > 1 else -(-GB // 128)
        TOT = T * s * 128
        chunk = planes_engine._pick_chunk(E, s, L, False)
        LP = -(-L // chunk) * chunk
        acc = 0.0
        for x, iv in zip(flat, idents):
            x = planes_engine._pad_last(x, NB * L - x.shape[-1], iv)
            x = x.reshape(GB, L).T
            x = jnp.concatenate(
                [x, jnp.full((L, TOT - GB), iv, x.dtype)], axis=1
            )
            if LP > L:
                x = jnp.concatenate(
                    [x, jnp.full((LP - L, TOT), iv, x.dtype)], axis=0
                )
            acc = acc + jnp.sum(x.reshape(LP, T, s, 128))
        return acc

    def prep_batched(*flat):
        """All-planes-in-one-op slab layout (the round-5 scheme)."""
        GB = NB
        T = -(-GB // (8 * 128))
        s = 8 if T > 1 else -(-GB // 128)
        TOT = T * s * 128
        chunk = planes_engine._pick_chunk(E, s, L, False)
        LP = -(-L // chunk) * chunk
        x = jnp.stack(list(flat), axis=0)  # (E, N)
        iv = jnp.asarray(idents, x.dtype)
        x = jnp.concatenate(
            [
                x,
                jnp.broadcast_to(
                    iv[:, None], (E, NB * L - x.shape[-1])
                ),
            ],
            axis=-1,
        )
        x = x.reshape(E, GB, L)
        x = jnp.concatenate(
            [
                x,
                jnp.broadcast_to(iv[:, None, None], (E, TOT - GB, L)),
            ],
            axis=1,
        )
        x = x.reshape(E, T, s, 128, L)
        x = jnp.transpose(x, (1, 4, 0, 2, 3))  # (T, L, E, s, 128)
        if LP > L:
            x = jnp.concatenate(
                [
                    x,
                    jnp.broadcast_to(
                        iv[None, None, :, None, None],
                        (T, LP - L, E, s, 128),
                    ),
                ],
                axis=1,
            )
        return jnp.sum(x)

    def kernel_arm(*flat):
        prefixes, maps = planes_engine._block_prefix_kernel(
            [x[None] for x in flat], idents, treedef, spec.combine, L, NB
        )
        return sum(jnp.sum(x) for x in prefixes) + sum(
            jnp.sum(m) for m in maps
        )

    def full_arm(A, Q, R):
        out = planes_engine.prefix_planes(spec, (A, Q, R))
        return sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(out))

    def engine_arm(a, t, c, U, V):
        d, W, S = assoc.factor_assoc(t, c, a, U, V)
        return jnp.sum(jnp.log(d)) + jnp.sum(W)

    def chained(step_fn, n_in):
        def many(*args):
            carry0 = args[0]

            def body(carry, _):
                # 1e-12 (not 0.0): a zero multiplier would be folded
                # and let XLA hoist the loop-invariant eval out
                v = step_fn(carry, *args[1:])
                return carry + 1e-12 * v, v

            _, vs = jax.lax.scan(
                body, carry0 * 1.0, None, length=chain
            )
            return vs[-1]

        return many

    flat0 = [jnp.asarray(x) for x in flat0]

    _time(
        chained(lambda f0, *rest: prep_only(f0, *rest), E),
        tuple(flat0), chain, "prep-only",
    )
    _time(
        chained(lambda f0, *rest: prep_batched(f0, *rest), E),
        tuple(flat0), chain, "prep-batched",
    )
    _time(
        chained(lambda f0, *rest: kernel_arm(f0, *rest), E),
        tuple(flat0), chain, "prep+kernel",
    )
    _time(
        chained(lambda A_, Q_, R_: full_arm(A_, Q_, R_), 3),
        (A, Q, R), chain, "full prefix_planes",
    )
    _time(
        chained(lambda a_, *rest: engine_arm(a_, *rest), 5),
        (a0, t, c0, U0, V0), chain, "factor_assoc planes=on",
    )


if __name__ == "__main__":
    a = sys.argv[1:]
    main(
        int(float(a[0])) if len(a) > 0 else 100_000,
        int(a[1]) if len(a) > 1 else 400,
    )
