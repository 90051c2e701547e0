"""PyMC (pytensor) integration layer.

The reference ships a full pytensor backend — per-op ``Op`` wrappers
over its C driver (``pymc/ops.py:38-141``), a pytensor term DSL
(``pymc/terms.py``), a GP subclass (``pymc/celerite2.py:82-155``) and a
``CeleriteNormal`` distribution (``pymc/distribution.py:32-128``) —
because its compute lives in C and every node of the model graph must
be a pytensor node.

This framework's compute lives in JAX, so the TPU-native bridge is the
opposite shape: ONE black-box likelihood ``Op`` whose ``perform`` calls
a jitted JAX function and whose ``grad`` chains into a companion VJP
``Op`` (hand-derived O(N J^2) adjoints and tier dispatch come along for
free), plus a ``jax_funcify`` registration so PyMC's JAX-based samplers
(``pymc.sampling.jax`` / numpyro / blackjax) strip the pytensor shell
entirely and run the pure-JAX graph — on TPU — with zero per-leapfrog
boundary crossings.  Kernels are built with this package's own term
DSL inside the wrapped function; no pytensor term re-implementation is
needed (and none would be traceable by XLA anyway).

Like :mod:`celerite2_tpu.distributions` (the numpyro adapter), the
behavior lives in a pytensor-independent core (:class:`LoglikCore`,
:func:`perform_value`, :func:`perform_grad`) so the full contract is
tested even when pymc/pytensor are absent from the environment; the
gated shell is thin.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "HAS_PYTENSOR",
    "LoglikCore",
    "celerite_loglik_op",
    "marginal",
]


class LoglikCore:
    """pytensor-independent engine of the black-box likelihood Op.

    Wraps ``fn(*params) -> scalar`` (typically a closure over
    :func:`celerite2_tpu.gp.gp_loglik` with fixed data) with cached
    jitted value and VJP callables operating on host numpy arrays, the
    contract a pytensor ``Op.perform`` needs.  Non-PD kernels follow
    the library's quiet semantics (branchless ``-inf``), which
    ``pm.Potential`` / ``check_parameters`` turn into a rejected step —
    the role of the reference's ``factor_quiet`` + ``pt.switch``
    (``pymc/celerite2.py:38-52``).
    """

    def __init__(self, fn):
        self.fn = fn
        self._value = jax.jit(fn)
        # VJP with a cotangent argument (not plain grad): pytensor's
        # L_op supplies the output gradient, and chaining through it
        # keeps second-order graphs honest.
        self._vjp = jax.jit(partial(self._vjp_impl, fn))

    @staticmethod
    def _vjp_impl(fn, ct, *params):
        out, pull = jax.vjp(fn, *params)
        del out
        return pull(ct)

    def value(self, *params):
        return np.asarray(self._value(*params))

    def grad(self, ct, *params):
        return tuple(np.asarray(g) for g in self._vjp(ct, *params))


def perform_value(core, inputs, output_storage):
    """``Op.perform`` body for the value Op (pure function so the
    plumbing is testable without pytensor): writes the scalar loglik
    into ``output_storage[0][0]`` preserving the input float dtype."""
    out = core.value(*inputs)
    dt = np.result_type(*[np.asarray(i).dtype for i in inputs])
    output_storage[0][0] = np.asarray(out, dtype=dt)


def perform_grad(core, inputs, output_storage):
    """``Op.perform`` body for the VJP Op: ``inputs`` is
    ``(ct, *params)``; writes one cotangent per parameter."""
    ct, *params = inputs
    grads = core.grad(np.asarray(ct), *params)
    for slot, p, g in zip(output_storage, params, grads):
        slot[0] = np.asarray(g, dtype=np.asarray(p).dtype)


def make_gp_loglik_fn(make_kernel, t, y, *, yerr=None, diag=None, mean=0.0):
    """Close :func:`~celerite2_tpu.gp.gp_loglik` over fixed data:
    returns ``fn(*params) -> scalar`` with the kernel built by
    ``make_kernel(*params)`` (this package's term DSL; branchless, so
    any parameter may be sampled).

    Data is captured as NUMPY so the jitted closures embed it as HLO
    literals — closing over device arrays costs ~40 ms/call of
    constant re-upload on the axon TPU runtime (CLAUDE.md rule).
    """
    from celerite2_tpu.gp import gp_loglik

    t = np.asarray(t)
    y = np.asarray(y)
    yerr = None if yerr is None else np.asarray(yerr)
    diag = None if diag is None else np.asarray(diag)

    def fn(*params):
        params = tuple(jnp.asarray(p) for p in params)
        return gp_loglik(
            make_kernel(*params), t, y, yerr=yerr, diag=diag, mean=mean
        )

    return fn


try:  # pragma: no cover - pytensor is optional and absent in this image
    import pytensor.tensor as pt
    from pytensor.graph import basic
    from pytensor.graph import op as pt_op
    from pytensor.link.jax.dispatch import jax_funcify

    HAS_PYTENSOR = True

    # NOTE: no __props__ on either Op: props-based equality would make
    # ops wrapping DIFFERENT cores/data compare equal and let
    # pytensor's merge rewrite collapse distinct likelihoods; the
    # default identity equality is the correct semantics here.
    class _CeleriteLoglikGradOp(pt_op.Op):
        def __init__(self, core):
            self.core = core
            super().__init__()

        def make_node(self, ct, *params):
            ct = pt.as_tensor_variable(ct)
            params = [pt.as_tensor_variable(p) for p in params]
            return basic.Apply(self, [ct, *params], [p.type() for p in params])

        def infer_shape(self, fgraph, node, shapes):
            return shapes[1:]

        def perform(self, node, inputs, output_storage):
            perform_grad(self.core, inputs, output_storage)

    class CeleriteLoglikOp(pt_op.Op):
        """Scalar GP log-likelihood as a pytensor Op (role of the whole
        reference ``pymc/ops.py`` op family, collapsed to one node)."""

        def __init__(self, core):
            self.core = core
            self._grad_op = _CeleriteLoglikGradOp(core)
            super().__init__()

        def make_node(self, *params):
            params = [pt.as_tensor_variable(p) for p in params]
            out = pt.TensorType(params[0].dtype, ())()
            return basic.Apply(self, params, [out])

        def infer_shape(self, fgraph, node, shapes):
            return [()]

        def perform(self, node, inputs, output_storage):
            perform_value(self.core, inputs, output_storage)

        def grad(self, inputs, output_grads):
            # return_list: with ONE parameter __call__ would hand back
            # a bare Variable, and list() would symbolically iterate it
            return self._grad_op(
                output_grads[0], *inputs, return_list=True
            )

    @jax_funcify.register(CeleriteLoglikOp)
    def _jax_funcify_loglik(op, **kwargs):
        # PyMC's JAX samplers get the raw traced function: the model
        # compiles to one XLA program (runs on TPU), pytensor is gone.
        return op.core.fn

    @jax_funcify.register(_CeleriteLoglikGradOp)
    def _jax_funcify_loglik_grad(op, node=None, **kwargs):
        vjp = partial(LoglikCore._vjp_impl, op.core.fn)
        if node is not None and len(node.outputs) == 1:
            # single-output nodes must return the array, not a 1-tuple
            def vjp_single(ct, *params):
                return vjp(ct, *params)[0]

            return vjp_single
        return vjp

except ImportError:  # pytensor/pymc not installed

    HAS_PYTENSOR = False

    class CeleriteLoglikOp:  # type: ignore[no-redef]
        """Fallback when pytensor is absent: keeps the core reachable
        (``.core``) so tests exercise the full perform/VJP contract,
        but symbolic use needs the real dependency."""

        def __init__(self, core):
            self.core = core

        def __call__(self, *params):
            raise ImportError(
                "pymc/pytensor is not installed; use the built-in "
                "inference engine (celerite2_tpu.inference), or install "
                "pymc to use this Op in a model"
            )


def celerite_loglik_op(make_kernel, t, y, *, yerr=None, diag=None, mean=0.0):
    """Build the marginal-likelihood Op for a PyMC model.

    Example::

        op = celerite_loglik_op(
            lambda s, r, tau: terms.SHOTerm(sigma=s, rho=r, tau=tau),
            t, y, yerr=yerr)
        with pm.Model():
            s = pm.HalfNormal("sigma", 1.0)
            ...
            pm.Potential("gp", op(s, r, tau))

    Works under both pytensor's C/perform path (jitted JAX called per
    leapfrog) and its JAX linker (fused into the sampler's XLA
    program).
    """
    return CeleriteLoglikOp(
        LoglikCore(make_gp_loglik_fn(make_kernel, t, y, yerr=yerr, diag=diag, mean=mean))
    )


def marginal(name, make_kernel, params, t, y, *, yerr=None, diag=None, mean=0.0, model=None):
    """Attach the GP marginal likelihood to the current PyMC model as a
    ``Potential`` (role of reference ``GaussianProcess.marginal``,
    ``pymc/celerite2.py:82-106``, including the citation bookkeeping).
    """
    import pymc as pm

    from celerite2_tpu.citation import CITATIONS

    model = pm.modelcontext(model)
    if not hasattr(model, "__citations__"):
        model.__citations__ = dict()
    model.__citations__["celerite2_tpu"] = CITATIONS

    op = celerite_loglik_op(make_kernel, t, y, yerr=yerr, diag=diag, mean=mean)
    return pm.Potential(name, op(*params), model=model)
