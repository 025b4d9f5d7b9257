"""User-defined operator functions (reference
``numerics/ad/operator_functions.py:43``).

:class:`Function` wraps a jax-traceable callable into a factory of
``evaluate`` DAG nodes; derivatives come from jax tracing rather than the
reference's AdArray-aware callables.
"""

from __future__ import annotations

from typing import Callable, Optional

from porepy_tpu.numerics.ad.operators import Operations, Operator, _wrap

__all__ = ["Function", "DiagonalJacobianFunction", "InterpolatedFunction"]


class Function:
    """Elementwise (or pattern-annotated) function applicable to operators.

    Parameters:
        func: jax-traceable callable on jnp arrays.
        name: Display name.
        pattern_fn: Optional structural-sparsity rule
            ``(child_patterns, ndof) -> pattern`` for non-elementwise
            functions; defaults to the union of argument patterns.
    """

    def __init__(
        self, func: Callable, name: str = "Function", pattern_fn: Optional[Callable] = None
    ) -> None:
        self.func = func
        self.name = name
        self.pattern_fn = pattern_fn

    def __call__(self, *args) -> Operator:
        children = []
        for a in args:
            w = _wrap(a)
            if w is NotImplemented:
                raise TypeError(f"Cannot apply {self.name} to {a!r}")
            children.append(w)
        op = Operator(
            name=self.name, operation=Operations.evaluate, children=children
        )
        op.func = self.func
        if self.pattern_fn is not None:
            op.func_pattern = self.pattern_fn
        return op

    def __repr__(self) -> str:
        return f"Function({self.name})"


class DiagonalJacobianFunction(Function):
    """Function with a user-declared diagonal Jacobian scaling per argument
    (reference ``operator_functions.py:284``). With jax tracing the true
    derivative is computed automatically; the multipliers are applied as
    fixed scalings of each argument's contribution."""

    def __init__(self, func: Callable, name: str, multipliers) -> None:
        import jax.numpy as jnp

        multipliers = list(multipliers) if isinstance(multipliers, (list, tuple)) else [multipliers]

        def scaled(*args):
            scaled_args = [m * a for m, a in zip(multipliers, args)]
            return func(*scaled_args)

        super().__init__(scaled, name)
        self.multipliers = multipliers


class InterpolatedFunction(Function):
    """Multilinear table lookup as an AD operator (reference
    ``operator_functions.py:248``): the function is pre-evaluated on a
    uniform Cartesian lattice; evaluation inside the compiled residual is
    a device gather + weighted sum, differentiable by jax tracing
    (piecewise-constant multilinear gradients).

    TPU note: unlike the reference's scipy-backed lookup, the table values
    are compile-time constants of the jitted kernel, so lookups are fused
    device gathers with static shapes.
    """

    def __init__(
        self,
        func: Callable,
        name: str,
        min_val,
        max_val,
        npt,
        order: int = 1,
        preval: bool = True,
    ) -> None:
        import jax.numpy as jnp
        import numpy as np

        if order != 1:
            raise NotImplementedError(
                "Only linear interpolation order is supported"
            )
        from porepy_tpu.utils.interpolation_tables import InterpolationTable

        min_val = np.atleast_1d(np.asarray(min_val, dtype=float))
        max_val = np.atleast_1d(np.asarray(max_val, dtype=float))
        npt = np.atleast_1d(np.asarray(npt, dtype=int))
        self.table = InterpolationTable(min_val, max_val, npt, func)

        param_dim = min_val.size
        values = jnp.asarray(self.table._values[0])
        low = jnp.asarray(min_val)
        h = jnp.asarray(self.table._h)
        strides = jnp.asarray(self.table._strides.ravel())
        npt_j = jnp.asarray(npt)

        def lookup(*args):
            x = jnp.stack([jnp.atleast_1d(a) for a in args])
            rel = (x - low[:, None]) / h[:, None]
            base = jnp.clip(
                jnp.floor(rel).astype(jnp.int32), 0, npt_j[:, None] - 2
            )
            frac = rel - base
            out = 0.0
            import itertools as _it

            for incr in _it.product(range(2), repeat=param_dim):
                incr_arr = jnp.asarray(incr)[:, None]
                weight = jnp.prod(
                    frac * incr_arr + (1 - frac) * (1 - incr_arr), axis=0
                )
                flat = jnp.sum((base + incr_arr) * strides[:, None], axis=0)
                out = out + weight * values[flat]
            return out

        super().__init__(lookup, name)
