"""User-defined operator functions (reference
``numerics/ad/operator_functions.py:43``).

:class:`Function` wraps a jax-traceable callable into a factory of
``evaluate`` DAG nodes; derivatives come from jax tracing rather than the
reference's AdArray-aware callables.
"""

from __future__ import annotations

from typing import Callable, Optional

from porepy_tpu.numerics.ad.operators import Operations, Operator, _wrap

__all__ = ["Function"]


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
