"""Elementwise AD function library.

Parity counterpart of reference ``numerics/ad/functions.py:60-487``. Each
function takes operators and returns an ``evaluate`` DAG node whose payload
is a jnp function — derivatives come from jax, so no hand-written chain
rules. ``maximum`` (the basis of contact complementarity equations) follows
the reference's derivative convention: where the arguments tie, the
derivative follows the *first* argument.
"""

from __future__ import annotations

from typing import Callable, Optional, Union

import jax.numpy as jnp
import numpy as np

from porepy_tpu.numerics.ad.operators import Operations, Operator, _wrap

__all__ = [
    "exp",
    "log",
    "sign",
    "abs",
    "sin",
    "cos",
    "tan",
    "arcsin",
    "arccos",
    "arctan",
    "sinh",
    "cosh",
    "tanh",
    "arcsinh",
    "arccosh",
    "arctanh",
    "heaviside",
    "heaviside_smooth",
    "maximum",
    "characteristic_function",
    "l2_norm",
]


def _fn_op(
    func: Callable, args: tuple, name: str, pattern_fn: Optional[Callable] = None
) -> Operator:
    children = []
    for a in args:
        w = _wrap(a)
        if w is NotImplemented:
            raise TypeError(f"Cannot use {a!r} in ad function {name}")
        children.append(w)
    op = Operator(name=name, operation=Operations.evaluate, children=children)
    op.func = func
    if pattern_fn is not None:
        op.func_pattern = pattern_fn
    return op


def _unary(jnp_fn: Callable, name: str):
    def wrapper(var: Union[Operator, np.ndarray, float]) -> Operator:
        return _fn_op(jnp_fn, (var,), name)

    wrapper.__name__ = name
    return wrapper


exp = _unary(jnp.exp, "exp")
log = _unary(jnp.log, "log")
sin = _unary(jnp.sin, "sin")
cos = _unary(jnp.cos, "cos")
tan = _unary(jnp.tan, "tan")
arcsin = _unary(jnp.arcsin, "arcsin")
arccos = _unary(jnp.arccos, "arccos")
arctan = _unary(jnp.arctan, "arctan")
sinh = _unary(jnp.sinh, "sinh")
cosh = _unary(jnp.cosh, "cosh")
tanh = _unary(jnp.tanh, "tanh")
arcsinh = _unary(jnp.arcsinh, "arcsinh")
arccosh = _unary(jnp.arccosh, "arccosh")
arctanh = _unary(jnp.arctanh, "arctanh")
abs = _unary(jnp.abs, "abs")  # noqa: A001 - mirrors reference export
sign = _unary(lambda x: jnp.sign(x), "sign")


def heaviside(var, zerovalue: float = 0.5) -> Operator:
    """Step function with configurable value at zero; zero derivative."""

    def f(x):
        import jax

        x = jax.lax.stop_gradient(x)
        return jnp.where(x > 0, 1.0, jnp.where(x < 0, 0.0, zerovalue))

    return _fn_op(f, (var,), "heaviside")


def heaviside_smooth(var, eps: float = 1e-3) -> Operator:
    """Smooth (arctan-based) regularized step function with true derivative
    (reference ``functions.py:289``: 0.5 + 1/pi * arctan(x/eps))."""

    def f(x):
        return 0.5 + jnp.arctan(x / eps) / jnp.pi

    return _fn_op(f, (var,), "heaviside_smooth")


def maximum(var1, var2) -> Operator:
    """Elementwise max. Derivative convention at ties: follows the first
    argument (matches reference ``functions.py:360`` which checks
    ``val2 > val1`` to switch rows)."""

    def f(a, b):
        import jax

        a_arr, b_arr = jnp.broadcast_arrays(jnp.asarray(a), jnp.asarray(b))
        take_second = jax.lax.stop_gradient(b_arr > a_arr)
        return jnp.where(take_second, b_arr, a_arr)

    return _fn_op(f, (var1, var2), "maximum")


def safe_power(power: float, zero_val: float, tol: float, var) -> Operator:
    """``x ** power`` for entries with ``|x| > tol``, ``zero_val``
    elsewhere — negative powers without division by zero (reference
    ``functions.py:145``). The derivative weight is
    ``power * out**(power-1)`` everywhere, matching the reference's
    Jacobian convention."""
    import jax

    def _val(x):
        nz = jnp.abs(x) > tol
        xs = jnp.where(nz, x, 1.0)
        return jnp.where(nz, xs**power, zero_val)

    f = jax.custom_jvp(_val)

    @f.defjvp
    def _jvp(primals, tangents):
        (x,) = primals
        (dx,) = tangents
        out = _val(x)
        return out, power * out ** (power - 1.0) * dx

    return _fn_op(f, (var,), "safe_power")


def characteristic_function(tol: float, var) -> Operator:
    """1 where ``|x| <= tol`` else 0; zero derivative (reference
    ``functions.py:422``)."""

    def f(x):
        import jax

        x = jax.lax.stop_gradient(x)
        return jnp.where(jnp.abs(x) <= tol, 1.0, 0.0)

    return _fn_op(f, (var,), "characteristic_function")


def _safe_l2(nd, x):
    return jnp.linalg.norm(x.reshape(-1, nd), axis=1)


def _safe_l2_jvp(nd, primals, tangents):
    # Zero vectors get unit Jacobian weight on every component instead of
    # the undefined 0/0 (reference ``functions.py:120``: semismooth Newton
    # needs a valid subgradient at the sticking state).
    (x,) = primals
    (dx,) = tangents
    xr = x.reshape(-1, nd)
    dxr = dx.reshape(-1, nd)
    val = jnp.linalg.norm(xr, axis=1)
    safe = val > 1e-12
    w = jnp.where(
        safe[:, None], xr / jnp.where(safe, val, 1.0)[:, None], 1.0
    )
    return val, (w * dxr).sum(axis=1)


def l2_norm(nd: int, var: Operator) -> Operator:
    """Cell-wise Euclidean norm of a vector quantity stored
    component-major per cell (F-order: ``[x0, y0, x1, y1, ...]``), matching
    reference ``functions.py:447``. Output has ``n/nd`` rows."""
    import jax

    f = jax.custom_jvp(lambda x: _safe_l2(nd, x))
    f.defjvp(lambda primals, tangents: _safe_l2_jvp(nd, primals, tangents))

    def pattern_fn(child_patterns, ndof):
        import scipy.sparse as sps

        p = child_patterns[0].tocsr()
        n = p.shape[0] // nd
        # Row-compression: OR the nd component rows of each cell.
        rows = np.repeat(np.arange(n), nd)
        compress = sps.csr_matrix(
            (np.ones(n * nd, dtype=bool), (rows, np.arange(n * nd))),
            shape=(n, n * nd),
        )
        return (compress @ p).astype(bool).tocsr()

    return _fn_op(f, (var,), "l2_norm", pattern_fn=pattern_fn)
