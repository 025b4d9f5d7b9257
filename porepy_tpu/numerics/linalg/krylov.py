"""Device-resident Krylov solvers on sparse matrices.

The TPU-native replacement for the reference's direct-solver backends
(PyPardiso/UMFPACK, ``models/solution_strategy.py:830-877``): BCOO
matrix-vector products (segment-sum gathers, MXU-friendly batching comes
with the Pallas SpMV kernel) driving jax's GMRES/BiCGStab, with a Jacobi
preconditioner. Host scipy remains the default for small/parity runs.
"""

from __future__ import annotations

import logging
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sps
from jax.experimental import sparse as jsparse

__all__ = ["solve_sparse", "jacobi_preconditioner", "FALLBACK_COUNTER"]

logger = logging.getLogger(__name__)

#: Number of times a device Krylov solve missed tolerance and fell back to
#: the host direct solver (observable from SolverStatistics and tests).
FALLBACK_COUNTER = {"count": 0}


def jacobi_preconditioner(A: sps.spmatrix):
    d = np.asarray(A.diagonal())
    d = np.where(np.abs(d) > 1e-300, d, 1.0)
    inv = jnp.asarray(1.0 / d)

    def M(x):
        return inv * x

    return M


@partial(jax.jit, static_argnames=("method", "tol", "maxiter"))
def _krylov(bcoo, b, diag_inv, method: str, tol: float, maxiter: int):
    def matvec(x):
        if hasattr(bcoo, "matvec"):
            return bcoo.matvec(x)
        return bcoo @ x

    def precond(x):
        return diag_inv * x

    if method == "gmres":
        x, _ = jax.scipy.sparse.linalg.gmres(
            matvec, b, M=precond, tol=tol, maxiter=maxiter, restart=30,
            solve_method="batched",
        )
    else:
        x, _ = jax.scipy.sparse.linalg.bicgstab(
            matvec, b, M=precond, tol=tol, maxiter=maxiter
        )
    return x


def solve_sparse(
    A: sps.spmatrix,
    b: np.ndarray,
    method: str = "bicgstab",
    tol: float = 1e-12,
    maxiter: Optional[int] = None,
) -> np.ndarray:
    """Solve ``A x = b`` with a jitted Krylov method; falls back to host
    scipy if the iteration does not reach ``tol``."""
    A = A.tocsr()
    n = A.shape[0]
    if maxiter is None:
        maxiter = max(200, 4 * n)
    from porepy_tpu.numerics.ad.compiler import scipy_to_bcoo
    bcoo = scipy_to_bcoo(A)
    d = np.asarray(A.diagonal())
    d = np.where(np.abs(d) > 1e-300, d, 1.0)
    x = _krylov(bcoo, jnp.asarray(b), jnp.asarray(1.0 / d), method, tol, maxiter)
    x_np = np.asarray(x)
    res = np.linalg.norm(b - A @ x_np)
    b_norm = np.linalg.norm(b)
    if not np.isfinite(res) or res > max(tol * max(b_norm, 1.0) * 1e3, 1e-8):
        FALLBACK_COUNTER["count"] += 1
        logger.warning(
            "Device %s missed tolerance (|r|=%.2e, |b|=%.2e); falling back "
            "to host spsolve (fallback #%d). Consider a stronger "
            "preconditioner or the block-preconditioned solver.",
            method,
            res,
            b_norm,
            FALLBACK_COUNTER["count"],
        )
        x_np = sps.linalg.spsolve(A, b)
    return x_np
