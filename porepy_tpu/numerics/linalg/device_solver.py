"""Device-resident preconditioned Krylov solve of the assembled md system.

The TPU-native replacement for the reference's host direct solvers
(PyPardiso/UMFPACK, reference ``models/solution_strategy.py:830-877``): the
Jacobian never leaves the device. Assembly (``EquationSystem.assemble_device``)
yields the nonzero data of a statically-indexed global sparse operator; this
module solves with right-preconditioned FGMRES where

- the matvec pre-gathers the nonzero data into a dense padded-row (ELL)
  value array once per solve, so every Krylov iteration is a *single* gather
  of the operand vector plus a dense multiply-reduce (the TPU-fast sparse
  form; the two-array gather compiles to a near-serial loop),
- the preconditioner is a frozen block operator built on host from a recent
  Jacobian: smoothed-aggregation AMG V-cycles per elliptic field block
  (:mod:`porepy_tpu.numerics.linalg.amg` — rigid-body-mode aware for
  elasticity), exact Schur elimination of (block-)diagonal blocks (mortar
  fluxes), and damped l1-Jacobi sweeps for anything else. Freezing the
  preconditioner across Newton iterations trades a slightly stale
  approximate inverse (still a valid right preconditioner) for zero
  per-iteration host work; it is refreshed automatically when a solve
  stalls,
- precision is mixed (FGMRES-IR): the Krylov cycles run in float32 on the
  Ruiz-equilibrated operator (TPU-native — f64 is software-emulated and
  int64 addressing serializes gathers), wrapped in float64 iterative
  refinement: one f64 true-residual matvec per restart cycle restores the
  full-precision convergence contract (rel residual down to 1e-11+). All
  device index arrays are int32.

Falls back (counted + logged) to host spsolve if the device iteration misses
tolerance — same contract as :mod:`porepy_tpu.numerics.linalg.krylov`.
"""

from __future__ import annotations

import logging
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sps

from porepy_tpu.numerics.linalg import amg
from porepy_tpu.numerics.linalg.krylov import FALLBACK_COUNTER

from porepy_tpu.utils import device_policy

__all__ = ["DeviceLinearSolver"]

logger = logging.getLogger(__name__)

# -- dense frozen block inverses -------------------------------------------------
#
# At bench-problem sizes (1e4..4e4 dofs) the TPU's weak spot is exactly what
# every sparse preconditioner is made of: scalar gathers. Measured on v5e,
# one 18k-row ELL matvec (90k nnz) costs ~0.9 ms *inside a fused loop* (the
# gather is the floor — a trivial fused op costs 0.4 us), and a 5-level AMG
# V-cycle ~7.4 ms; a preconditioned Krylov iteration can therefore never
# beat ~8 ms no matter how good the hierarchy is. A dense (n, n) GEMV, by
# contrast, is a pure MXU/HBM-bandwidth op: ~1.6 ms f32 at n=18k. So below
# a size threshold the right TPU method for each *field block* of the
# preconditioner is simply the dense inverse of that block's (per-block
# Ruiz-equilibrated, Schur-folded, frozen) matrix: build it once per
# refresh entirely on device, then every Krylov apply is ONE matmul per
# block, and FGMRES converges in a handful of iterations because the block
# sweep is exact to f32 rounding. Inverting the WHOLE equilibrated Jacobian
# this way was measured to be unstable: unpivoted block Gauss-Jordan on the
# md system shows 1e12 element growth once the elimination front crosses
# into the mortar-flux rows (NaN at the final block step). Per-block it is
# safe — the elliptic cell blocks after exact interface elimination are
# M-matrix-like, the transport/contact blocks diagonally dominant — and
# each build is validated against the host operator with automatic demotion
# to AMG/Jacobi on failure. The reference meets these systems with a host
# direct solve per Newton iteration (reference
# ``models/solution_strategy.py:830-877``); this is the MXU-native analogue
# with the factorization cost amortized across the whole Newton/time loop
# instead of paid per iteration.

_DENSE_GJ_BLOCK = 1024


def _dense_block_inv(A: jnp.ndarray) -> jnp.ndarray:
    """Inverse of a dense square matrix by blocked Gauss-Jordan elimination
    without pivoting: per block step, one small ``jnp.linalg.inv`` pivot
    (XLA's TPU LU custom call is fast below ~2k rows but pathologically
    slow above — measured 10.8 s at n=8192 on v5e, scoped-vmem crash at
    12288) and two full-width matmuls, which is exactly where the MXU wants
    to be (2n^3 total flops; ~0.6 s at n=18k). Runs as ONE fused
    ``fori_loop`` program. Unpivoted at the block level — safe here because
    every caller hands in a Ruiz-equilibrated matrix and the result is
    validated (and demoted to the sparse block preconditioner) by the
    caller. ``A.shape[0]`` must be a multiple of ``_DENSE_GJ_BLOCK``."""
    n = A.shape[0]
    b = _DENSE_GJ_BLOCK
    if n <= b:
        return jnp.linalg.inv(A)
    assert n % b == 0
    ridx = jnp.arange(n)

    def step(k, M):
        i0 = k * b
        in_k = (ridx >= i0) & (ridx < i0 + b)
        P = jax.lax.dynamic_slice(M, (i0, i0), (b, b))
        Pi = jnp.linalg.inv(P)
        R = jax.lax.dynamic_slice(M, (i0, 0), (b, n))
        C = jax.lax.dynamic_slice(M, (0, i0), (n, b))
        Rnew = jnp.dot(Pi, R, precision=jax.lax.Precision.HIGHEST)
        Cz = jnp.where(in_k[:, None], 0.0, C)
        Rmask = jnp.where(in_k[None, :], 0.0, Rnew)
        M = M - jnp.dot(Cz, Rmask, precision=jax.lax.Precision.HIGHEST)
        # Column strip: A[i,k] <- -A[i,k] @ Pi (i != k), row-k block zeroed
        # here and rewritten by the row strip below.
        Ck = -jnp.dot(Cz, Pi, precision=jax.lax.Precision.HIGHEST)
        M = jax.lax.dynamic_update_slice(M, Ck, (0, i0))
        # Row strip: A[k,j] <- Pi @ A[k,j] (j != k), A[k,k] <- Pi.
        Rfin = jax.lax.dynamic_update_slice(Rmask, Pi, (0, i0))
        M = jax.lax.dynamic_update_slice(M, Rfin, (i0, 0))
        return M

    return jax.lax.fori_loop(0, n // b, step, A)


def _dense_precond_limit() -> int:
    """Per-block size threshold below which the dense frozen block inverse
    is used on TPU. 36864^2 f32 plus inversion temporaries is the ~16 GB
    HBM edge of a v5e chip; OOM or a failed validation during the build
    demotes that block to its sparse method."""
    import os

    return int(os.environ.get("PPT_DENSE_PRECOND_MAX", "36864"))


import functools as _functools


@_functools.lru_cache(maxsize=None)
def _dense_inv_fn(ni: int, n_pad: int):
    """Jitted (cached per shape) scatter + blocked Gauss-Jordan inverse of
    an ``ni``-sized sparse block padded to ``n_pad`` (identity pad diag)."""

    def build(vals, rows, cols):
        Ad = jnp.zeros((n_pad, n_pad), jnp.float32)
        Ad = Ad.at[rows, cols].add(vals)
        if n_pad > ni:
            pad = jnp.arange(ni, n_pad, dtype=jnp.int32)
            Ad = Ad.at[pad, pad].set(1.0)
        return _dense_block_inv(Ad)

    return jax.jit(build)


def _fgmres(matvec, M, b, x0, atol, restart, max_cycles):
    """Right-preconditioned restarted FGMRES, written for XLA: CGS
    orthogonalization in matmul form (MXU), Givens least squares, early exit
    via ``lax.while_loop``. Right preconditioning keeps the recurrence in
    TRUE residual norms (``|g[j]|``), so the tolerance check needs no extra
    matvec and a frozen/approximate ``M`` cannot distort convergence
    reporting. Returns ``(x, residual_norm, total_iterations)``.

    TPU hazard: f64 literals below the f32 normal range (~1e-38) flush to
    0.0 in compiled TPU programs (observed on v5e: ``jnp.asarray(1e-290)``
    is exactly 0), silently disabling division guards and zero-pivot
    patches. All guard constants here must stay >= 1e-30."""
    n = b.shape[0]
    dtype = b.dtype

    def cycle(x, iters):
        r = b - matvec(x)
        beta = jnp.linalg.norm(r)
        V = jnp.zeros((restart + 1, n), dtype).at[0].set(
            r / jnp.maximum(beta, 1e-30)
        )
        Z = jnp.zeros((restart, n), dtype)
        H = jnp.zeros((restart + 1, restart), dtype)
        cs = jnp.zeros(restart, dtype)
        sn = jnp.zeros(restart, dtype)
        g = jnp.zeros(restart + 1, dtype).at[0].set(beta)

        def arnoldi_cond(st):
            _V, _Z, _H, _cs, _sn, g, j = st
            return (j < restart) & (jnp.abs(g[j]) > atol)

        def arnoldi(st):
            V, Z, H, cs, sn, g, j = st
            z = M(V[j])
            w = matvec(z)
            # CGS via matmul: rows of V beyond j are zero, so no mask needed.
            h = V @ w
            w = w - V.T @ h
            h2 = V @ w  # one reorthogonalization pass (CGS2)
            w = w - V.T @ h2
            h = h + h2
            hj1 = jnp.linalg.norm(w)
            V = V.at[j + 1].set(w / jnp.maximum(hj1, 1e-30))
            Z = Z.at[j].set(z)
            hfull = h.at[j + 1].set(hj1)

            def rot(i, hv):
                t = cs[i] * hv[i] + sn[i] * hv[i + 1]
                hv = hv.at[i + 1].set(-sn[i] * hv[i] + cs[i] * hv[i + 1])
                return hv.at[i].set(t)

            hfull = jax.lax.fori_loop(0, j, rot, hfull)
            denom = jnp.sqrt(hfull[j] ** 2 + hfull[j + 1] ** 2)
            c_new = hfull[j] / jnp.maximum(denom, 1e-30)
            s_new = hfull[j + 1] / jnp.maximum(denom, 1e-30)
            cs = cs.at[j].set(c_new)
            sn = sn.at[j].set(s_new)
            hfull = hfull.at[j].set(denom).at[j + 1].set(0.0)
            g = g.at[j + 1].set(-s_new * g[j]).at[j].set(c_new * g[j])
            H = H.at[:, j].set(hfull)
            return V, Z, H, cs, sn, g, j + 1

        V, Z, H, cs, sn, g, j = jax.lax.while_loop(
            arnoldi_cond, arnoldi, (V, Z, H, cs, sn, g, 0)
        )
        R = H[:restart, :restart]
        diag = jnp.diag(R)
        # Columns beyond the early-exit point (and happy breakdowns) have a
        # zero pivot; neutralizing the pivot with a matching zero rhs keeps
        # the triangular solve finite and those y entries zero.
        bad = jnp.abs(diag) < 1e-30
        R = R + jnp.diag(jnp.where(bad, 1.0, 0.0))
        gr = jnp.where(bad, 0.0, g[:restart])
        # Explicit back-substitution: the TPU TriangularSolve custom call
        # returns NaN for f64 operands (observed on v5e even with a
        # well-conditioned R); a fori_loop over a 40x40 system is free.
        def backsub(i, y):
            row = restart - 1 - i
            s = gr[row] - jnp.dot(R[row], y)
            return y.at[row].set(s / R[row, row])

        y = jax.lax.fori_loop(
            0, restart, backsub, jnp.zeros(restart, dtype)
        )
        x = x + Z.T @ y
        res = jnp.abs(g[jnp.minimum(j, restart)])
        return x, res, iters + j

    def cond(state):
        _x, res, _iters, k = state
        return (res > atol) & (k < max_cycles)

    def body(state):
        x, _res, iters, k = state
        x, res, iters = cycle(x, iters)
        return x, res, iters, k + 1

    r0 = jnp.linalg.norm(b - matvec(x0))
    x, res, iters, _ = jax.lax.while_loop(
        cond, body, (x0, r0, jnp.zeros((), jnp.int32), 0)
    )
    return x, res, iters


def _jacobi_sweeps(matvec, sinv, r, sweeps):
    """y ~= A^{-1} r by damped l1-Jacobi iteration. Unlike a Chebyshev
    polynomial (which assumes a real positive spectrum and was measured to
    AMPLIFY 14x on nonsymmetric upwind-transport blocks), the damped
    l1-sweep is bounded for arbitrary matrices and contracts on the
    diagonally dominant M-matrix blocks (transport, contact complementarity)
    it is used for. Stationary => a valid Krylov preconditioner."""
    y = sinv * r

    def body(_i, y):
        return y + sinv * (r - matvec(y))

    return jax.lax.fori_loop(1, sweeps, body, y)


def _blockdiag_inverse(
    A: sps.csr_matrix, tol: float, max_block: int = 2048
) -> Optional[sps.csr_matrix]:
    """Exact inverse of a block-diagonal matrix, one dense inverse per
    connected component of its significant-coupling graph; None if any
    component exceeds ``max_block`` (then the caller must not eliminate).
    Entries below ``tol`` are treated as absent when finding components
    but kept in the inverted blocks."""
    import scipy.sparse.csgraph as csg

    n = A.shape[0]
    coo = A.tocoo()
    keep = np.abs(coo.data) > tol
    G = sps.coo_matrix(
        (np.ones(int(keep.sum())), (coo.row[keep], coo.col[keep])),
        shape=A.shape,
    )
    ncomp, lab = csg.connected_components(
        (G + G.T) > 0, directed=False
    )
    sizes = np.bincount(lab, minlength=ncomp)
    if sizes.size and sizes.max() > max_block:
        return None
    order = np.argsort(lab, kind="stable")
    rows_l, cols_l, vals_l = [], [], []
    ptr = 0
    csr = A.tocsr()
    for comp in range(ncomp):
        size = sizes[comp]
        idx = order[ptr : ptr + size]
        ptr += size
        if size == 1:
            d = csr[idx[0], idx[0]]
            rows_l.append(idx)
            cols_l.append(idx)
            vals_l.append(np.array([1.0 / d]))
            continue
        sub = csr[idx][:, idx].toarray()
        inv = np.linalg.inv(sub)
        ii, jj = np.meshgrid(idx, idx, indexing="ij")
        rows_l.append(ii.ravel())
        cols_l.append(jj.ravel())
        vals_l.append(inv.ravel())
    return sps.csr_matrix(
        (
            np.concatenate(vals_l),
            (np.concatenate(rows_l), np.concatenate(cols_l)),
        ),
        shape=(n, n),
    )


def _ruiz_scaling(A: sps.spmatrix, iters: int = 6):
    """Symmetric Ruiz equilibration: diagonal ``d_r, d_c`` with
    ``diag(d_r) A diag(d_c)`` having unit row/col max-norms. The md/contact
    systems mix rows spanning ~10 orders of magnitude; equilibrating before
    preconditioning and Krylov is worth several digits of achievable
    accuracy."""
    B = A.tocsr().copy()
    n, m = B.shape
    d_r = np.ones(n)
    d_c = np.ones(m)
    for _ in range(iters):
        rmax = np.asarray(abs(B).max(axis=1).todense()).ravel()
        sr = 1.0 / np.sqrt(np.where(rmax > 0.0, rmax, 1.0))
        B = sps.diags(sr) @ B
        d_r *= sr
        cmax = np.asarray(abs(B).max(axis=0).todense()).ravel()
        sc = 1.0 / np.sqrt(np.where(cmax > 0.0, cmax, 1.0))
        B = B @ sps.diags(sc)
        d_c *= sc
    return d_r, d_c


class _BlockPrecondBuilder:
    """Host-side construction of the frozen block preconditioner.

    Blocks are an ordered partition of the dofs (and matching equation
    rows); each gets a method:

    - ``"amg"``: SA-AMG V-cycle on the block's (Schur-folded, optionally
      stabilized) diagonal matrix, with optional near-nullspace modes.
    - ``"eliminate"``: the block's diagonal matrix must be diagonal (mortar
      flux equations are); it is eliminated exactly — folded into every amg
      block's operator — and back-substituted after the sweep. Demoted to
      ``"jacobi"`` (with a log message) if the diagonality check fails.
    - ``"jacobi"``: fixed damped l1-Jacobi sweeps in the block (robust for
      the nonsymmetric transport/contact blocks, where polynomial methods
      assuming a real spectrum amplify).

    Application order is lower block Gauss-Seidel over the amg/jacobi
    blocks in the declared order, bracketed by the exact eliminations.
    """

    def __init__(self, blocks, methods, stabilization, near_nullspace):
        self.blocks = [
            (np.asarray(r, np.int64), np.asarray(c, np.int64)) for r, c in blocks
        ]
        self.methods = list(methods)
        self.stab = stabilization or {}
        self.nns = near_nullspace or {}
        n = sum(c.size for _r, c in self.blocks)
        cols_concat = np.concatenate([c for _r, c in self.blocks])
        if np.unique(cols_concat).size != n:
            raise ValueError("Field blocks must cover every dof exactly once")
        rows_concat = np.concatenate([r for r, _c in self.blocks])
        self._rows_concat = jnp.asarray(rows_concat.astype(np.int32))
        inv = np.empty(n, np.int64)
        inv[cols_concat] = np.arange(n)
        self._scatter_inv = jnp.asarray(inv.astype(np.int32))
        # Index arrays ride in the state pytree (arguments of the jitted
        # solve), not as closure captures: captured device arrays lower to
        # HLO literals that XLA's constant folding grinds through.
        self._splits = np.cumsum([r.size for r, _c in self.blocks])[:-1]
        # Per-block Jacobi sweep counts, frozen at the FIRST build: the
        # consumer's jitted solve bakes the apply structure in, so later
        # value refreshes must not change static sweep counts.
        self._jac_sweeps: dict[int, int] = {}
        # Per-block dense upgrade: sweep blocks at most this size get a
        # dense frozen inverse (device blocked Gauss-Jordan) instead of
        # their AMG/Jacobi method. 0 disables. Decisions are sticky per
        # block once taken (demotion on a failed validation resets it).
        self.dense_limit: int = 0
        self._block_dense: dict[int, bool] = {}

    @staticmethod
    def _cond_estimate(S_eq: sps.csr_matrix, iters: int = 8) -> float:
        """Host-side 2-norm condition estimate of the equilibrated block:
        power iteration for sigma_max, splu-backed inverse power iteration
        for sigma_min (both on ``S^T S``; deterministic seed). Returns
        ``inf`` for (numerically) singular blocks."""
        n = S_eq.shape[0]
        rng = np.random.default_rng(0xC0ED)
        v = rng.standard_normal(n)
        v /= np.linalg.norm(v)
        nw = 0.0
        for _ in range(iters):
            w = S_eq.T @ (S_eq @ v)
            nw = float(np.linalg.norm(w))
            if not np.isfinite(nw) or nw == 0.0:
                return np.inf
            v = w / nw
        smax = np.sqrt(nw)
        try:
            import warnings

            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                lu = sps.linalg.splu(S_eq.tocsc())
            u = rng.standard_normal(n)
            u /= np.linalg.norm(u)
            for _ in range(iters):
                w = lu.solve(lu.solve(u), trans="T")
                nw = float(np.linalg.norm(w))
                if not np.isfinite(nw) or nw == 0.0:
                    return np.inf
                u = w / nw
        except Exception:
            return np.inf
        smin = 1.0 / np.sqrt(nw)
        return float(smax / smin)

    def _build_dense_block(self, Sii: sps.csr_matrix) -> jnp.ndarray:
        """Dense frozen inverse of one sweep block: per-block Ruiz
        equilibration (block Gauss-Jordan is unpivoted — the raw md blocks
        span ~10 orders of magnitude), device blocked Gauss-Jordan inverse
        of the equilibrated block, diagonals folded back so the stored
        matrix is the RAW-space inverse (one GEMV per apply, consistent
        with the raw-space block sweep). Gated by a HOST-side condition
        estimate of the equilibrated operator; raises to let the caller
        demote the block.

        The gate is deliberately pull-free: on the tunneled TPU, ONE
        device->host transfer permanently degrades the process's dispatch
        path from ~0.03 ms to ~30-50 ms per dispatch (measured 2026-08-20;
        the round-4 probe validation pulled 8 probe results and poisoned
        every subsequent solve). An f32 unpivoted Gauss-Jordan inverse of
        an equilibrated block with cond ~ kappa carries relative error
        ~ kappa * eps_f32, so the 5%-accuracy contract of the old probe
        validation maps to kappa <~ 1e5 (PPT_DENSE_COND_MAX overrides).
        A mis-predicted block is caught downstream by FGMRES's TRUE
        residual recurrence + the counted host fallback, never silently."""
        ni = Sii.shape[0]
        b = _DENSE_GJ_BLOCK
        n_pad = -(-ni // b) * b
        dr, dc = _ruiz_scaling(Sii)
        coo = Sii.tocoo()
        S_eq = sps.csr_matrix(
            (dr[coo.row] * coo.data * dc[coo.col], (coo.row, coo.col)),
            shape=Sii.shape,
        )
        import os

        cond = self._cond_estimate(S_eq)
        cond_max = float(os.environ.get("PPT_DENSE_COND_MAX", "1e5"))
        if not np.isfinite(cond) or cond > cond_max:
            raise FloatingPointError(
                f"dense block inverse gated off: equilibrated cond estimate "
                f"{cond:.2e} > {cond_max:.0e} (n = {ni}; f32 Gauss-Jordan "
                f"error ~ cond * eps_f32 would breach the 5% contract)"
            )
        vals = (dr[coo.row] * coo.data * dc[coo.col]).astype(np.float32)
        inv_eq = _dense_inv_fn(ni, n_pad)(
            jnp.asarray(vals),
            jnp.asarray(coo.row.astype(np.int32)),
            jnp.asarray(coo.col.astype(np.int32)),
        )
        # Raw-space inverse: Minv = Dc inv_eq Dr (pad scales are 1).
        dcp = jnp.asarray(np.pad(dc, (0, n_pad - ni), constant_values=1.0).astype(np.float32))
        drp = jnp.asarray(np.pad(dr, (0, n_pad - ni), constant_values=1.0).astype(np.float32))
        return inv_eq * dcp[:, None] * drp[None, :]

    def build(
        self,
        A: sps.csr_matrix,
        prev_hierarchies: Optional[dict] = None,
        row_scale: Optional[np.ndarray] = None,
        col_scale: Optional[np.ndarray] = None,
    ):
        """Build (or value-refresh) the frozen preconditioner.

        ``A`` is the RAW (unequilibrated) operator; ``row_scale`` /
        ``col_scale`` are the outer Krylov's Ruiz diagonals. The block
        solves run in RAW space — the apply maps the equilibrated residual
        in and the equilibrated correction out via the diagonals
        (``M_eq(r) = Dc^{-1} M_raw(Dr^{-1} r)``). Building the blocks on
        the equilibrated operator instead was measured to DESTROY the
        elliptic blocks for SA-AMG: global two-sided Ruiz amplifies tiny
        nonsymmetric (upwinded-density) entries of fracture pressure rows
        until the pressure block is ~50% asymmetric and the V-cycle
        diverges (tracer md case: outer FGMRES stalled at 3e-3; raw-space
        blocks converge the same system to 3e-13 in two restart cycles).

        Returns ``(state, apply, hierarchies)``: ``state`` is the pure-array
        pytree consumed by the jitted solve, ``apply(state, r)`` the
        traceable application, ``hierarchies`` the host-side AMG objects
        (pass back as ``prev_hierarchies`` to reuse aggregation structure on
        a value refresh)."""
        nb = len(self.blocks)
        sub = {}
        for i, (ri, ci) in enumerate(self.blocks):
            Ar = A[ri]
            for j, (_rj, cj) in enumerate(self.blocks):
                sub[(i, j)] = Ar[:, cj].tocsr()

        elim = [i for i, m in enumerate(self.methods) if m == "eliminate"]
        dinv_mat: dict[int, sps.csr_matrix] = {}
        for j in list(elim):
            Ajj = sub[(j, j)]
            dg = Ajj.diagonal()
            off = (Ajj - sps.diags(dg)).tocoo()
            # Diagonality is judged RELATIVE to the diagonal scale:
            # AD-assembled mortar blocks carry O(1e-28) numerical-noise
            # couplings (products of tiny constants) that are structureless;
            # demoting the exact elimination over them collapses the whole
            # preconditioner at scale.
            dscale = np.abs(dg).max() if dg.size else 1.0
            significant = (
                int(np.count_nonzero(np.abs(off.data) > 1e-12 * dscale))
                if off.nnz
                else 0
            )
            if np.any(dg == 0.0):
                logger.info(
                    "Block %d has zero diagonal entries; demoting "
                    "eliminate -> jacobi",
                    j,
                )
                self.methods[j] = "jacobi"
                elim.remove(j)
                continue
            if significant:
                # Genuinely coupled (e.g. MPFA pressure traces couple the
                # mortar fluxes within each interface on non-K-orthogonal
                # meshes): eliminate exactly BLOCKWISE — one dense inverse
                # per connected coupling component.
                inv = _blockdiag_inverse(Ajj, tol=1e-12 * dscale)
                if inv is None:
                    logger.info(
                        "Block %d coupled beyond the blockwise-elimination "
                        "limit; demoting eliminate -> jacobi",
                        j,
                    )
                    self.methods[j] = "jacobi"
                    elim.remove(j)
                    continue
                logger.info(
                    "Block %d eliminated blockwise (%d significant "
                    "off-diagonal entries)",
                    j,
                    significant,
                )
                dinv_mat[j] = inv
        sweep = [i for i, m in enumerate(self.methods) if m != "eliminate"]

        n = A.shape[0]
        mdr = 1.0 / row_scale if row_scale is not None else np.ones(n)
        mdc = 1.0 / col_scale if col_scale is not None else np.ones(n)
        # The preconditioner is an approximate inverse applied inside the
        # float32 inner Krylov cycles (FGMRES-IR): every value array is f32
        # (half the gather bytes, no emulated-f64 arithmetic on TPU).
        state = {
            "dinv": {},
            "cpl": {},
            "amg": {},
            "jac": {},
            "dense": {},
            "perm_rows": self._rows_concat,
            "perm_inv": self._scatter_inv,
            "mdr": jnp.asarray(mdr.astype(np.float32)),
            "mdc": jnp.asarray(mdc.astype(np.float32)),
        }
        hierarchies = {}

        def _dinv_of(j) -> sps.csr_matrix:
            m = dinv_mat.get(j)
            if m is None:
                m = sps.diags(1.0 / sub[(j, j)].diagonal()).tocsr()
            return m

        for j in elim:
            # Uniform ELL form (K=1 for strictly diagonal blocks): the
            # elimination/back-substitution applies are one gather-multiply
            # either way.
            val, col = amg._ell_arrays(_dinv_of(j), np.float32)
            state["dinv"][j] = (jnp.asarray(val), jnp.asarray(col))
        for i in sweep:
            Sii = sub[(i, i)]
            for j in elim:
                Aij = sub[(i, j)]
                if Aij.nnz:
                    Sii = Sii - (Aij @ _dinv_of(j) @ sub[(j, i)])
            Sii = Sii.tocsr()
            if i in self.stab:
                # Raw space: user stabilization diagonals apply unscaled.
                Sii = Sii + sps.diags(
                    np.asarray(self.stab[i], dtype=np.float64)
                )
            want_dense = self._block_dense.get(
                i, 0 < Sii.shape[0] <= self.dense_limit
            )
            if want_dense:
                try:
                    state["dense"][i] = self._build_dense_block(Sii)
                    self._block_dense[i] = True
                    continue
                except Exception:
                    logger.exception(
                        "Dense inverse of block %d failed; demoting to %s",
                        i,
                        self.methods[i],
                    )
                    self._block_dense[i] = False
            if self.methods[i] == "amg":
                nns = self.nns.get(i)
                B, bs = (nns if nns is not None else (None, 1))
                prev = (prev_hierarchies or {}).get(i)
                if prev is not None:
                    prev.update_values(Sii)
                    hierarchies[i] = prev
                else:
                    hierarchies[i] = amg.build_hierarchy(Sii, B=B, block_size=bs)
                state["amg"][i] = hierarchies[i].state
            else:  # jacobi
                val, col = amg._ell_arrays(Sii, np.float32)
                # Upwind transport / complementarity blocks are acyclic in
                # their significant couplings: true-diagonal UNDAMPED Jacobi
                # is then nilpotent and solves the block exactly in depth+1
                # sweeps (damped l1 stalls on advection chains). Frozen at
                # first build; value refreshes recompute sinv only.
                if i not in self._jac_sweeps:
                    cfg = amg.flow_ordered_jacobi(Sii)
                    self._jac_sweeps[i] = cfg[1] if cfg is not None else 0
                sweeps = self._jac_sweeps[i]
                if sweeps:
                    dg = Sii.diagonal()
                    sinv = np.where(dg != 0.0, 1.0 / np.where(dg == 0, 1, dg), 0.0)
                else:
                    sinv = amg._l1_smoother(Sii)
                state["jac"][i] = {
                    "val": jnp.asarray(val),
                    "col": jnp.asarray(col),
                    "sinv": jnp.asarray(sinv.astype(np.float32)),
                }
        # Couplings used during application (frozen values, ELL form):
        # sweep blocks consume earlier sweep blocks and all elim blocks;
        # elim back-substitution consumes every sweep block.
        needed = []
        for pos, i in enumerate(sweep):
            for j in elim:
                needed.append((i, j))
            for k in sweep[:pos]:
                needed.append((i, k))
        for j in elim:
            for i in sweep:
                needed.append((j, i))
        for key in needed:
            mat = sub[key]
            if mat.nnz:
                val, col = amg._ell_arrays(mat, np.float32)
                state["cpl"][key] = (jnp.asarray(val), jnp.asarray(col))

        splits = self._splits
        methods = list(self.methods)
        dense_set = frozenset(i for i in sweep if self._block_dense.get(i))
        sizes = {i: self.blocks[i][1].size for i in sweep}

        def apply(state, r):
            # Equilibrated residual in -> raw space; block GS runs raw.
            r = r * state["mdr"]
            parts = jnp.split(r[state["perm_rows"]], splits)
            y = [None] * nb
            # Forward elimination of the (block-)diagonal blocks.
            r_red = {}
            for j in elim:
                dv, dc = state["dinv"][j]
                y[j] = amg.ell_matvec(dv, dc, parts[j])
            for i in sweep:
                ri = parts[i]
                for j in elim:
                    cpl = state["cpl"].get((i, j))
                    if cpl is not None:
                        ri = ri - amg.ell_matvec(cpl[0], cpl[1], y[j])
                r_red[i] = ri
            # Lower block Gauss-Seidel over the sweep blocks.
            for pos, i in enumerate(sweep):
                ri = r_red[i]
                for k in sweep[:pos]:
                    cpl = state["cpl"].get((i, k))
                    if cpl is not None:
                        ri = ri - amg.ell_matvec(cpl[0], cpl[1], y[k])
                if i in dense_set:
                    ni = sizes[i]
                    D = state["dense"][i]
                    rp = jnp.pad(ri.astype(jnp.float32), (0, D.shape[0] - ni))
                    y[i] = (D @ rp)[:ni].astype(ri.dtype)
                elif methods[i] == "amg":
                    y[i] = hierarchies[i].apply(state["amg"][i], ri)
                else:
                    jb = state["jac"][i]
                    mv = lambda x, jb=jb: amg.ell_matvec(jb["val"], jb["col"], x)
                    y[i] = _jacobi_sweeps(
                        mv, jb["sinv"], ri, self._jac_sweeps.get(i) or 8
                    )
            # Back-substitute the eliminated blocks.
            for j in elim:
                rj = parts[j]
                for i in sweep:
                    cpl = state["cpl"].get((j, i))
                    if cpl is not None:
                        rj = rj - amg.ell_matvec(cpl[0], cpl[1], y[i])
                dv, dc = state["dinv"][j]
                y[j] = amg.ell_matvec(dv, dc, rj)
            # Scatter-free reassembly: one gather by the precomputed inverse
            # permutation of the concatenated block order; raw correction
            # out -> equilibrated space.
            return jnp.concatenate(y)[state["perm_inv"]] * state["mdc"]

        return state, apply, hierarchies


class DeviceLinearSolver:
    """Jitted solve of ``A x = b`` for a fixed assembly structure.

    Parameters
    ----------
    system:
        ``_CompiledSystem`` from ``EquationSystem.compiled_system()`` (must be
        square: equation rows align with dofs).
    blocks:
        Optional field split: list of ``(row_indices, col_indices)`` global
        index arrays. ``None`` -> one AMG block over the whole system.
    methods:
        Per-block method (``"amg" | "eliminate" | "jacobi"``); default
        ``"amg"`` for every block.
    stabilization:
        Optional dict ``{block_position: diagonal array}`` added to that
        block's diagonal inside the preconditioner only (fixed-stress style).
    near_nullspace:
        Optional dict ``{block_position: (B, node_block_size)}`` of
        near-nullspace modes for the block's AMG (rigid body modes for
        displacement blocks).
    """

    @device_policy.on_accelerator
    def __init__(
        self,
        system,
        method: str = "gmres",
        blocks: Optional[Sequence[tuple[np.ndarray, np.ndarray]]] = None,
        methods: Optional[Sequence[str]] = None,
        stabilization: Optional[dict] = None,
        near_nullspace: Optional[dict] = None,
        tol: float = 1e-11,
        maxiter: Optional[int] = None,
        restart: int = 70,
        dense: Optional[bool] = None,
    ) -> None:
        if system.num_rows != system.shape[1]:
            raise ValueError("Device solve needs a square assembled system")
        self.system = system
        self.method = method
        self.tol = tol
        n = system.shape[1]
        self.n = n
        self.maxiter = maxiter if maxiter is not None else max(4 * restart, 280)
        self._restart = restart
        rows = system.indices_np[:, 0]
        cols = system.indices_np[:, 1]
        self._rows_np = rows
        self._cols_np = cols

        # Padded-row (ELL) pre-gather layout: ``ell_sel`` selects nnz slots
        # into a dense (n, K) value array ONCE per solve; each matvec is
        # then a single gather of x. (The fused two-gather form is the slow
        # path on TPU; see module docstring.)
        order = np.lexsort((cols, rows))
        r_sorted = rows[order]
        counts = np.bincount(r_sorted, minlength=n)
        K = max(int(counts.max()) if counts.size else 1, 1)
        pos_in_row = np.arange(rows.size) - np.repeat(
            np.concatenate([[0], np.cumsum(counts)[:-1]]), counts
        )
        # int32 throughout: TPU has no native int64 — 64-bit index arithmetic
        # lowers to paired-word ops and serializes the gathers that dominate
        # every Krylov iteration.
        ell_sel = np.full((n, K), rows.size, dtype=np.int32)
        ell_col = np.full((n, K), n, dtype=np.int32)
        ell_sel[r_sorted, pos_in_row] = order
        ell_col[r_sorted, pos_in_row] = cols[order]
        self._ell_sel = jnp.asarray(ell_sel)
        self._ell_col = jnp.asarray(ell_col)

        if blocks is None:
            blocks = [(np.arange(n), np.arange(n))]
        if methods is None:
            methods = ["amg"] * len(blocks)
        self._builder = _BlockPrecondBuilder(
            blocks, methods, stabilization, near_nullspace
        )
        self._m_state: Optional[dict] = None
        self._m_apply = None
        self._hierarchies: Optional[dict] = None
        self._jit_solve = None
        self._jit_solve_sharded = None
        self.last_stats: Optional[dict] = None
        # Optional NamedSharding over the dof axis: when set (sharded
        # execution, :mod:`porepy_tpu.parallel.sharded`), every length-n
        # Krylov vector and the (n, K) ELL value array carry an explicit
        # ``with_sharding_constraint`` so GSPMD provably keeps the dof axis
        # partitioned through the whole solve instead of all-gathering at
        # the first convenient fusion boundary.
        self._dof_sharding = None
        # Dense frozen block inverses (see module comment): auto-on for
        # TPU-resident systems whose sweep blocks fit under the HBM
        # threshold, explicit True/False overrides (tests force it on CPU;
        # huge systems force it off). The upgrade is PER BLOCK, decided and
        # validated inside the builder.
        if dense is None:
            dense = (
                jax.default_backend() == "tpu"
                and n <= _dense_precond_limit()
            )
        if dense:
            self._builder.dense_limit = _dense_precond_limit()

    # -- preconditioner lifecycle ---------------------------------------------

    @property
    def _dense(self) -> bool:
        """True when dense frozen block inverses are active (before the
        first build: configured to be attempted)."""
        if self._builder._block_dense:
            return any(self._builder._block_dense.values())
        return self._builder.dense_limit > 0

    def _host_matrix(self, data) -> sps.csr_matrix:
        return sps.csr_matrix(
            (np.asarray(data), (self._rows_np, self._cols_np)),
            shape=self.system.shape,
        )

    @device_policy.on_accelerator
    def refresh_preconditioner(self, data) -> None:
        """(Re)build the frozen preconditioner from the given Jacobian
        nonzeros: Ruiz-equilibrate, then build the block preconditioner on
        the equilibrated operator. Reuses aggregation structure when it
        exists. On TPU, sweep blocks under the HBM threshold take dense
        frozen inverses (see module comment); failures demote per block."""
        A = self._host_matrix(data)
        d_r, d_c = _ruiz_scaling(A)
        # The Krylov iterates on the equilibrated operator; the block
        # preconditioner is built on the RAW matrix (see build()) and maps
        # between the spaces with the Ruiz diagonals itself.
        self._m_state, self._m_apply, self._hierarchies = self._builder.build(
            A,
            prev_hierarchies=self._hierarchies,
            row_scale=d_r,
            col_scale=d_c,
        )
        self._m_state["dr"] = jnp.asarray(d_r)
        self._m_state["dc"] = jnp.asarray(d_c)
        self._m_state["dc1"] = jnp.asarray(np.append(d_c, 1.0))
        self._ensure_jit()

    def _ensure_jit(self) -> None:
        if self._jit_solve is None:
            inner = jax.jit(self._make_solve())
            self._jit_solve_inner = inner
            self._jit_solve = lambda data, b, x0, m_state, tol: inner(
                data, b, x0, m_state, tol, self._ell_sel, self._ell_col
            )
        if self._dof_sharding is not None and self._jit_solve_sharded is None:
            inner_s = jax.jit(self._make_solve(self._dof_sharding))
            self._jit_solve_sharded = lambda data, b, x0, m_state, tol: inner_s(
                data, b, x0, m_state, tol, self._ell_sel, self._ell_col
            )

    def _solve_fn(self, data):
        """The jitted solve matching the input's placement: the
        sharding-constrained program for multi-device operands, the plain
        one otherwise (and under an outer trace)."""
        if (
            self._dof_sharding is not None
            and self._jit_solve_sharded is not None
            and isinstance(data, jax.Array)
            and not isinstance(data, jax.core.Tracer)
            and len(data.sharding.device_set) > 1
        ):
            return self._jit_solve_sharded
        return self._jit_solve

    def invalidate_preconditioner(self) -> None:
        """Force a rebuild at the next solve (call after rediscretization)."""
        self._m_state = None

    def set_dof_sharding(self, sharding) -> None:
        """Pin the dof axis to ``sharding`` (a ``NamedSharding`` over the
        solve's vectors; ``None`` removes the pin). The constrained program
        is kept SEPARATE from the single-device one — ``_solve_jit`` picks
        by the input's device set, so one solver object serves both the
        sharded Newton loop and single-device calls."""
        self._dof_sharding = sharding
        self._jit_solve_sharded = None

    # -- kernels ---------------------------------------------------------------

    @property
    def solve_args(self) -> tuple:
        """Static index operands of the jitted solve; pass through an outer
        trace (e.g. the fused Newton loop) so they stay arguments instead
        of becoming embedded constants."""
        return (self._ell_sel, self._ell_col)

    def _make_solve(self, shard=None):
        restart = self._restart
        max_cycles = max(-(-self.maxiter // restart), 1)
        wsc = (
            (lambda v: v)
            if shard is None
            else (lambda v: jax.lax.with_sharding_constraint(v, shard))
        )

        def solve(data, b, x0, m_state, tol, ell_sel, ell_col):
            data_p = jnp.concatenate([data, jnp.zeros(1, data.dtype)])
            # Sharded execution: pin the pre-gathered (n, K) ELL value
            # array and every length-n vector to the dof sharding — the
            # matvec is then row-local (gathers of the operand vector are
            # the only implied collectives).
            val = wsc(data_p[ell_sel])
            dr, dc, dc1 = m_state["dr"], m_state["dc"], m_state["dc1"]
            # Solve the Ruiz-equilibrated system (Dr A Dc) y = Dr b,
            # x = Dc y; the preconditioner was built in this space.
            val_eq = dr[:, None] * val * dc1[ell_col]
            val32 = val_eq.astype(jnp.float32)

            def mv_eq(y):
                y_p = jnp.concatenate([y, jnp.zeros(1, y.dtype)])
                return wsc(jnp.sum(val_eq * y_p[ell_col], axis=1))

            def mv32(y):
                y_p = jnp.concatenate([y, jnp.zeros(1, y.dtype)])
                return wsc(jnp.sum(val32 * y_p[ell_col], axis=1))

            M = lambda r: wsc(self._m_apply(m_state, r))
            b_eq = dr * b
            b_eq_norm = jnp.maximum(jnp.linalg.norm(b_eq), 1e-30)
            atol = tol * b_eq_norm
            n = b.shape[0]

            # FGMRES-IR: f32 Krylov cycles on the equilibrated operator,
            # f64 true-residual refinement between cycles. One emulated-f64
            # matvec per cycle buys full f64 convergence while the ~restart
            # inner iterations run at native f32 speed.
            def cycle_cond(st):
                _y, _r, rn, _it, k = st
                return (rn > atol) & (k < max_cycles) & jnp.isfinite(rn)

            def cycle(st):
                y, r, rn, iters, k = st
                rs = jnp.maximum(rn, 1e-30)
                # Inner relative target: whatever the outer contract still
                # needs, floored at f32 resolution.
                inner_atol = jnp.maximum(atol / rs, 1e-7).astype(jnp.float32)
                d32, _ri, it = _fgmres(
                    mv32,
                    M,
                    (r / rs).astype(jnp.float32),
                    jnp.zeros(n, jnp.float32),
                    inner_atol,
                    restart,
                    1,
                )
                d = rs * d32.astype(y.dtype)
                # Guard: a NaN/Inf inner result must not poison y — keep the
                # old iterate and let the outer loop exit on rn.
                ok = jnp.all(jnp.isfinite(d))
                y_new = wsc(jnp.where(ok, y + d, y))
                r_new = b_eq - mv_eq(y_new)
                rn_new = jnp.linalg.norm(r_new)
                rn_new = jnp.where(ok, rn_new, jnp.nan)
                return y_new, r_new, rn_new, iters + it, k + 1

            y0 = wsc(x0 / dc)
            r0 = b_eq - mv_eq(y0)
            y, _r, res_eq, iters, _k = jax.lax.while_loop(
                cycle_cond,
                cycle,
                (y0, r0, jnp.linalg.norm(r0), jnp.zeros((), jnp.int32), 0),
            )
            x = wsc(dc * y)
            # Convergence is measured in the EQUILIBRATED norm (rescaled to
            # the original |b| for the caller's relative contract): the
            # diagonal scaling spans ~10 orders on contact systems, so the
            # raw-residual norm is dominated by a few wild rows and says
            # little about solution accuracy — spsolve's own raw residual
            # is no better on these systems.
            res = res_eq / b_eq_norm * jnp.linalg.norm(b)
            return x, res, iters

        return solve

    # -- driver ----------------------------------------------------------------

    @device_policy.on_accelerator
    def _solve_jit(self, data, b, tol=None):
        """Device solve returning ``(x, residual_norm)``.

        Under an outer trace the frozen preconditioner state (concrete
        arrays) is closed over as constants — it must have been built by a
        prior concrete solve or an explicit
        :meth:`refresh_preconditioner`; otherwise a plain Jacobi chunk runs.
        """
        tracing = isinstance(data, jax.core.Tracer)
        target = float(tol) if tol is not None else self.tol
        if self._m_state is None and tracing:
            # No host work possible inside a trace: l1-Jacobi FGMRES.
            rows = jnp.asarray(self._rows_np)
            l1 = jax.ops.segment_sum(
                jnp.abs(data), rows, num_segments=self.n
            )
            sinv = 0.5 / jnp.maximum(l1, 1e-30)
            data_p = jnp.concatenate([data, jnp.zeros(1, data.dtype)])
            val = data_p[self._ell_sel]

            def mv(x):
                x_p = jnp.concatenate([x, jnp.zeros(1, x.dtype)])
                return jnp.sum(val * x_p[self._ell_col], axis=1)
            atol = jnp.asarray(target) * jnp.maximum(
                jnp.linalg.norm(b), 1e-30
            )
            x, res, _ = _fgmres(
                mv,
                lambda r: sinv * r,
                b,
                jnp.zeros(self.n, b.dtype),
                atol,
                self._restart,
                max(-(-self.maxiter // self._restart), 1),
            )
            return x, res
        if self._m_state is None:
            self.refresh_preconditioner(data)
        self._ensure_jit()
        if tracing:
            x, res, _ = self._solve_fn(data)(
                data, b, jnp.zeros(self.n, b.dtype), self._m_state,
                jnp.asarray(target),
            )
            return x, res

        b = jnp.asarray(b)
        b_norm = float(jnp.linalg.norm(b))
        if b_norm == 0.0 or not np.isfinite(b_norm):
            return jnp.zeros(self.n, dtype=b.dtype), b_norm
        # Solve at unit rhs scale: near-converged Newton steps hand in
        # |b| ~ 1e-7..1e-13, where the TPU's emulated-f64 pipeline has been
        # observed to produce NaNs; normalizing makes the kernel
        # scale-invariant.
        b_unit = b / b_norm
        x = jnp.zeros(self.n, dtype=b.dtype)
        tol_dev = jnp.asarray(target)
        x, res_dev, iters = self._solve_fn(data)(
            data, b_unit, x, self._m_state, tol_dev
        )
        res = float(res_dev)
        refreshed = False
        if np.isfinite(res) and res > target:
            # Stalled: refresh the frozen preconditioner from the CURRENT
            # Jacobian values and retry once, warm-started.
            self.refresh_preconditioner(data)
            refreshed = True
            x, res_dev, it2 = self._solve_fn(data)(
                data, b_unit, x, self._m_state, tol_dev
            )
            res = float(res_dev)
            iters = iters + it2
        self.last_stats = {
            "krylov_iters": int(iters),
            "refreshed": refreshed,
            "nnz": int(self.system.indices_np.shape[0]),
            "n": self.n,
            "dense": self._dense,
        }
        return x * b_norm, res * b_norm

    # -- public API ------------------------------------------------------------

    @device_policy.on_accelerator
    def solve(self, data, b, tol=None) -> np.ndarray:
        """Solve on device; host-spsolve fallback (logged + counted) if the
        Krylov iteration misses tolerance. ``tol`` overrides the
        construction-time relative tolerance for this call (inexact-Newton
        forcing)."""
        x, res = self._solve_jit(data, jnp.asarray(b), tol=tol)
        res = float(res)
        b_norm = float(jnp.linalg.norm(b))
        eff_tol = float(tol) if tol is not None else self.tol
        if not np.isfinite(res) or res > max(
            eff_tol * max(b_norm, 1.0) * 1e3, 1e-8
        ):
            FALLBACK_COUNTER["count"] += 1
            logger.warning(
                "Device %s missed tolerance (|r|=%.2e, |b|=%.2e); falling back "
                "to host spsolve (fallback #%d).",
                self.method,
                res,
                b_norm,
                FALLBACK_COUNTER["count"],
            )
            import os

            dump_dir = os.environ.get("PPT_DUMP_FALLBACK_DIR")
            if dump_dir:
                path = os.path.join(
                    dump_dir, f"fallback_{FALLBACK_COUNTER['count']}.npz"
                )
                np.savez(
                    path,
                    data=np.asarray(data),
                    b=np.asarray(b),
                    indices=self.system.indices_np,
                    shape=np.asarray(self.system.shape),
                )
                logger.warning("Dumped failing system to %s", path)
            A = self._host_matrix(data)
            return sps.linalg.spsolve(A, np.asarray(b))
        return np.asarray(x)

    @device_policy.on_accelerator
    def solve_device(self, data, b):
        """Device-only solve: returns (x, residual_norm) without host checks
        (for fully device-resident loops and sharded execution)."""
        return self._solve_jit(data, b)
