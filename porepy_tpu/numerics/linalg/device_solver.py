"""Device-resident preconditioned Krylov solve of the assembled md system.

The TPU-native replacement for the reference's host direct solvers
(PyPardiso/UMFPACK, reference ``models/solution_strategy.py:830-877``): the
Jacobian never leaves the device. Assembly (``EquationSystem.assemble_device``)
yields the nonzero data of a statically-indexed global BCOO; this module
solves with BiCGStab/GMRES where

- the matvec is a segment-sum over the static sparsity (HBM-bandwidth bound,
  bit-deterministic),
- the preconditioner is either point Jacobi or a block lower Gauss-Seidel
  over user-declared (equations, variables) field blocks, each diagonal block
  approximately inverted by a fixed Chebyshev polynomial in the
  Jacobi-scaled block (a *stationary* linear operation, so the outer Krylov
  theory holds). Field splits generalize the reference's fixed-stress-style
  physics splits; an optional per-block diagonal stabilization array plays
  the role of the fixed-stress L-term.

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

from porepy_tpu.numerics.linalg.krylov import FALLBACK_COUNTER

__all__ = ["DeviceLinearSolver"]

logger = logging.getLogger(__name__)


def device_gmres(
    matvec,
    M,
    b,
    tol: float,
    restart: int,
    max_cycles: int,
    x0=None,
    reorth: bool = True,
):
    """Restarted GMRES, left-preconditioned, written for XLA: modified
    Gram-Schmidt with one reorthogonalization pass (the V-matmul form keeps
    the inner products batched for the MXU), Givens-rotation least squares,
    ``lax.while_loop`` over restart cycles. jax's bundled gmres is avoided:
    its batched variant NaNs and its incremental variant stagnates on md
    saddle systems that plain scipy solves easily.

    Returns ``(x, preconditioned_residual_norm)``.
    """
    n = b.shape[0]
    dtype = b.dtype
    Mb = M(b)
    bnorm = jnp.linalg.norm(Mb)
    atol = tol * jnp.maximum(bnorm, 1e-300)

    def cycle(x):
        r = M(b - matvec(x))
        beta = jnp.linalg.norm(r)
        V = jnp.zeros((restart + 1, n), dtype)
        V = V.at[0].set(r / jnp.maximum(beta, 1e-300))
        H = jnp.zeros((restart + 1, restart), dtype)
        cs = jnp.zeros(restart, dtype)
        sn = jnp.zeros(restart, dtype)
        g = jnp.zeros(restart + 1, dtype).at[0].set(beta)

        def arnoldi(j, st):
            V, H, cs, sn, g = st
            w = M(matvec(V[j]))
            # CGS via matmul: rows of V beyond j are zero, so no mask needed.
            h = V @ w
            w = w - V.T @ h
            if reorth:
                h2 = V @ w  # one reorthogonalization pass (CGS2)
                w = w - V.T @ h2
                h = h + h2
            hj1 = jnp.linalg.norm(w)
            V = V.at[j + 1].set(w / jnp.maximum(hj1, 1e-300))
            hfull = h.at[j + 1].set(hj1)

            def rot(i, hv):
                t = cs[i] * hv[i] + sn[i] * hv[i + 1]
                hv = hv.at[i + 1].set(-sn[i] * hv[i] + cs[i] * hv[i + 1])
                return hv.at[i].set(t)

            hfull = jax.lax.fori_loop(0, j, rot, hfull)
            denom = jnp.sqrt(hfull[j] ** 2 + hfull[j + 1] ** 2)
            c_new = hfull[j] / jnp.maximum(denom, 1e-300)
            s_new = hfull[j + 1] / jnp.maximum(denom, 1e-300)
            cs = cs.at[j].set(c_new)
            sn = sn.at[j].set(s_new)
            hfull = hfull.at[j].set(denom).at[j + 1].set(0.0)
            g = g.at[j + 1].set(-s_new * g[j]).at[j].set(c_new * g[j])
            H = H.at[:, j].set(hfull)
            return V, H, cs, sn, g

        V, H, cs, sn, g = jax.lax.fori_loop(
            0, restart, arnoldi, (V, H, cs, sn, g)
        )
        R = H[:restart, :restart]
        diag = jnp.diag(R)
        # Happy breakdown: a zero pivot means the space is exhausted; the
        # matching g entry is zero, so neutralizing the pivot keeps y finite.
        bad = jnp.abs(diag) < 1e-290
        R = R + jnp.diag(jnp.where(bad, 1.0, 0.0))
        gr = jnp.where(bad, 0.0, g[:restart])
        y = jax.scipy.linalg.solve_triangular(R, gr, lower=False)
        x = x + V[:restart].T @ y
        return x, jnp.abs(g[restart])

    def cond(state):
        _x, res, k = state
        return (res > atol) & (k < max_cycles)

    def body(state):
        x, _res, k = state
        x, res = cycle(x)
        return x, res, k + 1

    if x0 is None:
        x0 = jnp.zeros_like(b)
    r0 = jnp.linalg.norm(M(b - matvec(x0)))
    x, res, _ = jax.lax.while_loop(cond, body, (x0, r0, 0))
    return x, res


def _aggregate_pattern(
    rows: np.ndarray, cols: np.ndarray, n: int, target_size: int = 32
) -> tuple[np.ndarray, int]:
    """Greedy graph aggregation of the dof connectivity for the two-level
    preconditioner: BFS-grown aggregates of ~``target_size`` dofs; stragglers
    join a neighboring aggregate. Host-side, runs once per solver."""
    off = rows != cols
    adj = sps.coo_matrix(
        (np.ones(off.sum(), dtype=bool), (rows[off], cols[off])), shape=(n, n)
    ).tocsr()
    adj = (adj + adj.T).tocsr()
    agg = -np.ones(n, dtype=np.int64)
    n_agg = 0
    indptr, indices = adj.indptr, adj.indices
    for seed in range(n):
        if agg[seed] >= 0:
            continue
        members = [seed]
        agg[seed] = n_agg
        frontier = [seed]
        while frontier and len(members) < target_size:
            nxt = []
            for u in frontier:
                for v in indices[indptr[u] : indptr[u + 1]]:
                    if agg[v] < 0:
                        agg[v] = n_agg
                        members.append(v)
                        nxt.append(v)
                        if len(members) >= target_size:
                            break
                if len(members) >= target_size:
                    break
            frontier = nxt
        # Absorb tiny aggregates into a neighbor when possible.
        if len(members) < max(2, target_size // 8):
            for u in members:
                for v in indices[indptr[u] : indptr[u + 1]]:
                    if agg[v] >= 0 and agg[v] != n_agg:
                        for w in members:
                            agg[w] = agg[v]
                        members = []
                        break
                if not members:
                    break
            if not members:
                continue
        n_agg += 1
    if n_agg == 0:
        agg[:] = 0
        n_agg = 1
    # Compact aggregate ids (absorption can leave gaps).
    uniq, agg = np.unique(agg, return_inverse=True)
    return agg.astype(np.int64), int(uniq.size)



def _ell_layout(sel, lr, lc, n_rows, nnz_total, n_cols):
    """Padded-row (ELL) gather layout of a sub-block's sparsity: returns
    ``(ell_sel, ell_col)`` of shape ``(n_rows, K)`` with sentinel indices
    ``nnz_total`` / ``n_cols`` (mapping to appended zeros). The matvec
    becomes K gathers + a dense row sum — no scatter."""
    order = np.lexsort((lc, lr))
    r_sorted = lr[order]
    counts = np.bincount(r_sorted, minlength=n_rows)
    K = max(int(counts.max()) if counts.size else 1, 1)
    pos = np.arange(lr.size) - np.repeat(
        np.concatenate([[0], np.cumsum(counts)[:-1]]), counts
    )
    ell_sel = np.full((n_rows, K), nnz_total, dtype=np.int64)
    ell_col = np.full((n_rows, K), n_cols, dtype=np.int64)
    ell_sel[r_sorted, pos] = sel[order]
    ell_col[r_sorted, pos] = lc[order]
    return jnp.asarray(ell_sel), jnp.asarray(ell_col)


class _Block:
    """Static index maps of one diagonal field block and its sub-diagonal
    couplings (for the lower Gauss-Seidel sweep). All matvecs use ELL
    gather layouts — scatter-adds are near-serial on TPU."""

    def __init__(self, rows, cols, row_set, col_set, prev_col_sets, stab):
        n = len(row_set)
        self.n = n
        nnz = rows.size
        row_local = -np.ones(int(rows.max()) + 2 if rows.size else 1, np.int64)
        row_local[row_set] = np.arange(n)
        col_local = -np.ones(int(cols.max()) + 2 if cols.size else 1, np.int64)
        col_local[col_set] = np.arange(n)
        in_rows = np.zeros(row_local.shape[0] - 1, bool)
        in_rows[row_set] = True
        in_cols = np.zeros(col_local.shape[0] - 1, bool)
        in_cols[col_set] = True

        # Diagonal block A_ii.
        sel = np.where(in_rows[rows] & in_cols[cols])[0]
        lr = row_local[rows[sel]]
        lc = col_local[cols[sel]]
        self.ell_sel, self.ell_col = _ell_layout(sel, lr, lc, n, nnz, n)
        dsel = sel[lr == lc]
        dpos = np.full(n, nnz, dtype=np.int64)
        dpos[row_local[rows[dsel]]] = dsel
        self._diag_pos = jnp.asarray(dpos)
        self.rows_g = jnp.asarray(row_set)
        self.cols_g = jnp.asarray(col_set)
        self.stab = jnp.asarray(stab) if stab is not None else None

        # Two-level aggregation hierarchy inside the block: the Chebyshev
        # polynomial alone stalls on stiff blocks (elasticity in Biot), a
        # coarse correction restores mesh-independent convergence.
        self.agg = None
        if n > 64:
            agg, nc = _aggregate_pattern(lr, lc, n, target_size=32)
            self.agg = jnp.asarray(agg)
            self.n_coarse = int(nc)
            self._coarse_sel = jnp.asarray(sel)
            self._coarse_key = jnp.asarray(agg[lr] * nc + agg[lc])
            self._coarse_diag_key = jnp.asarray(agg * nc + agg)
            perm = np.argsort(agg, kind="stable")
            ends = np.cumsum(np.bincount(agg, minlength=nc))
            self.agg_perm = jnp.asarray(perm)
            self.agg_ends = jnp.asarray(ends - 1)

        # Couplings A_ij to already-solved blocks j < i (ELL over this
        # block's rows; columns local to the previous block).
        self.couplings = []
        for prev_cols in prev_col_sets:
            pc_local = -np.ones(col_local.shape[0] - 1, np.int64)
            pc_local[prev_cols] = np.arange(len(prev_cols))
            in_pc = np.zeros(col_local.shape[0] - 1, bool)
            in_pc[prev_cols] = True
            selc = np.where(in_rows[rows] & in_pc[cols])[0]
            self.couplings.append(
                _ell_layout(
                    selc,
                    row_local[rows[selc]],
                    pc_local[cols[selc]],
                    n,
                    nnz,
                    len(prev_cols),
                )
            )

    def diag(self, data):
        data_p = jnp.concatenate([data, jnp.zeros(1, data.dtype)])
        d = data_p[self._diag_pos]
        if self.stab is not None:
            d = d + self.stab
        return jnp.where(jnp.abs(d) > 1e-300, d, 1.0)

    def matvec(self, data, x):
        data_p = jnp.concatenate([data, jnp.zeros(1, data.dtype)])
        x_p = jnp.concatenate([x, jnp.zeros(1, x.dtype)])
        y = jnp.sum(data_p[self.ell_sel] * x_p[self.ell_col], axis=1)
        if self.stab is not None:
            y = y + self.stab * x
        return y

    def coupling_matvec(self, data, k, x):
        """``A_ij @ x`` for the k-th registered coupling (x local to the
        previous block j)."""
        ell_sel, ell_col = self.couplings[k]
        data_p = jnp.concatenate([data, jnp.zeros(1, data.dtype)])
        x_p = jnp.concatenate([x, jnp.zeros(1, x.dtype)])
        return jnp.sum(data_p[ell_sel] * x_p[ell_col], axis=1)

    def row_l1(self, data):
        """Row-wise l1 norms of the (stabilized) diagonal block."""
        data_p = jnp.concatenate([data, jnp.zeros(1, data.dtype)])
        s = jnp.sum(jnp.abs(data_p[self.ell_sel]), axis=1)
        if self.stab is not None:
            s = s + jnp.abs(self.stab)
        return s

    def coarse(self, data):
        """Galerkin coarse matrix of the (stabilized) diagonal block over
        the aggregation (piecewise-constant prolongation)."""
        nc = self.n_coarse
        A = jax.ops.segment_sum(
            data[self._coarse_sel], self._coarse_key, num_segments=nc * nc
        )
        if self.stab is not None:
            A = A + jax.ops.segment_sum(
                self.stab, self._coarse_diag_key, num_segments=nc * nc
            )
        return A.reshape(nc, nc)

    def restrict(self, v):
        cs = jnp.cumsum(v[self.agg_perm])
        tail = cs[self.agg_ends]
        return tail - jnp.concatenate([jnp.zeros(1), tail[:-1]])

    def prolong(self, y_c):
        return y_c[self.agg]


class DeviceLinearSolver:
    """Jitted solve of ``A x = b`` for a fixed assembly structure.

    Parameters
    ----------
    system:
        ``_CompiledSystem`` from ``EquationSystem.compiled_system()`` (must be
        square: equation rows align with dofs).
    blocks:
        Optional field split: list of ``(row_indices, col_indices)`` global
        index arrays, ordered for the lower Gauss-Seidel sweep (solve the
        stiffest field first). ``None`` -> point Jacobi.
    stabilization:
        Optional dict ``{block_position: diagonal array}`` added to that
        block's diagonal inside the preconditioner only (fixed-stress style).
    """

    def __init__(
        self,
        system,
        method: str = "bicgstab",
        blocks: Optional[Sequence[tuple[np.ndarray, np.ndarray]]] = None,
        stabilization: Optional[dict] = None,
        tol: float = 1e-11,
        maxiter: Optional[int] = None,
        inner_degree: int = 6,
        agg_size: int = 32,
        restart: int = 40,
    ) -> None:
        if system.num_rows != system.shape[1]:
            raise ValueError("Device solve needs a square assembled system")
        self.system = system
        self.method = method
        self.tol = tol
        n = system.shape[1]
        self.n = n
        # With the two-level/field-split preconditioners, healthy solves
        # finish within a few restart cycles; a large budget only delays the
        # (counted) host fallback on pathological systems.
        self.maxiter = (
            maxiter
            if maxiter is not None
            else int(np.clip(6 * int(np.sqrt(n)) * 10, 400, 3200))
        )
        rows = system.indices_np[:, 0]
        cols = system.indices_np[:, 1]
        self._rows = jnp.asarray(rows)
        self._cols = jnp.asarray(cols)

        diag_sel = np.where(rows == cols)[0]
        self._diag_sel = jnp.asarray(diag_sel)
        self._diag_rows = jnp.asarray(rows[diag_sel])

        # Padded-row (ELL) layout of the sparsity: the matvec becomes K
        # gathers + a dense sum instead of a scatter-add. TPU scatter is
        # near-serial (~10 ms per 90k-nnz segment-sum on the bench system);
        # the gather form is orders of magnitude faster and is used for
        # every per-iteration kernel. K is the max row population; FV md
        # systems have narrow, balanced rows so padding waste is small.
        order = np.lexsort((cols, rows))
        r_sorted = rows[order]
        counts = np.bincount(r_sorted, minlength=n)
        K = int(counts.max()) if counts.size else 1
        pos_in_row = np.arange(rows.size) - np.repeat(
            np.concatenate([[0], np.cumsum(counts)[:-1]]), counts
        )
        ell_sel = np.full((n, K), rows.size, dtype=np.int64)
        ell_col = np.full((n, K), n, dtype=np.int64)
        ell_sel[r_sorted, pos_in_row] = order
        ell_col[r_sorted, pos_in_row] = cols[order]
        self._ell_sel = jnp.asarray(ell_sel)
        self._ell_col = jnp.asarray(ell_col)

        # Hybrid DIA + remainder layout for the per-iteration matvec: on
        # TPU, arbitrary-index gathers/scatters are near-serial, but the
        # bulk of an FV matrix on structured/semi-structured grids lies on
        # a handful of diagonals, where the matvec is contiguous
        # multiply-shift-add. Offsets covering >= 1/32 of the rows become
        # dense diagonals (values scattered once per solve chunk); the
        # irregular remainder (fracture/mortar couplings) stays as a small
        # COO scatter.
        self._dia_offsets: list[int] = []
        self._num_dia = 0
        self._rem_nr = 0
        offs = cols.astype(np.int64) - rows.astype(np.int64)
        uniq, counts_o = np.unique(offs, return_counts=True)
        dia_offsets = uniq[counts_o >= max(n // 32, 8)]
        if dia_offsets.size > 48:
            dia_offsets = dia_offsets[
                np.argsort(-counts_o[np.isin(uniq, dia_offsets)])[:48]
            ]
        on_dia = np.isin(offs, dia_offsets)
        # Only worthwhile when the diagonals dominate (structured core +
        # thin irregular coupling); on fully unstructured patterns fall
        # back to the ELL matvec wholesale.
        if n >= 256 and dia_offsets.size and on_dia.sum() >= 0.5 * offs.size:
            off_to_k = {int(o): k for k, o in enumerate(dia_offsets)}
            dia_k = np.array(
                [off_to_k[int(o)] for o in offs[on_dia]], dtype=np.int64
            )
            self._dia_offsets = [int(o) for o in dia_offsets]
            self._dia_scatter = (
                jnp.asarray(dia_k * n + rows[on_dia]),
                jnp.asarray(np.flatnonzero(on_dia)),
            )
            self._num_dia = int(dia_offsets.size)
            # Remainder entries as a compact ELL over only the rows that
            # have any, closed by one small unique-index scatter-add.
            rem = np.flatnonzero(~on_dia)
            if rem.size:
                rrows = rows[rem]
                rcols = cols[rem]
                order_r = np.lexsort((rcols, rrows))
                rs = rrows[order_r]
                urows, rinv = np.unique(rs, return_inverse=True)
                counts_r = np.bincount(rinv)
                Kr = int(counts_r.max())
                pos_r = np.arange(rem.size) - np.repeat(
                    np.concatenate([[0], np.cumsum(counts_r)[:-1]]), counts_r
                )
                rem_sel = np.full((urows.size, Kr), rows.size, dtype=np.int64)
                rem_col = np.full((urows.size, Kr), n, dtype=np.int64)
                rem_sel[rinv, pos_r] = rem[order_r]
                rem_col[rinv, pos_r] = rcols[order_r]
                self._rem_ell_sel = jnp.asarray(rem_sel)
                self._rem_ell_col = jnp.asarray(rem_col)
                self._rem_urows = jnp.asarray(urows)
                self._rem_nr = int(urows.size)

        # Column-wise ELL (for the Ruiz column norms).
        n_c = system.shape[1]
        order_c = np.lexsort((rows, cols))
        c_sorted = cols[order_c]
        counts_c = np.bincount(c_sorted, minlength=n_c)
        Kc = int(counts_c.max()) if counts_c.size else 1
        pos_in_col = np.arange(cols.size) - np.repeat(
            np.concatenate([[0], np.cumsum(counts_c)[:-1]]), counts_c
        )
        ell_sel_c = np.full((n_c, Kc), cols.size, dtype=np.int64)
        ell_sel_c[c_sorted, pos_in_col] = order_c
        self._ell_sel_c = jnp.asarray(ell_sel_c)
        # Diagonal positions in the nnz array per row (sentinel: nnz).
        dpos = np.full(n, rows.size, dtype=np.int64)
        dpos[rows[diag_sel]] = diag_sel
        self._diag_pos = jnp.asarray(dpos)

        self._blocks: Optional[list[_Block]] = None
        if blocks is not None:
            stabilization = stabilization or {}
            blist = []
            prev_cols: list[np.ndarray] = []
            for i, (rset, cset) in enumerate(blocks):
                rset = np.asarray(rset, np.int64)
                cset = np.asarray(cset, np.int64)
                if rset.size != cset.size:
                    raise ValueError(
                        f"Block {i}: row/col index sets must pair up "
                        f"({rset.size} vs {cset.size})"
                    )
                blist.append(
                    _Block(rows, cols, rset, cset, prev_cols, stabilization.get(i))
                )
                prev_cols.append(cset)
            covered = np.concatenate([np.asarray(c) for _, c in blocks])
            if np.unique(covered).size != n:
                raise ValueError("Field blocks must cover every dof exactly once")
            self._blocks = blist

        self._inner_degree = inner_degree
        self._restart = restart
        self._acinv_cache = None
        # Iterations per jitted dispatch: large enough to amortize launch
        # overhead, small enough that one kernel stays well under the TPU
        # runtime's execution watchdog.
        self._chunk_iters = 400
        # Two-level aggregation hierarchy (point-preconditioner path): the
        # coarse operator is a per-solve segment-sum over the nonzeros; its
        # dense factorization and solves run on the MXU.
        self._agg = None
        if self._blocks is None and n > 64:
            agg, n_coarse = _aggregate_pattern(
                rows, cols, n, target_size=agg_size
            )
            self._agg = jnp.asarray(agg)
            self._n_coarse = int(n_coarse)
            self._agg_key = jnp.asarray(
                agg[rows] * n_coarse + agg[cols]
            )
            # Scatter-free restriction: dofs permuted aggregate-contiguous,
            # per-aggregate sums via cumulative-sum differences.
            perm = np.argsort(agg, kind="stable")
            ends = np.cumsum(np.bincount(agg, minlength=n_coarse))
            self._agg_perm = jnp.asarray(perm)
            self._agg_ends = jnp.asarray(ends - 1)
        self._jit = jax.jit(self._make_solve())
        if self._agg is not None:

            def coarse(data):
                r, c = self._equilibrate(data)
                data_s = data * r[self._rows] * c[self._cols]
                nc = self._n_coarse
                return jax.ops.segment_sum(
                    data_s, self._agg_key, num_segments=nc * nc
                ).reshape(nc, nc)

            self._jit_coarse = jax.jit(coarse)
        if self._blocks is not None:

            def coarse_blocks(data):
                r, c = self._equilibrate(data)
                data_s = data * r[self._rows] * c[self._cols]
                return tuple(
                    blk.coarse(data_s) if blk.agg is not None else None
                    for blk in self._blocks
                )

            self._jit_coarse_blocks = jax.jit(coarse_blocks)
        self._warm = False

    def _coarse_inverse(self, data):
        """Dense inverse(s) of the (equilibrated) Galerkin coarse
        matrices, factored on host — the small round-trip avoids compiling
        pivoted LU on the device (crashes the tunneled TPU backend). For a
        field split, one inverse per diagonal block."""
        if self._blocks is not None:
            mats = self._jit_coarse_blocks(data)
            out = []
            for A in mats:
                if A is None:
                    out.append(None)
                    continue
                try:
                    out.append(jnp.asarray(np.linalg.inv(np.asarray(A))))
                except np.linalg.LinAlgError:
                    return None
            return tuple(out)
        if self._agg is None:
            return None
        A_c = np.asarray(self._jit_coarse(data))
        try:
            return jnp.asarray(np.linalg.inv(A_c))
        except np.linalg.LinAlgError:
            return None

    def _solve_jit(self, data, b, tol=None):
        """Host-chunked Krylov driver: dispatch bounded chunks until the
        true residual meets tolerance or the iteration budget is spent.
        Inside an outer trace (fully jitted callers), fall back to a single
        Jacobi-preconditioned chunk — the caller owns the iteration policy
        there and no host factorization is possible."""
        tracing = isinstance(data, jax.core.Tracer)
        if tracing:
            x = jnp.zeros(self.n, dtype=b.dtype)
            return self._jit(data, b, x, None, jnp.asarray(self.tol))
        if not self._warm:
            # Let in-flight assembly finish before this program compiles — a
            # compile racing execution hard-faults the tunneled TPU runtime.
            jax.block_until_ready(data)
            jax.block_until_ready(b)
        # The coarse-level dense inverse is cached across solves (Newton
        # iterations): a slightly stale coarse correction is still a valid
        # preconditioner, and rebuilding it costs a device round-trip plus a
        # host factorization. It is refreshed whenever the first chunk fails
        # to converge with the cached operator.
        fresh = False
        if self._acinv_cache is None:
            self._acinv_cache = self._coarse_inverse(data)
            fresh = True
        acinv = self._acinv_cache
        if not self._warm and acinv is not None:
            jax.block_until_ready(acinv)
        b = jnp.asarray(b)
        b_norm = float(jnp.linalg.norm(b))
        if b_norm == 0.0 or not np.isfinite(b_norm):
            return jnp.zeros(self.n, dtype=b.dtype), b_norm
        # Solve at unit rhs scale: near-converged Newton steps hand in
        # |b| ~ 1e-7..1e-13, where the TPU's emulated-f64 pipeline has been
        # observed to produce NaNs; normalizing makes the kernel
        # scale-invariant.
        b_unit = b / b_norm
        target = float(tol) if tol is not None else self.tol
        tol_rt = jnp.asarray(target)
        x = jnp.zeros(self.n, dtype=b.dtype)
        res = np.inf
        n_chunks = max(1, -(-self.maxiter // self._chunk_iters))
        used = 0
        for _chunk in range(n_chunks):
            x, res_dev = self._jit(data, b_unit, x, acinv, tol_rt)
            used += 1
            if not self._warm:
                jax.block_until_ready(x)
                self._warm = True
            res = float(res_dev)
            if not np.isfinite(res) or res <= target:
                break
            if not fresh:
                acinv = self._acinv_cache = self._coarse_inverse(data)
                fresh = True
        # Bookkeeping for benchmark reporting (upper bound on Krylov
        # iterations actually run; the final chunk may exit early).
        self.last_stats = {
            "chunks": used,
            "max_iters": used * self._chunk_iters,
            "nnz": int(self.system.indices_np.shape[0]),
            "n": self.n,
        }
        return x * b_norm, res * b_norm

    # -- kernel construction ---------------------------------------------------

    def _matvec(self, data, x):
        """ELL matvec: K gathers + dense reduce (no scatter)."""
        data_p = jnp.concatenate([data, jnp.zeros(1, data.dtype)])
        x_p = jnp.concatenate([x, jnp.zeros(1, x.dtype)])
        return jnp.sum(data_p[self._ell_sel] * x_p[self._ell_col], axis=1)

    def _pack(self, data):
        """Pre-arrange the nnz values for the fast per-iteration matvec:
        scatter the dominant diagonals into a dense ``(D, n)`` band array
        (one unique-index scatter, amortized over a whole Krylov chunk).
        Returns ``(data, bands_or_None)``."""
        if not self._num_dia:
            return (data, None)
        flat_idx, nnz_sel = self._dia_scatter
        bands = (
            jnp.zeros(self._num_dia * self.n, data.dtype)
            .at[flat_idx]
            .set(data[nnz_sel])
            .reshape(self._num_dia, self.n)
        )
        return (data, bands)

    def _matvec_packed(self, packed, x):
        """Hybrid DIA matvec: each dominant diagonal is a contiguous
        multiply of a rolled copy of ``x`` (wrapped lanes hit stored zeros),
        the irregular remainder goes through a compact per-row gather and
        one small scatter-add. On TPU this replaces the arbitrary-index
        ``(n, K)`` gather of the ELL form — the dominant cost of a Krylov
        iteration on the tunneled runtime — with ~D streaming ops."""
        data, bands = packed
        if bands is None:
            return self._matvec(data, x)
        y = jnp.zeros_like(x)
        for k, o in enumerate(self._dia_offsets):
            y = y + bands[k] * jnp.roll(x, -o)
        if self._rem_nr:
            data_p = jnp.concatenate([data, jnp.zeros(1, data.dtype)])
            x_p = jnp.concatenate([x, jnp.zeros(1, x.dtype)])
            contrib = jnp.sum(
                data_p[self._rem_ell_sel] * x_p[self._rem_ell_col], axis=1
            )
            y = y.at[self._rem_urows].add(contrib)
        return y

    def _row_reduce_abs(self, data):
        data_p = jnp.concatenate([data, jnp.zeros(1, data.dtype)])
        return jnp.sum(jnp.abs(data_p[self._ell_sel]), axis=1)

    def _global_diag(self, data):
        data_p = jnp.concatenate([data, jnp.zeros(1, data.dtype)])
        d = data_p[self._diag_pos]
        return jnp.where(jnp.abs(d) > 1e-300, d, 1.0)

    def _chebyshev_apply(self, matvec, dinv, r, lam_max, degree):
        """y ~= A^{-1} r by a degree-``degree`` Chebyshev polynomial in the
        Jacobi-scaled operator, eigenvalue window [lam_max/30, lam_max].
        Stationary (fixed polynomial) => a valid Krylov preconditioner."""
        lam_min = lam_max / 30.0
        theta = 0.5 * (lam_max + lam_min)
        delta = 0.5 * (lam_max - lam_min)
        sigma1 = theta / delta
        rho = 1.0 / sigma1
        y = (1.0 / theta) * (dinv * r)

        def body(_i, carry):
            y, d_prev, rho_prev = carry
            resid = dinv * (r - matvec(y))
            rho_new = 1.0 / (2.0 * sigma1 - rho_prev)
            d_new = rho_new * rho_prev * d_prev + (2.0 * rho_new / delta) * resid
            return y + d_new, d_new, rho_new

        d0 = (1.0 / theta) * (dinv * r)
        y, _, _ = jax.lax.fori_loop(1, degree, body, (y, d0, rho))
        return y

    def _power_lam_max(self, matvec, dinv, n, iters=12):
        v = jnp.ones(n) / jnp.sqrt(n)

        def body(_i, v):
            w = dinv * matvec(v)
            return w / jnp.linalg.norm(w)

        v = jax.lax.fori_loop(0, iters, body, v)
        w = dinv * matvec(v)
        return jnp.vdot(v, w) * 1.1 + 1e-30

    def _make_preconditioner(self, data, acinv=None, packed=None):
        if packed is None:
            packed = self._pack(data)
        if self._blocks is None:
            dinv = 1.0 / self._global_diag(data)
            if self._agg is None or acinv is None:
                return lambda r: dinv * r
            # Two-level V(1,1): damped l1-Jacobi smoothing + dense coarse
            # correction. ``acinv`` is the dense inverse of the Galerkin
            # coarse matrix (factored on host per solve — the tunneled TPU
            # backend crashes compiling in-kernel LU pivoting); its
            # application is a dense matvec (MXU work).
            nc = self._n_coarse
            agg = self._agg
            mv = lambda x: self._matvec_packed(packed, x)
            # Damped sign-aware l1-Jacobi smoother: the raw diagonal can be
            # orders of magnitude below the row scale even after Ruiz
            # equilibration (md coupling rows), which makes plain Jacobi
            # smoothing explosively divergent. The row-abs-sum is ~1 after
            # equilibration, bounding the smoother.
            row_l1 = self._row_reduce_abs(data)
            d_sign = jnp.where(self._global_diag(data) < 0, -1.0, 1.0)
            sinv = 0.5 * d_sign / jnp.maximum(row_l1, 1e-300)

            perm = self._agg_perm
            ends = self._agg_ends

            def restrict(v):
                cs = jnp.cumsum(v[perm])
                tail = cs[ends]
                return tail - jnp.concatenate([jnp.zeros(1), tail[:-1]])

            def prolong(y_c):
                return y_c[agg]

            def M(r):
                y = sinv * r
                r_c = restrict(r - mv(y))
                y = y + prolong(acinv @ r_c)
                return y + sinv * (r - mv(y))

            return M

        # Per-block approximate inverses, built once per solve: a two-level
        # aggregation V(1,1) cycle when a coarse inverse is available
        # (mesh-independent on stiff elasticity blocks), else the Chebyshev
        # polynomial in the Jacobi-scaled block.
        block_acinv = (
            acinv
            if isinstance(acinv, tuple) and len(acinv) == len(self._blocks)
            else (None,) * len(self._blocks)
        )
        prepared = []
        for blk, ai in zip(self._blocks, block_acinv):
            if ai is not None and blk.agg is not None:
                row_l1 = blk.row_l1(data)
                d_sign = jnp.where(blk.diag(data) < 0, -1.0, 1.0)
                sinv = 0.5 * d_sign / jnp.maximum(row_l1, 1e-300)

                def solve_i(r_i, blk=blk, ai=ai, sinv=sinv):
                    y = sinv * r_i
                    r_c = blk.restrict(r_i - blk.matvec(data, y))
                    y = y + blk.prolong(ai @ r_c)
                    return y + sinv * (r_i - blk.matvec(data, y))

            else:
                dinv = 1.0 / blk.diag(data)
                mv = lambda x, blk=blk: blk.matvec(data, x)
                lam = self._power_lam_max(mv, dinv, blk.n)

                def solve_i(r_i, mv=mv, dinv=dinv, lam=lam):
                    return self._chebyshev_apply(
                        mv, dinv, r_i, lam, self._inner_degree
                    )

            prepared.append((blk, solve_i))

        def M(r):
            y = jnp.zeros(self.n, dtype=r.dtype)
            for blk, solve_i in prepared:
                r_i = r[blk.rows_g]
                # Subtract coupling to already-solved fields: A_ij y_j.
                for k, (pblk, _) in enumerate(
                    prepared[: len(blk.couplings)]
                ):
                    y_j = y[pblk.cols_g]
                    r_i = r_i - blk.coupling_matvec(data, k, y_j)
                y = y.at[blk.cols_g].set(solve_i(r_i))
            return y

        return M

    def _equilibrate(self, data, iters=3):
        """Ruiz row/column equilibration (inf-norm), entirely on device:
        returns (r, c) with ``diag(r) A diag(c)`` near-balanced. Essential for
        md systems mixing volume-scaled balance rows with O(1) interface
        rows."""
        n_r, n_c = self.system.shape
        ad = jnp.abs(data)
        r = jnp.ones(n_r)
        c = jnp.ones(n_c)

        def body(_i, rc):
            # Row/column max norms through the padded-row/column gather
            # layouts (scatter-free; see the ELL construction in __init__).
            r, c = rc
            a_p = jnp.concatenate(
                [ad * r[self._rows] * c[self._cols], jnp.zeros(1)]
            )
            rn = jnp.max(a_p[self._ell_sel], axis=1)
            rn = jnp.where(rn > 0, rn, 1.0)
            r = r / jnp.sqrt(rn)
            a_p = jnp.concatenate(
                [ad * r[self._rows] * c[self._cols], jnp.zeros(1)]
            )
            cn = jnp.max(a_p[self._ell_sel_c], axis=1)
            cn = jnp.where(cn > 0, cn, 1.0)
            c = c / jnp.sqrt(cn)
            return r, c

        return jax.lax.fori_loop(0, iters, body, (r, c))

    def _make_solve(self):
        """One bounded *chunk* of the Krylov iteration: at most
        ``_chunk_iters`` matvecs per dispatch, warm-started from the incoming
        iterate. The outer loop runs on host (:meth:`_solve_jit`) — a single
        unbounded while-loop kernel can run for minutes on hard systems and
        trips the TPU runtime's execution watchdog (observed as
        ``UNAVAILABLE: TPU device error`` on the tunneled runtime)."""
        restart = self._restart
        cycles = max(self._chunk_iters // restart, 1)

        def solve_chunk(data, b, x_in, acinv, tol):
            r, c = self._equilibrate(data)
            data_s = data * r[self._rows] * c[self._cols]
            b_s = r * b
            packed_s = self._pack(data_s)
            M = self._make_preconditioner(data_s, acinv, packed=packed_s)
            mv = lambda x: self._matvec_packed(packed_s, x)
            y0 = x_in / c
            if self.method == "gmres":
                # Single-pass CGS: the second orthogonalization pass costs
                # ~20% of the chunk with no observed convergence loss; the
                # chunk-level true-residual check (and host fallback) guards
                # against pathological orthogonality breakdown.
                y, _ = device_gmres(
                    mv,
                    M,
                    b_s,
                    tol=tol,
                    restart=restart,
                    max_cycles=cycles,
                    x0=y0,
                    reorth=False,
                )
            else:
                y, _ = jax.scipy.sparse.linalg.bicgstab(
                    mv, b_s, x0=y0, M=M, tol=tol, maxiter=self._chunk_iters
                )
            x = c * y
            res = jnp.linalg.norm(b - self._matvec(data, x))
            return x, res

        return solve_chunk

    # -- public API --------------------------------------------------------------

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
            A = sps.csr_matrix(
                (np.asarray(data), (self.system.indices_np[:, 0], self.system.indices_np[:, 1])),
                shape=self.system.shape,
            )
            return sps.linalg.spsolve(A, np.asarray(b))
        return np.asarray(x)

    def solve_device(self, data, b):
        """Device-only solve: returns (x, residual_norm) without host checks
        (for fully device-resident loops and sharded execution)."""
        return self._solve_jit(data, b)
