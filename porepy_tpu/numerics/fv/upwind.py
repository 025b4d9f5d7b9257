"""Single-point upstream weighting for advective transport.

Two faces of the same scheme:

- :class:`Upwind`: reference-parity discretization producing the matrices
  ``transport`` (upwind cell selection), ``rhs_dir`` (Dirichlet-inflow
  pickup) and ``rhs_neu`` (Neumann/interface influx pickup), keyed on a
  stored ``darcy_flux`` face field (reference ``numerics/fv/upwind.py:13``).
- :func:`upwind_apply` and friends: the TPU-native path. Upstream selection
  is a gather controlled by ``sign(q)`` evaluated *inside* the traced
  residual, so no per-iteration rediscretization exists at all — where the
  reference re-builds scipy matrices before every nonlinear iteration
  (``models/solution_strategy.py:988-1015``), the jitted residual switches
  directions for free. The direction is wrapped in ``stop_gradient`` so the
  Jacobian matches the reference's frozen-matrix linearization exactly.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sps

from porepy_tpu.utils import common_constants as cc

__all__ = ["Upwind", "UpwindGeometry", "upwind_apply", "UpwindCoupling"]


class UpwindGeometry:
    """Static index arrays for upwind selection on one or more grids
    (concatenated face/cell spaces).

    ``lo``/``hi`` are the cells behind/in front of each face (normal points
    lo -> hi); -1 where missing (boundary). ``sgn_div`` is the column sum of
    the divergence (+-1 on boundary faces).
    """

    def __init__(self, subdomains, bcs) -> None:
        lo_list, hi_list, is_dir, is_neu, sgn_div = [], [], [], [], []
        c_off = 0
        for sd, bc in zip(subdomains, bcs):
            cf = sd.cell_faces_as_dense()
            lo_list.append(np.where(cf[0] >= 0, cf[0] + c_off, -1))
            hi_list.append(np.where(cf[1] >= 0, cf[1] + c_off, -1))
            is_dir.append(np.asarray(bc.is_dir, dtype=bool))
            is_neu.append(np.asarray(bc.is_neu, dtype=bool))
            sgn_div.append(np.asarray(sd.divergence(1).sum(axis=0)).ravel())
            c_off += sd.num_cells
        self.lo = jnp.asarray(np.concatenate(lo_list or [np.zeros(0, int)]))
        self.hi = jnp.asarray(np.concatenate(hi_list or [np.zeros(0, int)]))
        self.is_dir = jnp.asarray(np.concatenate(is_dir or [np.zeros(0, bool)]))
        self.is_neu = jnp.asarray(np.concatenate(is_neu or [np.zeros(0, bool)]))
        self.sgn_div = jnp.asarray(np.concatenate(sgn_div or [np.zeros(0)]))
        self.num_cells = c_off

    def structural_pattern(self) -> sps.csr_matrix:
        """Bool (faces x cells): each face may depend on both neighbors."""
        lo = np.asarray(self.lo)
        hi = np.asarray(self.hi)
        nf = lo.size
        rows, cols = [], []
        for arr in (lo, hi):
            mask = arr >= 0
            rows.append(np.where(mask)[0])
            cols.append(arr[mask])
        r = np.concatenate(rows)
        c = np.concatenate(cols)
        return sps.csr_matrix(
            (np.ones(r.size, bool), (r, c)), shape=(nf, self.num_cells)
        )


def upwind_apply(geom: UpwindGeometry, q, w):
    """Upstream value of cell field ``w`` per face, directions from
    ``sign(q)`` (gradient-stopped). Excluded faces (Neumann, or
    Dirichlet-inflow-from-outside) return 0 — their contribution enters
    through the boundary pickup terms, mirroring the reference's matrix
    split."""
    q_dir = jax.lax.stop_gradient(q)
    pos = q_dir >= 0
    up = jnp.where(pos, geom.lo, geom.hi)
    w_up = jnp.where(up >= 0, w[jnp.clip(up, 0)], 0.0)
    inflow_outside = jnp.where(pos, geom.lo < 0, geom.hi < 0)
    excluded = geom.is_neu | (geom.is_dir & inflow_outside)
    return jnp.where(excluded, 0.0, w_up)


def upwind_boundary_masks(geom: UpwindGeometry, q):
    """(dirichlet_inflow_mask, neumann_coeff) as in the reference's
    ``rhs_dir``/``rhs_neu`` diagonals."""
    q_dir = jax.lax.stop_gradient(q)
    pos = q_dir >= 0
    inflow_outside = jnp.where(pos, geom.lo < 0, geom.hi < 0)
    dir_mask = (geom.is_dir & inflow_outside).astype(q.dtype)
    neu_coeff = jnp.where(geom.is_neu, geom.sgn_div, 0.0)
    return dir_mask, neu_coeff


class Upwind:
    """Reference-parity upwind discretization (host matrices)."""

    def __init__(self, keyword: str = "transport") -> None:
        self.keyword = keyword
        self.upwind_matrix_key = "transport"
        self.bound_transport_dir_matrix_key = "rhs_dir"
        self.bound_transport_neu_matrix_key = "rhs_neu"
        self._flux_array_key = "darcy_flux"

    @property
    def flux_array_key(self) -> str:
        return self._flux_array_key

    def ndof(self, sd) -> int:
        return sd.num_cells

    def discretize(self, sd, data: dict) -> None:
        param: dict[str, Any] = data[cc.PARAMETERS][self.keyword]
        matrices = data[cc.DISCRETIZATION_MATRICES][self.keyword]

        if sd.dim == 0:
            matrices[self.upwind_matrix_key] = sps.csr_matrix((0, 1))
            matrices[self.bound_transport_dir_matrix_key] = sps.csr_matrix((0, 0))
            matrices[self.bound_transport_neu_matrix_key] = sps.csr_matrix((0, 0))
            return

        sign_q = np.sign(param[self._flux_array_key])
        if "bc" in param:
            bc = param["bc"]
        else:
            from porepy_tpu.params.bc import BoundaryCondition

            bc = BoundaryCondition(sd, sd.get_boundary_faces(), "dir")

        pos = sign_q >= 0
        cf = sd.cell_faces_as_dense()
        upstream = np.where(pos, cf[0], cf[1])

        neumann_ind = np.where(bc.is_neu)[0]
        inflow_ind = np.where(
            bc.is_dir & np.where(pos, cf[0] < 0, cf[1] < 0)
        )[0]
        drop = np.zeros(sd.num_faces, dtype=bool)
        drop[neumann_ind] = True
        drop[inflow_ind] = True
        keep = ~drop

        rows = np.arange(sd.num_faces)[keep]
        upstream_mat = sps.coo_matrix(
            (np.ones(rows.size), (rows, upstream[keep])),
            shape=(sd.num_faces, sd.num_cells),
        ).tocsr()

        num_components = param.get("num_components", 1)

        def expand(m):
            if num_components == 1:
                return m.tocsr()
            return sps.kron(m, sps.eye(num_components)).tocsr()

        matrices[self.upwind_matrix_key] = expand(upstream_mat)

        sgn_div = np.asarray(sd.divergence(dim=1).sum(axis=0)).ravel()
        matrices[self.bound_transport_neu_matrix_key] = expand(
            sps.coo_matrix(
                (sgn_div[neumann_ind], (neumann_ind, neumann_ind)),
                shape=(sd.num_faces, sd.num_faces),
            )
        )
        matrices[self.bound_transport_dir_matrix_key] = expand(
            sps.coo_matrix(
                (np.ones(inflow_ind.size), (inflow_ind, inflow_ind)),
                shape=(sd.num_faces, sd.num_faces),
            )
        )


class UpwindCoupling:
    """Interface upstream weighting keyed on the sign of a stored mortar
    flux (reference ``numerics/fv/upwind.py:377``).

    Matrix contract (stored under the keyword in the interface data dict):
    ``trace``/``inv_trace`` (primary cells <-> faces), ``upwind_primary`` /
    ``upwind_secondary`` (diagonal masks selecting the upstream side per
    mortar cell), ``flux`` (diagonal signs) and ``mortar_discr``
    (identity). The runtime upwinding in this framework happens inside the
    jitted kernels (``constitutive_laws.AdvectiveFlux``); these matrices
    serve API/golden parity and host-side assembly.
    """

    def __init__(self, keyword: str) -> None:
        self.keyword = keyword
        self.trace_primary_matrix_key = "trace"
        self.inv_trace_primary_matrix_key = "inv_trace"
        self.upwind_primary_matrix_key = "upwind_primary"
        self.upwind_secondary_matrix_key = "upwind_secondary"
        self.flux_matrix_key = "flux"
        self.mortar_discr_matrix_key = "mortar_discr"
        self._flux_array_key = "darcy_flux"

    @property
    def flux_array_key(self) -> str:
        return self._flux_array_key

    @flux_array_key.setter
    def flux_array_key(self, value: str) -> None:
        self._flux_array_key = value

    def ndof(self, intf) -> int:
        return intf.num_cells

    def discretize(
        self, sd_primary, sd_secondary, intf, data_primary, data_secondary,
        data_intf,
    ) -> None:
        if sd_primary.dim - sd_secondary.dim not in (1, 2):
            raise ValueError(
                "Implementation is only valid for grids one dimension apart."
            )
        matrices = data_intf[cc.DISCRETIZATION_MATRICES].setdefault(
            self.keyword, {}
        )
        lam_sign = np.sign(
            data_intf[cc.PARAMETERS][self.keyword][self._flux_array_key]
        )
        inv_trace = abs(sd_primary.divergence(dim=1))
        matrices[self.inv_trace_primary_matrix_key] = inv_trace
        matrices[self.trace_primary_matrix_key] = inv_trace.T
        take_primary = (lam_sign > 0).astype(float)
        matrices[self.upwind_primary_matrix_key] = sps.diags(take_primary)
        matrices[self.upwind_secondary_matrix_key] = sps.diags(
            1.0 - take_primary
        )
        matrices[self.flux_matrix_key] = sps.diags(lam_sign)
        matrices[self.mortar_discr_matrix_key] = sps.eye(intf.num_cells)
