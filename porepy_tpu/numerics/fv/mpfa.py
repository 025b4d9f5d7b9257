"""Multi-point flux approximation (MPFA-O).

Parity counterpart of reference ``numerics/fv/mpfa.py``: local continuity
systems (flux + pressure continuity per vertex interaction region, with
Dirichlet/Neumann/Robin exclusions), inverted per region and contracted
with Darcy's law into face-flux stencils. The reference's numba block
inversion is replaced by size-grouped batched dense inverses on device
(``linalg.matrix_operations.invert_diagonal_blocks``) — the TPU-native
form of the hot kernel.

Produces the same matrix contract as TPFA (``flux``, ``bound_flux``,
``bound_pressure_cell/face``, ``vector_source``,
``bound_pressure_vector_source``) and is therefore a drop-in
``darcy_flux_discretization``.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import scipy.sparse as sps

from porepy_tpu.geometry import map_geometry
from porepy_tpu.numerics.fv import _fvutils
from porepy_tpu.numerics.linalg.matrix_operations import (
    diagonal_scaling_matrix,
    invert_diagonal_blocks,
)
from porepy_tpu.utils import common_constants as cc

__all__ = ["Mpfa"]


class Mpfa:
    def __init__(self, keyword: str) -> None:
        self.keyword = keyword
        self.flux_matrix_key = "flux"
        self.bound_flux_matrix_key = "bound_flux"
        self.bound_pressure_cell_matrix_key = "bound_pressure_cell"
        self.bound_pressure_face_matrix_key = "bound_pressure_face"
        self.vector_source_matrix_key = "vector_source"
        self.bound_pressure_vector_source_matrix_key = "bound_pressure_vector_source"

    def ndof(self, sd) -> int:
        return sd.num_cells

    def discretize(self, sd, data: dict) -> None:
        param = data[cc.PARAMETERS][self.keyword]
        matrices = data[cc.DISCRETIZATION_MATRICES][self.keyword]
        k = param.get("second_order_tensor", None)
        bnd = param.get("bc", None)
        eta = param.get("mpfa_eta", None)
        inverter = param.get("mpfa_inverter", None)
        vs_dim: int = param.get("ambient_dimension", sd.dim)

        if sd.dim == 0:
            matrices[self.flux_matrix_key] = sps.csr_matrix((0, sd.num_cells))
            matrices[self.bound_flux_matrix_key] = sps.csr_matrix((0, 0))
            matrices[self.bound_pressure_cell_matrix_key] = sps.csr_matrix(
                (0, sd.num_cells)
            )
            matrices[self.bound_pressure_face_matrix_key] = sps.csr_matrix((0, 0))
            matrices[self.vector_source_matrix_key] = sps.csr_matrix(
                (0, sd.num_cells * max(vs_dim, 1))
            )
            matrices[self.bound_pressure_vector_source_matrix_key] = sps.csr_matrix(
                (0, sd.num_cells * max(vs_dim, 1))
            )
            return

        (
            flux,
            bound_flux,
            bound_pressure_cell,
            bound_pressure_face,
            vector_source,
            bound_pressure_vector_source,
        ) = self._flux_discretization(
            sd, k, bnd, inverter=inverter, ambient_dimension=vs_dim, eta=eta
        )
        matrices[self.flux_matrix_key] = flux
        matrices[self.bound_flux_matrix_key] = bound_flux
        matrices[self.bound_pressure_cell_matrix_key] = bound_pressure_cell
        matrices[self.bound_pressure_face_matrix_key] = bound_pressure_face
        matrices[self.vector_source_matrix_key] = vector_source
        matrices[self.bound_pressure_vector_source_matrix_key] = (
            bound_pressure_vector_source
        )

    # -- core ---------------------------------------------------------------

    def _flux_discretization(
        self,
        sd,
        k,
        bnd,
        inverter: Optional[str] = None,
        ambient_dimension: Optional[int] = None,
        eta: Optional[float] = None,
    ):
        if eta is None:
            eta = _fvutils.determine_eta(sd)
        if ambient_dimension is None:
            ambient_dimension = sd.dim

        if sd.dim == 1:
            # MPFA reduces to TPFA in 1d.
            from porepy_tpu.numerics.fv.tpfa import Tpfa
            from porepy_tpu.params.data import initialize_data

            d: dict = {}
            initialize_data(
                d,
                self.keyword,
                {
                    "bc": bnd,
                    "second_order_tensor": k,
                    "ambient_dimension": ambient_dimension,
                },
            )
            Tpfa(self.keyword).discretize(sd, d)
            md = d[cc.DISCRETIZATION_MATRICES][self.keyword]
            return (
                md["flux"],
                md["bound_flux"],
                md["bound_pressure_cell"],
                md["bound_pressure_face"],
                md["vector_source"],
                md["bound_pressure_vector_source"],
            )

        if sd.dim == 2:
            # Rotate to the plane; rotate the permeability along.
            sd = sd.copy()
            cell_centers, face_normals, face_centers, R, _, nodes = (
                map_geometry.map_grid(sd)
            )
            sd.cell_centers = cell_centers
            sd.face_normals = face_normals
            sd.face_centers = face_centers
            sd.nodes = nodes
            k = k.copy()
            k.values = np.tensordot(
                R.T, np.tensordot(R, k.values, (1, 0)), (0, 1)
            )
            k.values = np.delete(k.values, (2), axis=0)
            k.values = np.delete(k.values, (2), axis=1)

        subcell_topology = _fvutils.SubcellTopology(sd)

        if bnd.num_faces == subcell_topology.num_subfno_unique:
            subcell_bnd = bnd
            subface_rhs = True
        else:
            subcell_bnd = _fvutils.boundary_to_sub_boundary(bnd, subcell_topology)
            subface_rhs = False

        nk_grad_all, cell_node_blocks, sub_cell_index = (
            _fvutils.scalar_tensor_vector_prod(sd, k, subcell_topology)
        )

        pr_cont_grad_paired = _fvutils.compute_dist_face_cell(
            sd, subcell_topology, eta
        )
        darcy = -nk_grad_all[subcell_topology.unique_subfno]
        nk_grad_paired = subcell_topology.pair_over_subfaces(nk_grad_all)

        nk_cell = sps.coo_matrix(
            (np.zeros(1), (np.zeros(1), np.zeros(1))),
            shape=(subcell_topology.num_subfno, subcell_topology.num_cno),
        ).tocsr()

        sgn = np.asarray(
            sd.cell_faces[subcell_topology.fno, subcell_topology.cno]
        ).ravel()
        pr_cont_cell_all = sps.coo_matrix(
            (sgn, (subcell_topology.subfno, subcell_topology.cno))
        ).tocsr()
        sgn_unique = np.asarray(
            sd.cell_faces[
                subcell_topology.fno_unique, subcell_topology.cno_unique
            ]
        ).ravel()

        # Robin condition contributions.
        num_nodes = np.diff(sd.face_nodes.indptr)
        sgn_scaled = (
            subcell_bnd.robin_weight
            * sgn_unique
            * sd.face_areas[subcell_topology.fno_unique]
            / num_nodes[subcell_topology.fno_unique]
        )
        pr_trace_grad_all = sps.diags(sgn_scaled) * pr_cont_grad_paired
        pr_trace_cell_all = sps.coo_matrix(
            (
                subcell_bnd.robin_weight[subcell_topology.subfno]
                * sd.face_areas[subcell_topology.fno]
                / num_nodes[subcell_topology.fno],
                (subcell_topology.subfno, subcell_topology.cno),
            )
        ).tocsr()

        # Mapping subfaces -> faces.
        hf2f = sps.coo_matrix(
            (
                np.ones(subcell_topology.unique_subfno.size),
                (subcell_topology.fno_unique, subcell_topology.subfno_unique),
            ),
            shape=(sd.num_faces, subcell_topology.num_subfno_unique),
        )

        bound_exclusion = _fvutils.ExcludeBoundaries(
            subcell_topology, subcell_bnd, sd.dim
        )

        nk_grad_n = bound_exclusion.exclude_robin_dirichlet(nk_grad_paired)
        nk_cell = bound_exclusion.exclude_robin_dirichlet(nk_cell)

        if bound_exclusion.any_rob:
            nk_grad_r = bound_exclusion.keep_robin(nk_grad_paired)
            pr_trace_grad = bound_exclusion.keep_robin(pr_trace_grad_all)
            pr_trace_cell = bound_exclusion.keep_robin(pr_trace_cell_all)
        else:
            nk_grad_r = sps.csr_matrix((0, nk_grad_paired.shape[1]))
            pr_trace_grad = sps.csr_matrix((0, pr_trace_grad_all.shape[1]))
            pr_trace_cell = sps.csr_matrix((0, pr_trace_cell_all.shape[1]))

        pr_cont_grad = bound_exclusion.exclude_neumann_robin(pr_cont_grad_paired)
        pr_cont_cell = bound_exclusion.exclude_neumann_robin(pr_cont_cell_all)

        num_nk_cell = nk_cell.shape[0]
        num_nk_rob = nk_grad_r.shape[0]
        num_pr_cont_grad = pr_cont_grad.shape[0]

        grad_eqs = sps.vstack(
            (nk_grad_n, nk_grad_r - pr_trace_grad, pr_cont_grad)
        )
        full_scaling = diagonal_scaling_matrix(grad_eqs)
        grad_eqs = full_scaling * grad_eqs

        rows2blk_diag, cols2blk_diag, size_of_blocks = (
            self._block_diagonal_structure(
                sub_cell_index,
                cell_node_blocks,
                subcell_topology.nno_unique,
                bound_exclusion,
            )
        )
        grad = rows2blk_diag * grad_eqs * cols2blk_diag
        igrad = (
            cols2blk_diag
            * invert_diagonal_blocks(grad, size_of_blocks, method=inverter)
            * rows2blk_diag
        ) * full_scaling

        rhs_cells = -sps.vstack((nk_cell, -pr_trace_cell, pr_cont_cell))
        darcy_igrad = darcy * igrad
        flux = darcy_igrad * rhs_cells

        rhs_bound = self._create_bound_rhs(
            subcell_bnd,
            bound_exclusion,
            subcell_topology,
            sgn_unique,
            sd,
            num_nk_cell,
            num_nk_rob,
            num_pr_cont_grad,
            subface_rhs,
        )
        bound_flux = darcy_igrad * rhs_bound

        dist_cell, cell_centers = _reconstruct_pressure(sd, subcell_topology, eta)
        dist_cell_igrad = dist_cell * igrad
        pressure_trace_cell = dist_cell_igrad * rhs_cells + cell_centers
        pressure_trace_bound = dist_cell_igrad * rhs_bound

        area_scaling = 1.0 / (hf2f * np.ones(hf2f.shape[1]))
        area_mat = hf2f * sps.diags(hf2f.T * area_scaling)
        if not subface_rhs:
            bound_flux = hf2f * bound_flux * hf2f.T
            flux = hf2f * flux
            pressure_trace_bound = area_mat * pressure_trace_bound * hf2f.T
            pressure_trace_cell = area_mat * pressure_trace_cell

        discr_vector_source, vector_source_bound = self._discretize_vector_source(
            sd,
            subcell_topology,
            bound_exclusion,
            darcy_igrad,
            dist_cell_igrad,
            nk_grad_all,
            nk_grad_paired,
        )
        sc2c = _fvutils.cell_vector_to_subcell(
            sd.dim, sub_cell_index, cell_node_blocks[0]
        )
        vector_source = hf2f * discr_vector_source * sc2c
        bound_pressure_vector_source = area_mat * vector_source_bound * sc2c

        return (
            flux,
            bound_flux,
            pressure_trace_cell,
            pressure_trace_bound,
            vector_source,
            bound_pressure_vector_source,
        )

    def _discretize_vector_source(
        self,
        sd,
        subcell_topology,
        bound_exclusion,
        darcy_igrad,
        dist_cell_igrad,
        nk_grad_all,
        nk_grad_paired,
    ):
        num_subfno = subcell_topology.num_subfno
        num_subfno_unique = subcell_topology.subfno_unique.size

        I_subfno = sps.dia_matrix(
            (np.ones(num_subfno_unique), 0),
            shape=(num_subfno_unique, num_subfno_unique),
        )
        flux_eq_map = bound_exclusion.exclude_robin_dirichlet(I_subfno)
        if bound_exclusion.any_rob:
            flux_eq_map = sps.vstack(
                [flux_eq_map, bound_exclusion.keep_robin(I_subfno)]
            )
        num_dir_subface = (
            bound_exclusion.exclude_neu_rob.shape[1]
            - bound_exclusion.exclude_neu_rob.shape[0]
        )
        num_zeros = num_subfno - num_dir_subface
        flux_eq_map = sps.csr_matrix(flux_eq_map)
        flux_eq_map.resize(
            (flux_eq_map.shape[0] + num_zeros, flux_eq_map.shape[1])
        )
        rhs_map = -flux_eq_map

        prod = rhs_map * nk_grad_paired
        vector_source_jumps = -darcy_igrad * prod
        vector_source_bound = -dist_cell_igrad * prod

        map_unique_subfno = sps.coo_matrix(
            (
                np.ones(num_subfno_unique),
                (subcell_topology.subfno_unique, subcell_topology.unique_subfno),
            ),
            shape=(subcell_topology.num_subfno_unique, subcell_topology.fno.size),
        )
        vector_source_faces = map_unique_subfno * nk_grad_all
        return vector_source_jumps + vector_source_faces, vector_source_bound

    def _block_diagonal_structure(
        self, sub_cell_index, cell_node_blocks, nno, bound_exclusion
    ):
        nno_flux = bound_exclusion.exclude_robin_dirichlet(nno)
        nno_pressure = bound_exclusion.exclude_neumann_robin(nno)
        nno_rob = bound_exclusion.keep_robin(nno)

        node_occ = np.hstack((nno_flux, nno_rob, nno_pressure))
        sorted_ind = np.argsort(node_occ, kind="stable")
        sorted_nodes_rows = node_occ[sorted_ind]
        size_of_blocks = np.bincount(sorted_nodes_rows.astype("int64"))
        rows2blk_diag = sps.coo_matrix(
            (
                np.ones(sorted_nodes_rows.size),
                (np.arange(sorted_ind.size), sorted_ind),
            )
        ).tocsr()

        sorted_nodes_cols = np.argsort(cell_node_blocks[1], kind="stable")
        subcind_nodes = sub_cell_index[:, sorted_nodes_cols].ravel("F")
        cols2blk_diag = sps.coo_matrix(
            (
                np.ones(sub_cell_index.size),
                (subcind_nodes, np.arange(sub_cell_index.size)),
            )
        ).tocsr()
        return rows2blk_diag, cols2blk_diag, size_of_blocks

    def _create_bound_rhs(
        self,
        bnd,
        bound_exclusion,
        subcell_topology,
        sgn,
        sd,
        num_flux,
        num_rob,
        num_pr,
        subface_rhs,
    ):
        is_dir = np.logical_and(bnd.is_dir, np.logical_not(bnd.is_internal))
        is_neu = np.logical_or(bnd.is_neu, bnd.is_internal)
        is_rob = np.logical_and(bnd.is_rob, np.logical_not(bnd.is_internal))

        fno = subcell_topology.fno_unique
        num_neu = np.sum(is_neu)
        num_dir = np.sum(is_dir)
        if not num_rob == np.sum(is_rob):
            raise AssertionError()
        num_bound = num_neu + num_dir + num_rob

        neu_ind = np.argwhere(
            bound_exclusion.exclude_robin_dirichlet(is_neu.astype("int64"))
        ).ravel("F")
        if bound_exclusion.any_rob:
            rob_ind = np.argwhere(
                bound_exclusion.keep_robin(is_rob.astype("int64"))
            ).ravel("F")
        else:
            rob_ind = np.array([], dtype=np.int64)

        neu_ind_all = np.argwhere(is_neu.astype("int")).ravel("F")
        rob_ind_all = np.argwhere(is_rob.astype("int")).ravel("F")
        dir_ind_all = np.argwhere(is_dir.astype("int")).ravel("F")
        num_face_nodes = np.diff(sd.face_nodes.indptr)

        if rob_ind.size == 0:
            neu_rob_ind = neu_ind
        elif neu_ind.size == 0:
            neu_rob_ind = rob_ind + num_flux
        else:
            neu_rob_ind = np.hstack((neu_ind, rob_ind + num_flux))
        neu_rob_ind_all = np.hstack((neu_ind_all, rob_ind_all))

        if subface_rhs:
            scaled_sgn = -1 * np.ones(neu_rob_ind_all.size)
        else:
            scaled_sgn = -1 / num_face_nodes[fno[neu_rob_ind_all]]

        if neu_rob_ind.size > 0:
            rows = neu_rob_ind
            cols = np.arange(neu_rob_ind.size)
            data = scaled_sgn
        else:
            rows = np.array([], dtype=int)
            cols = np.array([], dtype=int)
            data = np.array([], dtype=float)

        dir_ind = np.argwhere(
            bound_exclusion.exclude_neumann_robin(is_dir.astype("int64"))
        ).ravel("F")
        if dir_ind.size > 0:
            rows = np.hstack((rows, num_flux + num_rob + dir_ind))
            cols = np.hstack((cols, num_neu + num_rob + np.arange(dir_ind.size)))
            data = np.hstack((data, sgn[dir_ind_all]))

        if neu_rob_ind.size > 0 and dir_ind.size > 0:
            neu_rob_dir_ind = np.hstack([neu_rob_ind_all, dir_ind_all]).ravel("F")
        elif neu_rob_ind.size > 0:
            neu_rob_dir_ind = neu_rob_ind_all
        elif dir_ind.size > 0:
            neu_rob_dir_ind = dir_ind_all
        elif num_bound == 0:
            neu_rob_dir_ind = neu_rob_ind
        else:
            raise ValueError(
                "Boundary values should be Dirichlet, Neumann or Robin"
            )

        num_subfno = subcell_topology.num_subfno_unique
        bnd_2_all_hf = sps.coo_matrix(
            (np.ones(num_bound), (np.arange(num_bound), neu_rob_dir_ind)),
            shape=(num_bound, num_subfno),
        )
        mat = sps.coo_matrix(
            (data, (rows, cols)), shape=(num_flux + num_rob + num_pr, num_bound)
        )
        return (mat * bnd_2_all_hf).tocsr()


def _reconstruct_pressure(sd, subcell_topology, eta):
    """Half-face pressure reconstruction operators (reference
    ``mpfa.py:1620``)."""
    if eta is None:
        eta = _fvutils.determine_eta(sd)
    D_g = _fvutils.compute_dist_face_cell(
        sd, subcell_topology, eta, return_paired=False
    )
    _, IC, counts = np.unique(
        subcell_topology.subfno, return_inverse=True, return_counts=True
    )
    avg_over_subfaces = sps.coo_matrix(
        (1 / counts[IC], (subcell_topology.subfno, subcell_topology.subhfno))
    ).tocsr()
    D_g = (avg_over_subfaces * D_g).tocsr()
    D_c = sps.coo_matrix(
        (1 / counts[IC], (subcell_topology.subfno, subcell_topology.cno))
    ).tocsr()
    return D_g, D_c
