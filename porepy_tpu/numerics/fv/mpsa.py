"""Multi-point stress approximation (MPSA-W) for linear elasticity.

Parity counterpart of reference ``numerics/fv/mpsa.py``: the vector
analogue of MPFA — local systems enforce stress continuity (via Hooke's law
split into symmetric/asymmetric parts with nodal averaging of the
asymmetric part), displacement continuity, and vectorial
Dirichlet/Neumann/Robin conditions per subface. The per-vertex local
systems are inverted by the batched device block inverter.

Matrix contract: ``stress`` (nd*nf x nd*nc), ``bound_stress``
(nd*nf x nd*nf), ``bound_displacement_cell``, ``bound_displacement_face``.
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
    rldecode,
    rlencode,
    zero_rows,
)
from porepy_tpu.utils import common_constants as cc
from porepy_tpu.utils.array_operations import expand_indices_nd

__all__ = ["Mpsa"]


class Mpsa:
    def __init__(self, keyword: str) -> None:
        self.keyword = keyword
        self.stress_matrix_key = "stress"
        self.bound_stress_matrix_key = "bound_stress"
        self.bound_displacement_cell_matrix_key = "bound_displacement_cell"
        self.bound_displacement_face_matrix_key = "bound_displacement_face"

    def ndof(self, sd) -> int:
        return sd.num_cells * sd.dim

    def discretize(self, sd, data: dict) -> None:
        param = data[cc.PARAMETERS][self.keyword]
        matrices = data[cc.DISCRETIZATION_MATRICES][self.keyword]
        constit = param["fourth_order_tensor"]
        bound = param["bc"]
        eta = param.get("mpsa_eta", None)
        inverter = param.get("mpsa_inverter", None)
        nd = sd.dim

        if sd.dim == 0:
            matrices[self.stress_matrix_key] = sps.csr_matrix((0, 0))
            matrices[self.bound_stress_matrix_key] = sps.csr_matrix((0, 0))
            matrices[self.bound_displacement_cell_matrix_key] = sps.csr_matrix(
                (0, 0)
            )
            matrices[self.bound_displacement_face_matrix_key] = sps.csr_matrix(
                (0, 0)
            )
            return

        stress, bound_stress, hf_cell, hf_bound = self._stress_discretization(
            sd, constit, bound, eta=eta, inverter=inverter
        )
        matrices[self.stress_matrix_key] = stress
        matrices[self.bound_stress_matrix_key] = bound_stress
        matrices[self.bound_displacement_cell_matrix_key] = hf_cell
        matrices[self.bound_displacement_face_matrix_key] = hf_bound
        _ = nd

    # -- core ---------------------------------------------------------------

    def _stress_discretization(
        self,
        sd,
        constit,
        bound,
        eta: Optional[float] = None,
        inverter: Optional[str] = None,
        hf_disp: bool = False,
        hf_eta: Optional[float] = None,
    ):
        if eta is None:
            eta = _fvutils.determine_eta(sd)
        if bound.bc_type != "vectorial":
            raise AttributeError("MPSA needs a vectorial boundary condition")

        if sd.dim == 2:
            sd, constit = self._reduce_grid_constit_2d(sd, constit)
        nd = sd.dim

        subcell_topology = _fvutils.SubcellTopology(sd)
        if bound.num_faces == subcell_topology.num_subfno_unique:
            subface_rhs = True
        else:
            bound = _fvutils.boundary_to_sub_boundary(bound, subcell_topology)
            subface_rhs = False
        bound_exclusion = _fvutils.ExcludeBoundaries(subcell_topology, bound, nd)

        hook, igrad, cell_node_blocks = self._create_inverse_gradient_matrix(
            sd, constit, subcell_topology, bound_exclusion, eta, inverter
        )
        num_sub_cells = cell_node_blocks[0].size
        rhs_cells = self._create_rhs_cell_center(
            sd, subcell_topology, eta, num_sub_cells, bound_exclusion
        )

        hook_igrad = hook @ igrad
        hf2f = _fvutils.map_hf_2_f(
            subcell_topology.fno_unique, subcell_topology.subfno_unique, nd
        )

        stress = hook_igrad @ rhs_cells
        rhs_bound = self._create_bound_rhs(
            bound, bound_exclusion, subcell_topology, sd, subface_rhs
        )
        bound_stress = hook_igrad @ rhs_bound
        if not subface_rhs:
            bound_stress = hf2f @ bound_stress @ hf2f.T
            stress = hf2f @ stress

        if hf_eta is None:
            hf_eta = eta
        dist_grad, cell_centers = self._reconstruct_displacement(
            sd, subcell_topology, hf_eta
        )
        hf_cell = dist_grad @ igrad @ rhs_cells + cell_centers
        hf_bound = dist_grad @ igrad @ rhs_bound

        if not hf_disp:
            num_subfaces = np.asarray(hf2f.sum(axis=1)).ravel()
            scaling = sps.dia_matrix(
                (1.0 / num_subfaces, 0), shape=(hf2f.shape[0], hf2f.shape[0])
            )
            hf_cell = scaling @ hf2f @ hf_cell
            hf_bound = scaling @ hf2f @ hf_bound
        if not subface_rhs:
            hf_bound = hf_bound @ hf2f.T
        return stress, bound_stress, hf_cell, hf_bound

    def _create_inverse_gradient_matrix(
        self, sd, constit, subcell_topology, bound_exclusion, eta, inverter
    ):
        nd = sd.dim
        ncsym_all, ncasym, cell_node_blocks, sub_cell_index = (
            self._tensor_vector_prod(sd, constit, subcell_topology)
        )

        self._eliminate_ncasym(
            ncasym, subcell_topology, bound_exclusion, cell_node_blocks, nd,
            "neumann",
        )
        self._eliminate_ncasym(
            ncasym, subcell_topology, bound_exclusion, cell_node_blocks, nd,
            "robin",
        )

        hook = self._unique_hooks_law(ncsym_all, ncasym, subcell_topology, nd)

        ncsym_full = subcell_topology.pair_over_subfaces_nd(ncsym_all + ncasym)
        ncsym_rob = bound_exclusion.keep_robin(ncsym_full)
        ncsym_neu = bound_exclusion.keep_neumann(ncsym_full)

        num_sub_cells = cell_node_blocks[0].size
        rob_grad, rob_cell = self._get_displacement_submatrices_rob(
            sd, subcell_topology, eta, num_sub_cells, bound_exclusion
        )

        ncsym = subcell_topology.pair_over_subfaces_nd(ncsym_all)
        ncsym = bound_exclusion.exclude_boundary(ncsym)

        d_cont_grad, _ = self._get_displacement_submatrices(
            sd, subcell_topology, eta, num_sub_cells, bound_exclusion
        )

        grad_eqs = sps.vstack(
            [ncsym, ncsym_neu, ncsym_rob + rob_grad, d_cont_grad]
        )
        full_scaling = diagonal_scaling_matrix(grad_eqs)
        igrad = (
            self._inverse_gradient(
                full_scaling * grad_eqs,
                sub_cell_index,
                cell_node_blocks,
                subcell_topology.nno_unique,
                bound_exclusion,
                nd,
                inverter,
            )
            * full_scaling
        )
        return hook, igrad, cell_node_blocks

    def _create_rhs_cell_center(
        self, sd, subcell_topology, eta, num_sub_cells, bound_exclusion
    ):
        nd = sd.dim
        rob_grad, rob_cell = self._get_displacement_submatrices_rob(
            sd, subcell_topology, eta, num_sub_cells, bound_exclusion
        )
        num_subfno = subcell_topology.subfno.max() + 1
        hook_cell = sps.coo_matrix(
            (np.zeros(1), (np.zeros(1), np.zeros(1))),
            shape=(num_subfno * nd, (np.max(subcell_topology.cno) + 1) * nd),
        ).tocsr()
        hook_cell = bound_exclusion.exclude_robin_dirichlet(hook_cell)

        _, d_cont_cell = self._get_displacement_submatrices(
            sd, subcell_topology, eta, num_sub_cells, bound_exclusion
        )
        return -sps.vstack([hook_cell, rob_cell, d_cont_cell])

    def _get_displacement_submatrices(
        self, sd, subcell_topology, eta, num_sub_cells, bound_exclusion
    ):
        nd = sd.dim
        d_cont_grad = _fvutils.compute_dist_face_cell(sd, subcell_topology, eta)
        d_cont_grad = sps.kron(sps.eye(nd), d_cont_grad)
        d_cont_cell = self._cell_variable_contribution(sd, subcell_topology)
        d_cont_grad = bound_exclusion.exclude_neumann_robin(d_cont_grad)
        d_cont_cell = bound_exclusion.exclude_neumann_robin(d_cont_cell)
        return self._rearange_columns_displacement_eqs(
            d_cont_grad, d_cont_cell, num_sub_cells, nd
        )

    def _get_displacement_submatrices_rob(
        self, sd, subcell_topology, eta, num_sub_cells, bound_exclusion
    ):
        nd = sd.dim
        rob_grad = _fvutils.compute_dist_face_cell(sd, subcell_topology, eta)
        num_nodes = np.diff(sd.face_nodes.indptr)
        sgn = np.asarray(
            sd.cell_faces[
                subcell_topology.fno_unique, subcell_topology.cno_unique
            ]
        ).ravel()
        scaled_sgn = (
            sgn
            * sd.face_areas[subcell_topology.fno_unique]
            / num_nodes[subcell_topology.fno_unique]
        )
        rob_grad = sps.kron(sps.eye(nd), sps.diags(scaled_sgn) @ rob_grad)
        rob_cell = sps.coo_matrix(
            (
                sd.face_areas[subcell_topology.fno]
                / num_nodes[subcell_topology.fno],
                (subcell_topology.subfno, subcell_topology.cno),
            )
        ).tocsr()
        rob_cell = sps.kron(sps.eye(nd), rob_cell)

        rob_grad = bound_exclusion.basis_matrix @ rob_grad
        rob_cell = bound_exclusion.basis_matrix @ rob_cell
        rob_grad = bound_exclusion.robin_weight @ rob_grad
        rob_cell = bound_exclusion.robin_weight @ rob_cell
        rob_grad = bound_exclusion.keep_robin(rob_grad, transform=False)
        rob_cell = bound_exclusion.keep_robin(rob_cell, transform=False)
        return self._rearange_columns_displacement_eqs(
            rob_grad, rob_cell, num_sub_cells, nd
        )

    def _split_stiffness_matrix(self, constit):
        dim = np.sqrt(constit.values.shape[0])
        csym = 0 * constit.copy().values
        casym = constit.copy().values
        if dim == 2 and csym.shape[0] == 9:
            csym = np.delete(csym, (2, 5, 6, 7, 8), axis=0)
            csym = np.delete(csym, (2, 5, 6, 7, 8), axis=1)
            casym = np.delete(casym, (2, 5, 6, 7, 8), axis=0)
            casym = np.delete(casym, (2, 5, 6, 7, 8), axis=1)
        if dim == 2:
            for i, j in [(0, 0), (1, 1), (2, 2), (3, 0), (0, 3), (3, 3)]:
                csym[i, j] = casym[i, j]
        else:
            for i in range(9):
                csym[i, i] = casym[i, i]
            for i, j in [(4, 0), (8, 0), (0, 4), (8, 4), (0, 8), (4, 8)]:
                csym[i, j] = casym[i, j]
        casym = casym - csym
        return csym, casym

    def _tensor_vector_prod(self, sd, constit, subcell_topology):
        cell_node_blocks, blocksz = rlencode(
            np.vstack((subcell_topology.cno, subcell_topology.nno))
        )
        nd = sd.dim
        if not np.all(blocksz == nd):
            raise AssertionError()

        _, cn = np.meshgrid(subcell_topology.subhfno, np.arange(nd))
        sum_blocksz = np.cumsum(blocksz)
        cn += rldecode(sum_blocksz - blocksz[0], blocksz)
        ind_ptr_n = np.hstack((np.arange(0, cn.size, nd), cn.size))

        num_nodes = np.diff(sd.face_nodes.indptr)
        normals = (
            sd.face_normals[:, subcell_topology.fno]
            / num_nodes[subcell_topology.fno]
        )
        normals_mat = sps.csr_matrix(
            (normals.ravel("F"), cn.ravel("F"), ind_ptr_n)
        )

        _, cc_ind = np.meshgrid(subcell_topology.subhfno, np.arange(nd**2))
        sum_blocksz = np.cumsum(blocksz**2)
        cc_ind += rldecode(sum_blocksz - blocksz[0] ** 2, blocksz)
        ind_ptr_c = np.hstack((np.arange(0, cc_ind.size, nd**2), cc_ind.size))

        sym_tensor, asym_tensor = self._split_stiffness_matrix(constit)
        sym_tensor_swp = np.swapaxes(sym_tensor, 2, 0)
        asym_tensor_swp = np.swapaxes(asym_tensor, 2, 0)

        rind = np.arange(nd)
        zr = np.zeros(0)
        ncsym = sps.coo_matrix(
            (zr, (zr, zr)), shape=(0, cc_ind.max() + 1)
        ).tocsr()
        ncasym = sps.coo_matrix(
            (zr, (zr, zr)), shape=(0, cc_ind.max() + 1)
        ).tocsr()

        num_cell_nodes = sd.num_cell_nodes()
        cell_vol = sd.cell_volumes / num_cell_nodes
        node_vol = (
            np.bincount(
                subcell_topology.nno,
                weights=cell_vol[subcell_topology.cno],
            )
            / sd.dim
        )

        num_elem = cell_node_blocks.shape[1]
        map_mat = sps.coo_matrix(
            (np.ones(num_elem), (np.arange(num_elem), cell_node_blocks[1]))
        )
        weight_mat = sps.coo_matrix(
            (
                cell_vol[cell_node_blocks[0]] / node_vol[cell_node_blocks[1]],
                (cell_node_blocks[1], np.arange(num_elem)),
            )
        )
        average = sps.kron(map_mat * weight_mat, sps.identity(nd)).tocsr()

        for _ in range(nd):
            sym_dim = np.concatenate(
                sym_tensor_swp[:, :, rind], axis=1
            ).transpose()
            asym_dim = np.concatenate(
                asym_tensor_swp[:, :, rind], axis=1
            ).transpose()

            sub_cell_ind = expand_indices_nd(cell_node_blocks[0], nd)
            sym_vals = sym_dim[sub_cell_ind]
            asym_vals = asym_dim[sub_cell_ind]

            csym_mat = sps.csr_matrix(
                (sym_vals.ravel("C"), cc_ind.ravel("F"), ind_ptr_c)
            )
            casym_mat = sps.csr_matrix(
                (asym_vals.ravel("C"), cc_ind.ravel("F"), ind_ptr_c)
            )
            casym_mat = average * casym_mat

            ncsym = sps.vstack((ncsym, normals_mat * csym_mat))
            ncasym = sps.vstack((ncasym, normals_mat * casym_mat))
            rind = rind + nd

        grad_ind = cc_ind[:, ::nd]
        return ncsym.tocsr(), ncasym.tocsr(), cell_node_blocks, grad_ind

    def _inverse_gradient(
        self,
        grad_eqs,
        sub_cell_index,
        cell_node_blocks,
        nno_unique,
        bound_exclusion,
        nd,
        inverter,
    ):
        rows2blk_diag, cols2blk_diag, size_of_blocks = (
            self._block_diagonal_structure(
                sub_cell_index, cell_node_blocks, nno_unique, bound_exclusion, nd
            )
        )
        grad = rows2blk_diag * grad_eqs * cols2blk_diag
        return (
            cols2blk_diag
            * invert_diagonal_blocks(grad, size_of_blocks, method=inverter)
            * rows2blk_diag
        )

    def _block_diagonal_structure(
        self, sub_cell_index, cell_node_blocks, nno, bound_exclusion, nd
    ):
        nno = np.tile(nno, nd)
        nno_stress = bound_exclusion.exclude_boundary(nno, transform=False)
        nno_displacement = bound_exclusion.exclude_neumann_robin(
            nno, transform=False
        )
        nno_neu = bound_exclusion.keep_neumann(nno, transform=False)
        nno_rob = bound_exclusion.keep_robin(nno, transform=False)
        node_occ = np.hstack((nno_stress, nno_neu, nno_rob, nno_displacement))

        sorted_ind = np.argsort(node_occ, kind="mergesort")
        rows2blk_diag = sps.coo_matrix(
            (
                np.ones(sorted_ind.size),
                (np.arange(sorted_ind.size), sorted_ind),
            )
        ).tocsr()
        sorted_nodes_rows = node_occ[sorted_ind]
        size_of_blocks = np.bincount(sorted_nodes_rows.astype("int64"))

        sorted_nodes_cols = np.argsort(cell_node_blocks[1], kind="mergesort")
        subcind_nodes = sub_cell_index[:, sorted_nodes_cols].ravel("F")
        cols2blk_diag = sps.coo_matrix(
            (
                np.ones(sub_cell_index.size),
                (subcind_nodes, np.arange(sub_cell_index.size)),
            )
        ).tocsr()
        return rows2blk_diag, cols2blk_diag, size_of_blocks

    def _unique_hooks_law(self, csym, casym, subcell_topology, nd):
        num_eqs = csym.shape[0] / nd
        ind_single = np.tile(subcell_topology.unique_subfno, (nd, 1))
        increments = np.arange(nd) * num_eqs
        ind_all = np.reshape(ind_single + increments[:, np.newaxis], -1).astype(
            int
        )
        hook_sym = csym[ind_all, :]
        hook_asym = casym[ind_all, :]
        comp2face_ind = np.argsort(
            np.tile(subcell_topology.subfno_unique, nd), kind="mergesort"
        )
        comp2face = sps.coo_matrix(
            (
                np.ones(comp2face_ind.size),
                (np.arange(comp2face_ind.size), comp2face_ind),
            ),
            shape=(comp2face_ind.size, comp2face_ind.size),
        )
        return comp2face * (hook_sym + hook_asym)

    def _cell_variable_contribution(self, sd, subcell_topology):
        nd = sd.dim
        sgn = np.asarray(
            sd.cell_faces[subcell_topology.fno, subcell_topology.cno]
        ).ravel()
        d_cont_cell = sps.coo_matrix(
            (sgn, (subcell_topology.subfno, subcell_topology.cno))
        ).tocsr()
        return sps.kron(sps.eye(nd), d_cont_cell)

    def _rearange_columns_displacement_eqs(
        self, d_cont_grad, d_cont_cell, num_sub_cells, nd
    ):
        rep_ci_single_blk = np.tile(
            np.arange(num_sub_cells), (nd, 1)
        ).reshape(-1, order="F")
        d_cont_grad_map = np.argsort(
            np.tile(rep_ci_single_blk, nd), kind="mergesort"
        )
        d_cont_grad = d_cont_grad[:, d_cont_grad_map]
        num_cells = d_cont_cell.shape[1] / nd
        d_cont_cell_map = np.argsort(
            np.tile(np.arange(num_cells), nd), kind="mergesort"
        )
        d_cont_cell = d_cont_cell[:, d_cont_cell_map]
        return d_cont_grad, d_cont_cell

    def _row_major_to_col_major(self, shape, nd, axis):
        P = sps.diags(np.ones(shape[axis])).tocsr()
        num_var = shape[axis] / nd
        mapping = np.argsort(np.tile(np.arange(num_var), nd), kind="mergesort")
        if axis == 1:
            P = P[:, mapping]
        elif axis == 0:
            P = P[mapping, :]
        else:
            raise ValueError("axis must be 0 or 1")
        return P

    def _eliminate_ncasym(
        self, ncasym, subcell_topology, bound_exclusion, cell_node_blocks, nd, bc_type
    ):
        """Zero the asymmetric Hooke contribution on subfaces where it would
        make the local system singular (near Neumann/Robin boundaries)."""
        node_blocks_nd = np.tile(cell_node_blocks[1], (nd, 1))
        node_blocks_nd += subcell_topology.num_nodes * np.atleast_2d(
            np.arange(0, nd)
        ).T
        nno_nd = np.tile(subcell_topology.nno_unique, (nd, 1))
        nno_nd += subcell_topology.num_nodes * np.atleast_2d(np.arange(0, nd)).T

        _, num_sub_cells = np.unique(
            node_blocks_nd.ravel("C"), return_counts=True
        )

        if bc_type == "neumann":
            nno = bound_exclusion.keep_neumann(
                nno_nd.ravel("C"), transform=False
            )
            _, indices, count_bc = np.unique(
                nno, return_inverse=True, return_counts=True
            )
            count_bc = bound_exclusion.keep_neu.T * count_bc[indices]
        elif bc_type == "robin":
            nno = bound_exclusion.keep_robin(nno_nd.ravel("C"), transform=False)
            _, indices, count_bc = np.unique(
                nno, return_inverse=True, return_counts=True
            )
            count_bc = bound_exclusion.keep_rob.T * count_bc[indices]
        else:
            raise ValueError(bc_type)

        diff_count = num_sub_cells[nno_nd.ravel("C")] - count_bc
        remove_singular = np.argwhere((diff_count < 0)).ravel()

        subfno_nd = np.tile(subcell_topology.unique_subfno, (nd, 1))
        subfno_nd += subcell_topology.fno.size * np.atleast_2d(
            np.arange(0, nd)
        ).T
        dof_elim = subfno_nd.ravel("C")[remove_singular]
        zero_rows(ncasym, dof_elim)

    def _create_bound_rhs(
        self, bound, bound_exclusion, subcell_topology, sd, subface_rhs
    ):
        nd = sd.dim
        num_stress = bound_exclusion.exclude_bnd.shape[0]
        num_displ = bound_exclusion.exclude_neu_rob.shape[0]
        num_rob = bound_exclusion.keep_rob.shape[0]
        num_neu = bound_exclusion.keep_neu.shape[0]

        fno = subcell_topology.fno_unique
        subfno = subcell_topology.subfno_unique
        sgn = np.asarray(
            sd.cell_faces[
                subcell_topology.fno_unique, subcell_topology.cno_unique
            ]
        ).ravel()

        num_dir = np.sum(bound.is_dir)
        if not num_rob == np.sum(bound.is_rob):
            raise AssertionError()
        if not num_neu == np.sum(bound.is_neu):
            raise AssertionError()
        num_bound = num_neu + num_dir + num_rob

        subfno_nd = np.tile(subfno, (nd, 1)) * nd + np.atleast_2d(
            np.arange(0, nd)
        ).T

        subfno_neu = bound_exclusion.keep_neumann(
            subfno_nd.ravel("C"), transform=False
        ).ravel("F")
        is_neu_nd = (
            bound_exclusion.keep_neumann(bound.is_neu.ravel("C"), transform=False)
            .ravel("F")
            .astype(bool)
        )
        neu_ind = np.argsort(subfno_neu)
        neu_ind = neu_ind[is_neu_nd[neu_ind]]

        subfno_rob = bound_exclusion.keep_robin(
            subfno_nd.ravel("C"), transform=False
        ).ravel("F")
        is_rob_nd = (
            bound_exclusion.keep_robin(bound.is_rob.ravel("C"), transform=False)
            .ravel("F")
            .astype(bool)
        )
        rob_ind = np.argsort(subfno_rob)
        rob_ind = rob_ind[is_rob_nd[rob_ind]]

        subfno_dir = bound_exclusion.exclude_neumann_robin(
            subfno_nd.ravel("C"), transform=False
        ).ravel("F")
        is_dir_nd = (
            bound_exclusion.exclude_neumann_robin(
                bound.is_dir.ravel("C"), transform=False
            )
            .ravel("F")
            .astype(bool)
        )
        dir_ind = np.argsort(subfno_dir)
        dir_ind = dir_ind[is_dir_nd[dir_ind]]

        is_neu_all = bound.is_neu.ravel("C")
        neu_ind_all = np.argwhere(
            np.reshape(is_neu_all, (nd, -1), order="C").ravel("F")
        ).ravel("F")
        is_dir_all = bound.is_dir.ravel("C")
        dir_ind_all = np.argwhere(
            np.reshape(is_dir_all, (nd, -1), order="C").ravel("F")
        ).ravel("F")
        is_rob_all = bound.is_rob.ravel("C")
        rob_ind_all = np.argwhere(
            np.reshape(is_rob_all, (nd, -1), order="C").ravel("F")
        ).ravel("F")

        if rob_ind.size == 0:
            neu_rob_ind = neu_ind + num_stress
        elif neu_ind.size == 0:
            neu_rob_ind = rob_ind + num_stress
        else:
            neu_rob_ind = np.hstack(
                (neu_ind + num_stress, rob_ind + num_stress + num_neu)
            )
        neu_rob_ind_all = np.hstack((neu_ind_all, rob_ind_all))
        bnd_ind = np.hstack((neu_rob_ind_all, dir_ind_all))

        fno_ext = np.tile(fno, nd)
        num_face_nodes = np.asarray(sd.face_nodes.sum(axis=0)).ravel()

        if subface_rhs:
            neu_val = 1 * np.ones(neu_rob_ind_all.size)
        else:
            neu_val = 1 / num_face_nodes[fno_ext[neu_rob_ind_all]]

        if neu_rob_ind.size > 0:
            neu_cell = sps.coo_matrix(
                (
                    neu_val.ravel("F"),
                    (neu_rob_ind, np.arange(neu_rob_ind.size)),
                ),
                shape=(num_stress + num_neu + num_rob, num_bound),
            ).tocsr()
        else:
            neu_cell = sps.coo_matrix(
                (num_stress + num_rob, num_bound)
            ).tocsr()

        sgn_nd = np.tile(sgn, (nd, 1)).ravel("F")
        dir_val = sgn_nd[dir_ind_all]
        if dir_ind.size > 0:
            dir_cell = sps.coo_matrix(
                (
                    dir_val,
                    (dir_ind, num_neu + num_rob + np.arange(dir_ind.size)),
                ),
                shape=(num_displ, num_bound),
            ).tocsr()
        else:
            dir_cell = sps.coo_matrix((num_displ, num_bound)).tocsr()

        num_subfno = np.max(subfno) + 1
        bnd_2_all_hf = sps.coo_matrix(
            (np.ones(num_bound), (np.arange(num_bound), bnd_ind)),
            shape=(num_bound, num_subfno * nd),
        )
        return sps.vstack([neu_cell, dir_cell]) * bnd_2_all_hf

    def _reconstruct_displacement(self, sd, subcell_topology, eta=None):
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
        )
        D_g = avg_over_subfaces @ D_g
        D_g = sps.kron(sps.eye(sd.dim), D_g).tocsr()

        D_c = sps.coo_matrix(
            (1 / counts[IC], (subcell_topology.subfno, subcell_topology.cno))
        ).tocsr()
        D_c = sps.kron(sps.eye(sd.dim), D_c).tocsc()

        cell_node_blocks, _ = rlencode(
            np.vstack((subcell_topology.cno, subcell_topology.nno))
        )
        num_sub_cells = cell_node_blocks[0].size
        dist_grad, cell_centers = self._rearange_columns_displacement_eqs(
            D_g, D_c, num_sub_cells, sd.dim
        )
        P = self._row_major_to_col_major(cell_centers.shape, sd.dim, 0)
        return P @ dist_grad, P @ cell_centers

    def _reduce_grid_constit_2d(self, sd, constit):
        sd = sd.copy()
        cell_centers, face_normals, face_centers, _, _, nodes = (
            map_geometry.map_grid(sd)
        )
        sd.cell_centers = cell_centers
        sd.face_normals = face_normals
        sd.face_centers = face_centers
        sd.nodes = nodes
        constit = constit.copy()
        constit.values = np.delete(constit.values, (2, 5, 6, 7, 8), axis=0)
        constit.values = np.delete(constit.values, (2, 5, 6, 7, 8), axis=1)
        return sd, constit
