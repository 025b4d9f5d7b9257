"""Biot poroelastic coupling terms on top of MPSA.

Parity counterpart of reference ``numerics/fv/biot.py``: reuses the MPSA
inverse-gradient machinery to discretize the coupling terms of
poromechanics —

- ``scalar_gradient``: alpha grad(p) in the momentum balance,
- ``displacement_divergence`` (+ boundary variant): alpha : grad(u) in the
  mass balance,
- ``mpsa_consistency``: the stabilization term of Nordbotten (2016),
- ``bound_displacement_pressure``: pressure contribution to boundary
  displacement reconstruction.

Coupling coefficients are given per keyword via the
``scalar_vector_mappings`` parameter ({keyword: alpha}), producing one
matrix set per coupled scalar, exactly like the reference.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sps

from porepy_tpu.numerics.fv import _fvutils
from porepy_tpu.numerics.fv.mpsa import Mpsa
from porepy_tpu.params.tensor import SecondOrderTensor
from porepy_tpu.utils import common_constants as cc
from porepy_tpu.utils.array_operations import expand_indices_nd

__all__ = ["Biot"]


def _expand_indices_add_increment(x: np.ndarray, n: int, increment: int) -> np.ndarray:
    ind_nd = np.tile(x, (n, 1))
    ind_incr = ind_nd + increment * np.arange(n)[:, None]
    return ind_incr.reshape(-1, order="F")


class Biot(Mpsa):
    def __init__(self, keyword: str = "mechanics") -> None:
        super().__init__(keyword)
        self.displacement_divergence_matrix_key = "displacement_divergence"
        self.bound_displacement_divergence_matrix_key = (
            "boundary_displacement_divergence"
        )
        self.scalar_gradient_matrix_key = "scalar_gradient"
        self.consistency_matrix_key = "mpsa_consistency"
        self.bound_pressure_matrix_key = "bound_displacement_pressure"

    def ndof(self, sd) -> int:
        return sd.num_cells * (sd.dim + 1)

    def discretize(self, sd, data: dict) -> None:
        param = data[cc.PARAMETERS][self.keyword]
        matrices = data[cc.DISCRETIZATION_MATRICES][self.keyword]
        bound = param["bc"]
        constit = param["fourth_order_tensor"]
        eta = param.get("mpsa_eta", _fvutils.determine_eta(sd))
        inverter = param.get("inverter", None)
        scalar_vector_mappings: dict = param["scalar_vector_mappings"]

        alphas: dict[str, SecondOrderTensor] = {}
        for key, alpha in scalar_vector_mappings.items():
            if isinstance(alpha, (float, int)):
                alphas[key] = SecondOrderTensor(
                    float(alpha) * np.ones(sd.num_cells)
                )
            else:
                alphas[key] = alpha

        (
            stress,
            bound_stress,
            displacement_divergence,
            bound_displacement_divergence,
            scalar_gradient,
            consistency,
            disp_cell,
            disp_bound,
            disp_pressure,
        ) = self._local_discretization(sd, constit, bound, alphas, eta, inverter)

        matrices[self.stress_matrix_key] = stress
        matrices[self.bound_stress_matrix_key] = bound_stress
        matrices[self.displacement_divergence_matrix_key] = displacement_divergence
        matrices[self.bound_displacement_divergence_matrix_key] = (
            bound_displacement_divergence
        )
        matrices[self.scalar_gradient_matrix_key] = scalar_gradient
        matrices[self.consistency_matrix_key] = consistency
        matrices[self.bound_displacement_cell_matrix_key] = disp_cell
        matrices[self.bound_displacement_face_matrix_key] = disp_bound
        matrices[self.bound_pressure_matrix_key] = disp_pressure

    def _local_discretization(
        self, sd, constit, bound_mech, alphas, eta, inverter
    ):
        if sd.dim == 2:
            # 2d alphas must be reduced along with the grid rotation.
            sd_full = sd
            sd, constit = self._reduce_grid_constit_2d(sd, constit)
            _ = sd_full
        nd = sd.dim

        subcell_topology = _fvutils.SubcellTopology(sd)
        if bound_mech.num_faces == subcell_topology.num_subfno_unique:
            subface_rhs = True
        else:
            bound_mech = _fvutils.boundary_to_sub_boundary(
                bound_mech, subcell_topology
            )
            subface_rhs = False
        bound_exclusion = _fvutils.ExcludeBoundaries(
            subcell_topology, bound_mech, nd
        )

        hook, igrad, cell_node_blocks = self._create_inverse_gradient_matrix(
            sd, constit, subcell_topology, bound_exclusion, eta, inverter
        )
        num_sub_cells = cell_node_blocks.shape[0]
        rhs_cells = self._create_rhs_cell_center(
            sd, subcell_topology, eta, num_sub_cells, bound_exclusion
        )

        stress = hook * igrad * rhs_cells
        rhs_bound = self._create_bound_rhs(
            bound_mech, bound_exclusion, subcell_topology, sd, subface_rhs
        )
        bound_stress = hook * igrad * rhs_bound

        hf2f = _fvutils.map_hf_2_f(
            subcell_topology.fno_unique, subcell_topology.subfno_unique, nd
        )
        bound_stress = hf2f * bound_stress * hf2f.T
        stress = hf2f * stress
        rhs_bound = rhs_bound * hf2f.T
        num_subfaces = np.asarray(hf2f.sum(axis=1)).ravel()
        scaling = sps.dia_matrix(
            (1.0 / num_subfaces, 0), shape=(hf2f.shape[0], hf2f.shape[0])
        )

        dist_grad, cell_centers = self._reconstruct_displacement(
            sd, subcell_topology, eta
        )

        scalar_gradient = {}
        bound_displacement_divergence = {}
        displacement_divergence = {}
        consistency = {}
        disp_pressure = {}
        for key in alphas:
            add_subcell = self._subcell_gradient_to_cell_scalar(
                sd, cell_node_blocks, alphas[key], igrad
            )
            add_igrad = add_subcell * igrad
            displacement_divergence[key] = add_igrad * rhs_cells
            bound_displacement_divergence[key] = add_igrad * rhs_bound

            rhs_jumps, scalar_gradient_face = self._create_rhs_scalar_gradient(
                sd, subcell_topology, alphas[key], bound_exclusion
            )
            scalar_gradient[key] = hf2f * (
                hook * igrad * rhs_jumps + scalar_gradient_face
            )
            disp_pressure[key] = scaling * hf2f * dist_grad * igrad * rhs_jumps
            consistency[key] = add_subcell * igrad * rhs_jumps

        disp_cell = scaling * hf2f * (dist_grad * igrad * rhs_cells + cell_centers)
        disp_bound = scaling * hf2f * (dist_grad * igrad * rhs_bound)

        return (
            stress,
            bound_stress,
            displacement_divergence,
            bound_displacement_divergence,
            scalar_gradient,
            consistency,
            disp_cell,
            disp_bound,
            disp_pressure,
        )

    def _create_rhs_scalar_gradient(
        self, sd, subcell_topology, alpha, bound_exclusion
    ):
        nd = sd.dim
        num_subhfno = subcell_topology.subhfno.size
        num_subfno_unique = subcell_topology.num_subfno_unique
        num_subfno = subcell_topology.num_subfno

        if nd == 2:
            alpha = alpha.copy()
            alpha.values = np.delete(alpha.values, (2), axis=0)
            alpha.values = np.delete(alpha.values, (2), axis=1)

        nAlpha_grad, cell_node_blocks, sub_cell_index = (
            _fvutils.scalar_tensor_vector_prod(sd, alpha, subcell_topology)
        )
        unique_nAlpha_grad = subcell_topology.pair_over_subfaces(nAlpha_grad)

        def component_wise_ordering(mat, nd, ind):
            return sps.block_diag(
                [mat[:, ind[i]] for i in range(nd)], format="csr"
            )

        nAlpha_grad = component_wise_ordering(nAlpha_grad, nd, sub_cell_index)
        unique_nAlpha_grad = component_wise_ordering(
            unique_nAlpha_grad, nd, sub_cell_index
        )

        sz = nd * num_subfno_unique
        rhs_units = sps.dia_matrix((np.ones(sz), 0), shape=(sz, sz))
        rhs_int = bound_exclusion.exclude_boundary(rhs_units)
        rhs_neu = bound_exclusion.keep_neumann(rhs_units)
        rhs_rob = bound_exclusion.keep_robin(rhs_units)

        num_dir_subface = (
            bound_exclusion.exclude_neu_rob.shape[1]
            - bound_exclusion.exclude_neu_rob.shape[0]
        )
        rhs_units_displ_var = sps.csr_matrix(
            (nd * num_subfno - num_dir_subface, num_subfno_unique * nd)
        )
        row_mapping = sps.vstack([rhs_int, rhs_neu, rhs_rob, rhs_units_displ_var])

        sc2c = _fvutils.cell_scalar_to_subcell_vector(
            sd.dim, sub_cell_index, cell_node_blocks[0]
        )
        rhs_jumps = row_mapping * unique_nAlpha_grad * sc2c

        vals = np.ones(num_subfno_unique * nd)
        rows = expand_indices_nd(subcell_topology.subfno_unique, nd)
        cols = _expand_indices_add_increment(
            subcell_topology.unique_subfno, nd, num_subhfno
        )
        map_unique_subfno = sps.coo_matrix(
            (vals, (rows, cols)),
            shape=(num_subfno_unique * nd, num_subhfno * nd),
        ).tocsr()
        scalar_gradient_face = -map_unique_subfno * nAlpha_grad * sc2c
        return rhs_jumps, scalar_gradient_face

    def _face_vector_to_scalar(self, nf: int, nd: int) -> sps.csr_matrix:
        rows = np.tile(np.arange(nf), ((nd, 1))).reshape((1, nd * nf), order="F")[0]
        cols = expand_indices_nd(np.arange(nf), nd)
        return sps.coo_matrix((np.ones(nf * nd), (rows, cols))).tocsr()

    def _subcell_gradient_to_cell_scalar(
        self, sd, cell_node_blocks, alpha, igrad
    ):
        nd = sd.dim
        inds = np.arange(nd**2)
        row, col = np.meshgrid(np.arange(cell_node_blocks.shape[1]), inds)
        incr = np.cumsum(nd**2 * np.ones(cell_node_blocks.shape[1])) - nd**2
        col = col + incr.astype(int)

        subcell_alpha = alpha.values[:nd, :nd, cell_node_blocks[0]]
        subcell_alpha_reordered = (
            subcell_alpha.swapaxes(2, 1).swapaxes(1, 0).ravel()
        )
        num_cell_nodes = sd.num_cell_nodes()
        cell_vol = sd.cell_volumes / num_cell_nodes
        factor = np.repeat(cell_vol[cell_node_blocks[0]], nd**2)
        val = factor * subcell_alpha_reordered
        vector_2_scalar = sps.coo_matrix(
            (val.ravel("F"), (row.ravel("F"), col.ravel("F")))
        ).tocsr()
        div_op = sps.coo_matrix(
            (
                np.ones(cell_node_blocks.shape[1]),
                (cell_node_blocks[0], np.arange(cell_node_blocks.shape[1])),
            )
        ).tocsr()
        return div_op * vector_2_scalar
