"""Shared machinery for multi-point FV discretizations (MPFA/MPSA).

Parity counterpart of reference ``numerics/fv/_fvutils.py``: the subcell
topology (interaction regions around vertices), continuity-point distance
computation, normal-times-tensor products on subcells, and the
boundary-exclusion operators that carve Dirichlet/Neumann/Robin subfaces
out of the local continuity systems.

All of this is host-side setup-time index algebra; the batched local solves
it feeds run on device (``linalg.matrix_operations.invert_diagonal_blocks``).
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sps

from porepy_tpu.numerics.linalg.matrix_operations import rlencode, rldecode

__all__ = [
    "SubcellTopology",
    "compute_dist_face_cell",
    "determine_eta",
    "scalar_tensor_vector_prod",
    "ExcludeBoundaries",
    "boundary_to_sub_boundary",
    "cell_vector_to_subcell",
    "cell_scalar_to_subcell_vector",
]


class SubcellTopology:
    """Subcell numbering around vertices (reference ``_fvutils.py:21``).

    Fields (all per sub-half-face, i.e. (cell, face, node) triplet):
    ``nno`` node, ``cno`` cell, ``fno`` face, ``subfno`` subface (same for
    the two sides of an interior face), ``subhfno`` running index; plus the
    ``*_unique`` variants with one entry per subface.
    """

    def __init__(self, sd) -> None:
        self.sd = sd
        sd.cell_faces.sort_indices()
        face_ind, cell_ind = sd.cell_faces.nonzero()
        num_face_nodes = np.diff(sd.face_nodes.indptr)

        cells_duplicated = rldecode(cell_ind, num_face_nodes[face_ind])
        faces_duplicated = rldecode(face_ind, num_face_nodes[face_ind])

        M = sps.coo_matrix(
            (np.ones(face_ind.size), (face_ind, np.arange(face_ind.size))),
            shape=(face_ind.max() + 1, face_ind.size),
        )
        nodes_duplicated = (sd.face_nodes @ M).indices

        sub_face_mat = sps.csc_matrix(
            (
                np.arange(sd.face_nodes.indices.size) + 1,
                sd.face_nodes.indices,
                sd.face_nodes.indptr,
            )
        )
        sub_faces = ((sub_face_mat @ M).data - 1).astype(int)

        idx = np.lexsort(
            (sub_faces, faces_duplicated, nodes_duplicated, cells_duplicated)
        )
        self.nno = nodes_duplicated[idx]
        self.cno = cells_duplicated[idx]
        self.fno = faces_duplicated[idx]
        self.subfno = sub_faces[idx].astype(int)
        self.subhfno = np.arange(idx.size)
        self.num_cno = self.cno.max() + 1
        self.num_nodes = self.nno.max() + 1

        _, unique_subfno = np.unique(self.subfno, return_index=True)
        self.num_subfno = self.subfno.max() + 1
        self.nno_unique = self.nno[unique_subfno]
        self.fno_unique = self.fno[unique_subfno]
        self.cno_unique = self.cno[unique_subfno]
        self.subfno_unique = self.subfno[unique_subfno]
        self.num_subfno_unique = self.subfno_unique.max() + 1
        self.unique_subfno = unique_subfno

    def pair_over_subfaces(self, other: sps.spmatrix) -> sps.spmatrix:
        """Pair the two sides of each subface, honoring the normal direction
        (sign from ``cell_faces``)."""
        sgn = np.asarray(self.sd.cell_faces[self.fno, self.cno]).ravel()
        pair = sps.coo_matrix((sgn, (self.subfno, self.subhfno)))
        return pair @ other

    def pair_over_subfaces_nd(self, other: sps.spmatrix) -> sps.spmatrix:
        nd = self.sd.dim
        sgn = np.asarray(self.sd.cell_faces[self.fno, self.cno]).ravel()
        pair = sps.coo_matrix((sgn, (self.subfno, self.subhfno)))
        return sps.kron(sps.eye(nd), pair) @ other


def compute_dist_face_cell(sd, subcell_topology, eta, return_paired: bool = True):
    """Vectors from cell centers to per-subface continuity points
    ``x_cp = (1-eta) x_face + eta x_vertex`` (eta forced to 0 on
    boundaries for scalar eta)."""
    _, blocksz = rlencode(np.vstack((subcell_topology.cno, subcell_topology.nno)))
    dims = sd.dim

    _, cols = np.meshgrid(subcell_topology.subhfno, np.arange(dims))
    cols += rldecode(np.cumsum(blocksz) - blocksz[0], blocksz)
    if np.asarray(eta).size == subcell_topology.num_subfno_unique:
        eta_vec = np.asarray(eta)[subcell_topology.subfno]
    elif np.asarray(eta).size == 1:
        eta_vec = eta * np.ones(subcell_topology.fno.size)
        bnd = np.isin(subcell_topology.fno, sd.get_all_boundary_faces())
        eta_vec[bnd] = 0
    else:
        raise ValueError("eta must be scalar or one value per subface")
    cp = sd.face_centers[:, subcell_topology.fno] + eta_vec * (
        sd.nodes[:, subcell_topology.nno]
        - sd.face_centers[:, subcell_topology.fno]
    )
    dist = cp - sd.cell_centers[:, subcell_topology.cno]

    ind_ptr = np.hstack((np.arange(0, cols.size, dims), cols.size))
    mat = sps.csr_matrix((dist.ravel("F"), cols.ravel("F"), ind_ptr))
    if return_paired:
        return subcell_topology.pair_over_subfaces(mat)
    return mat


def determine_eta(sd) -> float:
    """1/3 on simplices, 0 otherwise (reference ``_fvutils.py:280``)."""
    name = sd.name if isinstance(sd.name, str) else " ".join(sd.name)
    if "TriangleGrid" in name or "TetrahedralGrid" in name:
        return 1 / 3
    return 0


def scalar_tensor_vector_prod(sd, k, subcell_topology):
    """Per-subface products (normal . K) defining Darcy's law in terms of
    subcell gradients. Returns (nk, cell_node_blocks, sub_cell_index)."""
    cell_node_blocks, blocksz = rlencode(
        np.vstack((subcell_topology.cno, subcell_topology.nno))
    )
    nd = sd.dim
    if not np.all(blocksz == nd):
        raise AssertionError(
            "Each cell must have exactly dim faces meeting in each vertex"
        )

    _, j = np.meshgrid(subcell_topology.subhfno, np.arange(nd))
    sum_blocksz = np.cumsum(blocksz)
    j += rldecode(sum_blocksz - blocksz[0], blocksz)

    num_nodes = np.diff(sd.face_nodes.indptr)
    normals = (
        sd.face_normals[:, subcell_topology.fno]
        / num_nodes[subcell_topology.fno]
    )

    ind_ptr = np.hstack((np.arange(0, j.size, nd), j.size))
    normals_mat = sps.csr_matrix((normals.ravel("F"), j.ravel("F"), ind_ptr))
    k_mat = sps.csr_matrix(
        (k.values[:, :, cell_node_blocks[0]].ravel("F"), j.ravel("F"), ind_ptr)
    )
    nk = normals_mat @ k_mat
    sub_cell_ind = j[:, 0::nd]
    return nk, cell_node_blocks, sub_cell_ind


def boundary_to_sub_boundary(bound, subcell_topology):
    """Expand a face-wise boundary condition to subfaces."""
    bound = bound.copy()
    fno_u = subcell_topology.fno_unique
    bound.is_dir = np.atleast_2d(bound.is_dir)[:, fno_u].squeeze()
    bound.is_rob = np.atleast_2d(bound.is_rob)[:, fno_u].squeeze()
    bound.is_neu = np.atleast_2d(bound.is_neu)[:, fno_u].squeeze()
    bound.is_internal = np.atleast_2d(bound.is_internal)[:, fno_u].squeeze()
    if bound.robin_weight.ndim == 3:
        bound.robin_weight = bound.robin_weight[:, :, fno_u]
        bound.basis = bound.basis[:, :, fno_u]
    else:
        bound.robin_weight = bound.robin_weight[fno_u]
        bound.basis = bound.basis[fno_u]
    bound.num_faces = np.max(subcell_topology.subfno) + 1
    bound.bf = np.where(np.isin(subcell_topology.fno, bound.bf))[0]
    return bound


class ExcludeBoundaries:
    """Row-elimination operators for subfaces with prescribed boundary
    conditions (reference ``_fvutils.py:765``)."""

    def __init__(self, subcell_topology, bound, nd: int) -> None:
        self.nd = nd
        self.bc_type = bound.bc_type
        num_subfno = subcell_topology.num_subfno_unique
        self.num_subfno = num_subfno
        self.any_rob = bool(np.any(bound.is_rob))

        if self.bc_type == "scalar":
            self.basis_matrix = self._linear_transformation(bound.basis)
            self.robin_weight = self._linear_transformation(bound.robin_weight)
            ex = self._exclude_matrix
        elif self.bc_type == "vectorial":
            self.basis_matrix = self._linear_transformation(bound.basis)
            self.robin_weight = self._linear_transformation(bound.robin_weight)
            ex = self._exclude_matrix_xyz
        else:
            raise ValueError(f"Unknown bc type {self.bc_type!r}")

        self.exclude_neu = ex(bound.is_neu)
        self.exclude_dir = ex(bound.is_dir)
        self.exclude_rob = ex(bound.is_rob)
        self.exclude_neu_dir = ex(bound.is_neu | bound.is_dir)
        self.exclude_neu_rob = ex(bound.is_neu | bound.is_rob)
        self.exclude_rob_dir = ex(bound.is_rob | bound.is_dir)
        self.exclude_bnd = ex(bound.is_rob | bound.is_dir | bound.is_neu)
        self.keep_neu = ex(~bound.is_neu)
        self.keep_rob = ex(~bound.is_rob)

    def _linear_transformation(self, loc_trans):
        if self.bc_type == "scalar":
            col = np.arange(self.num_subfno)
            return sps.coo_matrix(
                (loc_trans, (col, col)),
                shape=(self.num_subfno, self.num_subfno),
            ).tocsr()
        data = loc_trans.ravel("C")
        row = np.arange(self.num_subfno * self.nd).reshape((-1, self.num_subfno))
        row = np.tile(row, (1, self.nd)).ravel("C")
        col = np.tile(np.arange(self.num_subfno * self.nd), (1, self.nd)).ravel()
        return sps.coo_matrix(
            (data, (row, col)),
            shape=(self.num_subfno * self.nd, self.num_subfno * self.nd),
        ).tocsr()

    def _exclude_matrix(self, ids):
        col = np.argwhere(np.logical_not(ids)).ravel()
        row = np.arange(col.size)
        return sps.coo_matrix(
            (np.ones(row.size, dtype=bool), (row, col)),
            shape=(row.size, self.num_subfno),
        ).tocsr()

    def _exclude_matrix_xyz(self, ids):
        col_x = np.flatnonzero(np.logical_not(ids[0]))
        col_y = np.flatnonzero(np.logical_not(ids[1])) + self.num_subfno
        cols = np.append(col_x, col_y)
        if self.nd == 3:
            col_z = np.flatnonzero(np.logical_not(ids[2])) + 2 * self.num_subfno
            cols = np.append(cols, col_z)
        rows = np.arange(cols.size)
        return sps.coo_matrix(
            (np.ones(rows.size), (rows, cols)),
            shape=(rows.size, self.nd * self.num_subfno),
        ).tocsr()

    # -- application helpers -------------------------------------------------

    def _apply(self, matrix, other, transform):
        if transform:
            return matrix * self.basis_matrix * other
        return matrix * other

    def exclude_dirichlet(self, other, transform: bool = True):
        return self._apply(self.exclude_dir, other, transform)

    def exclude_neumann(self, other, transform: bool = True):
        return self._apply(self.exclude_neu, other, transform)

    def exclude_neumann_robin(self, other, transform: bool = True):
        return self._apply(self.exclude_neu_rob, other, transform)

    def exclude_neumann_dirichlet(self, other, transform: bool = True):
        return self._apply(self.exclude_neu_dir, other, transform)

    def exclude_robin_dirichlet(self, other, transform: bool = True):
        return self._apply(self.exclude_rob_dir, other, transform)

    def exclude_boundary(self, other, transform: bool = False):
        return self._apply(self.exclude_bnd, other, transform)

    def keep_robin(self, other, transform: bool = True):
        return self._apply(self.keep_rob, other, transform)

    def keep_neumann(self, other, transform: bool = True):
        return self._apply(self.keep_neu, other, transform)


def cell_vector_to_subcell(nd, sub_cell_index, cell_index):
    """Map cell-wise nd-vectors to subcell gradient dofs."""
    from porepy_tpu.utils.array_operations import expand_indices_nd

    num_cells = cell_index.max() + 1
    rows = sub_cell_index.ravel("F")
    cols = expand_indices_nd(cell_index, nd)
    return sps.coo_matrix(
        (np.ones(rows.size), (rows, cols)),
        shape=(sub_cell_index.size, num_cells * nd),
    ).tocsr()


def cell_scalar_to_subcell_vector(nd, sub_cell_index, cell_index):
    """Map cell-wise scalars to subcell vector dofs (used by Biot)."""
    num_cells = cell_index.max() + 1
    mats = []
    for dim in range(nd):
        rows = np.arange(sub_cell_index[dim].size)
        mats.append(
            sps.coo_matrix(
                (np.ones(rows.size), (rows, cell_index)),
                shape=(sub_cell_index[dim].size, num_cells),
            ).tocsr()
        )
    return sps.vstack(mats).tocsr()


def map_hf_2_f(fno=None, subfno=None, nd=None, sd=None):
    """Mapping from half-faces (subface, component) to faces for vector
    problems (reference ``_fvutils.py:601``)."""
    from porepy_tpu.utils.array_operations import expand_indices_nd

    if sd is not None:
        s_t = SubcellTopology(sd)
        fno = s_t.fno_unique
        subfno = s_t.subfno_unique
        if nd is None:
            nd = sd.dim
    hfi = expand_indices_nd(subfno, nd)
    hf = expand_indices_nd(fno, nd)
    return sps.coo_matrix(
        (np.ones(hf.size), (hf, hfi)), shape=(hf.max() + 1, hfi.max() + 1)
    ).tocsr()
