"""Cell-wise tangential/normal coordinate systems on fracture grids.

Parity counterpart of reference ``utils/tangential_normal_projection.py``:
local bases constructed from fracture normal vectors (with the reference's
deterministic tangent conventions), block-diagonal projection matrices, and
the md-grid hook that stores one projection per codimension-1 subdomain —
the geometric foundation of fracture contact mechanics.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import scipy.sparse as sps

__all__ = ["TangentialNormalProjection", "set_local_coordinate_projections"]


class TangentialNormalProjection:
    def __init__(self, normals: np.ndarray) -> None:
        normals = normals / np.linalg.norm(normals, axis=0)
        self.num_vecs: int = normals.shape[1]
        self.dim: int = normals.shape[0]
        basis, normal = self._construct_local_basis(normals)
        basis = basis.reshape((self.dim, self.dim, self.num_vecs))
        self._projection = self._invert_3d_matrix(basis)
        self.normals = normal

    def project_tangential_normal(self, num: Optional[int] = None) -> sps.spmatrix:
        """Block-diagonal (dim x dim blocks): first dim-1 rows project to
        the tangent space, last row to the normal space."""
        if num is None:
            num = self._projection.shape[-1]
            blocks = [self._projection[:, :, i] for i in range(num)]
        else:
            blocks = [self._projection[:, :, 0]] * num
        return sps.block_diag(blocks, format="csc")

    def project_tangential(self, num: Optional[int] = None) -> sps.spmatrix:
        full = self.project_tangential_normal(num)
        if num is None:
            num = self.num_vecs
        size = self.dim * num
        rows = np.arange(num * (self.dim - 1))
        cols = np.setdiff1d(
            np.arange(size), np.arange(self.dim - 1, size, self.dim)
        )
        strip = sps.csc_matrix(
            (np.ones_like(rows), (rows, cols)), shape=(rows.size, size)
        )
        return strip * full

    def project_normal(self, num: Optional[int] = None) -> sps.spmatrix:
        full = self.project_tangential_normal(num)
        if num is None:
            num = self.num_vecs
        size = self.dim * num
        rows = np.arange(num)
        cols = np.arange(self.dim - 1, size, self.dim)
        strip = sps.csc_matrix(
            (np.ones_like(rows), (rows, cols)), shape=(rows.size, size)
        )
        return strip * full

    def _construct_local_basis(self, normal: np.ndarray):
        if self.dim == 2:
            normal = normal / np.linalg.norm(normal, axis=0)
            tc1 = np.zeros_like(normal)
            neg = normal[1] < 0
            tc1[:, neg] = np.vstack([-normal[1, neg], normal[0, neg]])
            pos = normal[1] > 0
            tc1[:, pos] = np.vstack([normal[1, pos], -normal[0, pos]])
            zero = normal[1] == 0
            tc1[1, zero] = 1
            basis = np.hstack([tc1, normal])
        else:
            normal = normal / np.linalg.norm(normal, axis=0)
            max_dim = np.argmax(np.abs(normal), axis=0)
            tc1 = np.zeros_like(normal)
            for i in range(self.dim):
                hit = max_dim == i
                other = np.setdiff1d(np.arange(self.dim), i)
                tc1[other[0], hit] = -normal[other[1], hit]
                tc1[other[1], hit] = normal[other[0], hit]
                aligned = np.logical_and(
                    hit, np.linalg.norm(normal[other], axis=0) < 1e-8
                )
                tc1[other[0], aligned] = 1
            tc1 = tc1 / np.linalg.norm(tc1, axis=0)
            tc2 = np.cross(normal, tc1, axis=0)
            tc2 = tc2 / np.linalg.norm(tc2, axis=0)
            basis = np.hstack([tc1, tc2, normal])
        return basis, normal

    @staticmethod
    def _invert_3d_matrix(M: np.ndarray) -> np.ndarray:
        M_inv = np.zeros(M.shape)
        for i in range(M.shape[-1]):
            M_inv[:, :, i] = np.linalg.inv(M[:, :, i])
        return M_inv


def set_local_coordinate_projections(mdg, interfaces=None) -> None:
    """Store a TangentialNormalProjection in the data dict of every
    codimension-1 subdomain (reference
    ``tangential_normal_projection.py:289``)."""
    if interfaces is None:
        interfaces = mdg.interfaces(dim=mdg.dim_max() - 1)
    for intf in interfaces:
        if intf.dim != mdg.dim_max() - 1:
            continue
        sd_primary, sd_secondary = mdg.interface_to_subdomain_pair(intf)
        faces_on_surface = intf.primary_to_mortar_int().tocsr().indices
        sgn, _ = sd_primary.signs_and_cells_of_boundary_faces(faces_on_surface)
        unit_normal = (
            sd_primary.face_normals[: sd_primary.dim] / sd_primary.face_areas
        )
        unit_normal[:, faces_on_surface] *= sgn
        # Zero the "other" (duplicate) side so the first side defines the
        # positive normal direction.
        unit_normal[:, intf._ind_face_on_other_side] = 0
        outwards_mortar = intf.primary_to_mortar_int().dot(unit_normal.T).T
        normal_lower = intf.mortar_to_secondary_int().dot(outwards_mortar.T).T
        projection = TangentialNormalProjection(normal_lower)
        mdg.subdomain_data(sd_secondary)["tangential_normal_projection"] = (
            projection
        )
