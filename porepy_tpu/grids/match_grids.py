"""Cell-overlap mappings between non-matching grids (reference
``grids/match_grids.py``): used when replacing grids in an md-grid (e.g.
non-matching mortars)."""

from __future__ import annotations

from typing import Optional

import numpy as np
import scipy.sparse as sps

from porepy_tpu.geometry import map_geometry
from porepy_tpu.geometry.intersections import line_tessellation, triangulations
from porepy_tpu.utils.array_operations import expand_index_pointers

__all__ = ["match_1d", "match_2d"]


def _scale_and_assemble(
    new_g, old_g, new_ind, old_ind, weights, tol, scaling
) -> sps.csr_matrix:
    new_ind = np.asarray(new_ind, dtype=int)
    old_ind = np.asarray(old_ind, dtype=int)
    weights = np.asarray(weights, dtype=float)
    if scaling == "averaged":
        weights = weights / new_g.cell_volumes[new_ind]
    elif scaling == "integrated":
        weights = weights / old_g.cell_volumes[old_ind]
    elif scaling is None:
        mask = weights > tol
        new_ind, old_ind = new_ind[mask], old_ind[mask]
        weights = np.ones_like(new_ind, dtype=float)
    else:
        raise ValueError(f"Unknown scaling {scaling!r}")
    return sps.coo_matrix(
        (weights, (new_ind, old_ind)),
        shape=(new_g.num_cells, old_g.num_cells),
    ).tocsr()


def match_1d(
    new_g, old_g, tol: float, scaling: Optional[str] = None
) -> sps.csr_matrix:
    """Overlap lengths between two aligned 1d grids as a mapping from old
    to new cells."""
    cn_new = new_g.cell_nodes()
    cn_old = old_g.cell_nodes()
    nodes_new = expand_index_pointers(cn_new.indptr[:-1], cn_new.indptr[1:])
    nodes_old = expand_index_pointers(cn_old.indptr[:-1], cn_old.indptr[1:])
    lines_new = cn_new.indices[nodes_new].reshape((2, -1), order="F")
    lines_old = cn_old.indices[nodes_old].reshape((2, -1), order="F")
    isect = line_tessellation(
        new_g.nodes, old_g.nodes, lines_new, lines_old
    )
    if not isect:
        return sps.csr_matrix((new_g.num_cells, old_g.num_cells))
    new_ind, old_ind, weights = map(np.asarray, zip(*isect))
    return _scale_and_assemble(
        new_g, old_g, new_ind, old_ind, weights, tol, scaling
    )


def match_2d(
    new_g, old_g, tol: float, scaling: Optional[str] = None
) -> sps.csr_matrix:
    """Overlap areas between two aligned 2d simplex grids as a mapping from
    old to new cells."""

    def proj_pts(p, center, normal):
        rot = map_geometry.project_plane_matrix(p - center, normal)
        return (rot @ (p - center))[:2]

    cn_new = new_g.cell_nodes().tocsc()
    cn_old = old_g.cell_nodes().tocsc()
    for cn, g in ((cn_new, new_g), (cn_old, old_g)):
        if not np.all(np.diff(cn.indptr) == g.dim + 1):
            raise ValueError(
                "Matching of 2d grids has only been implemented for simplex grids."
            )
    t_new = cn_new.indices.reshape((new_g.dim + 1, new_g.num_cells), order="F")
    t_old = cn_old.indices.reshape((old_g.dim + 1, old_g.num_cells), order="F")
    cc = np.mean(new_g.nodes, axis=1).reshape((3, 1))
    n = map_geometry.compute_normal(new_g.nodes - cc)
    n_old = map_geometry.compute_normal(old_g.nodes - cc)
    if not (np.allclose(n, n_old) or np.allclose(n, -n_old)):
        raise ValueError("The new and old grid must lie in the same plane")
    isect = triangulations(
        proj_pts(new_g.nodes, cc, n),
        proj_pts(old_g.nodes, cc, n),
        t_new,
        t_old,
    )
    if not isect:
        return sps.csr_matrix((new_g.num_cells, old_g.num_cells))
    new_ind, old_ind, weights = map(np.asarray, zip(*isect))
    return _scale_and_assemble(
        new_g, old_g, new_ind, old_ind, weights, tol, scaling
    )
