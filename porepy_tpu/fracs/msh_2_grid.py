"""Grid construction from point clouds (reference ``fracs/msh_2_grid.py``).

Currently: embedded 1d line grids (used by structured fracture meshing and,
later, by the gmsh-output reader).
"""

from __future__ import annotations

import numpy as np

from porepy_tpu.geometry import map_geometry
from porepy_tpu.grids.structured import TensorGrid

__all__ = ["create_embedded_line_grid"]


def create_embedded_line_grid(
    loc_coord: np.ndarray, glob_id: np.ndarray, tol: float = 1e-4
):
    """1d grid through collinear points embedded in 3d, with global node
    indices recorded (reference ``msh_2_grid.py:454``)."""
    loc_coord = np.asarray(loc_coord, dtype=float)
    loc_center = loc_coord.mean(axis=1, keepdims=True)
    sorted_coord, rot, active_dim, sort_ind = map_geometry.project_points_to_line(
        loc_coord, tol
    )
    g = TensorGrid(sorted_coord)
    nodes = np.zeros(g.nodes.shape)
    nodes[active_dim] = g.nodes[0]
    g.nodes = rot.T @ nodes + loc_center
    g.global_point_ind = np.asarray(glob_id)[sort_ind]
    return g
