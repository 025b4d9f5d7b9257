"""Meshing helpers: mesh-size grading and interdimensional cell-face
matching (reference ``fracs/tools.py``)."""

import numpy as np

from porepy_tpu.fracs import meshing
from porepy_tpu.fracs.tools import (
    determine_mesh_size,
    obtain_interdim_mappings,
)


def test_mesh_size_graded_by_proximity():
    # Two parallel fractures 0.1 apart: the local size shrinks to the gap.
    pts = np.array(
        [[0.2, 0.8, 0.2, 0.8], [0.5, 0.5, 0.6, 0.6]]
    )
    lines = np.array([[0, 2], [1, 3]])
    sizes, pts_out, _ = determine_mesh_size(
        pts, None, lines, mesh_size_frac=0.4
    )
    assert np.allclose(sizes[:4], 0.1)
    # Isolated configuration keeps the user target.
    pts_far = np.array([[0.0, 1.0], [0.0, 0.0]])
    lines_far = np.array([[0], [1]])
    sizes_far, *_ = determine_mesh_size(
        pts_far, None, lines_far, mesh_size_frac=0.4
    )
    assert np.allclose(sizes_far, 0.4)
    # Boundary override.
    sizes_b, *_ = determine_mesh_size(
        pts_far,
        np.array([0, 1]),
        lines_far,
        mesh_size_frac=0.4,
        mesh_size_bound=0.2,
    )
    assert np.allclose(sizes_b, 0.2)


def test_interdim_mappings_match_split_faces():
    mdg = meshing.cart_grid(
        [np.array([[0.25, 0.75], [0.5, 0.5]])],
        np.array([4, 4]),
        physdims=[1.0, 1.0],
    )
    g_h = mdg.subdomains(dim=2)[0]
    g_l = mdg.subdomains(dim=1)[0]
    fn = g_h.face_nodes.indices.reshape((2, g_h.num_faces), order="F")
    fn = np.sort(g_h.global_point_ind[fn], axis=0)
    c2f, cells = obtain_interdim_mappings(g_l, fn, 2)
    assert cells.size == g_l.num_cells
    # The matched faces are tagged fracture faces whose centers coincide
    # with the fracture cell centers.
    assert np.all(g_h.tags["fracture_faces"][c2f])
    assert np.allclose(
        g_h.face_centers[:, c2f], g_l.cell_centers[:, cells]
    )
