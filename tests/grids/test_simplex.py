"""Simplex grids: bit-exact topology/geometry parity with the reference,
and FV discretization parity on triangular/tetrahedral meshes."""

import numpy as np
import pytest

import porepy_tpu as pt
from tests.conftest import assert_sparse_equal, requires_reference

GEOM_ATTRS = [
    "nodes",
    "cell_centers",
    "face_centers",
    "face_normals",
    "cell_volumes",
    "face_areas",
]


def _assert_grids_equal(g, gr):
    g.compute_geometry()
    gr.compute_geometry()
    assert g.num_cells == gr.num_cells
    assert g.num_faces == gr.num_faces
    assert g.num_nodes == gr.num_nodes
    for attr in GEOM_ATTRS:
        assert np.abs(
            np.asarray(getattr(g, attr)) - np.asarray(getattr(gr, attr))
        ).max() < 1e-12, attr
    assert_sparse_equal(g.cell_faces, gr.cell_faces)
    assert_sparse_equal(g.face_nodes.astype(int), gr.face_nodes.astype(int))


@requires_reference
def test_triangle_grid_parity(ref_pp):
    rng = np.random.default_rng(3)
    p = rng.random((2, 25))
    _assert_grids_equal(pt.TriangleGrid(p.copy()), ref_pp.TriangleGrid(p.copy()))


@requires_reference
def test_triangle_grid_explicit_connectivity_parity(ref_pp):
    import scipy.spatial

    rng = np.random.default_rng(4)
    p = rng.random((2, 16))
    tri = scipy.spatial.Delaunay(p.T).simplices.T
    _assert_grids_equal(
        pt.TriangleGrid(p.copy(), tri.copy()),
        ref_pp.TriangleGrid(p.copy(), tri.copy()),
    )


@requires_reference
def test_structured_triangle_grid_parity(ref_pp):
    _assert_grids_equal(
        pt.StructuredTriangleGrid([4, 3], [2.0, 1.0]),
        ref_pp.StructuredTriangleGrid(np.array([4, 3]), np.array([2.0, 1.0])),
    )


@requires_reference
def test_tetrahedral_grid_parity(ref_pp):
    rng = np.random.default_rng(5)
    p = rng.random((3, 18))
    _assert_grids_equal(
        pt.TetrahedralGrid(p.copy()), ref_pp.TetrahedralGrid(p.copy())
    )


@requires_reference
def test_structured_tetrahedral_grid_parity(ref_pp):
    _assert_grids_equal(
        pt.StructuredTetrahedralGrid([2, 2, 3], [1.0, 1.0, 2.0]),
        ref_pp.StructuredTetrahedralGrid(
            np.array([2, 2, 3]), np.array([1.0, 1.0, 2.0])
        ),
    )


@requires_reference
@pytest.mark.parametrize("scheme", ["tpfa", "mpfa"])
def test_fv_discretization_on_triangles(ref_pp, scheme):
    """TPFA/MPFA must be bit-exact on simplex geometry, which exercises the
    general polygonal code paths (non-orthogonal faces)."""
    g = pt.StructuredTriangleGrid([3, 3], [1.0, 1.0])
    g.compute_geometry()
    gr = ref_pp.StructuredTriangleGrid(np.array([3, 3]), np.array([1.0, 1.0]))
    gr.compute_geometry()
    rng = np.random.default_rng(6)
    kxx = rng.uniform(0.5, 2.0, g.num_cells)
    bf = g.get_boundary_faces()
    cond = ["dir" if i % 2 == 0 else "neu" for i in range(bf.size)]

    d = pt.initialize_data(
        {},
        "flow",
        {
            "second_order_tensor": pt.SecondOrderTensor(kxx),
            "bc": pt.BoundaryCondition(g, bf, cond),
            "ambient_dimension": 2,
        },
    )
    dr = ref_pp.initialize_data(
        {},
        "flow",
        {
            "second_order_tensor": ref_pp.SecondOrderTensor(kxx),
            "bc": ref_pp.BoundaryCondition(gr, bf, cond),
            "ambient_dimension": 2,
            "inverter": "python",
        },
    )
    discr = (pt.Tpfa if scheme == "tpfa" else pt.Mpfa)("flow")
    discr_r = (ref_pp.Tpfa if scheme == "tpfa" else ref_pp.Mpfa)("flow")
    discr.discretize(g, d)
    discr_r.discretize(gr, dr)
    md = d[pt.DISCRETIZATION_MATRICES]["flow"]
    mdr = dr[ref_pp.DISCRETIZATION_MATRICES]["flow"]
    for key in ("flux", "bound_flux", "bound_pressure_cell", "bound_pressure_face"):
        diff = abs(md[key] - mdr[key])
        assert (diff.max() if diff.nnz else 0.0) < 1e-10, key
