"""Simplex grids: bit-exact topology/geometry parity with the reference,
and FV discretization parity on triangular/tetrahedral meshes.

Reference values are golden-backed (record/replay via the ``golden``
fixture): computed live against ``tools.refshim`` when the reference
checkout is importable, replayed from ``tests/goldens/`` otherwise.
"""

import numpy as np
import pytest

import porepy_tpu as pt
from tests.conftest import assert_sparse_equal

GEOM_ATTRS = [
    "nodes",
    "cell_centers",
    "face_centers",
    "face_normals",
    "cell_volumes",
    "face_areas",
]


def _grid_record(gr) -> dict:
    gr.compute_geometry()
    out = {attr: np.asarray(getattr(gr, attr)) for attr in GEOM_ATTRS}
    out["cell_faces"] = gr.cell_faces
    out["face_nodes"] = gr.face_nodes.astype(int)
    return out


def _assert_grid_matches(g, rec: dict) -> None:
    g.compute_geometry()
    for attr in GEOM_ATTRS:
        assert np.abs(
            np.asarray(getattr(g, attr)) - np.asarray(rec[attr])
        ).max() < 1e-12, attr
    assert_sparse_equal(g.cell_faces, rec["cell_faces"])
    assert_sparse_equal(g.face_nodes.astype(int), rec["face_nodes"])


def test_triangle_grid_parity(golden):
    rng = np.random.default_rng(3)
    p = rng.random((2, 25))
    rec = golden(lambda ref_pp: _grid_record(ref_pp.TriangleGrid(p.copy())))
    _assert_grid_matches(pt.TriangleGrid(p.copy()), rec)


def test_triangle_grid_explicit_connectivity_parity(golden):
    import scipy.spatial

    rng = np.random.default_rng(4)
    p = rng.random((2, 16))
    tri = scipy.spatial.Delaunay(p.T).simplices.T
    rec = golden(
        lambda ref_pp: _grid_record(ref_pp.TriangleGrid(p.copy(), tri.copy()))
    )
    _assert_grid_matches(pt.TriangleGrid(p.copy(), tri.copy()), rec)


def test_structured_triangle_grid_parity(golden):
    rec = golden(
        lambda ref_pp: _grid_record(
            ref_pp.StructuredTriangleGrid(np.array([4, 3]), np.array([2.0, 1.0]))
        )
    )
    _assert_grid_matches(pt.StructuredTriangleGrid([4, 3], [2.0, 1.0]), rec)


def test_tetrahedral_grid_parity(golden):
    rng = np.random.default_rng(5)
    p = rng.random((3, 18))
    rec = golden(
        lambda ref_pp: _grid_record(ref_pp.TetrahedralGrid(p.copy()))
    )
    _assert_grid_matches(pt.TetrahedralGrid(p.copy()), rec)


def test_structured_tetrahedral_grid_parity(golden):
    rec = golden(
        lambda ref_pp: _grid_record(
            ref_pp.StructuredTetrahedralGrid(
                np.array([2, 2, 3]), np.array([1.0, 1.0, 2.0])
            )
        )
    )
    _assert_grid_matches(
        pt.StructuredTetrahedralGrid([2, 2, 3], [1.0, 1.0, 2.0]), rec
    )


@pytest.mark.parametrize("scheme", ["tpfa", "mpfa"])
def test_fv_discretization_on_triangles(golden, scheme):
    """TPFA/MPFA must be bit-exact on simplex geometry, which exercises the
    general polygonal code paths (non-orthogonal faces)."""
    g = pt.StructuredTriangleGrid([3, 3], [1.0, 1.0])
    g.compute_geometry()
    rng = np.random.default_rng(6)
    kxx = rng.uniform(0.5, 2.0, g.num_cells)
    bf = g.get_boundary_faces()
    cond = ["dir" if i % 2 == 0 else "neu" for i in range(bf.size)]
    keys = ("flux", "bound_flux", "bound_pressure_cell", "bound_pressure_face")

    def compute(ref_pp):
        gr = ref_pp.StructuredTriangleGrid(
            np.array([3, 3]), np.array([1.0, 1.0])
        )
        gr.compute_geometry()
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
        discr_r = (ref_pp.Tpfa if scheme == "tpfa" else ref_pp.Mpfa)("flow")
        discr_r.discretize(gr, dr)
        mdr = dr[ref_pp.DISCRETIZATION_MATRICES]["flow"]
        return {k: mdr[k] for k in keys}

    mdr = golden(compute)

    d = pt.initialize_data(
        {},
        "flow",
        {
            "second_order_tensor": pt.SecondOrderTensor(kxx),
            "bc": pt.BoundaryCondition(g, bf, cond),
            "ambient_dimension": 2,
        },
    )
    discr = (pt.Tpfa if scheme == "tpfa" else pt.Mpfa)("flow")
    discr.discretize(g, d)
    md = d[pt.DISCRETIZATION_MATRICES]["flow"]
    for key in keys:
        diff = abs(md[key] - mdr[key])
        assert (diff.max() if diff.nnz else 0.0) < 1e-10, key
