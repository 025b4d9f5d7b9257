"""MVEM and RT0 mixed discretizations: matrix and assembly parity."""

import numpy as np
import pytest
import scipy.sparse as sps

import porepy_tpu as pt
from porepy_tpu.numerics.fem.rt0 import RT0
from porepy_tpu.numerics.vem.mvem import MVEM


def _grid(mod, kind):
    if kind == "cart2d":
        g = mod.CartGrid(np.array([4, 3]))
    elif kind == "cart3d":
        g = mod.CartGrid(np.array([2, 2, 2]))
    elif kind == "tri":
        g = mod.StructuredTriangleGrid(np.array([3, 3]), np.array([1.0, 1.0]))
    elif kind == "tet":
        g = mod.StructuredTetrahedralGrid(
            np.array([2, 2, 2]), np.array([1.0, 1.0, 1.0])
        )
    else:  # rotated 1d
        g = mod.TensorGrid(np.linspace(0, 1, 6))
        g.nodes[1] = g.nodes[0] * 0.5
    g.compute_geometry()
    return g


@pytest.mark.parametrize(
    "scheme,kind",
    [
        ("mvem", "cart2d"),
        ("mvem", "cart3d"),
        ("mvem", "tri"),
        ("mvem", "1d"),
        ("rt0", "tri"),
        ("rt0", "tet"),
        ("rt0", "1d"),
    ],
)
def test_dual_discretization_parity(golden, scheme, kind):
    g = _grid(pt, kind)
    rng = np.random.default_rng(23)
    kxx = rng.uniform(0.5, 2.0, g.num_cells)
    bf = g.get_boundary_faces()
    cond = ["dir" if i % 2 == 0 else "neu" for i in range(bf.size)]
    bcv = rng.random(g.num_faces)
    d = pt.initialize_data(
        {},
        "flow",
        {
            "second_order_tensor": pt.SecondOrderTensor(kxx),
            "bc": pt.BoundaryCondition(g, bf, cond),
            "bc_values": bcv.copy(),
        },
    )
    Disc = MVEM if scheme == "mvem" else RT0
    Disc("flow").discretize(g, d)
    md = d[pt.DISCRETIZATION_MATRICES]["flow"]
    A_m, b_m = Disc("flow").assemble_matrix_rhs(g, d)

    def compute(ref_pp):
        gr = _grid(ref_pp, kind)
        dr = ref_pp.initialize_data(
            {},
            "flow",
            {
                "second_order_tensor": ref_pp.SecondOrderTensor(kxx),
                "bc": ref_pp.BoundaryCondition(gr, bf, cond),
                "bc_values": bcv.copy(),
            },
        )
        RefDisc = ref_pp.MVEM if scheme == "mvem" else ref_pp.RT0
        RefDisc("flow").discretize(gr, dr)
        mdr = dr[ref_pp.DISCRETIZATION_MATRICES]["flow"]
        A_r, b_r = RefDisc("flow").assemble_matrix_rhs(gr, dr)
        out = {
            key: sps.csr_matrix(mdr[key])
            for key in ("mass", "div", "vector_proj")
        }
        out["A"] = sps.csr_matrix(A_r)
        out["b"] = np.asarray(b_r)
        return out

    ref = golden(compute)
    for key in ("mass", "div", "vector_proj"):
        A = sps.csr_matrix(md[key])
        B = sps.csr_matrix(ref[key])
        assert A.shape == B.shape, key
        diff = abs(A - B)
        assert (diff.max() if diff.nnz else 0.0) < 1e-10, key

    diff = abs(sps.csr_matrix(A_m) - sps.csr_matrix(ref["A"]))
    assert (diff.max() if diff.nnz else 0.0) < 1e-10
    assert np.allclose(b_m, ref["b"])


def test_mvem_solves_linear_pressure():
    """Mixed solve on a Cartesian grid reproduces a linear pressure field
    exactly (patch-test property of MVEM)."""
    g = pt.CartGrid([5, 5], physdims=[1, 1])
    g.compute_geometry()
    bf = g.get_boundary_faces()
    bc = pt.BoundaryCondition(g, bf, ["dir"] * bf.size)
    bc_values = np.zeros(g.num_faces)
    bc_values[bf] = g.face_centers[0, bf]  # p = x on the boundary
    d = pt.initialize_data(
        {},
        "flow",
        {
            "second_order_tensor": pt.SecondOrderTensor(np.ones(g.num_cells)),
            "bc": bc,
            "bc_values": bc_values,
        },
    )
    discr = MVEM("flow")
    discr.discretize(g, d)
    A, b = discr.assemble_matrix_rhs(g, d)
    import scipy.sparse.linalg as spla

    x = spla.spsolve(A.tocsc(), b)
    p = discr.extract_pressure(g, x, d)
    assert np.abs(p - g.cell_centers[0]).max() < 1e-10
