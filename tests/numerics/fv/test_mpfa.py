"""MPFA parity: all six discretization matrices vs the reference Mpfa on
2d/3d Cartesian grids with anisotropy, mixed Dirichlet/Neumann/Robin BCs,
and a fractured (split) grid. Also checks the batched block inverter
against the plain python path."""

import numpy as np
import pytest
import scipy.sparse as sps

import porepy_tpu as pt
from porepy_tpu.numerics.fv.mpfa import Mpfa
from porepy_tpu.numerics.linalg.matrix_operations import invert_diagonal_blocks

KEYS = [
    "flux",
    "bound_flux",
    "bound_pressure_cell",
    "bound_pressure_face",
    "vector_source",
    "bound_pressure_vector_source",
]


def _case(pp_mod, nx, anisotropic, robin):
    rng = np.random.default_rng(7)
    g = pp_mod.CartGrid(list(nx))
    g.compute_geometry()
    nc = g.num_cells
    kxx = rng.uniform(0.5, 2.0, nc)
    if anisotropic and len(nx) >= 2:
        kyy = rng.uniform(0.5, 2.0, nc)
        kxy = rng.uniform(-0.2, 0.2, nc)
        k = pp_mod.SecondOrderTensor(kxx, kyy=kyy, kxy=kxy)
    else:
        k = pp_mod.SecondOrderTensor(kxx)
    bf = g.get_boundary_faces()
    kinds = ["dir", "neu", "rob"] if robin else ["dir", "neu"]
    cond = [kinds[i % len(kinds)] for i in range(bf.size)]
    bc = pp_mod.BoundaryCondition(g, bf, cond)
    return g, k, bc


@pytest.mark.parametrize(
    "nx,anisotropic,robin",
    [
        ([4, 3], False, False),
        ([4, 3], True, False),
        ([4, 3], False, True),
        ([3, 2, 2], False, False),
        ([3, 2, 2], True, True),
    ],
)
def test_mpfa_matrix_parity(golden, nx, anisotropic, robin):
    g, k, bc = _case(pt, nx, anisotropic, robin)
    d = pt.initialize_data({}, "f", {"second_order_tensor": k, "bc": bc})
    Mpfa("f").discretize(g, d)

    def compute(ref_pp):
        gr, kr, bcr = _case(ref_pp, nx, anisotropic, robin)
        dr = ref_pp.initialize_data(
            {}, "f", {"second_order_tensor": kr, "bc": bcr}
        )
        ref_pp.Mpfa("f").discretize(gr, dr)
        return {
            key: dr[ref_pp.DISCRETIZATION_MATRICES]["f"][key] for key in KEYS
        }

    ref = golden(compute)
    for key in KEYS:
        a = d[pt.DISCRETIZATION_MATRICES]["f"][key]
        b = ref[key]
        diff = abs(a - b)
        mx = diff.max() if diff.nnz else 0.0
        scale = max(abs(b).max(), 1e-300)
        assert mx / scale < 1e-10, (key, mx)


def test_mpfa_parity_on_split_grid(golden):
    """MPFA on a fractured (face-split) grid: the interaction regions see
    the internal boundary; matrices must agree with the reference."""
    from porepy_tpu.fracs import meshing

    f = np.array([[1.0, 3.0], [2.0, 2.0]])
    mdg = meshing.cart_grid([f], np.array([4, 4]))
    sd = mdg.subdomains(dim=2)[0]
    k = pt.SecondOrderTensor(np.ones(sd.num_cells))
    bc = pt.BoundaryCondition(sd, sd.get_boundary_faces(), "dir")
    d = pt.initialize_data({}, "f", {"second_order_tensor": k, "bc": bc})
    Mpfa("f").discretize(sd, d)

    def compute(ref_pp):
        mdg_ref = ref_pp.meshing.cart_grid([f], np.array([4, 4]))
        sdr = mdg_ref.subdomains(dim=2)[0]
        kr = ref_pp.SecondOrderTensor(np.ones(sdr.num_cells))
        bcr = ref_pp.BoundaryCondition(sdr, sdr.get_boundary_faces(), "dir")
        dr = ref_pp.initialize_data(
            {}, "f", {"second_order_tensor": kr, "bc": bcr}
        )
        ref_pp.Mpfa("f").discretize(sdr, dr)
        return {
            key: dr[ref_pp.DISCRETIZATION_MATRICES]["f"][key] for key in KEYS
        }

    ref = golden(compute)
    for key in KEYS:
        a = d[pt.DISCRETIZATION_MATRICES]["f"][key]
        b = ref[key]
        diff = abs(a - b)
        mx = diff.max() if diff.nnz else 0.0
        scale = max(abs(b).max(), 1e-300)
        assert mx / scale < 1e-10, (key, mx)


def test_invert_diagonal_blocks_batched_vs_python(rng):
    sizes = np.array([2, 3, 2, 5, 3, 2])
    blocks = [rng.normal(size=(n, n)) + 3 * np.eye(n) for n in sizes]
    mat = sps.block_diag(blocks, format="csr")
    inv_batched = invert_diagonal_blocks(mat, sizes)
    inv_python = invert_diagonal_blocks(mat, sizes, method="python")
    np.testing.assert_allclose(
        inv_batched.toarray(), inv_python.toarray(), atol=1e-12
    )
    # Is a true inverse.
    np.testing.assert_allclose(
        (inv_batched @ mat).toarray(), np.eye(int(sizes.sum())), atol=1e-10
    )


def test_mpfa_uniform_flow_exact():
    g = pt.CartGrid([5, 4], physdims=[1, 1])
    g.compute_geometry()
    k = pt.SecondOrderTensor(2.0 * np.ones(g.num_cells))
    bf = g.get_boundary_faces()
    bc = pt.BoundaryCondition(g, bf, "dir")
    d = pt.initialize_data({}, "f", {"second_order_tensor": k, "bc": bc})
    Mpfa("f").discretize(g, d)
    md = d[pt.DISCRETIZATION_MATRICES]["f"]
    p = 3.0 * g.cell_centers[0]
    bc_values = np.zeros(g.num_faces)
    bc_values[bf] = 3.0 * g.face_centers[0, bf]
    flux = md["flux"] @ p + md["bound_flux"] @ bc_values
    np.testing.assert_allclose(flux, -6.0 * g.face_normals[0], atol=1e-10)
