"""TPFA parity and behavior tests.

Parity: all six discretization matrices against the reference Tpfa on
Cartesian grids in 1d/2d/3d with mixed Dirichlet/Neumann BCs and
anisotropic permeability. Behavior: matrix-free flux evaluation equals
matrix product; uniform-flow exactness; differentiability w.r.t.
permeability.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import porepy_tpu as pt
from porepy_tpu.numerics.fv import tpfa as fvtpfa
from porepy_tpu.numerics.fv.fv_mesh import BoundaryMasks, FvMesh
from tests.conftest import assert_sparse_equal

KEYS = [
    "flux",
    "bound_flux",
    "bound_pressure_cell",
    "bound_pressure_face",
    "vector_source",
    "bound_pressure_vector_source",
]


def _make_case(pp_mod, nx, anisotropic, rng):
    g = pp_mod.CartGrid(nx)
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
    cond = ["dir" if i % 2 == 0 else "neu" for i in range(bf.size)]
    bc = pp_mod.BoundaryCondition(g, bf, cond)
    data = pp_mod.initialize_data(
        {}, "flow", {"second_order_tensor": k, "bc": bc}
    ) if pp_mod is pt else None
    return g, k, bc, data


@pytest.mark.parametrize("nx", [[5], [4, 3], [3, 2, 2]])
@pytest.mark.parametrize("anisotropic", [False, True])
def test_tpfa_matrix_parity(golden, nx, anisotropic, rng):
    g, k, bc, data = _make_case(pt, nx, anisotropic, np.random.default_rng(7))
    pt.Tpfa("flow").discretize(g, data)

    def compute(ref_pp):
        g_ref, k_ref, bc_ref, _ = _make_case(
            ref_pp, nx, anisotropic, np.random.default_rng(7)
        )
        data_ref = ref_pp.initialize_data(
            {}, "flow", {"second_order_tensor": k_ref, "bc": bc_ref}
        )
        ref_pp.Tpfa("flow").discretize(g_ref, data_ref)
        return {
            key: data_ref[ref_pp.DISCRETIZATION_MATRICES]["flow"][key]
            for key in KEYS
        }

    ref = golden(compute)
    for key in KEYS:
        a = data[pt.DISCRETIZATION_MATRICES]["flow"][key]
        assert_sparse_equal(a, ref[key], atol=1e-12, rtol=1e-10)


def test_matrix_free_flux_matches_matrices(rng):
    g, k, bc, data = _make_case(pt, [4, 4], True, rng)
    pt.Tpfa("flow").discretize(g, data)
    md = data[pt.DISCRETIZATION_MATRICES]["flow"]

    mesh = FvMesh.from_grid(g)
    bnd = BoundaryMasks.from_bc(bc)
    t, _ = fvtpfa.effective_transmissibilities(mesh, jnp.asarray(k.values), bnd)

    p = rng.normal(size=g.num_cells)
    bc_values = np.zeros(g.num_faces)
    bc_values[g.get_boundary_faces()] = rng.normal(size=g.get_boundary_faces().size)

    coeff = fvtpfa.boundary_flux_coefficients(mesh, t, bnd)
    flux_free = fvtpfa.apply_flux(
        mesh, t, jnp.asarray(p), coeff, jnp.asarray(bc_values)
    )
    flux_mat = md["flux"] @ p + md["bound_flux"] @ bc_values
    np.testing.assert_allclose(np.asarray(flux_free), flux_mat, atol=1e-12)


def test_uniform_flow_exact():
    """Linear pressure field with Dirichlet BCs: flux must equal -K dp/dx
    exactly (TPFA is exact for linear fields on K-orthogonal grids)."""
    g = pt.CartGrid([6, 5])
    g.compute_geometry()
    k = pt.SecondOrderTensor(2.0 * np.ones(g.num_cells))
    bf = g.get_boundary_faces()
    bc = pt.BoundaryCondition(g, bf, "dir")
    data = pt.initialize_data({}, "flow", {"second_order_tensor": k, "bc": bc})
    pt.Tpfa("flow").discretize(g, data)
    md = data[pt.DISCRETIZATION_MATRICES]["flow"]

    p_ex = lambda x: 3.0 * x[0]  # noqa: E731
    p = p_ex(g.cell_centers)
    bc_values = np.zeros(g.num_faces)
    bc_values[bf] = p_ex(g.face_centers[:, bf])
    flux = md["flux"] @ p + md["bound_flux"] @ bc_values
    # Expected: q = -K grad p . n = -2*3 * nx (area-weighted)
    expected = -6.0 * g.face_normals[0]
    np.testing.assert_allclose(flux, expected, atol=1e-10)


def test_transmissibility_grad():
    """The jax core is differentiable w.r.t. permeability."""
    g = pt.CartGrid([3, 3])
    g.compute_geometry()
    mesh = FvMesh.from_grid(g)

    def total_t(kxx):
        return jnp.sum(fvtpfa.face_transmissibilities(mesh, kxx))

    kxx = jnp.ones(g.num_cells)
    grad = jax.grad(total_t)(kxx)
    assert np.all(np.isfinite(np.asarray(grad)))
    assert np.any(np.asarray(grad) != 0)


def test_tpfa_0d():
    g = pt.Grid(
        0,
        np.zeros((3, 1)),
        __import__("scipy.sparse", fromlist=["csc_matrix"]).csc_matrix((1, 0)),
        __import__("scipy.sparse", fromlist=["csc_matrix"]).csc_matrix((0, 1)),
    )
    g.cell_centers = np.zeros((3, 1))
    g.compute_geometry()
    data = pt.initialize_data({}, "flow", {})
    pt.Tpfa("flow").discretize(g, data)
    assert data[pt.DISCRETIZATION_MATRICES]["flow"]["flux"].shape == (0, 1)
