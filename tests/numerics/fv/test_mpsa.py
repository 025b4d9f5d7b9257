"""MPSA parity vs the reference: all four matrices on 2d/3d grids with
mixed vectorial BCs including Robin, plus the MomentumBalance model."""

import numpy as np
import pytest

import porepy_tpu as pt
from tests.conftest import requires_reference

KEYS = [
    "stress",
    "bound_stress",
    "bound_displacement_cell",
    "bound_displacement_face",
]


def _case(mod, nx, robin):
    rng = np.random.default_rng(3)
    g = mod.CartGrid(list(nx))
    g.compute_geometry()
    nc = g.num_cells
    mu = rng.uniform(0.5, 2.0, nc)
    lmbda = rng.uniform(0.5, 2.0, nc)
    C = mod.FourthOrderTensor(mu, lmbda)
    bf = g.get_boundary_faces()
    kinds = ["dir", "neu", "rob"] if robin else ["dir", "neu"]
    cond = [kinds[i % len(kinds)] for i in range(bf.size)]
    bc = mod.BoundaryConditionVectorial(g, bf, cond)
    return g, C, bc


@requires_reference
@pytest.mark.parametrize(
    "nx,robin",
    [([4, 3], False), ([4, 3], True), ([3, 2, 2], False), ([3, 2, 2], True)],
)
def test_mpsa_matrix_parity(ref_pp, nx, robin):
    g, C, bc = _case(pt, nx, robin)
    gr, Cr, bcr = _case(ref_pp, nx, robin)
    d = pt.initialize_data({}, "m", {"fourth_order_tensor": C, "bc": bc})
    pt.Mpsa("m").discretize(g, d)
    dr = ref_pp.initialize_data({}, "m", {"fourth_order_tensor": Cr, "bc": bcr})
    ref_pp.Mpsa("m").discretize(gr, dr)
    for key in KEYS:
        a = d[pt.DISCRETIZATION_MATRICES]["m"][key]
        b = dr[ref_pp.DISCRETIZATION_MATRICES]["m"][key]
        diff = abs(a - b)
        mx = diff.max() if diff.nnz else 0.0
        scale = max(abs(b).max(), 1e-300)
        assert mx / scale < 1e-10, (key, mx)


@requires_reference
def test_momentum_balance_parity(ref_pp):
    def make(mod, base):
        class M(base):
            def bc_values_displacement(self, bg):
                vals = np.zeros((self.nd, bg.num_cells))
                vals[1] = -0.01 * bg.cell_centers[1]
                return vals.ravel("F")

            def initialize_data_saving(self):
                pass

            def save_data_time_step(self):
                pass

        params = {
            "grid_type": "cartesian",
            "meshing_arguments": {"cell_size": 0.25},
            "material_constants": {
                "solid": mod.SolidConstants(shear_modulus=1.0, lame_lambda=1.0)
            },
        }
        return M(params), params

    m, p1 = make(pt, pt.MomentumBalance)
    pt.run_time_dependent_model(m, p1)
    u_o = m.equation_system.get_variable_values(["u"], time_step_index=0)
    r, p2 = make(ref_pp, ref_pp.MomentumBalance)
    ref_pp.run_time_dependent_model(r, p2)
    u_r = r.equation_system.get_variable_values(["u"], time_step_index=0)
    assert np.abs(u_o - u_r).max() < 1e-12


def test_momentum_balance_rigid_motion():
    """Uniform translation BCs produce a uniform displacement field."""

    class M(pt.MomentumBalance):
        def bc_values_displacement(self, bg):
            vals = np.zeros((self.nd, bg.num_cells))
            vals[0] = 0.5
            return vals.ravel("F")

    params = {"meshing_arguments": {"cell_size": 0.25}}
    m = M(params)
    pt.run_time_dependent_model(m, params)
    u = m.equation_system.get_variable_values(["u"], time_step_index=0)
    ux = u.reshape(-1, 2)[:, 0]
    uy = u.reshape(-1, 2)[:, 1]
    np.testing.assert_allclose(ux, 0.5, atol=1e-10)
    np.testing.assert_allclose(uy, 0.0, atol=1e-10)
