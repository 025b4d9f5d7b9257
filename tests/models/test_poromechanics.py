"""Biot discretization and coupled poromechanics: parity with the
reference on all coupling matrices and on transient coupled fields."""

import numpy as np
import pytest

import porepy_tpu as pt



_BIOT_MECH_KEYS = (
    "stress",
    "bound_stress",
    "bound_displacement_cell",
    "bound_displacement_face",
)
_BIOT_COUPLING_KEYS = (
    "scalar_gradient",
    "displacement_divergence",
    "boundary_displacement_divergence",
    "mpsa_consistency",
    "bound_displacement_pressure",
)


def _biot_inputs(nx):
    rng = np.random.default_rng(5 + len(nx))
    nc = int(np.prod(nx))
    mu = rng.uniform(0.5, 2.0, nc)
    lmbda = rng.uniform(0.5, 2.0, nc)
    return mu, lmbda


@pytest.mark.parametrize("nx", [[4, 3], [3, 2, 2]], ids=["2d", "3d"])
def test_biot_matrix_parity(golden, nx):
    g = pt.CartGrid(list(nx))
    g.compute_geometry()
    mu, lmbda = _biot_inputs(nx)
    bf = g.get_boundary_faces()
    cond = ["dir" if i % 2 == 0 else "neu" for i in range(bf.size)]
    svm = {"flow": 0.8}

    d = pt.initialize_data(
        {},
        "mechanics",
        {
            "fourth_order_tensor": pt.FourthOrderTensor(mu, lmbda),
            "bc": pt.BoundaryConditionVectorial(g, bf, cond),
            "scalar_vector_mappings": dict(svm),
        },
    )
    pt.Biot("mechanics").discretize(g, d)
    md = d[pt.DISCRETIZATION_MATRICES]["mechanics"]

    def compute(ref_pp):
        gr = ref_pp.CartGrid(list(nx))
        gr.compute_geometry()
        dr = ref_pp.initialize_data(
            {},
            "mechanics",
            {
                "fourth_order_tensor": ref_pp.FourthOrderTensor(mu, lmbda),
                "bc": ref_pp.BoundaryConditionVectorial(gr, bf, cond),
                "scalar_vector_mappings": dict(svm),
                "inverter": "python",
            },
        )
        ref_pp.Biot("mechanics").discretize(gr, dr)
        mdr = dr[ref_pp.DISCRETIZATION_MATRICES]["mechanics"]
        out = {k: mdr[k] for k in _BIOT_MECH_KEYS}
        out.update({k: mdr[k]["flow"] for k in _BIOT_COUPLING_KEYS})
        return out

    ref_mats = golden(compute)
    for key in _BIOT_MECH_KEYS:
        diff = abs(md[key] - ref_mats[key])
        mx = diff.max() if diff.nnz else 0.0
        assert mx / max(abs(ref_mats[key]).max(), 1e-300) < 1e-10, key
    for key in _BIOT_COUPLING_KEYS:
        diff = abs(md[key]["flow"] - ref_mats[key])
        mx = diff.max() if diff.nnz else 0.0
        assert mx / max(abs(ref_mats[key]).max(), 1e-300) < 1e-10, key


def _make(mod, base):
    class M(base):
        def bc_values_displacement(self, bg):
            vals = np.zeros((self.nd, bg.num_cells))
            north = self.domain_boundary_sides(bg).north
            vals[1, north] = -0.001
            return vals.ravel("F")

        def bc_values_pressure(self, bg):
            return np.zeros(bg.num_cells)

        def initialize_data_saving(self):
            pass

        def save_data_time_step(self):
            pass

    params = {
        "grid_type": "cartesian",
        "meshing_arguments": {"cell_size": 0.25},
        "material_constants": {
            "solid": mod.SolidConstants(
                shear_modulus=1.0,
                lame_lambda=1.0,
                permeability=1e-2,
                porosity=0.1,
                biot_coefficient=0.8,
                specific_storage=0.1,
            ),
            "fluid": mod.FluidComponent(
                viscosity=1.0, density=1.0, compressibility=1e-2
            ),
        },
        "time_manager": mod.TimeManager([0, 0.5], 0.25, constant_dt=True),
    }
    return M(params), params


def test_poromechanics_parity(golden):
    m, p1 = _make(pt, pt.Poromechanics)
    pt.run_time_dependent_model(m, p1)

    def compute(ref_pp):
        r, p2 = _make(ref_pp, ref_pp.Poromechanics)
        ref_pp.run_time_dependent_model(r, p2)
        return {
            var: r.equation_system.get_variable_values(
                [var], time_step_index=0
            )
            for var in ("pressure", "u")
        }

    ref_vals = golden(compute)
    for var in ("pressure", "u"):
        vo = m.equation_system.get_variable_values([var], time_step_index=0)
        assert np.abs(vo - np.asarray(ref_vals[var])).max() < 1e-12, var


def _make_fractured(mod, base, frac_wrap, shear, normal):
    class M(base):
        def set_fractures(self):
            self._fractures = [frac_wrap(np.array([[0.25, 0.75], [0.5, 0.5]]))]

        def bc_values_displacement(self, bg):
            vals = np.zeros((self.nd, bg.num_cells))
            north = self.domain_boundary_sides(bg).north
            vals[0, north] = shear
            vals[1, north] = normal
            return vals.ravel("F")

        def bc_values_pressure(self, bg):
            return 1e-3 * (1.0 - bg.cell_centers[1])

        def initialize_data_saving(self):
            pass

        def save_data_time_step(self):
            pass

    params = {
        "grid_type": "cartesian",
        "meshing_arguments": {"cell_size": 0.25},
        "material_constants": {
            "solid": mod.SolidConstants(
                residual_aperture=0.01,
                normal_permeability=1.0,
                permeability=1.0,
                porosity=0.1,
            ),
            "fluid": mod.FluidComponent(
                compressibility=1e-3, viscosity=1.0, density=1.0
            ),
        },
        "time_manager": mod.TimeManager([0, 1.0], 1.0, constant_dt=True),
    }
    return M(params), params


_FRAC_PORO_VARS = (
    "pressure",
    "u",
    "contact_traction",
    "u_interface",
    "interface_darcy_flux",
)


@pytest.mark.parametrize(
    "bc", [(0.01, -0.005), (0.0, 0.004)], ids=["contact", "opening"]
)
def test_fractured_poromechanics_parity(golden, bc):
    """Coupled flow + mechanics + frictional contact on a fractured domain:
    all fields (including the jump-dependent aperture rediscretization in
    the opening case) must match the reference."""
    m, p1 = _make_fractured(pt, pt.Poromechanics, lambda a: a, *bc)
    pt.run_time_dependent_model(m, p1)

    def compute(ref_pp):
        r, p2 = _make_fractured(
            ref_pp, ref_pp.Poromechanics, ref_pp.LineFracture, *bc
        )
        ref_pp.run_time_dependent_model(r, p2)
        out = {
            var: r.equation_system.get_variable_values([var], iterate_index=0)
            for var in _FRAC_PORO_VARS
        }
        out["aperture"] = np.asarray(
            r.equation_system.evaluate(r.aperture(r.mdg.subdomains(dim=1)))
        )
        return out

    ref_vals = golden(compute)
    for var in _FRAC_PORO_VARS:
        vo = m.equation_system.get_variable_values([var], iterate_index=0)
        vr = np.asarray(ref_vals[var])
        assert np.abs(vo - vr).max() < 1e-12, (var, np.abs(vo - vr).max())

    # The jump-based aperture must agree with the reference too.
    ap_o = m.equation_system.evaluate(m.aperture(m.mdg.subdomains(dim=1)))
    assert np.abs(np.asarray(ap_o) - np.asarray(ref_vals["aperture"])).max() < 1e-12


def test_poromechanics_compression_builds_pressure():
    """Rapid compression of a low-permeability medium raises pore pressure
    (undrained response) — the Biot coupling signature."""
    m, params = _make(pt, pt.Poromechanics)
    params["material_constants"]["solid"] = pt.SolidConstants(
        shear_modulus=1.0,
        lame_lambda=1.0,
        permeability=1e-8,
        porosity=0.1,
        biot_coefficient=0.8,
        specific_storage=0.1,
    )
    m = type(m)(params)
    pt.run_time_dependent_model(m, params)
    p = m.equation_system.get_variable_values(["pressure"], time_step_index=0)
    # Compression (negative volumetric strain) with near-zero drainage:
    # pressure must drop/rise consistently with div(u) sign, here negative
    # displacement divergence -> negative pressure change has magnitude > 0.
    assert np.abs(p).max() > 1e-6
