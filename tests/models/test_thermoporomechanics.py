"""Thermoporomechanics (THM): field parity with the reference on fractured
domains with contact, thermal stress, thermo-poromechanical porosity and
jump-dependent aperture."""

import numpy as np

import porepy_tpu as pt


THM_FIELDS = [
    "u",
    "pressure",
    "temperature",
    "contact_traction",
    "u_interface",
    "interface_darcy_flux",
    "interface_fourier_flux",
    "interface_enthalpy_flux",
]


def _make(mod, base, frac_wrap):
    class M(base):
        def set_fractures(self):
            self._fractures = [frac_wrap(np.array([[0.25, 0.75], [0.5, 0.5]]))]

        def bc_values_displacement(self, bg):
            vals = np.zeros((self.nd, bg.num_cells))
            north = self.domain_boundary_sides(bg).north
            vals[0, north] = 0.01
            vals[1, north] = -0.005
            return vals.ravel("F")

        def bc_values_pressure(self, bg):
            return 1e-3 * (1.0 - bg.cell_centers[1])

        def bc_values_temperature(self, bg):
            return 1.0 + 0.1 * bg.cell_centers[0]

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
                thermal_expansion=1e-4,
                thermal_conductivity=1.0,
                specific_heat_capacity=1.0,
                biot_coefficient=0.8,
            ),
            "fluid": mod.FluidComponent(
                compressibility=1e-3,
                viscosity=1.0,
                density=1.0,
                thermal_conductivity=0.5,
                specific_heat_capacity=1.0,
                thermal_expansion=2e-4,
            ),
        },
        "time_manager": mod.TimeManager([0, 1.0], 1.0, constant_dt=True),
    }
    return M(params), params


def test_fractured_thermoporomechanics_parity(golden):
    m, p1 = _make(pt, pt.Thermoporomechanics, lambda a: a)
    pt.run_time_dependent_model(m, p1)

    def compute(ref_pp):
        r, p2 = _make(ref_pp, ref_pp.Thermoporomechanics, ref_pp.LineFracture)
        ref_pp.run_time_dependent_model(r, p2)
        return {
            var: r.equation_system.get_variable_values([var], iterate_index=0)
            for var in THM_FIELDS
        }

    ref_vals = golden(compute)
    for var in THM_FIELDS:
        vo = m.equation_system.get_variable_values([var], iterate_index=0)
        vr = np.asarray(ref_vals[var])
        assert vo.size == vr.size, var
        assert np.abs(vo - vr).max() < 1e-12, (var, np.abs(vo - vr).max())


def test_thermal_stress_drives_deformation():
    """Heating with fixed boundaries must induce compressive stress and
    nonzero displacement via the thermal expansion coupling."""
    m, params = _make(pt, pt.Thermoporomechanics, lambda a: a)

    class Unfractured(type(m)):
        def set_fractures(self):
            self._fractures = []

        def bc_values_displacement(self, bg):
            return np.zeros((self.nd, bg.num_cells)).ravel("F")

        def bc_values_temperature(self, bg):
            return 10.0 * np.ones(bg.num_cells)

    m = Unfractured(params)
    pt.run_time_dependent_model(m, params)
    u = m.equation_system.get_variable_values(["u"], iterate_index=0)
    assert np.linalg.norm(u) > 1e-8
