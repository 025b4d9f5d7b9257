"""Coupled mass-and-energy balance: field parity with the reference on a
fractured Cartesian domain (pressure, temperature, all interface fluxes)."""

import numpy as np

import porepy_tpu as pt



def _make(mod, base, frac_wrap, force_tpfa=False):
    class M(base):
        def set_fractures(self):
            self._fractures = [frac_wrap(np.array([[0.25, 0.75], [0.5, 0.5]]))]

        def bc_values_pressure(self, bg):
            return 1.0 - bg.cell_centers[1]

        def bc_values_temperature(self, bg):
            return 1.0 + bg.cell_centers[0]

        def initialize_data_saving(self):
            pass

        def save_data_time_step(self):
            pass

        if force_tpfa:

            def darcy_flux_discretization(self, subdomains):
                return mod.ad.TpfaAd(self.darcy_keyword, subdomains)

            def fourier_flux_discretization(self, subdomains):
                return mod.ad.TpfaAd(self.fourier_keyword, subdomains)

    params = {
        "grid_type": "cartesian",
        "meshing_arguments": {"cell_size": 0.25},
        "material_constants": {
            "solid": mod.SolidConstants(
                permeability=1.0,
                porosity=0.1,
                residual_aperture=0.01,
                normal_permeability=1.0,
                thermal_conductivity=2.0,
                specific_heat_capacity=1.0,
                density=2.0,
            ),
            "fluid": mod.FluidComponent(
                compressibility=1e-3,
                viscosity=1.0,
                density=1.0,
                thermal_conductivity=0.5,
                normal_thermal_conductivity=0.5,
                specific_heat_capacity=1.0,
                thermal_expansion=1e-3,
            ),
        },
        "reference_variable_values": mod.ReferenceVariableValues(
            pressure=0.0, temperature=0.0
        ),
        "time_manager": mod.TimeManager([0, 2.0], 1.0, constant_dt=True),
    }
    return M(params), params


_ME_VARS = (
    "pressure",
    "temperature",
    "interface_darcy_flux",
    "interface_fourier_flux",
    "interface_enthalpy_flux",
)


def test_mass_and_energy_parity(golden):
    m, p1 = _make(pt, pt.MassAndEnergyBalance, lambda a: a)
    pt.run_time_dependent_model(m, p1)

    def compute(ref_pp):
        r, p2 = _make(
            ref_pp,
            ref_pp.MassAndEnergyBalance,
            ref_pp.LineFracture,
            force_tpfa=True,
        )
        ref_pp.run_time_dependent_model(r, p2)
        return {
            var: r.equation_system.get_variable_values(
                [var], time_step_index=0
            )
            for var in _ME_VARS
        }

    ref_vals = golden(compute)
    for var in _ME_VARS:
        vo = m.equation_system.get_variable_values([var], time_step_index=0)
        vr = np.asarray(ref_vals[var])
        assert vo.size == vr.size
        assert np.abs(vo - vr).max() < 1e-10, (var, np.abs(vo - vr).max())


def test_mass_and_energy_monodim_conduction():
    """Pure conduction on an unfractured grid: T relaxes toward the linear
    boundary profile."""

    class M(pt.MassAndEnergyBalance):
        def bc_values_temperature(self, bg):
            return 1.0 + bg.cell_centers[0]

    params = {
        "meshing_arguments": {"cell_size": 0.25},
        "time_manager": pt.TimeManager([0, 50.0], 10.0, constant_dt=True),
        "material_constants": {
            "solid": pt.SolidConstants(
                permeability=1.0, porosity=0.1, thermal_conductivity=1.0,
                specific_heat_capacity=1.0, density=1.0,
            ),
            "fluid": pt.FluidComponent(
                viscosity=1.0, density=1.0, thermal_conductivity=1.0,
                specific_heat_capacity=1.0,
            ),
        },
    }
    m = M(params)
    pt.run_time_dependent_model(m, params)
    sd = m.mdg.subdomains()[0]
    T = m.equation_system.get_variable_values(["temperature"], time_step_index=0)
    T_ex = 1.0 + sd.cell_centers[0]
    assert np.abs(T - T_ex).max() < 1e-6
