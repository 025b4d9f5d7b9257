"""SinglePhaseFlow model tests: analytic exactness and field parity against
the reference framework's SinglePhaseFlow on identical Cartesian grids."""

import numpy as np
import pytest

import porepy_tpu as pt



class _LinearPressure(pt.SinglePhaseFlow):
    def bc_values_pressure(self, bg):
        return 1.0 - bg.cell_centers[0]


def test_incompressible_linear_pressure_exact():
    params = {"meshing_arguments": {"cell_size": 1.0 / 5}}
    m = _LinearPressure(params)
    pt.run_time_dependent_model(m, params)
    sd = m.mdg.subdomains()[0]
    p = m.equation_system.get_variable_values(time_step_index=0)
    p_ex = 1.0 - sd.cell_centers[0]
    assert np.linalg.norm(p - p_ex) / np.linalg.norm(p_ex) < 1e-12


@pytest.mark.parametrize("compressibility", [0.0, 4e-6])
def test_parity_with_reference(golden, compressibility):
    """Pressure field parity with the reference SinglePhaseFlow: same grid,
    same BCs (p=east-west drop), same fluid; transient compressible and
    stationary incompressible."""

    cell_size = 1.0 / 4

    def make_params(mod):
        return {
            "grid_type": "cartesian",
            "meshing_arguments": {"cell_size": cell_size},
            "material_constants": {
                "fluid": mod.FluidComponent(
                    compressibility=compressibility,
                    viscosity=2.0,
                    density=800.0,
                ),
                "solid": mod.SolidConstants(permeability=0.5, porosity=0.25),
            },
            "time_manager": mod.TimeManager([0, 0.5], 0.25, constant_dt=True),
        }

    class Ours(pt.SinglePhaseFlow):
        def bc_values_pressure(self, bg):
            return 3.0 * (1.0 - bg.cell_centers[0])

    params = make_params(pt)
    m = Ours(params)
    pt.run_time_dependent_model(m, params)
    p_ours = m.equation_system.get_variable_values(time_step_index=0)

    def compute(ref_pp):
        class Ref(ref_pp.SinglePhaseFlow):
            def bc_values_pressure(self, bg):
                return 3.0 * (1.0 - bg.cell_centers[0])

            def initialize_data_saving(self):
                # Skip the exporter (meshio is faked in this environment).
                pass

            def save_data_time_step(self):
                pass

        params_ref = make_params(ref_pp)
        ref_m = Ref(params_ref)
        ref_pp.run_time_dependent_model(ref_m, params_ref)
        return {
            "pressure": ref_m.equation_system.get_variable_values(
                [ref_m.pressure_variable], time_step_index=0
            )
        }

    p_ref = np.asarray(golden(compute)["pressure"])
    assert p_ours.size == p_ref.size
    scale = max(np.abs(p_ref).max(), 1.0)
    assert np.max(np.abs(p_ours - p_ref)) / scale < 1e-8


def test_compressible_relaxation_monotone():
    """Pressure initialized above boundary value relaxes monotonically."""

    class Relax(pt.SinglePhaseFlow):
        def bc_values_pressure(self, bg):
            return 1e5 * np.ones(bg.num_cells)

        def ic_values_pressure(self, sd):
            return 2e5 * np.ones(sd.num_cells)

    params = {
        "meshing_arguments": {"cell_size": 0.25},
        "material_constants": {
            "fluid": pt.FluidComponent(
                compressibility=1e-8, viscosity=1e-3, density=1000.0
            )
        },
        "time_manager": pt.TimeManager([0, 3.0], 1.0, constant_dt=True),
    }
    m = Relax(params)
    pt.run_time_dependent_model(m, params)
    p = m.equation_system.get_variable_values(time_step_index=0)
    assert p.max() <= 2e5 + 1e-6
    assert p.min() >= 1e5 - 1e-6
