"""Unit-system scaling invariance (reference ``models/units.py:22`` +
``test_utils/models.py:352`` ``compare_scaled_primary_variables``): solving
the same physical problem in SI and in a scaled unit system (including
NON-UNITARY TIME) must give identical primary variables after conversion."""

import numpy as np
import pytest

import porepy_tpu as pt
from porepy_tpu.models.units import Units


def test_unit_conversions_roundtrip():
    u = Units(m=2.0, kg=3.0, s=60.0, K=10.0)
    rng = np.random.default_rng(3)
    v = rng.normal(size=7)
    for unit in ("Pa", "m^2", "Pa*s", "J*kg^-1*K^-1", "W*m^-1*K^-1", "m*s^-2"):
        w = u.convert_units(v, unit)
        assert np.allclose(u.convert_units(w, unit, to_si=True), v), unit


def _run_flow(units: Units):
    s = units.s

    class Model(pt.SinglePhaseFlow):
        def set_fractures(self):
            self._fractures = []

        def bc_values_pressure(self, bg):
            return units.convert_units(
                1e5 * (1.0 - bg.cell_centers[1] * units.m), "Pa"
            )

        def ic_values_pressure(self, sd):
            return units.convert_units(np.full(sd.num_cells, 2e5), "Pa")

        def initial_condition(self):
            super().initial_condition()
            for sd in self.mdg.subdomains():
                self.equation_system.set_variable_values(
                    self.ic_values_pressure(sd), ["pressure"],
                    time_step_index=0, iterate_index=0,
                )

    params = {
        "grid_type": "cartesian",
        "meshing_arguments": {"cell_size": units.convert_units(0.25, "m")},
        "material_constants": {
            "solid": pt.SolidConstants(permeability=1e-10, porosity=0.1),
            "fluid": pt.FluidComponent(
                compressibility=1e-8, viscosity=1e-3, density=1000.0
            ),
        },
        # Schedule in scaled time: 2 steps of 100 s.
        "time_manager": pt.TimeManager(
            [0, 200.0 / s], 100.0 / s, constant_dt=True
        ),
        "units": units,
        "linear_solver": "scipy_sparse",
        # The increment tolerance lives in SCALED pressure units: scale it
        # accordingly or the absolute default is below f64 resolution for
        # unit systems that blow the pressure magnitude up.
        "nl_convergence_tol": 1e-10 * max(1.0, units.convert_units(1.0, "Pa")),
    }
    m = Model(params)
    pt.run_time_dependent_model(m, params)
    p = m.equation_system.get_variable_values(["pressure"], time_step_index=0)
    return units.convert_units(p, "Pa", to_si=True)


@pytest.mark.parametrize(
    "units",
    [Units(s=60.0), Units(m=2.0, kg=1e6, s=3600.0, K=5.0)],
    ids=["minutes", "mixed"],
)
def test_scaled_time_flow_invariance(units):
    p_si = _run_flow(Units())
    p_scaled = _run_flow(units)
    assert np.allclose(p_si, p_scaled, rtol=1e-9)
