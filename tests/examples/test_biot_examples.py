"""Terzaghi and Mandel poroelastic verification examples."""

import numpy as np
import pytest

import porepy_tpu as pt
from porepy_tpu.examples.mandel_biot import MandelModel, mandel_solid_params
from porepy_tpu.examples.terzaghi_biot import (
    TerzaghiModel,
    terzaghi_solid_params,
)



def _terzaghi_params(mod):
    return {
        "material_constants": {
            "solid": mod.SolidConstants(**terzaghi_solid_params),
            "fluid": mod.FluidComponent(
                viscosity=1e-3, density=1e3, compressibility=0.0
            ),
        },
        "time_manager": mod.TimeManager([0, 0.05, 0.1, 0.3], 0.05, constant_dt=True),
        "num_cells": 20,
        "vertical_load": 6e8,
        "suppress_export": True,
    }


def test_terzaghi_matches_analytical():
    params = _terzaghi_params(pt)
    m = TerzaghiModel(params)
    pt.run_time_dependent_model(m, params)
    # Errors decrease in time and stay at the few-percent level on this
    # coarse column.
    # Skip the t=0 save (initial condition is exact by construction).
    errors_p = [r.error_pressure for r in m.results if r.time > 0]
    assert all(e < 0.07 for e in errors_p)
    assert errors_p[-1] < errors_p[0]
    assert all(
        r.error_consolidation_degree < 0.03 for r in m.results if r.time > 0
    )


def test_terzaghi_matches_reference(golden):
    """The collected verification errors equal the reference Terzaghi model's
    to solver precision."""
    params = _terzaghi_params(pt)
    m = TerzaghiModel(params)
    pt.run_time_dependent_model(m, params)

    def compute(ref_pp):
        import types

        from porepy.examples.terzaghi_biot import TerzaghiModel as RefTerzaghi

        params_r = _terzaghi_params(ref_pp)
        params_r.pop("suppress_export")
        r = RefTerzaghi(params_r)
        r.initialize_data_saving = lambda: None

        def no_save(self):
            self.results.append(self.collect_data())

        r.save_data_time_step = types.MethodType(no_save, r)
        r.results = []
        ref_pp.run_time_dependent_model(r, params_r)
        return {
            "error_pressure": np.array(
                [x.error_pressure for x in r.results]
            ),
            "error_consolidation_degree": np.array(
                [x.error_consolidation_degree for x in r.results]
            ),
        }

    ref_vals = golden(compute)
    e_p = np.asarray(ref_vals["error_pressure"])
    e_c = np.asarray(ref_vals["error_consolidation_degree"])
    assert len(m.results) == e_p.size
    for i, mine in enumerate(m.results):
        assert np.isclose(mine.error_pressure, e_p[i], atol=1e-10)
        assert np.isclose(mine.error_consolidation_degree, e_c[i], atol=1e-10)


def test_mandel_matches_analytical():
    params = {
        "material_constants": {
            "solid": pt.SolidConstants(**mandel_solid_params),
            "fluid": pt.FluidComponent(
                viscosity=1e-3, density=1e3, compressibility=0.0
            ),
        },
        "time_manager": pt.TimeManager([0, 10, 50], 10, constant_dt=True),
        "meshing_arguments": {"cell_size": 2.5},
        "suppress_export": True,
    }
    m = MandelModel(params)
    pt.run_time_dependent_model(m, params)
    errors_p = [r.error_pressure for r in m.results if r.time > 0]
    errors_u = [r.error_displacement for r in m.results if r.time > 0]
    assert all(e < 0.05 for e in errors_p)
    assert all(e < 2e-3 for e in errors_u)
    assert errors_p[-1] < errors_p[0]
