"""Restart round-trip: exported vtu/pvd state restores a model mid-run and
continues identically to an uninterrupted run (reference
``solution_strategy.py:333-364``, ``viz/data_saving_model_mixin.py:236-280``).
"""

import glob
import os

import numpy as np
import pytest

import porepy_tpu as pt


def _model_cls():
    class M(pt.SinglePhaseFlow):
        def set_fractures(self):
            self._fractures = [
                pt.LineFracture(np.array([[0.25, 0.75], [0.5, 0.5]]))
            ]

        def bc_values_pressure(self, bg):
            return 1.0 - bg.cell_centers[1]

    return M


def _params(folder, extra=None):
    params = {
        "grid_type": "cartesian",
        "meshing_arguments": {"cell_size": 0.25},
        "folder_name": folder,
        "file_name": "state",
        "material_constants": {
            "solid": pt.SolidConstants(
                permeability=1.0,
                porosity=0.1,
                residual_aperture=0.01,
                normal_permeability=1.0,
            ),
            "fluid": pt.FluidComponent(
                compressibility=1e-4, viscosity=1.0, density=1.0
            ),
        },
    }
    if extra:
        params.update(extra)
    return params


def test_restart_roundtrip(tmp_path):
    M = _model_cls()

    # Straight-through run: 3 steps.
    p_full = _params(
        str(tmp_path / "full"),
        {"time_manager": pt.TimeManager([0, 3.0], 1.0, constant_dt=True)},
    )
    m_full = M(p_full)
    pt.run_time_dependent_model(m_full, p_full)
    x_full = m_full.equation_system.get_variable_values(time_step_index=0)

    # First leg: 2 steps, exporting states.
    p_first = _params(
        str(tmp_path / "first"),
        {"time_manager": pt.TimeManager([0, 2.0], 1.0, constant_dt=True)},
    )
    m_first = M(p_first)
    pt.run_time_dependent_model(m_first, p_first)

    # The exporter wrote one pvd per step; restart from the final one.
    pvds = sorted(glob.glob(str(tmp_path / "first" / "state_*.pvd")))
    assert pvds, "exporter produced no step pvd files"
    restart_pvd = pvds[-1]

    # Second leg: restart at t=2, run to t=3.
    p_second = _params(
        str(tmp_path / "second"),
        {
            "time_manager": pt.TimeManager([2.0, 3.0], 1.0, constant_dt=True),
            "restart_options": {
                "restart": True,
                "pvd_file": restart_pvd,
                "time": 2.0,
                "time_index": 2,
            },
        },
    )
    m_second = M(p_second)
    m_second.prepare_simulation()
    m_second._prepared = True
    # The restarted state must match the first leg's final state exactly.
    x_first = m_first.equation_system.get_variable_values(time_step_index=0)
    x_restarted = m_second.equation_system.get_variable_values(
        time_step_index=0
    )
    assert np.allclose(x_restarted, x_first, atol=1e-14)

    pt.run_time_dependent_model(m_second, p_second)
    x_second = m_second.equation_system.get_variable_values(time_step_index=0)

    assert np.allclose(x_second, x_full, rtol=1e-10, atol=1e-12)


def test_restart_requires_files(tmp_path):
    M = _model_cls()
    params = _params(
        str(tmp_path / "x"),
        {"restart_options": {"restart": True, "vtu_files": []}},
    )
    m = M(params)
    with pytest.raises(Exception):
        pt.run_time_dependent_model(m, params)
