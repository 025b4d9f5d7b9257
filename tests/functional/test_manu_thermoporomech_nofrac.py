"""Functional verification of non-fractured thermoporomechanics against a
manufactured solution (pressure/displacement of Nordbotten 2016, temperature
mirroring the pressure), in 2d and 3d.

Counterpart of the reference's ``test_manu_thermoporomech_nofrac.py``
(there with heterogeneous tensorial coefficients; here the homogeneous
isotropic core). Asserts the observed spatio-temporal convergence order:
~2 for the cell-centered fields (pressure, temperature, displacement) and
>1 for the face fluxes/forces, matching the reference's observed bands
(reference ``test_manu_thermoporomech_nofrac.py:291-318``).
"""

from __future__ import annotations

from copy import deepcopy

import pytest

import porepy_tpu as pt
from porepy_tpu.applications.convergence_analysis import ConvergenceAnalysis
from tests.functional.setups.manu_thermoporomech_nofrac import (
    MANU_THM_FLUID,
    MANU_THM_SOLID,
    ManuThermoPoroMechModel,
)


def _params(dim: int) -> dict:
    return {
        "dim": dim,
        "grid_type": "cartesian",
        "material_constants": {
            "solid": pt.SolidConstants(**MANU_THM_SOLID),
            "fluid": pt.FluidComponent(**MANU_THM_FLUID),
        },
        "meshing_arguments": {"cell_size": 0.25},
        "time_manager": pt.TimeManager([0.0, 0.5, 1.0], 0.5, constant_dt=True),
    }


@pytest.mark.parametrize("dim,levels", [(2, 3), (3, 2)])
def test_order_of_convergence(dim: int, levels: int):
    analysis = ConvergenceAnalysis(
        model_class=ManuThermoPoroMechModel,
        model_params=deepcopy(_params(dim)),
        levels=levels,
        spatial_refinement_rate=2,
        temporal_refinement_rate=4,
    )
    ooc = analysis.order_of_convergence(analysis.run_analysis())
    assert ooc["ooc_pressure"] > 1.8
    assert ooc["ooc_temperature"] > 1.8
    assert ooc["ooc_displacement"] > 1.8
    assert ooc["ooc_darcy_flux"] > 1.0
    assert ooc["ooc_energy_flux"] > 1.0
    assert ooc["ooc_force"] > 1.0
