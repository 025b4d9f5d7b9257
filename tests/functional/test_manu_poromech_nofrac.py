"""Functional verification of non-fractured poromechanics (Biot) against
the Nordbotten-2016 manufactured solution, in 2d and 3d.

Two tiers, mirroring the reference's
``tests/functional/test_manu_poromech_nofrac.py``:

- [TEST_1] the relative L2 errors of pressure, flux, displacement and
  poroelastic force on the coarse Cartesian grid (cell size 0.25) at
  t = 0.5 and t = 1.0 must match the reference's published values
  (reference ``test_manu_poromech_nofrac.py:133-163``) to rtol 1e-5 —
  a full-stack parity assertion through MPFA + MPSA/Biot + the
  compressibility nonlinearity + Newton + time stepping.
- [TEST_2] the observed order of convergence over refined levels must be
  ~2 for pressure and displacement (spatial rate 2, temporal rate 4 so
  backward Euler's O(dt) error stays subdominant).
"""

from __future__ import annotations

from copy import deepcopy

import numpy as np
import pytest

import porepy_tpu as pt
from porepy_tpu.applications.convergence_analysis import ConvergenceAnalysis
from tests.functional.setups.manu_poromech_nofrac import ManuPoroMechModel

MATERIALS = {
    "solid": pt.SolidConstants(biot_coefficient=0.5),
    "fluid": pt.FluidComponent(compressibility=0.02),
}

# Reference desired errors (reference test_manu_poromech_nofrac.py:133-163),
# cartesian cell_size 0.25, times 0.5 / 1.0.
DESIRED = {
    2: [
        {
            "error_pressure": 0.20711096997503695,
            "error_flux": 0.11345122446471026,
            "error_displacement": 0.3953172876400884,
            "error_force": 0.17104363665680572,
        },
        {
            "error_pressure": 0.1987998797257252,
            "error_flux": 0.09295559743883297,
            "error_displacement": 0.3952120364196121,
            "error_force": 0.17107465087060394,
        },
    ],
    3: [
        {
            "error_pressure": 0.2164612681791387,
            "error_flux": 0.107242413579278,
            "error_displacement": 0.44379951512274146,
            "error_force": 0.23004990504030878,
        },
        {
            "error_pressure": 0.2128131032248365,
            "error_flux": 0.09872012243139877,
            "error_displacement": 0.4437474284152431,
            "error_force": 0.230068537690508,
        },
    ],
}


def _params(dim: int) -> dict:
    return {
        "dim": dim,
        "grid_type": "cartesian",
        "material_constants": deepcopy(MATERIALS),
        "meshing_arguments": {"cell_size": 0.25},
        "time_manager": pt.TimeManager([0.0, 0.5, 1.0], 0.5, constant_dt=True),
    }


@pytest.fixture(scope="module")
def actual_errors() -> dict:
    out = {}
    for dim in (2, 3):
        model = ManuPoroMechModel(_params(dim))
        pt.run_time_dependent_model(model, model.params)
        out[dim] = model.results
    return out


@pytest.mark.parametrize("dim", [2, 3])
@pytest.mark.parametrize("time_idx", [0, 1])
@pytest.mark.parametrize(
    "var", ["pressure", "flux", "displacement", "force"]
)
def test_relative_l2_errors_vs_reference(actual_errors, dim, time_idx, var):
    np.testing.assert_allclose(
        getattr(actual_errors[dim][time_idx], "error_" + var),
        DESIRED[dim][time_idx]["error_" + var],
        atol=1e-8,
        rtol=1e-5,
    )


def test_order_of_convergence_2d():
    params = _params(2)
    analysis = ConvergenceAnalysis(
        model_class=ManuPoroMechModel,
        model_params=params,
        levels=3,
        spatial_refinement_rate=2,
        temporal_refinement_rate=4,
    )
    ooc = analysis.order_of_convergence(analysis.run_analysis())
    assert ooc["ooc_pressure"] > 1.85
    assert ooc["ooc_displacement"] > 1.85
    assert ooc["ooc_flux"] > 1.5
    assert ooc["ooc_force"] > 1.0
