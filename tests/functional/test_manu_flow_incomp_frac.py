"""Observed convergence order for 2d incompressible md flow with one
embedded fracture, against the Varela et al. (2022) manufactured solution
(counterpart of reference ``tests/functional/test_manu_flow_incomp_frac.py``).

Asserts (a) absolute error levels at a fixed grid and (b) observed order of
convergence ~ 2 for pressures (and ~ 1+ for fluxes) over Cartesian
refinements.
"""

import numpy as np
import pytest

import porepy_tpu as pt
from tests.functional.setups.manu_flow_incomp_frac_2d import (
    MANU_INCOMP_FLUID,
    MANU_INCOMP_SOLID,
    ManuIncompFlowModel2d,
)


def _params(cell_size: float) -> dict:
    return {
        "grid_type": "cartesian",
        "meshing_arguments": {"cell_size": cell_size},
        "material_constants": {
            "solid": pt.SolidConstants(**MANU_INCOMP_SOLID),
            "fluid": pt.FluidComponent(**MANU_INCOMP_FLUID),
        },
    }


@pytest.fixture(scope="module")
def errors() -> list:
    out = []
    for cell_size in (1 / 8, 1 / 16, 1 / 32, 1 / 64):
        params = _params(cell_size)
        model = ManuIncompFlowModel2d(params)
        pt.run_stationary_model(model, params)
        out.append(model.results[-1])
    return out


def observed_order(vals: list[float]) -> float:
    y = np.log2(np.asarray(vals))
    lev = np.arange(len(vals), dtype=float)
    # error ~ C h^p, h = h0 / 2^lev  =>  log2 e = log2 C + p*log2 h0 - p*lev
    slope = np.polyfit(lev, y, 1)[0]
    return float(-slope)


def test_error_levels_match_reference(errors):
    """Level-0 (8x8) errors must match the REFERENCE's own desired values
    (reference ``test_manu_flow_incomp_frac.py:120-127``) — same
    discretization, same manufactured solution, same numbers."""
    e = errors[0]
    assert np.isclose(
        e.error_matrix_pressure, 0.060732124330406576, rtol=1e-8
    ), e.error_matrix_pressure
    assert np.isclose(
        e.error_frac_pressure, 4.984308951373194, rtol=1e-8
    ), e.error_frac_pressure
    assert np.isclose(
        e.error_intf_flux, 3.1453166913070185, rtol=1e-6
    ), e.error_intf_flux


def test_observed_order_pressures(errors):
    omp = observed_order([e.error_matrix_pressure for e in errors])
    ofp = observed_order([e.error_frac_pressure for e in errors])
    assert 1.7 < omp < 2.5, omp
    assert 1.7 < ofp < 2.5, ofp


def test_observed_order_fluxes(errors):
    omf = observed_order([e.error_matrix_flux for e in errors])
    oif = observed_order([e.error_intf_flux for e in errors])
    assert omf > 0.9, omf
    assert oif > 1.5, oif


# -- 3d -----------------------------------------------------------------------

from tests.functional.setups.manu_flow_incomp_frac_3d import (  # noqa: E402
    ManuIncompFlowModel3d,
)


@pytest.fixture(scope="module")
def errors_3d() -> list:
    out = []
    for cell_size in (1 / 8, 1 / 16):
        params = {
            "grid_type": "cartesian",
            "meshing_arguments": {"cell_size": cell_size},
            "material_constants": {
                "solid": pt.SolidConstants(**MANU_INCOMP_SOLID),
                "fluid": pt.FluidComponent(**MANU_INCOMP_FLUID),
            },
        }
        model = ManuIncompFlowModel3d(params)
        pt.run_stationary_model(model, params)
        out.append(model.results[-1])
    return out


def test_3d_error_levels_match_reference(errors_3d):
    """Level-0 (8^3) errors must match the REFERENCE's own desired values
    (reference ``test_manu_flow_incomp_frac.py:129-136``)."""
    e = errors_3d[0]
    assert np.isclose(
        e.error_matrix_pressure, 1.3822466693314728, rtol=1e-6
    ), e.error_matrix_pressure
    assert np.isclose(
        e.error_frac_pressure, 6.272401337799361, rtol=1e-6
    ), e.error_frac_pressure
    assert np.isclose(
        e.error_intf_flux, 5.291360607983224, rtol=1e-5
    ), e.error_intf_flux


def test_3d_errors_decrease(errors_3d):
    assert errors_3d[1].error_matrix_pressure < errors_3d[0].error_matrix_pressure
    assert errors_3d[1].error_frac_pressure < errors_3d[0].error_frac_pressure
    assert errors_3d[1].error_intf_flux < errors_3d[0].error_intf_flux
