"""Flow benchmark 2d case 3 (Flemisch et al. 2018): effective
permeabilities and boundary conditions after full solves of variants 3a
(top-to-bottom) and 3b (left-to-right) on a native simplex mesh
(reference ``tests/functional/test_benchmark_2d_case_3.py`` — same
checks)."""

import numpy as np
import pytest

import porepy_tpu as pt
from porepy_tpu.applications.test_utils.benchmarks import EffectivePermeability
from porepy_tpu.examples.flow_benchmark_2d_case_3 import (
    FlowBenchmark2dCase3aModel,
    FlowBenchmark2dCase3bModel,
    solid_constants,
)

BLOCKING = [3, 4]  # frac_num of the blocking fractures


class Model3a(EffectivePermeability, FlowBenchmark2dCase3aModel):
    pass


class Model3b(EffectivePermeability, FlowBenchmark2dCase3bModel):
    pass


@pytest.fixture(scope="module", params=["tpfa", "mpfa"])
def flux_discretization(request):
    return request.param


@pytest.fixture(scope="module", params=["a", "b"])
def case(request):
    return request.param


@pytest.fixture(scope="module")
def model(flux_discretization, case):
    params = {
        "material_constants": {"solid": solid_constants},
        "grid_type": "simplex",
        "meshing_arguments": {"cell_size": 0.1},
        "flux_discretization": flux_discretization,
        "times_to_export": [],
    }
    cls = Model3a if case == "a" else Model3b
    m = cls(params)
    pt.run_time_dependent_model(m, params)
    return m


def test_effective_tangential_permeability(model):
    """2d: 1.0; conductive 1d fractures: 1.0; blocking (frac 3, 4): 1e-8."""
    for sd in model.mdg.subdomains():
        val = model.equation_system.evaluate(
            model.effective_tangential_permeability([sd])
        )
        if sd.dim == 2:
            np.testing.assert_array_almost_equal(val, 1.0)
        elif sd.dim == 1:
            if sd.frac_num in BLOCKING:
                np.testing.assert_array_almost_equal(val, 1e-8)
            else:
                np.testing.assert_array_almost_equal(val, 1.0)


def test_effective_normal_permeability(model):
    """Conductive 1d: 2e8; blocking 1d: 2; conductive 0d: 2e4; 0d touching
    a blocking fracture: 4e-4."""
    for intf in model.mdg.interfaces():
        val = model.equation_system.evaluate(
            model.effective_normal_permeability([intf])
        )
        _sd_high, sd_low = model.mdg.interface_to_subdomain_pair(intf)
        if intf.dim == 1:
            if sd_low.frac_num in BLOCKING:
                np.testing.assert_array_almost_equal(val, 2)
            else:
                np.testing.assert_array_almost_equal(val, 2e8)
        else:
            interfaces_lower = model.subdomains_to_interfaces([sd_low], [1])
            neighbors = model.interfaces_to_subdomains(interfaces_lower)
            blocking_neighbors = [
                sd
                for sd in neighbors
                if sd.dim == 1 and sd.frac_num in BLOCKING
            ]
            if blocking_neighbors:
                np.testing.assert_array_almost_equal(val, 4e-4)
            else:
                np.testing.assert_array_almost_equal(val, 2e4)


def test_boundary_specification(model):
    """3a drives p=4 north / p=1 south; 3b p=4 west / p=1 east."""
    bg, data_bg = model.mdg.boundaries(return_data=True, dim=1)[0]
    sides = model.domain_boundary_sides(bg)
    p_bg = data_bg[pt.ITERATE_SOLUTIONS]["pressure"][0]
    if isinstance(model, Model3a):
        np.testing.assert_array_almost_equal(p_bg[sides.north], 4)
        np.testing.assert_array_almost_equal(p_bg[sides.south], 1)
    else:
        np.testing.assert_array_almost_equal(p_bg[sides.west], 4)
        np.testing.assert_array_almost_equal(p_bg[sides.east], 1)


def test_pressure_between_boundary_values(model):
    """The solved matrix pressure lies in the driven range [1, 4]."""
    p = model.equation_system.get_variable_values(
        [model.pressure_variable], iterate_index=0
    )
    assert np.all(np.isfinite(p))
    assert p.min() > 1.0 - 1e-6 and p.max() < 4.0 + 1e-6
