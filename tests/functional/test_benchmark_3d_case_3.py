"""Flow benchmark 3d case 3 (Berre et al. 2021): effective permeabilities
and boundary specification after a full solve on the coarsest native mesh
(reference ``tests/functional/test_benchmark_3d_case_3.py`` — same checks;
the reference meshes through gmsh, we mesh with the native cut-tet
mesher)."""

import numpy as np
import pytest

import porepy_tpu as pt
from porepy_tpu.applications.test_utils.benchmarks import EffectivePermeability
from porepy_tpu.examples.flow_benchmark_3d_case_3 import (
    FlowBenchmark3dCase3Model,
    solid_constants,
)


class ModelWithEffectivePermeability(
    EffectivePermeability, FlowBenchmark3dCase3Model
):
    pass


@pytest.fixture(scope="module", params=["tpfa"])
def model(request):
    params = {
        "material_constants": {"solid": solid_constants},
        "flux_discretization": request.param,
        "times_to_export": [],
        "linear_solver": "device_gmres",
    }
    m = ModelWithEffectivePermeability(params)
    pt.run_time_dependent_model(m, params)
    return m


def test_mesh_scale_matches_benchmark_level_0(model):
    """Refinement level 0 is specified as ~30k 3d cells; all 8 fractures
    and their intersections must be present."""
    sd3 = model.mdg.subdomains(dim=3)[0]
    assert 20_000 <= sd3.num_cells <= 45_000
    assert len(model.mdg.subdomains(dim=2)) == 8
    assert len(model.mdg.subdomains(dim=1)) >= 2


def test_effective_tangential_permeability_values(model):
    """Table 5 of the benchmark: matrix 1.0, fractures 1e2, intersections
    1.0 (effective = intrinsic x specific volume)."""
    for sd in model.mdg.subdomains():
        val = model.equation_system.evaluate(
            model.effective_tangential_permeability([sd])
        )
        if sd.dim == 3:
            np.testing.assert_array_almost_equal(val, 1.0)
        elif sd.dim == 2:
            np.testing.assert_array_almost_equal(val, 1e2)
        else:
            np.testing.assert_array_almost_equal(val, 1.0)


def test_effective_normal_permeability_values(model):
    """Table 5 of the benchmark: 2e6 on 2d interfaces, 2e4 on 1d."""
    for intf in model.mdg.interfaces():
        val = model.equation_system.evaluate(
            model.effective_normal_permeability([intf])
        )
        if intf.dim == 2:
            np.testing.assert_array_almost_equal(val, 2e6)
        else:
            np.testing.assert_array_almost_equal(val, 2e4)


def test_boundary_specification(model):
    """Inlet: total influx -1/3 (unit flux over the middle third of the
    south boundary); outlet: zero pressure on the Dirichlet north bands."""
    bg, data_bg = model.mdg.boundaries(return_data=True, dim=2)[0]

    south = model.domain_boundary_sides(bg).south
    inlet_flux = np.sum(
        data_bg[pt.ITERATE_SOLUTIONS]["darcy_flux"][0][south]
    )
    assert np.isclose(inlet_flux, -1 / 3, atol=1e-5)

    north = model.domain_boundary_sides(bg).north
    outlet_pressure = np.sum(
        data_bg[pt.ITERATE_SOLUTIONS]["pressure"][0][north]
    )
    assert np.isclose(outlet_pressure, 0, atol=1e-5)


def test_pressure_field_finite_and_driven(model):
    """The solved md pressure field is finite and the inflow drives a
    nontrivial gradient toward the outlet bands."""
    p = model.equation_system.get_variable_values(
        [model.pressure_variable], iterate_index=0
    )
    assert np.all(np.isfinite(p))
    assert p.max() - p.min() > 1e-3
