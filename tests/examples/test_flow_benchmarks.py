"""Runnable-example smoke+behavior tests: Flemisch et al. (2018) 2d flow
benchmark cases and the tracer-flow model (reference
``tests/functional/test_benchmark*``, ``examples/tracer_flow.py``)."""

import numpy as np
import pytest

import porepy_tpu as pt
from porepy_tpu.examples import (
    FlowBenchmark2dCase1Model,
    FlowBenchmark2dCase3aModel,
    FlowBenchmark2dCase4Model,
    TracerFlowModel,
    solid_constants_conductive_fractures,
)
from porepy_tpu.examples.flow_benchmark_2d_case_4 import (
    benchmark_2d_case_4_fractures,
    solid_constants,
)


def test_case1_conductive_runs_and_fracture_conducts():
    params = {
        "grid_type": "cartesian",
        "meshing_arguments": {"cell_size": 1 / 16},
        "material_constants": {"solid": solid_constants_conductive_fractures},
        "suppress_export": True,
        "flux_discretization": "tpfa",
    }
    m = FlowBenchmark2dCase1Model(params)
    pt.run_time_dependent_model(m, params)
    p = m.equation_system.get_variable_values(["pressure"], time_step_index=0)
    assert np.all(np.isfinite(p))
    # Flow from west (inflow) to east (p=1): pressure decreases eastward.
    sd = m.mdg.subdomains(dim=2)[0]
    p_mat = p[: sd.num_cells]
    x = sd.cell_centers[0]
    assert p_mat[x < 0.25].mean() > p_mat[x > 0.75].mean() > 0.99


def test_case3a_runs_with_blocking_fractures():
    params = {
        "grid_type": "simplex",
        "meshing_arguments": {"cell_size": 0.15},
        # Benchmark scale: unit matrix permeability, fracture
        # permeabilities O(1e4)/O(1e-4) (reference
        # ``examples/flow_benchmark_2d_case_3.py:27``).
        "material_constants": {
            "solid": pt.SolidConstants(residual_aperture=1e-4)
        },
        "suppress_export": True,
    }
    m = FlowBenchmark2dCase3aModel(params)
    pt.run_time_dependent_model(m, params)
    p = m.equation_system.get_variable_values(["pressure"], time_step_index=0)
    # Dirichlet range is [1, 4] Pa.
    assert p.min() > 1.0 - 1e-6 and p.max() < 4.0 + 1e-6
    # North-to-south gradient in the matrix.
    sd = m.mdg.subdomains(dim=2)[0]
    p_mat = p[: sd.num_cells]
    y = sd.cell_centers[1]
    assert p_mat[y > 0.75].mean() > p_mat[y < 0.25].mean()


def test_case4_geometry_loads():
    fracs = benchmark_2d_case_4_fractures()
    assert len(fracs) == 63
    pts = np.hstack([f.pts for f in fracs])
    assert pts[0].max() <= 700.0 and pts[1].max() <= 600.0
    assert solid_constants.fracture_permeability == 1e-8


def test_tracer_flow_advances_tracer():
    # Only the vertical (flow-parallel) fracture 0 (x = 1/2): the
    # reference example's default two-fracture setup includes the
    # horizontal blocking fracture 1 (y = 1/2, normal permeability 1e-19)
    # that seals the north-south flow path entirely.
    # Pore velocity is ~500 m/s at these parameters; resolve the front
    # with sub-millisecond steps so it sits mid-domain at the end time.
    time_manager = pt.TimeManager(
        schedule=[0, 5e-4], dt_init=2.5e-4, constant_dt=True
    )
    params = {
        "material_constants": {
            "solid": pt.SolidConstants(
                porosity=0.1, permeability=1e-7, normal_permeability=1e-19
            ),
        },
        "fracture_indices": [0],
        "time_manager": time_manager,
        "max_iterations": 80,
        "nl_convergence_tol": 1e-6,
        "nl_convergence_tol_res": 1e-6,
        "meshing_arguments": {"cell_size": 0.25},
        "grid_type": "cartesian",
        "suppress_export": True,
    }
    m = TracerFlowModel(params)
    pt.run_time_dependent_model(m, params)
    z = m.equation_system.get_variable_values(["z_tracer"], time_step_index=0)
    assert np.all(np.isfinite(z))
    assert z.max() > 1e-3  # tracer entered through the north boundary
    sd = m.mdg.subdomains(dim=2)[0]
    z_mat = z[: sd.num_cells]
    y = sd.cell_centers[1]
    assert z_mat[y > 0.75].mean() > z_mat[y < 0.25].mean() + 1e-3
