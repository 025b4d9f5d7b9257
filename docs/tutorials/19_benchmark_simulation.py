"""Tutorial 19: running a published benchmark case.

Counterpart of the reference's ``benchmark_simulation`` tutorial: the
``examples`` package ships ready models for the Flemisch et al. (2018) 2d
and Berre et al. (2021) 3d flow benchmarks; the md-grid library meshes
their geometries natively (no gmsh). Run with

    python docs/tutorials/19_benchmark_simulation.py
"""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

import porepy_tpu as pt
from porepy_tpu.examples.flow_benchmark_2d_case_1 import (
    FlowBenchmark2dCase1Model,
    solid_constants_conductive_fractures,
)

# ---------------------------------------------------------------------------
# Case 1 of the 2d benchmark: six fractures in a unit square, inflow on
# the west boundary, unit pressure east; variant (a) has conductive
# fractures. The model class bundles geometry, permeabilities and BCs —
# only discretization and mesh size remain to choose.
# ---------------------------------------------------------------------------
params = {
    "material_constants": {"solid": solid_constants_conductive_fractures},
    "grid_type": "cartesian",
    "meshing_arguments": {"cell_size": 1 / 32},
    "flux_discretization": "tpfa",
    "times_to_export": [],
}
model = FlowBenchmark2dCase1Model(params)
pt.run_time_dependent_model(model, params)

mdg = model.mdg
print(mdg)
assert len(mdg.subdomains(dim=1)) == 6

# Pressure along the fractures: conductive fractures short-circuit the
# field, so fracture pressure stays close to the matrix pressure at their
# locations and within the driven range.
p_mat = model.equation_system.get_variable_values(
    [model.pressure(mdg.subdomains(dim=2))], iterate_index=0
)
print(f"matrix pressure in [{p_mat.min():.3f}, {p_mat.max():.3f}]")
assert p_mat.min() > 0.9

# ---------------------------------------------------------------------------
# The 3d benchmark library: case-2 and case-3 geometries (Berre et al.
# 2021) mesh natively through the conforming cut-tet mesher. Here only the
# coarse case-2 geometry is built (the full solves are benchmark-scale —
# see tests/functional/test_benchmark_3d_case_2.py / _3.py).
# ---------------------------------------------------------------------------
from porepy_tpu.applications.md_grids.mdg_library import benchmark_3d_case_2

mdg3, network3 = benchmark_3d_case_2(refinement_level=0)
print(mdg3)
assert mdg3.dim_max() == 3
assert len(mdg3.subdomains(dim=2)) == 9  # nine fractures in case 2
print("ok")
