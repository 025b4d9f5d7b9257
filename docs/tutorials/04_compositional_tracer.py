"""Tutorial 4: multicomponent transport with the compositional framework.

A two-component (water + tracer) single-phase flow: the compositional
machinery adds one mass-balance equation per independent component, with
in-kernel upwinding of the component mobilities. Closures for dangling
variables use LocalElimination (pointwise surrogate equations whose values
and derivatives compile into the residual).
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
from porepy_tpu.examples.tracer_flow import TracerFlowModel

params = {
    "material_constants": {
        "solid": pt.SolidConstants(
            porosity=0.1, permeability=1e-7, normal_permeability=1e-19
        ),
    },
    "fracture_indices": [0],
    "time_manager": pt.TimeManager([0, 5e-4], 2.5e-4, constant_dt=True),
    "meshing_arguments": {"cell_size": 0.25},
    "grid_type": "cartesian",
    "suppress_export": True,
    "max_iterations": 50,
    "nl_convergence_tol": 1e-6,
    "nl_convergence_tol_res": 1e-6,
}
model = TracerFlowModel(params)
pt.run_time_dependent_model(model, params)

z = model.equation_system.get_variable_values(["z_tracer"], time_step_index=0)
sd = model.mdg.subdomains(dim=2)[0]
print("tracer fraction range:", float(z.min()), "-", float(z.max()))
y = sd.cell_centers[1]
print("north mean:", z[: sd.num_cells][y > 0.75].mean(),
      "south mean:", z[: sd.num_cells][y < 0.25].mean())
