"""Tutorial 14: introduction — what this framework is and a first model.

Counterpart of the reference's ``introduction`` tutorial: the package in
one page. porepy_tpu is a TPU-native simulation framework for
multiphysics in (fractured) porous media: grids and mixed-dimensional
geometry live on the host; discretizations, assembly and solves compile
to XLA and run as few large device dispatches. Run with

    python docs/tutorials/14_introduction.py
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

# ---------------------------------------------------------------------------
# The package splits into the same layers as the reference PorePy:
#   - grids / fracs / geometry: meshes, fracture networks, md-grids (host)
#   - numerics: FV discretizations, the operator DAG + compiler, solvers
#   - models: ready physics (flow, mechanics, THM, compositional) as mixins
#   - params / compositional: material constants, fluids, EoS
#   - viz / applications: export, diagnostics, benchmark libraries
#
# The workflow is always: define a model class (compose mixins, override
# hooks), build params, call a run function.
# ---------------------------------------------------------------------------


class Intro(pt.SinglePhaseFlow):
    """Compressible flow in a unit square with one fracture."""

    def set_fractures(self):
        self._fractures = [
            pt.LineFracture(np.array([[0.2, 0.8], [0.5, 0.5]]))
        ]

    def bc_values_pressure(self, bg):
        return 1e5 * (1.0 - bg.cell_centers[0])


params = {
    "grid_type": "cartesian",
    "meshing_arguments": {"cell_size": 1 / 8},
    "material_constants": {
        "solid": pt.SolidConstants(
            permeability=1e-12, residual_aperture=1e-3, normal_permeability=1e-12
        ),
        "fluid": pt.FluidComponent(
            compressibility=4e-10, viscosity=1e-3, density=1000.0
        ),
    },
    "time_manager": pt.TimeManager([0, 2.0], 1.0, constant_dt=True),
}
model = Intro(params)
pt.run_time_dependent_model(model, params)

# The mixed-dimensional grid: one 2d matrix, one 1d fracture, one mortar
# interface; every subdomain carries its own variables and equations.
print(model.mdg)
for sd in model.mdg.subdomains():
    p = model.equation_system.get_variable_values(
        [model.pressure([sd])], time_step_index=0
    )
    print(f"dim {sd.dim}: {sd.num_cells} cells, p in [{p.min():.1f}, {p.max():.1f}]")
assert all(
    np.all(np.isfinite(model.equation_system.get_variable_values(time_step_index=0)))
    for _ in [0]
)
print("ok")
