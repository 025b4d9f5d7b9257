"""Tutorial 1: single-phase incompressible flow on a unit square.

Counterpart of the reference's ``single_phase_flow`` tutorial: compose a
model from mixins, run it, and inspect the solution. Run with

    python docs/tutorials/01_single_phase_flow.py
"""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

import jax

# The build image registers a TPU plugin; tutorials run fine on CPU.
jax.config.update("jax_platforms", "cpu")

import numpy as np

import porepy_tpu as pt


# A model is a class composed from mixin families (geometry, equations,
# constitutive laws, BC/IC, solution strategy). `SinglePhaseFlow` bundles
# sensible defaults; subclass to override what differs.
class Tutorial1(pt.SinglePhaseFlow):
    def bc_values_pressure(self, bg):
        # Linear pressure drop west -> east; `bg` is a boundary grid whose
        # cells are the boundary faces of its parent subdomain.
        return 2.0 - bg.cell_centers[0]


params = {
    "grid_type": "cartesian",
    "meshing_arguments": {"cell_size": 1 / 16},
    "material_constants": {
        "solid": pt.SolidConstants(permeability=1.0, porosity=0.1),
    },
}
model = Tutorial1(params)
pt.run_time_dependent_model(model, params)

p = model.equation_system.get_variable_values(["pressure"], time_step_index=0)
sd = model.mdg.subdomains()[0]
print("cells:", sd.num_cells)
print("pressure range:", p.min(), "-", p.max())
# The exact solution is linear; TPFA reproduces it to machine precision.
assert np.allclose(p, 2.0 - sd.cell_centers[0], atol=1e-10)
print("matches the exact linear solution")
