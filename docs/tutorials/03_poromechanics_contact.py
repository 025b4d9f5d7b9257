"""Tutorial 3: poromechanics with frictional fracture contact.

Coupled Biot poroelasticity with a fracture whose contact state
(open/sticking/sliding) is solved with a semismooth Newton method; the
constraint-aware line search stabilizes state transitions.
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


class Tutorial3(pt.ContactIndicators, pt.Poromechanics):
    def set_fractures(self):
        self._fractures = [pt.LineFracture(np.array([[0.3, 0.7], [0.5, 0.5]]))]

    def meshing_arguments(self):
        return {"cell_size": 0.25}

    def bc_values_displacement(self, bg):
        # Compress from the north boundary.
        vals = np.zeros((self.nd, bg.num_cells))
        vals[1, self.domain_boundary_sides(bg).north] = -1e-3
        return vals.ravel("F")


class Solver(
    pt.ConstraintLineSearch,
    pt.SplineInterpolationLineSearch,
    pt.LineSearchNewtonSolver,
):
    pass


params = {
    "material_constants": {
        "solid": pt.SolidConstants(
            shear_modulus=1.0,
            lame_lambda=1.0,
            permeability=1e-4,
            porosity=0.05,
            biot_coefficient=0.8,
            residual_aperture=1e-3,
            normal_permeability=1e-4,
            friction_coefficient=0.5,
        ),
    },
    "time_manager": pt.TimeManager([0, 1.0], 1.0, constant_dt=True),
    "nonlinear_solver": Solver,
    "global_line_search": True,
    "local_line_search": True,
    "suppress_export": True,
}
model = Tutorial3(params)
pt.run_time_dependent_model(model, params)

t = model.equation_system.get_variable_values(
    ["contact_traction"], time_step_index=0
)
print("contact traction (nondimensional):", np.round(t, 5))
