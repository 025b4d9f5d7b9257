"""Tutorial 9: boundary conditions in models.

Counterpart of the reference's ``boundary_conditions`` tutorial: BC types
(Dirichlet/Neumann/Robin), values through boundary grids, vectorial BCs
for mechanics, and time-dependent values.
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

# -- BC objects -----------------------------------------------------------------
# The low-level objects label each (boundary) face with a type; faces not
# mentioned default to Neumann. Types may only be set on boundary faces.
sd = pt.CartGrid([8, 8], [1.0, 1.0])
sd.compute_geometry()
west = np.where(sd.face_centers[0] < 1e-8)[0]
bc = pt.BoundaryCondition(sd, west, "dir")
print("dir faces:", int(bc.is_dir.sum()), "neu faces:", int(bc.is_neu.sum()))

# Vectorial BCs type each COMPONENT of each face: rollers (normal fixed,
# tangential free) are a per-component mix.
bcv = pt.BoundaryConditionVectorial(sd, west, "dir")
bcv.is_dir[1, west] = False  # free the tangential component
bcv.is_neu[1, west] = True
print("rollers on west: dir-x", bool(bcv.is_dir[0, west].all()),
      "neu-y", bool(bcv.is_neu[1, west].all()))

# -- BCs in models ----------------------------------------------------------------
# Models declare types via bc_type_* (one per flux law) and values via
# bc_values_* evaluated on BOUNDARY GRIDS: lower-dimensional grids whose
# cells are the parent's boundary faces, so values are cell arrays.
class Model(pt.SinglePhaseFlow):
    def bc_type_darcy_flux(self, sd):
        sides = self.domain_boundary_sides(sd)
        return pt.BoundaryCondition(sd, sides.west + sides.east, "dir")

    def bc_values_pressure(self, bg):
        # Time-dependent inflow pressure: ramps with the simulation time.
        t = self.time_manager.time
        vals = np.zeros(bg.num_cells)
        sides = self.domain_boundary_sides(bg)
        vals[sides.west] = 2.0 + 0.5 * t
        vals[sides.east] = 1.0
        return vals

    def bc_values_darcy_flux(self, bg):
        # Neumann faces (north/south here) carry prescribed total flux;
        # zero = no-flow (the default).
        return np.zeros(bg.num_cells)

params = {
    "grid_type": "cartesian",
    "meshing_arguments": {"cell_size": 1.0 / 8},
    "material_constants": {"solid": pt.SolidConstants(permeability=1.0)},
    "time_manager": pt.TimeManager([0, 2.0], 1.0, constant_dt=True),
}
m = Model(params)
pt.run_time_dependent_model(m, params)
p = m.equation_system.get_variable_values(["pressure"], time_step_index=0)
print("pressure range at t=2:", round(float(p.min()), 3), "-",
      round(float(p.max()), 3))
# West value was 2 + 0.5*2 = 3 on the last step; profile spans [1, 3].
assert 2.5 < p.max() <= 3.0 and 1.0 <= p.min() < 1.5
print("time-dependent Dirichlet ramp verified")
