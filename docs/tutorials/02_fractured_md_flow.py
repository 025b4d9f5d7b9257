"""Tutorial 2: mixed-dimensional flow through a fracture network.

Fractures are lower-dimensional subdomains coupled to the matrix through
mortar interfaces. Meshing runs natively: cartesian (fractures snapped to
grid lines) or simplex (conforming constrained Delaunay, no gmsh needed).
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


class Tutorial2(pt.SinglePhaseFlow):
    def set_fractures(self):
        # Two crossing fractures; the intersection becomes a 0d subdomain.
        self._fractures = [
            pt.LineFracture(np.array([[0.2, 0.8], [0.5, 0.5]])),
            pt.LineFracture(np.array([[0.5, 0.5], [0.2, 0.8]])),
        ]

    def bc_values_pressure(self, bg):
        return 1.0 - bg.cell_centers[1]


params = {
    "grid_type": "simplex",  # native CDT mesher
    "meshing_arguments": {"cell_size": 0.1},
    "material_constants": {
        "solid": pt.SolidConstants(
            permeability=1.0,
            porosity=0.1,
            residual_aperture=1e-2,   # fracture aperture at zero jump
            normal_permeability=1.0,  # fracture-matrix coupling
        ),
    },
    # Device-resident Newton: assembly stays on device as a static-layout
    # BCOO; the solve is chunked, preconditioned GMRES.
    "linear_solver": "device_gmres",
}
model = Tutorial2(params)
pt.run_time_dependent_model(model, params)

print(model.mdg)
for dim in (2, 1, 0):
    for sd in model.mdg.subdomains(dim=dim):
        print(f"dim {dim}: {sd.num_cells} cells")
p = model.equation_system.get_variable_values(["pressure"], time_step_index=0)
print("pressure range:", float(p.min()), "-", float(p.max()))
