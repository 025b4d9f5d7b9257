"""Tutorial 20: Mandel's problem — classic poroelastic verification.

Counterpart of the reference's ``mandels_problem`` tutorial: a saturated
poroelastic slab compressed between rigid plates shows the non-monotone
Mandel-Cryer pressure effect; the numerical Biot solution is compared to
the series solution. Run with

    python docs/tutorials/20_mandel_problem.py
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
from porepy_tpu.examples.mandel_biot import MandelModel, mandel_solid_params

# The example module bundles the geometry (a 100 m x 10 m slab), the
# force BC on the rigid top plate, the Biot discretization, and the exact
# series solution of Mandel (1953) / Cheng & Detournay (1988).
params = {
    "material_constants": {
        "solid": pt.SolidConstants(**mandel_solid_params),
        "fluid": pt.FluidComponent(
            viscosity=1e-3, density=1e3, compressibility=0.0
        ),
    },
    "time_manager": pt.TimeManager([0, 10, 50, 100], 10, constant_dt=True),
    "meshing_arguments": {"cell_size": 2.5},
    "suppress_export": True,
}
model = MandelModel(params)
pt.run_time_dependent_model(model, params)

# Each saved step records relative L2 errors against the series solution.
print(f"{'t [s]':>8} {'err(p)':>10} {'err(u)':>10} {'err(q)':>10}")
for r in model.results:
    print(
        f"{r.time:>8.0f} {r.error_pressure:>10.2e} "
        f"{r.error_displacement:>10.2e} {r.error_flux:>10.2e}"
    )
errors_p = [r.error_pressure for r in model.results if r.time > 0]
assert all(e < 0.05 for e in errors_p)
# Errors shrink as consolidation smooths the pressure field.
assert errors_p[-1] < errors_p[0]

# Mandel-Cryer effect: shortly after loading, the center pressure EXCEEDS
# the instantaneous (undrained) Skempton value before draining away —
# a non-monotone response no uncoupled theory reproduces. Probe the exact
# solution: its early-time center pressure rises above the t->0+ limit.
x_center = np.array([1.0])
p0 = model.exact_sol.pressure_profile(x_center, 1e-3)[0]
p_early = model.exact_sol.pressure_profile(x_center, 20.0)[0]
print(f"center pressure: initial {p0:.1f} Pa, early-time {p_early:.1f} Pa")
assert p_early > p0
print("ok")
