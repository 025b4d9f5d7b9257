"""Tutorial 16: diagnosing a model — Jacobian block structure, solver
statistics and convergence histories.

Counterpart of the reference's ``diagnostics`` tutorial. Run with

    python docs/tutorials/16_diagnostics.py
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
from porepy_tpu.viz.diagnostics_mixin import DiagnosticsMixin


# Mix DiagnosticsMixin into any model to inspect the assembled Jacobian
# block by block — invaluable when a coupled model diverges and you need
# to know WHICH equation/variable block is out of scale.
class Diagnosed(DiagnosticsMixin, pt.Poromechanics):
    def bc_values_displacement(self, bg):
        vals = np.zeros((self.nd, bg.num_cells))
        vals[1, self.domain_boundary_sides(bg).north] = -1e-3
        return vals.ravel("F")


params = {
    "grid_type": "cartesian",
    "meshing_arguments": {"cell_size": 0.25},
    "material_constants": {
        "solid": pt.SolidConstants(
            shear_modulus=1.0, lame_lambda=1.0, permeability=1e-2,
            porosity=0.1, biot_coefficient=0.8, specific_storage=0.1,
        ),
        "fluid": pt.FluidComponent(viscosity=1.0, density=1.0, compressibility=1e-2),
    },
    "time_manager": pt.TimeManager([0, 0.5], 0.25, constant_dt=True),
}
model = Diagnosed(params)
pt.run_time_dependent_model(model, params)

# 1) Per-block maxima: the (equation, variable) table of the Jacobian.
data = model.run_diagnostics(default_handlers=("max",))
print(f"{'equation':<34} {'variable':<22} {'|block|_max':>12}")
for (eq, var), entry in sorted(data.items()):
    if entry["max"] > 0:
        print(f"{eq:<34} {var:<22} {entry['max']:>12.3e}")

# The momentum/displacement block and the mass/pressure block must both be
# populated — a zero coupling block here would mean the Biot terms are
# not wired in.
populated = {k for k, v in data.items() if v["max"] > 0}
assert any("momentum" in eq for eq, _ in populated)
assert any("mass" in eq for eq, _ in populated)

# 2) Nonlinear solver statistics: per-time-step iteration counts and
# convergence histories, dumpable to JSON for run archival.
stats = model.nonlinear_solver_statistics
print("time steps recorded:", len(stats.history))
for idx, rec in stats.history.items():
    # Increment norms always exist; residual norms only when a residual
    # tolerance is active (nl_convergence_tol_res).
    print(
        f"  step {idx}: {rec['num_iteration']} iterations, "
        f"final increment {rec['nonlinear_increment_norms'][-1]:.2e}"
    )
assert len(stats.history) == 2

print("ok")
