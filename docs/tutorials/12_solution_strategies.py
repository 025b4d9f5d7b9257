"""Tutorial 12: solution strategies, time stepping, and diagnostics.

Counterpart of the reference's ``solution_strategies`` and ``diagnostics``
tutorials: what a model run actually does, how to control the Newton loop
and the adaptive time manager, where the solver statistics live, and the
diagnostics view of the assembled system.
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


class Model(pt.SinglePhaseFlow):
    def bc_values_pressure(self, bg):
        return 1.0 - bg.cell_centers[1]


# The run loop calls a fixed protocol on the model:
#   prepare_simulation -> [before_nonlinear_loop -> (iterate) ->
#   after_nonlinear_convergence] per time step; each Newton iteration is
#   before_nonlinear_iteration -> assemble+solve -> after_nonlinear_iteration.
# On device solvers the whole Newton loop of a step fuses into ONE jitted
# device program when the model keeps the default hooks (fused_newton).
params = {
    "grid_type": "cartesian",
    "meshing_arguments": {"cell_size": 1.0 / 16},
    "material_constants": {
        "solid": pt.SolidConstants(permeability=1.0, porosity=0.1),
        "fluid": pt.FluidComponent(compressibility=1e-4),
    },
    # Adaptive time stepping: dt grows on fast convergence, is cut on
    # failure, and recomputes the failed step.
    "time_manager": pt.TimeManager(
        schedule=[0.0, 8.0], dt_init=1.0, constant_dt=False,
        dt_min_max=(0.25, 4.0), iter_optimal_range=(3, 7),
    ),
    # Newton controls (names mirror the reference's params contract):
    "max_iterations": 15,
    "nl_convergence_tol": 1e-10,
    "nl_convergence_tol_res": np.inf,
    "nl_divergence_tol": 1e30,
    # Device solve controls:
    "linear_solver": "scipy_sparse",  # or device_gmres on TPU
}
m = Model(params)
pt.run_time_dependent_model(m, params)

# Solver statistics: per-step Newton iteration counts and error history.
stats = m.nonlinear_solver_statistics
print("total Newton iterations:", stats.num_iteration)
print("last increment history:", [f"{e:.1e}" for e in stats.nonlinear_increment_norms])
print("final time:", m.time_manager.time, "final dt:", m.time_manager.dt)

# Diagnostics: block-wise view of the assembled Jacobian (condition and
# magnitude per equation/variable pair) for debugging stiff couplings.
class DiagModel(pt.DiagnosticsMixin, Model):
    pass

dm = DiagModel(params)
dm.prepare_simulation()
dm.assemble_linear_system()
diag = dm.run_diagnostics(grouping=None)
for (eq, var), info in sorted(diag.items()):
    if info.get("is_empty_block", False):
        continue
    print(f"block ({eq}, {var}): shape {info['block_size']}, "
          f"max |entry| {info['max']:.2e}")
