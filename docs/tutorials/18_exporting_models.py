"""Tutorial 18: exporting model results — vtu/pvd output, export control
and checkpoint/restart.

Counterpart of the reference's ``exporting_models`` tutorial (the
lower-level Exporter itself is tutorial 07). Run with

    python docs/tutorials/18_exporting_models.py
"""

import glob
import os
import sys
import tempfile

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

import porepy_tpu as pt

workdir = tempfile.mkdtemp(prefix="ppt_tut18_")


# Every model inherits DataSavingMixin: after each converged time step it
# exports the primary variables of all subdomains to vtu (one file per
# dimension) plus pvd index files. Control it through params:
#   folder_name / file_name  - where and what to write
#   suppress_export          - turn IO off entirely (tests, benchmarks)
class Exported(pt.SinglePhaseFlow):
    def set_fractures(self):
        self._fractures = [pt.LineFracture(np.array([[0.2, 0.8], [0.5, 0.5]]))]

    def bc_values_pressure(self, bg):
        return 1e5 * (1.0 - bg.cell_centers[1])


params = {
    "grid_type": "cartesian",
    "meshing_arguments": {"cell_size": 0.25},
    "material_constants": {
        "solid": pt.SolidConstants(
            permeability=1e-12, residual_aperture=1e-3, normal_permeability=1e-12
        ),
        "fluid": pt.FluidComponent(compressibility=4e-10, viscosity=1e-3, density=1000.0),
    },
    "time_manager": pt.TimeManager([0, 3.0], 1.0, constant_dt=True),
    "folder_name": workdir,
    "file_name": "tut18",
}
m = Exported(params)
pt.run_time_dependent_model(m, params)

vtus = sorted(glob.glob(os.path.join(workdir, "*.vtu")))
pvds = sorted(glob.glob(os.path.join(workdir, "*.pvd")))
print("wrote", len(vtus), "vtu files and", len(pvds), "pvd files")
# One file per (dimension, time step) + mortar files, plus pvd indexes.
assert any("tut18_2" in f for f in vtus) and any("tut18_1" in f for f in vtus)
assert pvds

# ---------------------------------------------------------------------------
# Restart: a NEW model instance resumes from the exported state via
# params["restart_options"] — point it at a step's pvd file and give the
# restart time; prepare_simulation imports every exported variable back
# into the solution storage (checkpoint/resume).
# ---------------------------------------------------------------------------
last_step = m.time_manager.time_index
params2 = dict(
    params,
    folder_name=tempfile.mkdtemp(prefix="ppt_tut18_second_"),
    time_manager=pt.TimeManager([3.0, 4.0], 1.0, constant_dt=True),
    restart_options={
        "restart": True,
        "pvd_file": os.path.join(workdir, f"tut18_{last_step:06d}.pvd"),
        "time": 3.0,
        "time_index": last_step,
    },
)
m2 = Exported(params2)
m2.prepare_simulation()

p_old = m.equation_system.get_variable_values(["pressure"], time_step_index=0)
p_new = m2.equation_system.get_variable_values(["pressure"], time_step_index=0)
assert np.allclose(p_old, p_new, atol=1e-12)
print("restart state matches the exported state; continuing the run")
m2._prepared = True
pt.run_time_dependent_model(m2, params2)
print("ok")
