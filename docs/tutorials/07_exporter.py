"""Tutorial 7: exporting and importing simulation data.

Counterpart of the reference's ``exporter`` / ``exporting_models``
tutorials: write mixed-dimensional fields to vtu/pvd (ParaView), both
directly and through the model's DataSavingMixin, and read states back.
"""

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
from porepy_tpu.fracs import meshing
from porepy_tpu.viz.exporter import Exporter

outdir = tempfile.mkdtemp(prefix="pt_tutorial7_")

# -- Direct export --------------------------------------------------------------
mdg = meshing.cart_grid(
    [np.array([[0.25, 0.75], [0.5, 0.5]])], [16, 16], physdims=[1.0, 1.0]
)
mdg.compute_geometry()

# Store a cell field per subdomain under a common name.
for sd, data in mdg.subdomains(return_data=True):
    pt.set_solution_values(
        "pressure", sd.cell_centers[0] + sd.dim, data, time_step_index=0
    )

exp = Exporter(mdg, file_name="tutorial7", folder_name=outdir)
# One vtu file per dimension + a meta pvd tying them together.
exp.write_vtu(["pressure"])
print("wrote:", sorted(f for f in os.listdir(outdir))[:4])

# Time series: write_vtu(time_dependent=True) appends numbered files and
# write_pvd stamps them with physical times.
for k, t in enumerate([0.0, 0.5, 1.0]):
    for sd, data in mdg.subdomains(return_data=True):
        pt.set_solution_values(
            "pressure", np.full(sd.num_cells, t), data, time_step_index=0
        )
    exp.write_vtu(["pressure"], time_dependent=True, time_step=k)
exp.write_pvd(np.array([0.0, 0.5, 1.0]))

# -- Import back ---------------------------------------------------------------
exp.import_state_from_vtu(
    os.path.join(outdir, "tutorial7_2_000002.vtu"), keys=["pressure"]
)
sd_top = mdg.subdomains(dim=2)[0]
got = mdg.subdomain_data(sd_top)[pt.TIME_STEP_SOLUTIONS]["pressure"][0]
print("imported top-dim pressure (t=1.0):", float(np.unique(got)[0]))

# -- Through a model -------------------------------------------------------------
# Models export automatically when given a folder_name: every converged
# time step calls save_data_time_step() -> write_vtu of all primary
# variables (+ user extras via `data_to_export`).
params = {
    "grid_type": "cartesian",
    "meshing_arguments": {"cell_size": 1.0 / 8},
    "folder_name": outdir,
    "material_constants": {"solid": pt.SolidConstants(permeability=1.0)},
}
model = pt.SinglePhaseFlow(params)
pt.run_time_dependent_model(model, params)
print("model wrote:", sorted(f for f in os.listdir(outdir) if "data" in f)[:3])
