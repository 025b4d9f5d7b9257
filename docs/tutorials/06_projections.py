"""Tutorial 6: subdomain and interface (mortar) projections.

Counterpart of the reference's ``subdomain_and_interface_projections``
tutorial: the projection operators that move quantities between the global
mixed-dimensional ordering, individual subdomains, and mortar interfaces.
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
from porepy_tpu.fracs import meshing

# An md grid with one horizontal fracture: a 2d matrix, a 1d fracture,
# and one mortar interface between them.
mdg = meshing.cart_grid(
    [np.array([[0.25, 0.75], [0.5, 0.5]])], [8, 8], physdims=[1.0, 1.0]
)
mdg.compute_geometry()
subdomains = mdg.subdomains()
interfaces = mdg.interfaces()
print(mdg)

# -- Subdomain projections ------------------------------------------------------
# SubdomainProjections works on the concatenated (ordered) cell/face vector
# over a list of subdomains: cell_restriction picks one subdomain's block,
# cell_prolongation scatters it back.
proj = pt.ad.SubdomainProjections(subdomains)
sd_frac = mdg.subdomains(dim=1)[0]
total_cells = sum(sd.num_cells for sd in subdomains)
x = np.arange(total_cells, dtype=float)
# The projections are AD operators (usable inside equations); the raw
# sparse matrix sits in ``.mat``.
restrict = proj.cell_restriction([sd_frac]).mat
x_frac = restrict @ x
print("fracture block:", x_frac)
# Prolongation is the transpose scatter: restrict @ prolong = identity.
prolong = proj.cell_prolongation([sd_frac]).mat
assert np.allclose(restrict @ (prolong @ x_frac), x_frac)

# -- Mortar projections ---------------------------------------------------------
# MortarProjections maps between subdomain quantities and mortar cells:
#   primary_to_mortar_{avg,int}: matrix faces -> mortar cells
#   secondary_to_mortar_{avg,int}: fracture cells -> mortar cells
#   mortar_to_primary/secondary: back. The _avg variants preserve
#   intensive quantities (pressures), _int extensive ones (fluxes).
mproj = pt.ad.MortarProjections(mdg, subdomains, interfaces, dim=1)
intf = interfaces[0]
print("mortar cells:", intf.num_cells, "(two sides of the fracture)")

ones_frac = prolong @ np.ones(sd_frac.num_cells)
on_mortar = mproj.secondary_to_mortar_avg().mat @ ones_frac
assert np.allclose(np.asarray(on_mortar), 1.0), "averaging preserves constants"

# Integrated (extensive) projection sums rather than averages: projecting
# the mortar unit flux back to fracture cells gives each cell the total
# flux of the mortar cells above and below it.
back = mproj.mortar_to_secondary_int().mat @ np.ones(intf.num_cells)
frac_part = restrict @ np.asarray(back)
print("flux into each fracture cell from both sides:", frac_part)

# -- Trace: cell values onto faces ---------------------------------------------
# Trace restricts cell-centred values onto subdomain faces (used to couple
# matrix pressure to the interface law).
trace = pt.ad.Trace(subdomains)
sd_mat = mdg.subdomains(dim=2)[0]
cellvals = np.ones(total_cells)
facevals = trace.mat @ cellvals
print("trace rows (all subdomain faces):", facevals.shape)
