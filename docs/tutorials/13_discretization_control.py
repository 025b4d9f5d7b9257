"""Tutorial 13: fine-grained discretization control.

Two capabilities beyond the plain ``discretize()`` call:

1. SUBFACE-RESOLVED boundary conditions: MPFA/MPSA accept a boundary
   condition defined on the unique subfaces (face-node pairs), letting the
   type AND value vary within a single face — unreachable with face-wise
   conditions. Counterpart of the reference's ``subface_rhs`` branch.
2. PARTIAL REDISCRETIZATION: after a local change (parameters in a few
   cells, or faces added by fracture propagation), ``update_discretization``
   re-assembles only the interaction regions whose stencils changed and
   maps all other rows through, instead of recomputing the whole grid.
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
from porepy_tpu.numerics.fv._fvutils import (
    boundary_to_sub_boundary,
    subface_numbering,
)

# -- 1. Subface-resolved boundary conditions ---------------------------------
g = pt.CartGrid([6, 5], [1.2, 1.0])
g.compute_geometry()
perm = np.ones(g.num_cells)
bf = g.get_boundary_faces()

# Start from a face-wise Dirichlet condition and expand it to subfaces.
bc_face = pt.BoundaryCondition(g, bf, ["dir"] * bf.size)
bc_sub = boundary_to_sub_boundary(bc_face, g)
fno, nno = subface_numbering(g)
print(f"{g.num_faces} faces -> {bc_sub.num_faces} unique subfaces")

# Flip every second boundary subface to Neumann: the two halves of one
# face now carry different condition types.
on_boundary = np.isin(fno, bf)
flip = on_boundary & (np.arange(bc_sub.num_faces) % 2 == 0)
bc_sub.is_dir[flip] = False
bc_sub.is_neu[flip] = True

data = pt.initialize_data(
    {},
    "flow",
    {
        "second_order_tensor": pt.SecondOrderTensor(perm),
        "bc": bc_sub,
        "ambient_dimension": g.dim,
    },
)
pt.Mpfa("flow").discretize(g, data)
flux = data[pt.DISCRETIZATION_MATRICES]["flow"]["flux"]
# Output rows are per SUBFACE now; sum them to faces when a face-wise
# operator is wanted.
from porepy_tpu.numerics.fv._fvutils import map_subface_to_face

flux_faces = map_subface_to_face(g, 1) @ flux
print("subface flux:", flux.shape, "-> summed to faces:", flux_faces.shape)

# -- 2. Partial rediscretization ---------------------------------------------
g2 = pt.CartGrid([40, 40])
g2.compute_geometry()
perm2 = np.ones(g2.num_cells)
bc2 = pt.BoundaryCondition(g2, g2.get_boundary_faces(), "dir")
d2 = pt.initialize_data(
    {},
    "flow",
    {
        "second_order_tensor": pt.SecondOrderTensor(perm2),
        "bc": bc2,
        "ambient_dimension": 2,
    },
)
mpfa = pt.Mpfa("flow")
mpfa.discretize(g2, d2)

# A local permeability change: only the stencils of faces sharing an
# interaction region with the modified cells are recomputed.
modified = np.array([820, 821, 860])
perm2[modified] = 50.0
d2[pt.PARAMETERS]["flow"]["second_order_tensor"] = pt.SecondOrderTensor(perm2)
d2["update_discretization"] = {"modified_cells": modified}
before = d2[pt.DISCRETIZATION_MATRICES]["flow"]["flux"].copy()
mpfa.update_discretization(g2, d2)
after = d2[pt.DISCRETIZATION_MATRICES]["flow"]["flux"]
changed = np.unique(abs(after - before).tocoo().row)
print(
    f"partial update touched {changed.size} of {g2.num_faces} face rows "
    "(the stencil neighborhood of the modified cells)"
)

# The same machinery drives fracture-propagation rebuilds automatically:
# ``FracturePropagation`` records the split/new faces and the model's
# ``discretize`` routes the host grid through ``update_discretization``.
print("done")
