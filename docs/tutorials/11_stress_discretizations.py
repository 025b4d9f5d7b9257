"""Tutorial 11: stress discretizations (MPSA and TPSA).

Counterpart of the reference's ``stress_discretization`` tutorial: the
multi-point stress approximation for linear elasticity, its boundary
displacement reconstruction, and the lighter three-field two-point scheme.
"""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import scipy.sparse.linalg as spla

import porepy_tpu as pt
from porepy_tpu.params.data import initialize_data

n = 12
sd = pt.CartGrid([n, n], [1.0, 1.0])
sd.compute_geometry()
nd = 2

# Homogeneous stiffness (mu, lambda) per cell.
ones = np.ones(sd.num_cells)
C = pt.FourthOrderTensor(mu=ones, lmbda=ones)

# Dirichlet displacement from an exact linear field on ALL boundary
# faces: any consistent scheme reproduces linear displacement exactly.
u_ex = lambda x, y: np.array([0.01 * x + 0.02 * y, -0.01 * y])
bf = sd.get_all_boundary_faces()
north = np.where(sd.face_centers[1] > 1 - 1e-8)[0]
bc = pt.BoundaryConditionVectorial(sd, bf, "dir")
bc_values = np.zeros((nd, sd.num_faces))
bc_values[:, bf] = u_ex(sd.face_centers[0, bf], sd.face_centers[1, bf])
bc_values = bc_values.ravel("F")

data = initialize_data({}, "mechanics", {
    "fourth_order_tensor": C, "bc": bc, "bc_values": bc_values,
})

# MPSA: cell-centered displacements; stress/bound_stress map (u, bc) to
# face tractions. Discretization runs as batched interaction-region
# solves on device.
mpsa = pt.Mpsa("mechanics")
mpsa.discretize(sd, data)
mats = data[pt.DISCRETIZATION_MATRICES]["mechanics"]

# Momentum balance: div(stress) = 0 with the vector divergence operator.
div_vec = pt.ad.Divergence([sd], dim=nd).mat
A = div_vec @ mats["stress"]
b = -div_vec @ (mats["bound_stress"] @ bc_values)
u = spla.spsolve(A.tocsc(), b)
ue = u_ex(sd.cell_centers[0], sd.cell_centers[1])
print("max |u - u_exact|:", float(np.abs(u.reshape((-1, nd)).T - ue).max()))
assert np.allclose(u.reshape((-1, nd)).T, ue, atol=1e-10)
print("matches exact linear displacement")

# Boundary displacement reconstruction: traces of u on faces from cell
# values and BCs (used by fracture contact mechanics).
u_faces = mats["bound_displacement_cell"] @ u + mats[
    "bound_displacement_face"] @ bc_values
uy_top = u_faces.reshape((-1, nd))[north, 1]
assert np.allclose(
    uy_top, -0.01 * sd.face_centers[1, north], atol=1e-10
)
print("reconstructed top-face displacement matches the exact trace")

# TPSA: three-field (displacement, rotation, volumetric stress) two-point
# scheme — cheaper stencil, same BC contract (reference arXiv:2405.10390).
tpsa = pt.Tpsa("mechanics")
tpsa.discretize(sd, data)
print("tpsa matrices:", sorted(data[pt.DISCRETIZATION_MATRICES]["mechanics"])[:4], "...")
