"""Tutorial 10: comparing flux discretizations (Tpfa, Mpfa, MVEM, RT0).

Counterpart of the reference's ``flux_discretizations`` tutorial: the
two-point scheme is exact on K-orthogonal grids but inconsistent on
general ones; the multi-point scheme and the mixed methods stay
consistent. Demonstrated with an anisotropic permeability on a Cartesian
grid, where TPFA ignores the off-diagonal tensor entries.
"""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import scipy.sparse as sps
import scipy.sparse.linalg as spla

import porepy_tpu as pt
from porepy_tpu.params.data import initialize_data

n = 16
sd = pt.CartGrid([n, n], [1.0, 1.0])
sd.compute_geometry()

# Rotated anisotropic permeability: K = R diag(10, 1) R^T at 30 degrees.
theta = np.pi / 6
c, s = np.cos(theta), np.sin(theta)
kxx = 10 * c * c + 1 * s * s
kyy = 10 * s * s + 1 * c * c
kxy = (10 - 1) * c * s
ones = np.ones(sd.num_cells)
K = pt.SecondOrderTensor(kxx=kxx * ones, kyy=kyy * ones, kxy=kxy * ones)

# Dirichlet everywhere with the exact solution of a uniform gradient:
# p = x + 2y, flux = -K grad p (linear pressure => all consistent schemes
# reproduce it exactly; TPFA cannot see kxy and gets the flux wrong).
p_exact = lambda x, y: x + 2 * y
bf = sd.get_all_boundary_faces()
bc = pt.BoundaryCondition(sd, bf, "dir")
bc_values = np.zeros(sd.num_faces)
bc_values[bf] = p_exact(sd.face_centers[0, bf], sd.face_centers[1, bf])

def solve_fv(scheme):
    data = initialize_data({}, "flow", {
        "second_order_tensor": K, "bc": bc, "bc_values": bc_values,
        "ambient_dimension": 2,
    })
    scheme.discretize(sd, data)
    mats = data[pt.DISCRETIZATION_MATRICES]["flow"]
    div = sd.cell_faces.T
    A = div @ mats["flux"]
    b = -div @ (mats["bound_flux"] @ bc_values)
    p = spla.spsolve(A.tocsc(), b)
    flux = mats["flux"] @ p + mats["bound_flux"] @ bc_values
    return p, flux

p_tpfa, q_tpfa = solve_fv(pt.Tpfa("flow"))
p_mpfa, q_mpfa = solve_fv(pt.Mpfa("flow"))

pe = p_exact(sd.cell_centers[0], sd.cell_centers[1])
err = lambda p: float(np.sqrt(np.sum(sd.cell_volumes * (p - pe) ** 2)))
# Exact normal flux of p = x + 2y: q.n = -(K [1, 2]) . n * area
gx, gy = kxx * 1 + kxy * 2, kxy * 1 + kyy * 2
q_exact = -(gx * sd.face_normals[0] + gy * sd.face_normals[1])
qerr = lambda q: float(np.max(np.abs(q - q_exact)) / np.max(np.abs(q_exact)))
print(f"TPFA cell error: {err(p_tpfa):.2e}, flux error: {qerr(q_tpfa):.2e} "
      "(TPFA cannot represent the off-diagonal tensor: O(1) flux error)")
print(f"MPFA cell error: {err(p_mpfa):.2e}, flux error: {qerr(q_mpfa):.2e} "
      "(consistent: exact for linear p)")
assert qerr(q_mpfa) < 1e-10 < qerr(q_tpfa)

# MVEM solves for (flux, pressure) jointly — flux is a first-class dof,
# giving locally conservative fluxes on any grid.
data = initialize_data({}, "flow", {
    "second_order_tensor": K, "bc": bc, "bc_values": bc_values,
    "ambient_dimension": 2, "vector_source": np.zeros(sd.num_cells * 3),
})
mvem = pt.MVEM("flow")
mvem.discretize(sd, data)
A, b = mvem.assemble_matrix_rhs(sd, data)
x = spla.spsolve(A.tocsc(), b)
p_mvem = x[sd.num_faces:]
print(f"MVEM cell error: {err(p_mvem):.2e}   (mixed method, exact too)")
assert err(p_mvem) < 1e-10
