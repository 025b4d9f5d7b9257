"""Tutorial 8: defining equations with the AD operator system.

Counterpart of the reference's ``equations`` tutorial: build an operator
graph over variables and discretizations, hand it to the EquationSystem,
and solve. The graph is traced ONCE into a jitted device kernel; every
Newton iteration is one fused assembly+Jacobian evaluation (the reference
re-evaluates a forward-AD tape per assembly instead).
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
from porepy_tpu.numerics.ad.equation_system import EquationSystem
from porepy_tpu.numerics.ad.grid_operators import Divergence
from porepy_tpu.numerics.ad.discretizations import TpfaAd
from porepy_tpu.params.data import initialize_data

# One subdomain in an md grid (no fractures needed for the demo).
mdg = pt.MixedDimensionalGrid()
sd = pt.CartGrid([16, 16], [1.0, 1.0])
sd.compute_geometry()
mdg.add_subdomains([sd])

# Parameters for the flux discretization: unit permeability, Dirichlet
# p=1 on the west boundary, p=0 on the east.
faces = sd.get_all_boundary_faces()
bc = pt.BoundaryCondition(sd, faces, "neu")
west = sd.face_centers[0] < 1e-8
east = sd.face_centers[0] > 1.0 - 1e-8
bc.is_dir[west | east] = True
bc.is_neu[west | east] = False
bc_values = np.zeros(sd.num_faces)
bc_values[west] = 1.0

data = mdg.subdomain_data(sd)
initialize_data(
    data,
    "flow",
    {
        "second_order_tensor": pt.SecondOrderTensor(np.ones(sd.num_cells)),
        "bc": bc,
        "bc_values": bc_values,
        "ambient_dimension": 2,
    },
)

# Variables live on subdomains; the EquationSystem tracks dof layout.
eq_sys = EquationSystem(mdg)
p = eq_sys.create_variables("pressure", subdomains=[sd])
eq_sys.set_variable_values(
    np.zeros(sd.num_cells), ["pressure"], time_step_index=0, iterate_index=0
)

# Operators compose like arithmetic. TpfaAd provides `flux` (a matrix
# operator applied to cell pressures) and the BC contribution.
tpfa = TpfaAd("flow", [sd], mdg)
div = Divergence([sd])
source = pt.ad.DenseArray(np.zeros(sd.num_cells), name="source")
flux = tpfa.flux() @ p + tpfa.bound_flux() @ pt.ad.DenseArray(bc_values, "bcv")
eq = div @ flux - source
eq.set_name("incompressibility")
eq_sys.set_equation(eq, [sd], {"cells": 1})

# Discretize (computes the TPFA transmissibilities), then assemble: the
# compiled path returns the residual and Jacobian in one traced call.
pt.Tpfa("flow").discretize(sd, data)
A, b = eq_sys.assemble()
import scipy.sparse.linalg as spla
dx = spla.spsolve(A.tocsc(), b)
eq_sys.set_variable_values(dx, iterate_index=0, additive=True)

p_val = eq_sys.get_variable_values(["pressure"], iterate_index=0)
print("pressure at x=0.25/0.75:",
      float(p_val[sd.closest_cell(np.array([[0.25], [0.5], [0.0]]))[0]]),
      float(p_val[sd.closest_cell(np.array([[0.75], [0.5], [0.0]]))[0]]))
# Linear profile p = 1 - x:
assert np.allclose(p_val, 1.0 - sd.cell_centers[0], atol=1e-10)
print("matches analytic 1 - x")
