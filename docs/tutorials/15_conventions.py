"""Tutorial 15: conventions — signs, orientations, orderings and units.

Counterpart of the reference's ``conventions`` tutorial: the contracts
every array in the framework obeys. Run with

    python docs/tutorials/15_conventions.py
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

# ---------------------------------------------------------------------------
# Geometry arrays are column-major over entities: points/centers/normals
# are (3, n) even in 2d (the third row is zero-padded).
# ---------------------------------------------------------------------------
g = pt.CartGrid([2, 2], [1.0, 1.0])
g.compute_geometry()
assert g.nodes.shape[0] == 3 and g.cell_centers.shape == (3, 4)

# ---------------------------------------------------------------------------
# Face normals are NOT unit vectors: they are area-weighted, and their
# orientation is arbitrary-but-fixed. The divergence matrix cell_faces
# holds +-1 entries that relate the stored orientation to the outward
# direction per cell, so div @ flux is always the net outflow.
# ---------------------------------------------------------------------------
areas = np.linalg.norm(g.face_normals, axis=0)
assert np.allclose(areas, g.face_areas)
div = g.divergence().toarray()
assert set(np.unique(div)) <= {-1.0, 0.0, 1.0}

# A constant vector field has zero divergence in every interior cell:
flux = g.face_normals[0]  # unit x-field dotted with area normals
assert np.allclose(g.divergence() @ flux, 0.0)

# ---------------------------------------------------------------------------
# Scalar fields are cell-ordered; vector fields interleave components per
# cell ("F" ravel of an (nd, nc) array): [u0x, u0y, u1x, u1y, ...].
# ---------------------------------------------------------------------------
vals = np.zeros((2, g.num_cells))
vals[0] = 1.0
raveled = vals.ravel("F")
assert raveled[0] == 1.0 and raveled[1] == 0.0

# ---------------------------------------------------------------------------
# Units: material constants carry SI values scaled by a Units object; the
# convention is that MODEL code always works in scaled units and converts
# at the boundary via units.convert_units.
# ---------------------------------------------------------------------------
units = pt.Units(m=1000.0)  # kilometers as the length unit
solid = pt.SolidConstants(permeability=1e-12, units=units)
# permeability is m^2: dividing by (1000 m)^2 = 1e6.
assert np.isclose(solid.permeability, 1e-18)

# ---------------------------------------------------------------------------
# Mixed-dimensional ordering: subdomains are sorted by DESCENDING
# dimension (matrix first, then fractures, then intersections); global dof
# vectors concatenate variables per grid in that order.
# ---------------------------------------------------------------------------
f = pt.LineFracture(np.array([[0.25, 0.75], [0.5, 0.5]]))
mdg = pt.meshing.cart_grid([f.pts], nx=np.array([4, 4]))
dims = [sd.dim for sd in mdg.subdomains()]
assert dims == sorted(dims, reverse=True)

# Interfaces (mortar grids) sit between a higher-dim "primary" and a
# lower-dim "secondary" subdomain; projections are named from the mortar's
# viewpoint (primary_to_mortar_avg, mortar_to_secondary_int, ...).
intf = list(mdg.interfaces())[0]
sd_primary, sd_secondary = mdg.interface_to_subdomain_pair(intf)
assert sd_primary.dim == sd_secondary.dim + 1

print("all conventions hold")
