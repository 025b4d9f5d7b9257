"""Tutorial 5: grids, geometry, and topology.

Counterpart of the reference's ``grids`` and ``grid_topology`` tutorials:
create structured and simplex grids, compute geometry, and walk the
face-cell / node-face incidence maps that every discretization consumes.
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

# -- Structured grids ---------------------------------------------------------
# CartGrid([nx, ny], physdims) and TensorGrid(x_coords, y_coords) cover
# uniform and graded axis-aligned meshes; 1d/2d/3d by argument length.
g = pt.CartGrid([4, 3], [1.0, 1.0])
# Nothing geometric exists until compute_geometry(): it fills cell_centers,
# face_centers, face_normals (area-weighted), cell_volumes, face_areas.
g.compute_geometry()
print(g)
print("cell volumes:", g.cell_volumes)

# Graded tensor grid: refine towards x=0.
x = np.array([0.0, 0.05, 0.15, 0.3, 0.6, 1.0])
gt = pt.TensorGrid(x, np.linspace(0, 1, 4))
gt.compute_geometry()
print("graded dx:", np.diff(x))

# Simplex grids: structured triangulations, or Delaunay from points.
gs = pt.StructuredTriangleGrid([3, 3], [1.0, 1.0])
gs.compute_geometry()

# -- Topology -----------------------------------------------------------------
# Two sparse incidence matrices define the full topology:
#   cell_faces (num_faces x num_cells): entry +-1 says the face bounds the
#     cell, sign = direction of the (fixed, stored) face normal relative
#     to the cell (+1 out of the cell).
#   face_nodes (num_nodes x num_faces): which nodes span each face.
cf = g.cell_faces.tocsc()
cell = 5
faces_of_cell = cf.indices[cf.indptr[cell] : cf.indptr[cell + 1]]
print(f"faces of cell {cell}:", faces_of_cell)

# Neighbours across faces: cell_faces^T @ cell_faces has off-diagonal
# entries exactly where two cells share a face.
adj = (cf.T @ cf).tocoo()
nbrs = adj.col[(adj.row == cell) & (adj.col != cell) & (adj.data < 0)]
print(f"neighbours of cell {cell}:", np.unique(nbrs))

# Boundary faces have exactly one incident cell.
bf = g.get_all_boundary_faces()
print("boundary faces:", bf.size, "of", g.num_faces)

# Signs for outward fluxes on the boundary.
sgn, bnd_cells = g.signs_and_cells_of_boundary_faces(bf)
assert np.all(np.abs(sgn) == 1)

# -- Partitioning -------------------------------------------------------------
# partition_structured splits a Cartesian grid into axis-aligned blocks
# (the building block for overlapping-subdomain device batches).
from porepy_tpu.grids import partition

big = pt.CartGrid([8, 8])
big.compute_geometry()
labels = partition.partition_structured(big, num_part=4)
print("partition sizes:", np.bincount(labels))

# extract_subgrid pulls one block out as a standalone grid with maps back
# to the parent's cells/faces/nodes.
sub, face_map, node_map = partition.extract_subgrid(
    big, np.where(labels == 0)[0]
)
print("subgrid:", sub.num_cells, "cells; parent faces:", face_map.size)
