"""Mortar projection updates on grid replacement (reference
``grids/mortar_grid.py:252-460``): refining the mortar side grids or the
secondary grid preserves projection consistency (rows sum to one for
averages, integrals preserved)."""

import numpy as np
import pytest

import porepy_tpu as pt
from porepy_tpu.fracs import meshing
from porepy_tpu.grids.refinement import refine_grid_1d


def _mdg():
    return meshing.cart_grid(
        [np.array([[0.25, 0.75], [0.5, 0.5]])], np.array([4, 4]),
        physdims=[1.0, 1.0],
    )


def test_update_mortar_refined_sides():
    mdg = _mdg()
    intf = list(mdg.interfaces())[0]
    new_sides = {
        side: refine_grid_1d(g, ratio=2) for side, g in intf.side_grids.items()
    }
    for g in new_sides.values():
        g.compute_geometry()
    n_old = intf.num_cells
    intf.update_mortar(new_sides, tol=1e-6)
    assert intf.num_cells == 2 * n_old
    # Average projections: partition of unity row-wise.
    for P in (intf.primary_to_mortar_avg(), intf.secondary_to_mortar_avg()):
        sums = np.asarray(P.sum(axis=1)).ravel()
        assert np.allclose(sums, 1.0)
    # Each refined mortar cell inherits exactly its parent secondary
    # cell's value (the overlap is one-to-one after refinement).
    _, sd_l = mdg.interface_to_subdomain_pair(intf)
    vals = np.arange(sd_l.num_cells, dtype=float) + 1.0
    at_mortar = intf.secondary_to_mortar_avg() @ vals
    # Parent of each mortar cell: nearest secondary cell center in x.
    parent = np.argmin(
        np.abs(
            intf.cell_centers[0][:, None] - sd_l.cell_centers[0][None, :]
        ),
        axis=1,
    )
    assert np.allclose(at_mortar, vals[parent])


def test_update_secondary_refined():
    mdg = _mdg()
    intf = list(mdg.interfaces())[0]
    _, sd_l = mdg.interface_to_subdomain_pair(intf)
    new_l = refine_grid_1d(sd_l, ratio=3)
    new_l.compute_geometry()
    intf.update_secondary(new_l, tol=1e-6)
    P = intf.secondary_to_mortar_avg()
    assert P.shape == (intf.num_cells, new_l.num_cells)
    assert np.allclose(np.asarray(P.sum(axis=1)).ravel(), 1.0)
    # Integrated: mortar cell integrals match overlap lengths.
    P_int = intf.secondary_to_mortar_int()
    vols = P_int @ new_l.cell_volumes
    assert np.allclose(vols.sum(), intf.cell_volumes.sum())


def test_update_primary_renumbered_faces():
    mdg = _mdg()
    intf = list(mdg.interfaces())[0]
    sd_h, _ = mdg.interface_to_subdomain_pair(intf)
    old = intf.primary_to_mortar_int().copy()
    # "Replace" the primary with itself (identical geometry, same order).
    intf.update_primary(sd_h, sd_h, tol=1e-8)
    new = intf.primary_to_mortar_int()
    assert (abs(old - new)).nnz == 0
