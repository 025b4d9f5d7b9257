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


def test_match_grids_along_1d_mortar_nested():
    """Nested 2d refinement along a fracture: each old segment face overlaps
    exactly two new faces with half its length (reference
    ``grids/match_grids.py:234``)."""
    from porepy_tpu.fracs import meshing
    from porepy_tpu.grids.match_grids import match_grids_along_1d_mortar

    frac = [np.array([[0.25, 0.75], [0.5, 0.5]])]
    mdg_old = meshing.cart_grid(frac, np.array([4, 4]), physdims=[1.0, 1.0])
    mdg_new = meshing.cart_grid(frac, np.array([8, 8]), physdims=[1.0, 1.0])
    g_old = mdg_old.subdomains(dim=2)[0]
    g_new = mdg_new.subdomains(dim=2)[0]
    intf = list(mdg_old.interfaces())[0]

    m_int = match_grids_along_1d_mortar(
        intf, g_new, g_old, tol=1e-8, scaling="integrated"
    )
    faces_old = np.unique(intf._primary_to_mortar_int.tocoo().col)
    rowsum = np.asarray(m_int.sum(axis=1)).ravel()
    # Reference convention (verified against the reference implementation
    # on these exact grids): integrated weights are 1 per overlapping new
    # face, averaged weights split the old face between them.
    assert np.allclose(rowsum[faces_old], 2.0)
    # Off-segment faces map to nothing.
    off = np.setdiff1d(np.arange(g_old.num_faces), faces_old)
    assert np.allclose(rowsum[off], 0.0)
    # Each old face picks up exactly two new faces (nested refinement).
    counts = np.diff(m_int.indptr)
    assert np.all(counts[faces_old] == 2)

    m_avg = match_grids_along_1d_mortar(
        intf, g_new, g_old, tol=1e-8, scaling="averaged"
    )
    assert np.allclose(
        np.asarray(m_avg.sum(axis=1)).ravel()[faces_old], 1.0
    )


# -- mdg-level replacement (reference ``grids/md_grid.py:700``) ----------------


def _copy_2d(sd):
    new = sd.copy()
    new.compute_geometry()
    return new


def test_replace_2d_grid_identical_copy():
    """Replacing the primary with an identical copy keeps projections and
    swaps the registered subdomain + boundary grid."""
    mdg = _mdg()
    intf = list(mdg.interfaces())[0]
    sd_old, _ = mdg.interface_to_subdomain_pair(intf)
    bg_old = mdg.subdomain_to_boundary_grid(sd_old)
    old = intf.primary_to_mortar_avg().toarray()
    sd_new = _copy_2d(sd_old)
    mdg.replace_subdomains_and_interfaces(sd_map={sd_old: sd_new})
    assert sd_old not in mdg and sd_new in mdg
    assert bg_old not in mdg
    assert mdg.subdomain_to_boundary_grid(sd_new) is not None
    assert np.allclose(intf.primary_to_mortar_avg().toarray(), old)
    assert mdg.interface_to_subdomain_pair(intf)[0] is sd_new


def test_replace_2d_grid_refined_nonmatching():
    """Replacing the primary with a refined (non-matching) grid tessellates
    the mortar line: averaged projections stay a partition of unity and
    each mortar cell draws from exactly the two child faces."""
    frac = [np.array([[0.25, 0.75], [0.5, 0.5]])]
    mdg = meshing.cart_grid(frac, np.array([4, 4]), physdims=[1.0, 1.0])
    mdg_fine = meshing.cart_grid(frac, np.array([8, 8]), physdims=[1.0, 1.0])
    intf = list(mdg.interfaces())[0]
    sd_old, _ = mdg.interface_to_subdomain_pair(intf)
    sd_new = mdg_fine.subdomains(dim=2)[0]
    mdg.replace_subdomains_and_interfaces(sd_map={sd_old: sd_new})
    P = intf.primary_to_mortar_avg()
    assert P.shape == (intf.num_cells, sd_new.num_faces)
    assert np.allclose(np.asarray(P.sum(axis=1)).ravel(), 1.0)
    counts = np.diff(P.tocsr().indptr)
    assert np.all(counts == 2)
    # A linear-in-x face field projects exactly onto the mortar centers.
    fx = sd_new.face_centers[0]
    proj = P @ fx
    assert np.allclose(proj, intf.cell_centers[0])


def test_replace_1d_secondary_refined():
    mdg = _mdg()
    intf = list(mdg.interfaces())[0]
    _, sd_old = mdg.interface_to_subdomain_pair(intf)
    sd_new = refine_grid_1d(sd_old, ratio=2)
    sd_new.compute_geometry()
    mdg.replace_subdomains_and_interfaces(sd_map={sd_old: sd_new})
    assert mdg.interface_to_subdomain_pair(intf)[1] is sd_new
    P = intf.secondary_to_mortar_avg()
    assert P.shape == (intf.num_cells, sd_new.num_cells)
    assert np.allclose(np.asarray(P.sum(axis=1)).ravel(), 1.0)


def test_replace_interface_side_grids():
    mdg = _mdg()
    intf = list(mdg.interfaces())[0]
    n_old = intf.num_cells
    new_sides = {
        side: refine_grid_1d(g, ratio=2) for side, g in intf.side_grids.items()
    }
    for g in new_sides.values():
        g.compute_geometry()
    mdg.replace_subdomains_and_interfaces(interface_map={intf: new_sides})
    assert intf.num_cells == 2 * n_old
    for P in (intf.primary_to_mortar_avg(), intf.secondary_to_mortar_avg()):
        assert np.allclose(np.asarray(P.sum(axis=1)).ravel(), 1.0)
