"""Tests for wells: fracture intersections, meshing into an mdg, and the
codim-2 well-matrix coupling."""

import numpy as np
import pytest

import porepy_tpu as pt
from porepy_tpu.applications.md_grids.domains import unit_cube_domain
from porepy_tpu.fracs import wells_3d
from porepy_tpu.fracs.fracture import PlaneFracture
from porepy_tpu.fracs.wells_3d import (
    Well,
    WellNetwork3d,
    compute_well_fracture_intersections,
    compute_well_rock_matrix_intersections,
)

# Horizontal unit-square fractures at conforming heights for a cartesian mdg.
FRACTURE_COORDS = [
    np.array([[0, 1, 1, 0], [1, 1, 0, 0], [0.5, 0.5, 0.5, 0.5]]),
    np.array([[0, 1, 1, 0], [1, 1, 0, 0], [0.75, 0.75, 0.75, 0.75]]),
    np.array([[0, 1, 1, 0], [1, 1, 0, 0], [0.25, 0.25, 0.25, 0.25]]),
]
# Vertical well from the top boundary: well 0 ends at z=0.25 (on fracture 2),
# well 1 ends at z=0.6 (strictly inside).
WELL_COORDS = [
    np.array([[0.4, 0.4], [0.4, 0.4], [1, 0.25]]),
    np.array([[0.6, 0.6], [0.6, 0.6], [1, 0.6]]),
]


def _make_mdg(fracture_indices, well_indices):
    fractures = [PlaneFracture(FRACTURE_COORDS[i]) for i in fracture_indices]
    network = pt.create_fracture_network(fractures, unit_cube_domain(3))
    mdg = pt.create_mdg(
        "cartesian", {"cell_size": 0.25}, network
    )
    wells = [Well(WELL_COORDS[i]) for i in well_indices]
    well_network = WellNetwork3d(
        unit_cube_domain(3), wells, parameters={"mesh_size": 1}
    )
    compute_well_fracture_intersections(well_network, network)
    well_network.mesh(mdg)
    return mdg, well_network


def test_intersection_tags():
    """Intersection points are inserted into the polyline and tagged."""
    fractures = [PlaneFracture(FRACTURE_COORDS[i]) for i in (0, 2)]
    network = pt.create_fracture_network(fractures, unit_cube_domain(3))
    well = Well(WELL_COORDS[0])
    wn = WellNetwork3d(unit_cube_domain(3), [well], parameters={"mesh_size": 1})
    compute_well_fracture_intersections(wn, network)
    # Original endpoints plus the internal crossing of fracture 0 at z=0.5;
    # the endpoint itself lies on fracture 2 (index 1 in this network).
    assert well.pts.shape == (3, 3)
    assert np.allclose(well.pts[2], [1.0, 0.5, 0.25])
    tags = well.tags["intersecting_fractures"]
    assert tags[0].size == 0
    assert tags[1].size == 1 and tags[1][0] == 0
    assert tags[2].size == 1 and tags[2][0] == 1


def test_intersection_parity_with_reference():
    """Well-fracture intersections match the reference bit for bit."""
    from tools.refshim import pp

    tilted = np.array([[0.3, 0.7], [0.3, 0.8], [1, 0.15]])
    mine_well = Well(tilted)
    ref_well = pp.Well(tilted)
    for impl, wellnet_cls, frac_cls, netfun, well in (
        ("mine", WellNetwork3d, PlaneFracture, pt.create_fracture_network, mine_well),
        ("ref", pp.WellNetwork3d, pp.PlaneFracture, pp.create_fracture_network, ref_well),
    ):
        fracs = [frac_cls(c) for c in FRACTURE_COORDS]
        if impl == "mine":
            net = netfun(fracs, unit_cube_domain(3))
            wn = wellnet_cls(unit_cube_domain(3), [well], parameters={"mesh_size": 1})
            compute_well_fracture_intersections(wn, net)
        else:
            dom = pp.Domain(
                {"xmin": 0, "xmax": 1, "ymin": 0, "ymax": 1, "zmin": 0, "zmax": 1}
            )
            net = netfun(fracs, dom)
            # The reference sets the boundary tags inside mesh() (gmsh);
            # provide them directly here.
            net.tags["boundary"] = [False] * len(fracs)
            wn = wellnet_cls(dom, [well], parameters={"mesh_size": 1})
            pp.fracs.wells_3d.compute_well_fracture_intersections(wn, net)
    assert np.allclose(mine_well.pts, ref_well.pts)
    t_m = mine_well.tags["intersecting_fractures"]
    t_r = ref_well.tags["intersecting_fractures"]
    assert len(t_m) == len(t_r)
    for a, b in zip(t_m, t_r):
        assert np.array_equal(np.atleast_1d(a), np.atleast_1d(b))


@pytest.mark.parametrize(
    "fracture_indices, fracture_faces, tip_faces",
    [
        # Single internal fracture: two well grids, lower one a tip.
        ([0], [[0, 1], [1, 0]], [[0, 0], [0, 1]]),
        # Fracture at the well endpoint: one well grid, no tip.
        ([2], [[0, 1]], [[0, 0]]),
        # Two internal + endpoint fracture: three well grids.
        ([1, 0, 2], [[0, 1], [1, 1], [1, 1]], [[0, 0], [0, 0], [0, 0]]),
    ],
)
def test_add_one_well(fracture_indices, fracture_faces, tip_faces):
    mdg, _ = _make_mdg(fracture_indices, [0])
    n_frac = len(fracture_indices)
    n_int = sum(1 for i in fracture_indices if i in (0, 1))
    n_end = int(2 in fracture_indices)
    # 1 matrix + n_frac fractures + well grids + 0d intersections.
    n_well_grids = n_int + (1 if not n_end else n_end)
    assert mdg.num_subdomains() == 1 + n_frac + n_well_grids + (n_int + n_end)
    # matrix-fracture + fracture-0d + well-0d interfaces.
    assert mdg.num_interfaces() == n_frac + (n_int + n_end) + (2 * n_int + n_end)

    boundary_faces = [[1, 0], [0, 0], [0, 0]]
    for ind, wg in enumerate(mdg.subdomains(dim=1)):
        assert np.array_equal(wg.tags["fracture_faces"], fracture_faces[ind])
        assert np.array_equal(wg.tags["tip_faces"], tip_faces[ind])
        assert np.array_equal(
            wg.tags["domain_boundary_faces"], boundary_faces[ind]
        )
        assert wg.tags["parent_well_index"] == 0
        assert hasattr(wg, "well_num")


def test_add_two_wells():
    mdg, _ = _make_mdg([0], [0, 1])
    # Grids: 1 matrix, 1 fracture, 2 well grids (well 0 split by fracture 0) +
    # 1 well grid (well 1 ends below fracture... at z=0.6 above 0.5? no:
    # well 1 spans z in [0.6, 1], which does not cross z=0.5), and 1
    # intersection point.
    assert mdg.num_subdomains() == 1 + 1 + 3 + 1
    # Interfaces: 1 matrix-fracture, 1 fracture-0d, 2 well-0d.
    assert mdg.num_interfaces() == 1 + 1 + 2
    # Well 1 has an internal tip at its lower end.
    well_grids = mdg.subdomains(dim=1)
    tips = [wg.tags["tip_faces"].tolist() for wg in well_grids]
    assert [0, 1] in tips


def test_well_rock_matrix_intersections():
    mdg, _ = _make_mdg([], [1])
    compute_well_rock_matrix_intersections(mdg)
    assert mdg.num_subdomains() == 2
    assert mdg.num_interfaces() == 1
    intf = mdg.interfaces()[0]
    assert intf.codim == 3 - 1
    assert intf.num_sides() == 1
    assert np.allclose(intf.mortar_to_secondary_int().toarray(), 1.0)
    # The single well segment spans z in [0.6, 1] -> in-cell length fractions
    # must sum to 1 over the traversed matrix cells.
    weights = intf.mortar_to_primary_int().toarray()
    assert np.isclose(weights.sum(), 1.0)
    # Cells z in (0.75,1) carry 0.625 of the segment, the (0.5,0.75) cell
    # carries 0.375.
    assert np.isclose(np.sort(weights[weights > 0])[-1], 0.625)

    # The new well boundary grid is initialized with the boundary face.
    bgs = mdg.boundaries(dim=0)
    assert len(bgs) == 1
    assert bgs[0].num_cells == 1
