"""Grid partitioning and subgrid extraction vs reference."""

import numpy as np
import pytest

import porepy_tpu as pt
from porepy_tpu.grids import partition as my_p
from tests.conftest import requires_reference


@pytest.fixture
def grids(ref_pp):
    g = pt.CartGrid([6, 4], physdims=[1, 1])
    g.compute_geometry()
    gr = ref_pp.CartGrid(np.array([6, 4]), np.array([1.0, 1.0]))
    gr.compute_geometry()
    return g, gr


@requires_reference
def test_coarse_dimensions_and_partitions(ref_pp, grids):
    import porepy.grids.partition as rp

    g, gr = grids
    for t in (2, 3, 5, 6, 7, 11, 24):
        assert np.array_equal(
            my_p.determine_coarse_dimensions(t, np.array([6, 4])),
            rp.determine_coarse_dimensions(t, np.array([6, 4])),
        ), t
    assert np.array_equal(
        my_p.partition_structured(g, num_part=6),
        rp.partition_structured(gr, num_part=6),
    )
    assert np.array_equal(
        my_p.partition_coordinates(g, 6), rp.partition_coordinates(gr, 6)
    )
    g3 = pt.CartGrid([4, 3, 5])
    g3.compute_geometry()
    gr3 = ref_pp.CartGrid(np.array([4, 3, 5]))
    gr3.compute_geometry()
    assert np.array_equal(
        my_p.partition_structured(g3, num_part=8),
        rp.partition_structured(gr3, num_part=8),
    )


@requires_reference
def test_extract_subgrid(ref_pp, grids):
    import porepy.grids.partition as rp

    g, gr = grids
    ci = np.array([0, 1, 2, 6, 7, 8])
    hm, fm, nm = my_p.extract_subgrid(g, ci)
    hr, fr, nr = rp.extract_subgrid(gr, ci)
    assert hm.num_cells == hr.num_cells
    assert np.array_equal(fm, fr)
    assert np.array_equal(nm, nr)
    assert abs(hm.cell_faces - hr.cell_faces).nnz == 0
    assert np.allclose(hm.nodes, hr.nodes)

    # Faces of a 2d grid -> 1d grid.
    f = np.where(g.face_centers[1] < 1e-10)[0]
    h1m, _, _ = my_p.extract_subgrid(g, f, faces=True)
    h1r, _, _ = rp.extract_subgrid(gr, f, faces=True)
    assert h1m.num_cells == h1r.num_cells
    assert np.allclose(h1m.cell_centers, h1r.cell_centers)

    # Faces of a 3d grid -> 2d grid.
    g3 = pt.CartGrid([3, 3, 3], physdims=[1, 1, 1])
    g3.compute_geometry()
    gr3 = ref_pp.CartGrid(np.array([3, 3, 3]), np.array([1.0, 1.0, 1.0]))
    gr3.compute_geometry()
    f3 = np.where(g3.face_centers[2] < 1e-10)[0]
    h2m, _, _ = my_p.extract_subgrid(g3, f3, faces=True)
    h2r, _, _ = rp.extract_subgrid(gr3, f3, faces=True)
    assert h2m.num_cells == h2r.num_cells
    assert np.allclose(
        np.sort(h2m.cell_volumes), np.sort(h2r.cell_volumes)
    )


@requires_reference
def test_overlap_and_connectivity(ref_pp, grids):
    import porepy.grids.partition as rp

    g, gr = grids
    assert np.array_equal(
        my_p.overlap(g, np.array([0, 1]), 1),
        rp.overlap(gr, np.array([0, 1]), 1),
    )
    assert np.array_equal(
        my_p.overlap(g, np.array([0, 1]), 2, criterion="face"),
        rp.overlap(gr, np.array([0, 1]), 2, criterion="face"),
    )
    ok, comps = my_p.grid_is_connected(g)
    assert ok and len(comps) == 1
    # Two disconnected cell sets.
    ok, comps = my_p.grid_is_connected(g, np.array([0, 1, 22, 23]))
    assert not ok and len(comps) == 2
