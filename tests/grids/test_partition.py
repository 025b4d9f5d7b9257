"""Grid partitioning and subgrid extraction vs reference (golden-backed)."""

import numpy as np
import pytest

import porepy_tpu as pt
from porepy_tpu.grids import partition as my_p
from tests.conftest import assert_sparse_equal


@pytest.fixture
def grid():
    g = pt.CartGrid([6, 4], physdims=[1, 1])
    g.compute_geometry()
    return g


_COARSE_TARGETS = (2, 3, 5, 6, 7, 11, 24)


def test_coarse_dimensions_and_partitions(golden, grid):
    def compute(ref_pp):
        import porepy.grids.partition as rp

        gr = ref_pp.CartGrid(np.array([6, 4]), np.array([1.0, 1.0]))
        gr.compute_geometry()
        gr3 = ref_pp.CartGrid(np.array([4, 3, 5]))
        gr3.compute_geometry()
        out = {
            f"coarse{t}": rp.determine_coarse_dimensions(t, np.array([6, 4]))
            for t in _COARSE_TARGETS
        }
        out["structured"] = rp.partition_structured(gr, num_part=6)
        out["coords"] = rp.partition_coordinates(gr, 6)
        out["structured3"] = rp.partition_structured(gr3, num_part=8)
        return out

    rec = golden(compute)
    for t in _COARSE_TARGETS:
        assert np.array_equal(
            my_p.determine_coarse_dimensions(t, np.array([6, 4])),
            rec[f"coarse{t}"],
        ), t
    assert np.array_equal(
        my_p.partition_structured(grid, num_part=6), rec["structured"]
    )
    assert np.array_equal(my_p.partition_coordinates(grid, 6), rec["coords"])
    g3 = pt.CartGrid([4, 3, 5])
    g3.compute_geometry()
    assert np.array_equal(
        my_p.partition_structured(g3, num_part=8), rec["structured3"]
    )


def test_extract_subgrid(golden, grid):
    ci = np.array([0, 1, 2, 6, 7, 8])
    f = np.where(grid.face_centers[1] < 1e-10)[0]
    g3 = pt.CartGrid([3, 3, 3], physdims=[1, 1, 1])
    g3.compute_geometry()
    f3 = np.where(g3.face_centers[2] < 1e-10)[0]

    def compute(ref_pp):
        import porepy.grids.partition as rp

        gr = ref_pp.CartGrid(np.array([6, 4]), np.array([1.0, 1.0]))
        gr.compute_geometry()
        hr, fr, nr = rp.extract_subgrid(gr, ci)
        h1r, _, _ = rp.extract_subgrid(gr, f, faces=True)
        gr3 = ref_pp.CartGrid(np.array([3, 3, 3]), np.array([1.0, 1.0, 1.0]))
        gr3.compute_geometry()
        h2r, _, _ = rp.extract_subgrid(gr3, f3, faces=True)
        return {
            "num_cells": np.array([hr.num_cells]),
            "faces": np.asarray(fr),
            "nodes_idx": np.asarray(nr),
            "cell_faces": hr.cell_faces,
            "nodes": np.asarray(hr.nodes),
            "h1_cells": np.array([h1r.num_cells]),
            "h1_centers": np.asarray(h1r.cell_centers),
            "h2_cells": np.array([h2r.num_cells]),
            "h2_vols_sorted": np.sort(h2r.cell_volumes),
        }

    rec = golden(compute)
    hm, fm, nm = my_p.extract_subgrid(grid, ci)
    assert hm.num_cells == int(rec["num_cells"][0])
    assert np.array_equal(fm, rec["faces"])
    assert np.array_equal(nm, rec["nodes_idx"])
    assert_sparse_equal(hm.cell_faces, rec["cell_faces"])
    assert np.allclose(hm.nodes, rec["nodes"])

    # Faces of a 2d grid -> 1d grid.
    h1m, _, _ = my_p.extract_subgrid(grid, f, faces=True)
    assert h1m.num_cells == int(rec["h1_cells"][0])
    assert np.allclose(h1m.cell_centers, rec["h1_centers"])

    # Faces of a 3d grid -> 2d grid.
    h2m, _, _ = my_p.extract_subgrid(g3, f3, faces=True)
    assert h2m.num_cells == int(rec["h2_cells"][0])
    assert np.allclose(np.sort(h2m.cell_volumes), rec["h2_vols_sorted"])


def test_overlap_and_connectivity(golden, grid):
    def compute(ref_pp):
        import porepy.grids.partition as rp

        gr = ref_pp.CartGrid(np.array([6, 4]), np.array([1.0, 1.0]))
        gr.compute_geometry()
        return {
            "ov1": rp.overlap(gr, np.array([0, 1]), 1),
            "ov2": rp.overlap(gr, np.array([0, 1]), 2, criterion="face"),
        }

    rec = golden(compute)
    assert np.array_equal(my_p.overlap(grid, np.array([0, 1]), 1), rec["ov1"])
    assert np.array_equal(
        my_p.overlap(grid, np.array([0, 1]), 2, criterion="face"), rec["ov2"]
    )
    ok, comps = my_p.grid_is_connected(grid)
    assert ok and len(comps) == 1
    # Two disconnected cell sets.
    ok, comps = my_p.grid_is_connected(grid, np.array([0, 1, 22, 23]))
    assert not ok and len(comps) == 2
