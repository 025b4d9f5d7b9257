"""Grid refinement utilities vs reference (golden-backed record/replay)."""

import numpy as np

import porepy_tpu as pt
from porepy_tpu.grids import refinement as my_r


def test_refine_grid_1d(golden):
    g = pt.TensorGrid(np.array([0, 0.3, 0.7, 1.0]))
    g.compute_geometry()
    hm = my_r.refine_grid_1d(g, 3)

    def compute(ref_pp):
        import porepy.grids.refinement as rr

        gr = ref_pp.TensorGrid(np.array([0, 0.3, 0.7, 1.0]))
        gr.compute_geometry()
        hr = rr.refine_grid_1d(gr, 3)
        return {
            "num_cells": np.array([hr.num_cells]),
            "nodes_sorted": np.sort(hr.nodes[0]),
            "cell_centers": np.asarray(hr.cell_centers),
        }

    rec = golden(compute)
    assert hm.num_cells == int(rec["num_cells"][0])
    assert np.allclose(np.sort(hm.nodes[0]), rec["nodes_sorted"])
    assert np.allclose(hm.cell_centers, rec["cell_centers"])


def test_refine_triangle_grid(golden):
    g = pt.StructuredTriangleGrid([2, 2], [1.0, 1.0])
    g.compute_geometry()
    hm, pm = my_r.refine_triangle_grid(g)
    hm.compute_geometry()

    def compute(ref_pp):
        import porepy.grids.refinement as rr

        gr = ref_pp.StructuredTriangleGrid(np.array([2, 2]), np.array([1.0, 1.0]))
        gr.compute_geometry()
        hr, pr = rr.refine_triangle_grid(gr)
        hr.compute_geometry()
        return {
            "num_cells": np.array([hr.num_cells]),
            "parent": np.asarray(pr),
            "nodes": np.asarray(hr.nodes),
            "vols_sorted": np.sort(hr.cell_volumes),
        }

    rec = golden(compute)
    assert hm.num_cells == int(rec["num_cells"][0]) == 4 * g.num_cells
    assert np.array_equal(pm, rec["parent"])
    assert np.allclose(hm.nodes, rec["nodes"])
    assert np.allclose(np.sort(hm.cell_volumes), rec["vols_sorted"])


def test_remesh_1d(golden):
    g = pt.TensorGrid(np.array([0, 0.3, 0.7, 1.0]))
    g.compute_geometry()

    def compute(ref_pp):
        import porepy.grids.refinement as rr

        gr = ref_pp.TensorGrid(np.array([0, 0.3, 0.7, 1.0]))
        gr.compute_geometry()
        return {"nodes": np.asarray(rr.remesh_1d(gr, 7).nodes)}

    rec = golden(compute)
    assert np.allclose(my_r.remesh_1d(g, 7).nodes, rec["nodes"])


def test_structured_refinement_mapping():
    """Coarse-to-fine map on a generic (non-symmetric) triangulation: each
    fine cell maps to the parent from the refinement."""
    rng = np.random.default_rng(7)
    p = rng.random((2, 12))
    g = pt.TriangleGrid(p)
    g.compute_geometry()
    h, parent = my_r.refine_triangle_grid(g)
    h.compute_geometry()
    mapping = my_r.structured_refinement(g, h)
    assert mapping.shape == (h.num_cells, g.num_cells)
    rows, cols = mapping.nonzero()
    assert rows.size == h.num_cells  # every fine cell mapped exactly once
    # Geometric check: each mapped fine centroid lies in its coarse cell.
    from porepy_tpu.geometry.geometry_property_checks import point_in_polygon

    cn = g.cell_nodes().tocsc()
    for fine, coarse in zip(rows[:20], cols[:20]):
        ni = cn.indices[cn.indptr[coarse] : cn.indptr[coarse + 1]]
        assert point_in_polygon(
            g.nodes[:2, ni], h.cell_centers[:2, fine]
        )[0]


def test_distort_grid_1d_keeps_topology():
    g = pt.TensorGrid(np.linspace(0, 1, 8))
    g.compute_geometry()
    np.random.seed(0)
    g = my_r.distort_grid_1d(g, ratio=0.3)
    assert np.all(np.diff(g.nodes[0]) > 0)
    assert np.isclose(g.nodes[0, 0], 0) and np.isclose(g.nodes[0, -1], 1)
