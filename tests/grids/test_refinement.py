"""Grid refinement utilities vs reference."""

import numpy as np
import pytest

import porepy_tpu as pt
from porepy_tpu.grids import refinement as my_r
from tests.conftest import requires_reference


@requires_reference
def test_refine_grid_1d(ref_pp):
    import porepy.grids.refinement as rr

    g = pt.TensorGrid(np.array([0, 0.3, 0.7, 1.0]))
    g.compute_geometry()
    gr = ref_pp.TensorGrid(np.array([0, 0.3, 0.7, 1.0]))
    gr.compute_geometry()
    hm = my_r.refine_grid_1d(g, 3)
    hr = rr.refine_grid_1d(gr, 3)
    assert hm.num_cells == hr.num_cells
    assert np.allclose(np.sort(hm.nodes[0]), np.sort(hr.nodes[0]))
    assert np.allclose(hm.cell_centers, hr.cell_centers)


@requires_reference
def test_refine_triangle_grid(ref_pp):
    import porepy.grids.refinement as rr

    g = pt.StructuredTriangleGrid([2, 2], [1.0, 1.0])
    g.compute_geometry()
    gr = ref_pp.StructuredTriangleGrid(np.array([2, 2]), np.array([1.0, 1.0]))
    gr.compute_geometry()
    hm, pm = my_r.refine_triangle_grid(g)
    hr, pr = rr.refine_triangle_grid(gr)
    hm.compute_geometry()
    hr.compute_geometry()
    assert hm.num_cells == hr.num_cells == 4 * g.num_cells
    assert np.array_equal(pm, pr)
    assert np.allclose(hm.nodes, hr.nodes)
    assert np.allclose(np.sort(hm.cell_volumes), np.sort(hr.cell_volumes))


@requires_reference
def test_remesh_1d(ref_pp):
    import porepy.grids.refinement as rr

    g = pt.TensorGrid(np.array([0, 0.3, 0.7, 1.0]))
    g.compute_geometry()
    gr = ref_pp.TensorGrid(np.array([0, 0.3, 0.7, 1.0]))
    gr.compute_geometry()
    assert np.allclose(
        my_r.remesh_1d(g, 7).nodes, rr.remesh_1d(gr, 7).nodes
    )


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
