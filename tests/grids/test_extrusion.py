"""Grid extrusion (2d->3d prismatic etc.) vs reference."""

import numpy as np
import pytest

import porepy_tpu as pt
from porepy_tpu.grids import grid_extrusion as my_e
from tests.conftest import requires_reference

Z = np.array([0.0, 0.5, 1.0, 2.0])


@requires_reference
def test_extrude_cart_2d(ref_pp):
    import porepy.grids.grid_extrusion as re_

    g = pt.CartGrid([3, 2], [1.0, 1.0])
    g.compute_geometry()
    gr = ref_pp.CartGrid(np.array([3, 2]), np.array([1.0, 1.0]))
    gr.compute_geometry()
    hm, cm, fm = my_e.extrude_grid(g, Z)
    hr, cr, fr = re_.extrude_grid(gr, Z)
    assert hm.num_cells == hr.num_cells
    assert hm.num_faces == hr.num_faces
    assert np.allclose(hm.nodes, hr.nodes)
    assert np.allclose(hm.cell_volumes, hr.cell_volumes)
    assert abs(hm.cell_faces - hr.cell_faces).nnz == 0
    for key in ("fracture_faces", "tip_faces", "domain_boundary_faces"):
        assert np.array_equal(hm.tags[key], hr.tags[key])
    for a, b in zip(cm, cr):
        assert np.array_equal(a, b)


@requires_reference
def test_extrude_triangles_and_1d(ref_pp):
    import porepy.grids.grid_extrusion as re_

    g = pt.StructuredTriangleGrid([2, 2], [1.0, 1.0])
    g.compute_geometry()
    gr = ref_pp.StructuredTriangleGrid(np.array([2, 2]), np.array([1.0, 1.0]))
    gr.compute_geometry()
    hm, _, _ = my_e.extrude_grid(g, Z)
    hr, _, _ = re_.extrude_grid(gr, Z)
    assert np.allclose(hm.cell_volumes, hr.cell_volumes)
    assert np.allclose(hm.face_areas, hr.face_areas)

    g1 = pt.TensorGrid(np.array([0.0, 0.4, 1.0]))
    g1.compute_geometry()
    gr1 = ref_pp.TensorGrid(np.array([0.0, 0.4, 1.0]))
    gr1.compute_geometry()
    h1m, _, _ = my_e.extrude_grid(g1, Z)
    h1r, _, _ = re_.extrude_grid(gr1, Z)
    assert np.allclose(h1m.nodes, h1r.nodes)
    assert abs(h1m.cell_faces - h1r.cell_faces).nnz == 0


@requires_reference
def test_extrude_fractured_mdg(ref_pp):
    import porepy.grids.grid_extrusion as re_

    def make(mod):
        return mod.create_mdg(
            "cartesian",
            {"cell_size": 0.5},
            mod.create_fracture_network(
                [mod.LineFracture(np.array([[0.0, 1.0], [0.5, 0.5]]))],
                mod.Domain({"xmin": 0, "xmax": 1, "ymin": 0, "ymax": 1}),
            ),
        )

    em, _ = my_e.extrude_mdg(make(pt), Z)
    er, _ = re_.extrude_mdg(make(ref_pp), Z)
    em.compute_geometry()
    er.compute_geometry()
    assert [s.num_cells for s in em.subdomains()] == [
        s.num_cells for s in er.subdomains()
    ]
    im, ir = em.interfaces()[0], er.interfaces()[0]
    assert im.num_cells == ir.num_cells
    assert im.num_sides() == ir.num_sides() == 2
    assert abs(im.mortar_to_secondary_int() - ir.mortar_to_secondary_int()).nnz == 0
    assert abs(im.primary_to_mortar_int() - ir.primary_to_mortar_int()).nnz == 0
