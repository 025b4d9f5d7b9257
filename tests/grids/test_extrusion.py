"""Grid extrusion (2d->3d prismatic etc.) vs reference (golden-backed)."""

import numpy as np

import porepy_tpu as pt
from porepy_tpu.grids import grid_extrusion as my_e
from tests.conftest import assert_sparse_equal

Z = np.array([0.0, 0.5, 1.0, 2.0])

_TAG_KEYS = ("fracture_faces", "tip_faces", "domain_boundary_faces")


def test_extrude_cart_2d(golden):
    g = pt.CartGrid([3, 2], [1.0, 1.0])
    g.compute_geometry()
    hm, cm, fm = my_e.extrude_grid(g, Z)

    def compute(ref_pp):
        import porepy.grids.grid_extrusion as re_

        gr = ref_pp.CartGrid(np.array([3, 2]), np.array([1.0, 1.0]))
        gr.compute_geometry()
        hr, cr, fr = re_.extrude_grid(gr, Z)
        out = {
            "counts": np.array([hr.num_cells, hr.num_faces]),
            "nodes": np.asarray(hr.nodes),
            "cell_volumes": np.asarray(hr.cell_volumes),
            "cell_faces": hr.cell_faces,
        }
        for key in _TAG_KEYS:
            out[f"tag.{key}"] = np.asarray(hr.tags[key])
        for i, a in enumerate(cr):
            out[f"cmap{i}"] = np.asarray(a)
        return out

    rec = golden(compute)
    assert hm.num_cells == int(rec["counts"][0])
    assert hm.num_faces == int(rec["counts"][1])
    assert np.allclose(hm.nodes, rec["nodes"])
    assert np.allclose(hm.cell_volumes, rec["cell_volumes"])
    assert_sparse_equal(hm.cell_faces, rec["cell_faces"])
    for key in _TAG_KEYS:
        assert np.array_equal(hm.tags[key], rec[f"tag.{key}"])
    for i, a in enumerate(cm):
        assert np.array_equal(a, rec[f"cmap{i}"])


def test_extrude_triangles_and_1d(golden):
    g = pt.StructuredTriangleGrid([2, 2], [1.0, 1.0])
    g.compute_geometry()
    hm, _, _ = my_e.extrude_grid(g, Z)
    g1 = pt.TensorGrid(np.array([0.0, 0.4, 1.0]))
    g1.compute_geometry()
    h1m, _, _ = my_e.extrude_grid(g1, Z)

    def compute(ref_pp):
        import porepy.grids.grid_extrusion as re_

        gr = ref_pp.StructuredTriangleGrid(np.array([2, 2]), np.array([1.0, 1.0]))
        gr.compute_geometry()
        hr, _, _ = re_.extrude_grid(gr, Z)
        gr1 = ref_pp.TensorGrid(np.array([0.0, 0.4, 1.0]))
        gr1.compute_geometry()
        h1r, _, _ = re_.extrude_grid(gr1, Z)
        return {
            "tri.cell_volumes": np.asarray(hr.cell_volumes),
            "tri.face_areas": np.asarray(hr.face_areas),
            "t1.nodes": np.asarray(h1r.nodes),
            "t1.cell_faces": h1r.cell_faces,
        }

    rec = golden(compute)
    assert np.allclose(hm.cell_volumes, rec["tri.cell_volumes"])
    assert np.allclose(hm.face_areas, rec["tri.face_areas"])
    assert np.allclose(h1m.nodes, rec["t1.nodes"])
    assert_sparse_equal(h1m.cell_faces, rec["t1.cell_faces"])


def test_extrude_fractured_mdg(golden):
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
    em.compute_geometry()

    def compute(ref_pp):
        import porepy.grids.grid_extrusion as re_

        er, _ = re_.extrude_mdg(make(ref_pp), Z)
        er.compute_geometry()
        ir = er.interfaces()[0]
        return {
            "sd_cells": np.array([s.num_cells for s in er.subdomains()]),
            "intf": np.array([ir.num_cells, ir.num_sides()]),
            "m2s": ir.mortar_to_secondary_int(),
            "p2m": ir.primary_to_mortar_int(),
        }

    rec = golden(compute)
    assert [s.num_cells for s in em.subdomains()] == list(rec["sd_cells"])
    im = em.interfaces()[0]
    assert im.num_cells == int(rec["intf"][0])
    assert im.num_sides() == int(rec["intf"][1]) == 2
    assert_sparse_equal(im.mortar_to_secondary_int(), rec["m2s"])
    assert_sparse_equal(im.primary_to_mortar_int(), rec["p2m"])
