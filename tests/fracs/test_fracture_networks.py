"""Fracture primitives and networks (2d and 3d) vs the reference."""

import numpy as np
import pytest

import porepy_tpu as pt


def test_fracture_primitives_parity(golden):
    pts = np.array([[0, 1, 1, 0], [0, 0, 1, 1], [0, 0, 1, 1.0]])[:, [2, 0, 3, 1]]

    def compute(ref_pp):
        f_r = ref_pp.LineFracture(np.array([[0.0, 1.0], [0.5, 0.5]]))
        pf_r = ref_pp.PlaneFracture(pts.copy())
        e_r = ref_pp.create_elliptic_fracture(
            np.array([0.0, 1, 0]), 2, 1, np.pi / 4, np.pi / 6, np.pi / 3,
            num_points=8,
        )
        return {
            "line_pts": f_r.pts,
            "line_normal": np.asarray(f_r.normal).ravel(),
            "line_length": np.array([f_r.length()]),
            "plane_pts": pf_r.pts,
            "plane_center": np.asarray(pf_r.center).ravel(),
            "ellipse_pts": e_r.pts,
        }

    ref = golden(compute)
    f_m = pt.LineFracture(np.array([[0.0, 1.0], [0.5, 0.5]]))
    assert np.allclose(f_m.pts, ref["line_pts"])
    assert np.allclose(f_m.normal.ravel(), ref["line_normal"])
    assert f_m.length() == ref["line_length"][0]
    pf_m = pt.PlaneFracture(pts.copy())
    assert np.allclose(pf_m.pts, ref["plane_pts"])  # sorting convention agrees
    assert np.allclose(pf_m.center.ravel(), ref["plane_center"])
    e_m = pt.create_elliptic_fracture(
        np.array([0.0, 1, 0]), 2, 1, np.pi / 4, np.pi / 6, np.pi / 3, num_points=8
    )
    assert np.allclose(e_m.pts, ref["ellipse_pts"])


@pytest.mark.parametrize("explicit_domain", [True, False])
def test_fracture_network_2d_pipeline(golden, explicit_domain):
    """Boundary imposition + intersection splitting must reproduce the
    reference decomposition bit-exactly (points, edges, tags,
    intersection points)."""
    fr = [
        np.array([[0.2, 0.8], [0.5, 0.5]]),
        np.array([[0.5, 0.5], [0.2, 0.8]]),
        np.array([[-0.5, 1.5], [0.3, 0.3]]),
    ]
    net_m = pt.create_fracture_network(
        [pt.LineFracture(f) for f in fr],
        pt.Domain({"xmin": 0, "xmax": 1, "ymin": 0, "ymax": 1}),
    )
    def compute(ref_pp):
        net_r = ref_pp.create_fracture_network(
            [ref_pp.LineFracture(f) for f in fr],
            ref_pp.Domain({"xmin": 0, "xmax": 1, "ymin": 0, "ymax": 1}),
        )
        kr, dr = net_r.impose_external_boundary(
            net_r.domain if explicit_domain else None
        )
        net_r._find_and_split_intersections(np.zeros(0, dtype=int))
        b = net_r._decomposition
        return {
            "keep": np.asarray(kr),
            "dom": np.asarray(dr),
            "points": b["points"],
            "edges": b["edges"],
            "intersections": b["intersections"],
            "domain_boundary_points": b["domain_boundary_points"],
        }

    ref = golden(compute)
    km, dm = net_m.impose_external_boundary(
        net_m.domain if explicit_domain else None
    )
    assert np.array_equal(km, ref["keep"])
    assert np.array_equal(dm, ref["dom"])
    net_m._find_and_split_intersections(np.zeros(0, dtype=int))
    a = net_m._decomposition
    assert np.allclose(a["points"], ref["points"])
    assert np.array_equal(a["edges"], ref["edges"])
    assert np.array_equal(a["intersections"], ref["intersections"])
    assert np.array_equal(
        a["domain_boundary_points"], ref["domain_boundary_points"]
    )


def _match_pointsets(pm, pr):
    if pm.shape != pr.shape:
        return False
    used = set()
    for i in range(pm.shape[1]):
        hits = [
            j
            for j in range(pr.shape[1])
            if j not in used and np.allclose(pm[:, i], pr[:, j], atol=1e-7)
        ]
        if not hits:
            return False
        used.add(hits[0])
    return True


def test_fracture_network_3d_split(golden):
    """3d network decomposition (triple orthogonal crossing): points, edge
    counts and per-fracture boundary cycles agree with the reference."""

    def make(mod):
        f1 = mod.PlaneFracture(
            np.array([[-1, 1, 1, -1], [0, 0, 0, 0], [-1, -1, 1, 1.0]]),
            sort_points=False,
        )
        f2 = mod.PlaneFracture(
            np.array([[0, 0, 0, 0], [-1, 1, 1, -1], [-1, -1, 1, 1.0]]),
            sort_points=False,
        )
        f3 = mod.PlaneFracture(
            np.array([[-1, 1, 1, -1], [-1, -1, 1, 1], [0, 0, 0, 0.0]]),
            sort_points=False,
        )
        return mod.create_fracture_network([f1, f2, f3])

    def compute(ref_pp):
        nr = make(ref_pp)
        nr.find_intersections()
        se_r = np.sort(
            np.hstack(
                [nr.intersections["start"], nr.intersections["end"]]
            ).ravel()
        )
        nr.split_intersections()
        b = nr.decomposition
        out = {
            "n_isect": np.array([nr.intersections["start"].shape[1]]),
            "se": se_r,
            "points": b["points"],
            "edges_shape": np.asarray(b["edges"].shape),
        }
        for fi in range(3):
            out[f"poly_shape_{fi}"] = np.asarray(b["polygons"][fi].shape)
            out[f"lif_{fi}"] = np.array([len(b["line_in_frac"][fi])])
        return out

    ref = golden(compute)
    nm = make(pt)
    nm.find_intersections()
    assert nm.intersections["start"].shape[1] == ref["n_isect"][0] == 3
    se_m = np.sort(
        np.hstack(
            [nm.intersections["start"], nm.intersections["end"]]
        ).ravel()
    )
    assert np.allclose(se_m, ref["se"])

    nm.split_intersections()
    a = nm.decomposition
    assert _match_pointsets(a["points"], np.asarray(ref["points"]))
    assert a["edges"].shape == tuple(ref["edges_shape"])
    for fi in range(3):
        assert a["polygons"][fi].shape == tuple(ref[f"poly_shape_{fi}"])
        assert len(a["line_in_frac"][fi]) == ref[f"lif_{fi}"][0]


def test_fracture_network_3d_t_intersection(golden):
    def make(mod):
        f1 = mod.PlaneFracture(
            np.array([[-1, 1, 1, -1], [0, 0, 0, 0], [-1, -1, 1, 1.0]]),
            sort_points=False,
        )
        f2 = mod.PlaneFracture(
            np.array([[0, 0, 0, 0], [0, 1, 1, 0], [-1, -1, 1, 1.0]]),
            sort_points=False,
        )
        return mod.create_fracture_network([f1, f2])

    def compute(ref_pp):
        nr = make(ref_pp)
        nr.find_intersections()
        return {
            "n_isect": np.array([nr.intersections["start"].shape[1]]),
            "bound_first": np.asarray(
                nr.intersections["bound_first"], dtype=bool
            ),
            "bound_second": np.asarray(
                nr.intersections["bound_second"], dtype=bool
            ),
        }

    ref = golden(compute)
    nm = make(pt)
    nm.find_intersections()
    assert nm.intersections["start"].shape[1] == ref["n_isect"][0]
    # The intersection is on the boundary of f2, not of f1.
    assert list(nm.intersections["bound_first"]) == list(ref["bound_first"])
    assert list(nm.intersections["bound_second"]) == list(
        ref["bound_second"]
    )


def test_fracture_network_3d_impose_boundary():
    f = pt.PlaneFracture(
        np.array([[-1, 2, 2, -1], [0.5, 0.5, 0.5, 0.5], [-1, -1, 2, 2.0]]),
        sort_points=False,
    )
    outside = pt.PlaneFracture(
        np.array([[5, 6, 6, 5], [5, 5, 6, 6], [5, 5, 5, 5.0]]),
        sort_points=False,
    )
    net = pt.create_fracture_network(
        [f, outside],
        pt.Domain(
            {
                "xmin": 0,
                "xmax": 1,
                "ymin": 0,
                "ymax": 1,
                "zmin": 0,
                "zmax": 1,
            }
        ),
    )
    deleted = net.impose_external_boundary(net.domain)
    assert 1 in deleted
    assert net.num_frac() == 1
    pts = net.fractures[0].pts
    assert pts[0].min() >= -1e-8 and pts[0].max() <= 1 + 1e-8
    assert pts[2].min() >= -1e-8 and pts[2].max() <= 1 + 1e-8
