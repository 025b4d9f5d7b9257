"""Fracture primitives and networks (2d and 3d) vs the reference."""

import numpy as np
import pytest

import porepy_tpu as pt
from tests.conftest import requires_reference


@requires_reference
def test_fracture_primitives_parity(ref_pp):
    f_m = pt.LineFracture(np.array([[0.0, 1.0], [0.5, 0.5]]))
    f_r = ref_pp.LineFracture(np.array([[0.0, 1.0], [0.5, 0.5]]))
    assert np.allclose(f_m.pts, f_r.pts)
    assert np.allclose(f_m.normal.ravel(), f_r.normal.ravel())
    assert f_m.length() == f_r.length()

    pts = np.array([[0, 1, 1, 0], [0, 0, 1, 1], [0, 0, 1, 1.0]])[:, [2, 0, 3, 1]]
    pf_m = pt.PlaneFracture(pts.copy())
    pf_r = ref_pp.PlaneFracture(pts.copy())
    assert np.allclose(pf_m.pts, pf_r.pts)  # sorting convention agrees
    assert np.allclose(pf_m.center.ravel(), np.asarray(pf_r.center).ravel())

    e_m = pt.create_elliptic_fracture(
        np.array([0.0, 1, 0]), 2, 1, np.pi / 4, np.pi / 6, np.pi / 3, num_points=8
    )
    e_r = ref_pp.create_elliptic_fracture(
        np.array([0.0, 1, 0]), 2, 1, np.pi / 4, np.pi / 6, np.pi / 3, num_points=8
    )
    assert np.allclose(e_m.pts, e_r.pts)


@requires_reference
@pytest.mark.parametrize("explicit_domain", [True, False])
def test_fracture_network_2d_pipeline(ref_pp, explicit_domain):
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
    net_r = ref_pp.create_fracture_network(
        [ref_pp.LineFracture(f) for f in fr],
        ref_pp.Domain({"xmin": 0, "xmax": 1, "ymin": 0, "ymax": 1}),
    )
    km, dm = net_m.impose_external_boundary(
        net_m.domain if explicit_domain else None
    )
    kr, dr = net_r.impose_external_boundary(
        net_r.domain if explicit_domain else None
    )
    assert np.array_equal(km, kr)
    assert np.array_equal(dm, dr)
    net_m._find_and_split_intersections(np.zeros(0, dtype=int))
    net_r._find_and_split_intersections(np.zeros(0, dtype=int))
    a, b = net_m._decomposition, net_r._decomposition
    assert np.allclose(a["points"], b["points"])
    assert np.array_equal(a["edges"], b["edges"])
    assert np.array_equal(a["intersections"], b["intersections"])
    assert np.array_equal(
        a["domain_boundary_points"], b["domain_boundary_points"]
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


@requires_reference
def test_fracture_network_3d_split(ref_pp):
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

    nm, nr = make(pt), make(ref_pp)
    nm.find_intersections()
    nr.find_intersections()
    assert (
        nm.intersections["start"].shape[1]
        == nr.intersections["start"].shape[1]
        == 3
    )
    se_m = np.sort(
        np.hstack(
            [nm.intersections["start"], nm.intersections["end"]]
        ).ravel()
    )
    se_r = np.sort(
        np.hstack(
            [nr.intersections["start"], nr.intersections["end"]]
        ).ravel()
    )
    assert np.allclose(se_m, se_r)

    nm.split_intersections()
    nr.split_intersections()
    a, b = nm.decomposition, nr.decomposition
    assert _match_pointsets(a["points"], b["points"])
    assert a["edges"].shape == b["edges"].shape
    for fi in range(3):
        assert a["polygons"][fi].shape == b["polygons"][fi].shape
        assert len(a["line_in_frac"][fi]) == len(b["line_in_frac"][fi])


@requires_reference
def test_fracture_network_3d_t_intersection(ref_pp):
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

    nm, nr = make(pt), make(ref_pp)
    nm.find_intersections()
    nr.find_intersections()
    assert nm.intersections["start"].shape[1] == nr.intersections[
        "start"
    ].shape[1]
    # The intersection is on the boundary of f2, not of f1.
    assert list(nm.intersections["bound_first"]) == list(
        nr.intersections["bound_first"]
    )
    assert list(nm.intersections["bound_second"]) == list(
        nr.intersections["bound_second"]
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
