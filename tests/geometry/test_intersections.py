"""Intersection kernels vs reference: segments (2d/3d), segment soup
splitting, polygon-polygon in 3d, and polygon/polyhedron crossings."""

import numpy as np
import pytest

from porepy_tpu.geometry import intersections as mi
from porepy_tpu.geometry import map_geometry
from tests.conftest import requires_reference


@pytest.fixture
def ref_int(ref_pp):
    import porepy.geometry.intersections as ri

    return ri


@requires_reference
def test_segments_2d_fuzz(ref_int):
    rng = np.random.default_rng(11)
    for _ in range(300):
        s1, e1, s2, e2 = rng.random((4, 2))
        a = mi.segments_2d(s1, e1, s2, e2)
        b = ref_int.segments_2d(s1, e1, s2, e2)
        assert (a is None) == (b is None)
        if a is not None:
            assert np.allclose(a, b)
    # Collinear overlaps.
    for _ in range(100):
        t = np.sort(rng.random(4))
        d, o = rng.random(2), rng.random(2)
        a = mi.segments_2d(o + t[0] * d, o + t[2] * d, o + t[1] * d, o + t[3] * d)
        b = ref_int.segments_2d(
            o + t[0] * d, o + t[2] * d, o + t[1] * d, o + t[3] * d
        )
        assert np.allclose(a, b)


@requires_reference
def test_segments_3d(ref_int):
    # Crossing pair (exercises the non-parallel branch).
    a = mi.segments_3d(
        np.array([1.0, 0, -1]),
        np.array([1.0, 0, 1]),
        np.array([0.0, 0, -0.5]),
        np.array([2.0, 0, -0.5]),
    )
    assert np.allclose(a, np.array([[1.0], [0.0], [-0.5]]))
    rng = np.random.default_rng(12)
    for _ in range(100):
        t = np.sort(rng.random(4))
        d, o = rng.random(3), rng.random(3)
        mine = mi.segments_3d(
            o + t[0] * d, o + t[2] * d, o + t[1] * d, o + t[3] * d
        )
        ref = ref_int.segments_3d(
            o + t[0] * d, o + t[2] * d, o + t[1] * d, o + t[3] * d
        )
        assert np.allclose(mine, ref)


@requires_reference
def test_split_intersecting_segments_2d(ref_int):
    rng = np.random.default_rng(13)
    for _ in range(15):
        npts = 12
        p = rng.random((2, npts))
        cols = []
        while len(cols) < 6:
            a, b = rng.integers(0, npts, 2)
            if a != b:
                cols.append((a, b))
        e = np.vstack(
            [[c[0] for c in cols], [c[1] for c in cols], np.arange(6)]
        )
        pm, em, tim = mi.split_intersecting_segments_2d(p.copy(), e.copy())
        pr, er, tir = ref_int.split_intersecting_segments_2d(p.copy(), e.copy())
        assert np.allclose(pm, pr)
        assert np.array_equal(em, er)
        assert np.array_equal(tim[0], tir[0])
        assert np.array_equal(tim[1], tir[1])


def _match_points(pm, pr):
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
def test_polygons_3d_structured(ref_int):
    p1 = np.array([[-1, 1, 1, -1], [0, 0, 0, 0], [-1, -1, 1, 1.0]])
    p2 = np.array([[0, 0, 0, 0], [-1, 1, 1, -1], [-1, -1, 1, 1.0]])
    p4 = np.array([[-1, 1, 1, -1], [-1, -1, 1, 1], [0, 0, 0, 0.0]])
    cases = {
        "X": [p1, p2],
        "T": [p1, np.array([[0, 0, 0, 0], [0, 1, 1, 0], [-1, -1, 1, 1.0]])],
        "touch": [p1, np.array([[0, 0, 0, 0], [0, 1, 1, 0], [1, 1, 2, 2.0]])],
        "disjoint": [p1, np.array([[0, 0, 0, 0], [-1, 1, 1, -1], [2, 2, 3, 3.0]])],
        "triple": [p1, p2, p4],
        "coplanar": [
            p1,
            np.array([[0, 2, 2, 0], [0, 0, 0, 0], [-0.5, -0.5, 0.5, 0.5]]),
        ],
        "partial": [p1, np.array([[0, 0, 0, 0], [-1, 1, 1, -1], [0, 0, 2, 2.0]])],
    }
    for name, polys in cases.items():
        rm = mi.polygons_3d([p.copy() for p in polys])
        rr = ref_int.polygons_3d([p.copy() for p in polys])
        assert _match_points(rm[0], rr[0]), name
        assert sorted(map(tuple, rm[3])) == sorted(map(tuple, rr[3])), name
        for i in range(len(polys)):
            assert sorted(map(bool, rm[2][i])) == sorted(
                map(bool, rr[2][i])
            ), (name, i)


@requires_reference
def test_polygons_3d_random_rotations(ref_int):
    rng = np.random.default_rng(3)
    base = np.array([[-1, 1, 1, -1], [-1, -1, 1, 1], [0, 0, 0, 0.0]])
    for _ in range(40):
        def rot():
            v = rng.random(3)
            return map_geometry.axis_angle_rotation(
                rng.random() * 3, v / np.linalg.norm(v)
            )

        q1 = rot() @ base + rng.random((3, 1)) * 0.3
        q2 = rot() @ base + rng.random((3, 1)) * 0.3
        rm = mi.polygons_3d([q1, q2])
        rr = ref_int.polygons_3d([q1, q2])
        assert _match_points(rm[0], rr[0])


@requires_reference
def test_segments_polygon_and_polyhedron(ref_int):
    rng = np.random.default_rng(14)
    poly = np.array([[0, 1, 1, 0], [0, 0, 1, 1], [0, 0, 0, 0.0]])
    ss = rng.random((3, 20)) * 2 - 0.5
    ee = rng.random((3, 20)) * 2 - 0.5
    cm, pm = mi.segments_polygon(ss, ee, poly)
    cr, pr = ref_int.segments_polygon(ss, ee, poly)
    assert np.array_equal(cm, cr)
    assert np.allclose(pm, pr)

    cube = [
        np.array([[0, 1, 1, 0], [0, 0, 1, 1], [0, 0, 0, 0.0]]),
        np.array([[0, 1, 1, 0], [0, 0, 1, 1], [1, 1, 1, 1.0]]),
        np.array([[0, 1, 1, 0], [0, 0, 0, 0], [0, 0, 1, 1.0]]),
        np.array([[0, 1, 1, 0], [1, 1, 1, 1], [0, 0, 1, 1.0]]),
        np.array([[0, 0, 0, 0], [0, 1, 1, 0], [0, 0, 1, 1.0]]),
        np.array([[1, 1, 1, 1], [0, 1, 1, 0], [0, 0, 1, 1.0]]),
    ]
    xm = mi.segments_polyhedron(ss, ee, cube)
    xr = ref_int.segments_polyhedron(ss, ee, cube)
    assert np.array_equal(xm[1], xr[1])
    assert np.array_equal(xm[2], xr[2])
    assert np.allclose(xm[3], xr[3], atol=1e-9)


def test_triangulations_overlap_area():
    """Triangle overlap area cross-checked against an exact value (the
    reference needs shapely, unavailable here)."""
    p1 = np.array([[0, 1, 0.5], [0, 0, 1.0]])
    p2 = np.array([[0.2, 1.2, 0.7], [0, 0, 1.0]])
    t = np.array([[0], [1], [2]])
    out = mi.triangulations(p1, p2, t, t)
    assert len(out) == 1
    assert out[0][:2] == (0, 0)
    assert abs(out[0][2] - 0.32) < 1e-12


def test_surface_tessellations_two_grids():
    """Two shifted unit-square 1x1 tessellations: the mutual subdivision
    covers the overlap with correct mappings."""
    sq1 = [np.array([[0, 1, 1, 0], [0, 0, 1, 1.0]])]
    sq2 = [np.array([[0.5, 1.5, 1.5, 0.5], [0, 0, 1, 1.0]])]
    polys, mappings = mi.surface_tessellations([sq1, sq2])
    assert len(polys) == 1
    from porepy_tpu.geometry.intersections import _polygon_area_2d

    assert abs(_polygon_area_2d(polys[0]) - 0.5) < 1e-12
    assert mappings[0].shape == (1, 1) and mappings[1].shape == (1, 1)
