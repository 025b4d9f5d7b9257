"""Geometry kernels: distances, predicates and point sorting vs reference."""

import numpy as np
import pytest

from porepy_tpu.geometry import (
    distances as my_d,
    geometry_property_checks as my_c,
    sort_points as my_s,
)
from tests.conftest import requires_reference


@pytest.fixture
def ref_geom(ref_pp):
    import porepy.geometry.distances as rd
    import porepy.geometry.geometry_property_checks as rc
    import porepy.geometry.sort_points as rs

    return rd, rc, rs


def _rot_poly(rng):
    from porepy_tpu.geometry import map_geometry

    theta = np.linspace(0, 2 * np.pi, 6, endpoint=False)
    poly = np.vstack([np.cos(theta), np.sin(theta), np.zeros(6)])
    axis = np.array([1.0, 2.0, 0.3])
    R = map_geometry.axis_angle_rotation(0.7, axis / np.linalg.norm(axis))
    return R @ poly + np.array([[0.3], [0.2], [0.1]])


@requires_reference
def test_distance_kernels(ref_geom):
    rd, _, _ = ref_geom
    rng = np.random.default_rng(7)
    p = rng.random((3, 8))
    q = rng.random((3, 5))
    assert np.allclose(
        my_d.point_pointset(p[:, 0], q), rd.point_pointset(p[:, 0], q)
    )
    assert np.allclose(my_d.pointset(p, True), rd.pointset(p, True))

    s1, e1 = rng.random(3), rng.random(3)
    ss, ee = rng.random((3, 6)), rng.random((3, 6))
    for mine, ref in zip(
        my_d.segment_segment_set(s1, e1, ss, ee),
        rd.segment_segment_set(s1, e1, ss, ee),
    ):
        assert np.allclose(mine, ref, atol=1e-9)
    for mine, ref in zip(
        my_d.points_segments(p, ss, ee), rd.points_segments(p, ss, ee)
    ):
        assert np.allclose(mine, ref, atol=1e-9)


@requires_reference
def test_polygon_distances(ref_geom):
    rd, _, _ = ref_geom
    rng = np.random.default_rng(8)
    poly = _rot_poly(rng)
    pts = rng.random((3, 7)) * 2 - 0.5
    for mine, ref in zip(
        my_d.points_polygon(pts, poly), rd.points_polygon(pts, poly)
    ):
        assert np.allclose(mine, ref, atol=1e-9)
    ss, ee = rng.random((3, 6)), rng.random((3, 6))
    for mine, ref in zip(
        my_d.segments_polygon(ss, ee, poly), rd.segments_polygon(ss, ee, poly)
    ):
        assert np.allclose(mine, ref, atol=1e-9)


@requires_reference
def test_predicates(ref_geom):
    _, rc, _ = ref_geom
    rng = np.random.default_rng(9)
    theta = np.linspace(0, 2 * np.pi, 6, endpoint=False)
    poly2 = np.vstack([np.cos(theta), np.sin(theta)])
    pts = rng.random((2, 30)) * 3 - 1.5
    assert np.array_equal(
        my_c.point_in_polygon(poly2, pts), rc.point_in_polygon(poly2, pts)
    )
    assert my_c.is_ccw_polygon(poly2) == rc.is_ccw_polygon(poly2)
    assert np.array_equal(
        my_c.is_ccw_polyline(poly2[:, 0], poly2[:, 1], pts),
        rc.is_ccw_polyline(poly2[:, 0], poly2[:, 1], pts),
    )

    cube = [
        np.array([[0, 1, 1, 0], [0, 0, 1, 1], [0, 0, 0, 0.0]]),
        np.array([[0, 1, 1, 0], [0, 0, 1, 1], [1, 1, 1, 1.0]]),
        np.array([[0, 1, 1, 0], [0, 0, 0, 0], [0, 0, 1, 1.0]]),
        np.array([[0, 1, 1, 0], [1, 1, 1, 1], [0, 0, 1, 1.0]]),
        np.array([[0, 0, 0, 0], [0, 1, 1, 0], [0, 0, 1, 1.0]]),
        np.array([[1, 1, 1, 1], [0, 1, 1, 0], [0, 0, 1, 1.0]]),
    ]
    tp = rng.random((3, 20)) * 1.4 - 0.2
    assert np.array_equal(
        my_c.point_in_polyhedron(cube, tp), rc.point_in_polyhedron(cube, tp)
    )


@requires_reference
def test_sorting(ref_geom):
    _, _, rs = ref_geom
    rng = np.random.default_rng(10)
    lines = np.array([[0, 1, 2, 3], [1, 2, 3, 0]])
    perm = rng.permutation(4)
    sl_m, _ = my_s.sort_point_pairs(lines[:, perm])
    sl_r, _ = rs.sort_point_pairs(lines[:, perm])
    assert np.array_equal(sl_m, sl_r)

    pts_line = np.outer(np.array([1.0, 2.0, 3.0]), np.array([0.3, 0.1, 0.7, 0.5]))
    assert np.array_equal(
        my_s.sort_points_on_line(pts_line), rs.sort_points_on_line(pts_line)
    )

    poly = _rot_poly(rng)[:, rng.permutation(6)]
    c = np.mean(poly, axis=1)
    assert np.array_equal(
        my_s.sort_point_plane(poly, c), rs.sort_point_plane(poly, c)
    )


def test_sort_triangle_edges_consistent_orientation():
    """Neighboring triangles must traverse shared edges in opposite
    directions (the contract; cyclic rotations are free)."""
    t = np.array([[0, 1, 2], [1, 3, 2], [2, 3, 4]]).T
    out = my_s.sort_triangle_edges(t.copy())
    edges = {}
    for ci in range(out.shape[1]):
        tri = out[:, ci]
        for k in range(3):
            e = (tri[k], tri[(k + 1) % 3])
            assert e not in edges, "same-direction duplicate edge"
            edges[e] = ci
    # Every interior edge appears once in each direction.
    interior = [e for e in edges if (e[1], e[0]) in edges]
    assert len(interior) == 4  # two shared edges, both directions
