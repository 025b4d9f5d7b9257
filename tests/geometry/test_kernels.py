"""Geometry kernels: distances, predicates and point sorting vs reference.

Reference values are golden-backed (record/replay via the ``golden``
fixture; recorded from ``porepy.geometry.{distances,
geometry_property_checks, sort_points}``)."""

import numpy as np

from porepy_tpu.geometry import (
    distances as my_d,
    geometry_property_checks as my_c,
    sort_points as my_s,
)


def _rot_poly(rng):
    from porepy_tpu.geometry import map_geometry

    theta = np.linspace(0, 2 * np.pi, 6, endpoint=False)
    poly = np.vstack([np.cos(theta), np.sin(theta), np.zeros(6)])
    axis = np.array([1.0, 2.0, 0.3])
    R = map_geometry.axis_angle_rotation(0.7, axis / np.linalg.norm(axis))
    return R @ poly + np.array([[0.3], [0.2], [0.1]])


def test_distance_kernels(golden):
    rng = np.random.default_rng(7)
    p = rng.random((3, 8))
    q = rng.random((3, 5))
    s1, e1 = rng.random(3), rng.random(3)
    ss, ee = rng.random((3, 6)), rng.random((3, 6))

    def compute(ref_pp):
        import porepy.geometry.distances as rd

        out = {
            "pp": rd.point_pointset(p[:, 0], q),
            "ps": rd.pointset(p, True),
        }
        for i, r in enumerate(rd.segment_segment_set(s1, e1, ss, ee)):
            out[f"sss{i}"] = np.asarray(r)
        for i, r in enumerate(rd.points_segments(p, ss, ee)):
            out[f"pseg{i}"] = np.asarray(r)
        return out

    rec = golden(compute)
    assert np.allclose(my_d.point_pointset(p[:, 0], q), rec["pp"])
    assert np.allclose(my_d.pointset(p, True), rec["ps"])
    for i, mine in enumerate(my_d.segment_segment_set(s1, e1, ss, ee)):
        assert np.allclose(mine, rec[f"sss{i}"], atol=1e-9)
    for i, mine in enumerate(my_d.points_segments(p, ss, ee)):
        assert np.allclose(mine, rec[f"pseg{i}"], atol=1e-9)


def test_polygon_distances(golden):
    rng = np.random.default_rng(8)
    poly = _rot_poly(rng)
    pts = rng.random((3, 7)) * 2 - 0.5
    ss, ee = rng.random((3, 6)), rng.random((3, 6))

    def compute(ref_pp):
        import porepy.geometry.distances as rd

        out = {}
        for i, r in enumerate(rd.points_polygon(pts, poly)):
            out[f"pp{i}"] = np.asarray(r)
        for i, r in enumerate(rd.segments_polygon(ss, ee, poly)):
            out[f"sp{i}"] = np.asarray(r)
        return out

    rec = golden(compute)
    for i, mine in enumerate(my_d.points_polygon(pts, poly)):
        assert np.allclose(mine, rec[f"pp{i}"], atol=1e-9)
    for i, mine in enumerate(my_d.segments_polygon(ss, ee, poly)):
        assert np.allclose(mine, rec[f"sp{i}"], atol=1e-9)


def test_predicates(golden):
    rng = np.random.default_rng(9)
    theta = np.linspace(0, 2 * np.pi, 6, endpoint=False)
    poly2 = np.vstack([np.cos(theta), np.sin(theta)])
    pts = rng.random((2, 30)) * 3 - 1.5
    cube = [
        np.array([[0, 1, 1, 0], [0, 0, 1, 1], [0, 0, 0, 0.0]]),
        np.array([[0, 1, 1, 0], [0, 0, 1, 1], [1, 1, 1, 1.0]]),
        np.array([[0, 1, 1, 0], [0, 0, 0, 0], [0, 0, 1, 1.0]]),
        np.array([[0, 1, 1, 0], [1, 1, 1, 1], [0, 0, 1, 1.0]]),
        np.array([[0, 0, 0, 0], [0, 1, 1, 0], [0, 0, 1, 1.0]]),
        np.array([[1, 1, 1, 1], [0, 1, 1, 0], [0, 0, 1, 1.0]]),
    ]
    tp = rng.random((3, 20)) * 1.4 - 0.2

    def compute(ref_pp):
        import porepy.geometry.geometry_property_checks as rc

        return {
            "pip": np.asarray(rc.point_in_polygon(poly2, pts)),
            "ccw": np.asarray([rc.is_ccw_polygon(poly2)]),
            "ccwl": np.asarray(
                rc.is_ccw_polyline(poly2[:, 0], poly2[:, 1], pts)
            ),
            "piph": np.asarray(rc.point_in_polyhedron(cube, tp)),
        }

    rec = golden(compute)
    assert np.array_equal(my_c.point_in_polygon(poly2, pts), rec["pip"])
    assert my_c.is_ccw_polygon(poly2) == bool(rec["ccw"][0])
    assert np.array_equal(
        my_c.is_ccw_polyline(poly2[:, 0], poly2[:, 1], pts), rec["ccwl"]
    )
    assert np.array_equal(
        my_c.point_in_polyhedron(cube, tp), rec["piph"]
    )


def test_sorting(golden):
    rng = np.random.default_rng(10)
    lines = np.array([[0, 1, 2, 3], [1, 2, 3, 0]])
    perm = rng.permutation(4)
    pts_line = np.outer(np.array([1.0, 2.0, 3.0]), np.array([0.3, 0.1, 0.7, 0.5]))
    poly = _rot_poly(rng)[:, rng.permutation(6)]
    c = np.mean(poly, axis=1)

    def compute(ref_pp):
        import porepy.geometry.sort_points as rs

        return {
            "pairs": np.asarray(rs.sort_point_pairs(lines[:, perm])[0]),
            "on_line": np.asarray(rs.sort_points_on_line(pts_line)),
            "plane": np.asarray(rs.sort_point_plane(poly, c)),
        }

    rec = golden(compute)
    assert np.array_equal(my_s.sort_point_pairs(lines[:, perm])[0], rec["pairs"])
    assert np.array_equal(my_s.sort_points_on_line(pts_line), rec["on_line"])
    assert np.array_equal(my_s.sort_point_plane(poly, c), rec["plane"])


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
