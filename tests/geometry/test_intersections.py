"""Intersection kernels vs reference: segments (2d/3d), segment soup
splitting, polygon-polygon in 3d, and polygon/polyhedron crossings.

Reference values are golden-backed (record/replay via the ``golden``
fixture): variable-shape per-case outputs are packed as padded stacks
(``flags`` carries the per-case column count, 0 = no intersection).
"""

import numpy as np
import pytest

from porepy_tpu.geometry import intersections as mi
from porepy_tpu.geometry import map_geometry


def _pack_cols(results, dim, max_cols):
    """[None | (dim, k) array] list -> (flags, padded stack)."""
    flags = np.array([0 if r is None else np.atleast_2d(r).shape[1] for r in results])
    vals = np.full((len(results), dim, max_cols), np.nan)
    for i, r in enumerate(results):
        if r is not None:
            r = np.atleast_2d(r)
            vals[i, :, : r.shape[1]] = r
    return flags, vals


def _segments_2d_inputs():
    rng = np.random.default_rng(11)
    crossing = [rng.random((4, 2)) for _ in range(300)]
    collinear = []
    for _ in range(100):
        t = np.sort(rng.random(4))
        d, o = rng.random(2), rng.random(2)
        collinear.append(
            (o + t[0] * d, o + t[2] * d, o + t[1] * d, o + t[3] * d)
        )
    return crossing, collinear


def test_segments_2d_fuzz(golden):
    crossing, collinear = _segments_2d_inputs()

    def compute(ref_pp):
        import porepy.geometry.intersections as ri

        f1, v1 = _pack_cols(
            [ri.segments_2d(s1, e1, s2, e2) for s1, e1, s2, e2 in crossing],
            2, 2,
        )
        f2, v2 = _pack_cols(
            [ri.segments_2d(*args) for args in collinear], 2, 2
        )
        return {"flags": f1, "vals": v1, "col_flags": f2, "col_vals": v2}

    rec = golden(compute)
    for i, (s1, e1, s2, e2) in enumerate(crossing):
        a = mi.segments_2d(s1, e1, s2, e2)
        k = int(rec["flags"][i])
        assert (a is None) == (k == 0), i
        if a is not None:
            assert np.allclose(np.atleast_2d(a), rec["vals"][i, :, :k]), i
    for i, args in enumerate(collinear):
        a = mi.segments_2d(*args)
        k = int(rec["col_flags"][i])
        assert np.allclose(np.atleast_2d(a), rec["col_vals"][i, :, :k]), i


def test_segments_3d(golden):
    # Crossing pair (exercises the non-parallel branch) — exact oracle.
    a = mi.segments_3d(
        np.array([1.0, 0, -1]),
        np.array([1.0, 0, 1]),
        np.array([0.0, 0, -0.5]),
        np.array([2.0, 0, -0.5]),
    )
    assert np.allclose(a, np.array([[1.0], [0.0], [-0.5]]))
    rng = np.random.default_rng(12)
    cases = []
    for _ in range(100):
        t = np.sort(rng.random(4))
        d, o = rng.random(3), rng.random(3)
        cases.append((o + t[0] * d, o + t[2] * d, o + t[1] * d, o + t[3] * d))

    def compute(ref_pp):
        import porepy.geometry.intersections as ri

        flags, vals = _pack_cols(
            [ri.segments_3d(*args) for args in cases], 3, 2
        )
        return {"flags": flags, "vals": vals}

    rec = golden(compute)
    for i, args in enumerate(cases):
        mine = mi.segments_3d(*args)
        k = int(rec["flags"][i])
        assert (mine is None) == (k == 0), i
        if mine is not None:
            assert np.allclose(np.atleast_2d(mine), rec["vals"][i, :, :k]), i


def _split_cases():
    rng = np.random.default_rng(13)
    cases = []
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
        cases.append((p, e))
    return cases


def test_split_intersecting_segments_2d(golden):
    cases = _split_cases()

    def compute(ref_pp):
        import porepy.geometry.intersections as ri

        out = {}
        for i, (p, e) in enumerate(cases):
            pr, er, tir = ri.split_intersecting_segments_2d(p.copy(), e.copy())
            out[f"c{i}.p"] = pr
            out[f"c{i}.e"] = er
            out[f"c{i}.t0"] = np.asarray(tir[0])
            out[f"c{i}.t1"] = np.asarray(tir[1])
        return out

    rec = golden(compute)
    for i, (p, e) in enumerate(cases):
        pm, em, tim = mi.split_intersecting_segments_2d(p.copy(), e.copy())
        assert np.allclose(pm, rec[f"c{i}.p"]), i
        assert np.array_equal(em, rec[f"c{i}.e"]), i
        assert np.array_equal(np.asarray(tim[0]), rec[f"c{i}.t0"]), i
        assert np.array_equal(np.asarray(tim[1]), rec[f"c{i}.t1"]), i


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


_P1 = np.array([[-1, 1, 1, -1], [0, 0, 0, 0], [-1, -1, 1, 1.0]])
_P2 = np.array([[0, 0, 0, 0], [-1, 1, 1, -1], [-1, -1, 1, 1.0]])
_P4 = np.array([[-1, 1, 1, -1], [-1, -1, 1, 1], [0, 0, 0, 0.0]])
_POLY_CASES = {
    "X": [_P1, _P2],
    "T": [_P1, np.array([[0, 0, 0, 0], [0, 1, 1, 0], [-1, -1, 1, 1.0]])],
    "touch": [_P1, np.array([[0, 0, 0, 0], [0, 1, 1, 0], [1, 1, 2, 2.0]])],
    "disjoint": [_P1, np.array([[0, 0, 0, 0], [-1, 1, 1, -1], [2, 2, 3, 3.0]])],
    "triple": [_P1, _P2, _P4],
    "coplanar": [
        _P1,
        np.array([[0, 2, 2, 0], [0, 0, 0, 0], [-0.5, -0.5, 0.5, 0.5]]),
    ],
    "partial": [_P1, np.array([[0, 0, 0, 0], [-1, 1, 1, -1], [0, 0, 2, 2.0]])],
}


def test_polygons_3d_structured(golden):
    def compute(ref_pp):
        import porepy.geometry.intersections as ri

        out = {}
        for name, polys in _POLY_CASES.items():
            rr = ri.polygons_3d([p.copy() for p in polys])
            out[f"{name}.pts"] = rr[0]
            out[f"{name}.pairs"] = np.asarray(
                sorted(map(tuple, rr[3])), dtype=float
            ).reshape(-1, 2) if len(rr[3]) else np.zeros((0, 2))
            for i in range(len(polys)):
                out[f"{name}.bound{i}"] = np.asarray(
                    sorted(map(bool, rr[2][i])), dtype=int
                )
        return out

    rec = golden(compute)
    for name, polys in _POLY_CASES.items():
        rm = mi.polygons_3d([p.copy() for p in polys])
        assert _match_points(rm[0], np.asarray(rec[f"{name}.pts"])), name
        pairs = np.asarray(
            sorted(map(tuple, rm[3])), dtype=float
        ).reshape(-1, 2) if len(rm[3]) else np.zeros((0, 2))
        assert np.array_equal(pairs, rec[f"{name}.pairs"]), name
        for i in range(len(polys)):
            assert np.array_equal(
                np.asarray(sorted(map(bool, rm[2][i])), dtype=int),
                rec[f"{name}.bound{i}"],
            ), (name, i)


def test_polygons_3d_random_rotations(golden):
    rng = np.random.default_rng(3)
    base = np.array([[-1, 1, 1, -1], [-1, -1, 1, 1], [0, 0, 0, 0.0]])
    cases = []
    for _ in range(40):
        def rot():
            v = rng.random(3)
            return map_geometry.axis_angle_rotation(
                rng.random() * 3, v / np.linalg.norm(v)
            )

        q1 = rot() @ base + rng.random((3, 1)) * 0.3
        q2 = rot() @ base + rng.random((3, 1)) * 0.3
        cases.append((q1, q2))

    def compute(ref_pp):
        import porepy.geometry.intersections as ri

        out = {}
        for i, (q1, q2) in enumerate(cases):
            out[f"c{i}"] = ri.polygons_3d([q1, q2])[0]
        return out

    rec = golden(compute)
    for i, (q1, q2) in enumerate(cases):
        rm = mi.polygons_3d([q1, q2])
        assert _match_points(rm[0], np.asarray(rec[f"c{i}"])), i


def test_segments_polygon_and_polyhedron(golden):
    rng = np.random.default_rng(14)
    poly = np.array([[0, 1, 1, 0], [0, 0, 1, 1], [0, 0, 0, 0.0]])
    ss = rng.random((3, 20)) * 2 - 0.5
    ee = rng.random((3, 20)) * 2 - 0.5
    cube = [
        np.array([[0, 1, 1, 0], [0, 0, 1, 1], [0, 0, 0, 0.0]]),
        np.array([[0, 1, 1, 0], [0, 0, 1, 1], [1, 1, 1, 1.0]]),
        np.array([[0, 1, 1, 0], [0, 0, 0, 0], [0, 0, 1, 1.0]]),
        np.array([[0, 1, 1, 0], [1, 1, 1, 1], [0, 0, 1, 1.0]]),
        np.array([[0, 0, 0, 0], [0, 1, 1, 0], [0, 0, 1, 1.0]]),
        np.array([[1, 1, 1, 1], [0, 1, 1, 0], [0, 0, 1, 1.0]]),
    ]

    def compute(ref_pp):
        import porepy.geometry.intersections as ri

        cr, pr = ri.segments_polygon(ss, ee, poly)
        xr = ri.segments_polyhedron(ss, ee, cube)
        return {
            "c": np.asarray(cr),
            "p": np.asarray(pr),
            "x1": np.asarray(xr[1]),
            "x2": np.asarray(xr[2]),
            "x3": np.asarray(xr[3]),
        }

    rec = golden(compute)
    cm, pm = mi.segments_polygon(ss, ee, poly)
    assert np.array_equal(np.asarray(cm), rec["c"])
    assert np.allclose(np.asarray(pm), rec["p"])
    xm = mi.segments_polyhedron(ss, ee, cube)
    assert np.array_equal(np.asarray(xm[1]), rec["x1"])
    assert np.array_equal(np.asarray(xm[2]), rec["x2"])
    assert np.allclose(np.asarray(xm[3]), rec["x3"], atol=1e-9)


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
