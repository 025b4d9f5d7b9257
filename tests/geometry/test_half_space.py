"""Half-space utilities vs the reference (reference
``geometry/half_space.py``)."""

import numpy as np
import pytest

import porepy_tpu as pt


def _unit_box_halfspaces():
    # Outward normals of the unit cube.
    n = np.array(
        [
            [-1, 1, 0, 0, 0, 0],
            [0, 0, -1, 1, 0, 0],
            [0, 0, 0, 0, -1, 1],
        ],
        dtype=float,
    )
    x0 = np.array(
        [
            [0, 1, 0.5, 0.5, 0.5, 0.5],
            [0.5, 0.5, 0, 1, 0.5, 0.5],
            [0.5, 0.5, 0.5, 0.5, 0, 1],
        ],
        dtype=float,
    )
    return n, x0


def test_point_inside_intersection():
    n, x0 = _unit_box_halfspaces()
    pts = np.array([[0.5, 2.0, 0.99], [0.5, 0.5, 0.01], [0.5, 0.5, 0.5]])
    np.testing.assert_array_equal(
        pt.half_space.point_inside_half_space_intersection(n, x0, pts),
        [True, False, True],
    )


def test_interior_point_is_interior():
    n, x0 = _unit_box_halfspaces()
    box = np.array([[0, 1], [0, 1], [0, 1.0]])
    p = pt.half_space.half_space_interior_point(n, x0, box)
    assert pt.half_space.point_inside_half_space_intersection(
        n, x0, p.reshape(3, 1)
    )[0]
    # strictly interior
    assert np.all(p > 1e-6) and np.all(p < 1 - 1e-6)


def test_interior_point_empty_raises():
    n = np.array([[1.0, -1.0], [0, 0], [0, 0]])
    x0 = np.array([[0.0, 1.0], [0, 0], [0, 0]])  # x<=0 and x>=1: empty
    box = np.array([[-2, 2], [-2, 2], [-2, 2.0]])
    # recompute=False: the orientation-flip retry would otherwise find the
    # (nonempty) mirrored intersection, as in the reference.
    with pytest.raises(ValueError):
        pt.half_space.half_space_interior_point(n, x0, box, recompute=False)


def test_vertexes_of_convex_domain_unit_square():
    A = np.array([[-1.0, 0], [1, 0], [0, -1], [0, 1]])
    b = np.array([0.0, -1.0, 0.0, -1.0])
    v = pt.half_space.vertexes_of_convex_domain(A, b)
    got = set(map(tuple, np.round(v.T, 10)))
    assert got == {(0, 0), (0, 1), (1, 0), (1, 1)}


def test_interior_point_matches_reference_validity(golden):
    n, x0 = _unit_box_halfspaces()
    box = np.array([[0, 1], [0, 1], [0, 1.0]])
    ours = pt.half_space.half_space_interior_point(n, x0, box)

    def compute(ref_pp):
        import porepy.geometry.half_space as ref_hs

        return {"p": np.asarray(ref_hs.half_space_interior_point(n, x0, box))}

    theirs = golden(compute)["p"]
    for p in (ours, theirs):
        assert pt.half_space.point_inside_half_space_intersection(
            n, x0, np.reshape(p, (3, 1))
        )[0]
