"""Parity tests for match_grids against the reference implementation."""

import numpy as np
import pytest

from porepy_tpu.grids import match_grids, refinement
from porepy_tpu.grids.simplex import TriangleGrid
from porepy_tpu.grids.structured import TensorGrid


def _ref_pp():
    from tools.refshim import pp

    return pp


def _make_1d(nodes):
    g = TensorGrid(np.asarray(nodes, dtype=float))
    g.compute_geometry()
    return g


@pytest.mark.parametrize("scaling", [None, "averaged", "integrated"])
def test_match_1d_parity(scaling):
    pp = _ref_pp()
    old = _make_1d(np.linspace(0, 1, 5))
    new = _make_1d(np.array([0.0, 0.3, 0.55, 0.8, 1.0]))
    mine = match_grids.match_1d(new, old, tol=1e-8, scaling=scaling)

    old_r = pp.TensorGrid(np.linspace(0, 1, 5))
    new_r = pp.TensorGrid(np.array([0.0, 0.3, 0.55, 0.8, 1.0]))
    old_r.compute_geometry()
    new_r.compute_geometry()
    theirs = pp.match_grids.match_1d(new_r, old_r, tol=1e-8, scaling=scaling)

    assert mine.shape == theirs.shape
    assert np.allclose(mine.toarray(), theirs.toarray())
    if scaling == "averaged":
        assert np.allclose(np.asarray(mine.sum(axis=1)).ravel(), 1.0)


@pytest.mark.parametrize("scaling", [None, "averaged", "integrated"])
def test_match_2d_parity(scaling):
    pp = _ref_pp()
    old = TriangleGrid(
        np.array([[0, 1, 0, 1.0], [0, 0, 1, 1.0]]),
    )
    old.compute_geometry()
    new = refinement.refine_triangle_grid(old)[0]
    new.compute_geometry()
    mine = match_grids.match_2d(new, old, tol=1e-8, scaling=scaling)

    old_r = pp.TriangleGrid(np.array([[0, 1, 0, 1.0], [0, 0, 1, 1.0]]))
    old_r.compute_geometry()
    new_r = pp.refinement.refine_triangle_grid(old_r)[0]
    new_r.compute_geometry()
    theirs = pp.match_grids.match_2d(new_r, old_r, tol=1e-8, scaling=scaling)

    assert mine.shape == theirs.shape
    assert np.allclose(mine.toarray(), theirs.toarray())


def test_match_2d_self_identity():
    g = TriangleGrid(np.array([[0, 1, 0, 1.0], [0, 0, 1, 1.0]]))
    g.compute_geometry()
    m = match_grids.match_2d(g, g, tol=1e-8, scaling="integrated")
    assert np.allclose(m.toarray(), np.eye(g.num_cells))


def test_match_2d_rejects_non_simplex():
    from porepy_tpu.grids.structured import CartGrid

    g = CartGrid([2, 2])
    g.compute_geometry()
    with pytest.raises(ValueError, match="simplex"):
        match_grids.match_2d(g, g, tol=1e-8)
