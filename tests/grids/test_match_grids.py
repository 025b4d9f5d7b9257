"""Parity tests for match_grids against the reference implementation
(golden-backed record/replay)."""

import numpy as np
import pytest

from porepy_tpu.grids import match_grids, refinement
from porepy_tpu.grids.simplex import TriangleGrid
from porepy_tpu.grids.structured import TensorGrid


def _make_1d(nodes):
    g = TensorGrid(np.asarray(nodes, dtype=float))
    g.compute_geometry()
    return g


@pytest.mark.parametrize("scaling", [None, "averaged", "integrated"])
def test_match_1d_parity(golden, scaling):
    old = _make_1d(np.linspace(0, 1, 5))
    new = _make_1d(np.array([0.0, 0.3, 0.55, 0.8, 1.0]))
    mine = match_grids.match_1d(new, old, tol=1e-8, scaling=scaling)

    def compute(ref_pp):
        old_r = ref_pp.TensorGrid(np.linspace(0, 1, 5))
        new_r = ref_pp.TensorGrid(np.array([0.0, 0.3, 0.55, 0.8, 1.0]))
        old_r.compute_geometry()
        new_r.compute_geometry()
        return {
            "m": ref_pp.match_grids.match_1d(
                new_r, old_r, tol=1e-8, scaling=scaling
            ).tocsr()
        }

    rec = golden(compute)
    assert mine.shape == rec["m"].shape
    assert np.allclose(mine.toarray(), rec["m"].toarray())
    if scaling == "averaged":
        assert np.allclose(np.asarray(mine.sum(axis=1)).ravel(), 1.0)


@pytest.mark.parametrize("scaling", [None, "averaged", "integrated"])
def test_match_2d_parity(golden, scaling):
    old = TriangleGrid(
        np.array([[0, 1, 0, 1.0], [0, 0, 1, 1.0]]),
    )
    old.compute_geometry()
    new = refinement.refine_triangle_grid(old)[0]
    new.compute_geometry()
    mine = match_grids.match_2d(new, old, tol=1e-8, scaling=scaling)

    def compute(ref_pp):
        old_r = ref_pp.TriangleGrid(np.array([[0, 1, 0, 1.0], [0, 0, 1, 1.0]]))
        old_r.compute_geometry()
        new_r = ref_pp.refinement.refine_triangle_grid(old_r)[0]
        new_r.compute_geometry()
        return {
            "m": ref_pp.match_grids.match_2d(
                new_r, old_r, tol=1e-8, scaling=scaling
            ).tocsr()
        }

    rec = golden(compute)
    assert mine.shape == rec["m"].shape
    assert np.allclose(mine.toarray(), rec["m"].toarray())


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
