"""Parity tests for boundary-condition flags and material tensors against the
reference implementation (``params/bc.py``, ``params/tensor.py``)."""

import numpy as np
import pytest

import porepy_tpu as pt
from tests.conftest import requires_reference


@requires_reference
@pytest.mark.parametrize("nx", [[4, 3], [3, 2, 2]])
def test_boundary_condition_parity(ref_pp, nx):
    g_ref = ref_pp.CartGrid(nx)
    g_ref.compute_geometry()
    g = pt.CartGrid(nx)
    g.compute_geometry()

    bf = g.get_boundary_faces()
    cond = ["dir" if i % 3 == 0 else ("rob" if i % 3 == 1 else "neu") for i in range(bf.size)]

    bc = pt.BoundaryCondition(g, bf, cond)
    bc_ref = ref_pp.BoundaryCondition(g_ref, bf, cond)

    np.testing.assert_array_equal(bc.is_dir, bc_ref.is_dir)
    np.testing.assert_array_equal(bc.is_neu, bc_ref.is_neu)
    np.testing.assert_array_equal(bc.is_rob, bc_ref.is_rob)
    np.testing.assert_array_equal(np.sort(bc.bf), np.sort(bc_ref.bf))


@requires_reference
def test_boundary_condition_vectorial_parity(ref_pp):
    nx = [3, 3]
    g_ref = ref_pp.CartGrid(nx)
    g_ref.compute_geometry()
    g = pt.CartGrid(nx)
    g.compute_geometry()

    bf = g.get_boundary_faces()
    cond = ["dir" if i % 2 == 0 else "neu" for i in range(bf.size)]
    bc = pt.BoundaryConditionVectorial(g, bf, cond)
    bc_ref = ref_pp.BoundaryConditionVectorial(g_ref, bf, cond)
    np.testing.assert_array_equal(bc.is_dir, bc_ref.is_dir)
    np.testing.assert_array_equal(bc.is_neu, bc_ref.is_neu)


def test_bc_default_neumann():
    g = pt.CartGrid([3, 3])
    g.compute_geometry()
    bc = pt.BoundaryCondition(g)
    assert bc.is_neu[g.get_boundary_faces()].all()
    assert not bc.is_dir.any()
    with pytest.raises(ValueError):
        # Interior face may not carry a condition.
        interior = g.get_internal_faces()[:1]
        pt.BoundaryCondition(g, interior, "dir")


@requires_reference
def test_second_order_tensor_parity(ref_pp):
    rng = np.random.default_rng(0)
    nc = 7
    kxx = rng.uniform(1, 2, nc)
    kyy = rng.uniform(1, 2, nc)
    kxy = rng.uniform(-0.3, 0.3, nc)
    t = pt.SecondOrderTensor(kxx, kyy=kyy, kxy=kxy)
    t_ref = ref_pp.SecondOrderTensor(kxx, kyy=kyy, kxy=kxy)
    np.testing.assert_allclose(t.values, t_ref.values)


@requires_reference
def test_fourth_order_tensor_parity(ref_pp):
    rng = np.random.default_rng(1)
    nc = 5
    mu = rng.uniform(1, 2, nc)
    lm = rng.uniform(1, 2, nc)
    t = pt.FourthOrderTensor(mu, lm)
    t_ref = ref_pp.FourthOrderTensor(mu, lm)
    np.testing.assert_allclose(t.values, t_ref.values)


def test_second_order_tensor_not_spd():
    with pytest.raises(ValueError):
        pt.SecondOrderTensor(np.array([1.0]), kyy=np.array([1.0]), kxy=np.array([2.0]))
