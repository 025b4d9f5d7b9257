"""Parity tests for boundary-condition flags and material tensors against the
reference implementation (``params/bc.py``, ``params/tensor.py``)."""

import numpy as np
import pytest

import porepy_tpu as pt


@pytest.mark.parametrize("nx", [[4, 3], [3, 2, 2]])
def test_boundary_condition_parity(golden, nx):
    g = pt.CartGrid(nx)
    g.compute_geometry()
    bf = g.get_boundary_faces()
    cond = ["dir" if i % 3 == 0 else ("rob" if i % 3 == 1 else "neu") for i in range(bf.size)]
    bc = pt.BoundaryCondition(g, bf, cond)

    def compute(ref_pp):
        g_ref = ref_pp.CartGrid(nx)
        g_ref.compute_geometry()
        bc_ref = ref_pp.BoundaryCondition(g_ref, bf, cond)
        return {
            "is_dir": bc_ref.is_dir, "is_neu": bc_ref.is_neu,
            "is_rob": bc_ref.is_rob, "bf": np.sort(bc_ref.bf),
        }

    ref = golden(compute)
    np.testing.assert_array_equal(bc.is_dir, ref["is_dir"])
    np.testing.assert_array_equal(bc.is_neu, ref["is_neu"])
    np.testing.assert_array_equal(bc.is_rob, ref["is_rob"])
    np.testing.assert_array_equal(np.sort(bc.bf), ref["bf"])


def test_boundary_condition_vectorial_parity(golden):
    nx = [3, 3]
    g = pt.CartGrid(nx)
    g.compute_geometry()
    bf = g.get_boundary_faces()
    cond = ["dir" if i % 2 == 0 else "neu" for i in range(bf.size)]
    bc = pt.BoundaryConditionVectorial(g, bf, cond)

    def compute(ref_pp):
        g_ref = ref_pp.CartGrid(nx)
        g_ref.compute_geometry()
        bc_ref = ref_pp.BoundaryConditionVectorial(g_ref, bf, cond)
        return {"is_dir": bc_ref.is_dir, "is_neu": bc_ref.is_neu}

    ref = golden(compute)
    np.testing.assert_array_equal(bc.is_dir, ref["is_dir"])
    np.testing.assert_array_equal(bc.is_neu, ref["is_neu"])


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


def test_second_order_tensor_parity(golden):
    rng = np.random.default_rng(0)
    nc = 7
    kxx = rng.uniform(1, 2, nc)
    kyy = rng.uniform(1, 2, nc)
    kxy = rng.uniform(-0.3, 0.3, nc)
    t = pt.SecondOrderTensor(kxx, kyy=kyy, kxy=kxy)
    ref = golden(lambda ref_pp: {
        "values": ref_pp.SecondOrderTensor(kxx, kyy=kyy, kxy=kxy).values
    })
    np.testing.assert_allclose(t.values, ref["values"])


def test_fourth_order_tensor_parity(golden):
    rng = np.random.default_rng(1)
    nc = 5
    mu = rng.uniform(1, 2, nc)
    lm = rng.uniform(1, 2, nc)
    t = pt.FourthOrderTensor(mu, lm)
    ref = golden(lambda ref_pp: {
        "values": ref_pp.FourthOrderTensor(mu, lm).values
    })
    np.testing.assert_allclose(t.values, ref["values"])


def test_second_order_tensor_not_spd():
    with pytest.raises(ValueError):
        pt.SecondOrderTensor(np.array([1.0]), kyy=np.array([1.0]), kxy=np.array([2.0]))
