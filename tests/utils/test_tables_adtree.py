"""Interpolation tables, ADTree and table-lookup AD operators."""

import numpy as np
import pytest

import porepy_tpu as pt
from porepy_tpu.utils.adtree import ADTNode, ADTree
from porepy_tpu.utils.interpolation_tables import (
    AdaptiveInterpolationTable,
    InterpolationTable,
)


def _f(x, y):
    return np.sin(x) * np.cos(y) + x**2


def test_interpolation_table_parity(golden):
    low, high, npt = np.array([0.0, 0.0]), np.array([2.0, 3.0]), np.array([11, 13])
    tm = InterpolationTable(low, high, npt, _f)
    rng = np.random.default_rng(3)
    x = rng.random((2, 40)) * np.array([[2.0], [3.0]])

    def compute(ref_pp):
        import porepy.utils.interpolation_tables as rit

        tr = rit.InterpolationTable(low, high, npt, _f)
        return {
            "interp": tr.interpolate(x),
            "g0": tr.gradient(x, 0),
            "g1": tr.gradient(x, 1),
        }

    ref = golden(compute)
    assert np.allclose(tm.interpolate(x), ref["interp"])
    assert np.allclose(tm.gradient(x, 0), ref["g0"])
    assert np.allclose(tm.gradient(x, 1), ref["g1"])


def test_adaptive_interpolation_table_parity(golden):
    rng = np.random.default_rng(4)
    x = rng.random((2, 25)) * np.array([[2.0], [3.0]])
    am = AdaptiveInterpolationTable(
        np.array([0.2, 0.25]), base_point=np.zeros(2), function=_f
    )

    def compute(ref_pp):
        import porepy.utils.interpolation_tables as rit

        ar = rit.AdaptiveInterpolationTable(
            np.array([0.2, 0.25]), base_point=np.zeros(2), function=_f
        )
        return {"interp": ar.interpolate(x), "g1": ar.gradient(x, 1)}

    ref = golden(compute)
    assert np.allclose(am.interpolate(x), ref["interp"])
    assert np.allclose(am.gradient(x, 1), ref["g1"])


def test_adaptive_table_assign_values():
    table = AdaptiveInterpolationTable(np.array([0.5]), base_point=np.zeros(1))
    x = np.array([[0.25, 0.75]])
    coords, inds = table.quadrature_points_from_coordinates(x)
    table.assign_values(coords[0] ** 2, inds)
    vals = table.interpolate(x)
    # Linear interpolation of x^2 on the 0.5-lattice.
    assert np.allclose(vals[0], [0.125, 0.625])


def test_adtree_parity(golden):
    g = pt.CartGrid([6, 5], physdims=[1, 1])
    g.compute_geometry()
    tm = ADTree(4, 2)
    tm.from_grid(g)
    rng = np.random.default_rng(6)
    boxes = []
    for _ in range(20):
        lo = rng.random(2) * 0.8
        hi = lo + rng.random(2) * 0.2
        boxes.append(np.hstack((lo, hi)))

    def compute(ref_pp):
        import porepy.utils.adtree as radt

        gr = ref_pp.CartGrid(np.array([6, 5]), np.array([1.0, 1.0]))
        gr.compute_geometry()
        tr = radt.ADTree(4, 2)
        tr.from_grid(gr)
        out = {}
        for i, box in enumerate(boxes):
            out[f"hits_{i}"] = np.asarray(
                tr.search(radt.ADTNode(99, box)), dtype=int
            )
        return out

    ref = golden(compute)
    for i, box in enumerate(boxes):
        a = np.asarray(tm.search(ADTNode(99, box)), dtype=int)
        assert np.array_equal(a, ref[f"hits_{i}"]), i


def test_interpolated_function_in_compiled_residual():
    """InterpolatedFunction evaluates inside the jitted equation kernel as a
    device gather; values match direct table interpolation."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    g = pt.CartGrid([4], physdims=[1.0])
    g.compute_geometry()
    mdg = pt.MixedDimensionalGrid()
    mdg.add_subdomains(g)
    mdg.compute_geometry()
    es = pt.ad.EquationSystem(mdg)
    p = es.create_variables("p", dof_info={"cells": 1}, subdomains=[g])
    es.set_variable_values(
        np.array([0.1, 0.4, 0.7, 0.9]), ["p"], iterate_index=0
    )
    fun = pt.ad.InterpolatedFunction(
        lambda x: np.exp(x), "exp_table", 0.0, 1.0, 101
    )
    op = fun(p)
    vals = es.evaluate(op)
    exact = fun.table.interpolate(np.array([[0.1, 0.4, 0.7, 0.9]]))[0]
    assert np.allclose(vals, exact)
    assert np.abs(vals - np.exp([0.1, 0.4, 0.7, 0.9])).max() < 1e-3
