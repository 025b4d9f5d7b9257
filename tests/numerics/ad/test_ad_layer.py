"""AD layer tests: operator algebra values/Jacobians vs the reference
forward-mode AD, equation-system dof bookkeeping, coloring validity, Schur
complement, and a TPFA-based equation whose Jacobian must equal div @ flux.
"""

import numpy as np
import pytest
import scipy.sparse as sps

import porepy_tpu as pt
from tests.conftest import assert_sparse_equal


def make_eq_sys(nx=(4, 3), nvar=1):
    g = pt.CartGrid(list(nx))
    g.compute_geometry()
    mdg = pt.MixedDimensionalGrid()
    mdg.add_subdomains(g)
    mdg.compute_geometry()
    eq = pt.ad.EquationSystem(mdg)
    names = ["pressure", "temperature", "salinity"][:nvar]
    mdvars = [eq.create_variables(n, {"cells": 1}, subdomains=[g]) for n in names]
    return g, mdg, eq, mdvars


@pytest.mark.parametrize(
    "expr",
    [
        lambda p, m: p * p + 2.0 * p,
        lambda p, m: p / (p + 10.0) - 3.0,
        lambda p, m: m.exp(p) * p - m.log(p + 10.0),
        lambda p, m: (p**2.0) * m.sin(p),
        lambda p, m: m.maximum(p, 0.5 * p + 0.1),
    ],
)
def test_operator_algebra_parity(golden, expr):
    """Values and Jacobians of composite expressions match the reference's
    scipy forward mode seeded with identity."""
    g, mdg, eq, (p_md,) = make_eq_sys()
    rng = np.random.default_rng(3)
    vals = rng.uniform(0.5, 2.0, g.num_cells)
    eq.set_variable_values(vals, iterate_index=0)

    class _M:  # our ad function namespace
        exp = staticmethod(pt.ad.exp)
        log = staticmethod(pt.ad.log)
        sin = staticmethod(pt.ad.sin)
        maximum = staticmethod(pt.ad.maximum)

    res = expr(p_md, _M).value_and_jacobian(eq)

    def compute(ref_pp):
        # Reference: same expression on an AdArray with identity jacobian.
        (p_ref,) = ref_pp.ad.initAdArrays([vals])

        class _R:
            exp = staticmethod(ref_pp.ad.exp)
            log = staticmethod(ref_pp.ad.log)
            sin = staticmethod(ref_pp.ad.sin)
            maximum = staticmethod(ref_pp.ad.maximum)

        ref = expr(p_ref, _R)
        return {"val": np.asarray(ref.val), "jac": sps.csr_matrix(ref.jac)}

    ref = golden(compute)
    np.testing.assert_allclose(res.val, ref["val"], rtol=1e-12, atol=1e-14)
    assert_sparse_equal(res.jac, ref["jac"], atol=1e-12)


def test_matmul_and_projections():
    g, mdg, eq, (p_md,) = make_eq_sys()
    vals = np.arange(g.num_cells, dtype=float) + 1.0
    eq.set_variable_values(vals, iterate_index=0)

    div = pt.ad.Divergence([g])
    # flux-like operator: random sparse matrix times p
    rng = np.random.default_rng(0)
    F = sps.random(g.num_faces, g.num_cells, density=0.1, random_state=1).tocsr()
    expr = div @ (pt.ad.SparseArray(F) @ p_md)
    out = expr.value_and_jacobian(eq)
    expected = (div.mat @ F) @ vals
    np.testing.assert_allclose(out.val, expected, atol=1e-12)
    assert_sparse_equal(out.jac, (div.mat @ F).tocsr(), atol=1e-12)


def test_previous_timestep_and_iteration():
    g, mdg, eq, (p_md,) = make_eq_sys()
    now = np.full(g.num_cells, 5.0)
    old = np.full(g.num_cells, 2.0)
    eq.set_variable_values(now, iterate_index=0)
    eq.set_variable_values(old, time_step_index=0)

    incr = pt.ad.time_increment(p_md)
    out = incr.value_and_jacobian(eq)
    np.testing.assert_allclose(out.val, now - old)
    # Jacobian only sees the current iterate.
    assert_sparse_equal(out.jac, sps.eye(g.num_cells))

    ddt = pt.ad.dt(p_md, 0.5)
    np.testing.assert_allclose(ddt.value(eq), (now - old) / 0.5)

    prev_it = p_md.previous_iteration()
    eq.shift_iterate_values()
    eq.set_variable_values(np.full(g.num_cells, 7.0), iterate_index=0)
    np.testing.assert_allclose(prev_it.value(eq), now)
    out2 = prev_it.value_and_jacobian(eq)
    assert out2.jac.nnz == 0


def test_multi_variable_dofs_and_ordering():
    g, mdg, eq, (p, T, s) = make_eq_sys(nvar=3)
    n = g.num_cells
    assert eq.num_dofs() == 3 * n
    # Grid-wise clustering with creation order within the grid.
    np.testing.assert_array_equal(eq.dofs_of([p]), np.arange(n))
    np.testing.assert_array_equal(eq.dofs_of([T]), np.arange(n, 2 * n))
    np.testing.assert_array_equal(eq.dofs_of(["salinity"]), np.arange(2 * n, 3 * n))

    eq.set_variable_values(np.ones(n), variables=[T], iterate_index=0)
    all_vals = eq.get_variable_values(iterate_index=0)
    np.testing.assert_allclose(all_vals[n : 2 * n], 1.0)
    np.testing.assert_allclose(all_vals[:n], 0.0)

    # Jacobian of an expression in T has columns only in T's block.
    out = (T * T).value_and_jacobian(eq)
    assert out.jac.shape == (n, 3 * n)
    cols = np.unique(out.jac.tocoo().col)
    assert cols.min() >= n and cols.max() < 2 * n


def test_tpfa_equation_assembly():
    """Residual div(flux(p)) with Dirichlet data assembled through the
    equation system: Jacobian == div @ flux, solution reproduces linear
    field."""
    g, mdg, eq, (p,) = make_eq_sys(nx=(6, 5))
    k = pt.SecondOrderTensor(np.ones(g.num_cells))
    bf = g.get_boundary_faces()
    bc = pt.BoundaryCondition(g, bf, "dir")
    data = mdg.subdomain_data(g)
    pt.initialize_data(data, "flow", {"second_order_tensor": k, "bc": bc})
    pt.Tpfa("flow").discretize(g, data)
    md = data[pt.DISCRETIZATION_MATRICES]["flow"]

    bc_values = np.zeros(g.num_faces)
    bc_values[bf] = g.face_centers[0, bf]

    div = pt.ad.Divergence([g])
    flux = pt.ad.SparseArray(md["flux"]) @ p + pt.ad.DenseArray(
        md["bound_flux"] @ bc_values
    )
    residual = div @ flux
    residual.set_name("mass_balance")
    eq.set_equation(residual)

    A, b = eq.assemble()
    assert_sparse_equal(A, (div.mat @ md["flux"]).tocsr(), atol=1e-12)
    sol = sps.linalg.spsolve(A.tocsr(), b)
    np.testing.assert_allclose(sol, g.cell_centers[0], atol=1e-10)


def test_coloring_valid():
    rng = np.random.default_rng(5)
    pat = sps.random(40, 30, density=0.15, random_state=2).astype(bool).tocsr()
    from porepy_tpu.numerics.ad.compiler import greedy_color

    colors, nc = greedy_color(pat)
    assert colors.min() >= 0 and colors.max() < nc
    # No two same-colored columns share a row.
    coo = pat.tocoo()
    for r in range(pat.shape[0]):
        cols = coo.col[coo.row == r]
        assert len(set(colors[cols])) == len(cols)


def test_schur_complement_roundtrip():
    g, mdg, eq, (p, T) = make_eq_sys(nx=(3, 3), nvar=2)
    n = g.num_cells
    rng = np.random.default_rng(9)
    eq.set_variable_values(rng.uniform(1, 2, 2 * n), iterate_index=0)

    eq1 = p * p + 0.3 * T
    eq1.set_name("primary_eq")
    eq2 = T * 2.0 + p * 0.1 - 1.0
    eq2.set_name("secondary_eq")
    eq.set_equation(eq1)
    eq.set_equation(eq2)

    A, b = eq.assemble()
    x_full = sps.linalg.spsolve(A.tocsr(), b)

    S, rb = eq.assemble_schur_complement_system(["primary_eq"], [p])
    x_p = sps.linalg.spsolve(S.tocsr(), rb)
    x_rec = eq.expand_schur_complement_solution(x_p)
    np.testing.assert_allclose(x_rec, x_full, atol=1e-10)


def test_l2_norm_pattern_and_value():
    g, mdg, eq, _ = make_eq_sys(nx=(3, 2))
    u = eq.create_variables("u", {"cells": 2}, subdomains=[g])
    n = g.num_cells
    vals = np.arange(2 * n, dtype=float) + 1.0
    eq.set_variable_values(vals, variables=[u], iterate_index=0)
    norm = pt.ad.l2_norm(2, u)
    out = norm.value_and_jacobian(eq)
    expected = np.linalg.norm(vals.reshape(-1, 2), axis=1)
    np.testing.assert_allclose(out.val, expected)
    assert out.jac.shape == (n, eq.num_dofs())
    # Each row depends on exactly its two components.
    assert np.all(np.diff(out.jac.indptr) == 2)
