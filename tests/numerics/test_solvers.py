"""Nonlinear solver extensions: line search and Anderson acceleration."""

import numpy as np

import porepy_tpu as pt


class _ContactSolver(
    pt.ConstraintLineSearch,
    pt.SplineInterpolationLineSearch,
    pt.LineSearchNewtonSolver,
):
    pass


def test_constraint_line_search_contact_model():
    """The constraint-aware line-search Newton converges to the same
    sliding-contact solution as plain Newton."""

    class Model(pt.ContactIndicators, pt.MomentumBalance):
        def set_fractures(self):
            self._fractures = [np.array([[0.25, 0.75], [0.5, 0.5]])]

        def meshing_arguments(self):
            return {"cell_size": 0.25}

        def bc_values_displacement(self, bg):
            vals = np.zeros((self.nd, bg.num_cells))
            north = self.domain_boundary_sides(bg).north
            vals[0, north] = 0.05
            vals[1, north] = -0.002
            return vals.ravel("F")

        def initialize_data_saving(self):
            pass

        def save_data_time_step(self):
            pass

    base_params = {"suppress_export": True}
    m_plain = Model(dict(base_params))
    pt.run_time_dependent_model(m_plain, m_plain.params)
    t_plain = m_plain.equation_system.get_variable_values(
        ["contact_traction"], iterate_index=0
    )

    ls_params = {
        "global_line_search": True,
        "local_line_search": True,
        "adaptive_indicator_scaling": True,
        "nonlinear_solver": _ContactSolver,
        "nl_convergence_tol_res": 1e-10,
        "suppress_export": True,
    }
    m_ls = Model(ls_params)
    pt.run_time_dependent_model(m_ls, ls_params)
    t_ls = m_ls.equation_system.get_variable_values(
        ["contact_traction"], iterate_index=0
    )
    assert np.abs(t_plain - t_ls).max() < 1e-10


def test_anderson_acceleration_speeds_up_fixed_point():
    """Anderson depth-2 converges a contractive linear fixed point faster
    than plain Picard."""
    rng = np.random.default_rng(5)
    n = 10
    A = 0.9 * np.diag(rng.uniform(0.5, 1.0, n))
    b = rng.random(n)
    x_true = np.linalg.solve(np.eye(n) - A, b)

    def g(x):
        return A @ x + b

    def run(accelerate):
        acc = pt.AndersonAcceleration(dimension=n, depth=2)
        x = np.zeros(n)
        for it in range(25):
            gx = g(x)
            fx = gx - x
            x = acc.apply(gx, fx, it) if accelerate else gx
        return np.linalg.norm(x - x_true)

    err_plain = run(False)
    err_acc = run(True)
    assert err_acc < 1e-2 * err_plain
