"""Surrogate operators and local elimination: externally-supplied
values/derivatives must enter assembled Jacobians exactly, historic
re-tagging must collapse to stored constants, and LocalElimination must
close a model with a dangling variable (reference
``numerics/ad/surrogate_operator.py``, ``models/abstract_equations.py:169``).
"""

import numpy as np
import pytest

import porepy_tpu as pt
from porepy_tpu.numerics import ad


def _flow_model(cell_size=0.5):
    class M(pt.SinglePhaseFlow):
        def initialize_data_saving(self):
            pass

        def save_data_time_step(self):
            pass

    params = {
        "grid_type": "cartesian",
        "meshing_arguments": {"cell_size": cell_size},
    }
    m = M(params)
    m.prepare_simulation()
    return m


def test_surrogate_value_and_jacobian_injection():
    m = _flow_model()
    eq = m.equation_system
    sds = m.mdg.subdomains()
    nc = sum(sd.num_cells for sd in sds)

    factory = ad.SurrogateFactory(
        "kappa", m.mdg, dependencies=[lambda sd: m.pressure(sd)]
    )
    rng = np.random.default_rng(7)
    vals = rng.uniform(1.0, 2.0, nc)
    ders = rng.uniform(-1.0, 1.0, (1, nc))
    i = 0
    for sd in sds:
        factory.set_values_on_grid(vals[i : i + sd.num_cells], sd)
        factory.set_derivatives_on_grid(ders[:, i : i + sd.num_cells], sd)
        i += sd.num_cells

    op = factory(sds)
    # Value: exactly the stored array.
    assert np.allclose(eq.evaluate(op), vals)
    # Jacobian: diagonal wrt pressure with exactly the stored derivatives.
    res = op.value_and_jacobian(eq)
    p_dofs = eq.dofs_of([m.pressure(sds)])
    jac = res.jac.toarray()
    assert np.allclose(jac[np.arange(nc), p_dofs], ders[0])
    jac[np.arange(nc), p_dofs] = 0.0
    assert np.allclose(jac, 0.0)


def test_surrogate_two_dependencies_jacobian():
    m = _flow_model()
    eq = m.equation_system
    sds = m.mdg.subdomains()
    intfs = m.mdg.interfaces()
    nc = sum(sd.num_cells for sd in sds)

    # Second dependency: another cell variable.
    eq.create_variables("theta", subdomains=sds)
    eq.set_variable_values(
        np.linspace(0.0, 1.0, nc), ["theta"], iterate_index=0, time_step_index=0
    )

    factory = ad.SurrogateFactory(
        "rho_g",
        m.mdg,
        dependencies=[lambda g: m.pressure(g), lambda g: eq.md_variable("theta", g)],
    )
    vals = np.arange(nc, dtype=float)
    ders = np.vstack([np.full(nc, 2.0), np.full(nc, -3.0)])
    factory.subdomain_values = vals
    factory.subdomain_derivatives = ders

    op = factory(sds)
    res = op.value_and_jacobian(eq)
    assert np.allclose(res.val, vals)
    p_dofs = eq.dofs_of([m.pressure(sds)])
    t_dofs = eq.dofs_of([eq.md_variable("theta", sds)])
    jac = res.jac.toarray()
    assert np.allclose(jac[np.arange(nc), p_dofs], 2.0)
    assert np.allclose(jac[np.arange(nc), t_dofs], -3.0)


def test_surrogate_historic_retagging_is_constant():
    m = _flow_model()
    eq = m.equation_system
    sds = m.mdg.subdomains()
    nc = sum(sd.num_cells for sd in sds)

    factory = ad.SurrogateFactory(
        "phi_s", m.mdg, dependencies=[lambda g: m.pressure(g)]
    )
    factory.subdomain_values = np.full(nc, 5.0)
    factory.subdomain_derivatives = np.full((1, nc), 9.0)
    factory.progress_values_in_time(sds)
    # New iterate values after the time shift.
    factory.subdomain_values = np.full(nc, 7.0)

    op = factory(sds)
    prev_t = op.previous_timestep()
    prev_i = op.previous_iteration()
    assert np.allclose(eq.evaluate(op), 7.0)
    assert np.allclose(eq.evaluate(prev_t), 5.0)
    # Historic forms carry no Jacobian.
    assert prev_t.value_and_jacobian(eq).jac.nnz == 0
    # previous_iteration reads the iterate ring (index 1 after a shift).
    for sd in sds:
        factory.progress_iterate_values_on_grid(
            np.full(sd.num_cells, 11.0), sd
        )
    assert np.allclose(eq.evaluate(prev_i), 7.0)
    assert np.allclose(eq.evaluate(op), 11.0)


def test_surrogate_inside_equation_drives_newton():
    """A residual ``s - surrogate(p)`` with surrogate = 2p must, in one
    Newton step of the compiled system, land on s = 2p."""
    m = _flow_model()
    eq = m.equation_system
    sds = m.mdg.subdomains()
    nc = sum(sd.num_cells for sd in sds)

    eq.create_variables("s", subdomains=sds)
    eq.set_variable_values(
        np.zeros(nc), ["s"], iterate_index=0, time_step_index=0
    )
    factory = ad.SurrogateFactory(
        "s_tilde", m.mdg, dependencies=[lambda g: m.pressure(g)]
    )
    p = eq.get_variable_values([m.pressure(sds)], iterate_index=0)
    factory.subdomain_values = 2.0 * p
    factory.subdomain_derivatives = np.full((1, nc), 2.0)

    closure = eq.md_variable("s", sds) - factory(sds)
    closure.set_name("s_closure")
    eq.set_equation(closure, sds, {"cells": 1})

    A, b = eq.assemble(equations=["s_closure"])
    dofs_s = eq.dofs_of(["s"])
    dofs_p = eq.dofs_of([m.pressure(sds)])
    A = A.toarray()
    assert np.allclose(A[np.arange(nc), dofs_s], 1.0)
    assert np.allclose(A[np.arange(nc), dofs_p], -2.0)
    assert np.allclose(b, 2.0 * p)


class _TracerFlow(pt.LocalElimination, pt.SinglePhaseFlow):
    """Flow model with a dangling variable c closed by c̃(p) = 0.1 * p."""

    def initialize_data_saving(self):
        pass

    def save_data_time_step(self):
        pass

    def create_variables(self):
        super().create_variables()
        self.equation_system.create_variables(
            "c", subdomains=self.mdg.subdomains()
        )

    def set_equations(self):
        super().set_equations()
        self.eliminate_locally(
            lambda sds: self.equation_system.md_variable("c", sds),
            [lambda sds: self.pressure(sds)],
            lambda p: (0.1 * p, np.full((1, p.size), 0.1)),
            self.mdg.subdomains(),
        )


def test_local_elimination_closes_model():
    params = {
        "grid_type": "cartesian",
        "meshing_arguments": {"cell_size": 0.25},
    }
    m = _TracerFlow(params)
    pt.run_time_dependent_model(m, params)
    p = m.equation_system.get_variable_values(["pressure"], time_step_index=0)
    c = m.equation_system.get_variable_values(["c"], time_step_index=0)
    assert np.allclose(c, 0.1 * p, atol=1e-10)
