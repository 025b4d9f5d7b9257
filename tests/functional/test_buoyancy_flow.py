"""Buoyancy-driven two-phase flow: flux reciprocity, mass conservation and
gravity segregation in a CLOSED box (counterpart of reference
``tests/functional/test_buoyancy_flow.py`` — same three invariants:
pairwise-reciprocal buoyancy fluxes, conservative buoyant transport, and
the physically expected stratification; run here on the immiscible
two-phase fractional-flow model with hybrid upwinding)."""

import numpy as np
import pytest

import porepy_tpu as pt
from tests.models.test_cff_parity import (
    GAS_RHO,
    MISCIBLE,
    _common_params,
    _wire,
    mod_states,
)


@pytest.fixture(scope="module")
def model():
    """Closed unit square under gravity: light gas initially at the
    BOTTOM half (unstable stratification) must rise."""
    GAS_RHO[:] = [0.5, 0.02]  # light, mildly compressible gas
    MISCIBLE[0] = True
    mod_states[0] = pt.PhaseState
    Base = _wire(
        pt.CompositionalFractionalFlowTemplate,
        pt,
        pt.EquationOfState,
        pt.LocalElimination,
        pt.PhysicalState.liquid,
        pt.PhysicalState.gas,
    )

    class Closed(Base):
        # No-flow everywhere (default Neumann BC on every side).
        def bc_type_fluid_flux(self, sd):
            return pt.BoundaryCondition(sd)

        def bc_type_darcy_flux(self, sd):
            return pt.BoundaryCondition(sd)

        def ic_values_overall_fraction(self, component, sd):
            z = np.zeros(sd.num_cells)
            if component.name == "co2":
                z[sd.cell_centers[1] < 0.5] = 0.3  # gas below: unstable
            return z

        def ic_values_saturation(self, phase, sd):
            return self.ic_values_overall_fraction(
                self.fluid.components[1], sd
            )

        def initial_condition(self):
            super().initial_condition()
            gas = self.fluid.phases[1]
            vals = np.concatenate(
                [
                    self.ic_values_saturation(gas, sd)
                    for sd in self.mdg.subdomains()
                ]
            )
            self.equation_system.set_variable_values(
                vals,
                [self._saturation_variable(gas)],
                time_step_index=0,
                iterate_index=0,
            )

    params = {
        **_common_params(pt),
        "enable_buoyancy_effects": True,
        "time_manager": pt.TimeManager([0, 0.03], 0.01, constant_dt=True),
        "max_iterations": 60,
        "nl_convergence_tol": 1e-8,
        "nl_convergence_tol_res": 1e-7,
    }
    m = Closed(params)

    masses = []

    def total_masses():
        eq = m.equation_system
        sds = m.mdg.subdomains()
        return [
            float(
                np.sum(
                    np.asarray(eq.evaluate(m.component_mass(comp, sds)))
                )
            )
            for comp in m.fluid.components
        ]

    orig_after = m.after_nonlinear_convergence

    def after():
        orig_after()
        masses.append(total_masses())

    m.after_nonlinear_convergence = after
    pt.run_time_dependent_model(m, params)
    try:
        yield m, masses
    finally:
        GAS_RHO[:] = [0.9, 0.5]
        MISCIBLE[0] = False


def test_buoyancy_fluxes_reciprocal(model):
    """Pairwise counter-current structure: the buoyant fluxes of the two
    components are equal and opposite on every face (hybrid upwinding of
    Bosma et al. 2022), so their sum vanishes identically."""
    m, _ = model
    sds = m.mdg.subdomains()
    eq = m.equation_system
    total = sum(
        np.asarray(eq.evaluate(m.component_buoyancy(comp, sds)))
        for comp in m.fluid.components
    )
    scale = max(
        float(
            np.abs(
                np.asarray(eq.evaluate(m.component_buoyancy(comp, sds)))
            ).max()
        )
        for comp in m.fluid.components
    )
    assert scale > 0.0, "buoyant fluxes vanished; test is degenerate"
    assert np.abs(total).max() <= 1e-10 * max(scale, 1.0), (
        np.abs(total).max(),
        scale,
    )


def test_mass_conserved_in_closed_box(model):
    """No-flow box: the total mass of every component is constant over the
    simulation to the nonlinear tolerance."""
    _, masses = model
    masses = np.asarray(masses)
    assert masses.shape[0] >= 3
    for j in range(masses.shape[1]):
        drift = np.abs(masses[:, j] - masses[0, j]).max()
        assert drift <= 1e-6 * max(abs(masses[0, j]), 1.0), (j, drift)


def test_gravity_segregation(model):
    """The light gas initially at the bottom must move upward: the
    gas-fraction center of mass strictly increases from its initial
    height."""
    m, _ = model
    sd = m.mdg.subdomains()[0]
    z = m.equation_system.get_variable_values(["z_co2"], time_step_index=0)
    y = sd.cell_centers[1]
    com = float(np.sum(z * y * sd.cell_volumes) / np.sum(z * sd.cell_volumes))
    com0 = float(
        np.sum((y < 0.5) * 0.3 * y * sd.cell_volumes)
        / np.sum((y < 0.5) * 0.3 * sd.cell_volumes)
    )
    assert com > com0 + 1e-4, (com, com0)
