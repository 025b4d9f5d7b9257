"""Compositional flow templates: instantiation, closure via local
elimination, component transport behavior, and the two-phase fractional-flow
variant (reference ``models/compositional_flow.py``)."""

import numpy as np
import pytest

import porepy_tpu as pt
from porepy_tpu.compositional._core import PhysicalState
from porepy_tpu.models import compositional_flow as cf

CP = 42.0  # specific heat used in the enthalpy-temperature closure


class _TracerCF(pt.LocalElimination, pt.CompositionalFlowTemplate):
    """Single-phase, two-component transport: water carrier + tracer, closed
    by eliminating temperature against enthalpy (T = h / c_p + T_ref)."""

    def initialize_data_saving(self):
        pass

    def save_data_time_step(self):
        pass

    def get_components(self):
        water = pt.FluidComponent(
            name="water", compressibility=1e-8, viscosity=1.0, density=1.0,
            specific_heat_capacity=CP,
        )
        tracer = pt.FluidComponent(
            name="tracer", compressibility=1e-8, viscosity=1.0, density=1.0,
            specific_heat_capacity=CP,
        )
        return [water, tracer]

    def set_equations(self):
        super().set_equations()
        # Close temperature: T - (h/cp + T_ref) = 0 locally.
        t_ref = float(self.reference_variable_values.temperature)
        self.eliminate_locally(
            lambda sds: self.equation_system.md_variable(
                self.temperature_variable, sds
            ),
            [lambda sds: self.enthalpy(sds)],
            lambda h: (h / CP + t_ref, np.vstack([np.full(h.size, 1.0 / CP)])),
            self.mdg.subdomains(),
        )

    # Inflow of tracer-rich fluid on the west boundary, outflow east.
    def bc_type_fluid_flux(self, sd):
        sides = self.domain_boundary_sides(sd)
        return pt.BoundaryCondition(sd, sides.west | sides.east, "dir")

    def bc_type_darcy_flux(self, sd):
        sides = self.domain_boundary_sides(sd)
        return pt.BoundaryCondition(sd, sides.west | sides.east, "dir")

    def bc_values_pressure(self, bg):
        sides = self.domain_boundary_sides(bg)
        vals = np.zeros(bg.num_cells)
        vals[sides.west] = 1.0
        return vals

    def bc_values_overall_fraction(self, component, bg):
        sides = self.domain_boundary_sides(bg)
        vals = np.zeros(bg.num_cells)
        if component.name == "tracer":
            vals[sides.west] = 0.5
        return vals

    def ic_values_overall_fraction(self, component, sd):
        return np.zeros(sd.num_cells)


def _tracer_params():
    return {
        "grid_type": "cartesian",
        "meshing_arguments": {"cell_size": 0.125},
        "material_constants": {
            "solid": pt.SolidConstants(permeability=1.0, porosity=0.2),
        },
        "time_manager": pt.TimeManager([0, 0.4], 0.1, constant_dt=True),
    }


@pytest.fixture(scope="module")
def tracer_model():
    params = _tracer_params()
    m = _TracerCF(params)
    pt.run_time_dependent_model(m, params)
    return m


def test_cf_template_runs_and_closes(tracer_model):
    m = tracer_model
    eq = m.equation_system
    names = {v.name for v in eq.variables}
    assert {"pressure", "enthalpy", "temperature", "z_tracer"} <= names
    # Temperature closure holds at convergence.
    h = eq.get_variable_values(["enthalpy"], time_step_index=0)
    T = eq.get_variable_values(["temperature"], time_step_index=0)
    t_ref = float(m.reference_variable_values.temperature)
    assert np.allclose(T, h / CP + t_ref, atol=1e-8)


def test_cf_tracer_advances_from_inlet(tracer_model):
    m = tracer_model
    z = m.equation_system.get_variable_values(["z_tracer"], time_step_index=0)
    sd = m.mdg.subdomains()[0]
    x = sd.cell_centers[0]
    # Fractions stay in [0, 1/2] and are (weakly) decreasing downstream.
    assert z.min() > -1e-8 and z.max() < 0.5 + 1e-8
    west_mean = z[x < 0.25].mean()
    east_mean = z[x > 0.75].mean()
    assert west_mean > east_mean
    assert west_mean > 0.05  # tracer actually entered


def test_cf_primary_listing(tracer_model):
    m = tracer_model
    eqs = cf.get_primary_equations_cf(m)
    assert "mass_balance_equation" in eqs
    assert "energy_balance_equation" in eqs
    assert any("component_mass_balance" in e for e in eqs)
    pvars = cf.get_primary_variables_cf(m)
    assert "pressure" in pvars and "enthalpy" in pvars and "z_tracer" in pvars


class _GasEos(pt.EquationOfState):
    """Toy EoS: rho = p / (R T0) with derivative wrt p; other properties
    constant."""

    R = 2.0

    def compute_phase_properties(self, phase_state, p):
        n = p.size
        rho = p / self.R
        drho = np.vstack([np.full(n, 1.0 / self.R)])
        return pt.PhaseState(
            rho=rho, drho=drho,
            h=np.full(n, 5.0), dh=np.zeros((1, n)),
            mu=np.full(n, 0.1), dmu=np.zeros((1, n)),
            kappa=np.full(n, 1.0), dkappa=np.zeros((1, n)),
        )


class _TwoPhaseCFF(pt.LocalElimination, pt.CompositionalFractionalFlowTemplate):
    """Two-phase (liquid water / gas) immiscible fractional flow; gas phase
    properties surrogate-backed by a toy EoS; saturation and phase fraction
    of gas eliminated locally against the overall gas fraction."""

    def initialize_data_saving(self):
        pass

    def save_data_time_step(self):
        pass

    def get_components(self):
        water = pt.FluidComponent(
            name="water", compressibility=1e-8, viscosity=1.0, density=1.0,
            specific_heat_capacity=CP,
        )
        gas = pt.FluidComponent(
            name="gas", compressibility=1e-5, viscosity=0.1, density=0.1,
            specific_heat_capacity=CP,
        )
        return [water, gas]

    def get_phase_configuration(self, components):
        return [
            (PhysicalState.liquid, "liquid", None),
            (PhysicalState.gas, "gas", _GasEos(components)),
        ]

    def set_components_in_phases(self, components, phases):
        phases[0].components = [components[0]]
        phases[1].components = [components[1]]

    def dependencies_of_phase_properties(self, phase):
        if phase.name == "gas":
            return [lambda domains: self.pressure(domains)]
        return []

    def set_equations(self):
        super().set_equations()
        t_ref = float(self.reference_variable_values.temperature)
        self.eliminate_locally(
            lambda sds: self.equation_system.md_variable(
                self.temperature_variable, sds
            ),
            [lambda sds: self.enthalpy(sds)],
            lambda h: (h / CP + t_ref, np.vstack([np.full(h.size, 1.0 / CP)])),
            self.mdg.subdomains(),
        )
        # Test closure: s_gas = z_gas (no y-variables exist without an
        # equilibrium condition; the formulation is saturation-based).
        gas = self.fluid.phases[1]
        ident = lambda z: (z, np.ones((1, z.size)))  # noqa: E731
        self.eliminate_locally(
            lambda sds: self.equation_system.md_variable(
                self._saturation_variable(gas), sds
            ),
            [lambda sds: self.equation_system.md_variable("z_gas", sds)],
            ident,
            self.mdg.subdomains(),
        )

    def bc_type_fluid_flux(self, sd):
        sides = self.domain_boundary_sides(sd)
        return pt.BoundaryCondition(sd, sides.west | sides.east, "dir")

    def bc_type_darcy_flux(self, sd):
        sides = self.domain_boundary_sides(sd)
        return pt.BoundaryCondition(sd, sides.west | sides.east, "dir")

    def bc_values_pressure(self, bg):
        sides = self.domain_boundary_sides(bg)
        vals = np.full(bg.num_cells, 1.0)
        vals[sides.west] = 2.0
        return vals

    def bc_values_fractional_flow_component(self, component, bg):
        sides = self.domain_boundary_sides(bg)
        vals = np.zeros(bg.num_cells)
        if component.name == "gas":
            vals[sides.west] = 0.2
        return vals

    def ic_values_pressure(self, sd):
        return np.full(sd.num_cells, 1.0)

    def ic_values_overall_fraction(self, component, sd):
        if component.name == "gas":
            return np.full(sd.num_cells, 0.1)
        return np.zeros(sd.num_cells)

    def ic_values_saturation(self, phase, sd):
        return np.full(sd.num_cells, 0.1)


def test_cff_two_phase_runs():
    params = {
        "grid_type": "cartesian",
        "meshing_arguments": {"cell_size": 0.25},
        "fractional_flow": True,
        "enable_buoyancy_effects": False,
        "material_constants": {
            "solid": pt.SolidConstants(permeability=1.0, porosity=0.2),
        },
        "time_manager": pt.TimeManager([0, 0.2], 0.1, constant_dt=True),
        "max_iterations": 30,
    }
    m = _TwoPhaseCFF(params)
    pt.run_time_dependent_model(m, params)
    eq = m.equation_system
    z = eq.get_variable_values(["z_gas"], time_step_index=0)
    s = eq.get_variable_values(["s_gas"], time_step_index=0)
    assert np.all(np.isfinite(z))
    # Closure holds at convergence (no y-variables without equilibrium).
    assert np.allclose(s, z, atol=1e-8)
    # Gas stays within physical bounds.
    assert z.min() > -1e-6 and z.max() < 1.0
    # Surrogate gas density tracks the toy EoS exactly.
    gas = m.fluid.phases[1]
    p = eq.get_variable_values(["pressure"], iterate_index=0)
    rho_g = gas.density.subdomain_values
    assert np.allclose(rho_g, p / _GasEos.R, atol=1e-10)


def test_mass_weighted_permeability_tensor_updates():
    """The fractional-flow Darcy tensor refreshes with the state (lagged
    rediscretization)."""
    params = {
        "grid_type": "cartesian",
        "meshing_arguments": {"cell_size": 0.5},
        "fractional_flow": True,
        "enable_buoyancy_effects": False,
        "material_constants": {
            "solid": pt.SolidConstants(permeability=2.0, porosity=0.2),
        },
    }
    m = _TwoPhaseCFF(params)
    m.prepare_simulation()
    sds = m.mdg.subdomains()
    val = m.equation_system.evaluate(
        m.mass_mobility_weighted_permeability(sds)
    )
    # k * sum_j rho_j k_r(s_j)/mu_j with s_g = 0.1, rho_l = 1/mu_l = 1,
    # rho_g = p/R = 0.5, mu_g = 0.1: 2 * (0.9*1*1 + 0.1*0.5/0.1) = 2.8
    assert np.allclose(val, 2.0 * (0.9 + 0.5), atol=1e-10)
