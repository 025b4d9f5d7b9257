"""Two-phase, two-component fractional-flow parity vs the REFERENCE: both
CompositionalFractionalFlowTemplate stacks run the same immiscible gas/water
problem (surrogate gas density from a shared toy EoS, local eliminations of
temperature, gas saturation and gas phase fraction) on the same cartesian
grid; primary fields must agree."""

import numpy as np
import pytest

import porepy_tpu as pt


CP = 42.0
R_GAS = 2.0
# Gas density law rho = GAS_RHO[0] + GAS_RHO[1] * p, mutated per test (the
# buoyancy parity test uses a mild contrast so plain Newton stays stable).
GAS_RHO = [0.9, 0.5]
# Buoyancy test: both components live in both phases (the reference's
# component_buoyancy indexes partial fractions of every phase), closed by
# eliminating the independent partial fractions to the immiscible limit.
MISCIBLE = [False]


def _material_params(mod):
    return {
        "solid": mod.SolidConstants(permeability=1.0, porosity=0.2),
    }


def _common_params(mod):
    return {
        "grid_type": "cartesian",
        "meshing_arguments": {"cell_size": 0.25},
        "fractional_flow": True,
        # The reference CFF template's FluidBuoyancy defaults gravity ON
        # (reference ``fluid_property_library.py:684``); keep the parity
        # problem gravity-free.
        "enable_buoyancy_effects": False,
        "material_constants": _material_params(mod),
        "time_manager": mod.TimeManager([0, 0.02], 0.01, constant_dt=True),
        "max_iterations": 40,
        "nl_convergence_tol": 1e-10,
        "nl_convergence_tol_res": 1e-8,
        "times_to_export": [],
        "suppress_export": True,
    }


def _wire(base_template, mod, eos_cls, elimination_mixin, state_liquid, state_gas):
    """Build the FF model class over either framework's template."""

    class GasEos(eos_cls):
        def compute_phase_properties(self, phase_state, p, params=None):
            n = np.asarray(p).size
            states = mod_states[0]
            return states(
                rho=GAS_RHO[0] + GAS_RHO[1] * np.asarray(p),
                drho=np.vstack([np.full(n, GAS_RHO[1])]),
                h=np.full(n, 3.0),
                dh=np.zeros((1, n)),
                mu=np.full(n, 1.0),
                dmu=np.zeros((1, n)),
                kappa=np.full(n, 1.0),
                dkappa=np.zeros((1, n)),
            )

    class LiquidEos(eos_cls):
        """Constant liquid properties (zero pressure derivatives)."""

        def compute_phase_properties(self, phase_state, p, params=None):
            n = np.asarray(p).size
            states = mod_states[0]
            return states(
                rho=np.full(n, 1.0),
                drho=np.zeros((1, n)),
                h=np.full(n, 3.0),
                dh=np.zeros((1, n)),
                mu=np.full(n, 1.0),
                dmu=np.zeros((1, n)),
                kappa=np.full(n, 1.0),
                dkappa=np.zeros((1, n)),
            )

    class Model(elimination_mixin, base_template):
        def initialize_data_saving(self):
            pass

        def save_data_time_step(self):
            pass

        def get_components(self):
            water = mod.FluidComponent(
                name="water", compressibility=1e-8, viscosity=1.0,
                density=1.0, specific_heat_capacity=CP,
            )
            gas = mod.FluidComponent(
                name="co2", compressibility=1e-5, viscosity=0.1,
                density=0.1, specific_heat_capacity=CP,
            )
            return [water, gas]

        def get_phase_configuration(self, components):
            return [
                (state_liquid, "liquid", LiquidEos(components)),
                (state_gas, "gas", GasEos(components)),
            ]

        def set_components_in_phases(self, components, phases):
            if MISCIBLE[0]:
                phases[0].components = list(components)
                phases[1].components = list(components)
            else:
                phases[0].components = [components[0]]
                phases[1].components = [components[1]]

        def dependencies_of_phase_properties(self, phase):
            return [lambda domains: self.pressure(domains)]

        def set_equations(self):
            super().set_equations()
            t_ref = float(self.reference_variable_values.temperature)
            # Eliminations cover the boundary grids too (as the reference's
            # own CFF setups do): boundary temperature/saturation then stay
            # consistent with the interior closure; otherwise uninitialized
            # boundary values drive spurious advective fluxes.
            elim_domains = self.mdg.subdomains() + self.mdg.boundaries()
            self.eliminate_locally(
                self.temperature,
                [self.enthalpy],
                lambda h: (
                    h / CP + t_ref, np.vstack([np.full(h.size, 1.0 / CP)])
                ),
                elim_domains,
            )
            gas = self.fluid.phases[1]
            ident = lambda z: (z, np.ones((1, z.size)))  # noqa: E731
            # NOTE: no phase-fraction elimination — without an equilibrium
            # condition neither framework creates y-variables (saturation-
            # based formulation).
            self.eliminate_locally(
                gas.saturation,
                [self.fluid.components[1].fraction],
                ident,
                elim_domains,
            )
            if MISCIBLE[0]:
                # Immiscible limit closures: co2 only in gas, water only in
                # liquid (x_co2_liquid = 0, x_co2_gas = 1; the in-phase
                # reference fractions follow by unity).
                liq = self.fluid.phases[0]
                co2 = self.fluid.components[1]
                const0 = lambda pv: (  # noqa: E731
                    np.zeros(pv.size), np.zeros((1, pv.size))
                )
                const1 = lambda pv: (  # noqa: E731
                    np.ones(pv.size), np.zeros((1, pv.size))
                )
                self.eliminate_locally(
                    liq.partial_fraction_of[co2], [self.pressure],
                    const0, elim_domains,
                )
                self.eliminate_locally(
                    gas.partial_fraction_of[co2], [self.pressure],
                    const1, elim_domains,
                )
            if self.params.get("enable_buoyancy_effects", False):
                self.set_buoyancy_discretization_parameters()

        def set_nonlinear_discretizations(self):
            super().set_nonlinear_discretizations()
            if self.params.get("enable_buoyancy_effects", False):
                self.set_nonlinear_buoyancy_discretization()

        def before_nonlinear_iteration(self):
            if self.params.get("enable_buoyancy_effects", False):
                self.update_buoyancy_driven_fluxes()
            super().before_nonlinear_iteration()

        def bc_type_fluid_flux(self, sd):
            sides = self.domain_boundary_sides(sd)
            return mod.BoundaryCondition(sd, sides.west | sides.east, "dir")

        def bc_type_darcy_flux(self, sd):
            sides = self.domain_boundary_sides(sd)
            return mod.BoundaryCondition(sd, sides.west | sides.east, "dir")

        def bc_values_pressure(self, bg):
            sides = self.domain_boundary_sides(bg)
            vals = np.full(bg.num_cells, 1.0)
            vals[sides.west] = 1.5
            return vals

        # Consistent thermodynamic state helpers: with s = z (the local
        # elimination), rho_gas = p / R_GAS, rho_liq = 1, mu = 1 for both
        # phases and kr = s, the boundary/initial enthalpy and the
        # fractional-flow weights all derive from (p, z).
        def _state(self, p, z):
            rho_g = GAS_RHO[0] + GAS_RHO[1] * np.asarray(p)
            lam_g = z * rho_g
            lam_l = (1.0 - z) * 1.0
            lam = lam_g + lam_l
            h_mix = (lam_g * 3.0 + lam_l * 3.0) / lam
            return lam_g / lam, h_mix

        def _boundary_pz(self, bg):
            p = self.bc_values_pressure(bg)
            sides = self.domain_boundary_sides(bg)
            z = np.full(bg.num_cells, 0.1)
            z[sides.west] = 0.2
            return p, z

        def bc_values_fractional_flow_component(self, component, bg):
            p, z = self._boundary_pz(bg)
            f_gas, _ = self._state(p, z)
            if component.name == "co2":
                return f_gas
            return 1.0 - f_gas

        def bc_values_fractional_flow_energy(self, bg):
            p, z = self._boundary_pz(bg)
            _, h_mix = self._state(p, z)
            return h_mix

        def bc_values_enthalpy(self, bg):
            p, z = self._boundary_pz(bg)
            _, h_mix = self._state(p, z)
            return h_mix

        def ic_values_enthalpy(self, sd):
            p = self.ic_values_pressure(sd)
            z = np.full(sd.num_cells, 0.1)
            _, h_mix = self._state(p, z)
            return h_mix

        def ic_values_pressure(self, sd):
            return np.full(sd.num_cells, 1.0)

        def ic_values_overall_fraction(self, component, sd):
            if component.name == "co2":
                return np.full(sd.num_cells, 0.1)
            return np.zeros(sd.num_cells)

        def ic_values_saturation(self, phase, sd):
            return np.full(sd.num_cells, 0.1)

        def initial_condition(self):
            # The reference template does not push eliminated saturations
            # into time-step storage (its setups do this manually, e.g.
            # reference ``tests/functional/setups/buoyancy_flow_model.py``:
            # InitialConditions2N); without it the previous-time mixture
            # density collapses to the reference phase.
            super().initial_condition()
            gas = self.fluid.phases[1]
            n_all = sum(sd.num_cells for sd in self.mdg.subdomains())
            self.equation_system.set_variable_values(
                np.full(n_all, 0.1),
                [self._saturation_variable(gas)],
                time_step_index=0,
                iterate_index=0,
            )
            if MISCIBLE[0]:
                liq = self.fluid.phases[0]
                co2 = self.fluid.components[1]
                for var_name, val in (
                    (self._partial_fraction_variable(co2, liq), 0.0),
                    (self._partial_fraction_variable(co2, gas), 1.0),
                ):
                    self.equation_system.set_variable_values(
                        np.full(n_all, val),
                        [var_name],
                        time_step_index=0,
                        iterate_index=0,
                    )

    return Model


mod_states = [None]


_CFF_VARS = (
    ("pressure", 1e-6),
    ("z_co2", 1e-6),
    ("s_gas", 1e-6),
    ("enthalpy", 1e-5),
)


def _run_parity(golden, extra_params):
    # Ours.
    mod_states[0] = pt.PhaseState
    Ours = _wire(
        pt.CompositionalFractionalFlowTemplate,
        pt,
        pt.EquationOfState,
        pt.LocalElimination,
        pt.PhysicalState.liquid,
        pt.PhysicalState.gas,
    )
    params = {**_common_params(pt), **extra_params}
    ours = Ours(params)
    pt.run_time_dependent_model(ours, params)
    eq_o = ours.equation_system

    def compute(ref_pp):
        import porepy.compositional as ref_comp

        mod_states[0] = ref_comp.PhaseProperties
        Theirs = _wire(
            ref_pp.CompositionalFractionalFlowTemplate,
            ref_pp,
            ref_comp.EquationOfState,
            ref_pp.LocalElimination,
            ref_comp.PhysicalState.liquid,
            ref_comp.PhysicalState.gas,
        )
        ref_params = {**_common_params(ref_pp), **extra_params}
        theirs = Theirs(ref_params)
        ref_pp.run_time_dependent_model(theirs)
        eq_r = theirs.equation_system
        return {
            var: eq_r.get_variable_values([var], time_step_index=0)
            for var, _tol in _CFF_VARS
        }

    ref_vals = golden(compute)
    for var, tol in _CFF_VARS:
        ours_v = eq_o.get_variable_values([var], time_step_index=0)
        ref_v = np.asarray(ref_vals[var])
        assert ours_v.shape == ref_v.shape, var
        scale = max(np.abs(ref_v).max(), 1e-12)
        assert np.abs(ours_v - ref_v).max() / scale < tol, (
            var,
            np.abs(ours_v - ref_v).max(),
        )
    return eq_o


def test_cff_two_phase_matches_reference(golden):
    GAS_RHO[:] = [0.9, 0.5]
    _run_parity(golden, {})


def test_cff_buoyancy_matches_reference(golden):
    """Gravity + hybrid-upwinding buoyant fluxes enabled on both sides:
    mild density contrast keeps plain Newton stable while exercising the
    fractionally weighted gravity force and the pairwise counter-current
    buoyancy terms (reference ``fluid_property_library.py:464``)."""
    GAS_RHO[:] = [0.99, 0.005]
    MISCIBLE[0] = True
    try:
        eq_o = _run_parity(golden, {"enable_buoyancy_effects": True})
        # Gravity actually acted: the pressure field varies vertically.
        p = eq_o.get_variable_values(["pressure"], time_step_index=0)
        sd_p = p.reshape(4, 4)
        assert np.abs(np.diff(sd_p, axis=0)).max() > 1e-6
    finally:
        GAS_RHO[:] = [0.9, 0.5]
        MISCIBLE[0] = False
