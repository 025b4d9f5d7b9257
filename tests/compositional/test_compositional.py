"""Compositional layer: fluid/phase abstractions, fractional variables
and conversion kernels."""

import numpy as np
import pytest

import porepy_tpu as pt
from porepy_tpu.compositional import utils as cutils


def test_single_phase_fluid_wired_through_models():
    """The default single-phase fluid built by FluidMixin delegates to the
    model's heuristic laws and drives a compressible-flow run."""
    params = {
        "meshing_arguments": {"cell_size": 0.25},
        "material_constants": {
            "solid": pt.SolidConstants(permeability=1.0, porosity=0.1),
            "fluid": pt.FluidComponent(
                compressibility=1e-3, viscosity=2.0, density=3.0
            ),
        },
        "time_manager": pt.TimeManager([0, 1.0], 1.0, constant_dt=True),
        "suppress_export": True,
    }

    class Model(pt.SinglePhaseFlow):
        def bc_values_pressure(self, bg):
            return 1.0 - bg.cell_centers[1]

    m = Model(params)
    pt.run_time_dependent_model(m, params)
    fluid = m.fluid
    assert isinstance(fluid, pt.Fluid)
    assert fluid.num_phases == 1 and fluid.num_components == 1
    assert fluid.reference_phase.state == pt.PhysicalState.liquid
    sd = m.mdg.subdomains()
    # Mixture density equals the heuristic law rho0 exp(c (p - p0)).
    rho = np.asarray(m.equation_system.evaluate(fluid.density(sd)))
    p = m.equation_system.get_variable_values(["pressure"], iterate_index=0)
    assert np.allclose(rho, 3.0 * np.exp(1e-3 * p))
    # Viscosity and trivial fractions.
    mu = np.asarray(m.equation_system.evaluate(fluid.viscosity(sd)))
    assert np.allclose(mu, 2.0)
    one = m.equation_system.evaluate(
        fluid.reference_phase.saturation(sd)
    )
    assert np.allclose(one, 1.0)


def test_two_phase_variables_created():
    """CompositionalVariables creates saturation/fraction variables with
    reference elimination by unity."""

    class TwoPhaseFluid(pt.FluidMixin):
        def get_components(self):
            return [
                pt.FluidComponent(name="water"),
                pt.FluidComponent(name="gas_comp"),
            ]

        def get_phase_configuration(self, components):
            return [
                (pt.PhysicalState.liquid, "liquid"),
                (pt.PhysicalState.gas, "gas"),
            ]

    class Model(TwoPhaseFluid, pt.CompositionalVariables, pt.SinglePhaseFlow):
        def bc_values_pressure(self, bg):
            return np.zeros(bg.num_cells)

    params = {
        "meshing_arguments": {"cell_size": 0.5},
        "suppress_export": True,
        # Phase fraction (y) variables exist only with a local equilibrium
        # condition (reference ``compositional_mixins.py:484-492``).
        "equilibrium_condition": "p-T",
    }
    m = Model(params)
    m.set_materials()
    m.set_geometry()
    m.set_equation_system_manager()
    m.create_fluid()
    m.create_variables()

    names = [v.name for v in m.equation_system.variables]
    assert "z_gas_comp" in names  # overall fraction of non-reference comp
    assert "z_water" not in names  # reference eliminated
    assert "s_gas" in names and "y_gas" in names
    assert "s_liquid" not in names  # reference phase eliminated

    fluid = m.fluid
    sd = m.mdg.subdomains()
    # Unity elimination: s_liquid = 1 - s_gas.
    gas = fluid.phases[1]
    m.equation_system.set_variable_values(
        0.3 * np.ones(m.mdg.num_subdomain_cells()),
        ["s_gas"],
        iterate_index=0,
    )
    s_liq = np.asarray(
        m.equation_system.evaluate(fluid.reference_phase.saturation(sd))
    )
    assert np.allclose(s_liq, 0.7)


def test_conversion_kernels_parity(golden):
    rng = np.random.default_rng(11)
    x = rng.random((4, 6)) + 0.1
    y1 = rng.uniform(0.05, 0.95, 10)
    y = np.vstack((1 - y1, y1))
    rho = rng.uniform(0.5, 2.0, (2, 10))
    y3 = rng.uniform(0.1, 0.5, (3, 5))
    y3 = y3 / y3.sum(axis=0)
    rho3 = rng.uniform(0.5, 2.0, (3, 5))
    df = rng.random((5, 7))
    xf = rng.random((3, 7)) + 0.1

    def compute(ref_pp):
        import porepy.compositional.utils as rcu

        return {
            "normalize_rows": rcu.normalize_rows(x),
            "sat2": rcu.compute_saturations(y, rho),
            "sat3": rcu.compute_saturations(y3, rho3),
            "chainrule": rcu.chainrule_fractional_derivatives(df, xf),
        }

    ref = golden(compute)
    assert np.allclose(cutils.normalize_rows(x), ref["normalize_rows"])
    assert np.allclose(cutils.compute_saturations(y, rho), ref["sat2"])
    assert np.allclose(cutils.compute_saturations(y3, rho3), ref["sat3"])
    assert np.allclose(
        cutils.chainrule_fractional_derivatives(df, xf), ref["chainrule"]
    )
