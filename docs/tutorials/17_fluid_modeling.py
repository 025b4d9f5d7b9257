"""Tutorial 17: fluid modeling — components, phases, property laws and a
real equation of state.

Counterpart of the reference's ``fluid_modeling`` tutorial. Run with

    python docs/tutorials/17_fluid_modeling.py
"""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

import porepy_tpu as pt

# ---------------------------------------------------------------------------
# Level 1: a single-component fluid via material constants. Every model
# owns a Fluid built from FluidComponent dataclasses; constitutive laws
# (e.g. exponential compressibility) read these constants.
# ---------------------------------------------------------------------------
water = pt.FluidComponent(
    name="water", density=1000.0, viscosity=1e-3, compressibility=4e-10
)


class CompressibleFlow(pt.SinglePhaseFlow):
    def bc_values_pressure(self, bg):
        return 1e6 * (1.0 - bg.cell_centers[0])


params = {
    "meshing_arguments": {"cell_size": 0.25},
    "material_constants": {
        "solid": pt.SolidConstants(permeability=1e-12),
        "fluid": water,
    },
    "time_manager": pt.TimeManager([0, 1.0], 1.0, constant_dt=True),
}
m = CompressibleFlow(params)
pt.run_time_dependent_model(m, params)
# The model's fluid density law is rho_ref * exp(c (p - p_ref)):
sd = m.mdg.subdomains()[0]
rho = np.asarray(m.equation_system.evaluate(m.fluid_density([sd])))
p = m.equation_system.get_variable_values(["pressure"], time_step_index=0)
assert np.allclose(rho, 1000.0 * np.exp(4e-10 * p), rtol=1e-12)
print("heuristic-law fluid: rho in", rho.min(), "-", rho.max())

# ---------------------------------------------------------------------------
# Level 2: multi-component, multi-phase fluids. Components and phases are
# first-class objects; an EquationOfState computes phase properties from
# the thermodynamic input the model declares.
# ---------------------------------------------------------------------------
from porepy_tpu.compositional._core import PhysicalState
from porepy_tpu.compositional.base import Fluid, Phase
from porepy_tpu.compositional.peng_robinson import (
    PengRobinsonEoS,
    PengRobinsonFlash,
)

ch4 = pt.FluidComponent(
    name="ch4", critical_temperature=190.564, critical_pressure=4.5992e6,
    acentric_factor=0.01142, molar_mass=0.016043,
)
c3h8 = pt.FluidComponent(
    name="c3h8", critical_temperature=369.89, critical_pressure=4.2512e6,
    acentric_factor=0.1521, molar_mass=0.0441,
)
phases = [Phase(PhysicalState.liquid, "liquid"), Phase(PhysicalState.gas, "gas")]
for ph in phases:
    ph.components = [ch4, c3h8]
fluid = Fluid([ch4, c3h8], phases)
print(fluid)

# The Peng-Robinson EoS evaluates phase properties for a whole batch of
# cells at once (the TPU-native shape: one vectorized call, no point
# loops).
eos = PengRobinsonEoS([ch4, c3h8])
N = 5
p_cells = np.full(N, 2.0e6)
T_cells = np.full(N, 280.0)
x = np.vstack([np.full(N, 0.4), np.full(N, 0.6)])
gas = eos.compute_phase_properties(PhysicalState.gas, p_cells, T_cells, *x)
liq = eos.compute_phase_properties(PhysicalState.liquid, p_cells, T_cells, *x)
print("gas rho:", gas.rho[0], " liquid rho:", liq.rho[0])
assert np.all(liq.rho > gas.rho)

# A p-T flash splits an overall composition into equilibrium phases:
flash = PengRobinsonFlash(fluid)
state, success, n_iter = flash.compute_flash(
    [x[0], x[1]], p=p_cells, T=T_cells
)
V = state.y[1]
print(f"vapor fraction {V[0]:.3f} in {n_iter[0]} iterations")
assert np.all(success == 0) and np.all((V > 0) & (V < 1))

# Equilibrium means equal fugacities phase to phase:
f_liq = state.phases[0].x * state.phases[0].phis
f_gas = state.phases[1].x * state.phases[1].phis
assert np.max(np.abs(f_liq - f_gas) / f_liq) < 1e-5
print("ok")
