"""Peng-Robinson EoS and two-phase flash: literature anchors (pure-fluid
vapor pressures, critical-point compressibility), thermodynamic
consistency (equal fugacities at equilibrium, material balance) and the
vectorized whole-batch flash (reference interface
``compositional/base.py:340``; the reference ships its cubic EoS in the
porepy-composite extension)."""

import numpy as np
import pytest

import porepy_tpu as pt
from porepy_tpu.compositional._core import PhysicalState
from porepy_tpu.compositional.base import Fluid, Phase
from porepy_tpu.compositional.peng_robinson import (
    PengRobinsonEoS,
    PengRobinsonFlash,
    R_IDEAL,
)

CO2 = dict(
    name="co2",
    critical_temperature=304.1282,
    critical_pressure=7.3773e6,
    acentric_factor=0.22394,
    molar_mass=0.04401,
)
CH4 = dict(
    name="ch4",
    critical_temperature=190.564,
    critical_pressure=4.5992e6,
    acentric_factor=0.01142,
    molar_mass=0.016043,
)
C3H8 = dict(
    name="c3h8",
    critical_temperature=369.89,
    critical_pressure=4.2512e6,
    acentric_factor=0.1521,
    molar_mass=0.0441,
)


def _fluid(*specs):
    comps = [pt.FluidComponent(**s) for s in specs]
    phases = [
        Phase(PhysicalState.liquid, "liquid"),
        Phase(PhysicalState.gas, "gas"),
    ]
    for ph in phases:
        ph.components = comps
    return Fluid(comps, phases)


def test_critical_point_compressibility():
    """PR's universal critical compressibility is Z_c = 0.3074 for every
    fluid (Peng & Robinson 1976)."""
    eos = PengRobinsonEoS([pt.FluidComponent(**CO2)])
    Z = eos.compressibility(
        np.array([CO2["critical_pressure"]]),
        np.array([CO2["critical_temperature"]]),
        np.ones((1, 1)),
        gas_like=True,
    )
    assert np.isclose(Z[0], 0.3074, atol=2e-3), Z


@pytest.mark.parametrize(
    "spec,T,psat_exp",
    [
        (CO2, 280.0, 4.161e6),  # NIST: CO2 vapor pressure at 280 K
        (CH4, 150.0, 1.041e6),  # NIST: methane vapor pressure at 150 K
        (C3H8, 300.0, 0.9980e6),  # NIST: propane vapor pressure at 300 K
    ],
    ids=["co2@280K", "ch4@150K", "c3h8@300K"],
)
def test_pure_saturation_pressure_vs_literature(spec, T, psat_exp):
    """Equal-fugacity vapor pressures reproduce experimental values within
    PR's documented few-percent accuracy for these nonpolar fluids."""
    flash = PengRobinsonFlash(_fluid(spec))
    psat = flash.saturation_pressure(T)
    assert abs(psat - psat_exp) / psat_exp < 0.05, (psat, psat_exp)


def test_pure_gas_density_ideal_limit():
    """At low pressure the PR gas density approaches the ideal-gas value."""
    eos = PengRobinsonEoS([pt.FluidComponent(**CH4)])
    p, T = np.array([1e4]), np.array([300.0])
    st = eos.compute_phase_properties(PhysicalState.gas, p, T, np.ones(1))
    rho_ideal = p[0] * CH4["molar_mass"] / (R_IDEAL * T[0])
    assert np.isclose(st.rho[0], rho_ideal, rtol=1e-3)


def test_binary_flash_consistency_and_batch():
    """CH4/C3H8 flash at 20 bar, 280 K (two-phase region): converges on
    the whole batch at once, fugacities are equal across phases, material
    balance is exact, and the light component enriches the vapor."""
    fluid = _fluid(CH4, C3H8)
    flash = PengRobinsonFlash(fluid)
    N = 64
    z_ch4 = np.linspace(0.25, 0.6, N)
    p = np.full(N, 2.0e6)
    T = np.full(N, 280.0)
    state, success, n_iter = flash.compute_flash(
        [z_ch4, 1.0 - z_ch4], p=p, T=T
    )
    assert np.all(success == 0), "flash did not converge everywhere"
    liq, gas = state.phases
    V = state.y[1]
    assert np.all((V > 0.0) & (V < 1.0)), "expected two-phase everywhere"

    # Equal fugacities: x_i phi_L_i = y_i phi_V_i.
    f_l = liq.x * liq.phis
    f_v = gas.x * gas.phis
    assert np.max(np.abs(f_l - f_v) / np.maximum(f_l, 1e-12)) < 1e-5

    # Material balance: z = (1-V) x + V y.
    z_rec = (1.0 - V) * liq.x + V * gas.x
    assert np.max(np.abs(z_rec[0] - z_ch4)) < 1e-10

    # Physics: methane (light) concentrates in the vapor.
    assert np.all(gas.x[0] > liq.x[0])
    # Density ordering.
    assert np.all(liq.rho > gas.rho)


def test_flash_matches_constant_k_at_converged_k():
    """With K frozen at the PR-converged values, the ConstantKFlash's
    Rachford-Rice reproduces the same vapor fraction — the two backends
    agree on the shared subproblem."""
    from porepy_tpu.compositional.flash import ConstantKFlash

    fluid = _fluid(CH4, C3H8)
    flash = PengRobinsonFlash(fluid)
    z = [np.array([0.4]), np.array([0.6])]
    p, T = np.array([2.0e6]), np.array([280.0])
    state, success, _ = flash.compute_flash(z, p=p, T=T)
    assert success[0] == 0
    liq, gas = state.phases
    K = (gas.x / liq.x)[:, 0]

    ck = ConstantKFlash(fluid, K)
    state_ck, ok, _ = ck.compute_flash(z, p=p, T=T)
    assert np.isclose(state_ck.y[1][0], state.y[1][0], atol=1e-6)
