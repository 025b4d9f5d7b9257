"""Constant-K two-phase flash: vectorized Rachford-Rice against scipy
root-finding (reference ``compositional/flash.py`` declares the interface
only)."""

import numpy as np
import pytest
import scipy.optimize

import porepy_tpu as pt
from porepy_tpu.compositional._core import PhysicalState
from porepy_tpu.compositional.base import Fluid, Phase
from porepy_tpu.compositional.flash import ConstantKFlash


def _fluid(nc=2):
    comps = [pt.FluidComponent(name=f"c{i}") for i in range(nc)]
    phases = [
        Phase(PhysicalState.liquid, "liquid"),
        Phase(PhysicalState.gas, "gas"),
    ]
    for ph in phases:
        ph.components = comps
    return Fluid(comps, phases)


def test_flash_matches_scalar_root():
    K = np.array([2.5, 0.3])
    flash = ConstantKFlash(_fluid(), K)
    rng = np.random.default_rng(4)
    z0 = rng.uniform(0.2, 0.8, 50)
    z = [z0, 1.0 - z0]
    state, success, _ = flash.compute_flash(z)
    assert np.all(success == 0)
    V = state.y[1]
    for j in range(0, 50, 7):
        def rr(v):
            return sum(
                zi[j] * (k - 1) / (1 + v * (k - 1)) for zi, k in zip(z, K)
            )
        if rr(0) <= 0:
            v_ref = 0.0
        elif rr(1) >= 0:
            v_ref = 1.0
        else:
            v_ref = scipy.optimize.brentq(rr, 0.0, 1.0, xtol=1e-12)
        assert abs(V[j] - v_ref) < 1e-8
        # Partial fractions consistent: y = K x, and both normalized.
        x = state.phases[0].x[:, j]
        y = state.phases[1].x[:, j]
        assert np.isclose(x.sum(), 1.0) and np.isclose(y.sum(), 1.0)
        if 0 < v_ref < 1:
            assert np.allclose(y / x, K, rtol=1e-6)


def test_flash_single_phase_corners():
    K = np.array([2.0, 0.5])
    flash = ConstantKFlash(_fluid(), K)
    # Heavy mixture -> all liquid; light mixture -> all vapor.
    z_liq = [np.array([0.05]), np.array([0.95])]
    state, success, _ = flash.compute_flash(z_liq)
    assert state.y[1][0] == 0.0
    z_vap = [np.array([0.98]), np.array([0.02])]
    state, _, _ = flash.compute_flash(z_vap)
    assert state.y[1][0] == 1.0


def test_flash_mass_balance():
    K = np.array([3.0, 0.8, 0.2])
    flash = ConstantKFlash(_fluid(3), K)
    rng = np.random.default_rng(1)
    raw = rng.random((3, 30)) + 0.05
    zs = raw / raw.sum(axis=0)
    state, success, _ = flash.compute_flash(list(zs))
    V = state.y[1]
    x = state.phases[0].x
    y = state.phases[1].x
    two_phase = (V > 0) & (V < 1)
    recon = (1 - V) * x + V * y
    assert np.allclose(recon[:, two_phase], zs[:, two_phase], atol=1e-8)
