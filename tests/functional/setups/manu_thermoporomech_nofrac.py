"""Manufactured solution for non-fractured thermoporomechanics in 2d/3d.

Verification counterpart of the reference's
``tests/functional/setups/manu_thermoporomech_nofrac_2d.py`` / ``..._3d.py``
(there with heterogeneous tensorial coefficients; here the homogeneous
isotropic core so one sympy derivation covers both dimensions). Exact
pressure/displacement follow Nordbotten (2016) as in
:mod:`manu_poromech_nofrac`, and the temperature equals the pressure field
(the reference's choice, ``manu_thermoporomech_nofrac_2d.py:377``).

The forcing terms are derived from THIS framework's constitutive stack:

- fluid density ``rho = rho_0 exp(c_f dp - beta_f dT)``
  (``FluidDensityFromPressureAndTemperature``),
- thermoporomechanical porosity
  ``phi = phi_0 + (alpha - phi_0)(1 - alpha)/K_d dp + alpha div u
  - (alpha - phi_0) beta_s dT`` (``ThermoPoroMechanicsPorosity``),
- total stress ``sigma = sigma_elastic - alpha dp I
  - (2 mu + 3 lambda) beta_s dT I`` (``ThermoPressureStress`` +
  ``ThermalExpansion.solid_thermal_expansion_tensor``),
- energy density ``(rho h_f - p) phi + rho_s c_s dT (1 - phi)`` with
  ``h_f = c_pf dT``, advective enthalpy flux ``h_f rho / mu q`` and
  Fourier flux ``-kappa grad T`` (``TotalEnergyBalanceEquations``).

The fluid and solid conductivities are chosen EQUAL so the LTE mixture
conductivity is exactly constant — the numerical scheme freezes the
porosity-weighted conductivity at discretization time, and a manufactured
source assuming the variable-porosity mixture would pollute the observed
convergence order.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import sympy as sym

import porepy_tpu as pt
from porepy_tpu.applications.convergence_analysis import ConvergenceAnalysis
from porepy_tpu.numerics import ad

MANU_THM_SOLID = {
    "biot_coefficient": 0.5,
    "thermal_expansion": 0.1,
    "thermal_conductivity": 1.0,
    "specific_heat_capacity": 1.0,
    "density": 1.0,
}
MANU_THM_FLUID = {
    "compressibility": 0.02,
    "thermal_expansion": 0.05,
    "thermal_conductivity": 1.0,  # equal to solid: constant LTE conductivity
    "specific_heat_capacity": 1.0,
}


class ExactThermoPoroMech:
    """Exact fields and sources via sympy, generic over dimension."""

    def __init__(self, model, dim: int) -> None:
        fluid = model._fluid_component
        lmbda = model.solid.lame_lambda
        mu_s = model.solid.shear_modulus
        alpha = model.solid.biot_coefficient
        beta_s = model.solid.thermal_expansion
        rho_s = model.solid.density
        c_s = model.solid.specific_heat_capacity
        k_s = model.solid.thermal_conductivity
        rho_0 = fluid.density
        c_f = fluid.compressibility
        beta_f = fluid.thermal_expansion
        c_pf = fluid.specific_heat_capacity
        k_f = fluid.thermal_conductivity
        phi_0 = model.solid.porosity
        p_0 = model.reference_variable_values.pressure
        T_0 = model.reference_variable_values.temperature
        k = model.solid.permeability
        mu_f = fluid.viscosity
        K_d = lmbda + (2.0 / 3.0) * mu_s
        assert k_s == k_f, "constant-conductivity manufactured setup"
        kappa = k_s

        xs = sym.symbols("x y z")[:dim]
        t = sym.Symbol("t")
        pi = sym.pi
        x, y = xs[0], xs[1]

        # The reference's field shape (manu_thermoporomech_nofrac_2d.py:370,
        # 3d:153): the (x - 1/2) factor keeps the advected-enthalpy magnitude
        # well below the conductive flux, so the first-order upwind error
        # stays subdominant at the tested refinement levels.
        if dim == 2:
            p = t * x * (1 - x) * (x - sym.Rational(1, 2)) * sym.sin(2 * pi * y)
        else:
            z = xs[2]
            p = (
                t * x * (1 - x) * (x - sym.Rational(1, 2))
                * sym.sin(2 * pi * y) * sym.sin(2 * pi * z)
            )
        u = [p] * dim
        T = p  # the reference's choice: temperature mirrors the pressure

        dp, dT = p - p_0, T - T_0
        rho = rho_0 * sym.exp(c_f * dp - beta_f * dT)
        q = [-(k / mu_f) * sym.diff(p, xi) for xi in xs]
        div_u = sum(sym.diff(ui, xi) for ui, xi in zip(u, xs))
        phi = (
            phi_0
            + ((alpha - phi_0) * (1 - alpha) / K_d) * dp
            + alpha * div_u
            - (alpha - phi_0) * beta_s * dT
        )
        source_flow = sym.diff(phi * rho, t) + sum(
            sym.diff(rho * qi, xi) for qi, xi in zip(q, xs)
        )

        h_f = c_pf * dT
        energy_density = (rho * h_f - p) * phi + rho_s * c_s * dT * (1 - phi)
        q_energy = [
            h_f * rho * qi - kappa * sym.diff(T, xi) for qi, xi in zip(q, xs)
        ]
        source_energy = sym.diff(energy_density, t) + sum(
            sym.diff(qe, xi) for qe, xi in zip(q_energy, xs)
        )

        eps = [
            [
                (sym.diff(u[i], xs[j]) + sym.diff(u[j], xs[i])) / 2
                for j in range(dim)
            ]
            for i in range(dim)
        ]
        tr_eps = sum(eps[i][i] for i in range(dim))
        beta_stress = (2 * mu_s + 3 * lmbda) * beta_s
        sigma = [
            [
                (lmbda * tr_eps - alpha * dp - beta_stress * dT if i == j else 0)
                + 2 * mu_s * eps[i][j]
                for j in range(dim)
            ]
            for i in range(dim)
        ]
        source_mech = [
            sum(sym.diff(sigma[i][j], xs[j]) for j in range(dim))
            for i in range(dim)
        ]

        args = (*xs, t)
        self.dim = dim
        self._p = sym.lambdify(args, p, "numpy")
        self._T = sym.lambdify(args, T, "numpy")
        self._u = [sym.lambdify(args, ui, "numpy") for ui in u]
        self._q = [sym.lambdify(args, qi, "numpy") for qi in q]
        self._q_energy = [sym.lambdify(args, qe, "numpy") for qe in q_energy]
        self._sigma = [
            [sym.lambdify(args, sigma[i][j], "numpy") for j in range(dim)]
            for i in range(dim)
        ]
        self._source_flow = sym.lambdify(args, source_flow, "numpy")
        self._source_energy = sym.lambdify(args, source_energy, "numpy")
        self._source_mech = [
            sym.lambdify(args, si, "numpy") for si in source_mech
        ]

    def _pts(self, coords: np.ndarray, time: float):
        return tuple(coords[d] for d in range(self.dim)) + (time,)

    def pressure(self, sd, time):
        return self._p(*self._pts(sd.cell_centers, time))

    def temperature(self, sd, time):
        return self._T(*self._pts(sd.cell_centers, time))

    def displacement(self, sd, time):
        a = self._pts(sd.cell_centers, time)
        return np.asarray([f(*a) for f in self._u]).ravel("F")

    def darcy_flux(self, sd, time):
        a = self._pts(sd.face_centers, time)
        fn = sd.face_normals
        return sum(f(*a) * fn[d] for d, f in enumerate(self._q))

    def energy_flux(self, sd, time):
        a = self._pts(sd.face_centers, time)
        fn = sd.face_normals
        return sum(f(*a) * fn[d] for d, f in enumerate(self._q_energy))

    def poroelastic_force(self, sd, time):
        a = self._pts(sd.face_centers, time)
        fn = sd.face_normals
        rows = [
            sum(self._sigma[i][j](*a) * fn[j] for j in range(self.dim))
            for i in range(self.dim)
        ]
        return np.asarray(rows).ravel("F")

    def flow_source(self, sd, time):
        return self._source_flow(*self._pts(sd.cell_centers, time)) * sd.cell_volumes

    def energy_source(self, sd, time):
        return (
            self._source_energy(*self._pts(sd.cell_centers, time)) * sd.cell_volumes
        )

    def mechanics_source(self, sd, time):
        a = self._pts(sd.cell_centers, time)
        vol = sd.cell_volumes
        return -np.asarray([f(*a) * vol for f in self._source_mech]).ravel("F")


@dataclass
class ManuThermoPoroMechSaveData:
    time: float
    error_pressure: float
    error_temperature: float
    error_darcy_flux: float
    error_energy_flux: float
    error_displacement: float
    error_force: float


class ManuThermoPoroMechModel(pt.Thermoporomechanics):
    """Dimension-generic manufactured THM model (``params["dim"]`` = 2/3).
    Exact fields vanish on the boundary, so homogeneous Dirichlet defaults
    are the exact boundary values."""

    def __init__(self, params=None):
        super().__init__(params)
        self.results = []

    def set_domain(self):
        box = {"xmin": 0.0, "xmax": 1.0, "ymin": 0.0, "ymax": 1.0}
        if self.params.get("dim", 2) == 3:
            box.update({"zmin": 0.0, "zmax": 1.0})
        self._domain = pt.Domain(box)

    def set_materials(self):
        super().set_materials()
        self.exact_sol = ExactThermoPoroMech(self, self.params.get("dim", 2))

    def fluid_source(self, subdomains):
        internal = super().fluid_source(subdomains)
        return internal + ad.TimeDependentDenseArray(
            "source_flow", self.mdg.subdomains()
        ).previous_timestep()

    def energy_source(self, subdomains):
        internal = super().energy_source(subdomains)
        return internal + ad.TimeDependentDenseArray(
            "source_energy", self.mdg.subdomains()
        ).previous_timestep()

    def body_force(self, subdomains):
        return ad.TimeDependentDenseArray(
            "source_mechanics", self.mdg.subdomains()
        ).previous_timestep()

    def before_nonlinear_loop(self):
        super().before_nonlinear_loop()
        sd = self.mdg.subdomains()[0]
        data = self.mdg.subdomain_data(sd)
        t = self.time_manager.time
        for name, vals in (
            ("source_mechanics", self.exact_sol.mechanics_source(sd, t)),
            ("source_flow", self.exact_sol.flow_source(sd, t)),
            ("source_energy", self.exact_sol.energy_source(sd, t)),
        ):
            pt.set_solution_values(
                name=name, values=vals, data=data, time_step_index=0
            )

    def initialize_data_saving(self):
        pass

    def save_data_time_step(self):
        if self.time_manager.time > 0.0:
            self.results.append(self.collect_data())

    def collect_data(self) -> ManuThermoPoroMechSaveData:
        eq = self.equation_system
        sd = self.mdg.subdomains()[0]
        t = self.time_manager.time
        ex = self.exact_sol
        num = {
            "p": np.asarray(eq.evaluate(self.pressure([sd]))),
            "T": np.asarray(eq.evaluate(self.temperature([sd]))),
            "u": np.asarray(eq.evaluate(self.displacement([sd]))),
            "q": np.asarray(eq.evaluate(self.darcy_flux([sd]))),
            "qe": np.asarray(eq.evaluate(self.energy_flux([sd]))),
            "f": np.asarray(eq.evaluate(self.stress([sd]))),
        }
        err = ConvergenceAnalysis.lp_error
        return ManuThermoPoroMechSaveData(
            time=t,
            error_pressure=err(
                sd, ex.pressure(sd, t), num["p"], True, True, relative=True
            ),
            error_temperature=err(
                sd, ex.temperature(sd, t), num["T"], True, True, relative=True
            ),
            error_darcy_flux=err(
                sd, ex.darcy_flux(sd, t), num["q"], True, False, relative=True
            ),
            error_energy_flux=err(
                sd, ex.energy_flux(sd, t), num["qe"], True, False, relative=True
            ),
            error_displacement=err(
                sd, ex.displacement(sd, t), num["u"], False, True, relative=True
            ),
            error_force=err(
                sd, ex.poroelastic_force(sd, t), num["f"], False, False, relative=True
            ),
        )
