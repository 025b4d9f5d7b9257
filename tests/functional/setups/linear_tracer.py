"""Linear tracer verification setup (reference
``tests/functional/setups/linear_tracer.py`` — compact counterpart).

A 2d "pipe" (unit square, unfractured, porosity 1, permeability 1,
incompressible unit-viscosity fluid) driven west-to-east by a unit
pressure drop gives an EXACT unit Darcy velocity and a linear pressure
field. A passive tracer enters at the inlet as a constant fraction.

The oracle for the tracer is the exact DISCRETE solution of implicit-Euler
upwind advection on the same uniform 1d lattice (the 2d problem is
y-invariant, so every cell row obeys the 1d recurrence
``(1 + c) z_i^{n+1} - c z_{i-1}^{n+1} = z_i^n`` with CFL ``c = v dt / h``
and inflow ``z_0^{n+1}`` fed by the boundary value) — a sharper check
than comparing against hard-coded error norms: any deviation of the
framework's upwinding, time discretization or BC handling from the
intended scheme shows up at machine precision."""

from __future__ import annotations

from typing import Sequence

import numpy as np

import porepy_tpu as pt
from porepy_tpu.applications.boundary_conditions.model_boundary_conditions import (
    BoundaryConditionsMassDirWestEast,
)
from porepy_tpu.compositional.compositional_mixins import CompositionalVariables
from porepy_tpu.models.compositional_flow import (
    BoundaryConditionsMulticomponent,
    ComponentMassBalanceEquations,
    InitialConditionsFractions,
)

Z_IN = 0.5  # inlet tracer fraction


def exact_discrete_tracer(n_cells: int, c: float, z_in: float, n_steps: int):
    """Exact solution of the BE-upwind recurrence after ``n_steps`` steps
    of CFL number ``c`` on ``n_cells`` cells, zero initial condition,
    constant inflow ``z_in``."""
    z = np.zeros(n_cells)
    for _ in range(n_steps):
        znew = np.empty_like(z)
        up = z_in
        for i in range(n_cells):
            znew[i] = (z[i] + c * up) / (1.0 + c)
            up = znew[i]
        z = znew
    return z


class PipeFluid:
    """Incompressible unit-viscosity carrier plus a passive tracer."""

    def get_components(self) -> Sequence:
        return [
            pt.FluidComponent(
                name="water", compressibility=0.0, viscosity=1.0, density=1.0
            ),
            pt.FluidComponent(name="tracer"),
        ]


class PipeIC(InitialConditionsFractions):
    def ic_values_pressure(self, sd) -> np.ndarray:
        return 1.0 - sd.cell_centers[0]

    def ic_values_overall_fraction(self, component, sd) -> np.ndarray:
        return np.zeros(sd.num_cells)


class PipeBC(BoundaryConditionsMassDirWestEast, BoundaryConditionsMulticomponent):
    """Unit pressure drop west->east; tracer enters at the west."""

    def bc_values_pressure(self, bg) -> np.ndarray:
        sides = self.domain_boundary_sides(bg)
        values = np.zeros(bg.num_cells)
        values[sides.west] = 1.0
        return values

    def bc_values_overall_fraction(self, component, bg) -> np.ndarray:
        z = np.zeros(bg.num_cells)
        if component.name == "tracer":
            z[self.domain_boundary_sides(bg).west] = Z_IN
        return z


class LinearTracerModel(
    PipeFluid,
    CompositionalVariables,
    ComponentMassBalanceEquations,
    PipeBC,
    PipeIC,
    pt.SinglePhaseFlow,
):
    """1-phase 2-component linear tracer on the unit-square pipe."""


def make_params(n_cells: int = 40, n_steps: int = 10):
    h = 1.0 / n_cells
    dt = h  # CFL 1 at the exact unit velocity
    return {
        "material_constants": {
            "solid": pt.SolidConstants(porosity=1.0, permeability=1.0),
        },
        "meshing_arguments": {"cell_size": h},
        "grid_type": "cartesian",
        "time_manager": pt.TimeManager(
            [0, n_steps * dt], dt, constant_dt=True
        ),
        "max_iterations": 30,
        "nl_convergence_tol": 1e-12,
        "nl_convergence_tol_res": 1e-12,
        "times_to_export": [],
        "suppress_export": True,
    }
