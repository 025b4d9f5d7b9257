"""Manufactured solution for non-fractured poromechanics (Biot) in 2d/3d.

Verification counterpart of the reference's
``tests/functional/setups/manu_poromech_nofrac_2d.py`` /
``..._3d.py``: compressible fluid (rho = rho_0 exp(c_f (p - p_0))) in a
deformable porous unit square/cube, with the exact pressure/displacement
pair of Nordbotten (2016), "Stable cell-centered finite volume
discretization for Biot equations", SIAM J. Numer. Anal. 54(2):

    2d:  p = t x (1-x) sin(2 pi y)
         u = [p, t sin(2 pi x) sin(2 pi y)]
    3d:  p = t x (1-x) sin(2 pi y) sin(2 pi z)
         u = [p, t sin(2 pi x) y (1-y) sin(2 pi z),
              t sin(2 pi x) sin(2 pi y) sin(2 pi z)]

All forcing terms (flow source including the poromechanical porosity
accumulation, momentum source from the divergence of the total stress)
follow by sympy differentiation — one dimension-generic derivation instead
of the reference's separate 2d/3d modules. Sources enter the model as
time-dependent dense arrays refreshed each time step, exactly like the
reference setup (reference ``manu_poromech_nofrac_2d.py:630-673``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import sympy as sym

import porepy_tpu as pt
from porepy_tpu.applications.convergence_analysis import ConvergenceAnalysis
from porepy_tpu.numerics import ad


class ExactPoroMech:
    """Dimension-generic exact fields for the Nordbotten-2016 manufactured
    poromechanics problem, evaluated by sympy lambdification."""

    def __init__(self, model, dim: int) -> None:
        lmbda = model.solid.lame_lambda
        mu_s = model.solid.shear_modulus
        alpha = model.solid.biot_coefficient
        fluid = model._fluid_component  # set_materials runs before create_fluid
        rho_0 = fluid.density
        phi_0 = model.solid.porosity
        p_0 = model.reference_variable_values.pressure
        c_f = fluid.compressibility
        k = model.solid.permeability
        mu_f = fluid.viscosity
        K_d = lmbda + (2.0 / 3.0) * mu_s

        xs = sym.symbols("x y z")[:dim]
        t = sym.Symbol("t")
        pi = sym.pi
        x, y = xs[0], xs[1]

        if dim == 2:
            p = t * x * (1 - x) * sym.sin(2 * pi * y)
            u = [p, t * sym.sin(2 * pi * x) * sym.sin(2 * pi * y)]
        else:
            z = xs[2]
            p = t * x * (1 - x) * sym.sin(2 * pi * y) * sym.sin(2 * pi * z)
            u = [
                p,
                t * sym.sin(2 * pi * x) * y * (1 - y) * sym.sin(2 * pi * z),
                t * sym.sin(2 * pi * x) * sym.sin(2 * pi * y) * sym.sin(2 * pi * z),
            ]

        rho = rho_0 * sym.exp(c_f * (p - p_0))
        q = [-(k / mu_f) * sym.diff(p, xi) for xi in xs]
        div_mf = sum(sym.diff(rho * qi, xi) for qi, xi in zip(q, xs))
        div_u = sum(sym.diff(ui, xi) for ui, xi in zip(u, xs))
        # Poromechanical porosity (matches ``PoroMechanicsPorosity``):
        # phi = phi_0 + (alpha - phi_0)(1 - alpha)/K_d (p - p_0) + alpha div u.
        phi = phi_0 + ((alpha - phi_0) * (1 - alpha) / K_d) * (p - p_0) + alpha * div_u
        source_flow = sym.diff(phi * rho, t) + div_mf

        eps = [
            [
                (sym.diff(u[i], xs[j]) + sym.diff(u[j], xs[i])) / 2
                for j in range(dim)
            ]
            for i in range(dim)
        ]
        tr_eps = sum(eps[i][i] for i in range(dim))
        sigma = [
            [
                (lmbda * tr_eps - alpha * p if i == j else 0)
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
        self._u = [sym.lambdify(args, ui, "numpy") for ui in u]
        self._q = [sym.lambdify(args, qi, "numpy") for qi in q]
        self._sigma = [
            [sym.lambdify(args, sigma[i][j], "numpy") for j in range(dim)]
            for i in range(dim)
        ]
        self._source_flow = sym.lambdify(args, source_flow, "numpy")
        self._source_mech = [
            sym.lambdify(args, si, "numpy") for si in source_mech
        ]

    @staticmethod
    def _pts(coords: np.ndarray, dim: int, time: float):
        return tuple(coords[d] for d in range(dim)) + (time,)

    def pressure(self, sd, time: float) -> np.ndarray:
        return self._p(*self._pts(sd.cell_centers, self.dim, time))

    def displacement(self, sd, time: float) -> np.ndarray:
        a = self._pts(sd.cell_centers, self.dim, time)
        return np.asarray([f(*a) for f in self._u]).ravel("F")

    def darcy_flux(self, sd, time: float) -> np.ndarray:
        """Exact flux dotted with the (area-scaled) face normals."""
        a = self._pts(sd.face_centers, self.dim, time)
        fn = sd.face_normals
        return sum(f(*a) * fn[d] for d, f in enumerate(self._q))

    def poroelastic_force(self, sd, time: float) -> np.ndarray:
        """Total (poroelastic) traction integrated over faces, flattened."""
        a = self._pts(sd.face_centers, self.dim, time)
        fn = sd.face_normals
        rows = [
            sum(self._sigma[i][j](*a) * fn[j] for j in range(self.dim))
            for i in range(self.dim)
        ]
        return np.asarray(rows).ravel("F")

    def flow_source(self, sd, time: float) -> np.ndarray:
        """Integrated mass-balance source (cell volumes folded in)."""
        a = self._pts(sd.cell_centers, self.dim, time)
        return self._source_flow(*a) * sd.cell_volumes

    def mechanics_source(self, sd, time: float) -> np.ndarray:
        """Integrated momentum source; sign flipped to the framework's
        body-force convention (rhs of div sigma = -F)."""
        a = self._pts(sd.cell_centers, self.dim, time)
        vol = sd.cell_volumes
        return -np.asarray([f(*a) * vol for f in self._source_mech]).ravel("F")


@dataclass
class ManuPoroMechSaveData:
    time: float
    error_pressure: float
    error_flux: float
    error_displacement: float
    error_force: float


class ManuPoroMechModel(pt.Poromechanics):
    """Dimension-generic manufactured poromechanics model: pass
    ``params["dim"]`` as 2 or 3. Exact-solution Dirichlet values are the
    homogeneous defaults (the manufactured fields vanish on the boundary)."""

    results: list = None

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
        self.exact_sol = ExactPoroMech(self, self.params.get("dim", 2))

    def fluid_source(self, subdomains):
        internal = super().fluid_source(subdomains)
        external = ad.TimeDependentDenseArray(
            "source_flow", self.mdg.subdomains()
        ).previous_timestep()
        return internal + external

    def body_force(self, subdomains):
        return ad.TimeDependentDenseArray(
            "source_mechanics", self.mdg.subdomains()
        ).previous_timestep()

    def before_nonlinear_loop(self):
        super().before_nonlinear_loop()
        sd = self.mdg.subdomains()[0]
        data = self.mdg.subdomain_data(sd)
        t = self.time_manager.time
        pt.set_solution_values(
            name="source_mechanics",
            values=self.exact_sol.mechanics_source(sd, t),
            data=data,
            time_step_index=0,
        )
        pt.set_solution_values(
            name="source_flow",
            values=self.exact_sol.flow_source(sd, t),
            data=data,
            time_step_index=0,
        )

    def initialize_data_saving(self):
        pass

    def save_data_time_step(self):
        if self.time_manager.time > 0.0:  # all exact fields vanish at t=0
            self.results.append(self.collect_data())

    def collect_data(self) -> ManuPoroMechSaveData:
        eq = self.equation_system
        sd = self.mdg.subdomains()[0]
        t = self.time_manager.time
        ex = self.exact_sol
        p_num = np.asarray(eq.evaluate(self.pressure([sd])))
        u_num = np.asarray(eq.evaluate(self.displacement([sd])))
        q_num = np.asarray(eq.evaluate(self.darcy_flux([sd])))
        f_num = np.asarray(eq.evaluate(self.stress([sd])))
        err = ConvergenceAnalysis.lp_error
        return ManuPoroMechSaveData(
            time=t,
            error_pressure=err(sd, ex.pressure(sd, t), p_num, True, True, relative=True),
            error_flux=err(sd, ex.darcy_flux(sd, t), q_num, True, False, relative=True),
            error_displacement=err(
                sd, ex.displacement(sd, t), u_num, False, True, relative=True
            ),
            error_force=err(
                sd, ex.poroelastic_force(sd, t), f_num, False, False, relative=True
            ),
        )
