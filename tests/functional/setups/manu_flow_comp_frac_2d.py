"""Manufactured solution for 2d COMPRESSIBLE flow with a single embedded
vertical fracture (counterpart of reference
``tests/functional/setups/manu_flow_comp_2d_frac.py``; the spatial fields
follow Varela et al. (2022) scaled linearly in time, the density is
``rho = rho_0 exp(c (p - p_0))``, and sources carry the compressible
accumulation and mass-flux divergence)."""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import sympy as sym

import porepy_tpu as pt
from porepy_tpu.numerics import ad
from tests.functional.setups.manu_flow_incomp_frac_2d import relative_l2

MANU_COMP_FLUID = {
    "viscosity": 1.0,  # (**) assumed by the manufactured solution
    "compressibility": 0.2,
    "density": 1.0,  # reference value rho_0
}
MANU_COMP_SOLID = {
    "normal_permeability": 0.5,  # (**) counteracts division by a/2
    "permeability": 1.0,  # (**)
    "residual_aperture": 1.0,  # (**)
    "porosity": 0.1,
}


class ExactCompFlow2d:
    """Exact time-dependent fields on the unit square with the fracture
    {x = 1/2, 1/4 <= y <= 3/4}: incompressible spatial structure times t,
    exponential density, mass-balance sources via sympy."""

    def __init__(self, rho_0=1.0, p_0=0.0, c_f=0.2, phi_0=0.1, n=1.5):
        x, y, t = sym.symbols("x y t")
        dist = [
            ((x - 0.5) ** 2 + (y - 0.25) ** 2) ** 0.5,
            ((x - 0.5) ** 2) ** 0.5,
            ((x - 0.5) ** 2 + (y - 0.75) ** 2) ** 0.5,
        ]
        bubble = (y - 0.25) ** 2 * (y - 0.75) ** 2

        p_mat = [
            t * dist[0] ** (1 + n),
            t * (dist[1] ** (1 + n) + bubble * dist[1]),
            t * dist[2] ** (1 + n),
        ]
        q_mat = [[-sym.diff(p, x), -sym.diff(p, y)] for p in p_mat]
        rho_mat = [rho_0 * sym.exp(c_f * (p - p_0)) for p in p_mat]
        mf_mat = [[r * q[0], r * q[1]] for r, q in zip(rho_mat, q_mat)]
        f_mat = [
            sym.diff(phi_0 * r, t) + sym.diff(mf[0], x) + sym.diff(mf[1], y)
            for r, mf in zip(rho_mat, mf_mat)
        ]

        # Interface: volumetric flux t*bubble; the matrix pressure traces
        # to 0 on the fracture line, so the interface density is rho_0
        # exp(-c p_0) -- with the reference values p_0 = 0: exactly rho_0.
        q_intf = t * bubble
        rho_intf = rho_0 * sym.exp(c_f * (0.0 - p_0))
        mf_intf = rho_intf * q_intf

        p_frac = -t * bubble
        q_frac = -sym.diff(p_frac, y)
        rho_frac = rho_0 * sym.exp(c_f * (p_frac - p_0))
        mf_frac = rho_frac * q_frac
        f_frac = (
            sym.diff(phi_0 * rho_frac, t)
            + sym.diff(mf_frac, y)
            - 2 * mf_intf
        )

        L = sym.lambdify
        self._p_mat = [L((x, y, t), p, "numpy") for p in p_mat]
        self._q_mat = [
            [L((x, y, t), ci, "numpy") for ci in q] for q in q_mat
        ]
        self._f_mat = [L((x, y, t), f, "numpy") for f in f_mat]
        self._p_frac = L((y, t), p_frac, "numpy")
        self._q_frac = L((y, t), q_frac, "numpy")
        self._f_frac = L((y, t), f_frac, "numpy")
        self._q_intf = L((y, t), q_intf, "numpy")

    @staticmethod
    def _bands(pts):
        return [
            pts[1] < 0.25,
            (pts[1] >= 0.25) & (pts[1] <= 0.75),
            pts[1] > 0.75,
        ]

    def matrix_pressure(self, sd, t):
        cc = sd.cell_centers
        out = np.zeros(sd.num_cells)
        for fn, idx in zip(self._p_mat, self._bands(cc)):
            out += fn(cc[0], cc[1], t) * idx
        return out

    def matrix_flux(self, sd, t):
        fc = sd.face_centers.copy()
        on_line = np.abs(fc[0] - 0.5) < 1e-12
        fc[0, on_line] = 0.5 + 1e-9
        fn_ = sd.face_normals
        out = np.zeros(sd.num_faces)
        for (qx, qy), idx in zip(self._q_mat, self._bands(fc)):
            out += (
                qx(fc[0], fc[1], t) * fn_[0] + qy(fc[0], fc[1], t) * fn_[1]
            ) * idx
        return out

    def matrix_source(self, sd, t):
        cc = sd.cell_centers
        out = np.zeros(sd.num_cells)
        for fn, idx in zip(self._f_mat, self._bands(cc)):
            out += fn(cc[0], cc[1], t) * idx
        return out * sd.cell_volumes

    def fracture_pressure(self, sd, t):
        return self._p_frac(sd.cell_centers[1], t)

    def fracture_source(self, sd, t):
        return self._f_frac(sd.cell_centers[1], t) * sd.cell_volumes

    def interface_flux(self, intf, t):
        return self._q_intf(intf.cell_centers[1], t) * intf.cell_volumes

    def boundary_pressure(self, bg, t):
        cc = bg.cell_centers
        out = np.zeros(bg.num_cells)
        for fn, idx in zip(self._p_mat, self._bands(cc)):
            out += fn(cc[0], cc[1], t) * idx
        return out


@dataclass
class ManuCompSaveData:
    time: float
    error_matrix_pressure: float
    error_matrix_flux: float
    error_frac_pressure: float
    error_intf_flux: float


class ManuCompFlowModel2d(pt.SinglePhaseFlow):
    """Verification model: time-dependent exact-solution BCs and sources
    (reference ``manu_flow_comp_2d_frac.py:747``)."""

    results: list = None

    def __init__(self, params=None):
        super().__init__(params)
        self.results = []

    def set_materials(self):
        super().set_materials()
        assert self._fluid_component.viscosity == 1.0
        assert self.solid.permeability == 1.0
        assert self.solid.residual_aperture == 1.0
        assert self.solid.normal_permeability == 0.5
        self.exact_sol = ExactCompFlow2d(
            rho_0=self._fluid_component.density,
            p_0=float(self.reference_variable_values.pressure),
            c_f=self._fluid_component.compressibility,
            phi_0=self.solid.porosity,
        )

    def set_fractures(self):
        self._fractures = [
            pt.LineFracture(np.array([[0.5, 0.5], [0.25, 0.75]]))
        ]

    def bc_type_darcy_flux(self, sd):
        sides = self.domain_boundary_sides(sd)
        return pt.BoundaryCondition(sd, sides.all_bf, "dir")

    def bc_values_pressure(self, bg):
        t = self.time_manager.time
        if bg.parent.dim == self.mdg.dim_max():
            return self.exact_sol.boundary_pressure(bg, t)
        return np.zeros(bg.num_cells)

    def fluid_source(self, subdomains):
        internal = super().fluid_source(subdomains)
        external = ad.TimeDependentDenseArray(
            "external_sources", self.mdg.subdomains()
        ).previous_timestep()
        return internal + external

    def update_time_dependent_ad_arrays(self):
        super().update_time_dependent_ad_arrays()
        t = self.time_manager.time
        for sd, data in self.mdg.subdomains(return_data=True):
            vals = (
                self.exact_sol.matrix_source(sd, t)
                if sd.dim == self.mdg.dim_max()
                else self.exact_sol.fracture_source(sd, t)
            )
            pt.set_solution_values(
                name="external_sources",
                values=vals,
                data=data,
                time_step_index=0,
            )

    def initialize_data_saving(self):
        pass

    def save_data_time_step(self):
        if self.time_manager.time > 0.0:
            self.results.append(self.collect_data())

    def collect_data(self) -> ManuCompSaveData:
        eq = self.equation_system
        t = self.time_manager.time
        sd_mat = self.mdg.subdomains(dim=2)[0]
        sd_frac = self.mdg.subdomains(dim=1)[0]
        intf = list(self.mdg.interfaces())[0]

        p_mat = eq.get_variable_values(
            [self.pressure([sd_mat])], iterate_index=0
        )
        p_frac = eq.get_variable_values(
            [self.pressure([sd_frac])], iterate_index=0
        )
        lam = eq.get_variable_values(
            [self.interface_darcy_flux([intf])], iterate_index=0
        )
        q_mat = np.asarray(eq.evaluate(self.darcy_flux([sd_mat])))

        ex = self.exact_sol
        return ManuCompSaveData(
            time=t,
            error_matrix_pressure=relative_l2(
                p_mat, ex.matrix_pressure(sd_mat, t), sd_mat.cell_volumes
            ),
            error_matrix_flux=relative_l2(
                q_mat, ex.matrix_flux(sd_mat, t), np.ones(sd_mat.num_faces)
            ),
            error_frac_pressure=relative_l2(
                p_frac, ex.fracture_pressure(sd_frac, t), sd_frac.cell_volumes
            ),
            error_intf_flux=relative_l2(
                lam, ex.interface_flux(intf, t), np.ones(intf.num_cells)
            ),
        )
