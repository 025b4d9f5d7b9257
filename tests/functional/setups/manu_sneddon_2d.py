"""Sneddon's pressurized-crack problem: verification setup for linear
elasticity with an inclined fracture under constant internal pressure.

Counterpart of reference ``tests/functional/setups/manu_sneddon_2d.py``.
The analytical normal opening of a crack of half-length ``a`` under
pressure ``p0`` in an infinite medium is the Sneddon ellipse

    [[u_n]](eta) = 2 p0 a (1 - nu) / G * sqrt(1 - (eta/a)^2)

(Sneddon 1951, eq. 92 in Crouch & Starfield's normalization); since the
computational domain is finite, displacement boundary conditions are
generated semi-analytically with the constant-displacement-discontinuity
boundary element method (Crouch & Starfield 1983, ch. 5.5/7.4).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

import porepy_tpu as pt
from porepy_tpu.numerics import ad


class SneddonExactSolution2d:
    """Sneddon opening profile + BEM boundary displacements."""

    def __init__(self, model) -> None:
        self.model = model
        p = model.params
        self.a = p["a"]
        self.p0 = p["p0"]
        self.theta = p["theta_rad"]
        self.poi = p["poi"]
        self.shear_modulus = model.solid.shear_modulus
        self.n_bem = p.get("num_bem_segments", 1000)
        size = p.get("domain_size", 1.0)
        self.center = np.array([size / 2, size / 2, 0.0])

    # -- analytic opening -------------------------------------------------------

    def opening_profile(self, eta: np.ndarray) -> np.ndarray:
        """Normal displacement jump at distance ``eta`` from the center."""
        c0 = 2.0 * (1 - self.poi) / self.shear_modulus * self.p0 * self.a
        return c0 * np.sqrt(np.clip(1.0 - (eta / self.a) ** 2, 0.0, None))

    def exact_sol_fracture(self, mdg) -> np.ndarray:
        sd_f = mdg.subdomains(dim=1)[0]
        eta = np.linalg.norm(
            sd_f.cell_centers - self.center[:, None], axis=0
        )
        return self.opening_profile(eta)

    # -- BEM boundary displacements ---------------------------------------------

    def _bem_centers(self) -> np.ndarray:
        h = 2 * self.a / self.n_bem
        s = np.sin(self.theta)
        c = np.cos(self.theta)
        i = np.arange(self.n_bem)
        x0 = self.center[0] - (self.a - 0.5 * h) * s
        y0 = self.center[1] - (self.a - 0.5 * h) * c
        out = np.zeros((3, self.n_bem))
        out[0] = x0 + i * h * s
        out[1] = y0 + i * h * c
        return out

    def _segment_frame(self, xc: np.ndarray, x: np.ndarray) -> np.ndarray:
        """Coordinates of points ``x`` in the BEM segment's local frame."""
        alpha = np.pi / 2 - self.theta
        dx = x[0] - xc[0]
        dy = x[1] - xc[1]
        out = np.zeros((2, x.shape[1]))
        out[0] = dx * np.cos(alpha) + dy * np.sin(alpha)
        out[1] = -dx * np.sin(alpha) + dy * np.cos(alpha)
        return out

    def _segment_displacement(
        self, xl: np.ndarray, half: float, du: float
    ) -> np.ndarray:
        """Displacement field of one constant normal-displacement-
        discontinuity segment of half-length ``half`` with jump ``du``
        (Crouch & Starfield eqs. 5.5.1-5.5.3, 7.4.5-7.4.6)."""
        alpha = np.pi / 2 - self.theta
        m = 1.0 / (4 * np.pi * (1 - self.poi))
        xm, ym = xl[0], xl[1]
        rm2 = (xm - half) ** 2 + ym**2
        rp2 = (xm + half) ** 2 + ym**2
        f2 = m * 0.5 * (np.log(rm2) - np.log(rp2))
        f3 = -m * (np.arctan2(ym, xm - half) - np.arctan2(ym, xm + half))
        f4 = m * (ym / rm2 - ym / rp2)
        f5 = m * ((xm - half) / rm2 - (xm + half) / rp2)

        ca, sa = np.cos(alpha), np.sin(alpha)
        ux = du * (
            -(1 - 2 * self.poi) * ca * f2
            - 2 * (1 - self.poi) * sa * f3
            - ym * (ca * f4 + sa * f5)
        )
        uy = du * (
            -(1 - 2 * self.poi) * sa * f2
            + 2 * (1 - self.poi) * ca * f3
            - ym * (sa * f4 - ca * f5)
        )
        return np.vstack([ux, uy])

    def exact_sol_global(self, sd) -> np.ndarray:
        """Superposed BEM displacement at all boundary faces of ``sd``."""
        bound_faces = sd.get_all_boundary_faces()
        xf = sd.face_centers[:, bound_faces]
        centers = self._bem_centers()
        h = 2 * self.a / self.n_bem
        eta = np.linalg.norm(centers - self.center[:, None], axis=0)
        # DDM sign convention: the displacement discontinuity D_n is the
        # negative of the crack opening (Crouch & Starfield eq. 5.5.x).
        du = -self.opening_profile(eta)
        u = np.zeros((2, sd.num_faces))
        for i in range(self.n_bem):
            xl = self._segment_frame(centers[:, i], xf)
            u[:, bound_faces] += self._segment_displacement(
                xl, 0.5 * h, du[i]
            )
        return u


class ManuSneddonGeometry2d:
    """Unit-square domain with one inclined center fracture, simplex mesh."""

    def set_domain(self):
        size = self.params.get("domain_size", 1.0)
        self._domain = pt.Domain(
            {"xmin": 0, "xmax": size, "ymin": 0, "ymax": size}
        )

    def grid_type(self):
        return "simplex"

    def set_fractures(self):
        a = self.params["a"]
        theta = self.params["theta_rad"]
        size = self.params.get("domain_size", 1.0)
        c = np.array([size / 2, size / 2])
        d = np.array([np.sin(theta), np.cos(theta)])
        pts = np.vstack([c - a * d, c + a * d]).T
        self._fractures = [pt.LineFracture(pts)]


class ManuSneddonBoundaryConditions:
    def bc_type_mechanics(self, sd):
        sides = self.domain_boundary_sides(sd)
        bc = pt.BoundaryConditionVectorial(sd, sides.all_bf, "dir")
        bc.internal_to_dirichlet(sd)
        return bc

    def bc_values_displacement(self, bg) -> np.ndarray:
        sd = bg.parent
        if sd.dim < 2:
            return np.zeros(self.nd * bg.num_cells)
        u_exact = self.exact_sol.exact_sol_global(sd)
        return bg.projection(2) @ u_exact.ravel("F")


@dataclass
class ManuSneddonSaveData:
    error_displacement: float


class ManuSneddonDataSaving:
    def initialize_data_saving(self):
        pass

    def save_data_time_step(self):
        self.results.append(self.collect_data())

    def collect_data(self) -> ManuSneddonSaveData:
        frac_sd = self.mdg.subdomains(dim=self.nd - 1)
        u_n = np.asarray(
            self.equation_system.evaluate(
                self.normal_component(frac_sd)
                @ self.displacement_jump(frac_sd)
            )
        )
        u_a = self.exact_sol.exact_sol_fracture(self.mdg)

        # Exclude the tip zone: the sqrt singularity converges at a lower
        # rate and is not the target of this verification.
        eps = self.params.get("error_exclusion_zone_fracture_tips", 0.1)
        eta = np.linalg.norm(
            frac_sd[0].cell_centers - self.exact_sol.center[:, None], axis=0
        )
        near_tip = (self.exact_sol.a - eta) / self.exact_sol.a < eps
        u_a = np.where(near_tip, 0.0, u_a)
        u_n = np.where(near_tip, 0.0, u_n)

        vols = frac_sd[0].cell_volumes
        err = np.sqrt(np.sum(vols * (u_n - u_a) ** 2)) / np.sqrt(
            np.sum(vols * u_a**2)
        )
        return ManuSneddonSaveData(error_displacement=float(err))


class ManuSneddonConstitutiveLaws(pt.constitutive_laws.PressureStress):
    """Constant fracture pressure p0; MPSA stress discretization."""

    def pressure(self, domains):
        n = sum(g.num_cells for g in domains)
        return ad.DenseArray(self.params["p0"] * np.ones(n))

    def stress_discretization(self, subdomains):
        from porepy_tpu.numerics.ad.discretizations import MpsaAd

        return MpsaAd(self.stress_keyword, subdomains, self.mdg)


class ManuSneddonModel2d(
    ManuSneddonGeometry2d,
    ManuSneddonDataSaving,
    ManuSneddonBoundaryConditions,
    ManuSneddonConstitutiveLaws,
    pt.MomentumBalance,
):
    """Complete Sneddon verification model."""

    def __init__(self, params=None):
        super().__init__(params)
        self.exact_sol: SneddonExactSolution2d

    def set_materials(self):
        super().set_materials()
        self.exact_sol = SneddonExactSolution2d(self)
