"""Manufactured solution for 2d incompressible md flow with one embedded
vertical fracture.

The exact fields follow Appendix D.1 of Varela et al. (2022), "A posteriori
error estimates for hierarchical mixed-dimensional elliptic equations",
J. Numer. Math. — the same verification problem as the reference's
``tests/functional/setups/manu_flow_incomp_frac_2d.py``. The matrix pressure
is a distance-function power ``d^(1+n)`` from the fracture (plus a bubble
term in the middle band), the fracture pressure is minus the bubble, and
all sources follow by differentiation. Material constants are pinned:
unit permeability/viscosity/density, zero compressibility, unit residual
aperture, normal permeability 1/2 (cancels the 2/aperture factor of the
interface law).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import sympy as sym

import porepy_tpu as pt
from porepy_tpu.numerics import ad

MANU_INCOMP_FLUID = {"compressibility": 0.0, "density": 1.0, "viscosity": 1.0}
MANU_INCOMP_SOLID = {
    "residual_aperture": 1.0,
    "permeability": 1.0,
    "normal_permeability": 0.5,
}


class ExactIncompFlow2d:
    """Exact fields, evaluated with sympy lambdification. The domain is the
    unit square; the fracture is {x = 1/2, 1/4 <= y <= 3/4}."""

    def __init__(self, smoothness: float = 1.5) -> None:
        x, y = sym.symbols("x y")
        n = smoothness
        dist = [
            ((x - 0.5) ** 2 + (y - 0.25) ** 2) ** 0.5,  # below the fracture
            ((x - 0.5) ** 2) ** 0.5,  # middle band
            ((x - 0.5) ** 2 + (y - 0.75) ** 2) ** 0.5,  # above
        ]
        bubble = (y - 0.25) ** 2 * (y - 0.75) ** 2

        p_mat = [
            dist[0] ** (1 + n),
            dist[1] ** (1 + n) + bubble * dist[1],
            dist[2] ** (1 + n),
        ]
        q_mat = [[-sym.diff(p, x), -sym.diff(p, y)] for p in p_mat]
        f_mat = [sym.diff(q[0], x) + sym.diff(q[1], y) for q in q_mat]

        p_frac = -bubble
        q_frac = -sym.diff(p_frac, y)
        q_intf = bubble
        f_frac = sym.diff(q_frac, y) - 2 * q_intf

        self._xy = (x, y)
        self._p_mat = [sym.lambdify((x, y), p, "numpy") for p in p_mat]
        self._q_mat = [
            [sym.lambdify((x, y), c, "numpy") for c in q] for q in q_mat
        ]
        self._f_mat = [sym.lambdify((x, y), f, "numpy") for f in f_mat]
        self._p_frac = sym.lambdify(y, p_frac, "numpy")
        self._q_frac = sym.lambdify(y, q_frac, "numpy")
        self._f_frac = sym.lambdify(y, f_frac, "numpy")
        self._bubble = sym.lambdify(y, bubble, "numpy")

    @staticmethod
    def _bands(pts: np.ndarray) -> list[np.ndarray]:
        return [
            pts[1] < 0.25,
            (pts[1] >= 0.25) & (pts[1] <= 0.75),
            pts[1] > 0.75,
        ]

    def matrix_pressure(self, sd) -> np.ndarray:
        cc = sd.cell_centers
        out = np.zeros(sd.num_cells)
        for fn, idx in zip(self._p_mat, self._bands(cc)):
            out += fn(cc[0], cc[1]) * idx
        return out

    def matrix_flux(self, sd) -> np.ndarray:
        """Exact normal flux integrated over faces (normal-scaled)."""
        fc = sd.face_centers.copy()
        # The flux expressions contain removable 0/0 singularities on the
        # line x = 1/2 (|x-1/2| factors); nudge face centers off the line —
        # the limit of the x-derivative there is 0.
        on_line = np.abs(fc[0] - 0.5) < 1e-12
        fc[0, on_line] = 0.5 + 1e-9
        fn = sd.face_normals
        out = np.zeros(sd.num_faces)
        for (qx, qy), idx in zip(self._q_mat, self._bands(fc)):
            out += (qx(fc[0], fc[1]) * fn[0] + qy(fc[0], fc[1]) * fn[1]) * idx
        return out

    def matrix_source(self, sd) -> np.ndarray:
        cc = sd.cell_centers
        out = np.zeros(sd.num_cells)
        for fn, idx in zip(self._f_mat, self._bands(cc)):
            out += fn(cc[0], cc[1]) * idx
        return out * sd.cell_volumes

    def fracture_pressure(self, sd) -> np.ndarray:
        return self._p_frac(sd.cell_centers[1])

    def fracture_flux(self, sd) -> np.ndarray:
        fc = sd.face_centers
        fn = sd.face_normals
        return self._q_frac(fc[1]) * fn[1]

    def fracture_source(self, sd) -> np.ndarray:
        return self._f_frac(sd.cell_centers[1]) * sd.cell_volumes

    def interface_flux(self, intf) -> np.ndarray:
        cc = intf.cell_centers
        return self._bubble(cc[1]) * intf.cell_volumes

    def boundary_pressure(self, bg) -> np.ndarray:
        cc = bg.cell_centers
        out = np.zeros(bg.num_cells)
        for fn, idx in zip(self._p_mat, self._bands(cc)):
            out += fn(cc[0], cc[1]) * idx
        return out


@dataclass
class ManuIncompSaveData:
    error_matrix_pressure: float
    error_matrix_flux: float
    error_frac_pressure: float
    error_intf_flux: float


def relative_l2(approx, exact, weights) -> float:
    """Volume-weighted relative discrete L2 error."""
    approx = np.asarray(approx)
    exact = np.asarray(exact)
    num = np.sqrt(np.sum(weights * (approx - exact) ** 2))
    den = np.sqrt(np.sum(weights * exact**2))
    return float(num / den) if den > 0 else float(num)


class ManuIncompFlowModel2d(pt.SinglePhaseFlow):
    """Verification model: exact-solution BCs and sources on the fractured
    unit square (counterpart of reference
    ``manu_flow_incomp_frac_2d.py:782``)."""

    def set_materials(self):
        super().set_materials()
        assert self._fluid_component.compressibility == 0.0
        assert self.solid.permeability == 1.0
        assert self.solid.residual_aperture == 1.0
        assert self.solid.normal_permeability == 0.5
        self.exact_sol = ExactIncompFlow2d()

    def set_fractures(self):
        self._fractures = [
            pt.LineFracture(np.array([[0.5, 0.5], [0.25, 0.75]]))
        ]

    def bc_type_darcy_flux(self, sd):
        sides = self.domain_boundary_sides(sd)
        return pt.BoundaryCondition(sd, sides.all_bf, "dir")

    def bc_values_pressure(self, bg):
        return self.exact_sol.boundary_pressure(bg)

    def fluid_source(self, subdomains):
        internal = super().fluid_source(subdomains)
        vals = []
        for sd in subdomains:
            if sd.dim == self.mdg.dim_max():
                vals.append(self.exact_sol.matrix_source(sd))
            else:
                vals.append(self.exact_sol.fracture_source(sd))
        return internal + ad.DenseArray(
            np.concatenate(vals), name="manufactured_source"
        )

    def initialize_data_saving(self):
        pass

    def save_data_time_step(self):
        self.results.append(self.collect_data())

    def collect_data(self) -> ManuIncompSaveData:
        eq = self.equation_system
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
        return ManuIncompSaveData(
            error_matrix_pressure=relative_l2(
                p_mat, ex.matrix_pressure(sd_mat), sd_mat.cell_volumes
            ),
            error_matrix_flux=relative_l2(
                q_mat, ex.matrix_flux(sd_mat), np.ones(sd_mat.num_faces)
            ),
            error_frac_pressure=relative_l2(
                p_frac, ex.fracture_pressure(sd_frac), sd_frac.cell_volumes
            ),
            error_intf_flux=relative_l2(
                lam, ex.interface_flux(intf), np.ones(intf.num_cells)
            ),
        )

    def _is_nonlinear_problem(self) -> bool:
        return False

    def _is_time_dependent(self) -> bool:
        return False
