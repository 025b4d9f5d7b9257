"""Manufactured solution for 3d incompressible md flow with one embedded
vertical plane fracture at ``x = 1/2``, ``y, z in [1/4, 3/4]``.

Counterpart of reference ``tests/functional/setups/manu_flow_incomp_frac_3d.py``
(Varela et al. 2022, Appendix D.2, bubble scaled by 1e6 for conditioning):
nine matrix regions classified by the (y, z) band relative to the fracture
rectangle; the middle region carries the bubble term feeding the interface
flux.
"""

from __future__ import annotations

import numpy as np
import sympy as sym

import porepy_tpu as pt
from porepy_tpu.numerics import ad
from tests.functional.setups.manu_flow_incomp_frac_2d import (
    ManuIncompSaveData,
    relative_l2,
)

MANU_INCOMP_FLUID = {"compressibility": 0.0, "density": 1.0, "viscosity": 1.0}
MANU_INCOMP_SOLID = {
    "residual_aperture": 1.0,
    "permeability": 1.0,
    "normal_permeability": 0.5,
}


class ExactIncompFlow3d:
    """Exact fields on the nine-region decomposition."""

    def __init__(self, smoothness: float = 1.5) -> None:
        x, y, z = sym.symbols("x y z")
        n = smoothness
        # Region order: (y-band, z-band) with bands lo/mid/hi relative to
        # [0.25, 0.75]; distances to the nearest fracture feature.
        dy = {"lo": (y - 0.25) ** 2, "mid": 0, "hi": (y - 0.75) ** 2}
        dz = {"lo": (z - 0.25) ** 2, "mid": 0, "hi": (z - 0.75) ** 2}
        self._bands = [(by, bz) for by in ("lo", "mid", "hi") for bz in ("lo", "mid", "hi")]
        dist = [
            ((x - 0.5) ** 2 + dy[by] + dz[bz]) ** 0.5 for by, bz in self._bands
        ]
        bubble = (
            1e6
            * (y - 0.25) ** 2
            * (y - 0.75) ** 2
            * (z - 0.25) ** 2
            * (z - 0.75) ** 2
        )
        p_mat = []
        for (by, bz), d in zip(self._bands, dist):
            p = d ** (1 + n)
            if by == "mid" and bz == "mid":
                p = p + bubble * d
            p_mat.append(p)
        q_mat = [
            [-sym.diff(p, v) for v in (x, y, z)] for p in p_mat
        ]
        f_mat = [
            sum(sym.diff(q[i], v) for i, v in enumerate((x, y, z)))
            for q in q_mat
        ]
        p_frac = -bubble
        q_frac = [-sym.diff(p_frac, y), -sym.diff(p_frac, z)]
        f_frac = (
            sym.diff(q_frac[0], y) + sym.diff(q_frac[1], z) - 2 * bubble
        )

        args = (x, y, z)
        self._p = [sym.lambdify(args, p, "numpy") for p in p_mat]
        self._q = [
            [sym.lambdify(args, c, "numpy") for c in q] for q in q_mat
        ]
        self._f = [sym.lambdify(args, f, "numpy") for f in f_mat]
        self._p_frac = sym.lambdify((y, z), p_frac, "numpy")
        self._f_frac = sym.lambdify((y, z), f_frac, "numpy")
        self._bubble = sym.lambdify((y, z), bubble, "numpy")

    def _region_masks(self, pts: np.ndarray) -> list[np.ndarray]:
        bands = {
            "lo": lambda v: v < 0.25,
            "mid": lambda v: (v >= 0.25) & (v <= 0.75),
            "hi": lambda v: v > 0.75,
        }
        return [
            bands[by](pts[1]) & bands[bz](pts[2])
            for by, bz in self._bands
        ]

    def matrix_pressure(self, sd) -> np.ndarray:
        cc = sd.cell_centers
        out = np.zeros(sd.num_cells)
        for fn, m in zip(self._p, self._region_masks(cc)):
            out[m] = fn(cc[0, m], cc[1, m], cc[2, m])
        return out

    def matrix_source(self, sd) -> np.ndarray:
        cc = sd.cell_centers
        out = np.zeros(sd.num_cells)
        for fn, m in zip(self._f, self._region_masks(cc)):
            out[m] = fn(cc[0, m], cc[1, m], cc[2, m])
        return out * sd.cell_volumes

    def fracture_pressure(self, sd) -> np.ndarray:
        cc = sd.cell_centers
        return self._p_frac(cc[1], cc[2])

    def fracture_source(self, sd) -> np.ndarray:
        cc = sd.cell_centers
        return self._f_frac(cc[1], cc[2]) * sd.cell_volumes

    def interface_flux(self, intf) -> np.ndarray:
        cc = intf.cell_centers
        return self._bubble(cc[1], cc[2]) * intf.cell_volumes

    def boundary_pressure(self, bg) -> np.ndarray:
        cc = bg.cell_centers
        out = np.zeros(bg.num_cells)
        for fn, m in zip(self._p, self._region_masks(cc)):
            out[m] = fn(cc[0, m], cc[1, m], cc[2, m])
        return out


class ManuIncompFlowModel3d(pt.SinglePhaseFlow):
    """3d verification model (counterpart of reference
    ``manu_flow_incomp_frac_3d.py:754``), cartesian grids."""

    def set_materials(self):
        super().set_materials()
        self.exact_sol = ExactIncompFlow3d()

    def set_domain(self):
        self._domain = pt.Domain(
            {
                "xmin": 0, "xmax": 1,
                "ymin": 0, "ymax": 1,
                "zmin": 0, "zmax": 1,
            }
        )

    def set_fractures(self):
        self._fractures = [
            pt.PlaneFracture(
                np.array(
                    [
                        [0.50, 0.50, 0.50, 0.50],
                        [0.25, 0.25, 0.75, 0.75],
                        [0.25, 0.75, 0.75, 0.25],
                    ]
                )
            )
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
        sd_mat = self.mdg.subdomains(dim=3)[0]
        sd_frac = self.mdg.subdomains(dim=2)[0]
        intf = list(self.mdg.interfaces())[0]

        p_mat = eq.get_variable_values([self.pressure([sd_mat])], iterate_index=0)
        p_frac = eq.get_variable_values([self.pressure([sd_frac])], iterate_index=0)
        lam = eq.get_variable_values(
            [self.interface_darcy_flux([intf])], iterate_index=0
        )
        ex = self.exact_sol
        return ManuIncompSaveData(
            error_matrix_pressure=relative_l2(
                p_mat, ex.matrix_pressure(sd_mat), sd_mat.cell_volumes
            ),
            error_matrix_flux=np.nan,
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
