"""Biot poroelastic coupling terms, batched per interaction region.

Capability counterpart of reference ``numerics/fv/biot.py:40``: on top of
the MPSA-W stress discretization, produce the poromechanical coupling
matrices for each scalar field coupled through a Biot tensor ``alpha``
(given per keyword via the ``scalar_vector_mappings`` parameter):

- ``scalar_gradient``: the pressure contribution to face tractions. The
  total stress is ``sigma(G) - alpha p``; the local traction-balance rows
  acquire pressure RHS columns ``+sgn (n~.alpha)_i p_c`` and the stencil a
  direct term ``-(n~.alpha) p`` from the designated side.
- ``displacement_divergence`` / ``boundary_displacement_divergence``: per
  cell, ``sum_s V_s (alpha : G_s)`` over its subcells — the discrete
  ``alpha : grad u``.
- ``mpsa_consistency``: the same divergence rows applied to the
  pressure-induced gradients (the Nordbotten 2016 stabilization).
- ``bound_displacement_pressure``: pressure contribution to the boundary
  displacement reconstruction.

All rows/columns are produced in the single batched MPSA pass
(``mpsa._assemble_mpsa_w``); this module only unpacks them.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sps

from porepy_tpu.numerics.fv.mpsa import Mpsa, _assemble_mpsa_w
from porepy_tpu.params.tensor import SecondOrderTensor
from porepy_tpu.utils import common_constants as cc

__all__ = ["Biot"]


class Biot(Mpsa):
    def __init__(self, keyword: str = "mechanics") -> None:
        super().__init__(keyword)
        self.displacement_divergence_matrix_key = "displacement_divergence"
        self.bound_displacement_divergence_matrix_key = (
            "boundary_displacement_divergence"
        )
        self.scalar_gradient_matrix_key = "scalar_gradient"
        self.consistency_matrix_key = "mpsa_consistency"
        self.bound_pressure_matrix_key = "bound_displacement_pressure"

    def ndof(self, sd) -> int:
        return sd.num_cells * (sd.dim + 1)

    def update_discretization(self, sd, data: dict) -> None:
        """Biot carries cell-row (divergence) matrices whose partial
        update needs expanded overlaps (reference ``biot.py``'s
        ``scalar_cell_left`` handling); this build recomputes in full —
        exact, at full assembly cost."""
        self.discretize(sd, data)

    def discretize(self, sd, data: dict) -> None:
        param = data[cc.PARAMETERS][self.keyword]
        matrices = data[cc.DISCRETIZATION_MATRICES][self.keyword]
        bound = param["bc"]
        constit = param["fourth_order_tensor"]
        eta = param.get("mpsa_eta", None)
        scalar_vector_mappings: dict = param["scalar_vector_mappings"]

        alphas: dict[str, np.ndarray] = {}
        for key, alpha in scalar_vector_mappings.items():
            if isinstance(alpha, (float, int)):
                alpha = SecondOrderTensor(float(alpha) * np.ones(sd.num_cells))
            alphas[key] = alpha.values

        (
            stress,
            bound_stress,
            disp_cell,
            disp_bound,
            scalar_gradient,
            displacement_divergence,
            bound_displacement_divergence,
            consistency,
            disp_pressure,
        ) = _assemble_mpsa_w(sd, constit, bound, eta, eta, alphas=alphas)

        matrices[self.stress_matrix_key] = stress
        matrices[self.bound_stress_matrix_key] = bound_stress
        matrices[self.displacement_divergence_matrix_key] = displacement_divergence
        matrices[self.bound_displacement_divergence_matrix_key] = (
            bound_displacement_divergence
        )
        matrices[self.scalar_gradient_matrix_key] = scalar_gradient
        matrices[self.consistency_matrix_key] = consistency
        matrices[self.bound_displacement_cell_matrix_key] = disp_cell
        matrices[self.bound_displacement_face_matrix_key] = disp_bound
        matrices[self.bound_pressure_matrix_key] = disp_pressure
