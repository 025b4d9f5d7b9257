"""Abstract interface for local phase-equilibrium (flash) computations
(reference ``compositional/flash.py:18``)."""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from porepy_tpu.compositional.base import Fluid
from porepy_tpu.compositional.states import FluidState

__all__ = ["Flash"]


class Flash:
    """Interface of flash backends: given a fluid and an intensive state
    specification, compute the equilibrium fluid state."""

    def __init__(self, fluid: Fluid) -> None:
        self.fluid = fluid
        self.tolerance: float = 1e-8
        self.max_iter: int = 150

    def compute_flash(
        self,
        z: Sequence[np.ndarray],
        p: Optional[np.ndarray] = None,
        T: Optional[np.ndarray] = None,
        h: Optional[np.ndarray] = None,
        v: Optional[np.ndarray] = None,
        initial_state: Optional[FluidState] = None,
        parameters: Optional[dict] = None,
    ) -> tuple[FluidState, np.ndarray, np.ndarray]:
        """Perform the flash for the given specification (p-T, p-h or h-v).

        Returns the fluid state, a success flag per point (0 converged) and
        the number of iterations per point.
        """
        raise NotImplementedError("Flash backends must implement compute_flash")
