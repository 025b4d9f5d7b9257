"""Abstract interface for local phase-equilibrium (flash) computations
(reference ``compositional/flash.py:18``)."""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from porepy_tpu.compositional.base import Fluid
from porepy_tpu.compositional.states import FluidState

__all__ = ["Flash", "ConstantKFlash"]


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


class ConstantKFlash(Flash):
    """Two-phase p-T flash with constant K-values (distribution
    coefficients ``y_i = K_i x_i``), solved by a vectorized, jitted
    Rachford-Rice iteration over all cells at once — the flash is an
    embarrassingly parallel pointwise problem, which on TPU means one
    batched Newton kernel instead of the reference's numba point loops.

    Parameters:
        fluid: The fluid; the reference phase is taken as liquid, the
            second phase as vapor.
        k_values: ``(num_components,)`` constant K-values.
    """

    def __init__(self, fluid: Fluid, k_values: Sequence[float]) -> None:
        super().__init__(fluid)
        self.k_values = np.asarray(k_values, dtype=float)
        if self.k_values.size != fluid.num_components:
            raise ValueError("One K-value per component is required")
        if fluid.num_phases != 2:
            raise ValueError("ConstantKFlash is a two-phase flash")

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
        import jax
        import jax.numpy as jnp

        zs = np.vstack([np.asarray(zi, dtype=float) for zi in z])
        K = self.k_values

        @jax.jit
        def rachford_rice(zs):
            Kc = jnp.asarray(K)[:, None]
            # Phase-presence bounds.
            all_liquid = jnp.sum(zs * Kc, axis=0) <= 1.0
            all_vapor = jnp.sum(zs / Kc, axis=0) <= 1.0

            def h_fun(V):
                return jnp.sum(
                    zs * (Kc - 1.0) / (1.0 + V * (Kc - 1.0)), axis=0
                )

            def dh_fun(V):
                return -jnp.sum(
                    zs * (Kc - 1.0) ** 2 / (1.0 + V * (Kc - 1.0)) ** 2,
                    axis=0,
                )

            # Feasible window keeping all denominators positive.
            Kmax = jnp.max(Kc)
            Kmin = jnp.min(Kc)
            lo = jnp.where(Kmax > 1.0, 1.0 / (1.0 - Kmax), -1e10) + 1e-12
            hi = jnp.where(Kmin < 1.0, 1.0 / (1.0 - Kmin), 1e10) - 1e-12
            V = jnp.clip(jnp.full(zs.shape[1], 0.5), lo, hi)

            def body(_i, V):
                step = h_fun(V) / jnp.where(
                    jnp.abs(dh_fun(V)) > 1e-30, dh_fun(V), -1.0
                )
                return jnp.clip(V - step, lo, hi)

            V = jax.lax.fori_loop(0, int(self.max_iter), body, V)
            V = jnp.where(all_liquid, 0.0, jnp.where(all_vapor, 1.0, V))
            V = jnp.clip(V, 0.0, 1.0)
            x = zs / (1.0 + V[None] * (Kc - 1.0))
            y = Kc * x
            # Normalization guards for the single-phase corners.
            x = x / jnp.sum(x, axis=0)
            y = y / jnp.sum(y, axis=0)
            resid = jnp.abs(h_fun(jnp.clip(V, lo, hi)))
            two_phase = ~(all_liquid | all_vapor)
            converged = jnp.where(two_phase, resid < self.tolerance, True)
            return V, x, y, converged

        V, x, y, converged = (np.asarray(a) for a in rachford_rice(jnp.asarray(zs)))

        state = FluidState()
        state.z = zs
        state.p = np.zeros(zs.shape[1]) if p is None else np.asarray(p)
        state.T = np.zeros(zs.shape[1]) if T is None else np.asarray(T)
        # Phase fraction order matches fluid.phases: [reference(liquid), vapor].
        state.y = np.vstack([1.0 - V, V])
        from porepy_tpu.compositional.states import PhaseState

        state.phases = [
            PhaseState(x=np.asarray(x)),
            PhaseState(x=np.asarray(y)),
        ]
        if parameters and "phase_densities" in parameters:
            rho = parameters["phase_densities"]
            state.phases[0].rho = np.asarray(rho[0])
            state.phases[1].rho = np.asarray(rho[1])
            state.evaluate_saturations()
        success = np.where(converged, 0, 1)
        return state, success, np.full(zs.shape[1], self.max_iter)
